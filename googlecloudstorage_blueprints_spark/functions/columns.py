"""Column-level building blocks shared across operators.

Everything here returns a Catalyst expression (pyspark Column) built from
JVM builtins / higher-order functions — no Python UDFs — so operators that
compose them stay inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def cosine_similarity(a: str, b: str) -> Column:
    """Exact float64 cosine between two array<float>/<double> columns.
    zip_with + aggregate (JVM higher-order functions)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"          0D, (acc, v) -> acc + v) / "
        f"(sqrt(aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * "
        f" sqrt(aggregate({b}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


def file_basename(path_col: str = "path") -> Column:
    """Basename of a path column — the column twin of
    paths.extract_file_name_from_source_full_path (reference
    ``download_file.py:65-71``)."""
    return F.element_at(F.split(F.col(path_col), "/"), -1)


def enumerate_name_col(name_col: Column, number_col: Column) -> Column:
    """Column twin of paths.enumerate_destination_file_name — insert
    ``_{n}`` before the FIRST dot (reference ``download_file.py:74-84``),
    else append."""
    first_dot = F.instr(name_col, ".")
    return F.when(
        first_dot > 0,
        F.concat(
            F.split(name_col, r"\.", 2).getItem(0),
            F.lit("_"),
            number_col.cast("string"),
            F.lit("."),
            F.split(name_col, r"\.", 2).getItem(1),
        ),
    ).otherwise(
        F.concat(name_col, F.lit("_"), number_col.cast("string"))
    )


def word_shingles(text_col: str, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column (dedup building block).

    Array-returning form: the per-element lambda runs INTERPRETED (~20×
    slower than codegen) — fine as the verify/oracle tier, but hot paths
    should use :func:`shingle_structs` + explode + ``concat_ws`` instead,
    which stays entirely inside whole-stage codegen."""
    return F.expr(
        f"array_distinct(transform("
        f"  sequence(0, greatest(size(split({text_col}, ' ')) - {k}, 0)),"
        f"  i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {k}))"
        f"))"
    )


def shingle_structs(text_col: str, k: int = 3) -> Column:
    """Explode-ready k-word shingle structs, built with codegen only.

    ``arrays_zip`` of k shifted ``slice``s of the token array — no
    interpreted higher-order function anywhere.  After
    ``explode_outer`` the shingle string is ``concat_ws(" ", p.0, ...,
    p.{k-1})`` (``concat_ws`` skips the NULLs arrays_zip pads short docs
    with).  Emits ``greatest(n_tokens - k + 1, 1)`` structs per doc —
    docs shorter than k words contribute their whole text as one
    shingle, exactly like :func:`word_shingles` — but does NOT dedup
    within the doc; follow with ``dropDuplicates`` when per-doc
    distinctness matters."""
    a = F.split(text_col, " ")
    length = F.greatest(F.size(a) - (k - 1), F.lit(1))
    return F.arrays_zip(*[F.slice(a, i + 1, length) for i in range(k)])
