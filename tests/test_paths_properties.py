"""Property-based parity tests for the naming algebra.

The table-driven cases in test_paths.py pin the reference's documented
examples; these hypothesis properties pin the INVARIANTS the reference's
regex/normpath implementation guarantees for arbitrary inputs — the
surface a port is most likely to silently break.
"""

from __future__ import annotations

import os
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from googlecloudstorage_blueprints_spark.paths import (
    clean_folder_name,
    combine_folder_and_file_name,
    determine_destination_file_name,
    enumerate_destination_file_name,
)

# file-name-ish text: printable, no '/', non-empty
fname = st.text(
    st.characters(
        codec="ascii", min_codepoint=33, exclude_characters="/"
    ),
    min_size=1,
    max_size=40,
)
folder = st.text(
    st.characters(codec="ascii", min_codepoint=33), max_size=40
)
filenum = st.integers(min_value=1, max_value=999)


@given(name=fname, n=filenum)
@settings(max_examples=300)
def test_enumerate_first_dot_rule(name, n):
    """Reference-exact: _{n} lands before the FIRST dot, else appended."""
    out = enumerate_destination_file_name(name, n)
    if "." in name:
        head, tail = name.split(".", 1)
        assert out == f"{head}_{n}.{tail}"
    else:
        assert out == f"{name}_{n}"
    # dot count is always preserved
    assert out.count(".") == name.count(".")


@given(name=fname, n=filenum)
@settings(max_examples=300)
def test_enumerate_matches_reference_regex(name, n):
    """The implementation must equal the reference's literal regex form
    (download_file.py:74-84)."""
    if re.search(r"\.", name):
        expected = re.sub(r"\.", f"_{n}.", name, 1)
    else:
        expected = f"{name}_{n}"
    assert enumerate_destination_file_name(name, n) == expected


@given(f=folder)
@settings(max_examples=300)
def test_clean_folder_idempotent_and_slash_free(f):
    once = clean_folder_name(f)
    assert clean_folder_name(once) == once
    assert not once.startswith("/") and not once.endswith("/")


@given(f=folder, name=fname)
@settings(max_examples=300)
def test_combine_empty_folder_is_normpath_of_name(f, name):
    cleaned = clean_folder_name(f)
    combined = combine_folder_and_file_name(cleaned, name)
    if cleaned == "":
        assert combined == os.path.normpath(name)
    else:
        assert combined == os.path.normpath(f"{cleaned}/{name}")


@given(src=fname, dest=st.one_of(st.none(), fname), n=filenum)
@settings(max_examples=300)
def test_destination_name_selection(src, dest, n):
    """Explicit destination + file_number → enumerated destination;
    no destination → source basename regardless of file_number."""
    with_num = determine_destination_file_name(
        source_full_path=f"a/b/{src}",
        destination_file_name=dest,
        file_number=n,
    )
    without = determine_destination_file_name(
        source_full_path=f"a/b/{src}", destination_file_name=dest
    )
    if dest:
        assert with_num == enumerate_destination_file_name(dest, n)
        assert without == dest
    else:
        assert with_num == without == os.path.basename(f"a/b/{src}")


def test_enumerate_column_twin_matches_python(spark):
    """The Catalyst column expression must agree with the pure-Python
    reference-parity function on tricky names (first-dot rule, multi-dot,
    dotless, leading dot, consecutive dots)."""
    import pyspark.sql.functions as F

    from googlecloudstorage_blueprints_spark.functions.columns import (
        enumerate_name_col,
    )

    names = [
        "a.tar.gz", "data", "x.y", ".hidden", "a..b", "trailing.",
        "many.dots.in.name.txt", "under_score.v2.parquet", "n", "..",
    ]
    rows = [(n, i + 1) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "name string, num int").select(
        "name",
        "num",
        enumerate_name_col(F.col("name"), F.col("num")).alias("out"),
    )
    got = {(r["name"], r["num"]): r["out"] for r in df.collect()}
    for n, i in rows:
        assert got[(n, i)] == enumerate_destination_file_name(n, i), (n, i)
