"""Round-17 hardening pins.

1. `table_column_digest`'s fixture-trap repartition is CONDITIONAL on
   input parallelism (r16 verdict item 2): a single-row-group fixture
   file still spreads the per-cell md5 work across cores, but a
   multi-split input — the only shape a real cluster ever sees — must
   NOT pay a full-table round-robin shuffle the splittable scan
   already made unnecessary.
2. `row_hash_expr`'s hash Column is self-contained (r16 advice): no
   `__row_str` intermediate alias is required by callers.
"""

from __future__ import annotations

import shutil

import pytest

from googlecloudstorage_blueprints_spark.operators.audit import (
    column_digest_frame,
)
from googlecloudstorage_blueprints_spark.plans.inspect import explain_str

SF = "/root/testdata/sf0.001"


def _digest_rows(df):
    return {
        (r["table_name"], r["column_name"]): (
            r["n_nulls"], r["digest"], r["digest_sum"],
        )
        for r in df.collect()
    }  # bounded: ≤|catalog columns| rows


def test_column_digest_multifile_input_skips_the_shuffle(spark, tmp_path):
    """A multi-split documents input (one file per scan partition, ≥
    defaultParallelism of them) plans NO RoundRobinPartitioning
    exchange — the scan itself already spreads the hash work — and the
    digests are identical to the single-file run (content fingerprints
    are partitioning-independent by construction)."""
    single = tmp_path / "single"
    single.mkdir()
    shutil.copy(f"{SF}/documents.parquet", single / "documents.parquet")

    par = spark.sparkContext.defaultParallelism
    multi = tmp_path / "multi"
    multi.mkdir()
    (
        spark.read.parquet(str(single / "documents.parquet"))
        .repartition(4 * par)
        .write.parquet(str(multi / "documents.parquet"))
    )

    # force one-file-per-partition planning so the scan parallelism is
    # deterministic regardless of Spark's small-file packing heuristics
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes", None)
    spark.conf.set("spark.sql.files.openCostInBytes", "134217728")
    try:
        multi_df = column_digest_frame(spark, str(multi), ["documents"])
        plan_multi = explain_str(multi_df)
        assert "RoundRobinPartitioning" not in plan_multi

        single_df = column_digest_frame(spark, str(single), ["documents"])
        plan_single = explain_str(single_df)
        assert "RoundRobinPartitioning" in plan_single

        assert _digest_rows(multi_df) == _digest_rows(single_df)
    finally:
        if old_cost is None:
            spark.conf.unset("spark.sql.files.openCostInBytes")
        else:
            spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def test_row_hash_expr_needs_no_alias(spark):
    """The returned hash Column evaluates standalone — a caller that
    never materializes any `__row_str` alias gets the same hashes as
    the digest surface (the r16 advice: the implicit-alias contract is
    gone)."""
    from pyspark.sql import functions as F

    from googlecloudstorage_blueprints_spark.operators.audit import (
        row_hash_expr,
    )
    from googlecloudstorage_blueprints_spark.sources.catalog import (
        load_table,
    )

    s, h = row_hash_expr("region")
    df = load_table(spark, SF, "region")
    direct = df.select(h.alias("h")).agg(F.expr("bit_xor(h)")).collect()
    via_str = (
        df.select(s.alias("some_other_name"))
        .select(
            F.conv(
                F.substring(F.md5("some_other_name"), 1, 15), 16, 10
            )
            .cast("long")
            .alias("h")
        )
        .agg(F.expr("bit_xor(h)"))
        .collect()
    )
    assert direct[0][0] == via_str[0][0]
    assert direct[0][0] != 0
