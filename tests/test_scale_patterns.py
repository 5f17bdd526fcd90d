"""Scale-pattern pins: bucketed joins plan zero exchanges; salted join
output is identical to the plain join; multimodal kernels keep their
contracts (fixed thumb size, exact 1→N frame fan-out)."""

from __future__ import annotations

import pyspark.sql.functions as F

from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.plans import (
    explain_str,
    shuffle_count,
)
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
QUERIES = all_queries()


def test_bucketed_join_zero_shuffles(spark, tmp_path):
    """Write both join sides bucketed by the key → the join itself must
    plan with no Exchange at all (write-once, shuffle-never)."""
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    n_buckets = 4
    for name, src, key in [
        ("b_orders", "orders", "o_orderkey"),
        ("b_lineitem", "lineitem", "l_orderkey"),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            load_table(spark, SF, src)
            .write.mode("overwrite")
            .option("path", f"file:{tmp_path}/{name}")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_extendedprice", "o_orderpriority"
    )
    assert shuffle_count(joined) == 0, "bucketed join must not shuffle"
    plain = load_table(spark, SF, "lineitem").count()
    assert joined.count() == plain  # every lineitem has its order


def test_salted_join_equals_plain_join(spark):
    salted = {
        tuple(r)
        for r in QUERIES["join_skew_salted"](spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    plain = {
        tuple(r)
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.round(
                    F.sum(
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ),
                    4,
                ).alias("revenue"),
            )
            .collect()
        )
    }
    assert salted == plain


def test_approx_sketches_deterministic_and_close(spark):
    """Sketches must be run-to-run deterministic and near their exact
    twins (HLL++ rsd=1%; approx_percentile within the value spread)."""
    a = sorted(map(tuple, QUERIES["agg_approx_sketches"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["agg_approx_sketches"](spark, SF).collect()))
    assert a == b
    e = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for row in QUERIES["agg_approx_sketches"](spark, SF).collect():
        err = abs(row["approx_users"] - exact[row["event_type"]]) / exact[
            row["event_type"]
        ]
        assert err <= 0.05, (row["event_type"], err)


def test_multimodal_resize_fixed_thumb(spark):
    rows = QUERIES["multimodal_resize"](spark, SF).collect()
    assert rows
    # RGB24 thumbnails: w*h*3 bytes per row (real decoded-pixel resize)
    assert all(
        len(r["thumb"]) == r["thumb_w"] * r["thumb_h"] * 3 for r in rows
    )


def test_multimodal_frame_sample_fanout(spark):
    docs = load_table(spark, SF, "documents").count()
    rows = QUERIES["multimodal_frame_sample"](spark, SF).collect()
    assert len(rows) == docs * 4
    per_doc: dict[int, list[int]] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per_doc.values())


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Partition the fact by a dim-derived key, join with a filtered dim
    → Spark's dynamic partition pruning must inject a runtime subquery
    filter on the partition column so only matching partitions scan (the
    fundamental 100 TB pattern: a date/region-partitioned fact joined to
    a small filtered dim reads only the partitions the dim selects)."""
    out = f"file:{tmp_path}/orders_by_year"
    o = load_table(spark, SF, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("o_year").parquet(out)

    fact = spark.read.parquet(out)
    years = (
        o.select("o_year")
        .distinct()
        .withColumn("pick", F.col("o_year") % 2)
        .where(F.col("pick") == 0)
        .drop("pick")
    )
    joined = fact.join(years, "o_year").select("o_orderkey", "o_year")
    plan = explain_str(joined)
    assert (
        "dynamicpruningexpression" in plan.lower()
    ), "partitioned fact ⋈ filtered dim must plan dynamic partition pruning"
    # correctness: row count equals a static filter on the same years
    picked = [r["o_year"] for r in years.collect()]
    expect = o.where(F.col("o_year").isin(picked)).count()
    assert joined.count() == expect
