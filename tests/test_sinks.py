"""Sink layout tests: partition pruning reaches the plan, sorted files
carry tight row-group stats, round-trips preserve values."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from googlecloudstorage_blueprints_spark.plans import (
    explain_str,
    pushed_filters,
)
from googlecloudstorage_blueprints_spark.sinks import (
    compact_parquet,
    upsert_parquet,
    write_partitioned,
    write_sorted,
    write_zordered,
)
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    out = f"file:{tmp_path}/orders_by_status"
    write_partitioned(orders, out, ["o_orderstatus"])

    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = explain_str(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "status filter must prune directories, not rows"

    expected = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_partitioned_write_bounded_file_count(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    write_partitioned(
        orders, f"file:{tmp_path}/o", ["o_orderstatus"]
    )
    n_status = orders.select("o_orderstatus").distinct().count()
    files = glob.glob(f"{tmp_path}/o/*/*.parquet")
    # repartition-first: one file per partition value at this scale, never
    # |tasks| x |values|
    assert len(files) == n_status, sorted(files)


def test_sorted_write_roundtrip_and_stats(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    out = f"file:{tmp_path}/li_sorted"
    write_sorted(li, out, ["l_orderkey"], n_files=4)

    files = [f for f in os.listdir(tmp_path / "li_sorted") if f.endswith(".parquet")]
    assert len(files) == 4

    # disjoint ranges: per-file (min, max) of the sort key must not overlap
    import duckdb

    spans = duckdb.connect().execute(
        f"""SELECT min(l_orderkey), max(l_orderkey)
            FROM parquet_scan('{tmp_path}/li_sorted/*.parquet',
                              filename=true)
            GROUP BY filename ORDER BY 1"""
    ).fetchall()
    for (lo_a, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {spans}"

    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert pushed_filters(back.where(F.col("l_orderkey") == 1)), (
        "point filter must push into the scan"
    )


def test_zorder_write_skips_on_both_columns(spark, tmp_path):
    """Z-ordered files must cover sub-rectangles: the mean per-file span of
    BOTH columns is well under the global span (single-key sort leaves the
    second column at ~full span in every file)."""
    import duckdb

    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 8
    write_zordered(
        orders,
        f"file:{tmp_path}/z",
        ["o_custkey", "o_totalprice"],
        n_files=n_files,
    )
    con = duckdb.connect()

    def mean_span_frac(root, col):
        spans = con.execute(
            f"""SELECT max({col}) - min({col})
                FROM parquet_scan('{root}/*.parquet', filename=true)
                GROUP BY filename"""
        ).fetchall()
        lo, hi = con.execute(
            f"SELECT min({col}), max({col}) FROM parquet_scan('{root}/*.parquet')"
        ).fetchone()
        return sum(s[0] for s in spans) / len(spans) / (hi - lo)

    back = spark.read.parquet(f"file:{tmp_path}/z")
    assert back.count() == orders.count()
    for col in ["o_custkey", "o_totalprice"]:
        frac = mean_span_frac(f"{tmp_path}/z", col)
        assert frac < 0.75, f"{col}: mean file span {frac:.2f} of global"

    # contrast: single-key sort leaves the OTHER column unclustered
    write_sorted(
        orders, f"file:{tmp_path}/s", ["o_custkey"], n_files=n_files
    )
    frac_other = mean_span_frac(f"{tmp_path}/s", "o_totalprice")
    assert frac_other > 0.9, "sanity: sorted-by-custkey shouldn't cluster price"


def test_compact_parquet_merges_small_files(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    small = f"file:{tmp_path}/small"
    li.repartition(50).write.parquet(small)
    assert len(glob.glob(f"{tmp_path}/small/*.parquet")) == 50

    dst = f"file:{tmp_path}/compacted"
    n = compact_parquet(spark, small, dst, target_file_bytes=64 * 1024 * 1024)
    out_files = glob.glob(f"{tmp_path}/compacted/*.parquet")
    assert len(out_files) == n < 50
    assert spark.read.parquet(dst).count() == li.count()


def test_upsert_parquet_replaces_and_appends(spark, tmp_path):
    import pyspark.sql.functions as F2

    nation = load_table(spark, SF, "nation")
    target = f"file:{tmp_path}/nation"
    nation.write.parquet(target)

    updates = spark.createDataFrame(
        [(0, "RENAMED_0", 0), (999, "BRAND_NEW", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    upsert_parquet(spark, target, updates, ["n_nationkey"])

    back = spark.read.parquet(target)
    assert back.count() == nation.count() + 1  # one replaced, one new
    got = {r["n_nationkey"]: r["n_name"] for r in back.collect()}
    assert got[0] == "RENAMED_0" and got[999] == "BRAND_NEW"
    untouched = nation.where(F2.col("n_nationkey") == 5).first()["n_name"]
    assert got[5] == untouched


def test_upsert_parquet_null_key_is_replaced(spark, tmp_path):
    target = f"file:{tmp_path}/t"
    spark.createDataFrame(
        [(None, "old-null"), (1, "one")], "k int, v string"
    ).write.parquet(target)
    updates = spark.createDataFrame(
        [(None, "new-null")], "k int, v string"
    )
    upsert_parquet(spark, target, updates, ["k"])
    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {None: "new-null", 1: "one"}, got


def test_upsert_parquet_recovers_from_mid_swap_crash(spark, tmp_path):
    """A crash between rename(target->old) and rename(tmp->target) leaves
    the table only at __upsert_old; the next upsert must auto-restore it
    before merging (writers.py crash-recovery contract)."""
    import os

    target_fs = tmp_path / "t"
    target = f"file:{target_fs}"
    spark.createDataFrame(
        [(1, "one"), (2, "two")], "k int, v string"
    ).write.parquet(target)
    # simulate the crashed state: target moved aside, nothing installed
    os.rename(target_fs, tmp_path / "t__upsert_old")

    updates = spark.createDataFrame([(2, "TWO")], "k int, v string")
    upsert_parquet(spark, target, updates, ["k"])

    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {1: "one", 2: "TWO"}, got
    assert not (tmp_path / "t__upsert_old").exists()  # cleaned up


def test_table_diff_classifies_changes(spark, tmp_path):
    """insert/delete/update classification by key, null-safe on both the
    key and the compared values."""
    from googlecloudstorage_blueprints_spark.sinks.writers import table_diff

    old = f"file:{tmp_path}/old"
    new = f"file:{tmp_path}/new"
    spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (None, "nk", 0.0)],
        "id int, name string, score double",
    ).write.parquet(old)
    spark.createDataFrame(
        [
            (1, "a", 1.0),      # unchanged -> absent from diff
            (2, "b", 2.0),      # NULL -> value: updated
            (4, "d", 4.0),      # inserted
            (None, "nk", 0.5),  # NULL key matches null-safely: updated
        ],
        "id int, name string, score double",
    ).write.parquet(new)

    rows = {
        r["id"]: r
        for r in table_diff(spark, old, new, keys=["id"]).collect()
    }
    assert rows[2]["change_type"] == "updated" and rows[2]["score"] == 2.0
    assert rows[3]["change_type"] == "deleted" and rows[3]["score"] is None
    assert rows[4]["change_type"] == "inserted"
    assert rows[None]["change_type"] == "updated"
    assert 1 not in rows  # unchanged keys filtered before materializing
    assert len(rows) == 4


def test_table_diff_after_upsert_shows_exactly_the_upsert(spark, tmp_path):
    """Composition audit: diffing a table against its post-upsert state
    returns exactly the upserted keys."""
    import shutil

    from googlecloudstorage_blueprints_spark.sinks.writers import (
        table_diff,
        upsert_parquet,
    )

    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id int, val string"
    )
    target = f"file:{tmp_path}/t"
    base.write.parquet(target)
    shutil.copytree(f"{tmp_path}/t", f"{tmp_path}/t_before")

    updates = spark.createDataFrame(
        [(3, "v3-new"), (42, "v42")], "id int, val string"
    )
    upsert_parquet(spark, target, updates, keys=["id"])

    diff = {
        r["id"]: r["change_type"]
        for r in table_diff(
            spark, f"file:{tmp_path}/t_before", target, keys=["id"]
        ).collect()
    }
    assert diff == {3: "updated", 42: "inserted"}


def _scd2_split_frames(spark):
    """Full-history SCD2 truth plus a (first-half, second-half) changelog
    split of the events fixture at the median timestamp."""
    from googlecloudstorage_blueprints_spark.operators import all_queries

    e = load_table(spark, SF, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
    )
    mid = e.selectExpr(
        "CAST(percentile_approx(ts_us, 0.5) AS BIGINT) AS m"
    ).collect()[0]["m"]
    first = e.where(F.col("ts_us") < mid)
    second = e.where(F.col("ts_us") >= mid)
    truth = all_queries()["scd2_intervals"](spark, SF)
    return first, second, truth


def test_apply_scd2_batch_equals_full_rebuild(spark, tmp_path):
    """Build the SCD2 table from the first half of history, apply the
    second half as a CDC batch — the merged table must equal the batch
    operator's full-history reconstruction exactly, and re-applying the
    SAME batch must change nothing (idempotent MERGE)."""
    from googlecloudstorage_blueprints_spark.operators.warehouse import (
        scd2_from_changelog,
    )
    from googlecloudstorage_blueprints_spark.sinks import apply_scd2_batch

    first, second, truth = _scd2_split_frames(spark)
    target = f"file:{tmp_path}/scd2_table"
    scd2_from_changelog(first).write.parquet(target)

    apply_scd2_batch(spark, target, second)
    got = {
        (r["user_id"], r["valid_from_us"]): (
            r["event_type"],
            r["valid_to_us"],
        )
        for r in spark.read.parquet(target).collect()
    }
    expect = {
        (r["user_id"], r["valid_from_us"]): (
            r["event_type"],
            r["valid_to_us"],
        )
        for r in truth.collect()
    }
    assert got == expect and len(expect) > 0

    # replay the identical batch: same-type rows absorb, table unchanged
    apply_scd2_batch(spark, target, second)
    again = {
        (r["user_id"], r["valid_from_us"]): (
            r["event_type"],
            r["valid_to_us"],
        )
        for r in spark.read.parquet(target).collect()
    }
    assert again == expect


def test_apply_scd2_batch_untouched_keys_copy_through(spark, tmp_path):
    """A batch touching ONE user must leave every other key's rows
    byte-identical (the anti-join copy-through path, the property that
    bounds rewrite cost by the batch's key set)."""
    from googlecloudstorage_blueprints_spark.operators.warehouse import (
        scd2_from_changelog,
    )
    from googlecloudstorage_blueprints_spark.sinks import apply_scd2_batch

    first, second, _ = _scd2_split_frames(spark)
    target = f"file:{tmp_path}/scd2_one"
    scd2_from_changelog(first).write.parquet(target)
    before = {
        tuple(r)
        for r in spark.read.parquet(target).collect()
    }
    one_user = second.orderBy("user_id").limit(1).collect()[0]["user_id"]
    apply_scd2_batch(
        spark, target, second.where(F.col("user_id") == one_user)
    )
    after = {tuple(r) for r in spark.read.parquet(target).collect()}
    changed_users = {
        r[0] for r in before.symmetric_difference(after)
    }
    assert changed_users <= {one_user}
