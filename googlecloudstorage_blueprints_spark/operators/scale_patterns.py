"""Scale-pattern operators: the join strategies that keep 100 TB jobs alive.

Two patterns beyond what AQE does automatically:

- **Salted skew join** (``join_skew_salted``): when one join key holds a
  disproportionate share of rows, the task holding it runs hours after the
  rest finish.  Salting splits the hot key across SALT_BUCKETS tasks: the
  probe side gets a deterministic per-row salt, the build side is exploded
  SALT_BUCKETS× so every (key, salt) pair still matches.  Results are
  provably identical to the plain join — the oracle IS the plain join.
  (AQE's skew-join split handles sort-merge skew at runtime; explicit
  salting is the portable form that also covers hash-partitioned aggs.)
- **Bucketed co-located join** (tests/test_scale_patterns.py): both sides
  written ``bucketBy(key)`` → the join plans with ZERO exchanges.  That is
  a write-once-shuffle-never contract for fact tables that join on the
  same key daily; asserted on the physical plan in tests since it needs a
  table write first (not a pure ``queries()`` member).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

SALT_BUCKETS = 8


@register(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join, verified equal to the plain join by the oracle.

    Probe side (lineitem): salt = xxhash64(key, linenumber) mod SALT_BUCKETS
    — deterministic, uniform, no RNG.  Build side (orders): each row
    replicated once per salt via a literal sequence explode (build side
    grows SALT_BUCKETS×, the price paid to split a hot probe key across
    SALT_BUCKETS tasks).  Join on (key, salt) then aggregate; the salt
    never reaches the output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    salted_li = li.withColumn(
        "salt",
        F.pmod(
            F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")),
            F.lit(SALT_BUCKETS),
        ).cast("int"),
    )
    salted_o = o.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_BUCKETS - 1)))
    )
    return (
        salted_li.join(
            salted_o,
            (salted_li.l_orderkey == salted_o.o_orderkey)
            & (salted_li.salt == salted_o.salt),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


RANGE_WINDOW_US = 5 * 60 * 1_000_000  # pair events within 5 minutes


@register(
    "join_range_binned",
    oracle=f"""
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
           (epoch_us(b.ts) - epoch_us(a.ts)) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id > a.event_id
     AND epoch_us(b.ts) >= epoch_us(a.ts)
     AND epoch_us(b.ts) - epoch_us(a.ts) <= {RANGE_WINDOW_US}
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join made equi-joinable by time binning.

    Naive range joins (`|tb - ta| <= w` alone) plan as nested loops — a
    100 TB death sentence.  Binning ts into w-sized buckets turns the band
    predicate into an equi-join: a pair within w is always in the same or
    adjacent bucket, so joining on (user, bucket) plus (user, bucket+1)
    covers every candidate exactly once, and the true predicate filters
    residually.  Candidate space is O(rows x density per bucket) instead
    of O(rows^2 per user).  Pairs are ordered (later event_id > earlier)
    with ts >= to keep same-timestamp pairs deterministic."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("t_us")
    )
    a = e.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        F.col("t_us").alias("ta"),
        # integer div: double division + cast could jitter at exact
        # window multiples and break the adjacent-bucket cover
        F.expr(f"t_us div {RANGE_WINDOW_US}").alias("bucket"),
    )
    # right side lands in its own bucket AND the previous one, so every
    # within-window pair shares exactly one (user, bucket) key with a
    b = (
        e.select(
            F.col("event_id").alias("event_b"),
            "user_id",
            F.col("t_us").alias("tb"),
            F.expr(f"t_us div {RANGE_WINDOW_US}").alias("b0"),
        )
        .withColumn("bucket", F.explode(F.array("b0", F.col("b0") - 1)))
        .drop("b0")
    )
    return (
        a.join(b, ["user_id", "bucket"])
        .where(
            (F.col("event_b") > F.col("event_a"))
            & (F.col("tb") >= F.col("ta"))
            & (F.col("tb") - F.col("ta") <= RANGE_WINDOW_US)
        )
        .select(
            "event_a",
            "event_b",
            "user_id",
            (F.col("tb") - F.col("ta")).alias("gap_us"),
        )
    )


ROWNUM_BUCKET = 4096  # ids per range bucket for the two-level numbering


@register(
    "global_row_number",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS row_num
    FROM documents WHERE doc_id IS NOT NULL
    """,
)
def global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global dense row numbering by a total order WITHOUT the
    SinglePartition window ``row_number().over(Window.orderBy(...))``
    plans (which serializes the entire table through one task — the
    canonical Spark scale trap).

    Two-level offset decomposition, the same shape sequence_pack uses
    (training.py): rows bucket by ``doc_id div 4096``; a per-bucket
    window numbers rows locally (parallel across buckets); bucket sizes
    aggregate once, and bucket start-offsets come from a cumulative sum
    decomposed as (offset of the bucket's super-bucket) + (cumulative
    within the super-bucket) — the only single-partition work is the
    super-bucket ledger, |ids| / 4096² rows, bounded at any realistic
    scale (100 TB of docs ≈ 10¹² ids → ~60k ledger rows).  The final
    offset join keys on bucket, reusing the window's hash partitioning.
    Row numbers equal the oracle's global ROW_NUMBER because doc_id is
    unique and buckets are id-ordered.  A NULL doc_id has no position
    in the id order — dropped on BOTH engines (null-catalog audit,
    r18: the NULL bucket silently fell out of Spark's offset join
    while DuckDB numbered NULL ids NULLS LAST)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id").isNotNull())
    )
    d = d.withColumn("bucket", F.expr(f"doc_id div {ROWNUM_BUCKET}"))
    d = d.withColumn("sup", F.expr(f"bucket div {ROWNUM_BUCKET}"))

    from pyspark.sql import Window

    w_local = Window.partitionBy("bucket").orderBy("doc_id")
    local = d.withColumn(
        "local_rn", F.row_number().over(w_local).cast("long")
    )

    bcnt = d.groupBy("sup", "bucket").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w_in_sup = (
        Window.partitionBy("sup")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bcnt = bcnt.withColumn(
        "off_in_sup", F.coalesce(F.sum("n_rows").over(w_in_sup), F.lit(0))
    )
    scnt = bcnt.groupBy("sup").agg(F.sum("n_rows").alias("sup_rows"))
    w_sup = (
        Window.orderBy("sup")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # single-partition cumulative over the SUPER-bucket ledger only:
    # |ids|/4096² rows — the bounded driver-side-free analogue of a
    # grand-total pass
    scnt = scnt.withColumn(
        "sup_off", F.coalesce(F.sum("sup_rows").over(w_sup), F.lit(0))
    )
    offsets = bcnt.join(scnt.select("sup", "sup_off"), "sup").select(
        "bucket",
        (F.col("sup_off") + F.col("off_in_sup")).alias("bucket_off"),
    )
    return (
        local.join(offsets, "bucket")
        .select(
            "doc_id",
            (F.col("bucket_off") + F.col("local_rn")).alias("row_num"),
        )
    )
