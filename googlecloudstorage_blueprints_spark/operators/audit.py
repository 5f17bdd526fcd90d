"""Data-audit operators: the integrity checks a lakehouse runs on every
load — referential integrity, fact-vs-rollup reconciliation, key-skew
diagnosis, partition-size profiling, and point-in-time dimension lookup.

These are the "trust the 100 TB before querying it" surface: each is one
or two shuffles keyed on the audited key, aggregates are map-side
partial, and nothing materializes more than the violation/profile rows.
The reference has no audit surface (SURVEY §2.A.4); these extend §2.B's
warehouse family (operators/warehouse.py holds the maintenance ops, this
module the verification ops).

Parity conventions (operators/relational.py + the repo build docs): BIGINT-cast
integer outputs and CAST oracle integer SUMs, exact-integer ratios stay
unrounded, double aggregates round before output AND before any ORDER
BY/filter they feed, total-order every top-k with a unique tiebreaker,
integer-µs timestamp math.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

# (name, child table, child key, parent table, parent key) — every FK
# edge in the fixture star schema
_FK_EDGES = [
    ("customer.nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem.order", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier.nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]


@register(
    "fk_orphan_check",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS relationship,
           CAST(COUNT(*) AS BIGINT) AS n_child,
           CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)          AS n_orphan
    FROM {child} c LEFT JOIN {parent} p ON p.{pk} = c.{ck}
    """
        for name, child, ck, parent, pk in _FK_EDGES
    )
    + "\nORDER BY relationship",
)
def fk_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge in the star
    schema: child row count and orphan count (child keys with no parent)
    per relationship — the load-validation gate that runs before any
    join-based query is trusted (an orphan silently drops rows from
    every inner join downstream).

    Shape: one outer join per edge, keyed on the FK — dims broadcast,
    the two fact edges shuffle on their natural join key (the same
    exchange the production joins reuse); each edge reduces to ONE row
    before the 6-row union.  All-integer output: no rounding."""
    parts = []
    for name, child, ck, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("pk"))
            .withColumn("__p", F.lit(1))
        )
        parts.append(
            c.join(p, c.k == p.pk, "left").agg(
                F.lit(name).alias("relationship"),
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.sum(
                    F.when(F.col("__p").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_orphan"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return sort_bounded(out, "relationship")


@register(
    "order_reconciliation",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)
                         * (1 + l_tax)), 4) AS computed_total
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderkey,
           o.o_totalprice,
           li.computed_total,
           ROUND(ABS(o.o_totalprice - li.computed_total)
                 / o.o_totalprice, 4) AS rel_diff
    FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
    ORDER BY rel_diff DESC, o.o_orderkey
    LIMIT 20
    """,
)
def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-vs-rollup reconciliation: recompute each order's total from
    its line items (price × (1−discount) × (1+tax)) and surface the 20
    worst relative mismatches — the audit every finance-grade pipeline
    runs between a fact table and its header rollup.

    Shape: one orderkey-keyed partial aggregate over lineitem, one
    shuffle join against orders, TakeOrderedAndProject for the top-20 —
    no window, no global sort.  Parity: the recomputed sum rounds 4dp
    (the revenue-sum rule — the products carry bounded decimals, so 4dp
    avoids half-cent tiebreak boundaries); rel_diff is derived from the
    ROUNDED sum, itself rounded 4dp before both the ORDER BY and the
    output; (rel_diff, o_orderkey) is a total order."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    computed = li.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            4,
        ).alias("computed_total")
    )
    rel = F.round(
        F.abs(F.col("o_totalprice") - F.col("computed_total"))
        / F.col("o_totalprice"),
        4,
    )
    return (
        o.join(computed, o.o_orderkey == computed.l_orderkey)
        .select(
            "o_orderkey",
            "o_totalprice",
            "computed_total",
            rel.alias("rel_diff"),
        )
        .orderBy(F.col("rel_diff").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "key_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
    SELECT l_partkey,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM counts CROSS JOIN tot
    ORDER BY n DESC, l_partkey
    LIMIT 20
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter profile of a join key: the 20 hottest l_partkey
    values with their row share — the diagnostic you run BEFORE choosing
    between plain shuffle, salting, and AQE skew-join for a key (the
    mitigation itself is ``join_skew_salted``, scale_patterns.py).

    Shape: one map-side-combined count aggregate (shuffle carries one
    row per distinct key), a 1-row total broadcast, TakeOrdered top-20.
    Parity: share is an exact integer ratio (unrounded by the
    exact-ratio rule); (n, l_partkey) is a total order."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.col("n").desc(), "l_partkey")
        .limit(20)
    )


@register(
    "partition_stats_daily",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT)                    AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)     AS n_users,
           CAST(COUNT(DISTINCT event_type) AS BIGINT)  AS n_types,
           ROUND(SUM(value), 4)                        AS total_value,
           CAST(COUNT(*) AS DOUBLE)
               / CAST(COUNT(DISTINCT user_id) AS DOUBLE)
                                                       AS events_per_user
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def partition_stats_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day partition profile of the event stream: row count,
    distinct users/types, value total, events-per-user — the table a
    partitioned-layout planner reads to size ``maxPartitionBytes`` /
    file counts and to spot ingestion gaps or replay bursts before they
    skew downstream day-keyed work.

    Shape: one day-keyed aggregate; COUNT DISTINCT expands to Spark's
    standard two-phase expand-aggregate, still partial map-side.
    Parity: value sum rounds 4dp (events_tumbling_agg precedent);
    events_per_user is an exact integer ratio, unrounded; day is a
    formatted string so both engines hash identical values."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.round(F.sum("value"), 4).alias("total_value"),
            (
                F.count(F.lit(1)).cast("double")
                / F.countDistinct("user_id").cast("double")
            ).alias("events_per_user"),
        )
        .transform(sort_bounded, "day")
    )


@register(
    "scd2_point_in_time",
    oracle="""
    WITH bounds AS (
        SELECT (CAST(MIN(epoch_us(ts)) AS BIGINT)
                + CAST(MAX(epoch_us(ts)) AS BIGINT)) // 2 AS t
        FROM events
    )
    SELECT user_id,
           event_type,
           epoch_us(ts) AS asof_ts_us,
           event_id     AS asof_event_id
    FROM events CROSS JOIN bounds
    WHERE epoch_us(ts) <= bounds.t
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id
        ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: each key's valid attribute AS OF
    the corpus midpoint timestamp — the "what did the dimension say when
    this fact happened" query every SCD2 table exists to answer
    (``scd2_intervals`` builds the history; this is the probe against
    it, expressed directly on the changelog so it needs no materialized
    interval table).

    Shape: a 1-row bounds aggregate broadcast over the scan, the as-of
    cut as a plain filter (pushable below the window), then rank-1 per
    key — WindowGroupLimit cuts map-side like ``latest_snapshot``.
    Parity: the midpoint is integer-µs floor-division math ((min+max)
    div 2 — exact on both engines, no doubles); (ts, event_id) is the
    total order."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    bounds = e.agg(
        F.expr(
            "(CAST(min(unix_micros(ts)) AS BIGINT)"
            " + CAST(max(unix_micros(ts)) AS BIGINT)) div 2"
        ).alias("t")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("asof_ts_us").desc(), F.col("asof_event_id").desc()
    )
    return (
        e.select(
            "user_id",
            "event_type",
            ts_us.alias("asof_ts_us"),
            F.col("event_id").alias("asof_event_id"),
        )
        .crossJoin(F.broadcast(bounds))
        .where(F.col("asof_ts_us") <= F.col("t"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "asof_ts_us", "asof_event_id")
    )


# --------------------------------------------------------------------------
# lineitem linenumber contiguity audit
# --------------------------------------------------------------------------

@register(
    "lineitem_linenumber_audit",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               CAST(COUNT(*) AS BIGINT)                    AS n_lines,
               CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS n_distinct,
               CAST(MIN(l_linenumber) AS BIGINT)           AS min_ln,
               CAST(MAX(l_linenumber) AS BIGINT)           AS max_ln
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN n_distinct < n_lines THEN 1 ELSE 0 END)
               AS BIGINT) AS n_dup_linenumbers,
           CAST(SUM(CASE WHEN min_ln <> 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bad_start,
           CAST(SUM(CASE WHEN n_distinct = n_lines AND min_ln = 1
                          AND max_ln = n_lines
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_noncontiguous
    FROM per_order
    """,
)
def lineitem_linenumber_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-number contiguity audit: every order's l_linenumber should
    be exactly 1..n — duplicates, offset starts, or gaps mean a
    double-applied CDC batch or a partial reload, and they silently
    break any (orderkey, linenumber)-keyed merge downstream.  One
    per-order aggregate, one scalar rollup; pure integer compares.

    On the synthetic fixtures the counters fire NATURALLY (the verify
    skill's known trap: (l_orderkey, l_linenumber) is not unique there
    — ~58% of orders carry a duplicate at sf0.01), which is exactly why
    a real pipeline wants this audit in front of keyed merges; a TPC-H
    generator would read all zeros."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.countDistinct("l_linenumber").cast("long").alias("n_distinct"),
        F.min("l_linenumber").cast("long").alias("min_ln"),
        F.max("l_linenumber").cast("long").alias("max_ln"),
    )
    dup = F.when(F.col("n_distinct") < F.col("n_lines"), 1).otherwise(0)
    bad_start = F.when(F.col("min_ln") != 1, 1).otherwise(0)
    contiguous = (
        (F.col("n_distinct") == F.col("n_lines"))
        & (F.col("min_ln") == 1)
        & (F.col("max_ln") == F.col("n_lines"))
    )
    noncontig = F.when(contiguous, 0).otherwise(1)
    return per_order.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(dup).cast("long").alias("n_dup_linenumbers"),
        F.sum(bad_start).cast("long").alias("n_bad_start"),
        F.sum(noncontig).cast("long").alias("n_noncontiguous"),
    )


# --------------------------------------------------------------------------
# table freshness report (per-source watermark + cardinality screen)
# --------------------------------------------------------------------------

@register(
    "table_freshness_report",
    oracle="""
    SELECT 'customer' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(NULL AS VARCHAR) AS min_ts, CAST(NULL AS VARCHAR) AS max_ts
    FROM customer
    UNION ALL
    SELECT 'documents', CAST(COUNT(*) AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'events', CAST(COUNT(*) AS BIGINT),
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S')
    FROM events
    UNION ALL
    SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
           strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S')
    FROM lineitem
    UNION ALL
    SELECT 'orders', CAST(COUNT(*) AS BIGINT),
           strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    ORDER BY table_name
    """,
)
def table_freshness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table freshness + cardinality screen: row count and the
    min/max event-time watermark of every time-bearing table (NULL for
    dimension tables) — the first page of any ingestion dashboard and
    the input to retention/partition-expiry policy
    (``partition_stats_daily`` drills into one table; this is the
    fleet view).

    Shape: five scalar aggregates (min/max/count reduce map-side to one
    row per table) unioned into a 5-row report — at 100 TB each leg is
    a column-pruned scan of exactly one timestamp column.  Parity:
    timestamps emitted as formatted strings (the tumbling-agg
    convention); dimension tables carry typed NULL strings."""
    def leg(table: str, ts_col: str | None) -> DataFrame:
        t = load_table(spark, sf_dir, table)
        if ts_col is None:
            return t.agg(
                F.lit(table).alias("table_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.lit(None).cast("string").alias("min_ts"),
                F.lit(None).cast("string").alias("max_ts"),
            )
        fmt = "yyyy-MM-dd HH:mm:ss"
        return t.agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.date_format(F.min(ts_col), fmt).alias("min_ts"),
            F.date_format(F.max(ts_col), fmt).alias("max_ts"),
        )

    legs = [
        leg("customer", None),
        leg("documents", None),
        leg("events", "ts"),
        leg("lineitem", "l_shipdate"),
        leg("orders", "o_orderdate"),
    ]
    out = legs[0]
    for df in legs[1:]:
        out = out.unionByName(df)
    return sort_bounded(out, "table_name")


# --------------------------------------------------------------------------
# Benford first-digit audit of event values
# --------------------------------------------------------------------------

# log10(1 + 1/d) for d = 1..9, inlined as identical literals on both
# engines (never engine log10 — the r5 ln/pow rule, solved by constants)
_BENFORD = {
    1: 0.3010299957, 2: 0.1760912591, 3: 0.1249387366,
    4: 0.096910013, 5: 0.079181246, 6: 0.0669467896,
    7: 0.057991947, 8: 0.0511525224, 9: 0.0457574906,
}


@register(
    "events_value_benford",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(ROUND(value * 100, 0) AS BIGINT) AS c
        FROM events WHERE value > 0
    ),
    digit AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d
        FROM cents WHERE c > 0
    ),
    obs AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n
            FROM digit GROUP BY d),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM obs)
    SELECT o.d AS first_digit,
           o.n AS n_values,
           CAST(o.n AS DOUBLE) / t.t AS observed_share,
           CAST(CASE o.d {" ".join(
               f"WHEN {d} THEN {v}" for d, v in _BENFORD.items())}
           END AS DOUBLE) AS benford_share,
           CAST(o.n AS DOUBLE) / t.t
               - CAST(CASE o.d {" ".join(
                   f"WHEN {d} THEN {v}" for d, v in _BENFORD.items())}
                 END AS DOUBLE) AS deviation
    FROM obs o CROSS JOIN tot t
    ORDER BY first_digit
    """,
)
def events_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of transaction values: observed vs
    expected leading-digit shares — the classic synthetic-data /
    fabricated-amounts tripwire (organic multi-scale amounts follow
    log10(1+1/d); generated or capped ones don't).

    Shape: digit extraction is one string op on the ×100 BIGINT cents
    (never engine log10 on data — the expected shares are INLINED
    LITERALS identical in both SQL texts), then a 9-row rollup.
    Parity: digit-of-integer-string is deterministic; observed_share is
    an exact-integer ratio; deviation subtracts a shared literal from
    it — one identical IEEE op, emitted unrounded."""
    e = load_table(spark, sf_dir, "events")
    cents = e.where(F.col("value") > 0).select(
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("c")
    )
    digit = cents.where(F.col("c") > 0).select(
        F.substring(F.col("c").cast("string"), 1, 1)
        .cast("long")
        .alias("d")
    )
    obs = digit.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = obs.agg(F.sum("n").cast("long").alias("t"))
    bshare = F.when(F.col("d") == 1, F.lit(_BENFORD[1]))
    for dd in range(2, 10):
        bshare = bshare.when(F.col("d") == dd, F.lit(_BENFORD[dd]))
    oshare = F.col("n").cast("double") / F.col("t")
    return sort_bounded(
        obs.crossJoin(F.broadcast(tot)).select(
            F.col("d").alias("first_digit"),
            F.col("n").alias("n_values"),
            oshare.alias("observed_share"),
            bshare.alias("benford_share"),
            (oshare - bshare).alias("deviation"),
        ),
        "first_digit",
    )


# --------------------------------------------------------------------------
# order-date continuity audit (gaps in the business calendar)
# --------------------------------------------------------------------------

@register(
    "orders_date_gaps",
    oracle="""
    WITH days AS (
        SELECT DISTINCT
               CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d
        FROM orders
    ),
    isl AS (
        SELECT d, d - ROW_NUMBER() OVER (ORDER BY d) AS grp
        FROM days
    ),
    runs AS (
        SELECT CAST(MIN(d) AS BIGINT) AS run_start,
               CAST(MAX(d) AS BIGINT) AS run_end
        FROM isl GROUP BY grp
    ),
    gaps AS (
        SELECT run_start
               - LAG(run_end) OVER (ORDER BY run_start) - 1 AS gap_days
        FROM runs
    )
    SELECT CAST((SELECT COUNT(*) FROM days) AS BIGINT) AS n_days_present,
           CAST((SELECT MAX(d) - MIN(d) + 1 - COUNT(*) FROM days)
                AS BIGINT) AS n_days_missing,
           CAST(COUNT(gap_days) AS BIGINT) AS n_gaps,
           CAST(COALESCE(MAX(gap_days), 0) AS BIGINT)
               AS longest_gap_days
    FROM gaps
    """,
)
def orders_date_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-calendar continuity audit: missing order days between
    the first and last order, how many distinct gaps, and the longest
    one — the upstream-feed-outage detector (a 3-day hole in
    o_orderdate is an ingestion incident, not a demand signal).

    Shape: distinct days reduce the fact table to a |days| LEDGER; the
    island numbering (day − row_number, the gaps-and-islands pattern)
    and the gap lag both run over that bounded ledger — the
    SinglePartition windows are calendar-bounded, never data-sized.
    Parity: pure integer epoch-day math throughout."""
    o = load_table(spark, sf_dir, "orders")
    days = o.select(
        F.expr(
            "CAST(unix_micros(o_orderdate) div 86400000000 AS BIGINT)"
        ).alias("d")
    ).distinct()
    w = Window.orderBy("d")
    isl = days.select(
        "d", (F.col("d") - F.row_number().over(w)).alias("grp")
    )
    runs = isl.groupBy("grp").agg(
        F.min("d").cast("long").alias("run_start"),
        F.max("d").cast("long").alias("run_end"),
    )
    w_runs = Window.orderBy("run_start")
    gaps = runs.select(
        (
            F.col("run_start") - F.lag("run_end").over(w_runs) - 1
        ).alias("gap_days")
    )
    stats = days.agg(
        F.count(F.lit(1)).cast("long").alias("n_days_present"),
        (F.max("d") - F.min("d") + 1 - F.count(F.lit(1)))
        .cast("long")
        .alias("n_days_missing"),
    )
    return gaps.agg(
        F.count("gap_days").cast("long").alias("n_gaps"),
        F.coalesce(F.max("gap_days"), F.lit(0))
        .cast("long")
        .alias("longest_gap_days"),
    ).crossJoin(F.broadcast(stats)).select(
        "n_days_present", "n_days_missing", "n_gaps", "longest_gap_days"
    )


# --------------------------------------------------------------------------
# duplicate-event detection (idempotency audit on the event stream)
# --------------------------------------------------------------------------

@register(
    "events_duplicate_check",
    oracle="""
    WITH g AS (
        SELECT event_type, user_id, ts, CAST(COUNT(*) AS BIGINT) AS m
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)                    AS n_groups,
           CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END)
                AS BIGINT)                             AS n_dup_groups,
           CAST(SUM(m - 1) AS BIGINT)                  AS n_extra_rows,
           CAST(MAX(m) AS BIGINT)                      AS max_multiplicity
    FROM g
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_duplicate_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotency audit on the event stream: how many (user, ts, type)
    identity groups carry more than one event_id — the double-fire /
    at-least-once-redelivery detector every ingestion pipeline runs
    before trusting event counts (``lineitem_linenumber_audit`` is the
    same shape on the fact table).  Emits EVERY type (zeros included),
    so the fixture output is non-empty even when clean; the counters
    themselves are pinned by a planted-duplicate delta test
    (tests/test_new_ops_r11.py — the r7 zero-row-vacuity rule).

    Shape: one identity-keyed count aggregate (map-side partial) and a
    |types|-bounded rollup; nothing but group counts shuffles.
    Parity: all-BIGINT counters; µs timestamps group exactly on both
    engines (the catalog normalizes physical types)."""
    e = load_table(spark, sf_dir, "events")
    g = e.groupBy("event_type", "user_id", "ts").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    return sort_bounded(
        g.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("m") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_groups"),
            F.sum(F.col("m") - 1).cast("long").alias("n_extra_rows"),
            F.max("m").cast("long").alias("max_multiplicity"),
        ),
        "event_type",
    )


# --------------------------------------------------------------------------
# order/line status consistency matrix
# --------------------------------------------------------------------------

@register(
    "order_line_status_matrix",
    oracle="""
    WITH j AS (
        SELECT o.o_orderstatus, l.l_linestatus
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j)
    SELECT j.o_orderstatus,
           j.l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(COUNT(*) AS DOUBLE) / t.n AS line_share
    FROM j CROSS JOIN tot t
    GROUP BY j.o_orderstatus, j.l_linestatus, t.n
    ORDER BY o_orderstatus, l_linestatus
    """,
)
def order_line_status_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Header-vs-line status contingency matrix: line counts and shares
    by (order status, line status) — the state-machine consistency
    screen (an F order whose lines are still O is a stuck workflow;
    TPC-H's rule is F ⇢ all-F).  ``order_reconciliation`` audits the
    MONEY rollup; this audits the STATUS rollup.

    Shape: one orderkey equi-join (no row reduction needed before it —
    only the two status columns survive the scan), a |statuses|²-bounded
    rollup, and a 1-row broadcast total.  Parity: exact counts, the
    share an unrounded exact-integer ratio (denominator ≥ 1 whenever a
    row exists)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_linestatus"
    )
    j = li.join(o, "o_orderkey").select("o_orderstatus", "l_linestatus")
    tot = j.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return sort_bounded(
        j.groupBy("o_orderstatus", "l_linestatus")
        .agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
        .crossJoin(F.broadcast(tot))
        .select(
            "o_orderstatus",
            "l_linestatus",
            "n_lines",
            (F.col("n_lines").cast("double") / F.col("n")).alias(
                "line_share"
            ),
        ),
        "o_orderstatus",
        "l_linestatus",
    )


# --------------------------------------------------------------------------
# ingestion-order audit: event_id vs ts inversions (r11 wave 2)
# --------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000


@register(
    "events_id_ts_inversions",
    oracle=f"""
    WITH seq AS (
        SELECT epoch_us(ts) AS ts_us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id) AS prev_ts_us
        FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL
    )
    SELECT CAST(ts_us // {_US_PER_DAY} AS BIGINT) AS epoch_day,
           CAST(COUNT(prev_ts_us) AS BIGINT)      AS n_pairs,
           CAST(SUM(CASE WHEN ts_us < prev_ts_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inversions,
           CAST(SUM(CASE WHEN ts_us < prev_ts_us
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / NULLIF(COUNT(prev_ts_us), 0) AS inversion_share
    FROM seq
    GROUP BY 1
    ORDER BY epoch_day
    """,
)
def events_id_ts_inversions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Out-of-order ingestion monitor: within each user's stream
    ordered by EVENT_ID (assignment order), how often does the event
    TIME run backwards?  A nonzero day says the producer assigned ids
    ahead of a delayed clock or a replay landed late — the input-order
    assumption every watermark and sessionizer in this engine leans on,
    audited per day so a bad backfill shows up as a spike, not a
    corpus-wide dilution.

    Shape: one user-keyed lag window ordered by the globally-unique
    event_id (no tiebreaker needed), then a span-bounded day rollup.
    Parity: integer-µs comparisons only; the share an exact-integer
    ratio NULLIF-guarded for days whose every event is a user's first
    (count of non-NULL prev pairs is the denominator on both
    engines).  A row with NULL event_id has no position in assignment
    order and a NULL ts can't be compared — both dropped on BOTH
    engines (null-catalog audit, r18: NULL *ordering* defaults differ
    cross-engine, so a NULL-id row re-pairs its neighbours on one
    engine only)."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_id").isNotNull()
    )
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select(
        ts_us.alias("ts_us"),
        F.lag(ts_us).over(w).alias("prev_ts_us"),
    )
    inv = F.when(F.col("ts_us") < F.col("prev_ts_us"), 1).otherwise(0)
    return sort_bounded(
        seq.groupBy(
            F.expr(f"ts_us div {_US_PER_DAY}")
            .cast("long")
            .alias("epoch_day")
        )
        .agg(
            F.count("prev_ts_us").cast("long").alias("n_pairs"),
            F.sum(inv).cast("long").alias("n_inversions"),
            (
                F.sum(inv).cast("double")
                / F.nullif(F.count("prev_ts_us"), F.lit(0))
            ).alias("inversion_share"),
        ),
        "epoch_day",
    )


# ---------------------------------------------------------------------------
# value-distribution drift (r12) — PSI between time halves
# ---------------------------------------------------------------------------

PSI_MAG_BUCKETS = 9  # cents-magnitude buckets: digits(cents) capped at 9


@register(
    "events_value_psi",
    oracle=f"""
    WITH e AS (
        SELECT event_type, epoch_us(ts) AS ts_us,
               LEAST({PSI_MAG_BUCKETS},
                     length(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                                 AS VARCHAR))) AS bucket
        FROM events
    ),
    mid AS (SELECT (MIN(ts_us) + MAX(ts_us)) // 2 AS tmid FROM e),
    c AS (
        SELECT e.event_type, e.bucket,
               CAST(SUM(CASE WHEN e.ts_us <= mid.tmid THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_a,
               CAST(SUM(CASE WHEN e.ts_us > mid.tmid THEN 1 ELSE 0 END)
                    AS BIGINT) AS cnt_b
        FROM e CROSS JOIN mid
        GROUP BY e.event_type, e.bucket
    ),
    spine AS (
        SELECT t.event_type, b.bucket
        FROM (SELECT DISTINCT event_type FROM e) t
        CROSS JOIN (SELECT unnest(range(1, {PSI_MAG_BUCKETS} + 1))
                        AS bucket) b
    ),
    f AS (
        SELECT s.event_type, s.bucket,
               COALESCE(c.cnt_a, 0) AS cnt_a,
               COALESCE(c.cnt_b, 0) AS cnt_b
        FROM spine s
        LEFT JOIN c ON c.event_type = s.event_type
                   AND c.bucket = s.bucket
    ),
    g AS (
        SELECT event_type, bucket, cnt_a, cnt_b,
               CAST(SUM(cnt_a) OVER (PARTITION BY event_type)
                    AS BIGINT) AS tot_a,
               CAST(SUM(cnt_b) OVER (PARTITION BY event_type)
                    AS BIGINT) AS tot_b
        FROM f
    ),
    terms AS (
        SELECT event_type, tot_a, tot_b,
               CAST(ROUND(
                   (CAST(cnt_a + 1 AS DOUBLE)
                        / (tot_a + {PSI_MAG_BUCKETS})
                    - CAST(cnt_b + 1 AS DOUBLE)
                        / (tot_b + {PSI_MAG_BUCKETS}))
                   * (CAST(ROUND(LN(CAST(cnt_a + 1 AS DOUBLE)) * 1000000, 0) AS BIGINT)
                      - CAST(ROUND(LN(CAST(tot_a + {PSI_MAG_BUCKETS} AS DOUBLE)) * 1000000, 0) AS BIGINT)
                      - CAST(ROUND(LN(CAST(cnt_b + 1 AS DOUBLE)) * 1000000, 0) AS BIGINT)
                      + CAST(ROUND(LN(CAST(tot_b + {PSI_MAG_BUCKETS} AS DOUBLE)) * 1000000, 0) AS BIGINT)),
                   0) AS BIGINT) AS term_e6
        FROM g
    )
    SELECT event_type,
           CAST(MIN(tot_a) AS BIGINT) AS n_first,
           CAST(MIN(tot_b) AS BIGINT) AS n_second,
           CAST(SUM(term_e6) AS BIGINT) AS psi_e6
    FROM terms
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Has the value distribution DRIFTED?  Population Stability Index
    per event type between the first and second half of the corpus
    time range — the model-monitoring screen (PSI < 0.1 stable,
    0.1-0.25 watch, > 0.25 investigate; psi_e6 is PSI × 1e6).  The
    audit-family companion of ``events_value_benford`` (digit fraud)
    and ``events_anomaly`` (pointwise outliers): PSI flags a SHIFTED
    population even when every point looks normal.

    Shape: one scan bucketing values by cents-magnitude (digit count —
    a pure string/integer bucket key, no transcendental near a bucket
    boundary), one (type, bucket, period) count aggregate, windows
    over the enum-bounded (|types|×9) frame.  Parity: Laplace-smoothed
    shares make every ln argument ≥ 1 and every denominator positive
    (no NULLIF needed by construction); each ln is fixed-pointed ×1e6
    at birth (the r7 transcendental rule) and each bucket's PSI term
    is rounded to an INTEGER e6 unit, so the per-type sum is an
    order-independent BIGINT sum — never ROUND(SUM(doubles)).  The
    time midpoint is pure integer-µs arithmetic."""
    e = load_table(spark, sf_dir, "events")
    B = PSI_MAG_BUCKETS
    cents = F.round(F.col("value") * 100, 0).cast("long")
    ev = e.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.least(
            F.lit(B), F.length(cents.cast("string"))
        ).alias("bucket"),
    )
    mid = ev.agg(
        F.expr("(min(ts_us) + max(ts_us)) div 2").alias("tmid")
    )
    c = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(
                F.when(F.col("ts_us") <= F.col("tmid"), 1).otherwise(0)
            )
            .cast("long")
            .alias("cnt_a"),
            F.sum(
                F.when(F.col("ts_us") > F.col("tmid"), 1).otherwise(0)
            )
            .cast("long")
            .alias("cnt_b"),
        )
    )
    types = ev.select("event_type").distinct()
    buckets = spark.range(1, B + 1).select(
        F.col("id").cast("int").alias("bucket")
    )
    spine = types.crossJoin(F.broadcast(buckets))
    f = spine.join(c, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce(F.col("cnt_a"), F.lit(0)).cast("long").alias("cnt_a"),
        F.coalesce(F.col("cnt_b"), F.lit(0)).cast("long").alias("cnt_b"),
    )
    w_t = Window.partitionBy("event_type")
    g = f.select(
        "event_type",
        "cnt_a",
        "cnt_b",
        F.sum("cnt_a").over(w_t).cast("long").alias("tot_a"),
        F.sum("cnt_b").over(w_t).cast("long").alias("tot_b"),
    )

    def _ln_e6(col):
        return F.round(F.log(col.cast("double")) * 1_000_000, 0).cast(
            "long"
        )

    l_e6 = (
        _ln_e6(F.col("cnt_a") + 1)
        - _ln_e6(F.col("tot_a") + B)
        - _ln_e6(F.col("cnt_b") + 1)
        + _ln_e6(F.col("tot_b") + B)
    )
    p_minus_q = (F.col("cnt_a") + 1).cast("double") / (
        F.col("tot_a") + B
    ) - (F.col("cnt_b") + 1).cast("double") / (F.col("tot_b") + B)
    term_e6 = F.round(p_minus_q * l_e6, 0).cast("long")
    return sort_bounded(
        g.select(
            "event_type", "tot_a", "tot_b", term_e6.alias("term_e6")
        )
        .groupBy("event_type")
        .agg(
            F.min("tot_a").cast("long").alias("n_first"),
            F.min("tot_b").cast("long").alias("n_second"),
            F.sum("term_e6").cast("long").alias("psi_e6"),
        ),
        "event_type",
    )


# --------------------------------------------------------------------------
# event-type × value-magnitude mutual information (r15)
# --------------------------------------------------------------------------


@register(
    "events_type_value_mi",
    oracle=f"""
    WITH e AS (
        SELECT event_type,
               LEAST({PSI_MAG_BUCKETS},
                     length(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                                 AS VARCHAR))) AS bucket
        FROM events
    ),
    cells AS (
        SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n_tb
        FROM e GROUP BY event_type, bucket
    ),
    mt AS (SELECT event_type, CAST(SUM(n_tb) AS BIGINT) AS n_t
           FROM cells GROUP BY event_type),
    mb AS (SELECT bucket, CAST(SUM(n_tb) AS BIGINT) AS n_b
           FROM cells GROUP BY bucket),
    n AS (SELECT CAST(SUM(n_tb) AS BIGINT) AS n_all FROM cells),
    terms AS (
        SELECT c.n_tb, n.n_all,
               c.n_tb * (
                   CAST(ROUND(LN(CAST(c.n_tb AS DOUBLE)) * 1000000, 0)
                        AS BIGINT)
                 + CAST(ROUND(LN(CAST(n.n_all AS DOUBLE)) * 1000000, 0)
                        AS BIGINT)
                 - CAST(ROUND(LN(CAST(mt.n_t AS DOUBLE)) * 1000000, 0)
                        AS BIGINT)
                 - CAST(ROUND(LN(CAST(mb.n_b AS DOUBLE)) * 1000000, 0)
                        AS BIGINT)
               ) AS term
        FROM cells c
        JOIN mt ON mt.event_type = c.event_type
        JOIN mb ON mb.bucket = c.bucket
        CROSS JOIN n
    )
    SELECT CAST(MIN(n_all) AS BIGINT)   AS n_events,
           CAST(COUNT(*) AS BIGINT)     AS n_cells,
           CAST(SUM(term) AS BIGINT)    AS mi_num_e6,
           CAST(SUM(term) AS DOUBLE)
               / (CAST(MIN(n_all) AS DOUBLE) * 1000000.0) AS mi_nats
    FROM terms
    """,
)
def events_type_value_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and value magnitude —
    the column-dependence audit: MI ≈ 0 says the value distribution is
    the same for every type (one global model suffices; a type-
    conditioned feature adds nothing), a high MI says per-type value
    models differ (and that a type column leaking into a value-based
    split would leak label information).  The audit-family companion
    of ``nation_segment_chisq`` (deviation cells) and
    ``events_value_psi`` (temporal drift) — same contingency
    machinery, the information-theoretic summary.

    Shape: one scan into a (type × magnitude-bucket) cell aggregate —
    |types|·10 cells — then marginals derive FROM THE CELLS (no second
    scan) and broadcast back; 1-row close.  Parity: the bucket key is
    the PSI digit-count rule (pure string/integer — no transcendental
    near a bucket edge); each ln fixed-points round(·1e6)→BIGINT
    separately (the PSI/chisq term template) and combines by integer
    add/sub, weighted by the exact BIGINT cell count, so the term sum
    is order-independent; zero cells are simply absent (0·ln 0 = 0);
    mi_nats is one closing division, unrounded.  Overflow headroom:
    |term| ≤ n_tb · ~4e7, safe to n_tb ≈ 2e11 rows per cell —
    pre-aggregate per partition before the cell merge long before
    that.  Closed forms pinned (tests/test_new_ops_r15b.py): a
    balanced independent 2×2 reads exactly 0 (the rounded-ln identity
    cancels); a diagonal 2×2 reads exactly round(ln 2·1e6)-scaled
    = 0.693147."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.lit(PSI_MAG_BUCKETS),
        F.length(
            F.round(F.col("value") * 100, 0).cast("long").cast("string")
        ),
    )
    cells = e.groupBy(
        "event_type", bucket.alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_tb"))
    mt = cells.groupBy("event_type").agg(
        F.sum("n_tb").cast("long").alias("n_t")
    )
    mb = cells.groupBy("bucket").agg(
        F.sum("n_tb").cast("long").alias("n_b")
    )
    n = cells.agg(F.sum("n_tb").cast("long").alias("n_all"))
    ln6 = lambda col: F.round(  # noqa: E731
        F.log(col.cast("double")) * 1_000_000, 0
    ).cast("long")
    term = F.col("n_tb") * (
        ln6(F.col("n_tb"))
        + ln6(F.col("n_all"))
        - ln6(F.col("n_t"))
        - ln6(F.col("n_b"))
    )
    return (
        cells.join(F.broadcast(mt), "event_type")
        .join(F.broadcast(mb), "bucket")
        .crossJoin(F.broadcast(n))
        .select(term.alias("term"), "n_all")
        .agg(
            F.min("n_all").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("term").cast("long").alias("mi_num_e6"),
            (
                F.sum("term").cast("double")
                / (F.min("n_all").cast("double") * 1_000_000.0)
            ).alias("mi_nats"),
        )
    )


# --------------------------------------------------------------------------
# cross-engine table fingerprints (r15) — migration validation
# --------------------------------------------------------------------------

# canonical column recipe per table: (name, kind) with kind ∈
# {int, str, ts, money}.  `money` fixed-points ×1e4 (the repo's 4dp
# decision-boundary-free grid for 2dp-generated money — r9 rule) so the
# canonical string never stringifies a raw double (engine float
# formatting differs).  embeddings' vector column is EXCLUDED: a
# float-origin double's shortest decimal repr can land exactly on a
# ×1e6 rounding boundary (the r10 ROUND-divergence class), so only its
# scalar columns are fingerprinted.
TABLE_DIGEST_SPEC: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "str")],
    "nation": [
        ("n_nationkey", "int"), ("n_name", "str"), ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "int"), ("c_name", "str"), ("c_nationkey", "int"),
        ("c_acctbal", "money"), ("c_mktsegment", "str"),
    ],
    "supplier": [
        ("s_suppkey", "int"), ("s_name", "str"), ("s_nationkey", "int"),
        ("s_acctbal", "money"),
    ],
    "part": [
        ("p_partkey", "int"), ("p_name", "str"), ("p_brand", "str"),
        ("p_type", "str"), ("p_size", "int"), ("p_retailprice", "money"),
    ],
    "orders": [
        ("o_orderkey", "int"), ("o_custkey", "int"),
        ("o_orderstatus", "str"), ("o_totalprice", "money"),
        ("o_orderdate", "ts"), ("o_orderpriority", "str"),
    ],
    "lineitem": [
        ("l_orderkey", "int"), ("l_partkey", "int"), ("l_suppkey", "int"),
        ("l_linenumber", "int"), ("l_quantity", "money"),
        ("l_extendedprice", "money"), ("l_discount", "money"),
        ("l_tax", "money"), ("l_returnflag", "str"),
        ("l_linestatus", "str"), ("l_shipdate", "ts"),
    ],
    "events": [
        ("event_id", "int"), ("ts", "ts"), ("user_id", "int"),
        ("event_type", "str"), ("value", "money"), ("props", "str"),
    ],
    "documents": [
        ("doc_id", "int"), ("text", "str"), ("lang", "str"),
        ("source", "str"), ("n_chars", "int"),
    ],
    "embeddings": [("vec_id", "int"), ("label", "int")],
}

_DIGEST_NULL = "<NULL>"

# Modulus for the non-cancelling companion digest (r15 verdict item 4):
# the Mersenne prime 2^61 - 1.  The per-row hashes are 60-bit
# non-negative integers, so Σh is exact in Spark DECIMAL(38,0) (38
# digits hold ~1e18 rows × 2^60) and in DuckDB's HUGEINT sum; one final
# mod by the same positive constant is then engine-identical (both
# values non-negative, so % ≡ pmod).  Unlike the XOR, a duplicated row
# PAIR moves the sum by 2h ≢ 0 (mod an odd prime) unless h = 0 — the
# documented XOR pair-cancellation is closed without a sort or a wider
# shuffle.
DIGEST_SUM_MOD = 2_305_843_009_213_693_951  # 2^61 - 1


def _digest_oracle() -> str:
    parts = []
    for t, cols in TABLE_DIGEST_SPEC.items():
        exprs = []
        for c, kind in cols:
            if kind == "int":
                e = f"CAST({c} AS VARCHAR)"
            elif kind == "str":
                e = c
            elif kind == "ts":
                e = f"CAST(epoch_us({c}) AS VARCHAR)"
            else:  # money
                e = (f"CAST(CAST(ROUND({c} * 10000, 0) AS BIGINT) "
                     "AS VARCHAR)")
            exprs.append(f"COALESCE({e}, '{_DIGEST_NULL}')")
        s = "concat_ws('|', " + ", ".join(exprs) + ")"
        h = f"CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"
        # DuckDB SUM(BIGINT) accumulates in HUGEINT (128-bit, exact to
        # ~1.7e38 — room for ~1e18 rows of 2^60 hashes), then one mod.
        parts.append(
            f"SELECT '{t}' AS table_name,"
            f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(COALESCE(bit_xor({h}), 0) AS BIGINT) AS digest,"
            f" CAST(COALESCE(CAST(SUM({h}) % {DIGEST_SUM_MOD} AS BIGINT),"
            f" 0) AS BIGINT) AS digest_sum"
            f" FROM {t}"
        )
    return " UNION ALL ".join(parts) + " ORDER BY table_name"


def row_hash_expr(table: str):
    """The canonical per-row BIGINT hash for ``table`` as a pair of
    Columns ``(row_str, h_of_row_str)`` — h is the first 15 hex digits
    of md5(canonical string) parsed base-16 (≤2^60, sign-safe).  Shared
    by ``digest_frame`` and the streaming digest twin so the two
    surfaces can never drift in canonical-string spelling.  ``h`` is
    built directly from the row-string Column, so callers select it
    without any intermediate alias."""
    cols = TABLE_DIGEST_SPEC[table]
    exprs = []
    for c, kind in cols:
        if kind == "int":
            e = F.col(c).cast("string")
        elif kind == "str":
            e = F.col(c)
        elif kind == "ts":
            e = F.unix_micros(F.col(c)).cast("string")
        else:  # money
            e = (
                F.round(F.col(c) * 10000, 0)
                .cast("long")
                .cast("string")
            )
        exprs.append(F.coalesce(e, F.lit(_DIGEST_NULL)))
    s = F.concat_ws("|", *exprs)
    h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    return s, h


def digest_frame(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> DataFrame:
    """(table_name, n_rows, digest, digest_sum) for the given tables
    (default: the whole catalog) — the computation behind
    ``table_row_digest``, exposed so the ``validate`` CLI verb can
    fingerprint a SUBSET without scanning the rest."""
    frames = []
    for t in tables if tables is not None else list(TABLE_DIGEST_SPEC):
        df = load_table(spark, sf_dir, t)
        _s, h = row_hash_expr(t)
        frames.append(
            df.select(h.alias("h"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(F.expr("bit_xor(h)"), F.lit(0))
                .cast("long")
                .alias("digest"),
                F.coalesce(
                    F.expr(
                        "CAST(pmod(SUM(CAST(h AS DECIMAL(38,0))), "
                        f"{DIGEST_SUM_MOD}) AS BIGINT)"
                    ),
                    F.lit(0),
                ).alias("digest_sum"),
            )
            .select(
                F.lit(t).alias("table_name"),
                "n_rows",
                "digest",
                "digest_sum",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return sort_bounded(out, "table_name")


@register("table_row_digest", oracle=_digest_oracle())
def table_row_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content fingerprint of every catalog table:
    (n_rows, XOR of per-row md5 hashes over a canonical row string,
    and the same hashes' sum mod 2^61-1) — the migration-validation
    primitive.  The reference's whole job is MOVING data
    (download/upload/move, SURVEY §2.A); this op is how a user proves
    the moved/rewritten copy still holds the same rows without sorting
    or shuffling either side: run the digest on both, compare 10 rows.
    XOR and modular sum are commutative/associative, so the digest is
    independent of row order and partitioning; a changed CELL flips
    both (planted pin).  The XOR alone cancels DUPLICATE PAIRS of
    identical rows; the companion ``digest_sum`` closes that class —
    a duplicated pair moves the sum by 2h ≢ 0 mod the odd prime
    (planted pin flips digest_sum while the XOR stays blind), and
    n_rows independently catches pure duplication.  An undetected
    change now requires a hash-sum collision ON TOP of an XOR
    collision at equal row count; the still-stricter option at 100 TB
    is a per-partition sorted-merge Merkle tree (documented upgrade
    path, same scan shape).

    Shape: one scan per table, map-side-combined XOR/SUM/count partial
    aggregates — no shuffle wider than one row per partition, no sort
    anywhere; the 10-row union is literal-bounded.  The modular sum
    accumulates exactly (Spark DECIMAL(38,0), DuckDB HUGEINT — see
    DIGEST_SUM_MOD) and reduces once at the end.  Parity: the
    canonical row string never stringifies a raw double (money
    fixed-points ×1e4 — the 4dp boundary-free grid; timestamps as
    integer µs; NULLs as an explicit sentinel because both engines'
    concat_ws would otherwise SKIP them, aliasing ('a', NULL) with
    ('a')); md5 hex and the 15-hex-digit→BIGINT parse are
    engine-identical (Spark conv(·,16,10) ≡ DuckDB '0x'-cast, both
    ≤2^60 so no sign wrap); bit_xor is exact integer.  The ``validate``
    CLI verb runs this on two directories and compares."""
    return digest_frame(spark, sf_dir)


def _cell_expr_sql(c: str, kind: str) -> str:
    """DuckDB canonical CELL string for a column (no NULL sentinel —
    NULL cells are counted separately and skipped by both engines'
    NULL-ignoring aggregates)."""
    if kind == "int":
        return f"CAST({c} AS VARCHAR)"
    if kind == "str":
        return c
    if kind == "ts":
        return f"CAST(epoch_us({c}) AS VARCHAR)"
    return f"CAST(CAST(ROUND({c} * 10000, 0) AS BIGINT) AS VARCHAR)"


def _column_digest_oracle() -> str:
    parts = []
    for t, cols in TABLE_DIGEST_SPEC.items():
        for c, kind in cols:
            h = (
                "CAST('0x' || substr(md5("
                + _cell_expr_sql(c, kind)
                + "), 1, 15) AS BIGINT)"
            )
            parts.append(
                f"SELECT '{t}' AS table_name,"
                f" '{c}' AS column_name,"
                f" CAST(COUNT(*) FILTER (WHERE {c} IS NULL) AS BIGINT)"
                f" AS n_nulls,"
                f" CAST(COALESCE(bit_xor({h}), 0) AS BIGINT) AS digest,"
                f" CAST(COALESCE(CAST(SUM({h}) % {DIGEST_SUM_MOD}"
                f" AS BIGINT), 0) AS BIGINT) AS digest_sum"
                f" FROM {t}"
            )
    return (
        " UNION ALL ".join(parts) + " ORDER BY table_name, column_name"
    )


def _cell_expr_col(c: str, kind: str):
    """Spark twin of :func:`_cell_expr_sql`."""
    if kind == "int":
        return F.col(c).cast("string")
    if kind == "str":
        return F.col(c)
    if kind == "ts":
        return F.unix_micros(F.col(c)).cast("string")
    return F.round(F.col(c) * 10000, 0).cast("long").cast("string")


def column_digest_frame(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> DataFrame:
    """(table_name, column_name, n_nulls, digest, digest_sum) — the
    per-COLUMN fingerprint behind ``table_column_digest``, exposed for
    the ``validate --by-column`` CLI path."""
    frames = []
    for t in tables if tables is not None else list(TABLE_DIGEST_SPEC):
        cols = TABLE_DIGEST_SPEC[t]
        # |columns| md5s per row is hash-compute-heavy, and fixture
        # parquet is one unsplittable row group, so the whole hash
        # projection would serialize on one core (the documented trap;
        # measured 8.2 s -> 3.5 s parallel at sf0.1).  The repartition
        # is NOT free on real input — .repartition(n) always inserts a
        # round-robin exchange, and a multi-file 100 TB table already
        # arrives spread across splits — so pay it ONLY when the scan
        # yields fewer partitions than cores.  table_row_digest
        # (1 hash/row) deliberately never pays this shuffle.
        df = load_table(spark, sf_dir, t)
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
        # originals (for the NULL counts) + one hash column per column
        proj = [F.col(c) for c, _ in cols]
        for c, kind in cols:
            cell = _cell_expr_col(c, kind)
            proj.append(
                F.conv(F.substring(F.md5(cell), 1, 15), 16, 10)
                .cast("long")
                .alias(f"__h_{c}")
            )
        hashed = df.select(*proj)
        aggs = []
        for c, _kind in cols:
            # coalesce: SUM over a zero-row table is NULL in Spark but
            # the oracle's COUNT(*) FILTER is 0 — align on 0.
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.when(F.col(c).isNull(), 1).otherwise(0)
                    ).cast("long"),
                    F.lit(0).cast("long"),
                ).alias(f"__nn_{c}")
            )
            aggs.append(
                F.coalesce(F.expr(f"bit_xor(__h_{c})"), F.lit(0))
                .cast("long")
                .alias(f"__dx_{c}")
            )
            aggs.append(
                F.coalesce(
                    F.expr(
                        f"CAST(pmod(SUM(CAST(__h_{c} AS DECIMAL(38,0))),"
                        f" {DIGEST_SUM_MOD}) AS BIGINT)"
                    ),
                    F.lit(0),
                ).alias(f"__ds_{c}")
            )
        one = hashed.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', __nn_{c}, __dx_{c}, __ds_{c}" for c, _ in cols
        )
        frames.append(
            one.selectExpr(
                f"stack({len(cols)}, {stack_args})"
                " AS (column_name, n_nulls, digest, digest_sum)"
            ).select(
                F.lit(t).alias("table_name"),
                "column_name",
                "n_nulls",
                "digest",
                "digest_sum",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return sort_bounded(out, "table_name", "column_name")


@register("table_column_digest", oracle=_column_digest_oracle())
def table_column_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-COLUMN content fingerprint of every catalog table —
    (n_nulls, XOR of per-cell hashes, Σ cell hashes mod 2^61-1): the
    drill-down that LOCALIZES a migration mismatch after
    ``table_row_digest`` flags a table (one rewrite bug typically
    mangles one column — rounding a money column, shifting a timestamp
    zone, truncating a string — and the row digest alone can't say
    which).  The ``validate --by-column`` CLI path compares these
    frames across two directories.

    Semantics: NULL cells are SKIPPED by both digests (both engines'
    aggregates ignore NULL — md5(NULL) is NULL) and counted separately
    in ``n_nulls``, so a NULL→value flip moves (n_nulls, digest,
    digest_sum) together and a value→value flip moves the two digests
    only.  Column-level digests are order-insensitive like the row
    digest, and the modular sum closes the XOR duplicate-pair blindness
    the same way.

    Shape: ONE scan per table — every column's three aggregates ride a
    single map-side-combined 1-row aggregate (no shuffle wider than one
    row per partition), then a literal-bounded ``stack`` unpivots the
    row to |columns| rows; the ≤57-row union sorts via sort_bounded.
    Parity: canonical cell strings reuse the row digest's kind rules
    (money ×1e4 fixed-point, timestamps integer µs, ints/strings
    verbatim — never a raw double); the 15-hex md5 prefix → BIGINT and
    the DECIMAL(38,0)/HUGEINT exact sums are the pinned r15/r16
    primitives."""
    return column_digest_frame(spark, sf_dir)


def _events_row_hash_sql() -> str:
    """DuckDB per-row hash of the events canonical row string (the
    same kind rules as :func:`_digest_oracle`)."""
    exprs = []
    for c, kind in TABLE_DIGEST_SPEC["events"]:
        if kind == "int":
            e = f"CAST({c} AS VARCHAR)"
        elif kind == "str":
            e = c
        elif kind == "ts":
            e = f"CAST(epoch_us({c}) AS VARCHAR)"
        else:  # money
            e = (f"CAST(CAST(ROUND({c} * 10000, 0) AS BIGINT) "
                 "AS VARCHAR)")
        exprs.append(f"COALESCE({e}, '{_DIGEST_NULL}')")
    s = "concat_ws('|', " + ", ".join(exprs) + ")"
    return f"CAST('0x' || substr(md5({s}), 1, 15) AS BIGINT)"


def partition_digest_frame(
    spark: SparkSession, sf_dir: str, glob: str | None = None
) -> DataFrame:
    """(epoch_day, n_rows, digest, digest_sum) for the day-partitioned
    events feed — the computation behind ``table_partition_digest``,
    exposed so the ``validate --by-day`` CLI path can localize WHICH
    day a backfill mangled after the table digest flags the feed.

    With ``glob`` set, reads a LIVE feed directory of flat parquet
    files (the ``validate --continuous`` layout) instead of the
    catalog's ``events.parquet`` — used to name the diverging days in
    the continuous path's 205 message.  The default path is unchanged
    (``table_partition_digest``'s registered plan)."""
    if glob is not None:
        ev = spark.read.option("pathGlobFilter", glob).parquet(sf_dir)
        for f_name, f_type in ev.dtypes:
            if f_type == "timestamp_ntz":
                # the catalog ntz shim, value-exact under the UTC
                # session tz (round-5 rule)
                ev = ev.withColumn(f_name, F.col(f_name).cast("timestamp"))
    else:
        ev = load_table(spark, sf_dir, "events")
    _s, h = row_hash_expr("events")
    return sort_bounded(
        ev.select(
            F.expr(
                "CAST(unix_micros(ts) div 86400000000 AS BIGINT)"
            ).alias("epoch_day"),
            h.alias("h"),
        )
        .groupBy("epoch_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.coalesce(F.expr("bit_xor(h)"), F.lit(0))
            .cast("long")
            .alias("digest"),
            F.coalesce(
                F.expr(
                    "CAST(pmod(SUM(CAST(h AS DECIMAL(38,0))), "
                    f"{DIGEST_SUM_MOD}) AS BIGINT)"
                ),
                F.lit(0),
            ).alias("digest_sum"),
        ),
        "epoch_day",
    )


@register(
    "table_partition_digest",
    oracle=f"""
    SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS epoch_day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(bit_xor({_events_row_hash_sql()}), 0)
                AS BIGINT) AS digest,
           CAST(COALESCE(CAST(SUM({_events_row_hash_sql()})
                              % {DIGEST_SUM_MOD} AS BIGINT), 0)
                AS BIGINT) AS digest_sum
    FROM events
    GROUP BY epoch_day
    ORDER BY epoch_day
    """,
)
def table_partition_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DAY-partition content fingerprint of the events feed —
    (n_rows, XOR, Σ mod 2^61-1 of the SAME canonical row hashes as
    ``table_row_digest``): the incremental-backfill validator.  A
    day-partitioned fact table re-verifies only the partitions a
    backfill touched (compare the affected epoch_day rows, not the
    whole table), and a table-level mismatch localizes to the exact
    day before anyone reads a diff.  Because partitions are a disjoint
    union of the table's rows and both digests are
    commutative/associative, XOR of the partition digests (and mod-p
    sum of the partition sums) EQUALS the table-level digest — the
    cross-op consistency pin, and the reason a validator can roll
    partition results up instead of rescanning.

    Shape: one scan, one epoch_day-keyed map-side-combined aggregate —
    group count is CALENDAR-bounded (one row per active day at any
    traffic volume), so the close sorts via sort_bounded like every
    day-ledger op.  Parity: the per-row hash IMPORTS ``row_hash_expr``
    (the canonical string cannot drift from the table digest); day key
    is the established integer-µs div (Spark ``div`` ≡ DuckDB ``//``
    on the post-epoch domain); exact DECIMAL(38,0)/HUGEINT modular
    sums as in the parent ops.  The ``validate --by-day`` CLI path
    compares these frames across two directories and names the
    diverging days."""
    return partition_digest_frame(spark, sf_dir)
