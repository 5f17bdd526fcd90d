"""TPC-H breadth, second wave: the subquery-shaped queries (Q4/Q12/Q17/
Q18/Q22 analogues over the fixture schema).

These exercise the decorrelation patterns a SQL engine must plan well —
EXISTS → left-semi join with a non-equi residual, NOT EXISTS → left-anti
join, correlated per-group scalar → aggregate-then-rejoin, HAVING over a
grouped child feeding a join.  Cross-engine double rules per
``relational.py``: every aggregate-of-doubles that FEEDS A FILTER is
rounded identically on both sides; sums in the output are rounded at the
projection only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table


@register(
    "order_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (in a window) having at least one line
    shipped >30 days after order date, counted by priority.

    EXISTS decorrelates to a LEFT SEMI join whose condition carries the
    non-equi residual (l_shipdate > o_orderdate + 30 days) alongside the
    key equality — Spark plans the equality as the join key and the
    residual as a post-join filter, so there is exactly one shuffle pair
    and no row explosion."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    flagged = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )


@register(
    "late_shipment_classes",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_linestatus
    """,
)
def late_shipment_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: very-late lines (>60 days after order) split into
    high/low priority counts per line status — join + conditional
    aggregation where the join predicate itself is non-equi on top of the
    key.  One shuffle join, one partial-agg shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
            "high_line_count"
        ),
        F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias(
            "low_line_count"
        ),
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey, ROUND(0.2 * AVG(l_quantity), 4) AS qty_thresh
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE p.p_brand = 'Brand#11' AND l.l_quantity < pa.qty_thresh
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-one-fifth-of-average-quantity
    lines of one brand.  The correlated per-part AVG subquery decorrelates
    to aggregate-then-rejoin on l_partkey.

    Parity rule: the 0.2×AVG threshold is an aggregate of DOUBLES feeding
    a filter — rounded to 4dp on BOTH sides before the comparison (raw
    last-ulp drift between engines' summation orders could flip a
    boundary row); the output sum is rounded at projection only."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#11"
    ).select("p_partkey")
    pa = li.groupBy("l_partkey").agg(
        F.round(0.2 * F.avg("l_quantity"), 4).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, "l_partkey")
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


QTY_THRESHOLD = 150


@register(
    "large_volume_customer",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING ROUND(SUM(l_quantity), 4) > {QTY_THRESHOLD}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
           ROUND(b.total_qty, 4) AS total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a
    threshold, joined back to orders+customer, top-100 by price.

    The HAVING threshold compares the ROUNDED quantity sum on both sides
    (double aggregate feeding a filter); the top-100 carries a full total
    order (price DESC, orderkey) so LIMIT is deterministic cross-engine.
    Shape: one agg shuffle over lineitem, then two joins of the tiny
    survivor set (AQE broadcasts them)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.round("total_qty", 4) > QTY_THRESHOLD)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_totalprice",
            F.round("total_qty", 4).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "waiting_orders_per_supplier",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY s.s_name
    """,
)
def waiting_orders_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: late lines on finished orders where ANOTHER
    supplier is on the order but NO other supplier is also late —
    per-supplier count.  The hardest decorrelation in the suite: two
    correlated sub-queries (EXISTS + NOT EXISTS) against the fact table
    itself.

    The oracle runs the literal EXISTS form; Spark runs the SCALABLE
    equivalent — one pass of per-order supplier stats (distinct suppliers,
    distinct LATE suppliers) joined back on the order key:
    ``EXISTS(other supplier) ⟺ n_supp > 1`` and, for a late line,
    ``NOT EXISTS(other late supplier) ⟺ n_late_supp == 1``.  The hash
    match proves the rewrite.  At 100 TB this is two co-partitioned
    shuffles on l_orderkey (the groupBy reuses the join's partitioning)
    instead of two per-row correlated probes."""
    o_f = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    lines = li.join(
        o_f, F.col("l_orderkey") == F.col("o_orderkey")
    ).withColumn(
        "late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    waiting = (
        lines.where(F.col("late"))
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        waiting.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@register(
    "dormant_customers",
    oracle="""
    WITH thresh AS (
        SELECT ROUND(AVG(c_acctbal), 2) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer c CROSS JOIN thresh
    WHERE c.c_acctbal > thresh.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
)
def dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no RECENT
    orders (none since 1999), grouped by nation.

    NOT EXISTS with a correlated date filter decorrelates to a LEFT ANTI
    join against the pre-filtered recent orders; the global average is a
    1-row broadcast (rounded to 2dp both sides — double aggregate feeding
    a filter)."""
    c = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    thresh = c.where(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "string_agg_groups",
    oracle="""
    SELECT o_orderpriority,
           COALESCE(string_agg(DISTINCT o_orderstatus, ','
                               ORDER BY o_orderstatus), '')
               AS statuses,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def string_agg_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per group (GROUP_CONCAT/STRING_AGG):
    collect the distinct set, sort it, join to ONE scalar string — the
    repo rule for any collected set crossing the driver boundary (the
    canonicalizer cannot hash array cells).  At scale, cap the set with
    slice() before concat so a hot group cannot blow a task.
    The oracle COALESCEs to '' — over an all-NULL group Spark's
    concat_ws(empty collect_set) is '' while DuckDB's string_agg is
    NULL (null-catalog audit, r18); identical whenever any status is
    non-NULL."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_set("o_orderstatus"))
        ).alias("statuses"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )


@register(
    "numeric_correlations",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6)      AS qty_price_corr,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           ROUND(stddev_pop(l_discount), 6)                 AS discount_sd
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group second-moment statistics (corr / covar_pop / stddev_pop)
    — the profiling pass before feature selection.  All three are
    single-pass mergeable aggregates (sum, sum-of-squares, cross-sum), so
    one partial-aggregated shuffle at any scale; outputs rounded because
    moment accumulation order differs between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_pop("l_discount"), 6).alias("discount_sd"),
    )


ASOF_TOLERANCE_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback bound


@register(
    "join_asof_tolerance",
    oracle=f"""
    WITH o1 AS (
        SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN o1.o_orderdate IS NOT NULL
                 AND epoch_us(e.ts) - epoch_us(o1.o_orderdate)
                     <= {ASOF_TOLERANCE_US}
                THEN o1.o_orderkey END AS asof_orderkey,
           CASE WHEN o1.o_orderdate IS NOT NULL
                 AND epoch_us(e.ts) - epoch_us(o1.o_orderdate)
                     <= {ASOF_TOLERANCE_US}
                THEN strftime(o1.o_orderdate, '%Y-%m-%d %H:%M:%S')
           END AS asof_orderdate
    FROM events e
    ASOF LEFT JOIN o1
      ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-staleness as-of join: each event takes the user's most
    recent order at or before the event time ONLY if it is within a
    7-day lookback; staler matches become NULL (left semantics).

    Same union-merge formulation as ``join_asof`` (one shuffle on the
    user key, O(1) state per row, no range explosion); the tolerance is
    a pure projection on the propagated match timestamp in exact integer
    microseconds — no second join, no extra shuffle.  This is the form
    feature-store point-in-time lookups need (a match from last year is
    not a feature, it is leakage)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = ev.select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("r_orderkey"),
        F.lit(None).cast("timestamp").alias("r_orderdate"),
    )
    right = o.select(
        F.col("o_custkey").alias("uid"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("r_orderkey"),
        F.col("o_orderdate").alias("r_orderdate"),
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).select(
        "uid",
        "t",
        "is_event",
        "event_id",
        F.last("r_orderkey", ignorenulls=True).over(w).alias("m_orderkey"),
        F.last("r_orderdate", ignorenulls=True).over(w).alias("m_ts"),
    )
    fresh = (
        F.unix_micros(F.col("t")) - F.unix_micros(F.col("m_ts"))
    ) <= ASOF_TOLERANCE_US
    return merged.where(F.col("is_event") == 1).select(
        "event_id",
        F.col("uid").alias("user_id"),
        F.when(fresh, F.col("m_orderkey")).alias("asof_orderkey"),
        F.when(
            fresh, F.date_format("m_ts", "yyyy-MM-dd HH:mm:ss")
        ).alias("asof_orderdate"),
    )


@register(
    "cohort_ltv",
    oracle="""
    WITH first_o AS (
        SELECT o_custkey,
               MIN(date_trunc('month', o_orderdate)) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    monthly AS (
        SELECT f.cohort,
               date_diff('month', f.cohort,
                         date_trunc('month', o.o_orderdate)) AS offs,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
               ROUND(SUM(o.o_totalprice), 4) AS rev
        FROM orders o JOIN first_o f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT strftime(cohort, '%Y-%m') AS cohort_month,
           CAST(offs AS BIGINT)      AS month_offset,
           n_active,
           ROUND(SUM(rev) OVER (
               PARTITION BY cohort ORDER BY offs
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS cum_revenue
    FROM monthly
    """,
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by first-order month, the
    cohort's cumulative revenue tracked per month offset — the retention
    matrix's revenue twin.

    Shape: first-order aggregate (|customers| rows) joins back to the
    fact, ONE (cohort, offset) aggregate, then a running-sum window over
    the tiny aggregated matrix — the expensive pass is the one fact
    shuffle.  Parity: monthly revenue is rounded at 4dp BEFORE the
    cumulative window, so both engines accumulate identical inputs in
    identical order (unrounded monthly sums would drift at the ulp and
    compound through the running sum)."""
    o = load_table(spark, sf_dir, "orders")
    first_o = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", "o_orderdate")).alias("cohort")
    )
    monthly = (
        o.join(first_o, "o_custkey")
        .groupBy(
            "cohort",
            F.months_between(
                F.date_trunc("month", "o_orderdate"), F.col("cohort")
            ).cast("long").alias("offs"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_active"),
            F.round(F.sum("o_totalprice"), 4).alias("rev"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("offs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return monthly.select(
        F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
        F.col("offs").alias("month_offset"),
        "n_active",
        F.round(F.sum("rev").over(w), 4).alias("cum_revenue"),
    )


@register(
    "sole_late_supplier",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate
                                            + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) shape: lines
    shipped >60 days after order date where ANOTHER supplier was on the
    order (EXISTS) but NO other supplier was late (NOT EXISTS) — the
    one decorrelation pattern q2/q4/q20 don't cover: EXISTS and
    NOT EXISTS correlated against the SAME table with an inequality on
    an outer column from a third table (o_orderdate).  Shape cited from
    TPC-H spec Q21, lateness re-based on l_shipdate (the fixture has no
    l_receiptdate/l_commitdate).

    DataFrame form: EXISTS → LEFT SEMI, NOT EXISTS → LEFT ANTI, both on
    l_orderkey with the supplier-inequality (and lateness) residuals in
    the join condition — one shuffle pair per quantifier, no per-row
    re-scan; supplier names arrive by broadcast.  TakeOrderedAndProject
    caps the output (numwait DESC, s_name — total order, s_name is
    unique)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    late1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
        F.col("l_shipdate").alias("x_shipdate"),
    )
    with_other = late1.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_semi",
    )
    sole = with_other.join(
        l2,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey"))
        & (
            F.col("x_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "rfm_segments",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate),
                         (SELECT MAX(o_orderdate) FROM orders))
                   AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM(o_totalprice), 4) AS monetary
        FROM orders
        GROUP BY o_custkey
    ),
    th AS (
        SELECT ROUND(quantile_cont(recency_days, 0.25), 6) AS r1,
               ROUND(quantile_cont(recency_days, 0.50), 6) AS r2,
               ROUND(quantile_cont(recency_days, 0.75), 6) AS r3,
               ROUND(quantile_cont(frequency, 0.25), 6)    AS f1,
               ROUND(quantile_cont(frequency, 0.50), 6)    AS f2,
               ROUND(quantile_cont(frequency, 0.75), 6)    AS f3,
               ROUND(quantile_cont(monetary, 0.25), 6)     AS m1,
               ROUND(quantile_cont(monetary, 0.50), 6)     AS m2,
               ROUND(quantile_cont(monetary, 0.75), 6)     AS m3
        FROM cust
    ),
    seg AS (
        SELECT CASE WHEN recency_days <= r1 THEN 1
                    WHEN recency_days <= r2 THEN 2
                    WHEN recency_days <= r3 THEN 3 ELSE 4 END AS r_q,
               CASE WHEN frequency <= f1 THEN 1
                    WHEN frequency <= f2 THEN 2
                    WHEN frequency <= f3 THEN 3 ELSE 4 END AS f_q,
               CASE WHEN monetary <= m1 THEN 1
                    WHEN monetary <= m2 THEN 2
                    WHEN monetary <= m3 THEN 3 ELSE 4 END AS m_q,
               monetary
        FROM cust CROSS JOIN th
    )
    SELECT CAST(r_q AS BIGINT) AS r_q,
           CAST(f_q AS BIGINT) AS f_q,
           CAST(m_q AS BIGINT) AS m_q,
           CAST(COUNT(*) AS BIGINT)      AS n_customers,
           ROUND(SUM(monetary), 4)       AS total_monetary
    FROM seg
    GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles) — the classic CRM cube, built WITHOUT the classic global
    NTILE: a SinglePartition window over all customers dies at scale, so
    quartile THRESHOLDS come from one 9-percentile aggregate row that
    broadcasts back over the per-customer frame (same decomposition
    argument as ``global_row_number``).

    Shape: one orders shuffle (per-customer aggregate, persisted — two
    consumers), a 1-row threshold aggregate, broadcast crossJoin, then a
    ≤64-row segment rollup via sort_bounded.  Parity: recency/frequency
    are exact integers and monetary is a 4dp-rounded sum of 2-decimal
    prices (boundary-free); thresholds are interpolated percentiles
    (Spark percentile ≡ DuckDB quantile_cont) rounded 6dp on both
    engines BEFORE the bucket comparisons, so every CASE edge is
    deterministic."""
    o = load_table(spark, sf_dir, "orders")
    corpus_max = o.agg(F.max("o_orderdate").alias("max_date"))
    cust = (
        o.crossJoin(F.broadcast(corpus_max))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("max_date"), F.max("o_orderdate")).alias(
                "recency_days"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("o_totalprice"), 4).alias("monetary"),
        )
        .persist()
    )
    th = cust.agg(
        *[
            F.round(F.expr(f"percentile({col}, {p}D)"), 6).alias(name)
            for col, p, name in [
                ("recency_days", 0.25, "r1"),
                ("recency_days", 0.50, "r2"),
                ("recency_days", 0.75, "r3"),
                ("frequency", 0.25, "f1"),
                ("frequency", 0.50, "f2"),
                ("frequency", 0.75, "f3"),
                ("monetary", 0.25, "m1"),
                ("monetary", 0.50, "m2"),
                ("monetary", 0.75, "m3"),
            ]
        ]
    )

    def quart(col: str, t1: str, t2: str, t3: str):
        c = F.col(col)
        return (
            F.when(c <= F.col(t1), 1)
            .when(c <= F.col(t2), 2)
            .when(c <= F.col(t3), 3)
            .otherwise(4)
            .cast("long")
        )

    seg = cust.crossJoin(F.broadcast(th)).select(
        quart("recency_days", "r1", "r2", "r3").alias("r_q"),
        quart("frequency", "f1", "f2", "f3").alias("f_q"),
        quart("monetary", "m1", "m2", "m3").alias("m_q"),
        "monetary",
    )
    out = (
        seg.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary"), 4).alias("total_monetary"),
        )
        .transform(sort_bounded, "r_q", "f_q", "m_q")
        .persist()
    )
    out.count()  # materialize through the cached per-customer frame
    cust.unpersist()
    return out


@register(
    "customer_order_gap_percentiles",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               datediff('day',
                        LAG(o_orderdate) OVER (
                            PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey),
                        o_orderdate) AS gap_days
        FROM orders
    ),
    g AS (SELECT * FROM gaps WHERE gap_days IS NOT NULL)
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT)                       AS n_gaps,
           ROUND(quantile_cont(g.gap_days, 0.5), 4)       AS p50_gap_days,
           ROUND(quantile_cont(g.gap_days, 0.9), 4)       AS p90_gap_days,
           CAST(MAX(g.gap_days) AS BIGINT)                AS max_gap_days
    FROM g JOIN customer c ON c.c_custkey = g.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def customer_order_gap_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Re-order cadence profile: per-customer gaps between consecutive
    orders (lag window), summarized per market segment as interpolated
    percentiles — the churn-model feature table (a segment whose p90
    gap stretches is quietly churning long before counts drop).

    Shape: one custkey-keyed lag window, a broadcast customer join for
    the segment, a |segments|-row sort-aggregate.  Exact percentiles
    need each group's full gap set — the verifiable form; at 100 TB the
    sketch tier is approx_percentile (see ``percentiles_agg``'s scale
    note).  Parity: gaps are exact integer day differences with the
    (o_orderdate, o_orderkey) total order; F.percentile ≡ quantile_cont
    linear interpolation of exact integers, rounded 4dp."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    return (
        gaps.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            gaps.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.round(F.percentile("gap_days", 0.5), 4).alias(
                "p50_gap_days"
            ),
            F.round(F.percentile("gap_days", 0.9), 4).alias(
                "p90_gap_days"
            ),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
        .transform(sort_bounded, "c_mktsegment")
    )


@register(
    "supplier_part_coverage",
    oracle="""
    WITH rel AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand,
           CAST(p.p_size % 5 AS BIGINT)                 AS size_class,
           CAST(COUNT(DISTINCT rel.l_suppkey) AS BIGINT) AS supplier_cnt,
           CAST(COUNT(DISTINCT rel.l_partkey) AS BIGINT) AS part_cnt
    FROM rel
    JOIN part p ON p.p_partkey = rel.l_partkey
    WHERE p.p_brand <> 'Brand#1'
    GROUP BY p.p_brand, p.p_size % 5
    ORDER BY supplier_cnt DESC, p.p_brand, size_class
    """,
)
def supplier_part_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape over the fixture schema (which has no partsupp:
    the observed lineitem (part, supplier) pairs stand in for it):
    distinct supplier/part counts per brand × size class with a brand
    exclusion — the supplier-diversity report behind sourcing risk.

    Shape: DISTINCT on the fact's (part, supplier) pair first (the
    shuffle carries the deduped relation, far smaller than lineitem),
    then a broadcast part join and a two-level distinct aggregate.
    Parity: size_class is exact integer modulo; counts BIGINT; ordered
    with a (brand, size_class) tiebreak under the count."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rel = li.select("l_partkey", "l_suppkey").distinct()
    return (
        rel.join(
            F.broadcast(
                p.where(F.col("p_brand") != "Brand#1").select(
                    "p_partkey", "p_brand", "p_size"
                )
            ),
            rel.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            "p_brand",
            (F.col("p_size") % 5).cast("long").alias("size_class"),
        )
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias(
                "supplier_cnt"
            ),
            F.countDistinct("l_partkey").cast("long").alias("part_cnt"),
        )
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "size_class"
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q22 shape: wealthy dormant prospects per nation
# --------------------------------------------------------------------------

@register(
    "global_sales_opportunity",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c
        FROM customer
    ),
    posavg AS (
        SELECT CAST(SUM(bal_c) AS BIGINT)  AS s,
               CAST(COUNT(*) AS BIGINT)    AS n
        FROM cust WHERE bal_c > 0
    ),
    eligible AS (
        SELECT c.c_custkey, c.c_nationkey, c.bal_c
        FROM cust c CROSS JOIN posavg p
        WHERE c.bal_c * p.n > p.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT)              AS n_custs,
           CAST(SUM(e.bal_c) AS DOUBLE) / 100.0  AS total_acctbal
    FROM eligible e JOIN nation n ON n.n_nationkey = e.c_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape on the fixture schema (no phone country codes —
    the nation dimension stands in): count and total balance of
    customers holding an above-average positive balance who have NEVER
    ordered — the outbound-sales prospect list.

    Shape: one scalar aggregate (positive-balance sum/count) broadcast
    back over the customer scan, the above-average cut, then a keyed
    LEFT ANTI join against orders (the decorrelated NOT EXISTS — never
    a per-row subquery) and a |nations|-row rollup.  Parity: balances
    in ×100 BIGINT cents at birth; "above average" compares
    ``bal_c · n > s`` by INTEGER cross-multiplication — no division, so
    no customer can sit on a floating average boundary (the r2
    aggregate-feeding-a-filter rule, solved exactly); the total is an
    exact-integer/100 division.

    Reference: no query surface in the reference CLI (SURVEY §2.A.4);
    shape follows TPC-H Q22 (dbgen spec)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)").alias(
            "bal_c"
        ),
    )
    posavg = c.where(F.col("bal_c") > 0).agg(
        F.sum("bal_c").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    eligible = (
        c.crossJoin(F.broadcast(posavg))
        .where(F.col("bal_c") * F.col("n") > F.col("s"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    nation = load_table(spark, sf_dir, "nation")
    return sort_bounded(
        eligible.join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            (F.sum("bal_c").cast("double") / 100.0).alias(
                "total_acctbal"
            ),
        ),
        "n_name",
    )


# --------------------------------------------------------------------------
# customer cohort retention triangle (r13)
# --------------------------------------------------------------------------

@register(
    "customer_cohort_retention",
    oracle="""
    WITH om AS (
        SELECT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate)
                    AS BIGINT) AS m
        FROM orders
    ),
    fc AS (SELECT o_custkey, MIN(m) AS m0 FROM om GROUP BY o_custkey),
    act AS (
        SELECT DISTINCT om.o_custkey, fc.m0, om.m - fc.m0 AS off
        FROM om JOIN fc ON fc.o_custkey = om.o_custkey
    ),
    cs AS (
        SELECT m0, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM fc GROUP BY m0
    )
    SELECT act.m0 AS cohort_month,
           CAST(act.off AS BIGINT) AS month_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           cs.cohort_size,
           CAST(COUNT(*) AS DOUBLE) / cs.cohort_size AS retention_share
    FROM act JOIN cs ON cs.m0 = act.m0
    GROUP BY act.m0, act.off, cs.cohort_size
    ORDER BY cohort_month, month_offset
    """,
)
def customer_cohort_retention(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The cohort retention TRIANGLE: customers grouped by
    first-order month, each cohort's share still ordering N months
    later — the classic growth chart ``events_retention`` draws for
    event cohorts and ``cohort_ltv`` prices in revenue; this is the
    count/share layer a subscription review reads row by row.

    Shape: one orders scan feeds the per-customer first-month
    aggregate and the activity frame; the (customer, offset) DISTINCT
    and the triangle aggregate share the custkey/cohort keying, and
    the |cohorts|-row size frame broadcasts back — output is bounded
    by |months|², never customer-sized.  Parity: month keys are pure
    integers (year·12 + month — never an engine date-diff),
    retention_share an unrounded exact-integer ratio with
    cohort_size ≥ n_active ≥ 1 by construction; (cohort_month,
    month_offset) is a total order."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        F.year("o_orderdate").cast("long") * 12
        + F.month("o_orderdate").cast("long")
    )
    om = o.select("o_custkey", m.alias("m"))
    fc = om.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    act = (
        om.join(fc, "o_custkey")
        .select("o_custkey", "m0", (F.col("m") - F.col("m0")).alias("off"))
        .distinct()
    )
    cs = fc.groupBy("m0").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return sort_bounded(
        act.groupBy("m0", "off")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(F.broadcast(cs), "m0")
        .select(
            F.col("m0").alias("cohort_month"),
            F.col("off").cast("long").alias("month_offset"),
            "n_active",
            "cohort_size",
            (
                F.col("n_active").cast("double") / F.col("cohort_size")
            ).alias("retention_share"),
        ),
        "cohort_month",
        "month_offset",
    )
