"""Warehouse-maintenance operators: the CDC/dimension patterns every
lakehouse runs nightly — latest-record compaction (SCD type 1 view),
slowly-changing-dimension interval reconstruction (SCD type 2), and
calendar-spine densification.  All are single- or two-window shapes over
one keyed shuffle; nothing here needs state beyond what the window
partitioning already co-locates, which is exactly why they survive
100 TB.  The reference has no warehouse surface (SURVEY §2.A.4); the
physical-sink counterpart is ``sinks/writers.py``'s ``upsert_parquet``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table


@register(
    "latest_snapshot",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
           ROUND(value, 6) AS value
    FROM events
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id
        ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
    """,
)
def latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the SCD-1 / CDC-compaction view (the
    batch form of "apply the changelog, keep the newest version").

    One shuffle on the key; WindowGroupLimit pushes the rank-1 cut
    map-side so only per-partition winners reach the exchange.  The
    ordering carries the unique event_id tiebreaker (ts alone is not
    unique — parity rule from relational.py).  The physical-write twin
    is ``upsert_parquet`` (sinks/writers.py), which merges such a
    snapshot into a stored table."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(
        ts_us.desc(), F.col("event_id").desc()
    )
    return (
        e.select(
            "user_id",
            "event_id",
            ts_us.alias("ts_us"),
            "event_type",
            F.round("value", 6).alias("value"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "scd2_intervals",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
               LAG(event_type) OVER w AS prev_type
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    changes AS (
        SELECT user_id, event_type, event_id, ts_us
        FROM seq
        WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           ts_us AS valid_from_us,
           LEAD(ts_us) OVER (PARTITION BY user_id
                             ORDER BY ts_us, event_id) AS valid_to_us
    FROM changes
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history reconstruction: collapse a per-key changelog to
    validity intervals — a row survives only where the tracked attribute
    CHANGES, and each surviving row's interval runs to the next change
    (NULL = still current).  This is the dimension-history build every
    warehouse derives from CDC feeds.

    Two windows over the SAME (user_id)-keyed shuffle — Catalyst plans
    one exchange; the second window runs on the change rows only.
    Integer-µs bounds; (ts, event_id) total order on both passes.
    The reconstruction itself is :func:`scd2_from_changelog`, shared
    with the ``apply_scd2_batch`` sink (sinks/writers.py).
    NULL-ts changelog rows cannot be sequenced — dropped on BOTH
    engines (null-catalog audit, r18)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    changelog = e.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    )
    return scd2_from_changelog(changelog)


def scd2_from_changelog(changelog: DataFrame) -> DataFrame:
    """(user_id, event_type, ts_us, event_id) changelog → SCD2 validity
    intervals (user_id, event_type, valid_from_us, valid_to_us).

    The shared reconstruction core of the batch ``scd2_intervals``
    operator and the ``apply_scd2_batch`` incremental sink: lag-compare
    to keep only attribute CHANGES, lead() for each change's validity
    end — two windows over one (user_id)-keyed exchange, (ts_us,
    event_id) total order on both passes."""
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = changelog.select(
        "user_id",
        "event_type",
        "event_id",
        "ts_us",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changes = seq.where(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
    )


@register(
    "date_spine_monthly",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
               date_trunc('month', MAX(o_orderdate)) AS hi
        FROM orders
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m
        FROM bounds
    ),
    actual AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               COUNT(*)                    AS n_orders,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders
        GROUP BY 1
    )
    SELECT strftime(spine.m, '%Y-%m')            AS month,
           CAST(COALESCE(actual.n_orders, 0) AS BIGINT) AS n_orders,
           COALESCE(actual.revenue, 0.0)         AS revenue
    FROM spine LEFT JOIN actual ON actual.m = spine.m
    ORDER BY month
    """,
)
def date_spine_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine densification: a generated month dimension LEFT
    JOINed to the monthly revenue rollup so empty months surface as
    explicit zero rows — the dbt date-spine pattern, and the batch
    analogue of ``events_gapfill``'s stream form.

    The spine is sequence() over the corpus [min, max] month bounds —
    computed as a 1-row aggregate, exploded to |months| rows, always
    broadcastable; the fact side is one grouped shuffle.  Plain explode
    (codegen Generate) per the computed-array rule; month emitted as a
    formatted string so both engines hash identical values."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("m")
    )  # plain explode, NOT explode_outer: zero-row input makes the
    # bounds NULL and explode_outer would emit one NULL row where
    # DuckDB's unnest emits none (empty-catalog audit, r17); explode
    # drops the NULL array outright — the outer+isNotNull-filter form
    # was exactly equivalent and must not reappear (r17 advice)
    actual = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
    )
    # no broadcast hint: Spark cannot build the PRESERVED side of a
    # left-outer BHJ (the r12 lesson — a hint there is silently
    # ignored); the months-bounded aggregate's own estimate already
    # yields BHJ BuildRight, plan-checked r18
    return (
        spine
        .join(actual, "m", "left")
        .select(
            F.date_format("m", "yyyy-MM").alias("month"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias(
                "n_orders"
            ),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
        .transform(sort_bounded, "month")
    )


@register(
    "revenue_mom_growth",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
               date_trunc('month', MAX(o_orderdate)) AS hi
        FROM orders
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS m
        FROM bounds
    ),
    actual AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               ROUND(SUM(o_totalprice), 4) AS revenue
        FROM orders
        GROUP BY 1
    ),
    dense AS (
        SELECT spine.m, COALESCE(actual.revenue, 0.0) AS revenue
        FROM spine LEFT JOIN actual ON actual.m = spine.m
    )
    SELECT strftime(m, '%Y-%m') AS month,
           revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY m))
                 / NULLIF(LAG(revenue) OVER (ORDER BY m), 0), 6)
               AS mom_growth
    FROM dense
    ORDER BY month
    """,
)
def revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth over the DENSIFIED month spine —
    the BI trend line done right: missing months appear as explicit
    zeros (so the growth series shows the crash, instead of silently
    comparing across the gap), the first month and zero-denominator
    months yield NULL via NULLIF.

    The lag window is ordered over the |months| spine — a bounded frame
    (decades = hundreds of rows), which is the ONE case a global-order
    window is fine at any scale; the data-sized work is the same one
    grouped shuffle as ``date_spine_monthly``.  Parity: revenue is the
    4dp-rounded sum (boundary-free, round-6 rule), and growth is a
    single division of identical doubles rounded 6dp."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("m")
    )  # plain explode, NOT explode_outer: zero-row input makes the
    # bounds NULL and explode_outer would emit one NULL row where
    # DuckDB's unnest emits none (empty-catalog audit, r17); explode
    # drops the NULL array outright — the outer+isNotNull-filter form
    # was exactly equivalent and must not reappear (r17 advice)
    actual = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.round(F.sum("o_totalprice"), 4).alias("revenue"))
    # no broadcast hint on the preserved side (r12 lesson, see
    # date_spine_monthly) — the months-bounded aggregate gets BHJ
    # BuildRight from its own estimate
    dense = (
        spine
        .join(actual, "m", "left")
        .select("m", F.coalesce("revenue", F.lit(0.0)).alias("revenue"))
    )
    w = Window.orderBy("m")
    prev = F.lag("revenue").over(w)
    return (
        dense.select(
            F.date_format("m", "yyyy-MM").alias("month"),
            "revenue",
            F.round(
                (F.col("revenue") - prev) / F.nullif(prev, F.lit(0)), 6
            ).alias("mom_growth"),
        )
        .transform(sort_bounded, "month")
    )


@register(
    "orders_backlog_aging",
    oracle="""
    WITH bounds AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    aged AS (
        SELECT o_orderstatus,
               o_totalprice,
               datediff('day', o_orderdate, bounds.maxd) AS age_days
        FROM orders CROSS JOIN bounds
    )
    SELECT o_orderstatus,
           CASE WHEN age_days <= 30 THEN '00-030d'
                WHEN age_days <= 90 THEN '031-090d'
                WHEN age_days <= 365 THEN '091-365d'
                ELSE '365d+' END          AS age_bucket,
           CAST(COUNT(*) AS BIGINT)      AS n_orders,
           ROUND(SUM(o_totalprice), 4)   AS total_value,
           CAST(MIN(age_days) AS BIGINT) AS min_age_days,
           CAST(MAX(age_days) AS BIGINT) AS max_age_days
    FROM aged
    GROUP BY 1, 2
    ORDER BY o_orderstatus, age_bucket
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog aging report: order count and value by status × age
    bucket relative to the newest order date — the ops dashboard that
    finds stuck open orders (a warehouse 'P' row aging past a year is a
    process bug, not commerce).

    Shape: a 1-row MAX bounds broadcast over the scan, the age and its
    CASE bucket computed map-side, one ≤|status|×4-row aggregate,
    sort_bounded.  Parity: ages are exact integer day differences on
    both engines; the value sum rounds 4dp (revenue rule); bucket
    labels are zero-padded so lexicographic ORDER BY equals age
    order."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(F.max("o_orderdate").alias("maxd"))
    age = F.datediff(F.col("maxd"), F.col("o_orderdate"))
    bucket = (
        F.when(age <= 30, "00-030d")
        .when(age <= 90, "031-090d")
        .when(age <= 365, "091-365d")
        .otherwise("365d+")
    )
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(
            "o_orderstatus",
            bucket.alias("age_bucket"),
            "o_totalprice",
            age.alias("age_days"),
        )
        .groupBy("o_orderstatus", "age_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_value"),
            F.min("age_days").cast("long").alias("min_age_days"),
            F.max("age_days").cast("long").alias("max_age_days"),
        )
        .transform(sort_bounded, "o_orderstatus", "age_bucket")
    )


# ---------------------------------------------------------------------------
# in-flight order ledger (r12) — monthly open-order peaks via delta sweep
# ---------------------------------------------------------------------------


@register(
    "orders_inflight_monthly",
    oracle="""
    WITH spans AS (
        SELECT o.o_orderkey,
               epoch_us(o.o_orderdate) // 86400000000 AS s,
               MAX(epoch_us(l.l_shipdate) // 86400000000) AS e
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate IS NOT NULL AND l.l_shipdate IS NOT NULL
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
        SELECT s AS day, CAST(1 AS BIGINT) AS net FROM spans
        UNION ALL
        SELECT e + 1 AS day, CAST(-1 AS BIGINT) AS net FROM spans
    ),
    ledger AS (
        SELECT day, CAST(SUM(net) AS BIGINT) AS net
        FROM deltas GROUP BY day
    ),
    cum AS (
        SELECT day,
               CAST(SUM(net) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS open_cnt,
               strftime(DATE '1970-01-01' + INTERVAL (day) DAY,
                        '%Y-%m') AS month
        FROM ledger
    ),
    per_m AS (
        SELECT month,
               CAST(MAX(open_cnt) AS BIGINT) AS mx,
               CAST(arg_max(open_cnt, day) AS BIGINT) AS last_cnt
        FROM cum GROUP BY month
    ),
    bounds AS (
        SELECT date_trunc('month', MIN(DATE '1970-01-01'
                   + INTERVAL (day) DAY)) AS lo,
               date_trunc('month', MAX(DATE '1970-01-01'
                   + INTERVAL (day) DAY)) AS hi
        FROM ledger
    ),
    spine AS (
        SELECT strftime(unnest(generate_series(lo, hi,
                   INTERVAL 1 MONTH)), '%Y-%m') AS month
        FROM bounds
    ),
    filled AS (
        SELECT sp.month, p.mx, p.last_cnt,
               COALESCE(LAST_VALUE(p.last_cnt IGNORE NULLS) OVER (
                   ORDER BY sp.month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS carry_in
        FROM spine sp LEFT JOIN per_m p ON p.month = sp.month
    ),
    st AS (
        SELECT strftime(DATE '1970-01-01' + INTERVAL (s) DAY, '%Y-%m')
                   AS month,
               CAST(COUNT(*) AS BIGINT) AS n_started
        FROM spans GROUP BY 1
    ),
    cl AS (
        SELECT strftime(DATE '1970-01-01' + INTERVAL (e) DAY, '%Y-%m')
                   AS month,
               CAST(COUNT(*) AS BIGINT) AS n_closed
        FROM spans GROUP BY 1
    )
    SELECT f.month,
           GREATEST(COALESCE(f.mx, f.carry_in), f.carry_in)
               AS peak_open,
           COALESCE(f.last_cnt, f.carry_in) AS open_at_month_end,
           COALESCE(st.n_started, 0) AS n_started,
           COALESCE(cl.n_closed, 0)  AS n_closed
    FROM filled f
    LEFT JOIN st ON st.month = f.month
    LEFT JOIN cl ON cl.month = f.month
    ORDER BY f.month
    """,
)
def orders_inflight_monthly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How many orders are IN FLIGHT (placed, last line not yet
    shipped) — monthly peak and month-end level, with starts/closes —
    the fulfilment working-set view ``orders_backlog_aging`` (a
    point-in-time age profile) doesn't give: capacity planning reads
    the PEAK concurrent load, and a rising month-end level with flat
    starts means throughput is slipping.

    Shape: the sweep-line LEDGER decomposition
    (``sessions_peak_concurrency``'s pattern on order lifespans) — one
    orderkey-keyed MAX for the span end (rides the fact's natural
    key), ±1 deltas per order, a |days|-bounded ledger cumsum, then a
    |months|-bounded spine with carry-in forward fill for delta-free
    months.  NOTHING data-sized is ever sorted globally: the only
    unpartitioned windows run over the day ledger and the month spine
    (both calendar-bounded, the r9 SinglePartition classes).  Orders
    with no lineitem rows never open an interval (span needs a ship
    date; documented, matched by the oracle's inner join).  Parity:
    pure integer epoch-day math; counts exact BIGINT; month keys from
    integer days via the same date arithmetic both engines.  An order
    needs BOTH a start and an end day — NULL order/ship dates dropped
    on BOTH engines (null-catalog audit, r18: an unbalanced +1 with no
    matching −1 drifts the carry-in for every later month)."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull()
    ).select(
        "o_orderkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("s"),
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").isNotNull()
    ).select(
        "l_orderkey",
        F.expr("unix_micros(l_shipdate) div 86400000000").alias("d"),
    )
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "s")
        .agg(F.max("d").cast("long").alias("e"))
    )
    deltas = spans.select(
        F.col("s").alias("day"), F.lit(1).cast("long").alias("net")
    ).unionByName(
        spans.select(
            (F.col("e") + 1).alias("day"),
            F.lit(-1).cast("long").alias("net"),
        )
    )
    ledger = deltas.groupBy("day").agg(
        F.sum("net").cast("long").alias("net")
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    month_of_day = F.date_format(
        F.expr("date_add(DATE '1970-01-01', CAST(day AS INT))"),
        "yyyy-MM",
    )
    # bounded |days| ledger cumulative — never the order stream
    cum = ledger.select(
        "day",
        F.sum("net").over(w_cum).cast("long").alias("open_cnt"),
        month_of_day.alias("month"),
    )
    per_m = cum.groupBy("month").agg(
        F.max("open_cnt").cast("long").alias("mx"),
        F.max_by("open_cnt", "day").cast("long").alias("last_cnt"),
    )
    bounds = ledger.agg(
        F.expr(
            "date_trunc('month', date_add(DATE '1970-01-01', "
            "CAST(min(day) AS INT)))"
        ).alias("lo"),
        F.expr(
            "date_trunc('month', date_add(DATE '1970-01-01', "
            "CAST(max(day) AS INT)))"
        ).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.expr("sequence(lo, hi, interval 1 month)")
        ).alias("m")
    ).select(F.date_format("m", "yyyy-MM").alias("month"))
    w_fill = Window.orderBy("month").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # bounded |months| spine fill — the r9 dimension-bounded class
    filled = spine.join(per_m, "month", "left").select(
        "month",
        "mx",
        "last_cnt",
        F.coalesce(
            F.last("last_cnt", ignorenulls=True).over(w_fill),
            F.lit(0),
        ).alias("carry_in"),
    )
    st = spans.groupBy(
        F.date_format(
            F.expr("date_add(DATE '1970-01-01', CAST(s AS INT))"),
            "yyyy-MM",
        ).alias("month")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_started"))
    cl = spans.groupBy(
        F.date_format(
            F.expr("date_add(DATE '1970-01-01', CAST(e AS INT))"),
            "yyyy-MM",
        ).alias("month")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_closed"))
    return sort_bounded(
        filled.join(st, "month", "left")
        .join(cl, "month", "left")
        .select(
            "month",
            F.greatest(
                F.coalesce(F.col("mx"), F.col("carry_in")),
                F.col("carry_in"),
            )
            .cast("long")
            .alias("peak_open"),
            F.coalesce(F.col("last_cnt"), F.col("carry_in"))
            .cast("long")
            .alias("open_at_month_end"),
            F.coalesce(F.col("n_started"), F.lit(0))
            .cast("long")
            .alias("n_started"),
            F.coalesce(F.col("n_closed"), F.lit(0))
            .cast("long")
            .alias("n_closed"),
        ),
        "month",
    )
