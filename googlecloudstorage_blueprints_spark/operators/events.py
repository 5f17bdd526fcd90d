"""Event-stream operators (batch forms; streaming twins in streaming/).

SURVEY.md §2.B #20-#21.  Timestamp discipline: ``events.ts`` is parquet
TIMESTAMP(NANOS); the catalog loader converts to µs with truncating integer
division so Spark and the DuckDB oracle see identical values (see
sources/catalog.py).  All gap/window math below is integer microseconds —
exact on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

SESSION_GAP_SECONDS = 1800  # 30 min inactivity closes a session


@register(
    "events_sessionize",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id, event_id, ts_us,
           CAST(SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: lag(ts) flags a session break when the
    inactivity gap exceeds 30 min; a running sum of break flags numbers the
    sessions (0-based) per user.

    Scale: ONE shuffle on user_id serves both window passes (same
    partitioning); integer-µs math keeps it exact.  The streaming twin uses
    session_window() with a watermark (streaming/sessions.py)."""
    # NULL-ts events cannot be sequenced — dropped on BOTH engines
    # (null-catalog audit, r18: engine default NULL *ordering* differs,
    # Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST, so a NULL-ts row
    # silently renumbers every later session on one engine only)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap > SESSION_GAP_SECONDS * 1_000_000, 1).otherwise(0)
    seq = e.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        is_new.alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seq.select(
        "user_id",
        "event_id",
        "ts_us",
        F.sum("is_new").over(w2).cast("long").alias("session_id"),
    )


@register(
    "events_session_stats",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts_us, value,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM seq
    )
    SELECT user_id, session_id,
           COUNT(*)                            AS n_events,
           (MAX(ts_us) - MIN(ts_us)) // 1000000 AS duration_sec,
           ROUND(SUM(value), 4)                AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup on top of sessionization: event count, duration,
    value total.  Reuses the user_id partitioning — Catalyst plans the
    window and the aggregate over one exchange."""
    # NULL-ts events cannot be sequenced — dropped on BOTH engines
    # (null-catalog audit, r18: engine default NULL *ordering* differs,
    # Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST, so a NULL-ts row
    # silently renumbers every later session on one engine only)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap > SESSION_GAP_SECONDS * 1_000_000, 1).otherwise(0)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = e.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        "value",
        is_new.alias("is_new"),
    ).select(
        "user_id",
        "event_id",
        "ts_us",
        "value",
        F.sum("is_new").over(w2).cast("long").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # integer `div` (not float /): exact, matches DuckDB's `//`
        F.expr("(MAX(ts_us) - MIN(ts_us)) div 1000000").alias("duration_sec"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "events_tumbling_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           COUNT(*)                  AS n_events,
           COUNT(DISTINCT user_id)   AS n_users,
           ROUND(SUM(value), 4)      AS total_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation (batch form of a windowed stream agg;
    the streaming twin uses window('1 hour') + watermark).  Bucket emitted
    as a formatted string so both engines hash identical values."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        # |hourly buckets| rows (~88k for a decade of data): bounded sort
        .transform(sort_bounded, "bucket")
    )


@register(
    "events_type_pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error
    FROM events
    GROUP BY user_id
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types to per-user feature columns (the conditional-sum
    form: one pass, no pivot-shuffle, fixed output schema — preferred over
    .pivot() when the category set is known)."""
    e = load_table(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
        .cast("long")
        .alias(f"n_{t}")
        for t in ["click", "view", "purchase", "signup", "error"]
    ]
    return e.groupBy("user_id").agg(*aggs)


@register(
    "events_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, MIN(epoch_us(ts)) AS first_signup_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id,
               COUNT(*) AS n_purchases,
               ROUND(SUM(e.value), 4) AS purchase_value
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) >= s.first_signup_us
        GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT)          AS n_signed_up,
           CAST(COUNT(p.user_id) AS BIGINT)  AS n_converted,
           CAST(COALESCE(SUM(p.n_purchases), 0) AS BIGINT)
                                             AS total_purchases,
           ROUND(COALESCE(SUM(p.purchase_value), 0), 4)
                                             AS total_purchase_value
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion funnel: first-signup per user, then
    purchases at-or-after it, folded to one summary row.

    Scale shape: two per-user aggregations + one equi-join on user_id
    (the time predicate is a residual filter on the equi-join, NOT a range
    join), then a global single-row fold — the final agg shuffles exactly
    |users-with-purchases| pre-aggregated rows.  Timestamp math is integer
    microseconds on both engines (see module docstring)."""
    e = load_table(spark, sf_dir, "events")
    signups = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.unix_micros(F.min("ts")).alias("first_signup_us"))
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .join(signups, "user_id")
        .where(F.unix_micros(F.col("ts")) >= F.col("first_signup_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 4).alias("purchase_value"),
        )
    )
    return (
        signups.join(purchases, "user_id", "left_outer")
        .agg(
            F.count(F.lit(1)).alias("n_signed_up"),
            F.count("n_purchases").alias("n_converted"),
            F.coalesce(F.sum("n_purchases"), F.lit(0))
            .cast("long")
            .alias("total_purchases"),
            F.round(F.coalesce(F.sum("purchase_value"), F.lit(0.0)), 4).alias(
                "total_purchase_value"
            ),
        )
    )


@register("agg_approx_sketches")  # rows-only: sketch outputs are
# engine-specific by design (HLL++ / approx-percentile internals differ
# across engines); determinism within Spark is pinned in tests
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB default for distincts and quantiles: mergeable sketches.

    approx_count_distinct (HLL++, rsd 1%) and approx_percentile both
    partial-aggregate map-side — the shuffle carries fixed-size sketch
    state per group instead of the value set, which is what makes
    billion-distinct cardinalities and p99s tractable.  Exact twins for
    oracle parity: ``agg_distinct`` and ``percentiles_agg``."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias(
                "approx_users"
            ),
            F.approx_percentile("value", 0.5).alias("p50_value"),
            F.approx_percentile("value", 0.99).alias("p99_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "events_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               date_trunc('hour', MIN(ts)) AS h_lo,
               date_trunc('hour', MAX(ts)) AS h_hi
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h_lo, h_hi,
                                               INTERVAL 1 HOUR)) AS bucket
        FROM bounds
    ),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               ROUND(SUM(value), 4) AS hour_value
        FROM events GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT g.user_id,
           strftime(g.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           (h.hour_value IS NOT NULL) AS observed,
           COALESCE(h.hour_value,
                    LAST_VALUE(h.hour_value IGNORE NULLS) OVER (
                        PARTITION BY g.user_id ORDER BY g.bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               AS filled_value
    FROM grid g LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.bucket = h.bucket
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify each user's hourly grid with
    ``sequence()`` + explode, left-join observed hourly sums, forward-fill
    holes with ``last(ignorenulls)``.

    Scale shape: the grid explode is map-side (rows = Σ user spans); the
    only shuffles are the per-user aggregates and the fill window, all
    partitioned on user_id.  Forward fill is the same last-non-null window
    the as-of join uses — the canonical Spark idiom for interpolation.
    The first grid cells of a user (before any observation) stay NULL, as
    does the oracle's."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.round(F.sum("value"), 4).alias("hour_value"))
    )
    grid = (
        e.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("h_lo"),
            F.date_trunc("hour", F.max("ts")).alias("h_hi"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("h_lo", "h_hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "bucket"], "left_outer")
        .select(
            "user_id",
            F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.col("hour_value").isNotNull().alias("observed"),
            F.coalesce(
                "hour_value", F.last("hour_value", ignorenulls=True).over(w)
            ).alias("filled_value"),
        )
    )


@register(
    "events_retention",
    oracle="""
    WITH cohort AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, c.cohort_week,
               date_diff('week', c.cohort_week, date_trunc('week', e.ts))
                   AS week_offset
        FROM events e JOIN cohort c ON e.user_id = c.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted once per (cohort, week-offset) they were active in.

    Scale shape: cohort assignment is one per-user aggregate; the join
    back is equi on user_id (cohort side is |users| pre-aggregated rows);
    the distinct + count collapses map-side.  Week arithmetic uses
    date_trunc + integer week difference — exact on both engines."""
    e = load_table(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    ).select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_active_users",
    )


@register(
    "events_sliding_agg",
    oracle="""
    WITH exploded AS (
        SELECT unnest([
                   make_timestamp(epoch_us(ts) // 1800000000 * 1800000000),
                   make_timestamp((epoch_us(ts) // 1800000000 - 1)
                                  * 1800000000)
               ]) AS win_start,
               value
        FROM events WHERE ts IS NOT NULL
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM exploded
    GROUP BY win_start
    """,
)
def events_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 1-hour window every 30 minutes — each
    event lands in exactly two windows.  Spark's ``window(ts, len, slide)``
    expands rows map-side (like the oracle's explicit two-bucket unnest)
    then hash-aggregates: one shuffle of |windows| pre-aggregated rows.
    The streaming twin is the same expression under a watermark.

    NULL-ts events land in no window — dropped explicitly on BOTH
    engines (null-catalog audit, r18: the oracle's two-bucket unnest
    emitted a NULL win_start group Spark's window() never forms)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_anomaly",
    oracle="""
    WITH stats AS (
        SELECT event_type,
               AVG(value) AS mu,
               stddev_pop(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.mu) / s.sigma, 6) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE s.sigma > 0
      AND ABS(ROUND((e.value - s.mu) / s.sigma, 6)) > 2.5
    """,
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per event type: population stddev via one
    aggregate, broadcast back (|types| rows), flag events beyond 2.5σ.

    The aggregate-then-broadcast-join shape beats a window over the full
    table: the window would shuffle every row by event_type just to
    attach two numbers; the broadcast attaches them map-side.

    Parity rule (see relational.py): when an order-dependent double
    aggregate FEEDS A FILTER, the compared quantity must be rounded on
    both sides — Spark's partial/final summation order differs from
    DuckDB's, so a raw |value-mu| > 2.5*sigma can flip a boundary row
    between engines.  Both engines therefore threshold the 6dp-rounded
    z-score (the same value that is reported)."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"),
        F.stddev_pop("value").alias("sigma"),
    )
    zscore = F.round(
        (F.col("value") - F.col("mu")) / F.col("sigma"), 6
    )
    return (
        e.join(F.broadcast(stats), "event_type")
        .where((F.col("sigma") > 0) & (F.abs(zscore) > 2.5))
        .select(
            "event_id",
            "event_type",
            "value",
            zscore.alias("zscore"),
        )
    )


@register(
    "events_windowed_topk",
    oracle="""
    WITH hourly AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS bucket,
               user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 4) AS total_value
        FROM events
        GROUP BY 1, user_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY bucket
                   ORDER BY total_value DESC, user_id) AS rk
        FROM hourly
    )
    SELECT bucket, user_id, n_events, total_value, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite time+entity shape: hourly per-user aggregation, then
    top-3 users per hour.  Two shuffles total — (bucket, user) aggregate,
    then the rank window on bucket over PRE-AGGREGATED rows (never rank
    raw events); the rank<=k filter plans a WindowGroupLimit partial
    top-k.  Ties break on user_id for total order."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_format(
            F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
        ).alias("bucket"),
        "user_id",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        hourly.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
    )


@register(
    "events_hierarchical_rollup",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT)   AS n_events,
           ROUND(SUM(value), 4)       AS total_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY 1
    """,
)
def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate reuse (hypertable rollup pattern): DAILY
    aggregates computed FROM a persisted HOURLY rollup, never from raw
    events — while the oracle computes daily directly from raw, so the
    hash match proves the hierarchy composes exactly.

    Compositionality per aggregate: COUNT sums exactly; SUM re-sums (the
    4dp output rounding absorbs IEEE re-association); COUNT(DISTINCT
    event_type) is NOT sum-composable, so the hourly layer carries
    collect_set and the daily layer merges sets before counting — the
    same partial-state discipline a production rollup table stores
    (HLL sketches at scale, exact sets here for oracle parity, emitted
    only as their size — never as an array output column).

    At 100 TB the hourly table is ~3 orders of magnitude smaller than
    raw events: every daily/weekly/monthly query over it skips the raw
    scan entirely — this op IS that second-level query."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.collect_set("event_type").alias("types_partial"),
        )
        .persist()  # the materialized rollup table stand-in
    )
    daily = (
        hourly.groupBy(
            F.date_format(
                F.date_trunc("day", F.col("hour")), "yyyy-MM-dd"
            ).alias("day")
        )
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.round(F.sum("sum_value"), 4).alias("total_value"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("types_partial")))
            ).cast("long").alias("n_types"),
        )
        .persist()
    )
    # materialize the (days-sized) daily layer, then free the hourly
    # rollup — round-3 verdict: the un-unpersisted hourly cache leaked
    # across the driver's 98-query run
    daily.count()
    hourly.unpersist()
    return daily


CHANGE_THRESHOLD = 50.0


@register(
    "events_change_points",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, value,
               ROUND(value - LAG(value) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id), 6) AS delta
        FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id, event_id, value, delta
    FROM seq
    WHERE ABS(delta) > {CHANGE_THRESHOLD}
    """,
)
def events_change_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection, cheapest tier: consecutive per-user value
    deltas beyond a threshold (lag window over the total-ordered event
    sequence).  One shuffle on user_id; the delta is rounded to 6dp
    before BOTH the filter and the output (parity rule: any derived
    double feeding a filter is rounded identically on both engines —
    the subtraction itself is deterministic, the rounding removes the
    question)."""
    # NULL-ts events cannot be sequenced — dropped on BOTH engines
    # (null-catalog audit, r18: engine default NULL *ordering* differs,
    # Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST, so a NULL-ts row
    # silently renumbers every later session on one engine only)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    delta = F.round(F.col("value") - F.lag("value").over(w), 6)
    return (
        e.select("user_id", "event_id", "value", delta.alias("delta"))
        .where(F.abs(F.col("delta")) > CHANGE_THRESHOLD)
    )


@register(
    "events_interarrival",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS gap_us
        FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT)              AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT)                AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT)                AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT)                AS total_gap_us,
           CAST(FLOOR(CAST(MEDIAN(gap_us) AS DOUBLE)) AS BIGINT)
               AS median_gap_us
    FROM gaps
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile: per event type, stats over the gap to
    the previous event of the SAME USER (any type) — the load-model view
    a capacity planner reads (cf. the reference has no event surface;
    this extends SURVEY §2.B's behavioral family).

    All math is integer µs (exact on both engines); the median is an
    exact percentile over bigint gaps — DuckDB MEDIAN(bigint)
    interpolates to double then truncates back, Spark uses
    percentile(0.5) with the same interpolation, floor-cast on both.
    One shuffle on user_id for the lag window, then a bounded
    |event_type| aggregate; sort_bounded would fit but the output is
    5 rows and already grouped — a plain orderBy on the enum key keeps
    the oracle string shared."""
    # NULL-ts events cannot be sequenced — dropped on BOTH engines
    # (null-catalog audit, r18: engine default NULL *ordering* differs,
    # Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST, so a NULL-ts row
    # silently renumbers every later session on one engine only)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gaps = e.select(
        "event_type",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.sum("gap_us").alias("total_gap_us"),
            F.expr("CAST(FLOOR(percentile(gap_us, 0.5D)) AS BIGINT)").alias(
                "median_gap_us"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS dst
        FROM events WHERE ts IS NOT NULL
    ),
    counts AS (
        SELECT src, dst, COUNT(*) AS n
        FROM seq WHERE dst IS NOT NULL
        GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           ROUND(CAST(n AS DOUBLE)
                 / SUM(n) OVER (PARTITION BY src), 6) AS p
    FROM counts
    ORDER BY src, dst
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    count and row-normalized probability of event_type → next event_type.

    The lead window shuffles once on user_id; the |types|² count table is
    bounded (25 rows here), so the normalizing window runs on a tiny
    frame.  Parity: n and SUM(n) are exact bigints, so n/Σn is the
    exact-integer-ratio case — a single IEEE division, identical on both
    engines — rounded 6dp only for display symmetry."""
    # NULL-ts events cannot be sequenced — dropped on BOTH engines
    # (null-catalog audit, r18: engine default NULL *ordering* differs,
    # Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST, so a NULL-ts row
    # silently renumbers every later session on one engine only)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    w_src = Window.partitionBy("src")
    return (
        counts.select(
            "src",
            "dst",
            "n",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(w_src), 6
            ).alias("p"),
        )
        .orderBy("src", "dst")
    )


@register(
    "events_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
            FROM events),
    n AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_ab
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           CAST(p.n_ab AS BIGINT) AS n_both,
           ROUND(CAST(p.n_ab AS DOUBLE) * tot.n_users
                 / (CAST(na.n_t AS DOUBLE) * CAST(nb.n_t AS DOUBLE)), 6)
               AS lift
    FROM pairs p
    JOIN n na ON na.event_type = p.type_a
    JOIN n nb ON nb.event_type = p.type_b
    CROSS JOIN tot
    ORDER BY p.type_a, p.type_b
    """,
)
def events_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence with lift: for each unordered type pair,
    how many users did both, and the ratio of that count to what
    independence predicts — market-basket association over behavioral
    data, the same shape as ``source_vocab_overlap``'s key-bounded
    self-join.

    Scale: the self-join is keyed on user_id with fan-out bounded by
    |types|² per user (types are an enum, not data-sized); the distinct
    (user, type) frame is one hash-aggregate.  Parity: lift is
    (a·N)/(b·c) over exact integer counts — identical expression text,
    deterministic doubles — rounded 6dp for display symmetry."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    tot = e.agg(
        F.countDistinct("user_id").cast("double").alias("n_users")
    )
    n = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = n.alias("na")
    nb = n.alias("nb")
    lift = F.round(
        F.col("n_ab").cast("double")
        * F.col("n_users")
        / (F.col("na.n_t").cast("double") * F.col("nb.n_t").cast("double")),
        6,
    )
    return (
        pairs.join(F.broadcast(na), F.col("type_a") == F.col("na.event_type"))
        .join(F.broadcast(nb), F.col("type_b") == F.col("nb.event_type"))
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_both"),
            lift.alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "events_sessionized_funnel",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sessions AS (
        SELECT user_id, event_type, ts_us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW) AS BIGINT)
                   AS session_id
        FROM seq
    ),
    s1 AS (
        SELECT user_id, session_id,
               MIN(CASE WHEN event_type = 'view' THEN ts_us END) AS t_view
        FROM sessions GROUP BY user_id, session_id
    ),
    s2 AS (
        SELECT s1.user_id, s1.session_id, s1.t_view,
               MIN(CASE WHEN s.event_type = 'click'
                         AND s.ts_us >= s1.t_view
                        THEN s.ts_us END) AS t_click
        FROM s1 JOIN sessions s
          ON s.user_id = s1.user_id AND s.session_id = s1.session_id
        GROUP BY s1.user_id, s1.session_id, s1.t_view
    ),
    s3 AS (
        SELECT s2.user_id, s2.session_id, s2.t_view, s2.t_click,
               MIN(CASE WHEN s.event_type = 'purchase'
                         AND s.ts_us >= s2.t_click
                        THEN s.ts_us END) AS t_purchase
        FROM s2 JOIN sessions s
          ON s.user_id = s2.user_id AND s.session_id = s2.session_id
        GROUP BY s2.user_id, s2.session_id, s2.t_view, s2.t_click
    )
    SELECT CAST(COUNT(*) AS BIGINT)            AS n_sessions,
           CAST(COUNT(t_view) AS BIGINT)       AS n_viewed,
           CAST(COUNT(t_click) AS BIGINT)      AS n_clicked_after_view,
           CAST(COUNT(t_purchase) AS BIGINT)   AS n_purchased_after_click
    FROM s3
    """,
)
def events_sessionized_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel WITHIN sessions: each step must
    occur at-or-after the previous step's first occurrence in the SAME
    session — the product-analytics funnel (``events_funnel`` is the
    lifetime signup→purchase fold; this one is session-scoped and
    order-constrained).

    Scale: sessionization and all three step-resolution joins share the
    user_id partitioning (session_id is derived within it), so Catalyst
    plans one exchange for the windows and co-partitioned joins for the
    steps; the final fold shuffles |sessions| pre-aggregated rows into
    one.  The sessionized frame feeds three consumers — persisted,
    materialized, unpersisted.  Integer-µs step comparisons, exact on
    both engines."""
    # NULL-ts events cannot be sequenced — dropped on BOTH engines
    # (null-catalog audit, r18: engine default NULL *ordering* differs,
    # Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST, so a NULL-ts row
    # silently renumbers every later session on one engine only)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap > SESSION_GAP_SECONDS * 1_000_000, 1).otherwise(0)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            ts_us.alias("ts_us"),
            is_new.alias("is_new"),
        )
        .select(
            "user_id",
            "event_type",
            "ts_us",
            F.sum("is_new").over(w2).cast("long").alias("session_id"),
        )
        .persist()
    )
    key = ["user_id", "session_id"]
    s1 = sessions.groupBy(*key).agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts_us"))
        ).alias("t_view")
    )
    s2 = (
        s1.join(sessions, key)
        .groupBy("user_id", "session_id", "t_view")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_us") >= F.col("t_view")),
                    F.col("ts_us"),
                )
            ).alias("t_click")
        )
    )
    s3 = (
        s2.join(sessions, key)
        .groupBy("user_id", "session_id", "t_view", "t_click")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") >= F.col("t_click")),
                    F.col("ts_us"),
                )
            ).alias("t_purchase")
        )
    )
    out = s3.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked_after_view"),
        F.count("t_purchase").alias("n_purchased_after_click"),
    ).persist()
    out.count()  # materialize through the cached sessionized frame
    sessions.unpersist()
    return out


@register(
    "events_dau_wau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d),
    cover AS (
        SELECT user_id,
               unnest(generate_series(d, d + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY)) AS b
        FROM ud
    ),
    wau AS (SELECT b AS d, COUNT(DISTINCT user_id) AS wau
            FROM cover GROUP BY b)
    SELECT strftime(dau.d, '%Y-%m-%d')      AS day,
           CAST(dau.dau AS BIGINT)          AS dau,
           CAST(wau.wau AS BIGINT)          AS wau,
           CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
                                            AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    ORDER BY day
    """,
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    dashboard, built WITHOUT a rolling-distinct window (distinct counts
    don't merge across window frames): each (user, active-day) row is
    EXPLODED over the 7 trailing days it covers, turning the rolling
    distinct into a plain per-day COUNT DISTINCT — constant 7× fan-out
    of the distinct-activity frame, embarrassingly parallel, the
    decomposition that survives any corpus size.

    Shapes: one distinct aggregate, one 7-row-per-activity explode
    (explode_outer per the computed-array rule), two day-keyed counts, a
    |days|-bounded join and sort_bounded.  Stickiness is an exact
    integer ratio — unrounded by the exact-ratio rule."""
    e = load_table(spark, sf_dir, "events")
    # integer epoch-day keys (r9): the distinct/groupBy/join chain
    # shuffles longs instead of timestamps and the 7-day cover is a
    # plain integer sequence — measured ~20% faster at sf0.1, values
    # identical (day strings re-derived once at the end)
    ud = e.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    ).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode_outer(F.sequence(F.col("d"), F.col("d") + 6)).alias("b"),
    )
    wau = cover.groupBy(F.col("b").alias("d")).agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "d")
        .select(
            F.date_format(
                F.timestamp_micros(F.col("d") * 86_400_000_000),
                "yyyy-MM-dd",
            ).alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
        .transform(sort_bounded, "day")
    )


@register(
    "events_seasonality",
    oracle="""
    WITH hourly AS (
        SELECT event_type, hour(ts) AS hour_of_day, COUNT(*) AS n
        FROM events
        GROUP BY event_type, hour(ts)
    )
    SELECT event_type,
           CAST(hour_of_day AS BIGINT) AS hour_of_day,
           CAST(n AS BIGINT)           AS n,
           CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
                                       AS share_of_type
    FROM hourly
    ORDER BY event_type, hour_of_day
    """,
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: activity count
    and within-type share for each of the 24 clock hours — the diurnal
    fingerprint that separates human traffic from bot/batch traffic and
    calibrates anomaly baselines (``events_anomaly``) by time of day.

    Shape: one (type, hour)-keyed aggregate — map-side partial, shuffle
    carries ≤ |types|×24 rows — then a share window ON THE BOUNDED
    AGGREGATE (never the raw stream).  Parity: share is an exact
    integer ratio (SUM of exact longs per type is order-independent),
    unrounded by the exact-ratio rule; sort_bounded total order."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return (
        hourly.select(
            "event_type",
            "hour_of_day",
            F.col("n").cast("long").alias("n"),
            (
                F.col("n").cast("double")
                / F.sum("n").over(w).cast("double")
            ).alias("share_of_type"),
        )
        .transform(sort_bounded, "event_type", "hour_of_day")
    )


# fixed histogram bin width over events.value (range ~0-330 in the
# fixtures; 2-decimal values make value/width deterministic IEEE math,
# identical on both engines)
VALUE_HIST_BIN_WIDTH = 10


@register(
    "events_value_histogram",
    oracle=f"""
    SELECT event_type,
           CAST(FLOOR(value / {VALUE_HIST_BIN_WIDTH}.0) AS BIGINT)
               AS bin,
           CAST(FLOOR(value / {VALUE_HIST_BIN_WIDTH}.0) AS BIGINT)
               * {VALUE_HIST_BIN_WIDTH} AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6)     AS min_val,
           ROUND(MAX(value), 6)     AS max_val
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, bin
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type: bin counts plus the
    per-bin observed min/max — the distribution sketch a monitoring
    pipeline materializes instead of shipping raw values (the exact
    counterpart of the sketch tier in ``agg_approx_sketches``).

    Shape: one (type, bin)-keyed aggregate; the bin key is computed
    map-side so the shuffle carries ≤ |types|×|bins| partials.  Parity:
    FLOOR(value / literal) is deterministic IEEE division of identical
    doubles on both engines, and FLOOR-then-CAST sidesteps the DuckDB
    round-vs-Spark-truncate CAST divergence (round-6 rule); min/max are
    exact, rounded 6dp for symmetry only."""
    e = load_table(spark, sf_dir, "events")
    bin_col = F.floor(
        F.col("value") / F.lit(float(VALUE_HIST_BIN_WIDTH))
    ).cast("long")
    return (
        e.groupBy(
            "event_type",
            bin_col.alias("bin"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.min("value"), 6).alias("min_val"),
            F.round(F.max("value"), 6).alias("max_val"),
        )
        .select(
            "event_type",
            "bin",
            (F.col("bin") * VALUE_HIST_BIN_WIDTH).alias("bin_lo"),
            "n",
            "min_val",
            "max_val",
        )
        .transform(sort_bounded, "event_type", "bin")
    )


# exponential-decay trailing window: half-life 7 days over a 14-day cover
DECAY_HALF_LIFE_DAYS = 7
DECAY_WINDOW_DAYS = 14


@register(
    "events_decay_trend",
    oracle=f"""
    WITH daily AS (
        SELECT event_type,
               epoch_us(ts) // 86400000000 AS day_num,
               ROUND(SUM(value), 4)        AS v,
               CAST(ROUND(ROUND(SUM(value), 4) * 10000, 0) AS BIGINT)
                                           AS v4
        FROM events
        GROUP BY 1, 2
    ),
    offsets AS (
        SELECT unnest(range(0, {DECAY_WINDOW_DAYS})) AS k
    ),
    cover AS (
        SELECT d.event_type,
               d.day_num + o.k AS target_day,
               CAST(ROUND(POW(0.5, o.k / {DECAY_HALF_LIFE_DAYS}.0)
                          * 1000000, 0) AS BIGINT) AS w6,
               d.v4
        FROM daily d CROSS JOIN offsets o
    ),
    smoothed AS (
        SELECT event_type, target_day,
               CAST(SUM(w6 * v4) AS BIGINT) AS num,
               CAST(SUM(w6) AS BIGINT)      AS den
        FROM cover
        GROUP BY 1, 2
    )
    SELECT s.event_type,
           CAST(s.target_day AS BIGINT)  AS epoch_day,
           d.v                           AS day_value,
           ROUND(CAST(s.num AS DOUBLE)
                 / (CAST(s.den AS DOUBLE) * 10000.0), 6) AS decayed_mean
    FROM smoothed s
    JOIN daily d ON d.event_type = s.event_type
                AND d.day_num = s.target_day
    ORDER BY s.event_type, epoch_day
    """,
)
def events_decay_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed trailing mean of daily value per event type
    (half-life {hl} days over a {win}-day cover) — the smoothed trend
    line monitoring alerts on instead of raw daily totals, robust to
    single-day spikes yet fresher than a flat moving average.

    A rolling window can't weight rows BY DISTANCE from the frame end,
    so the decomposition mirrors ``events_dau_wau``: each daily total
    explodes over the {win} future days it influences with its decay
    weight attached, and a plain (type, day) aggregate re-assembles the
    smoothed value — constant {win}× fan-out of the BOUNDED daily frame
    (|types|×|days|), embarrassingly parallel at any scale.

    Parity: the weighted sums run in FIXED-POINT integers — v scaled
    1e4 (exact: the daily sum was rounded 4dp) and the 6dp pow() weight
    scaled 1e6 — because ROUND(SUM(double),6) is order-sensitive in the
    last ulp and a sum landing on a rounding boundary flips BETWEEN
    RUNS of the same engine (observed at sf0.01), not just between
    engines; integer sums are order-independent, so the ratio divides
    identical doubles on both engines.  Headroom: w6·v4 ≤ 1e6·v·1e4 —
    safe while a (type, day) value total stays under ~9·10⁸ (ANSI long
    overflow throws rather than corrupts).  The day key is exact
    integer-µs floor division."""
    e = load_table(spark, sf_dir, "events")
    v = F.round(F.sum("value"), 4)
    daily = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day_num"),
    ).agg(
        v.alias("v"),
        F.round(v * 10000, 0).cast("long").alias("v4"),
    )
    offsets = F.explode(
        F.array(*[F.lit(k) for k in range(DECAY_WINDOW_DAYS)])
    ).alias("k")
    cover = daily.select("event_type", "day_num", "v4", offsets).select(
        "event_type",
        (F.col("day_num") + F.col("k")).alias("target_day"),
        F.round(
            F.pow(
                F.lit(0.5), F.col("k") / F.lit(float(DECAY_HALF_LIFE_DAYS))
            )
            * 1000000,
            0,
        )
        .cast("long")
        .alias("w6"),
        "v4",
    )
    smoothed = cover.groupBy("event_type", "target_day").agg(
        F.sum(F.col("w6") * F.col("v4")).cast("long").alias("num"),
        F.sum("w6").cast("long").alias("den"),
    )
    s = smoothed.alias("s")
    d2 = daily.alias("d")
    return (
        s.join(
            d2,
            (F.col("d.event_type") == F.col("s.event_type"))
            & (F.col("d.day_num") == F.col("s.target_day")),
        )
        .select(
            F.col("s.event_type").alias("event_type"),
            F.col("s.target_day").cast("long").alias("epoch_day"),
            F.col("d.v").alias("day_value"),
            F.round(
                F.col("s.num").cast("double")
                / (F.col("s.den").cast("double") * 10000.0),
                6,
            ).alias("decayed_mean"),
        )
        .transform(sort_bounded, "event_type", "epoch_day")
    )


events_decay_trend.__doc__ = events_decay_trend.__doc__.format(
    hl=DECAY_HALF_LIFE_DAYS, win=DECAY_WINDOW_DAYS
)


# |z| threshold for the seasonal anomaly screen (rounded z on both engines)
SEASONAL_ANOMALY_Z = 3.0


@register(
    "events_anomaly_seasonal",
    oracle=f"""
    WITH stats AS (
        SELECT event_type, hour(ts) AS hour_of_day,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                    AS BIGINT)          AS s,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                        * CAST(ROUND(value * 100, 0) AS BIGINT))
                    AS BIGINT)          AS q
        FROM events
        GROUP BY 1, 2
    )
    SELECT e.event_id, e.event_type,
           CAST(hour(e.ts) AS BIGINT) AS hour_of_day,
           e.value,
           ROUND((e.value - CAST(st.s AS DOUBLE) / st.n / 100.0)
                 / SQRT(CAST(st.q AS DOUBLE) / st.n / 10000.0
                        - (CAST(st.s AS DOUBLE) / st.n / 100.0)
                          * (CAST(st.s AS DOUBLE) / st.n / 100.0)), 6)
               AS zscore
    FROM events e
    JOIN stats st ON st.event_type = e.event_type
                 AND st.hour_of_day = hour(e.ts)
    WHERE CAST(st.q AS DOUBLE) / st.n / 10000.0
          - (CAST(st.s AS DOUBLE) / st.n / 100.0)
            * (CAST(st.s AS DOUBLE) / st.n / 100.0) > 0
      AND ABS(ROUND((e.value - CAST(st.s AS DOUBLE) / st.n / 100.0)
                    / SQRT(CAST(st.q AS DOUBLE) / st.n / 10000.0
                           - (CAST(st.s AS DOUBLE) / st.n / 100.0)
                             * (CAST(st.s AS DOUBLE) / st.n / 100.0)),
                    6)) > {SEASONAL_ANOMALY_Z}
    """,
)
def events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted outliers: z-score against the (type,
    hour-of-day) baseline instead of the global per-type one — the
    detector ``events_seasonality`` exists to calibrate.  A value normal
    at peak hour is anomalous at 4am; the flat-baseline ``events_anomaly``
    cannot see that, and conversely diurnal peaks stop tripping it.

    Shape: a ≤|types|×24-row moment aggregate broadcast back onto the
    scan — same aggregate-then-broadcast shape as ``events_anomaly``
    (never a window shuffling every row to attach two numbers).
    Parity: explicit Σ/Σ² population-variance formula (r6 rule — no
    engine-native stddev across engines), accumulated as BIGINT
    fixed-point (value carries 2 decimals → ×100 at birth, r7 rule:
    double sums feeding a rounded filter are order-sensitive in the last
    ulp); mean/variance derived from the exact integer sums identically
    on both engines, z rounded 6dp before BOTH the filter and the
    output; zero-variance cells excluded identically.  Scale note: Σc²
    of 2dp values bounded ~1e5 stays within BIGINT through ~1e8 rows per
    (type, hour) cell — beyond that, shift the fixed-point scale down."""
    e = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value") * 100, 0).cast("long")
    stats = e.groupBy(
        "event_type", F.hour("ts").alias("hour_of_day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).alias("s"),
        F.sum(c * c).alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n") / F.lit(100.0)
    var = (
        F.col("q").cast("double") / F.col("n") / F.lit(10000.0)
        - mean * mean
    )
    z = F.round((F.col("value") - mean) / F.sqrt(var), 6)
    return (
        e.withColumn("hour_of_day", F.hour("ts"))
        .join(F.broadcast(stats), ["event_type", "hour_of_day"])
        .where((var > 0) & (F.abs(z) > SEASONAL_ANOMALY_Z))
        .select(
            "event_id",
            "event_type",
            F.col("hour_of_day").cast("long").alias("hour_of_day"),
            "value",
            z.alias("zscore"),
        )
    )


# duration histogram bin width for sessions (seconds)
SESSION_HIST_BIN_SECONDS = 300


@register(
    "session_duration_histogram",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {1800} * 1000000
                         OR LAG(epoch_us(ts)) OVER w IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
        SELECT user_id,
               SUM(is_start) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id,
               ts_us
        FROM seq
    ),
    bounds AS (
        SELECT user_id, session_id,
               (MAX(ts_us) - MIN(ts_us)) // 1000000 AS dur_s,
               COUNT(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    )
    SELECT CAST(dur_s // {SESSION_HIST_BIN_SECONDS} AS BIGINT) AS bin,
           CAST(dur_s // {SESSION_HIST_BIN_SECONDS}
                * {SESSION_HIST_BIN_SECONDS} AS BIGINT)        AS bin_lo_s,
           CAST(COUNT(*) AS BIGINT)                            AS n_sessions,
           CAST(SUM(n_events) AS BIGINT)                       AS n_events,
           CAST(MIN(dur_s) AS BIGINT)                          AS min_dur_s,
           CAST(MAX(dur_s) AS BIGINT)                          AS max_dur_s
    FROM bounds
    GROUP BY 1, 2
    ORDER BY bin
    """,
)
def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution in {w}-second bins — the engagement
    shape behind ``events_session_stats``' averages (a bimodal histogram
    means two behaviors averaged into a meaningless mean; the histogram
    is what actually gets reviewed).

    Shape: the same lag/cumsum sessionization as ``events_sessionize``
    (one user-keyed exchange serves both windows), per-session bounds,
    then a ≤|bins|-row histogram aggregate.  Parity: durations and bin
    keys are exact integer-µs/``div`` math end-to-end — no doubles
    anywhere."""
    # NULL-ts events cannot be sequenced — dropped on BOTH engines
    # (null-catalog audit, r18: engine default NULL *ordering* differs,
    # Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST, so a NULL-ts row
    # silently renumbers every later session on one engine only)
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    seq = e.select(
        "user_id",
        ts_us.alias("ts_us"),
        "event_id",
        F.when(
            F.lag(ts_us).over(w).isNull()
            | (ts_us - F.lag(ts_us).over(w) > 1800 * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    # event_id tiebreaker: with tied (user_id, ts_us) rows a ROWS frame
    # ordered by ts_us alone assigns sessions nondeterministically (and
    # differently across engines); total order matches the lag window.
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = seq.select(
        "user_id",
        F.sum("is_start").over(w2).alias("session_id"),
        "ts_us",
    )
    bounds = sess.groupBy("user_id", "session_id").agg(
        F.expr("(max(ts_us) - min(ts_us)) div 1000000").alias("dur_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bin_col = F.expr(f"dur_s div {SESSION_HIST_BIN_SECONDS}")
    return (
        bounds.groupBy(bin_col.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
            F.min("dur_s").cast("long").alias("min_dur_s"),
            F.max("dur_s").cast("long").alias("max_dur_s"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            (F.col("bin") * SESSION_HIST_BIN_SECONDS)
            .cast("long")
            .alias("bin_lo_s"),
            "n_sessions",
            "n_events",
            "min_dur_s",
            "max_dur_s",
        )
        .transform(sort_bounded, "bin")
    )


session_duration_histogram.__doc__ = session_duration_histogram.__doc__.format(
    w=SESSION_HIST_BIN_SECONDS
)


# ---------------------------------------------------------------------------
# heavy-tail index per event type (r12c) — Hill estimator on the top order
# statistics
# ---------------------------------------------------------------------------

HILL_TOP_M = 50


@register(
    "events_value_tail_index",
    oracle=f"""
    WITH pos AS (
        SELECT event_type, event_id, value
        FROM events WHERE value > 0
    ),
    ranked AS (
        SELECT event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id) AS rn,
               CAST(ROUND(ln(value) * 1000000) AS BIGINT) AS lnv_e6
        FROM pos
    ),
    agg AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN rn <= {HILL_TOP_M}
                             THEN lnv_e6 ELSE 0 END) AS BIGINT)
                   AS top_sum_e6,
               CAST(SUM(CASE WHEN rn = {HILL_TOP_M} + 1
                             THEN lnv_e6 ELSE 0 END) AS BIGINT)
                   AS thresh_e6,
               CAST(COUNT(*) AS BIGINT) AS n_pos
        FROM ranked GROUP BY event_type
        HAVING COUNT(*) > {HILL_TOP_M} + 1
    )
    SELECT event_type, n_pos,
           CAST({HILL_TOP_M} AS BIGINT) AS m_used,
           (top_sum_e6 - {HILL_TOP_M} * thresh_e6)
               / ({HILL_TOP_M} * 1000000.0) AS hill_gamma
    FROM agg ORDER BY event_type
    """,
)
def events_value_tail_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How heavy is each event type's value tail?  The Hill estimator
    γ̂ = (1/m)·Σᵢ₌₁..m [ln x₍ᵢ₎ − ln x₍ₘ₊₁₎] over the top m={HILL_TOP_M}
    order statistics (γ̂ ≈ 1/α; γ̂ ≥ 1 means an infinite-mean-like tail
    where capping/winsorizing decisions matter) — the parametric tail
    summary behind ``events_value_quantiles_by_type``'s raw quantiles
    and ``events_value_benford``'s digit screen.

    Shape: one scan, one |types|-keyed rank window (the
    ``topk_per_group`` idiom; per-type sort — at 100 TB swap the exact
    rank for a per-type count-min threshold pass), one bounded
    aggregate.  Parity: the transcendental is fixed-pointed PER TERM
    (round(ln·1e6) BIGINT — the r7 rule) so the sums are
    order-independent; the total order (value DESC, event_id) is
    unique on both engines; types with ≤ m+1 positive values are
    dropped by an identical HAVING; the final division is ONE exact-
    integer ratio emitted UNROUNDED (the r10 discipline — a 6dp ROUND
    here would sit on the …5e-7 divergence grid)."""
    e = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    ranked = e.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.round(F.log("value") * 1_000_000)
        .cast("long")
        .alias("lnv_e6"),
    )
    agg = (
        ranked.groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("rn") <= HILL_TOP_M, F.col("lnv_e6"))
                .otherwise(0)
            )
            .cast("long")
            .alias("top_sum_e6"),
            F.sum(
                F.when(F.col("rn") == HILL_TOP_M + 1, F.col("lnv_e6"))
                .otherwise(0)
            )
            .cast("long")
            .alias("thresh_e6"),
            F.count(F.lit(1)).cast("long").alias("n_pos"),
        )
        .where(F.col("n_pos") > HILL_TOP_M + 1)
    )
    return sort_bounded(
        agg.select(
            "event_type",
            "n_pos",
            F.lit(HILL_TOP_M).cast("long").alias("m_used"),
            (
                (
                    F.col("top_sum_e6")
                    - F.lit(HILL_TOP_M) * F.col("thresh_e6")
                ).cast("double")
                / F.lit(HILL_TOP_M * 1_000_000.0)
            ).alias("hill_gamma"),
        ),
        "event_type",
    )


events_value_tail_index.__doc__ = events_value_tail_index.__doc__.format(
    HILL_TOP_M=HILL_TOP_M
)


# ---------------------------------------------------------------------------
# seasonal-naive volume backtest (r12c) — is last week a good forecast?
# ---------------------------------------------------------------------------

_US_PER_DAY = 86_400_000_000

@register(
    "events_volume_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS (
        SELECT epoch_us(ts) // {_US_PER_DAY} AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    spine AS (
        SELECT unnest(generate_series(lo, hi)) AS d FROM bounds
    ),
    dense AS (
        SELECT spine.d, COALESCE(daily.c, 0) AS c
        FROM spine LEFT JOIN daily ON daily.d = spine.d
    ),
    scored AS (
        SELECT d, c,
               LAG(c, 7) OVER (ORDER BY d) AS pred
        FROM dense
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(ABS(c - pred)) AS BIGINT) AS total_abs_err,
           CAST(SUM(ABS(c - pred)) AS DOUBLE) / COUNT(*) AS mae,
           CAST(SUM(ABS(c - pred)) AS DOUBLE)
               / NULLIF(SUM(c), 0) AS wape
    FROM scored WHERE pred IS NOT NULL
    """,
)
def events_volume_seasonal_naive_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Backtest of the seasonal-naive forecast (predict day d's event
    volume with day d−7's) on a DENSIFIED day spine: MAE and WAPE over
    every day that has a week-ago observation.  The baseline every
    capacity-planning forecast must beat — if a model can't beat
    "same day last week", ship the heuristic; and a WAPE spike between
    rounds flags a regime change the seasonality ops
    (``events_seasonality_strength``) summarize but don't score.

    Shape: one day-keyed count, a calendar-bounded spine join (silent
    days are real zeros, not missing rows — the ``events_wow_growth``
    densify rule), one lag-7 window over the bounded ledger, a 1-row
    close.  Parity: pure-integer epoch days and counts; MAE/WAPE are
    unrounded exact-integer ratios (denominators: scored-day count
    ≥ 1 via the WHERE, Σ actual NULLIF-guarded identically)."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {_US_PER_DAY}")
    daily = e.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode_outer(F.sequence("lo", "hi")).alias("d")
    )
    dense = spine.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    w = Window.orderBy("d")  # bounded: |days| ledger
    scored = dense.select(
        "c", F.lag("c", 7).over(w).alias("pred")
    ).where(F.col("pred").isNotNull())
    abs_err = F.sum(F.abs(F.col("c") - F.col("pred"))).cast("long")
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        abs_err.alias("total_abs_err"),
        (abs_err.cast("double") / F.count(F.lit(1))).alias("mae"),
        (
            abs_err.cast("double")
            / F.nullif(F.sum("c").cast("long"), F.lit(0))
        ).alias("wape"),
    )


# --------------------------------------------------------------------------
# robust daily-volume anomaly via MAD (r13)
# --------------------------------------------------------------------------

@register(
    "events_anomaly_mad",
    oracle="""
    WITH d AS (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS epoch_day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1
    ),
    m AS (SELECT quantile_cont(n_events, 0.5) AS med FROM d),
    dev AS (
        SELECT d.epoch_day, d.n_events, m.med,
               ABS(d.n_events - m.med) AS dev
        FROM d CROSS JOIN m
    ),
    md AS (SELECT quantile_cont(dev, 0.5) AS mad FROM dev)
    SELECT dev.epoch_day, dev.n_events, dev.med, md.mad,
           (dev.dev > 3 * md.mad) AS is_outlier
    FROM dev CROSS JOIN md
    ORDER BY dev.epoch_day
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly detection: flag days whose event
    count deviates from the corpus median by more than 3× the median
    absolute deviation — the outlier gate that, unlike
    ``events_anomaly``'s z-score, is immune to the outliers it hunts
    (one 100× traffic spike drags a mean/σ threshold but leaves the
    median untouched; ``length_outlier_mad`` is the same statistic over
    doc lengths).  Every day emits with its flag so the report doubles
    as the volume spine.

    Shape: one day aggregate (|days| rows), two scalar-median
    crossJoin broadcasts — no window, no data-sized sort; at 100 TB
    the day frame is calendar-bounded.  Parity: day counts are exact
    BIGINTs; interpolated medians of exact integers are bit-identical
    cross-engine (r10 probe), deviations are exact dyadic rationals
    (integer ± k/2), and 3·mad is exact — the strictly-greater compare
    can never sit on a float boundary, so med/mad are emitted
    UNROUNDED (the r10 rule).  A fixture corpus with stable daily
    volume flags nothing — the detection path is pinned by a planted
    spike-day test (tests/test_new_ops_r13.py)."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        F.expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").alias(
            "epoch_day"
        )
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    m = d.agg(F.percentile("n_events", 0.5).alias("med"))
    dev = d.crossJoin(F.broadcast(m)).select(
        "epoch_day",
        "n_events",
        "med",
        F.abs(F.col("n_events") - F.col("med")).alias("dev"),
    )
    md = dev.agg(F.percentile("dev", 0.5).alias("mad"))
    return (
        dev.crossJoin(F.broadcast(md))
        .select(
            "epoch_day",
            "n_events",
            "med",
            "mad",
            (F.col("dev") > 3 * F.col("mad")).alias("is_outlier"),
        )
        .transform(sort_bounded, "epoch_day")
    )


# --------------------------------------------------------------------------
# EWMA daily-volume backtest (r15) — forecast family member #2
# --------------------------------------------------------------------------

EWMA_LAGS = 6  # binary-decay window: weights 2^(6-k), k = 1..6, denom 63


@register(
    "events_volume_ewma_backtest",
    oracle=f"""
    WITH daily AS (
        SELECT epoch_us(ts) // {_US_PER_DAY} AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
    spine AS (
        SELECT unnest(generate_series(lo, hi)) AS d FROM bounds
    ),
    dense AS (
        SELECT spine.d, COALESCE(daily.c, 0) AS c
        FROM spine LEFT JOIN daily ON daily.d = spine.d
    ),
    scored AS (
        SELECT d, c,
               LAG(c, 1) OVER (ORDER BY d) * 32
             + LAG(c, 2) OVER (ORDER BY d) * 16
             + LAG(c, 3) OVER (ORDER BY d) * 8
             + LAG(c, 4) OVER (ORDER BY d) * 4
             + LAG(c, 5) OVER (ORDER BY d) * 2
             + LAG(c, 6) OVER (ORDER BY d) * 1 AS num63
        FROM dense
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(ABS(63 * c - num63)) AS BIGINT) AS total_abs_err_63,
           CAST(SUM(ABS(63 * c - num63)) AS DOUBLE)
               / (63.0 * COUNT(*)) AS mae,
           CAST(SUM(ABS(63 * c - num63)) AS DOUBLE)
               / (63.0 * NULLIF(SUM(c), 0)) AS wape
    FROM scored WHERE num63 IS NOT NULL
    """,
)
def events_volume_ewma_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Backtest of a binary-decay EWMA forecast (α = 1/2, 6-day
    window) on the densified day spine: predict day d's volume with
    Σ c(d−k)·2^(6−k)/63 and score MAE/WAPE over every day with a full
    lag window — the smoothing baseline next to
    ``events_volume_seasonal_naive_backtest``'s same-day-last-week
    rule (EWMA beats it when volume trends, loses when it's weekly-
    periodic; running both brackets the regime).

    Shape: identical to the seasonal-naive op — one day-keyed count,
    a calendar-bounded spine, six lag windows over the bounded ledger
    (one window sort shared), a 1-row close.  Parity: the forecast is
    kept as an INTEGER numerator over the fixed denominator 63 (binary
    weights 32..1), so the error |c − num/63| = |63c − num|/63 has an
    exact BIGINT numerator — no double enters until the closing
    MAE/WAPE divisions (unrounded exact-integer ratios,
    NULLIF-guarded).  Closed form: a constant series has
    num = 63c ⇒ zero error (pinned with a planted step series in
    tests/test_new_ops_r15b.py)."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {_US_PER_DAY}")
    daily = e.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode_outer(F.sequence("lo", "hi")).alias("d")
    )
    dense = spine.join(daily, "d", "left").select(
        "d", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    w = Window.orderBy("d")  # bounded: |days| ledger
    num63 = sum(
        F.lag("c", k).over(w) * F.lit(1 << (EWMA_LAGS - k))
        for k in range(1, EWMA_LAGS + 1)
    )
    scored = dense.select("c", num63.alias("num63")).where(
        F.col("num63").isNotNull()
    )
    err63 = F.sum(F.abs(63 * F.col("c") - F.col("num63"))).cast("long")
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        err63.alias("total_abs_err_63"),
        (err63.cast("double") / (63.0 * F.count(F.lit(1)))).alias("mae"),
        (
            err63.cast("double")
            / (63.0 * F.nullif(F.sum("c").cast("long"), F.lit(0)))
        ).alias("wape"),
    )
