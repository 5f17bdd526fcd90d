"""Behavioral analytics over the events stream: burstiness, temporal
autocorrelation, weekday/weekend contrast, and session entry/exit/path
structure.

Round-8 extensions of the events family (operators/events.py holds the
core sessionize/window/anomaly ops; this module the user-behavior
diagnostics a product-analytics team layers on top).  The reference has
no query surface at all (SURVEY §2.A.4); these extend §2.B.

Parity conventions (operators/relational.py + the repo build docs): integer-µs
timestamp math; any statistic feeding a filter/sort is derived from
exact BIGINT sums (fixed-point r7 rule) and rounded 6dp identically on
both engines; every window/top-k carries a unique tiebreaker; possibly
zero denominators guarded with NULLIF spelled identically; bounded
grouped outputs sort via sort_bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import (
    local_rows_frame,
    sort_bounded,
)
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

BURSTY_TOP_K = 20
PATH_TRIGRAM_TOP_K = 20
SESSION_GAP_S = 1800  # same 30-min gap as events_sessionize

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000


@register(
    "events_user_burstiness",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS d,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    per_user AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT)     AS n_days,
               CAST(SUM(c) AS BIGINT)       AS s,
               CAST(SUM(c * c) AS BIGINT)   AS q
        FROM daily GROUP BY user_id
    )
    SELECT user_id, n_days, s AS n_events,
           ROUND(CAST(n_days * q - s * s AS DOUBLE)
                 / (CAST(n_days AS DOUBLE) * s), 6) AS fano
    FROM per_user
    ORDER BY fano DESC, user_id
    LIMIT {BURSTY_TOP_K}
    """,
)
def events_user_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} burstiest users by the Fano factor (variance/mean) of
    their daily event counts — Fano ≈ 1 is Poisson-like steady usage,
    ≫ 1 is bursty (bot bursts, scripted scrapes, binge sessions), the
    dispersion screen behind rate-limiting and bot triage.

    Shape: two hash-aggregates — (user, day) counts, then per-user
    moments — and a TakeOrdered top-k; nothing data-sized is sorted.
    Parity: daily counts are integers, so Σc/Σc² are exact BIGINTs and
    Fano reduces to (n·q − s²)/(n·s) — one deterministic double
    division, rounded 6dp before the ORDER BY (fixed-point r7 rule);
    (fano DESC, user_id) is a total order; s ≥ n ≥ 1 so the denominator
    cannot be zero."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    per_user = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    fano = F.round(
        (F.col("n_days") * F.col("q") - F.col("s") * F.col("s")).cast(
            "double"
        )
        / (F.col("n_days").cast("double") * F.col("s")),
        6,
    )
    return (
        per_user.select(
            "user_id", "n_days", F.col("s").alias("n_events"),
            fano.alias("fano"),
        )
        .orderBy(F.col("fano").desc(), "user_id")
        .limit(BURSTY_TOP_K)
    )


events_user_burstiness.__doc__ = events_user_burstiness.__doc__.format(
    k=BURSTY_TOP_K
)


@register(
    "events_hour_autocorr",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type, a.c AS x, b.c AS y
        FROM hourly a JOIN hourly b
          ON b.event_type = a.event_type AND b.h = a.h + 1
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)     AS n,
               CAST(SUM(x) AS BIGINT)       AS sx,
               CAST(SUM(y) AS BIGINT)       AS sy,
               CAST(SUM(x * y) AS BIGINT)   AS sxy,
               CAST(SUM(x * x) AS BIGINT)   AS sxx,
               CAST(SUM(y * y) AS BIGINT)   AS syy
        FROM pairs GROUP BY event_type
    )
    SELECT event_type, n AS n_pairs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE)), 0),
                 6) AS autocorr
    FROM sums
    ORDER BY event_type
    """,
)
def events_hour_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of hourly event counts per type — the
    persistence diagnostic behind capacity planning: autocorr near 1
    means load momentum (this hour predicts the next), near 0 means
    memoryless arrivals, negative means alternating spikes.  Pairs are
    adjacent *present* hours (an empty hour contributes no pair).

    Shape: the hourly count frame is |types|×|hours| (time-bounded, not
    data-sized); the lag pairing is a self-join on (type, h+1) over
    that bounded frame, then one Pearson aggregate per type.  Parity:
    counts are integers so every Σ is an exact BIGINT and the Pearson
    numerator/variance factors are exact integer expressions; the two
    factors are cast to double SEPARATELY before multiplying (their
    BIGINT product could overflow where the factors themselves cannot),
    NULLIF guards the zero-variance case identically, 6dp round.  Scale
    note: factors stay in BIGINT while hourly counts are < ~1e7; beyond
    that pre-scale the counts."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_HOUR}").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = hourly.alias("a")
    b = hourly.alias("b")
    pairs = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.h") == F.col("a.h") + 1),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    sums = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    fx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    fy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    autocorr = F.round(
        num / F.nullif(F.sqrt(fx * fy), F.lit(0.0)), 6
    )
    return sort_bounded(
        sums.select(
            "event_type",
            F.col("n").alias("n_pairs"),
            autocorr.alias("autocorr"),
        ),
        "event_type",
    )


@register(
    "events_weekday_profile",
    oracle=f"""
    SELECT event_type,
           CAST(SUM(CASE WHEN (epoch_us(ts) // {_US_PER_DAY}) % 7 IN (2, 3)
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_weekday,
           CAST(SUM(CASE WHEN (epoch_us(ts) // {_US_PER_DAY}) % 7 IN (2, 3)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
           CAST(SUM(CASE WHEN (epoch_us(ts) // {_US_PER_DAY}) % 7 IN (2, 3)
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS weekend_share
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-vs-weekend volume per event type — the first cut of any
    seasonality review (a type whose weekend share diverges from the
    corpus norm has a different audience or automation behind it).

    Weekend is derived in pure integer math portable across engines:
    epoch day 0 (1970-01-01) was a Thursday, so day_index % 7 in (2, 3)
    ⇔ Saturday/Sunday — never an engine dayofweek() (their week-start
    conventions differ).  Shape: one map-side-combined aggregate to
    |types| rows.  Parity: weekend_share is a ratio of exact integers —
    bit-identical unrounded on both engines."""
    e = load_table(spark, sf_dir, "events")
    is_we = (
        F.expr(f"(unix_micros(ts) div {_US_PER_DAY}) % 7").isin(2, 3)
    )
    return sort_bounded(
        e.groupBy("event_type").agg(
            F.sum(F.when(is_we, 0).otherwise(1)).cast("long").alias(
                "n_weekday"
            ),
            F.sum(F.when(is_we, 1).otherwise(0)).cast("long").alias(
                "n_weekend"
            ),
            (
                F.sum(F.when(is_we, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("weekend_share"),
        ),
        "event_type",
    )


def _sessionized(e: DataFrame) -> DataFrame:
    """(user_id, session_id, ts_us, event_id, event_type) with the same
    30-min-gap cumulative-sum sessionization and (ts_us, event_id)
    total order as events_sessionize / session_duration_histogram —
    both downstream windows reuse ONE (user_id)-keyed exchange.

    NULL-ts events cannot be sequenced — dropped on BOTH engines
    (null-catalog audit, r18: engine default NULL *ordering* differs,
    Spark ASC=NULLS FIRST vs DuckDB=NULLS LAST, so a NULL-ts row
    silently renumbers every later session on one engine only)."""
    e = e.where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    seq = e.select(
        "user_id",
        ts_us.alias("ts_us"),
        "event_id",
        "event_type",
        F.when(
            F.lag(ts_us).over(w).isNull()
            | (ts_us - F.lag(ts_us).over(w) > SESSION_GAP_S * 1_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seq.select(
        "user_id",
        F.sum("is_start").over(w2).alias("session_id"),
        "ts_us",
        "event_id",
        "event_type",
    )


_SESS_CTE = f"""
    WITH seq AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_S} * 1000000
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
               ts_us, event_id, event_type
        FROM seq
    )
"""


@register(
    "events_session_entry_exit",
    oracle=_SESS_CTE
    + """
    , ranked AS (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts_us, event_id) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts_us DESC, event_id DESC)
                   AS rn_last
        FROM sess
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_entries,
           CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exits,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_session_entry_exit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per event type: how many sessions START with it vs END with it
    (plus total volume) — the landing/abandonment profile: a type with
    high exits but low entries is where sessions die.

    Shape: the shared sessionization exchange (see _sessionized), then
    two row_number windows over the SAME (user_id, session_id) keys —
    identical partitioning, so Catalyst plans one exchange with two
    sorts — and a final |types|-row aggregate.  Parity: both
    row_numbers are total-ordered by (ts_us, event_id) [DESC for the
    exit rank]; all-integer output, no rounding."""
    sess = _sessionized(load_table(spark, sf_dir, "events"))
    w_first = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    w_last = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    ranked = sess.select(
        "event_type",
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    return sort_bounded(
        ranked.groupBy("event_type").agg(
            F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_entries"),
            F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_exits"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        ),
        "event_type",
    )


@register(
    "session_path_trigrams",
    oracle=_SESS_CTE
    + f"""
    , paths AS (
        SELECT user_id, session_id,
               list(event_type ORDER BY ts_us, event_id) AS p
        FROM sess GROUP BY user_id, session_id
    )
    SELECT tg AS trigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(list_transform(range(1, len(p) - 1),
                      i -> array_to_string(p[i:i+2], ' '))) AS tg
        FROM paths
    )
    GROUP BY tg
    ORDER BY n DESC, trigram
    LIMIT {PATH_TRIGRAM_TOP_K}
    """,
)
def session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} within-session event-type trigrams — the dominant
    3-step navigation motifs (view→click→purchase vs view→error→exit),
    the path-mining primitive funnels are hand-built from.

    Shape: the shared sessionization exchange, one per-session ordered
    collect (array_sort of (ts_us, event_id, type) structs — total
    order by the unique key prefix), then the r5 in-row adjacent-n-gram
    build: arrays_zip of three shifted slices (codegen) + explode —
    never a lead()-window over exploded tokens.  The only interpreted
    lambda is the |session|-bounded field extraction after the sort.
    Parity: DuckDB builds the same ordered list and zips positionally
    (r7 positional-unnest rule); counts are exact and (n DESC, trigram)
    is a total order."""
    counts = session_trigram_counts(
        _sessionized(load_table(spark, sf_dir, "events"))
    )
    return counts.orderBy(F.col("n").desc(), "trigram").limit(
        PATH_TRIGRAM_TOP_K
    )


def session_trigram_counts(sess: DataFrame) -> DataFrame:
    """Full (trigram, n) counts over a sessionized frame — factored out
    of the registered top-k op so the streaming twin's test can pin its
    summed partial emissions against the COMPLETE count table."""
    paths = sess.groupBy("user_id", "session_id").agg(
        F.expr(
            "transform(array_sort(collect_list("
            "struct(ts_us, event_id, event_type))), e -> e.event_type)"
        ).alias("p")
    )
    n3 = F.size(F.col("p")) - 2
    zipped = F.arrays_zip(
        F.slice("p", 1, n3), F.slice("p", 2, n3), F.slice("p", 3, n3)
    )
    tris = (
        paths.where(F.size("p") >= 3)
        .select(F.explode_outer(zipped).alias("t"))
        .select(F.concat_ws(" ", "t.0", "t.1", "t.2").alias("trigram"))
    )
    return tris.groupBy("trigram").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


session_path_trigrams.__doc__ = session_path_trigrams.__doc__.format(
    k=PATH_TRIGRAM_TOP_K
)


@register(
    "user_activity_span",
    oracle=f"""
    WITH days AS (
        SELECT user_id, epoch_us(ts) // {_US_PER_DAY} AS d
        FROM events GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(MIN(d) AS BIGINT)                   AS first_day,
           CAST(MAX(d) AS BIGINT)                   AS last_day,
           CAST(COUNT(*) AS BIGINT)                 AS n_active_days,
           CAST(MAX(d) - MIN(d) + 1 AS BIGINT)      AS span_days,
           CAST(COUNT(*) AS DOUBLE)
               / (MAX(d) - MIN(d) + 1)              AS activity_density
    FROM days
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def user_activity_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifecycle summary: first/last active epoch-day, active
    day count, calendar span, and density (active/span) — the
    engagement-tier input to retention models (density near 1 is a
    daily habit, near 0 a sporadic returner), and the lifetime frame
    cohort analyses slice.

    Shape: the (user, day) distinct frame (the same first shuffle
    events_dau_wau rides on), then one per-user min/max/count — output
    is |users|-sized, the dimension this table exists to describe.
    Parity: pure integer epoch-day math; density is an exact integer
    ratio, unrounded; span ≥ 1 so the denominator is never zero."""
    e = load_table(spark, sf_dir, "events")
    days = e.groupBy(
        "user_id",
        F.expr(f"unix_micros(ts) div {_US_PER_DAY}").alias("d"),
    ).agg(F.lit(1).alias("one"))
    span = F.max("d") - F.min("d") + 1
    return (
        days.groupBy("user_id")
        .agg(
            F.min("d").cast("long").alias("first_day"),
            F.max("d").cast("long").alias("last_day"),
            F.count(F.lit(1)).cast("long").alias("n_active_days"),
            span.cast("long").alias("span_days"),
            (F.count(F.lit(1)).cast("double") / span).alias(
                "activity_density"
            ),
        )
        # no orderBy: the frame is |users|-sized and the driver hash is
        # order-insensitive — a global sort here plans a range exchange
        # plus a sampling job for nothing (oracle ORDER BY is cosmetic)
    )


FUNNEL_FROM = "signup"
FUNNEL_TO = "purchase"


@register(
    "events_funnel_conversion_time",
    oracle=f"""
    WITH first_a AS (
        SELECT user_id, MIN(epoch_us(ts)) AS ta
        FROM events WHERE event_type = '{FUNNEL_FROM}'
        GROUP BY user_id
    ),
    first_b AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS tb
        FROM events e JOIN first_a a ON a.user_id = e.user_id
        WHERE e.event_type = '{FUNNEL_TO}' AND epoch_us(e.ts) >= a.ta
        GROUP BY e.user_id
    ),
    delays AS (
        SELECT (b.tb - a.ta) // 1000000 AS delay_s
        FROM first_a a JOIN first_b b ON b.user_id = a.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM first_a)
               AS n_entered,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(COUNT(*) AS DOUBLE)
               / NULLIF((SELECT COUNT(*) FROM first_a), 0)
               AS conversion_rate,
           ROUND(quantile_cont(delay_s, 0.5), 4) AS p50_delay_s,
           ROUND(quantile_cont(delay_s, 0.9), 4) AS p90_delay_s,
           CAST(MAX(delay_s) AS BIGINT)          AS max_delay_s
    FROM delays
    """,
)
def events_funnel_conversion_time(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversion LATENCY for the {a}→{b} funnel: among users whose
    first {b} follows their first {a}, the p50/p90/max delay — the time
    dimension events_funnel's pure counts are missing (a funnel can
    hold its rate while its p90 latency doubles — a different problem).

    Shape: two per-user MIN aggregates (the second pre-filtered by an
    {a}-users semi-ish join), a user-keyed delay join, then ONE global
    percentile aggregate row.  Parity: delays are exact integer seconds
    (µs integer-div); F.percentile ≡ quantile_cont interpolation of
    exact integers, rounded 4dp; conversion_rate is an exact integer
    ratio, unrounded."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    first_a = (
        e.where(F.col("event_type") == FUNNEL_FROM)
        .groupBy("user_id")
        .agg(F.min(ts_us).alias("ta"))
    )
    first_b = (
        e.where(F.col("event_type") == FUNNEL_TO)
        .select("user_id", ts_us.alias("tb_us"))
        .join(first_a, "user_id")
        .where(F.col("tb_us") >= F.col("ta"))
        .groupBy("user_id")
        .agg(F.min("tb_us").alias("tb"))
    )
    delays = first_a.join(first_b, "user_id").select(
        F.expr("(tb - ta) div 1000000").alias("delay_s")
    )
    n_entered = first_a.agg(
        F.count(F.lit(1)).cast("long").alias("n_entered")
    )
    return (
        delays.agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.round(F.percentile("delay_s", 0.5), 4).alias("p50_delay_s"),
            F.round(F.percentile("delay_s", 0.9), 4).alias("p90_delay_s"),
            F.max("delay_s").cast("long").alias("max_delay_s"),
        )
        .crossJoin(F.broadcast(n_entered))
        .select(
            "n_entered",
            "n_converted",
            # NULLIF: an entry-less corpus must read NULL on both
            # engines, never Spark-NULL vs DuckDB-NaN (r7 rule)
            (
                F.col("n_converted").cast("double")
                / F.nullif(F.col("n_entered"), F.lit(0))
            ).alias("conversion_rate"),
            "p50_delay_s",
            "p90_delay_s",
            "max_delay_s",
        )
    )


events_funnel_conversion_time.__doc__ = (
    events_funnel_conversion_time.__doc__.format(a=FUNNEL_FROM, b=FUNNEL_TO)
)


# --------------------------------------------------------------------------
# Markov next-step entropy per event type (route predictability)
# --------------------------------------------------------------------------

@register(
    "event_type_markov_entropy",
    oracle="""
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS dst
        FROM events
    ),
    tr AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    tot AS (
        SELECT src, CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_dst,
               CAST(MAX(cnt) AS BIGINT) AS top_cnt
        FROM tr GROUP BY src
    ),
    terms AS (
        SELECT tr.src,
               CAST(SUM(tr.cnt * CAST(ROUND(
                   LN(CAST(tr.cnt AS DOUBLE) / tot.n) * 1000000, 0)
                   AS BIGINT)) AS BIGINT) AS wsum6
        FROM tr JOIN tot ON tr.src = tot.src
        GROUP BY tr.src
    )
    SELECT tot.src AS event_type,
           tot.n              AS n_transitions,
           tot.n_dst          AS n_next_types,
           ROUND(-CAST(terms.wsum6 AS DOUBLE)
                 / (CAST(tot.n AS DOUBLE) * 1000000.0), 6) AS next_entropy,
           CAST(tot.top_cnt AS DOUBLE) / tot.n AS top_next_share
    FROM tot JOIN terms ON terms.src = tot.src
    ORDER BY event_type
    """,
)
def event_type_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-step (first-order Markov) entropy per event type: how
    predictable is the step AFTER each event — near-zero entropy means
    a forced path (or a tracking bug firing pairs), high entropy a true
    branching point; top_next_share is the argmax twin UIs read as "N%
    go on to X".  Complements ``events_transition_matrix`` (the counts)
    with the summary a funnel designer actually ranks by.

    Shape: one user-keyed lead window (the transition convention), a
    (src, dst) count aggregate, then two |event_types|-row reductions.
    Parity (r7 fixed-point rule): each ln(p) is scaled ×1e6 and rounded
    to BIGINT per (src, dst) TERM, weighted by the exact transition
    count, and summed in integer space — the closing division of two
    exact integers is one IEEE op on both engines; top_next_share is an
    exact integer ratio (unrounded by the r2 rule)."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    seq = e.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    tr = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # everything after tr runs on the |types|²-row transition frame:
    # attach the per-src marginals via ONE src-partitioned window (the
    # separate tot/terms aggregates each re-ran the events-side window —
    # 9 static shuffles; this shape plans 3)
    wsrc = Window.partitionBy("src")
    n = F.sum("cnt").over(wsrc).cast("long")
    lnp6 = F.round(
        F.log(F.col("cnt").cast("double") / n) * 1000000, 0
    ).cast("long")
    enriched = tr.select(
        "src",
        "cnt",
        n.alias("n"),
        F.count(F.lit(1)).over(wsrc).cast("long").alias("n_dst"),
        F.max("cnt").over(wsrc).cast("long").alias("top_cnt"),
        (F.col("cnt") * lnp6).alias("term6"),
    )
    return sort_bounded(
        enriched.groupBy("src").agg(
            F.max("n").alias("n_transitions"),
            F.max("n_dst").alias("n_next_types"),
            F.round(
                -F.sum("term6").cast("double")
                / (F.max("n").cast("double") * F.lit(1000000.0)),
                6,
            ).alias("next_entropy"),
            (F.max("top_cnt").cast("double") / F.max("n")).alias(
                "top_next_share"
            ),
        ).withColumnRenamed("src", "event_type"),
        "event_type",
    )


# --------------------------------------------------------------------------
# event-volume concentration: share of events from the top-k% of users
# --------------------------------------------------------------------------

PARETO_PCTS = [1, 5, 10, 25]


@register(
    "user_event_pareto",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    ledger AS (
        SELECT c, CAST(COUNT(*) AS BIGINT) AS nu
        FROM per_user GROUP BY c
    ),
    cum AS (
        SELECT c, nu,
               CAST(COALESCE(SUM(nu) OVER (ORDER BY c DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cu_prev,
               CAST(COALESCE(SUM(nu * c) OVER (ORDER BY c DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS ce_prev
        FROM ledger
    ),
    tot AS (
        SELECT CAST(SUM(nu) AS BIGINT) AS n_users,
               CAST(SUM(nu * c) AS BIGINT) AS n_events
        FROM ledger
    ),
    cuts AS (SELECT unnest(ARRAY{PARETO_PCTS}) AS pct)
    SELECT CAST(cuts.pct AS BIGINT) AS pct,
           (tot.n_users * cuts.pct + 99) // 100 AS n_top_users,
           cum.ce_prev + ((tot.n_users * cuts.pct + 99) // 100
                          - cum.cu_prev) * cum.c AS n_top_events,
           CAST(cum.ce_prev + ((tot.n_users * cuts.pct + 99) // 100
                               - cum.cu_prev) * cum.c AS DOUBLE)
               / tot.n_events AS event_share
    FROM cuts CROSS JOIN tot JOIN cum
      ON cum.cu_prev < (tot.n_users * cuts.pct + 99) // 100
     AND (tot.n_users * cuts.pct + 99) // 100 <= cum.cu_prev + cum.nu
    ORDER BY pct
    """,
)
def user_event_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-volume concentration: what share of ALL events comes from
    the top 1/5/10/25% heaviest users — the whale curve behind abuse
    budgets and sampling designs (if 1% of users emit half the events,
    uniform row sampling over-weights them).

    Shape: the per-user count collapses events to |users| rows; the
    concentration curve then runs on the COUNT-VALUE LEDGER (one row
    per distinct per-user count — bounded by max events/user, not by
    |users|), so the cumulative window is a ledger pass, the same
    decomposition as supplier_abc_class.  Users tied on a count are
    interchangeable, so every cut is deterministic without ranking
    individual users.  Parity: the cut index is ceil(N·p/100) in exact
    integer math ((N·p + 99) div 100 on both engines); the partial-row
    interpolation (m − cum_prev)·c is exact integers; event_share is
    an exact integer ratio (unrounded, r2 rule)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ledger = per_user.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("nu")
    )
    w = Window.orderBy(F.col("c").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    # single-partition cumulative + totals over the bounded count-value
    # ledger in ONE window pass (a separate .agg() for the totals would
    # re-run the per-user count chain)
    cum = ledger.select(
        "c",
        "nu",
        F.coalesce(F.sum("nu").over(w), F.lit(0))
        .cast("long")
        .alias("cu_prev"),
        F.coalesce(F.sum(F.col("nu") * F.col("c")).over(w), F.lit(0))
        .cast("long")
        .alias("ce_prev"),
        F.sum("nu").over(w_all).cast("long").alias("n_users"),
        F.sum(F.col("nu") * F.col("c"))
        .over(w_all)
        .cast("long")
        .alias("n_events"),
    )
    # LocalRelation, not a Python RDD: the classic createDataFrame cuts
    # frame cost ~5 s/run under the closing coalesce(1) (32 serialized
    # Python-worker handshakes for 4 rows — r18 find)
    cuts = local_rows_frame(
        spark, [(p,) for p in PARETO_PCTS], "pct long"
    )
    m = F.expr("(n_users * pct + 99) div 100")
    joined = (
        cuts.join(
            F.broadcast(cum),
            (F.col("cu_prev") < m)
            & (m <= F.col("cu_prev") + F.col("nu")),
        )
        .select(
            "pct",
            m.alias("n_top_users"),
            (
                F.col("ce_prev")
                + (m - F.col("cu_prev")) * F.col("c")
            ).alias("n_top_events"),
            (
                (
                    F.col("ce_prev")
                    + (m - F.col("cu_prev")) * F.col("c")
                ).cast("double")
                / F.col("n_events")
            ).alias("event_share"),
        )
    )
    return sort_bounded(joined, "pct")


# --------------------------------------------------------------------------
# user lifecycle stages by activity recency
# --------------------------------------------------------------------------

LIFECYCLE_ACTIVE_DAYS = 7
LIFECYCLE_COOLING_DAYS = 30


@register(
    "user_lifecycle_stages",
    oracle=f"""
    WITH ref AS (
        SELECT MAX(epoch_us(ts)) // {_US_PER_DAY} AS ref_day FROM events
    ),
    per_user AS (
        SELECT user_id, MAX(epoch_us(ts)) // {_US_PER_DAY} AS last_day
        FROM events GROUP BY user_id
    ),
    staged AS (
        SELECT CASE
                 WHEN ref.ref_day - last_day <= {LIFECYCLE_ACTIVE_DAYS}
                   THEN 'active'
                 WHEN ref.ref_day - last_day <= {LIFECYCLE_COOLING_DAYS}
                   THEN 'cooling'
                 ELSE 'churned'
               END AS stage
        FROM per_user CROSS JOIN ref
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM staged)
    SELECT stage,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS DOUBLE) / tot.n_all AS user_share
    FROM staged CROSS JOIN tot
    GROUP BY stage, tot.n_all
    ORDER BY stage
    """,
)
def user_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle census: users bucketed active / cooling / churned by
    epoch-days since their LAST event, measured against the corpus's
    newest event (a fixed "now" would rot with regenerated fixtures) —
    the top-of-dashboard health split every retention review starts
    from, and ``user_activity_span``'s categorical rollup.

    Shape: one per-user MAX aggregate, a broadcast scalar reference
    day, a 3-group rollup.  Parity: pure integer epoch-day arithmetic
    end to end (the recency cuts compare exact BIGINTs — no date
    function, no double anywhere except the final exact-integer
    share ratio)."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {_US_PER_DAY}")
    ref = e.agg(F.max(day).cast("long").alias("ref_day"))
    per_user = e.groupBy("user_id").agg(
        F.max(day).cast("long").alias("last_day")
    )
    stage = (
        F.when(
            F.col("ref_day") - F.col("last_day")
            <= LIFECYCLE_ACTIVE_DAYS,
            "active",
        )
        .when(
            F.col("ref_day") - F.col("last_day")
            <= LIFECYCLE_COOLING_DAYS,
            "cooling",
        )
        .otherwise("churned")
    )
    staged = per_user.crossJoin(F.broadcast(ref)).select(
        stage.alias("stage")
    )
    # total via an unpartitioned window over the ≤3-row stage counts —
    # a separate .agg() would re-run the whole per-user chain
    counts = staged.groupBy("stage").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    w_all = Window.partitionBy()
    return sort_bounded(
        counts.select(
            "stage",
            "n_users",
            (
                F.col("n_users").cast("double")
                / F.sum("n_users").over(w_all)
            ).alias("user_share"),
        ),
        "stage",
    )


# --------------------------------------------------------------------------
# bounce rate by session entry type
# --------------------------------------------------------------------------

@register(
    "session_bounce_rate",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
        SELECT user_id, event_id, event_type, ts_us,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM seq
    ),
    marked AS (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                  ORDER BY ts_us, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY user_id, session_id) AS sess_n
        FROM sess
    )
    SELECT event_type AS entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN sess_n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           CAST(SUM(CASE WHEN sess_n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS bounce_rate
    FROM marked WHERE rk = 1
    GROUP BY event_type
    ORDER BY entry_type
    """,
)
def session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session ENTRY type: of the sessions that opened
    with each event type, how many ended after that single event — the
    landing-quality metric behind every funnel redesign, and the
    categorical rollup of ``events_session_entry_exit``'s rankings.

    Shape: the standard gap sessionization (lag + cumsum over ONE
    user-keyed exchange), then a per-session rank/count window on the
    (user, session) partitioning, then a |types|-row rollup.  Parity:
    the entry pick and the bounce test are integer window results over
    the (ts_us, event_id) total order; bounce_rate is an exact integer
    ratio.  NULL-ts events cannot be sequenced — dropped on BOTH
    engines (null-catalog audit, r18)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap > SESSION_GAP_S * 1_000_000, 1).otherwise(0)
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        ts_us.alias("ts_us"),
        is_new.alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = seq.select(
        "user_id",
        "event_id",
        "event_type",
        "ts_us",
        F.sum("is_new").over(w2).alias("session_id"),
    )
    w_sess = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    w_cnt = Window.partitionBy("user_id", "session_id")
    marked = sess.select(
        "event_type",
        F.row_number().over(w_sess).alias("rk"),
        F.count(F.lit(1)).over(w_cnt).alias("sess_n"),
    )
    bounce = F.when(F.col("sess_n") == 1, 1).otherwise(0)
    return sort_bounded(
        marked.where(F.col("rk") == 1)
        .groupBy(F.col("event_type").alias("entry_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum(bounce).cast("long").alias("n_bounces"),
        )
        .select(
            "entry_type",
            "n_sessions",
            "n_bounces",
            (
                F.col("n_bounces").cast("double") / F.col("n_sessions")
            ).alias("bounce_rate"),
        ),
        "entry_type",
    )


# --------------------------------------------------------------------------
# weekday × hour load heat grid
# --------------------------------------------------------------------------

@register(
    "events_weekday_hour_heatmap",
    oracle=f"""
    WITH g AS (
        SELECT (epoch_us(ts) // {_US_PER_DAY}) % 7      AS weekday,
               (epoch_us(ts) // {_US_PER_HOUR}) % 24    AS hour_of_day,
               CAST(ROUND(value * 100, 0) AS BIGINT)    AS v_cents
        FROM events
    )
    SELECT CAST(weekday AS BIGINT)      AS weekday,
           CAST(hour_of_day AS BIGINT)  AS hour_of_day,
           CAST(COUNT(*) AS BIGINT)     AS n_events,
           CAST(SUM(v_cents) AS BIGINT) AS value_cents,
           CAST(SUM(v_cents) AS DOUBLE) / COUNT(*) / 100 AS mean_value
    FROM g
    GROUP BY weekday, hour_of_day
    ORDER BY weekday, hour_of_day
    """,
)
def events_weekday_hour_heatmap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The weekday × hour-of-day load grid (≤168 cells) — the capacity
    heatmap every on-call rota and autoscaling policy is drawn from;
    joins ``events_weekday_profile`` (weekday axis) and
    ``events_seasonality`` (hour axis) into the full matrix.

    Parity: grid keys are pure integer epoch arithmetic (day %7 — day 0
    Thursday — and hour %24); values fix-point to ×100 BIGINT cents at
    birth so the cell sums are exact at any order; mean is one division
    of exact integers.  One 168-group hash aggregate, map-side
    partials."""
    e = load_table(spark, sf_dir, "events")
    g = e.select(
        F.expr(f"(unix_micros(ts) div {_US_PER_DAY}) % 7").alias("weekday"),
        F.expr(f"(unix_micros(ts) div {_US_PER_HOUR}) % 24").alias(
            "hour_of_day"
        ),
        F.round(F.col("value") * 100, 0).cast("long").alias("v_cents"),
    )
    return sort_bounded(
        g.groupBy("weekday", "hour_of_day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("v_cents").cast("long").alias("value_cents"),
        )
        .select(
            F.col("weekday").cast("long").alias("weekday"),
            F.col("hour_of_day").cast("long").alias("hour_of_day"),
            "n_events",
            "value_cents",
            (
                F.col("value_cents").cast("double")
                / F.col("n_events")
                / 100
            ).alias("mean_value"),
        ),
        "weekday",
        "hour_of_day",
    )


# --------------------------------------------------------------------------
# daily new-vs-returning user split
# --------------------------------------------------------------------------

@register(
    "events_new_vs_returning",
    oracle=f"""
    WITH first_day AS (
        SELECT user_id,
               MIN(epoch_us(ts)) // {_US_PER_DAY} AS d0
        FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    daily AS (
        SELECT e.user_id,
               epoch_us(e.ts) // {_US_PER_DAY} AS d,
               f.d0
        FROM events e JOIN first_day f ON f.user_id = e.user_id
        WHERE e.ts IS NOT NULL
        GROUP BY 1, 2, 3
    )
    SELECT CAST(d AS BIGINT) AS epoch_day,
           CAST(SUM(CASE WHEN d = d0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new_users,
           CAST(SUM(CASE WHEN d > d0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_returning_users,
           CAST(SUM(CASE WHEN d > d0 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS returning_share
    FROM daily
    GROUP BY d
    ORDER BY epoch_day
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily acquisition-vs-retention split: per active day, how many
    users were active for the FIRST time vs returning — the growth
    chart's two lines, and the denominator sanity check for
    ``events_dau_wau`` (new + returning = DAU by construction).

    Shape: one per-user MIN aggregate (first active day), an equi-join
    back on user_id, the (user, day) distinct frame, then a
    |days|-bounded rollup.  Parity: pure integer epoch-day math; the
    new/returning test compares exact BIGINTs; returning_share is an
    exact integer ratio.  NULL-ts events have no day and are dropped on
    BOTH engines (null-catalog audit, r18: a NULL-day group zeroed the
    Spark denominator — ANSI DIVIDE_BY_ZERO — while the oracle's
    COUNT(*) denominator stayed positive)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    day = F.expr(f"unix_micros(ts) div {_US_PER_DAY}")
    first_day = e.groupBy("user_id").agg(
        F.min(day).cast("long").alias("d0")
    )
    daily = (
        e.select("user_id", day.alias("d"))
        .join(first_day, "user_id")
        .groupBy("user_id", "d", "d0")
        .agg(F.lit(1).alias("one"))
    )
    is_new = F.when(F.col("d") == F.col("d0"), 1).otherwise(0)
    is_ret = F.when(F.col("d") > F.col("d0"), 1).otherwise(0)
    return sort_bounded(
        daily.groupBy(F.col("d").cast("long").alias("epoch_day"))
        .agg(
            F.sum(is_new).cast("long").alias("n_new_users"),
            F.sum(is_ret).cast("long").alias("n_returning_users"),
        )
        .select(
            "epoch_day",
            "n_new_users",
            "n_returning_users",
            (
                F.col("n_returning_users").cast("double")
                / (F.col("n_new_users") + F.col("n_returning_users"))
            ).alias("returning_share"),
        ),
        "epoch_day",
    )


# --------------------------------------------------------------------------
# conversion rate by session depth (gap sessions → depth buckets)
# --------------------------------------------------------------------------

@register(
    "session_depth_conversion",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
        SELECT user_id, event_type,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM seq
    ),
    per_sess AS (
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS sess_n,
               CAST(MAX(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS converted
        FROM sess GROUP BY user_id, session_id
    )
    SELECT CASE WHEN sess_n = 1 THEN '1'
                WHEN sess_n <= 3 THEN '2-3'
                WHEN sess_n <= 7 THEN '4-7'
                ELSE '8+' END AS depth_bucket,
           CAST(COUNT(*) AS BIGINT)       AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conversion_rate
    FROM per_sess
    GROUP BY 1
    ORDER BY 1
    """,
)
def session_depth_conversion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversion rate by session DEPTH: sessions bucketed by event
    count (1 / 2-3 / 4-7 / 8+), each bucket's share containing a
    purchase — the engagement-depth counterpart of
    ``session_bounce_rate`` (does a longer session actually convert
    more?).

    Shape: the standard gap sessionization (lag + cumsum over ONE
    user-keyed exchange), a per-session aggregate, then a 4-row bucket
    rollup.  Parity: depth boundaries are exact integer compares; the
    bucket labels sort lexically in bucket order by construction;
    conversion_rate is an exact-integer ratio, unrounded
    (bit-identical, r2 rule)."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap > SESSION_GAP_S * 1_000_000, 1).otherwise(0)
    seq = e.select(
        "user_id",
        "event_id",
        "event_type",
        ts_us.alias("ts_us"),
        is_new.alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_sess = (
        seq.select(
            "user_id",
            "event_type",
            F.sum("is_new").over(w2).alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sess_n"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("converted"),
        )
    )
    bucket = (
        F.when(F.col("sess_n") == 1, "1")
        .when(F.col("sess_n") <= 3, "2-3")
        .when(F.col("sess_n") <= 7, "4-7")
        .otherwise("8+")
    )
    return sort_bounded(
        per_sess.groupBy(bucket.alias("depth_bucket")).agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
            (
                F.sum("converted").cast("double") / F.count(F.lit(1))
            ).alias("conversion_rate"),
        ),
        "depth_bucket",
    )


# --------------------------------------------------------------------------
# first-touch attribution (acquisition channel → downstream purchases)
# --------------------------------------------------------------------------

@register(
    "user_first_touch_attribution",
    oracle="""
    WITH firsts AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS rk
        FROM events WHERE ts IS NOT NULL
    ),
    ft AS (SELECT user_id, event_type AS first_type
           FROM firsts WHERE rk = 1)
    SELECT ft.first_type,
           CAST(COUNT(DISTINCT ft.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT CASE WHEN p.event_id IS NOT NULL
                                    THEN ft.user_id END) AS BIGINT)
               AS n_buyers,
           CAST(COUNT(p.event_id) AS BIGINT) AS n_purchases,
           ROUND(COALESCE(SUM(p.value), 0), 4) AS attributed_value
    FROM ft LEFT JOIN events p
        ON p.user_id = ft.user_id AND p.event_type = 'purchase'
    GROUP BY ft.first_type
    ORDER BY ft.first_type
    """,
)
def user_first_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch attribution: every user's FIRST event type claims
    all of that user's downstream purchases — users, buyers, purchase
    count and value per acquisition type (the marketing-mix view that
    ``events_new_vs_returning`` lacks a channel axis for).

    Shape: the first-touch pick is a user-keyed rank window (one
    exchange, WindowGroupLimit-pruned), purchases join back on the user
    key, and the rollup is |types|-bounded.  Parity: the first pick is
    total-ordered by (ts_us, event_id); counts are exact; the value sum
    is a SINGLE-level ROUND(SUM(raw value), 4) — the events.value
    convention (never a sum of pre-rounded sums, the r7 trap).
    NULL-ts events have no position in the first-touch order — dropped
    from the RANK input on BOTH engines (null-catalog audit, r18); the
    purchase join side keeps them (no ordering involved)."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    ft = (
        e.where(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("first_type"))
    )
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event"),
        "value",
    )
    joined = ft.join(
        p, F.col("user_id") == F.col("p_user"), "left"
    )
    return sort_bounded(
        joined.groupBy("first_type").agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.countDistinct(
                F.when(
                    F.col("p_event").isNotNull(), F.col("user_id")
                )
            )
            .cast("long")
            .alias("n_buyers"),
            F.count("p_event").cast("long").alias("n_purchases"),
            F.round(
                F.coalesce(F.sum("value"), F.lit(0.0)), 4
            ).alias("attributed_value"),
        ),
        "first_type",
    )


# --------------------------------------------------------------------------
# seasonality strength (ANOVA R² of hour-of-week means on hourly counts)
# --------------------------------------------------------------------------

HOURS_PER_WEEK = 168


@register(
    "events_seasonality_strength",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS h,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT event_type, h % {HOURS_PER_WEEK} AS how,
               CAST(SUM(y) AS BIGINT)   AS sg,
               CAST(COUNT(*) AS BIGINT) AS ng
        FROM hourly GROUP BY 1, 2
    ),
    t AS (
        SELECT event_type,
               CAST(SUM((sg * sg * 1000000) // ng) AS BIGINT) AS tt
        FROM g GROUP BY 1
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)   AS n,
               CAST(SUM(y) AS BIGINT)     AS s,
               CAST(SUM(y * y) AS BIGINT) AS q
        FROM hourly GROUP BY 1
    )
    SELECT m.event_type,
           m.n AS n_hours,
           CAST(t.tt - (m.s * m.s * 1000000) // m.n AS DOUBLE)
               / NULLIF(m.q * 1000000
                        - (m.s * m.s * 1000000) // m.n, 0)
               AS seasonality_r2
    FROM m JOIN t USING (event_type)
    ORDER BY m.event_type
    """,
)
def events_seasonality_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How much of the hourly-load variance the weekly clock explains:
    one-way ANOVA R² (SS_between/SS_total) of hour-of-week means over
    the hourly count series, per event type — near 1 the load is pure
    schedule (capacity plans work), near 0 it's demand-driven (they
    won't).  The variance-decomposition summary that
    ``events_seasonality``'s 24-row profile and ``events_hour_autocorr``
    eyeball.

    Shape: an hourly count aggregate, a {HOURS_PER_WEEK}-group moment
    pass, and a |types|-row join.  Parity (r7 fixed point): the
    non-integer terms S_g²/n_g and S²/n are scaled ×1e6 and INTEGER-
    DIVIDED (both engines floor positives), so every sum is exact
    BIGINT at any order; R² is one exact-integer ratio, unrounded (r2
    rule); NULLIF guards the constant-series denominator identically.
    Scale note (r10 ADVICE audit): TWO ×1e6 terms bind — S_g²·1e6
    stays in BIGINT while any (type, hour-of-week) cell total S_g <
    ~3e6 events, and the SST's q·1e6 (q = Σy² over hourly counts)
    while q < ~9.2e12, i.e. RMS hourly count < √(9.2e12 / n_hours)
    (~3e4/hour over a 10k-hour window).  Both are comfortable until
    per-type hourly load passes tens of thousands; beyond that drop
    the scale factor on BOTH engines (costs ≤1e-6 relative truncation
    in the div terms, identically cross-engine)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    g = hourly.groupBy(
        "event_type", F.expr(f"h % {HOURS_PER_WEEK}").alias("how")
    ).agg(
        F.sum("y").cast("long").alias("sg"),
        F.count(F.lit(1)).cast("long").alias("ng"),
    )
    t = g.groupBy("event_type").agg(
        F.sum(F.expr("(sg * sg * 1000000) div ng"))
        .cast("long")
        .alias("tt")
    )
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("q"),
    )
    ssb = F.expr("tt - (s * s * 1000000) div n")
    sst = F.expr("q * 1000000 - (s * s * 1000000) div n")
    return sort_bounded(
        m.join(t, "event_type").select(
            "event_type",
            F.col("n").alias("n_hours"),
            (
                ssb.cast("double") / F.nullif(sst, F.lit(0))
            ).alias("seasonality_r2"),
        ),
        "event_type",
    )


# --------------------------------------------------------------------------
# cumulative user adoption curve
# --------------------------------------------------------------------------

@register(
    "events_cum_users_curve",
    oracle="""
    WITH fd AS (
        SELECT user_id,
               CAST(MIN(epoch_us(ts) // 86400000000) AS BIGINT)
                   AS first_day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT first_day AS epoch_day, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM fd GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM fd)
    SELECT d.epoch_day, d.n_new,
           CAST(SUM(d.n_new) OVER (ORDER BY d.epoch_day
                                   ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_users,
           CAST(CAST(SUM(d.n_new) OVER (ORDER BY d.epoch_day
                                        ROWS UNBOUNDED PRECEDING)
                     AS BIGINT) AS DOUBLE) / t.n_users
               AS adoption_share
    FROM daily d CROSS JOIN tot t
    ORDER BY d.epoch_day
    """,
)
def events_cum_users_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cumulative user-adoption curve: new users per day and the
    running total/share of everyone ever seen — the growth S-curve
    whose DAILY increments ``events_new_vs_returning`` reports without
    cumulating.

    Shape: per-user first-day (one user-keyed aggregate), a day rollup,
    then the cumulative window runs over the |days| LEDGER only (the
    bounded-ledger SinglePartition class from SCALE.md's audit — never
    the event stream).  Parity: integer epoch-day keys (the dau_wau
    rule), exact counts, adoption_share an unrounded exact-integer
    ratio."""
    e = load_table(spark, sf_dir, "events")
    fd = e.groupBy("user_id").agg(
        F.expr("CAST(MIN(unix_micros(ts) div 86400000000) AS BIGINT)")
        .alias("first_day")
    )
    daily = fd.groupBy(
        F.col("first_day").alias("epoch_day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    tot = fd.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    w = Window.orderBy("epoch_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return sort_bounded(
        daily.crossJoin(F.broadcast(tot)).select(
            "epoch_day",
            "n_new",
            F.sum("n_new").over(w).cast("long").alias("cum_users"),
            (
                F.sum("n_new").over(w).cast("long").cast("double")
                / F.col("n_users")
            ).alias("adoption_share"),
        ),
        "epoch_day",
    )


# --------------------------------------------------------------------------
# daily type-share OLS trend (is the error rate drifting up?)
# --------------------------------------------------------------------------

@register(
    "event_type_share_trend",
    oracle="""
    WITH daily AS (
        SELECT epoch_us(ts) // 86400000000 AS d,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS e
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT d, CAST(SUM(e) AS BIGINT) AS t FROM daily GROUP BY d
    ),
    shares AS (
        SELECT daily.event_type,
               CAST(daily.d AS BIGINT) AS x,
               CAST((daily.e * 1000000) // tot.t AS BIGINT) AS y6
        FROM daily JOIN tot USING (d)
    ),
    sums AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT)     AS n,
               CAST(SUM(x) AS BIGINT)       AS sx,
               CAST(SUM(y6) AS BIGINT)      AS sy,
               CAST(SUM(x * y6) AS BIGINT)  AS sxy,
               CAST(SUM(x * x) AS BIGINT)   AS sxx
        FROM shares GROUP BY event_type
    )
    SELECT event_type,
           n AS n_days,
           CAST(CAST(sy AS DOUBLE) / n AS DOUBLE) / 1000000.0
               AS mean_share,
           CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)
               / 1000000.0 AS share_slope_per_day
    FROM sums
    ORDER BY event_type
    """,
)
def event_type_share_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-type OLS trend of the DAILY TRAFFIC SHARE — "is the error
    rate drifting up?" asked properly: shares (not raw counts, which
    confound with overall growth) regressed on the epoch day, one slope
    per type.  The ops-health line ``events_anomaly`` (spikes) and
    ``events_decay_trend`` (level) don't draw.

    Shape: a (day, type) count aggregate, a |days| total join, then the
    regression is ONE moment aggregate to |types| rows.  Parity: each
    day's share is fixed-pointed to an EXACT ×1e6 integer via integer
    division (the r7 rule — summing double shares is order-sensitive),
    so all five OLS moments are exact BIGINTs and both outputs are
    deterministic double expressions over them, emitted unrounded (r2
    rule); NULLIF guards the single-day degenerate.  Scale note:
    x·y6 ≤ epoch_day(~2e4)·1e6 = 2e10 per row — Σ stays in BIGINT to
    ~4e8 observed days-of-type."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("e"))
    tot = daily.groupBy("d").agg(F.sum("e").cast("long").alias("t"))
    shares = daily.join(tot, "d").select(
        "event_type",
        F.col("d").cast("long").alias("x"),
        F.expr("CAST((e * 1000000) div t AS BIGINT)").alias("y6"),
    )
    sums = shares.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y6").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y6")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return sort_bounded(
        sums.select(
            "event_type",
            F.col("n").alias("n_days"),
            (
                (F.col("sy").cast("double") / F.col("n")).cast("double")
                / 1000000.0
            ).alias("mean_share"),
            (
                (
                    F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
                ).cast("double")
                / F.nullif(
                    F.col("n") * F.col("sxx")
                    - F.col("sx") * F.col("sx"),
                    F.lit(0),
                ).cast("double")
                / 1000000.0
            ).alias("share_slope_per_day"),
        ),
        "event_type",
    )


# --------------------------------------------------------------------------
# cross-type audience overlap (user-set Jaccard per type pair)
# --------------------------------------------------------------------------

@register(
    "event_type_user_jaccard",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
           FROM ut GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON b.user_id = a.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both,
           CAST(p.n_both AS DOUBLE) / (ca.n + cb.n - p.n_both)
               AS user_jaccard
    FROM pairs p
    JOIN tc ca ON ca.event_type = p.type_a
    JOIN tc cb ON cb.event_type = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
)
def event_type_user_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audience overlap between event types: Jaccard of the USER SETS
    for every type pair — near 1 the features share an audience, near 0
    they serve different users (the segmentation fact behind bundling
    and nav decisions).  ``part_copurchase_lift``'s behavioral twin,
    with users playing the basket role.

    Shape: the distinct (user, type) relation self-joins on the user
    key — fan-out bounded by |types|² per user, never |users|²; set
    sizes join back per type and the output is the |types choose 2|
    table.  Parity: exact counts; Jaccard an unrounded exact-integer
    ratio (r2 rule)."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    tc = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a = ut.alias("a")
    b = ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    ca = tc.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("na")
    )
    cb = tc.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("nb")
    )
    return sort_bounded(
        pairs.join(ca, "type_a")
        .join(cb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            (
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both"))
            ).alias("user_jaccard"),
        ),
        "type_a", "type_b",
    )


# --------------------------------------------------------------------------
# weekly activity streaks (gaps-and-islands)
# --------------------------------------------------------------------------

@register(
    "user_active_streaks",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk
        FROM events
    ),
    num AS (
        SELECT user_id, wk,
               wk - ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY wk) AS isl
        FROM uw
    ),
    streaks AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM num GROUP BY user_id, isl
    ),
    best AS (
        SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak
        FROM streaks GROUP BY user_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users_total FROM best)
    SELECT b.max_streak AS streak_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS DOUBLE) / t.n_users_total AS user_share
    FROM best b CROSS JOIN tot t
    GROUP BY b.max_streak, t.n_users_total
    ORDER BY streak_weeks
    """,
)
def user_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-week activity streak per user, rolled into a
    histogram — the habit-formation metric behind every retention
    target ("how many users have a 4-week streak?"), and the
    gaps-and-islands pattern (week − row_number = island id) the
    engine's window family otherwise lacks.

    Shape: distinct (user, week) → ONE user-keyed rank window (islands
    number per partition, no global sort) → two bounded reductions.
    Parity: integer epoch-week keys; the island id is exact integer
    arithmetic on both engines; user_share an unrounded exact ratio."""
    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id",
        F.expr(
            "CAST(unix_micros(ts) div 604800000000 AS BIGINT)"
        ).alias("wk"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    num = uw.select(
        "user_id",
        "wk",
        (F.col("wk") - F.row_number().over(w)).alias("isl"),
    )
    streaks = num.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    best = streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("max_streak")
    )
    tot = best.agg(
        F.count(F.lit(1)).cast("long").alias("n_users_total")
    )
    return sort_bounded(
        best.crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("max_streak").alias("streak_weeks"), "n_users_total"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            "streak_weeks",
            "n_users",
            (
                F.col("n_users").cast("double")
                / F.col("n_users_total")
            ).alias("user_share"),
        ),
        "streak_weeks",
    )


# --------------------------------------------------------------------------
# Markov removal-effect attribution (absorbing-chain credit assignment)
# --------------------------------------------------------------------------

@register("events_attribution_markov", oracle=None)
def events_attribution_markov(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov-chain attribution with REMOVAL EFFECTS: model each user's
    pre-conversion journey as a first-order chain (START → event types →
    purchase | DROP), then credit each touchpoint by how much total
    conversion probability disappears when that state is removed — the
    principled alternative to first/last-touch
    (``user_first_touch_attribution`` is the naive baseline this
    corrects).

    Shape: ALL data-sized work is one user-keyed lag window + a
    (src, dst) count aggregate bounded by (|types|+2)²; the
    absorbing-chain solves run DRIVER-SIDE on that bounded matrix (the
    graph.py/IVF-trainer convention for documented bounded collects) —
    one (I−Q)⁻¹ solve per state, |types|+1 solves of a ≤|types|+1
    system.  Journeys truncate at the FIRST purchase (the standard
    formulation); users who never convert transition to DROP.

    Rows-only by contract (the linear solve is not ANSI-SQL);
    correctness is pinned by a planted two-path chain with hand-derived
    removal effects (tests/test_new_ops_r10b.py)."""
    import numpy as np

    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    seq = e.select(
        "user_id",
        "event_type",
        ts_us.alias("ts_us"),
        "event_id",
        F.row_number().over(w).alias("rn"),
    )
    first_pur = (
        seq.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("conv_rn"))
    )
    j = seq.join(first_pur, "user_id", "left").where(
        F.col("conv_rn").isNull() | (F.col("rn") <= F.col("conv_rn"))
    )
    w2 = Window.partitionBy("user_id").orderBy("rn")
    trans = j.select(
        "user_id",
        F.coalesce(F.lag("event_type").over(w2), F.lit("START")).alias(
            "src"
        ),
        F.col("event_type").alias("dst"),
        "rn",
        "conv_rn",
    )
    # terminal DROP for users who never purchased
    last_rn = j.groupBy("user_id").agg(
        F.max("rn").alias("last_rn"), F.max("conv_rn").alias("c")
    )
    drops = (
        j.join(last_rn, "user_id")
        .where(F.col("c").isNull() & (F.col("rn") == F.col("last_rn")))
        .select(
            F.col("event_type").alias("src"),
            F.lit("DROP").alias("dst"),
        )
    )
    counts = (
        trans.select("src", "dst")
        .unionByName(drops)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()  # bounded: ≤ (|event types| + 2)² rows
    )

    if not counts:
        # zero-row input (empty-catalog audit, r17): no journeys, no
        # chain — an empty typed frame, not a KeyError on START
        return local_rows_frame(
            spark,
            [],
            schema="state string, removal_effect double, "
            "attribution_share double, base_conversion double",
        )
    states = sorted(
        {r["src"] for r in counts} | {r["dst"] for r in counts}
    )
    absorbing = {"purchase", "DROP"}
    transient = [s for s in states if s not in absorbing]
    idx = {s: i for i, s in enumerate(transient)}
    nt = len(transient)
    Q = np.zeros((nt, nt))
    R = np.zeros(nt)  # prob into 'purchase'
    outs = {}
    for r in counts:
        outs[r["src"]] = outs.get(r["src"], 0) + r["n"]
    for r in counts:
        if r["src"] in absorbing:
            continue
        p = r["n"] / outs[r["src"]]
        if r["dst"] == "purchase":
            R[idx[r["src"]]] += p
        elif r["dst"] in idx:
            Q[idx[r["src"]], idx[r["dst"]]] += p

    def conv_prob(skip: str | None) -> float:
        """Absorption probability into 'purchase' from START, with
        ``skip``'s row/column redirected to DROP (state removed)."""
        Qm, Rm = Q.copy(), R.copy()
        if skip is not None:
            i = idx[skip]
            Qm[i, :] = 0.0
            Rm[i] = 0.0          # removed state converts nothing
            Qm[:, i] = 0.0       # nothing routes through it
        x = np.linalg.solve(np.eye(nt) - Qm, Rm)
        return float(x[idx["START"]])

    base = conv_prob(None)
    rows = []
    for s in transient:
        if s == "START":
            continue
        removed = conv_prob(s)
        effect = 0.0 if base == 0 else (base - removed) / base
        rows.append((s, effect))
    total = sum(max(e2, 0.0) for _, e2 in rows)
    out = [
        (
            s,
            round(eff, 6),
            round(0.0 if total == 0 else max(eff, 0.0) / total, 6),
            round(base, 6),
        )
        for s, eff in rows
    ]
    # LocalRelation, not a Python RDD: the solved rows are driver-side
    # already — route through Arrow so materialization costs zero
    # Python-worker handshakes (r18 local_rows_frame rationale)
    return local_rows_frame(
        spark,
        sorted(out),
        "state string, removal_effect double, "
        "attribution_share double, base_conversion double",
    )


# --------------------------------------------------------------------------
# peak concurrent sessions (bucketed sweep-line, no data-sized sort)
# --------------------------------------------------------------------------

@register(
    "sessions_peak_concurrency",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id,
               ts_us
        FROM seq
    ),
    spans AS (
        SELECT user_id, session_id,
               CAST(MIN(ts_us) AS BIGINT) AS s,
               CAST(MAX(ts_us) AS BIGINT) AS e
        FROM sess GROUP BY user_id, session_id
    ),
    bounds AS (
        SELECT user_id, s AS ts_us, CAST(1 AS BIGINT) AS delta FROM spans
        UNION ALL
        SELECT user_id, e, CAST(-1 AS BIGINT) FROM spans
    ),
    run AS (
        SELECT ts_us,
               CAST(SUM(delta) OVER (ORDER BY ts_us, delta DESC, user_id
                                     ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS c
        FROM bounds
    ),
    mx AS (SELECT CAST(MAX(c) AS BIGINT) AS peak FROM run)
    SELECT m.peak AS peak_concurrency,
           CAST(MIN(r.ts_us) AS BIGINT) AS at_us
    FROM run r CROSS JOIN mx m
    WHERE r.c = m.peak
    GROUP BY m.peak
    """,
)
def sessions_peak_concurrency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Peak number of SIMULTANEOUSLY open sessions (and the first
    instant it is reached) — the capacity number a connection-pool /
    state-store sizing exercise actually needs; gap sessions from the
    standard rule, a session counts as open start≤t≤end, and touching
    sessions count as concurrent (+1 sorts before −1 at equal time).

    Shape: the sweep-line cumsum is the classic global-sort trap,
    decomposed the ledger way (the orders_decile_report technique):
    boundary deltas bucket by DAY, a per-bucket window cumsums locally
    in parallel, bucket offsets come from one cumulative pass over the
    bounded |days| ledger, and the global peak is offset + local max —
    no data-sized single partition anywhere (the DuckDB twin uses the
    naive global window: same numbers, embedded engine).  Parity: all
    integer math; ties at equal ts are order-insensitive for the peak
    VALUE (all +1s at a ts are interchangeable) and at_us is the
    MIN ts achieving it."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap > SESSION_GAP_S * 1_000_000, 1).otherwise(0)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        e.select(
            "user_id",
            "event_id",
            ts_us.alias("ts_us"),
            is_new.alias("is_new"),
        )
        .select(
            "user_id",
            "ts_us",
            F.sum("is_new").over(w2).alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").cast("long").alias("s"),
            F.max("ts_us").cast("long").alias("e"),
        )
    )
    bounds = spans.select(
        "user_id", F.col("s").alias("ts_us"), F.lit(1).cast("long").alias("delta")
    ).unionByName(
        spans.select(
            "user_id", F.col("e").alias("ts_us"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    day = F.expr("ts_us div 86400000000")
    b = bounds.withColumn("day", day)
    w_local = (
        Window.partitionBy("day")
        .orderBy(F.col("ts_us"), F.col("delta").desc(), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("local_c", F.sum("delta").over(w_local))
    ledger = b.groupBy("day").agg(F.sum("delta").alias("net"))
    w_led = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # bounded |days| ledger cumulative — never the boundary stream
    offsets = ledger.withColumn(
        "off", F.coalesce(F.sum("net").over(w_led), F.lit(0))
    )
    run = local.join(offsets.select("day", "off"), "day").select(
        "ts_us", (F.col("off") + F.col("local_c")).cast("long").alias("c")
    )
    mx = run.agg(F.max("c").cast("long").alias("peak"))
    return (
        run.crossJoin(F.broadcast(mx))
        .where(F.col("c") == F.col("peak"))
        .groupBy("peak")
        .agg(F.min("ts_us").cast("long").alias("at_us"))
        .select(
            F.col("peak").alias("peak_concurrency"), F.col("at_us")
        )
    )


# --------------------------------------------------------------------------
# hourly load percentiles (capacity-planning tails on COUNTS, not values)
# --------------------------------------------------------------------------

@register(
    "events_hourly_load_percentiles",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, epoch_us(ts) // {_US_PER_HOUR} AS h,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(MAX(y) AS BIGINT)   AS max_load,
           quantile_cont(y, 0.5)    AS p50_load,
           quantile_cont(y, 0.9)    AS p90_load,
           quantile_cont(y, 0.99)   AS p99_load
    FROM hourly
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_hourly_load_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tail percentiles of the HOURLY LOAD per event type — the
    capacity number a provisioning review actually reads (p99
    events/hour), where ``events_value_quantiles_by_type`` profiles
    the value distribution and ``events_interarrival`` the micro gaps.
    Observed hours only: an hour with zero events of a type is absent,
    so the percentiles describe load-when-active (the spine-densified
    zero view is ``events_gapfill``'s job).

    Shape: one (type, hour) count aggregate, then a |types|-row exact
    percentile pass (swap approx_percentile at 100 TB — the
    percentiles_agg scale note).  Parity: inputs are EXACT BIGINT
    counts, so interpolation is bit-identical cross-engine (the r10
    quantile probe); outputs stay UNROUNDED per the r10 new-op
    discipline (rounding would re-introduce the shortest-repr tie
    class)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_HOUR}").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    return sort_bounded(
        hourly.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.max("y").cast("long").alias("max_load"),
            F.percentile("y", 0.5).alias("p50_load"),
            F.percentile("y", 0.9).alias("p90_load"),
            F.percentile("y", 0.99).alias("p99_load"),
        ),
        "event_type",
    )


# --------------------------------------------------------------------------
# inactivity-gap survival curve (churn-risk thresholds)
# --------------------------------------------------------------------------

GAP_SURVIVAL_DAYS = (1, 3, 7)


@register(
    "user_gap_survival",
    oracle=f"""
    WITH gaps AS (
        SELECT (epoch_us(ts)
                - LAG(epoch_us(ts)) OVER (
                      PARTITION BY user_id
                      ORDER BY epoch_us(ts), event_id))
                   // {_US_PER_DAY} AS gap_days
        FROM events
    ),
    g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL),
    thresholds AS (
        SELECT unnest([{", ".join(str(t) for t in GAP_SURVIVAL_DAYS)}])
                   AS threshold_days
    )
    SELECT CAST(t.threshold_days AS BIGINT) AS threshold_days,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(CASE WHEN g.gap_days >= t.threshold_days
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
           CAST(SUM(CASE WHEN g.gap_days >= t.threshold_days
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS survival_share
    FROM g CROSS JOIN thresholds t
    GROUP BY t.threshold_days
    ORDER BY threshold_days
    """,
)
def user_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve of user inactivity gaps: for each churn-risk
    threshold (1/3/7 whole days), the share of consecutive-event gaps
    that reached it — the re-engagement-window calibration
    ``events_interarrival``'s per-type stats and
    ``user_activity_span``'s lifetime view both skip (a 7-day survival
    share of 0.2 says one gap in five would have been flagged by a
    7-day winback trigger).

    Shape: one user-keyed lag window over the event stream (single
    exchange), then each gap meets the |thresholds|-row literal — the
    crossJoin is a 3-row broadcast, and the rollup is
    |thresholds|-bounded.  Parity: gaps are integer-µs subtraction
    floored to whole days (integer div, both engines), counts exact,
    the share an unrounded exact-integer ratio (never-zero denominator:
    a gap row exists only for users with ≥2 events)."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gaps = (
        e.select(
            (ts_us - F.lag(ts_us).over(w)).cast("long").alias("gap_us")
        )
        .where(F.col("gap_us").isNotNull())
        .select(F.expr(f"gap_us div {_US_PER_DAY}").alias("gap_days"))
    )
    thresholds = F.explode(
        F.array(*[F.lit(t) for t in GAP_SURVIVAL_DAYS])
    ).alias("threshold_days")
    exceed = F.when(
        F.col("gap_days") >= F.col("threshold_days"), 1
    ).otherwise(0)
    return sort_bounded(
        gaps.select("gap_days", thresholds)
        .groupBy("threshold_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum(exceed).cast("long").alias("n_exceed"),
            (
                F.sum(exceed).cast("double") / F.count(F.lit(1))
            ).alias("survival_share"),
        )
        .select(
            F.col("threshold_days").cast("long").alias("threshold_days"),
            "n_gaps",
            "n_exceed",
            "survival_share",
        ),
        "threshold_days",
    )


# --------------------------------------------------------------------------
# week-over-week growth per event type (densified week spine)
# --------------------------------------------------------------------------

@register(
    "events_wow_growth",
    oracle=f"""
    WITH weekly AS (
        SELECT event_type,
               epoch_us(ts) // {_US_PER_DAY * 7} AS wk,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(wk) AS lo, MAX(wk) AS hi FROM weekly),
    spine AS (
        SELECT t.event_type, s.wk
        FROM (SELECT DISTINCT event_type FROM weekly) t
        CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS wk
                    FROM bounds) s
    ),
    dense AS (
        SELECT spine.event_type, spine.wk,
               COALESCE(weekly.n_events, 0) AS n_events,
               COALESCE(weekly.n_users, 0)  AS n_users
        FROM spine LEFT JOIN weekly
          ON weekly.event_type = spine.event_type
         AND weekly.wk = spine.wk
    )
    SELECT event_type,
           CAST(wk AS BIGINT)       AS epoch_week,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_users AS BIGINT)  AS n_users,
           CAST(n_events AS DOUBLE)
               / NULLIF(LAG(n_events) OVER (
                     PARTITION BY event_type ORDER BY wk), 0)
               AS wow_ratio
    FROM dense
    ORDER BY event_type, epoch_week
    """,
)
def events_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week event volume per type on a DENSIFIED week spine —
    the growth trend ``revenue_mom_growth`` draws for revenue, here for
    product usage: silent weeks appear as explicit zeros (the crash is
    visible, and the following week's ratio is NULL via NULLIF, never
    an infinity).  Weeks are integer epoch-weeks (epoch_day div 7,
    Thursday-anchored like the r8 day%7 convention) — no calendar/TZ
    dependence.

    Shape: one (type, week) aggregate; the spine is |types|×|weeks|
    (bounded) built from a broadcast distinct-types × generate_series
    cross, and the lag window runs over that bounded ledger only.
    Parity: integer week keys, exact counts, the ratio an unrounded
    exact-integer division guarded by NULLIF on both engines."""
    e = load_table(spark, sf_dir, "events")
    wk_expr = F.expr(f"unix_micros(ts) div {_US_PER_DAY * 7}")
    weekly = e.groupBy(
        "event_type", wk_expr.alias("wk")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    bounds = weekly.agg(
        F.min("wk").alias("lo"), F.max("wk").alias("hi")
    )
    wk_spine = bounds.select(
        F.explode_outer(F.sequence("lo", "hi")).alias("wk")
    )
    types = weekly.select("event_type").distinct()
    spine = F.broadcast(types).crossJoin(F.broadcast(wk_spine))
    dense = spine.join(weekly, ["event_type", "wk"], "left").select(
        "event_type",
        "wk",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
    )
    w = Window.partitionBy("event_type").orderBy("wk")
    prev = F.lag("n_events").over(w)
    return sort_bounded(
        dense.select(
            "event_type",
            F.col("wk").cast("long").alias("epoch_week"),
            "n_events",
            "n_users",
            (
                F.col("n_events").cast("double")
                / F.nullif(prev, F.lit(0))
            ).alias("wow_ratio"),
        ),
        "event_type",
        "epoch_week",
    )


# --------------------------------------------------------------------------
# user event-type diversity (entropy) histogram
# --------------------------------------------------------------------------

ENTROPY_BUCKET_E6 = 200_000  # 0.2-nat buckets; max entropy ln|types|


@register(
    "user_entropy_buckets",
    oracle=f"""
    WITH per AS (
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * CAST(ROUND(
                   ln(CAST(n2.n0 AS DOUBLE) / c) * 1000000, 0)
                   AS BIGINT)) AS BIGINT) AS tsum
        FROM per
        JOIN (SELECT user_id AS uid, CAST(SUM(c) AS BIGINT) AS n0
              FROM per GROUP BY 1) n2
          ON n2.uid = per.user_id
        GROUP BY user_id
    ),
    ent AS (
        SELECT user_id, n, tsum // n AS e6 FROM tot
    )
    SELECT CAST(e6 // {ENTROPY_BUCKET_E6} AS BIGINT) AS entropy_bucket,
           CAST(COUNT(*) AS BIGINT)  AS n_users,
           CAST(SUM(n) AS BIGINT)    AS n_events,
           CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_events_per_user,
           CAST(MIN(e6) AS BIGINT)   AS min_entropy_e6,
           CAST(MAX(e6) AS BIGINT)   AS max_entropy_e6
    FROM ent
    GROUP BY 1
    ORDER BY entropy_bucket
    """,
)
def user_entropy_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user event-type DIVERSITY (Shannon entropy of
    each user's type mix, nats): bucket 0 holds single-feature users,
    the top bucket near ln|types| the full-surface explorers — the
    engagement-breadth segmentation that ``user_event_pareto`` (volume)
    and ``user_lifecycle_stages`` (recency) don't capture.

    Shape: one (user, type) count aggregate, per-user totals joined
    back (user-keyed, no data-sized window), a |users|-row entropy
    reduction, then a bounded bucket rollup.  Parity: each ln term is
    fixed-pointed ×1e6 to BIGINT per TERM (r7 rule), the per-user sum
    closes with an INTEGER division (tsum div n — exact, so the bucket
    key e6 div {ENTROPY_BUCKET_E6} is boundary-stable), entropy bounds
    emitted as exact ×1e6 integers, the mean an unrounded
    exact-integer ratio."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    n0 = per.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n0")
    )
    term = F.col("c") * F.round(
        F.log(F.col("n0").cast("double") / F.col("c")) * 1_000_000, 0
    ).cast("long")
    ent = (
        per.join(n0, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(term).cast("long").alias("tsum"),
        )
        .select(
            "user_id", "n", F.expr("tsum div n").alias("e6")
        )
    )
    return sort_bounded(
        ent.groupBy(
            F.expr(f"e6 div {ENTROPY_BUCKET_E6}")
            .cast("long")
            .alias("entropy_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n").cast("long").alias("n_events"),
            (
                F.sum("n").cast("double") / F.count(F.lit(1))
            ).alias("avg_events_per_user"),
            F.min("e6").cast("long").alias("min_entropy_e6"),
            F.max("e6").cast("long").alias("max_entropy_e6"),
        ),
        "entropy_bucket",
    )


# --------------------------------------------------------------------------
# weekly conversion trend (r11)
# --------------------------------------------------------------------------

@register(
    "weekly_conversion_trend",
    oracle=f"""
    WITH base AS (
        SELECT epoch_us(ts) // {_US_PER_DAY * 7} AS wk,
               user_id,
               event_type,
               value
        FROM events
    )
    SELECT CAST(wk AS BIGINT) AS epoch_week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS BIGINT)
               AS n_buyers,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                    THEN user_id END) AS DOUBLE)
               / COUNT(DISTINCT user_id) AS conversion_share,
           ROUND(SUM(CASE WHEN event_type = 'purchase'
                          THEN value ELSE 0 END), 4) AS purchase_value
    FROM base
    GROUP BY wk
    ORDER BY epoch_week
    """,
)
def weekly_conversion_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekly buyer-conversion trend: active users, buyers, purchase
    count/value and the active→buyer share per integer epoch-week —
    the top-of-deck growth chart that ``events_wow_growth`` (volume)
    and ``session_depth_conversion`` (per-session) bracket from either
    side.  Observed weeks only (the zero-densified volume view is
    events_wow_growth's job).

    Shape: ONE (week)-keyed aggregate with conditional distincts —
    Spark expands the two COUNT DISTINCTs via a single grouping-sets
    style expand, still one data shuffle.  Parity: integer epoch-week
    keys (day div 7, the r8 convention); counts exact; the share an
    unrounded exact-integer ratio (denominator ≥ 1 by construction);
    purchase value is a SINGLE-level ROUND(SUM(raw value), 4) — the
    events.value convention."""
    e = load_table(spark, sf_dir, "events")
    wk = F.expr(f"unix_micros(ts) div {_US_PER_DAY * 7}")
    is_p = F.col("event_type") == "purchase"
    return sort_bounded(
        e.select(
            wk.alias("wk"), "user_id", "event_type", "value"
        )
        .groupBy("wk")
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_active"),
            F.countDistinct(F.when(is_p, F.col("user_id")))
            .cast("long")
            .alias("n_buyers"),
            F.sum(F.when(is_p, 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
            (
                F.countDistinct(
                    F.when(is_p, F.col("user_id"))
                ).cast("double")
                / F.countDistinct("user_id")
            ).alias("conversion_share"),
            F.round(
                F.sum(F.when(is_p, F.col("value")).otherwise(0.0)), 4
            ).alias("purchase_value"),
        )
        .select(
            F.col("wk").cast("long").alias("epoch_week"),
            "n_active",
            "n_buyers",
            "n_purchases",
            "conversion_share",
            "purchase_value",
        ),
        "epoch_week",
    )


# --------------------------------------------------------------------------
# event-type pair latency (r11 wave 2)
# --------------------------------------------------------------------------

@register(
    "event_pair_latency",
    oracle="""
    WITH seq AS (
        SELECT event_type AS next_type,
               LAG(event_type) OVER w AS prev_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT prev_type, next_type,
           CAST(COUNT(*) AS BIGINT)      AS n_pairs,
           CAST(SUM(gap_us) AS BIGINT)   AS total_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS mean_gap_us,
           quantile_cont(gap_us, 0.5)    AS p50_gap_us,
           quantile_cont(gap_us, 0.9)    AS p90_gap_us
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
)
def event_pair_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long does each type→type hand-off take?  For every adjacent
    (prev, next) event-type pair within a user's stream, the count and
    the latency distribution — ``events_transition_matrix`` gives the
    WHERE-NEXT probabilities, this gives the HOW-SOON (a slow
    view→purchase median is a checkout-friction number no transition
    share shows).

    Shape: ONE user-keyed lag window (single exchange, same spine the
    sessionizer rides), then a |types|²-BOUNDED rollup with an exact
    percentile pass (swap approx_percentile at 100 TB).  Parity: the
    window total-orders on (ts_us, event_id) — unique tiebreak; gaps
    are exact BIGINT µs so the interpolated quantiles are bit-identical
    (r10 probe) and mean is an unrounded exact-integer ratio.
    NULL-ts events cannot be sequenced — dropped on BOTH engines
    (null-catalog audit, r18)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    seq = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
        (ts_us - F.lag(ts_us).over(w)).cast("long").alias("gap_us"),
    ).where(F.col("prev_type").isNotNull())
    return sort_bounded(
        seq.groupBy("prev_type", "next_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("gap_us").cast("long").alias("total_gap_us"),
            (
                F.sum("gap_us").cast("double") / F.count(F.lit(1))
            ).alias("mean_gap_us"),
            F.percentile("gap_us", 0.5).alias("p50_gap_us"),
            F.percentile("gap_us", 0.9).alias("p90_gap_us"),
        ),
        "prev_type",
        "next_type",
    )


# --------------------------------------------------------------------------
# purchase periodicity histogram (r11 wave 2)
# --------------------------------------------------------------------------

@register(
    "user_purchase_periodicity",
    oracle=f"""
    WITH p AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
        SELECT user_id,
               ts_us - LAG(ts_us) OVER (
                   PARTITION BY user_id ORDER BY ts_us, event_id)
                   AS gap_us
        FROM p
    ),
    per_user AS (
        SELECT user_id,
               CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
               CAST(SUM(gap_us) AS BIGINT)   AS sum_gap_us
        FROM gaps
        GROUP BY user_id
        HAVING COUNT(gap_us) >= 1
    ),
    bucketed AS (
        SELECT (sum_gap_us // n_gaps) // {_US_PER_DAY}
                   AS mean_gap_days,
               n_gaps
        FROM per_user
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_repeat_buyers
        FROM per_user
    )
    SELECT CAST(b.mean_gap_days AS BIGINT) AS mean_gap_days,
           CAST(COUNT(*) AS BIGINT)        AS n_users,
           CAST(SUM(b.n_gaps) AS BIGINT)   AS n_gaps,
           CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.n_repeat_buyers)
               AS user_share
    FROM bucketed b CROSS JOIN tot t
    GROUP BY b.mean_gap_days
    ORDER BY mean_gap_days
    """,
)
def user_purchase_periodicity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Re-purchase cadence histogram: repeat buyers bucketed by their
    MEAN gap between consecutive purchases in whole days — the
    replenishment-cycle view (a mass at 7 days is a weekly-habit
    cohort) that ``user_gap_survival`` (all events, fixed thresholds)
    and ``customer_repeat_rate`` (orders table, no cadence) bracket.

    Shape: filter to purchases first (pushed to the scan), one
    user-keyed lag window over that thin stream, a per-user reduction,
    then a span-bounded day-histogram; the repeat-buyer total joins
    back as a 1-row broadcast scalar.  Parity: the bucket key is a
    PURE INTEGER chain — (Σgap_us div n) div µs-per-day — exact on both
    engines (never double division, the r9 rule); the share an
    unrounded exact-integer ratio with a ≥1 denominator."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", ts_us.alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = p.select(
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us"),
    )
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").cast("long").alias("n_gaps"),
            F.sum("gap_us").cast("long").alias("sum_gap_us"),
        )
        .where(F.col("n_gaps") >= 1)
    )
    bucketed = per_user.select(
        F.expr(f"(sum_gap_us div n_gaps) div {_US_PER_DAY}").alias(
            "mean_gap_days"
        ),
        "n_gaps",
    )
    tot = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_repeat_buyers")
    )
    return sort_bounded(
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("mean_gap_days")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_gaps").cast("long").alias("n_gaps"),
            (
                F.count(F.lit(1)).cast("double")
                / F.first("n_repeat_buyers")
            ).alias("user_share"),
        )
        .select(
            F.col("mean_gap_days").cast("long").alias("mean_gap_days"),
            "n_users",
            "n_gaps",
            "user_share",
        ),
        "mean_gap_days",
    )


# --------------------------------------------------------------------------
# sessionization gap-parameter sensitivity (r11 wave 2)
# --------------------------------------------------------------------------

SESSION_GAP_SWEEP_MIN = (15, 30, 60)


@register(
    "sessionize_gap_sensitivity",
    oracle=f"""
    WITH g AS (
        SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   AS gap_us
        FROM events
    ),
    u AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
    ),
    t AS (
        SELECT unnest([{", ".join(str(m) for m in SESSION_GAP_SWEEP_MIN)}])
                   AS gap_minutes
    ),
    b AS (
        SELECT t.gap_minutes,
               CAST(SUM(CASE WHEN g.gap_us
                                  > CAST(t.gap_minutes AS BIGINT)
                                    * 60000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_breaks
        FROM g CROSS JOIN t
        GROUP BY t.gap_minutes
    )
    SELECT CAST(b.gap_minutes AS BIGINT) AS gap_minutes,
           u.n_users + b.n_breaks AS n_sessions,
           CAST(u.n_events AS DOUBLE) / (u.n_users + b.n_breaks)
               AS events_per_session
    FROM b CROSS JOIN u
    ORDER BY gap_minutes
    """,
)
def sessionize_gap_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Is the 30-minute session gap a knife-edge?  Session count and
    mean depth under a 15/30/60-minute gap sweep — if the three rows
    barely move, the sessionizer's parameter is safe; if session count
    doubles between 30 and 15, the corpus has a bimodal cadence and
    every session metric downstream inherits the choice.

    Shape: the inter-event gaps are computed ONCE (the same single
    user-keyed window every sessionizer variant pays), each gap then
    meets the |sweep|-row literal (3-row broadcast crossJoin) and the
    totals land via a 1-row scalar join — the sweep costs one window,
    not three sessionization passes.  Parity: session count is pure
    integer arithmetic (users + gap-exceed count; NULL first-event gaps
    fall to ELSE 0 on both engines), depth an unrounded exact-integer
    ratio with denominator ≥ n_users ≥ 1."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    g = e.select((ts_us - F.lag(ts_us).over(w)).alias("gap_us"))
    u = e.agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    t = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(m) for m in SESSION_GAP_SWEEP_MIN])
        ).alias("gap_minutes")
    )
    exceed = F.when(
        F.col("gap_us")
        > F.col("gap_minutes").cast("long") * F.lit(60_000_000),
        1,
    ).otherwise(0)
    b = (
        g.crossJoin(F.broadcast(t))
        .groupBy("gap_minutes")
        .agg(F.sum(exceed).cast("long").alias("n_breaks"))
    )
    return sort_bounded(
        b.crossJoin(F.broadcast(u)).select(
            F.col("gap_minutes").cast("long").alias("gap_minutes"),
            (F.col("n_users") + F.col("n_breaks")).alias("n_sessions"),
            (
                F.col("n_events").cast("double")
                / (F.col("n_users") + F.col("n_breaks"))
            ).alias("events_per_session"),
        ),
        "gap_minutes",
    )


# --------------------------------------------------------------------------
# approx-percentile twins (r12) — the mergeable-sketch 100 TB path
# --------------------------------------------------------------------------

# GK-sketch accuracy: rank error ≤ n/accuracy per group.  At 1e4 the
# sketch is a few KB of fixed-size state per group regardless of n —
# the shuffle carries sketches, never the value multiset.
PCTL_SKETCH_ACCURACY = 10_000


@register("events_hourly_load_percentiles_approx")  # rows-only:
# approx_percentile internals are engine-specific by design; the error
# bound vs the exact twin is pinned in tests/test_new_ops_r12.py
def events_hourly_load_percentiles_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable-sketch twin of ``events_hourly_load_percentiles`` —
    the 100 TB execution path its docstring promises.  The exact op's
    ``F.percentile`` buffers every hourly count of a group in one
    aggregation buffer (N/|types| values — the memory bound SCALE.md's
    pair-latency probe names); ``approx_percentile`` keeps a fixed-size
    GK sketch that partial-aggregates map-side, so the shuffle and the
    reducer hold KBs per group at any corpus size.

    Same (type, hour) count frame as the exact twin; rank error
    ≤ n/``PCTL_SKETCH_ACCURACY`` per group, pinned against the exact
    op by a rank-bracket test at two scale factors."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_US_PER_HOUR}").alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    p = F.approx_percentile(
        "y",
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
        F.lit(PCTL_SKETCH_ACCURACY),
    )
    return sort_bounded(
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.max("y").cast("long").alias("max_load"),
            p.alias("p"),
        )
        .select(
            "event_type",
            "n_hours",
            "max_load",
            F.col("p").getItem(0).cast("double").alias("p50_load"),
            F.col("p").getItem(1).cast("double").alias("p90_load"),
            F.col("p").getItem(2).cast("double").alias("p99_load"),
        ),
        "event_type",
    )


@register("event_pair_latency_approx")  # rows-only: sketch outputs are
# engine-specific; error bound vs the exact twin pinned in
# tests/test_new_ops_r12.py
def event_pair_latency_approx(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable-sketch twin of ``event_pair_latency``.  The exact op's
    per-(prev,next) ``F.percentile`` buffers N/|types|² gap values per
    group — at 100 TB that per-group multiset is the memory bound the
    SCALE.md pair-latency probe documents (percentile is linear TIME
    but the buffer is the real constraint).  This twin swaps in
    ``approx_percentile``: one fixed-size GK sketch per pair, merged
    map-side, identical single-exchange lag-window spine.

    Rank error ≤ n_pairs/``PCTL_SKETCH_ACCURACY`` per pair; the
    count/sum/mean columns stay exact (they already partial-aggregate),
    so only the two tail columns trade accuracy for memory."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    seq = e.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
        (ts_us - F.lag(ts_us).over(w)).cast("long").alias("gap_us"),
    ).where(F.col("prev_type").isNotNull())
    p = F.approx_percentile(
        "gap_us",
        F.array(F.lit(0.5), F.lit(0.9)),
        F.lit(PCTL_SKETCH_ACCURACY),
    )
    return sort_bounded(
        seq.groupBy("prev_type", "next_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("gap_us").cast("long").alias("total_gap_us"),
            (
                F.sum("gap_us").cast("double") / F.count(F.lit(1))
            ).alias("mean_gap_us"),
            p.alias("p"),
        )
        .select(
            "prev_type",
            "next_type",
            "n_pairs",
            "total_gap_us",
            "mean_gap_us",
            F.col("p").getItem(0).cast("double").alias("p50_gap_us"),
            F.col("p").getItem(1).cast("double").alias("p90_gap_us"),
        ),
        "prev_type",
        "next_type",
    )


# --------------------------------------------------------------------------
# inter-session gap stats (r12) — the return-latency distribution
# --------------------------------------------------------------------------

@register(
    "user_intersession_gap_stats",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sess AS (
        SELECT user_id, ts_us,
               SUM(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS sid
        FROM seq
    ),
    spans AS (
        SELECT user_id, sid,
               CAST(MIN(ts_us) AS BIGINT) AS s,
               CAST(MAX(ts_us) AS BIGINT) AS e
        FROM sess GROUP BY user_id, sid
    ),
    gaps AS (
        SELECT user_id,
               s - LAG(e) OVER (PARTITION BY user_id ORDER BY sid)
                   AS gap_us
        FROM spans
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_multi,
           CAST(COUNT(*) AS BIGINT)                AS n_gaps,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(*)  AS mean_gap_us,
           quantile_cont(gap_us, 0.5)              AS p50_gap_us,
           quantile_cont(gap_us, 0.9)              AS p90_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    """,
)
def user_intersession_gap_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How long until users COME BACK?  The distribution of gaps
    BETWEEN sessions (next session start − previous session end) —
    ``events_interarrival`` profiles within-stream micro-gaps and
    ``user_gap_survival`` daily churn thresholds; this is the
    return-latency view a re-engagement campaign is tuned against
    (every gap exceeds the 30-min session cutoff by construction).

    Shape: the standard sessionizer spine — ONE user-keyed exchange
    serves the lag window, the running-sum numbering, the span
    aggregate and the between-span lag — closing to a single global
    stats row (exact percentile buffers hold n_gaps values; swap
    approx_percentile at 100 TB, the percentiles_agg note).  Streaming
    twin: ``streaming_intersession_gaps`` (r13) streams the
    count/total core as per-user partial sums; the p50/p90 columns are
    deliberately NOT streamed — non-mergeable, the pair-latency
    precedent.  Parity:
    pure integer-µs math end to end; mean an unrounded exact-integer
    ratio; interpolated quantiles of exact BIGINTs are bit-identical
    (r10 probe)."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    seq = e.select(
        "user_id",
        "event_id",
        ts_us.alias("ts_us"),
        F.when(gap > SESSION_GAP_S * 1_000_000, 1)
        .otherwise(0)
        .alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        seq.select(
            "user_id",
            "ts_us",
            F.sum("is_new").over(w2).alias("sid"),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").cast("long").alias("s"),
            F.max("ts_us").cast("long").alias("e"),
        )
    )
    w3 = Window.partitionBy("user_id").orderBy("sid")
    gaps = spans.select(
        "user_id",
        (F.col("s") - F.lag("e").over(w3)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.agg(
        F.countDistinct("user_id").cast("long").alias("n_users_multi"),
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        (
            F.sum("gap_us").cast("double") / F.count(F.lit(1))
        ).alias("mean_gap_us"),
        F.percentile("gap_us", 0.5).alias("p50_gap_us"),
        F.percentile("gap_us", 0.9).alias("p90_gap_us"),
    )


# --------------------------------------------------------------------------
# weekly growth accounting (r12) — new / retained / resurrected / churned
# --------------------------------------------------------------------------

@register(
    "user_growth_accounting",
    oracle=f"""
    WITH uw AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // {_US_PER_DAY * 7} AS wk
        FROM events WHERE ts IS NOT NULL
    ),
    mx AS (
        SELECT MAX(epoch_us(ts) // {_US_PER_DAY * 7}) AS max_wk FROM events
    ),
    seq AS (
        SELECT user_id, wk,
               LAG(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
               LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
        FROM uw
    ),
    classes AS (
        SELECT wk,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(SUM(CASE WHEN prev_wk IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN prev_wk = wk - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN prev_wk IS NOT NULL AND prev_wk < wk - 1
                             THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_resurrected
        FROM seq GROUP BY wk
    ),
    churn AS (
        SELECT wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
        FROM seq, mx
        WHERE wk < max_wk AND (next_wk IS NULL OR next_wk > wk + 1)
        GROUP BY 1
    )
    SELECT CAST(COALESCE(classes.wk, churn.wk) AS BIGINT) AS epoch_week,
           CAST(COALESCE(n_active, 0) AS BIGINT)       AS n_active,
           CAST(COALESCE(n_new, 0) AS BIGINT)          AS n_new,
           CAST(COALESCE(n_retained, 0) AS BIGINT)     AS n_retained,
           CAST(COALESCE(n_resurrected, 0) AS BIGINT)  AS n_resurrected,
           CAST(COALESCE(n_churned, 0) AS BIGINT)      AS n_churned,
           CAST(COALESCE(n_new, 0) + COALESCE(n_resurrected, 0) AS DOUBLE)
               / NULLIF(COALESCE(n_churned, 0), 0)     AS quick_ratio
    FROM classes FULL OUTER JOIN churn ON classes.wk = churn.wk
    ORDER BY epoch_week
    """,
)
def user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — every active user classified NEW
    (first-ever week), RETAINED (active the prior week) or RESURRECTED
    (returning after a gap), plus CHURNED counts attributed to the week
    the user went silent and the quick ratio (new+resurrected)/churned
    — the standard growth-team state machine that ``events_retention``
    (cohort view) and ``user_gap_survival`` (gap thresholds) don't
    give directly.

    Shape: ONE user-keyed exchange builds each user's sorted distinct
    week array (calendar-bounded: |weeks| since epoch, never
    data-sized); prev/next derive IN-ROW from the array (posexplode +
    try_element_at, all codegen — the r5 adjacency rule, no second
    lag-window shuffle); the class and churn rollups are week-keyed
    bounded aggregates joined FULL OUTER so a churn-only silent week
    still emits.  Parity: integer epoch-weeks (Thursday-anchored
    ``div``, no TZ), exact counts coalesced to 0 identically, the
    quick ratio an unrounded exact-integer division NULLIF-guarded on
    both engines.  NULL-ts events belong to no week — dropped on BOTH
    engines (null-catalog audit, r18: Spark collect_set silently drops
    the NULL wk while the oracle's DISTINCT keeps it)."""
    e = load_table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    wk = F.expr(f"unix_micros(ts) div {_US_PER_DAY * 7}")
    per_user = (
        e.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("wk")).alias("wks"))
    )
    mx = e.agg(F.max(wk).cast("long").alias("max_wk"))
    seq = per_user.select(
        "user_id",
        "wks",
        F.posexplode("wks").alias("i", "wk"),
    ).select(
        "user_id",
        "wk",
        F.when(
            F.col("i") > 0, F.try_element_at("wks", F.col("i"))
        ).alias("prev_wk"),
        F.try_element_at("wks", F.col("i") + F.lit(2)).alias("next_wk"),
    )
    classes = seq.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum(
            F.when(F.col("prev_wk").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_new"),
        F.sum(
            F.when(F.col("prev_wk") == F.col("wk") - 1, 1).otherwise(0)
        ).cast("long").alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull()
                & (F.col("prev_wk") < F.col("wk") - 1),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_resurrected"),
    )
    churn = (
        seq.crossJoin(F.broadcast(mx))
        .where(
            (F.col("wk") < F.col("max_wk"))
            & (
                F.col("next_wk").isNull()
                | (F.col("next_wk") > F.col("wk") + 1)
            )
        )
        .select((F.col("wk") + 1).alias("wk"))
        .groupBy("wk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    joined = classes.join(churn, "wk", "full_outer").select(
        F.col("wk").cast("long").alias("epoch_week"),
        F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
        F.coalesce("n_resurrected", F.lit(0))
        .cast("long")
        .alias("n_resurrected"),
        F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
    )
    return sort_bounded(
        joined.select(
            "*",
            (
                (F.col("n_new") + F.col("n_resurrected")).cast("double")
                / F.nullif(F.col("n_churned"), F.lit(0))
            ).alias("quick_ratio"),
        ),
        "epoch_week",
    )


# --------------------------------------------------------------------------
# L28 engagement histogram (r12) — days-active in the trailing 28 days
# --------------------------------------------------------------------------

@register(
    "user_engagement_l28",
    oracle=f"""
    WITH mx AS (
        SELECT MAX(epoch_us(ts) // {_US_PER_DAY}) AS max_day FROM events
    ),
    ud AS (
        SELECT user_id,
               CAST(COUNT(DISTINCT epoch_us(ts) // {_US_PER_DAY})
                    AS BIGINT) AS days_active
        FROM events, mx
        WHERE epoch_us(ts) // {_US_PER_DAY} > max_day - 28
        GROUP BY user_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ud)
    SELECT CAST(days_active AS BIGINT)  AS days_active,
           CAST(COUNT(*) AS BIGINT)    AS n_users,
           CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM tot) AS user_share
    FROM ud GROUP BY days_active ORDER BY days_active
    """,
)
def user_engagement_l28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The L28 engagement histogram — for every user active in the 28
    days ending at the corpus max day, the count of distinct active
    days (1..28) and the user share per bucket.  The classic
    power-user curve: a right-leaning hump is habit, a wall at 1 is
    drive-by traffic; ``events_dau_wau`` tracks the ratio over time,
    this is the distribution snapshot behind it.

    Shape: scalar max-day aggregate broadcast into the scan filter,
    then ONE user-keyed distinct-day aggregate and a bounded (≤28-row)
    histogram; the user-share denominator is a 1-row aggregate joined
    as a broadcast literal.  Parity: integer epoch-days, exact counts,
    the share an unrounded exact-integer ratio (denominator ≥ 1 by
    construction — every ud row counts itself)."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(ts) div {_US_PER_DAY}")
    mx = e.agg(F.max(day).cast("long").alias("max_day"))
    ud = (
        e.select("user_id", day.alias("d"))
        .crossJoin(F.broadcast(mx))
        .where(F.col("d") > F.col("max_day") - 28)
        .groupBy("user_id")
        .agg(F.countDistinct("d").cast("long").alias("days_active"))
    )
    tot = ud.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return sort_bounded(
        ud.groupBy("days_active")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "days_active",
            "n_users",
            (F.col("n_users").cast("double") / F.col("n")).alias(
                "user_share"
            ),
        ),
        "days_active",
    )


# --------------------------------------------------------------------------
# power-law tail of user engagement (r12c) — CCDF slope off the ledger
# --------------------------------------------------------------------------

@register(
    "user_activity_ccdf_slope",
    oracle="""
    WITH uc AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    ledger AS (
        SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM uc GROUP BY c
    ),
    pts AS (
        SELECT c,
               CAST(SUM(m) OVER (ORDER BY c DESC) AS BIGINT) AS n_ge
        FROM ledger
    ),
    terms AS (
        SELECT CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)
                   AS x,
               CAST(ROUND(ln(CAST(n_ge AS DOUBLE)) * 1000000) AS BIGINT)
                   AS y
        FROM pts
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT)    AS n,
               CAST(SUM(x) AS BIGINT)      AS sx,
               CAST(SUM(y) AS BIGINT)      AS sy,
               CAST(SUM(x * y) AS BIGINT)  AS sxy,
               CAST(SUM(x * x) AS BIGINT)  AS sxx
        FROM terms
    )
    SELECT (SELECT CAST(SUM(m) AS BIGINT) FROM ledger) AS n_users,
           n AS n_levels,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS ccdf_slope
    FROM s WHERE n >= 2
    """,
)
def user_activity_ccdf_slope(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Is user engagement power-law distributed?  OLS slope of
    ln P(activity ≥ c) on ln c over the complementary CDF — fit on the
    counts-of-counts LEDGER (one point per distinct activity level),
    the statistically cleaner cousin of a per-rank Zipf fit (no rank
    ties to arbitrate, and the ledger is bounded by |distinct levels|,
    never |users| — the ``vocab_topk_coverage`` decomposition applied
    to a regression).  A slope near −1 is the classic participation
    long tail; a cliff toward −∞ means engagement is homogeneous and
    whale-based capacity planning is wrong.

    Shape: user-keyed count, level-keyed ledger rollup, one bounded
    descending-cumsum window (SinglePartition over the ledger — the
    bounded class), a 1-row regression close.  Parity: ln terms
    fixed-pointed to BIGINT e6 PER POINT (r7 rule); factor sums stay
    BIGINT and are cast to DOUBLE separately before multiplying (the
    r8 overflow rule); the slope is emitted UNROUNDED (identical IEEE
    arithmetic over exact integers); single-level ledgers dropped by
    an identical n >= 2 filter (zero OLS denominator).  At extreme
    ledger sizes (≫1e5 levels) the x·y term sum approaches BIGINT
    range — bucket levels log-spaced first; ANSI mode fails loudly."""
    e = load_table(spark, sf_dir, "events")
    uc = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ledger = uc.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    w = Window.orderBy(F.col("c").desc())  # bounded: distinct levels
    pts = ledger.select(
        "c", F.sum("m").over(w).cast("long").alias("n_ge")
    )
    terms = pts.select(
        F.round(F.log(F.col("c").cast("double")) * 1_000_000)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("n_ge").cast("double")) * 1_000_000)
        .cast("long")
        .alias("y"),
    )
    s = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    tot = ledger.agg(F.sum("m").cast("long").alias("n_users"))
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    den = F.col("n").cast("double") * F.col("sxx").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sx").cast("double")
    return (
        s.where(F.col("n") >= 2)
        .crossJoin(F.broadcast(tot))
        .select(
            "n_users",
            F.col("n").alias("n_levels"),
            (num / den).alias("ccdf_slope"),
        )
    )


# --------------------------------------------------------------------------
# hour-of-day concentration per type (r12c) — the automation smell test
# --------------------------------------------------------------------------

@register(
    "events_type_hour_entropy",
    oracle=f"""
    WITH cells AS (
        SELECT event_type,
               (epoch_us(ts) // {_US_PER_HOUR}) % 24 AS hour_of_day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_hours
        FROM cells GROUP BY event_type
    ),
    ent AS (
        SELECT c.event_type,
               CAST(SUM(c.c * CAST(ROUND(
                   ln(CAST(t.n AS DOUBLE) / c.c) * 1000000, 0)
                   AS BIGINT)) AS BIGINT) // ANY_VALUE(t.n)
                   AS entropy_e6
        FROM cells c JOIN tot t ON t.event_type = c.event_type
        GROUP BY c.event_type
    ),
    pk AS (
        SELECT event_type, hour_of_day AS peak_hour, c AS peak_c
        FROM (
            SELECT event_type, hour_of_day, c,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY c DESC, hour_of_day) AS rn
            FROM cells
        ) WHERE rn = 1
    )
    SELECT t.event_type,
           t.n AS n_events,
           t.n_hours,
           CAST(pk.peak_hour AS BIGINT) AS peak_hour,
           CAST(pk.peak_c AS DOUBLE) / t.n AS peak_share,
           e.entropy_e6
    FROM tot t
    JOIN pk ON pk.event_type = t.event_type
    JOIN ent e ON e.event_type = t.event_type
    ORDER BY t.event_type
    """,
)
def events_type_hour_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-of-day concentration per event type: Shannon entropy
    (nats, ×1e6 integer) of each type's 24-hour activity distribution
    plus the modal hour and its share — the automation smell test
    (human traffic spreads toward ln 24 ≈ 3.178; a cron-driven or bot
    type collapses toward one hour).  The heatmap
    (``events_weekday_hour_heatmap``) shows the raw cells; this is the
    per-type concentration number a triage alert thresholds on.

    Shape: one (type, hour) aggregate (≤ |types|·24 cells), bounded
    rollups.  Parity: pure-integer UTC hour key ((µs div hour) % 24 —
    no calendar/TZ); the entropy is the ``source_lang_entropy``
    template (per-term round(ln(n/c)·1e6) BIGINT weighted by c,
    integer-divided by n — order-independent); the modal hour is
    total-ordered (c DESC, hour); peak share an unrounded
    exact-integer ratio."""
    e = load_table(spark, sf_dir, "events")
    hour = F.expr(f"(unix_micros(ts) div {_US_PER_HOUR}) % 24")
    cells = e.groupBy(
        "event_type", hour.alias("hour_of_day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = cells.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
    )
    term = F.col("c") * F.round(
        F.log(F.col("n").cast("double") / F.col("c")) * 1_000_000, 0
    ).cast("long")
    ent = (
        cells.join(tot.select("event_type", "n"), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(term).cast("long").alias("tsum"),
            F.first("n").alias("n0"),
        )
        .select("event_type", F.expr("tsum div n0").alias("entropy_e6"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("hour_of_day")
    )
    pk = (
        cells.select(
            "event_type",
            "hour_of_day",
            "c",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("hour_of_day").cast("long").alias("peak_hour"),
            F.col("c").alias("peak_c"),
        )
    )
    return sort_bounded(
        tot.join(pk, "event_type")
        .join(ent, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            "n_hours",
            "peak_hour",
            (F.col("peak_c").cast("double") / F.col("n")).alias(
                "peak_share"
            ),
            "entropy_e6",
        ),
        "event_type",
    )


# --------------------------------------------------------------------------
# sessions-per-user histogram (r13)
# --------------------------------------------------------------------------

@register(
    "user_session_count_histogram",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         > {SESSION_GAP_S} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    per_user AS (
        SELECT user_id, CAST(1 + SUM(is_new) AS BIGINT) AS n_sessions
        FROM seq GROUP BY user_id
    )
    SELECT n_sessions AS sessions_per_user,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user
    GROUP BY n_sessions
    ORDER BY sessions_per_user
    """,
)
def user_session_count_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How many sessions does a user rack up?  The counts-of-counts
    histogram over the sessionizer spine — the engagement-frequency
    view next to ``session_duration_histogram`` (how long) and
    ``user_intersession_gap_stats`` (how long until back); its tail is
    the power-user segment a retention team studies.

    Shape: ONE user-keyed exchange serves the lag window and the
    per-user aggregate (sessions = 1 + Σ is_new — the first session
    has no >gap delta, same strictly-greater rule as every sessionizer
    here); the histogram regroups |users| rows by a small integer key.
    Output is histogram-bounded → sort_bounded.  Parity: pure integer
    µs math and BIGINT counts end to end."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    seq = e.select(
        "user_id",
        F.when(gap > SESSION_GAP_S * 1_000_000, 1)
        .otherwise(0)
        .alias("is_new"),
    )
    per_user = seq.groupBy("user_id").agg(
        (F.lit(1) + F.sum("is_new")).cast("long").alias("n_sessions")
    )
    return sort_bounded(
        per_user.groupBy(
            F.col("n_sessions").alias("sessions_per_user")
        ).agg(F.count(F.lit(1)).cast("long").alias("n_users")),
        "sessions_per_user",
    )


# --------------------------------------------------------------------------
# funnel window sensitivity (r13) — the conversion-window parameter sweep
# --------------------------------------------------------------------------

FUNNEL_WINDOW_SWEEP_DAYS = (1, 7, 30, 90)


@register(
    "funnel_window_sensitivity",
    oracle=f"""
    WITH s AS (
        SELECT user_id, MIN(epoch_us(ts)) AS signup_us
        FROM events WHERE event_type = '{FUNNEL_FROM}' GROUP BY user_id
    ),
    fp AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = '{FUNNEL_TO}'
          AND epoch_us(e.ts) >= s.signup_us
        GROUP BY e.user_id
    ),
    u AS (
        SELECT s.user_id, s.signup_us, fp.purchase_us
        FROM s LEFT JOIN fp ON fp.user_id = s.user_id
    ),
    t AS (
        SELECT unnest([{", ".join(str(d) for d in FUNNEL_WINDOW_SWEEP_DAYS)}])
                   AS window_days
    )
    SELECT CAST(t.window_days AS BIGINT) AS window_days,
           CAST(COUNT(*) AS BIGINT) AS n_signed_up,
           CAST(SUM(CASE WHEN u.purchase_us IS NOT NULL
                          AND u.purchase_us - u.signup_us
                              <= CAST(t.window_days AS BIGINT) * 86400000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CAST(SUM(CASE WHEN u.purchase_us IS NOT NULL
                          AND u.purchase_us - u.signup_us
                              <= CAST(t.window_days AS BIGINT) * 86400000000
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / NULLIF(COUNT(*), 0) AS conv_share
    FROM u CROSS JOIN t
    GROUP BY t.window_days
    ORDER BY window_days
    """,
)
def funnel_window_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Is the conversion rate a function of how long you wait?  The
    signup→purchase funnel under a 1/7/30/90-day attribution-window
    sweep — the parameter ``events_funnel`` fixes implicitly at ∞; if
    the 7→30 step still moves the share, reported "conversion" is
    really a window choice (the same knife-edge question
    ``sessionize_gap_sensitivity`` asks of the session gap).

    Shape: the r11 sweep template — the per-user (first signup, first
    at-or-after purchase) frame is computed ONCE (two filtered per-user
    aggregates + one equi-join), then meets the |sweep|-row literal via
    a broadcast crossJoin; the window test is PURE BIGINT
    (purchase_us − signup_us ≤ days·86400e6 — never a double date
    diff).  Parity: integer-µs math end to end, conversion share an
    exact-integer ratio (unrounded) with a NULLIF-guarded denominator
    spelled identically on both engines (Spark 4 ANSI division
    throws, DuckDB yields inf — the r7 rule).  Fixture windows 30/90
    read identically (the corpus spans ~1 month) — the sweep bend is
    pinned by a planted 2/10/40-day-converter test
    (tests/test_new_ops_r13.py).  Streaming twin (r15):
    ``streaming_funnel_attribution`` maintains the per-user
    (signup_us, purchase_us) frame as a reclassifying changelog; the
    sweep is a stateless rollup of its newest rows."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.where(F.col("event_type") == FUNNEL_FROM)
        .groupBy("user_id")
        .agg(F.unix_micros(F.min("ts")).alias("signup_us"))
    )
    fp = (
        e.where(F.col("event_type") == FUNNEL_TO)
        .join(s, "user_id")
        .where(F.unix_micros(F.col("ts")) >= F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min(F.unix_micros(F.col("ts"))).alias("purchase_us"))
    )
    u = s.join(fp, "user_id", "left")
    t = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(d) for d in FUNNEL_WINDOW_SWEEP_DAYS])
        ).alias("window_days")
    )
    converted = F.when(
        F.col("purchase_us").isNotNull()
        & (
            F.col("purchase_us") - F.col("signup_us")
            <= F.col("window_days").cast("long") * F.lit(86_400_000_000)
        ),
        1,
    ).otherwise(0)
    return sort_bounded(
        u.crossJoin(F.broadcast(t))
        .groupBy(F.col("window_days").cast("long").alias("window_days"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_signed_up"),
            F.sum(converted).cast("long").alias("n_converted"),
            (
                F.sum(converted).cast("double")
                / F.nullif(F.count(F.lit(1)), F.lit(0))
            ).alias("conv_share"),
        ),
        "window_days",
    )
