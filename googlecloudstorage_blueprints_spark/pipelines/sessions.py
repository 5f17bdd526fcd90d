"""Behavioral session mart: events → sessionize → per-session feature
rows → day-partitioned write.

The second composed pipeline (``curate.py`` is the corpus one): the
table a product-analytics team actually queries — one row per session
with bounds, depth, value, entry/exit types, and a bounce flag — built
in ONE sessionization pass (the registered ops' lag+cumsum convention,
so every derived number is pinned against its source operator in
tests/test_pipelines.py) and written partitioned by the session's
start epoch-day, the predicate every dashboard query carries.

Scale: one user-keyed exchange serves the gap window, the cumsum, and
the two entry/exit rank windows (identical partitioning); the feature
aggregate collapses to |sessions| rows before anything is written; the
day partitioning makes downstream reads partition-pruned.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.sinks import write_partitioned
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

SESSION_GAP_SECONDS = 1800  # the repo-wide 30-min gap
_US_PER_DAY = 86_400_000_000


@dataclass(frozen=True)
class SessionMartReport:
    n_events: int
    n_sessions: int
    n_bounces: int
    n_days: int         # distinct start epoch-days written
    n_users: int


def build_session_mart(
    spark: SparkSession, sf_dir: str, out_path: str
) -> SessionMartReport:
    """Build and write the session mart; returns summary counts."""
    e = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    gap = ts_us - F.lag(ts_us).over(w)
    is_new = F.when(gap > SESSION_GAP_SECONDS * 1_000_000, 1).otherwise(0)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        ts_us.alias("ts_us"),
        is_new.alias("is_new"),
    ).select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        "ts_us",
        F.sum("is_new").over(w2).cast("long").alias("session_id"),
    )
    w_fwd = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    w_bwd = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    marked = tagged.select(
        "user_id",
        "session_id",
        "event_type",
        "value",
        "ts_us",
        F.row_number().over(w_fwd).alias("rk_fwd"),
        F.row_number().over(w_bwd).alias("rk_bwd"),
    )
    sessions = (
        marked.groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").cast("long").alias("start_us"),
            F.max("ts_us").cast("long").alias("end_us"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max(
                F.when(F.col("rk_fwd") == 1, F.col("event_type"))
            ).alias("entry_type"),
            F.max(
                F.when(F.col("rk_bwd") == 1, F.col("event_type"))
            ).alias("exit_type"),
        )
        .select(
            "user_id",
            "session_id",
            "start_us",
            "end_us",
            F.expr("(end_us - start_us) div 1000000").alias(
                "duration_sec"
            ),
            "n_events",
            "total_value",
            "entry_type",
            "exit_type",
            (F.col("n_events") == 1).alias("is_bounce"),
            F.expr(f"start_us div {_US_PER_DAY}").alias("epoch_day"),
        )
    )
    write_partitioned(sessions, out_path, ["epoch_day"])

    written = spark.read.parquet(out_path)
    agg = written.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.sum(F.col("is_bounce").cast("int")).alias("n_bounces"),
        F.countDistinct("epoch_day").alias("n_days"),
        F.countDistinct("user_id").alias("n_users"),
    ).collect()[0]
    return SessionMartReport(
        n_events=int(agg["n_events"]),
        n_sessions=int(agg["n_sessions"]),
        n_bounces=int(agg["n_bounces"]),
        n_days=int(agg["n_days"]),
        n_users=int(agg["n_users"]),
    )
