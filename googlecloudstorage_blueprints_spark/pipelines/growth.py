"""Growth mart: events → per-(user, week) class rows → week-partitioned
write.

The growth-team twin of the session mart (``sessions.py``): one row per
(user, active epoch-week) carrying the NEW / RETAINED / RESURRECTED
class plus the user's previous active week — the table every growth
dashboard (quick-ratio trend, resurrection cohorts, churn-risk pull)
filters by week, so it is written hive-partitioned on ``epoch_week``
and every derived number is pinned against the registered
``user_growth_accounting`` operator in tests/test_pipelines.py.

Scale: the ONE user-keyed exchange of the operator builds each user's
sorted distinct week array (calendar-bounded); classes derive in-row;
the write's repartition is week-keyed.  Churn rows are deliberately NOT
materialized per user (churn is a property of the FOLLOWING week and is
derivable from this table by a week-shifted anti-join); the report
carries the weekly churn totals so the mart build still surfaces them.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.sinks import write_partitioned
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

_US_PER_WEEK = 7 * 86_400_000_000


@dataclass(frozen=True)
class GrowthMartReport:
    n_users: int
    n_weeks: int
    n_rows: int          # (user, week) rows written
    n_new: int
    n_retained: int
    n_resurrected: int
    n_churn_events: int  # week-attributed churn totals (not materialized)


def _user_week_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, epoch_week, prev_week, cls) — the operator's seq frame
    with the class spelled out per row."""
    e = load_table(spark, sf_dir, "events")
    wk = F.expr(f"unix_micros(ts) div {_US_PER_WEEK}")
    per_user = (
        e.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.sort_array(F.collect_set("wk")).alias("wks"))
    )
    seq = per_user.select(
        "user_id",
        "wks",
        F.posexplode("wks").alias("i", "wk"),
    ).select(
        "user_id",
        F.col("wk").cast("long").alias("epoch_week"),
        F.when(
            F.col("i") > 0, F.try_element_at("wks", F.col("i"))
        )
        .cast("long")
        .alias("prev_week"),
        F.try_element_at("wks", F.col("i") + F.lit(2))
        .cast("long")
        .alias("next_week"),
    )
    cls = (
        F.when(F.col("prev_week").isNull(), F.lit("new"))
        .when(
            F.col("prev_week") == F.col("epoch_week") - 1,
            F.lit("retained"),
        )
        .otherwise(F.lit("resurrected"))
    )
    return seq.select(
        "user_id", "epoch_week", "prev_week", "next_week", cls.alias("cls")
    )


def build_growth_mart(
    spark: SparkSession, sf_dir: str, out_path: str
) -> GrowthMartReport:
    """Build and write the growth mart; returns class totals pinned
    against ``user_growth_accounting``."""
    rows = _user_week_classes(spark, sf_dir)
    write_partitioned(rows, out_path, ["epoch_week"])
    written = spark.read.parquet(out_path)
    mx = written.agg(F.max("epoch_week").alias("m")).collect()[0]["m"]
    totals = written.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("epoch_week").alias("w"),
        F.count(F.lit(1)).alias("r"),
        F.sum((F.col("cls") == "new").cast("long")).alias("n"),
        F.sum((F.col("cls") == "retained").cast("long")).alias("t"),
        F.sum((F.col("cls") == "resurrected").cast("long")).alias("s"),
        F.sum(
            (
                (F.col("epoch_week") < F.lit(mx))
                & (
                    F.col("next_week").isNull()
                    | (F.col("next_week") > F.col("epoch_week") + 1)
                )
            ).cast("long")
        ).alias("c"),
    ).collect()[0]
    return GrowthMartReport(
        n_users=totals["u"],
        n_weeks=totals["w"],
        n_rows=totals["r"],
        n_new=totals["n"],
        n_retained=totals["t"],
        n_resurrected=totals["s"],
        n_churn_events=totals["c"],
    )
