"""Pins for the r18 ``local_rows_frame`` optimization.

``spark.createDataFrame(list)`` parallelizes literal rows into a Python
RDD (plan ``Scan ExistingRDD``): every materialization pays one Python
worker handshake per partition, and under ``coalesce(1)``
(``sort_bounded``) those handshakes serialize — measured ~6 s/run for
the 4-row ``user_event_pareto`` cuts frame at sf0.1.  The helper routes
the same rows through pandas+Arrow into a JVM LocalRelation
(``LocalTableScan`` — zero tasks at evaluation) with bit-identical
values.  These pins keep the plan shape and the value identity."""

from __future__ import annotations

from googlecloudstorage_blueprints_spark.functions.frames import (
    local_rows_frame,
)
from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.plans.inspect import explain_str

SF = "/root/testdata/sf0.001"


def test_local_rows_frame_plans_local_table_scan(spark):
    df = local_rows_frame(
        spark, [(1, 2.5, "a"), (2, None, None)], "k long, v double, s string"
    )
    plan = explain_str(df, "simple")
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_local_rows_frame_values_match_classic_path(spark):
    rows = [(1, 0.1, "x"), (7, None, "émoji ✓"), (-3, 2.0, None)]
    schema = "k long, v double, s string"
    fast = local_rows_frame(spark, rows, schema)
    classic = spark.createDataFrame(rows, schema)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, classic.collect())
    )
    assert fast.schema == classic.schema


def test_user_event_pareto_has_no_python_rdd_scan(spark):
    """The op-level effect: the cuts frame is a LocalRelation, so the
    whole query evaluates with zero Python-RDD scans."""
    df = all_queries()["user_event_pareto"](spark, SF)
    plan = explain_str(df, "simple")
    assert "ExistingRDD" not in plan
    assert "LocalTableScan" in plan
