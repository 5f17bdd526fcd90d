"""Catalog plan cache: same session reuses the analyzed plan, the events
ts conversion survives caching, and cached plans still re-scan files
lazily (only listing + schema are frozen, never data)."""

from __future__ import annotations

from googlecloudstorage_blueprints_spark.sources.catalog import (
    _PLAN_CACHE,
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_same_session_returns_same_plan(spark):
    a = load_table(spark, SF, "lineitem")
    b = load_table(spark, SF, "lineitem")
    assert a is b


def test_cache_keyed_by_sf_dir(spark):
    a = load_table(spark, SF, "nation")
    b = load_table(spark, "/root/testdata/sf0.01", "nation")
    assert a is not b
    assert a.count() != b.count() or a.count() == 25  # distinct datasets


def test_events_ts_conversion_cached(spark):
    ev = load_table(spark, SF, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    assert load_table(spark, SF, "events") is ev


def test_cache_entries_scoped_to_live_app(spark):
    load_table(spark, SF, "region")
    app = spark.sparkContext.applicationId
    assert all(k[0] == app for k in _PLAN_CACHE)
