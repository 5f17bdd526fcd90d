"""Smoke the Structured Streaming twins against the replayed fixture and
check they agree with their canonical batch forms where semantics allow."""

from __future__ import annotations

import pyspark.sql.functions as F

from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.streaming import (
    run_stream_to_memory,
    streaming_session_window,
    streaming_tumbling_agg,
)

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark):
    stream_df = streaming_tumbling_agg(spark, SF)
    assert stream_df.isStreaming
    got = run_stream_to_memory(stream_df, "tumbling_smoke")
    got_rows = {
        r["bucket"]: (r["n_events"], r["total_value"]) for r in got.collect()
    }
    batch = all_queries()["events_tumbling_agg"](spark, SF)
    batch_rows = {
        r["bucket"]: (r["n_events"], r["total_value"]) for r in batch.collect()
    }
    # the replayed backlog is finite: every batch bucket must appear with
    # identical counts (watermark can't drop anything in availableNow replay
    # of ordered history except possibly the final open window)
    missing = {
        k: v for k, v in batch_rows.items()
        if k in got_rows and got_rows[k] != v
    }
    assert not missing, f"stream/batch divergence: {missing}"
    assert len(got_rows) >= len(batch_rows) - 1


def test_streaming_session_window_smoke(spark):
    stream_df = streaming_session_window(spark, SF)
    assert stream_df.isStreaming
    got = run_stream_to_memory(stream_df, "session_smoke")
    rows = got.collect()
    assert rows, "no sessions emitted"
    # session invariants: start<=end, positive counts
    bad = [
        r for r in rows
        if r["start_us"] > r["end_us"] or r["n_events"] <= 0
    ]
    assert not bad
    # total events across sessions ≤ fixture events (watermark may hold
    # back the tail session), and > 0
    total = sum(r["n_events"] for r in rows)
    n_fixture = (
        spark.read.parquet(f"{SF}/events.parquet").count()
    )
    assert 0 < total <= n_fixture
