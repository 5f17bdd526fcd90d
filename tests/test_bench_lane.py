"""Pins for bench.py's spark-only ``rows_only_lane`` (r12 VERDICT item 6).

The lane is the ONLY round-over-round visibility into the no-oracle
heavies (minhash, PQ-ANN, kmeans, pagerank): the ≤2× gate's slope ratio
is computed over queries present in the DuckDB maps, so a regression in
a rows-only op is invisible to ``gate_value``.  A bench.py refactor
that drops the lane would silently blind the judge — these pins fail
instead.  (Running the full bench in a test is out of budget; the pins
are structural: the lane list, its registry contract, and the wiring of
``rows_only_lane`` into both the detail file and the summary line.)
"""

from __future__ import annotations

import ast
import os

import bench
from googlecloudstorage_blueprints_spark.operators import (
    REGISTRY,
    _load_all,
)

BENCH_PATH = os.path.join(os.path.dirname(bench.__file__), "bench.py")


def test_lane_lists_the_rows_only_heavies():
    _load_all()
    assert len(bench.ROWS_ONLY_LANE) >= 4
    for name in bench.ROWS_ONLY_LANE:
        assert name in REGISTRY, name
        assert REGISTRY[name].oracle is None, (
            f"{name} is oracle-backed — the gate already sees it; "
            "the lane is for no-oracle heavies only"
        )
    # the four r12 lane members stay tracked unless deliberately replaced
    for name in (
        "minhash_lsh_dedup",
        "similarity_knn_pq",
        "embedding_kmeans_inertia",
        "copurchase_pagerank",
    ):
        assert name in bench.ROWS_ONLY_LANE, name


def test_lane_is_wired_into_summary_and_detail():
    """The summary JSON line and BENCH_DETAIL.json both carry a
    ``rows_only_lane`` entry (AST-level: every dict literal keyed with
    that string must exist in bench.main)."""
    src = open(BENCH_PATH).read()
    tree = ast.parse(src)
    lane_keys = [
        node
        for node in ast.walk(tree)
        if isinstance(node, ast.Constant) and node.value == "rows_only_lane"
    ]
    # one for the detail dict, one for the summary dict (at least)
    assert len(lane_keys) >= 2, (
        "rows_only_lane missing from bench output wiring"
    )
    # and the per-key lane record must publish warm + slope fields
    for field in ("warm", "warm_sf01", "warm_sf001",
                  "slope_seconds_high", "slope_seconds_full"):
        assert f'"{field}"' in src, field


def test_gate_decomposition_is_wired_into_summary():
    """r18 (r17 verdict item 2): the summary line must carry the gate's
    paired totals (``gate_decomposition``: Δspark_total + per-sweep
    Δduck totals) and the compact per-query ``slope_detail_high`` so a
    round-over-round gate swing is attributable from BENCH_r{N}.json
    alone — without builder-host access.  Structural pin, same style
    as the lane wiring test."""
    src = open(BENCH_PATH).read()
    tree = ast.parse(src)
    keys = [
        node.value
        for node in ast.walk(tree)
        if isinstance(node, ast.Constant)
        and node.value in ("gate_decomposition", "slope_detail_high")
    ]
    # gate_decomposition: detail dict + summary dict (>=2);
    # slope_detail_high: detail dict + summary dict (>=2)
    assert keys.count("gate_decomposition") >= 2
    assert keys.count("slope_detail_high") >= 2
