"""Size gate for ``copurchase_pagerank``'s per-round broadcasts (r12
VERDICT item 1).

Nodes in the co-purchase graph are distinct co-purchased parts —
DATA-sized, not dimension-bounded — so the per-round ``F.broadcast`` of
the rank frame is only safe under an explicit node-count ceiling
(``PAGERANK_BROADCAST_MAX_NODES``).  These pins prove:

1. the >threshold branch plans SHUFFLE joins with no broadcast of the
   rank/contribution frames (the exact failure the gate prevents is a
   forced tens-of-millions-row broadcast OOMing the driver);
2. the large branch pre-partitions the edge frame on ``src`` once so
   every round's contribution join reuses that co-partitioning (no
   per-round exchange on the edge side);
3. both branches produce IDENTICAL ranks — integer fixed-point
   arithmetic makes the equality exact, so the gate can never change
   answers, only plans.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.operators import graph
from googlecloudstorage_blueprints_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
)

from tests.test_new_ops_r12c import _lineitem_table, _planted_dir

SF = "/root/testdata/sf0.001"


def _round_frames(spark):
    """Tiny checkpointed frames shaped like one pagerank round's inputs
    (checkpointed = no Catalyst stats, exactly the production shape)."""
    nodes = (
        spark.createDataFrame([(1, 1), (2, 1)], "src long, deg long")
        .localCheckpoint(eager=True)
    )
    edges_deg = (
        spark.createDataFrame(
            [(1, 2, 1), (2, 1, 1)], "src long, dst long, deg long"
        )
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select(
        F.col("src").alias("node"),
        F.lit(500_000_000_000).cast("long").alias("rank_e12"),
    )
    return nodes, edges_deg, ranks


def test_large_branch_round_plans_no_broadcast(spark):
    _nodes, edges_deg, ranks = _round_frames(spark)
    out = graph._pagerank_round(
        edges_deg, ranks, base=1, broadcast_nodes=False
    )
    assert not has_broadcast_join(out)
    # the single contribution join plans as a shuffle join (the r18
    # round drops the historical row-identity nodes re-attach join)
    plan = explain_str(out, "simple")
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_small_branch_round_plans_broadcast(spark):
    _nodes, edges_deg, ranks = _round_frames(spark)
    out = graph._pagerank_round(
        edges_deg, ranks, base=1, broadcast_nodes=True
    )
    assert has_broadcast_join(out)


def test_gate_branches_produce_identical_ranks(spark, tmp_path, monkeypatch):
    """Force the large branch on a planted graph and on the fixture:
    ranks must be bit-identical to the broadcast branch (integer
    fixed-point — the gate changes plans, never answers)."""
    rows = []
    for i, leaf in enumerate([201, 202, 203, 204], 1):
        rows.append((i, 100, 1))
        rows.append((i, leaf, 2))
    # connect a second component so >1 cluster shape is covered
    rows += [(10, 301, 1), (10, 302, 2), (11, 301, 1), (11, 302, 2)]
    sf_dir = _planted_dir(tmp_path, {"lineitem": _lineitem_table(rows)})
    q = all_queries()["copurchase_pagerank"]

    small = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    monkeypatch.setattr(graph, "PAGERANK_BROADCAST_MAX_NODES", 0)
    large = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    assert small == large and len(small) == 7

    # fixture run under the large branch still returns the full top-K,
    # deterministically
    a = [tuple(r) for r in q(spark, SF).collect()]
    b = [tuple(r) for r in q(spark, SF).collect()]
    assert a == b and len(a) == graph.PAGERANK_TOP_K


def _cached_edges_deg(spark, key):
    """edges_deg shaped exactly like the production loop input: a keyed
    repartition CACHED (InMemoryTableScan preserves outputPartitioning;
    a localCheckpoint reads UnknownPartitioning under AQE — the r18
    session-4 finding this file pins)."""
    edges_deg = (
        spark.createDataFrame(
            [(1, 2, 1), (2, 1, 1), (1, 3, 1), (3, 1, 1)],
            "src long, dst long, deg long",
        )
        .localCheckpoint(eager=True)
        .repartition(spark.sparkContext.defaultParallelism, key)
        .cache()
    )
    edges_deg.count()  # materialize so the plan reads InMemoryTableScan
    return edges_deg


def _ranks(spark):
    return (
        spark.createDataFrame(
            [(1, 300_000_000_000), (2, 300_000_000_000),
             (3, 400_000_000_000)],
            "node long, rank_e12 long",
        )
        .localCheckpoint(eager=True)
    )


def _ensure_exchanges(df) -> int:
    """Per-round ENSURE_REQUIREMENTS exchanges (the cache's one-time
    REPARTITION_BY_NUM build exchange prints inside the InMemoryRelation
    subtree and must not count)."""
    return explain_str(df, "simple").count("ENSURE_REQUIREMENTS")


def test_small_branch_round_is_exchange_free_on_dst_cache(spark):
    """r18 session 4: below the gate the round join broadcasts the rank
    side, so a dst-keyed cached edge layout serves the contribution
    AGGREGATE — the whole round plans ZERO shuffle exchanges
    (single-stage rounds; measured med warm 8.17 → 4.26 s at sf0.1)."""
    edges_deg = _cached_edges_deg(spark, "dst")
    try:
        out = graph._pagerank_round(
            edges_deg, _ranks(spark), base=1, broadcast_nodes=True
        )
        assert has_broadcast_join(out)
        assert _ensure_exchanges(out) == 0
    finally:
        edges_deg.unpersist(blocking=True)


def test_small_branch_round_on_checkpoint_pays_agg_exchange(spark):
    """Counterfactual: the pre-r18-session-4 localCheckpoint shape
    re-shuffles the dst-keyed aggregate every round regardless of how
    the checkpointed frame was partitioned (LogicalRDD reads
    UnknownPartitioning under AQE)."""
    edges_deg = (
        spark.createDataFrame(
            [(1, 2, 1), (2, 1, 1)], "src long, dst long, deg long"
        )
        .repartition(spark.sparkContext.defaultParallelism, "dst")
        .localCheckpoint(eager=True)
    )
    out = graph._pagerank_round(
        edges_deg, _ranks(spark), base=1, broadcast_nodes=True
    )
    assert _ensure_exchanges(out) >= 1


def test_large_branch_round_reuses_src_cache_partitioning(spark):
    """Above the gate the per-round shuffle join reuses the src-keyed
    cached layout: only the node-sized rank frame and the aggregate
    exchange — one fewer EDGE-sized exchange per round than the
    unpartitioned counterfactual."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cached = _cached_edges_deg(spark, "src")
        out = graph._pagerank_round(
            cached, _ranks(spark), base=1, broadcast_nodes=False
        )
        n_cached = _ensure_exchanges(out)
        cached.unpersist(blocking=True)

        unpart = (
            spark.createDataFrame(
                [(1, 2, 1), (2, 1, 1), (1, 3, 1), (3, 1, 1)],
                "src long, dst long, deg long",
            )
            .localCheckpoint(eager=True)
        )
        n_unpart = _ensure_exchanges(
            graph._pagerank_round(
                unpart, _ranks(spark), base=1, broadcast_nodes=False
            )
        )
        # ranks-side + aggregate for the cached layout; the
        # counterfactual also re-shuffles the edge side
        assert n_cached == 2
        assert n_unpart == 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_edges_deg_build_broadcasts_nodes_not_edges(spark):
    """r18 builder pin: the edges_deg join explicitly broadcasts the
    NODE-bounded side.  An un-hinted join here can pick the
    CHECKPOINTED EDGE side as broadcast build (checkpoint-preserved
    stats can read small) and OOM the driver on a data-sized edge set
    — the hint must keep the build side node-bounded regardless of
    what the stats say."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1)], "src long, dst long"
    ).localCheckpoint(eager=True)
    nodes = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], "src long, deg long"
    ).localCheckpoint(eager=True)
    out = edges.join(F.broadcast(nodes), "src")
    plan = explain_str(out, "simple")
    assert "BroadcastHashJoin" in plan
    # the broadcast exchange must sit on the (src, deg) nodes side —
    # BuildRight with nodes as the right child
    assert "BuildRight" in plan


def test_large_branch_src_cache_holds_on_multisplit_input(spark, tmp_path):
    """r19 (r18 verdict item 6): the 2-vs-3 exchange counterfactual must
    hold on MULTI-SPLIT input, not just on a 1-partition planted frame
    (a 1-partition child trivially satisfies any clustered distribution
    — the multisplit-audit lesson).  Edges are written as a 4-file
    parquet and read back, so the scan arrives genuinely multi-split;
    the keyed cache still confines each round to ranks-side + aggregate
    exchanges, while the raw multi-split read also re-shuffles the edge
    side every round."""
    rows = [(i % 7 + 1, (i * 3) % 7 + 1, 1) for i in range(64)]
    src_df = spark.createDataFrame(rows, "src long, dst long, deg long")
    path = str(tmp_path / "edges_multisplit")
    src_df.repartition(4).write.mode("overwrite").parquet(path)
    multi = spark.read.parquet(path)
    assert multi.rdd.getNumPartitions() >= 2  # genuinely multi-split

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cached = multi.repartition(
            spark.sparkContext.defaultParallelism, "src"
        ).cache()
        cached.count()
        n_cached = _ensure_exchanges(
            graph._pagerank_round(
                cached, _ranks(spark), base=1, broadcast_nodes=False
            )
        )
        cached.unpersist(blocking=True)
        n_raw = _ensure_exchanges(
            graph._pagerank_round(
                multi, _ranks(spark), base=1, broadcast_nodes=False
            )
        )
        assert n_cached == 2
        assert n_raw == 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
