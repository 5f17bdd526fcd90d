#!/usr/bin/env python
"""A/B for copurchase_pagerank: hash-partition the edges_deg checkpoint
on ``dst`` in the BROADCAST branch.

Hypothesis (r18 session 4): below the node gate the per-round join
broadcasts the rank side, so the edge checkpoint's layout is FREE to
serve the dst-keyed contribution aggregate instead — localCheckpoint
preserves outputPartitioning (the large branch's ``repartition("src")``
already relies on this), and ProjectExec is alias-aware, so
``groupBy("node")`` (node = dst) elides its exchange in EVERY round.
Cost: one edge-sized keyed exchange paid once at checkpoint build.
Saving: one exchange + one stage per power-iteration round (×5).

Usage:  python scripts/pagerank_dst_ab.py [sf_dir] [n_pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from googlecloudstorage_blueprints_spark.session import apply_runtime_conf  # noqa: E402
from googlecloudstorage_blueprints_spark.operators import graph  # noqa: E402
from googlecloudstorage_blueprints_spark.operators.graph import (  # noqa: E402
    PAGERANK_ITERS,
    PAGERANK_TOP_K,
    _PR_SCALE,
    _pagerank_round,
    _persisted_rdd_ids,
    _release_rdds,
)
from googlecloudstorage_blueprints_spark.sources.catalog import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def run_variant(spark, sf_dir, dst_partition, use_cache=False):
    """The shipped op body with two toggles: the broadcast-branch
    edges_deg layout (None vs hash(dst)) and its materialization
    (localCheckpoint — which reports UnknownPartitioning under AQE and
    so can never elide the round agg's exchange — vs cache, whose
    InMemoryTableScan preserves outputPartitioning)."""
    sc = spark.sparkContext
    ids_before = _persisted_rdd_ids(sc)
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    half = (
        baskets.where(F.size("ps") >= 2)
        .select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .where(F.col("src") < F.col("dst"))
        .distinct()
    )
    edges = half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    nodes = deg.localCheckpoint(eager=True)
    n_nodes = nodes.count()
    assert n_nodes > 0
    init = _PR_SCALE // n_nodes
    base = (_PR_SCALE * 15) // 100 // n_nodes
    edges_deg = edges.join(F.broadcast(nodes), "src")
    if dst_partition:
        edges_deg = edges_deg.repartition(sc.defaultParallelism, "dst")
    if use_cache:
        edges_deg = edges_deg.cache()
        edges_deg.count()
    else:
        edges_deg = edges_deg.localCheckpoint(eager=True)
    ranks = nodes.select(
        F.col("src").alias("node"),
        F.lit(init).cast("long").alias("rank_e12"),
    )
    round_plan = None
    for i in range(PAGERANK_ITERS):
        r = _pagerank_round(edges_deg, ranks, base, True)
        if i == 0:
            round_plan = r._sc._jvm.PythonSQLUtils.explainString(
                r._jdf.queryExecution(), "simple"
            )
        ranks = r.localCheckpoint(eager=True)
    checkpoint_ids = _persisted_rdd_ids(sc) - ids_before
    result = (
        ranks.join(nodes, ranks.node == nodes.src)
        .select(
            F.col("node").alias("p_partkey"),
            "rank_e12",
            F.col("deg").alias("out_degree"),
        )
        .orderBy(F.col("rank_e12").desc(), "p_partkey")
        .limit(PAGERANK_TOP_K)
        .persist()
    )
    rows = sorted(tuple(r) for r in result.collect())
    _release_rdds(sc, checkpoint_ids)
    if use_cache:
        edges_deg.unpersist(True)
    result.unpersist(True)
    return rows, round_plan


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    apply_runtime_conf(spark)
    # warmup kernel (python-worker pool + codegen)
    load_table(spark, SF_DIR, "lineitem").groupBy("l_returnflag").count().collect()

    VARIANTS = {
        "shipped": dict(dst_partition=False, use_cache=False),
        "dst_ckpt": dict(dst_partition=True, use_cache=False),
        "dst_cache": dict(dst_partition=True, use_cache=True),
    }

    # 1) plan check: the dst_cache variant's round body must lose its
    # shuffle Exchange entirely (the checkpoint variants cannot —
    # LogicalRDD reads UnknownPartitioning under AQE)
    import re
    rows0, plans = None, {}
    for name, kw in VARIANTS.items():
        rows, plan = run_variant(spark, SF_DIR, **kw)
        if rows0 is None:
            rows0 = rows
        assert rows == rows0, f"outputs differ: {name}"
        # the round's own agg exchange is ENSURE_REQUIREMENTS; the
        # cache-internal REPARTITION_BY_NUM build exchange (paid once)
        # prints inside the InMemoryRelation subtree and must not count
        plans[name] = len(re.findall(r"ENSURE_REQUIREMENTS", plan))
    print("outputs identical at", SF_DIR, "rows:", len(rows0))
    print("round-plan shuffle-exchange count:", plans)

    # 2) cross-SF identity vs the REAL shipped op
    from googlecloudstorage_blueprints_spark.operators import all_queries
    q = all_queries()["copurchase_pagerank"]
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", SF_DIR):
        real = sorted(tuple(r) for r in q(spark, sf).collect())
        mine, _ = run_variant(spark, sf, True, True)
        assert real == mine, f"divergence vs shipped op at {sf}"
        print("bit-identical vs shipped op at", sf)

    # 3) interleaved warm timing
    walls = {name: [] for name in VARIANTS}
    for _ in range(N_PAIRS):
        for name, kw in VARIANTS.items():
            t0 = time.monotonic()
            run_variant(spark, SF_DIR, **kw)
            walls[name].append(time.monotonic() - t0)
    for name, ws in walls.items():
        print(
            "%s: med %.3f best %.3f all %s"
            % (
                name,
                statistics.median(ws),
                min(ws),
                " ".join("%.3f" % w for w in ws),
            )
        )


if __name__ == "__main__":
    main()
