#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line with per-query and
total wall seconds.

Materialization uses the `noop` sink so every output column is computed and
written (a bare .count() would let Catalyst prune the projections and
under-report); timings therefore cover scan → transform → materialize.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from googlecloudstorage_blueprints_spark.operators import all_queries  # noqa: E402
from googlecloudstorage_blueprints_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: one per operator family, weighted toward shuffle/join/window
# pressure — the shapes that dominate at 100 TB
HEADLINE = [
    "pricing_summary",
    "scan_project_filter",
    "join_broadcast",
    "join_shuffle",
    "multiway_join_agg",
    "window_ranking",
    "window_analytic",
    "topk_per_group",
    "agg_distinct",
    "json_extract",
    "events_sessionize",
    "events_tumbling_agg",
    "exact_dedup",
    "minhash_lsh_dedup",
    "similarity_knn_pandas",
    "text_stats",
    # round-1 breadth additions (shuffle/window/join-heavy shapes)
    "sql_tpch_q5",
    "join_asof",
    "grouping_sets",
    "events_funnel",
    "dedup_embedding_cosine",
]


def main() -> None:
    sf = None
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    spark = get_spark(
        app_name="gcs-blueprints-spark-bench", master=f"local[{CPUS}]"
    )
    queries = all_queries()
    timings: dict[str, float] = {}

    # JVM/codegen warmup on the smallest fixture so first-query JIT cost
    # doesn't pollute the measured numbers
    queries["pricing_summary"](spark, "/root/testdata/sf0.001").count()

    total = 0.0
    for name in HEADLINE:
        df = queries[name](spark, SF_DIR)
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - start
        timings[name] = round(elapsed, 3)
        total += elapsed

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
