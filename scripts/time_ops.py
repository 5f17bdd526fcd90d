#!/usr/bin/env python3
"""Warm-timing harness for individual registered operators.

Usage:  python scripts/time_ops.py [--sf DIR] [--runs N] op1 op2 ...

Builds the engine session, runs a warmup query (rfm_segments — codegen
compile + cold read + Python-worker pool spin-up), then times each named
operator N times WARM (count() to materialize) and prints per-op
min/median/max.  The CLAUDE.md noise rules apply: judge on 3+ run
medians, never a single reading.
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("ops", nargs="+")
    args = ap.parse_args()

    from googlecloudstorage_blueprints_spark.session import get_spark
    from googlecloudstorage_blueprints_spark.operators import all_queries

    spark = get_spark()
    qs = all_queries()
    # warmup: codegen compile, cold parquet read, Python worker pool
    qs["rfm_segments"](spark, args.sf).count()
    qs["similarity_knn_pandas"](spark, args.sf).count()

    for name in args.ops:
        walls = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            qs[name](spark, args.sf).count()
            walls.append(time.perf_counter() - t0)
        print(
            f"{name}: median={statistics.median(walls):.3f} "
            f"min={min(walls):.3f} max={max(walls):.3f} "
            f"runs={[round(w, 3) for w in walls]}"
        )


if __name__ == "__main__":
    main()
