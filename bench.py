#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

The FINAL stdout line is a compact JSON summary (metric, per-query spark
seconds, suite ratios) sized to survive the driver's bounded output tail
— rounds 2 and 3 recorded ``"parsed": null`` because one huge JSON line
was truncated from the front.  The full comparison detail (DuckDB
per-query seconds, raw + floor-adjusted ratio maps) is written to
``BENCH_DETAIL.json`` next to this script instead of stdout.

Materialization uses the `noop` sink so every output column is computed and
written (a bare .count() would let Catalyst prune the projections and
under-report); timings therefore cover scan → transform → materialize.

Each oracle-backed headline query is ALSO timed through DuckDB on the same
parquet (same thread budget), and the JSON carries `spark_vs_duckdb`
per-query ratios plus `suite_ratio` — the computable stand-in for the
"within 2× of baseline" gate (the reference itself publishes no numbers;
DuckDB on identical SQL/data is the strongest available single-node bar).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from googlecloudstorage_blueprints_spark.operators import (  # noqa: E402
    all_oracles,
    all_queries,
)
from googlecloudstorage_blueprints_spark.session import get_spark  # noqa: E402
from googlecloudstorage_blueprints_spark.sources.catalog import TABLES  # noqa: E402

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
    # round-2: training-data pipeline family (explode + window + topk)
    "ngram_topk",
]


def _time_duckdb_oracles(names: list[str]) -> dict[str, float]:
    """Wall-time each headline oracle through DuckDB on the same parquet
    (fetchall materializes every cell, mirroring the noop sink)."""
    import duckdb

    oracles = all_oracles()
    con = duckdb.connect()
    con.execute(f"SET threads TO {int(CPUS)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    timings: dict[str, float] = {}
    warmed = False
    for name in names:
        if name not in oracles:
            continue  # rows-only op (LSH/ANN): no SQL-equivalent to race
        if not warmed:  # first query carries catalog/IO warmup
            con.execute(oracles[name]).fetchall()
            warmed = True
        start = time.perf_counter()
        con.execute(oracles[name]).fetchall()
        timings[name] = round(time.perf_counter() - start, 3)
    con.close()
    return timings


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
    # doesn't pollute the measured numbers; the mapInPandas op also spins
    # up the Python worker pool (~2 s at 32 cores), which otherwise lands
    # entirely on the first Arrow-kernel query measured (verify-skill
    # trap: profile Python ops only after a warmup kernel)
    queries["pricing_summary"](spark, "/root/testdata/sf0.001").count()
    queries["similarity_knn_pandas"](spark, "/root/testdata/sf0.001").count()

    # Spark's fixed per-query dispatch floor (plan + schedule + noop write
    # of a 1-row DF).  Sub-second queries are floor-bound, which is what
    # dominates the spark_vs_duckdb ratio at small SFs — the floor
    # amortizes to ~0 at cluster scale, DuckDB's runtime does not.
    start = time.perf_counter()
    spark.range(1).write.format("noop").mode("overwrite").save()
    floor = round(time.perf_counter() - start, 3)

    # Per-query timer covers op construction + materialization: ops with
    # eager persist-and-free internals (minhash_lsh_dedup) do their compute
    # during construction, which the write-only timer of rounds 1-3 missed
    # (and for lazy ops construction = analysis/planning, a real fixed cost
    # the earlier rounds under-reported by ~0.3-0.4 s/query).  build_secs
    # in BENCH_DETAIL.json carries the construction share per query so the
    # methodology change stays auditable against earlier rounds.
    total = 0.0
    builds: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        built = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - start
        builds[name] = round(built - start, 3)
        timings[name] = round(elapsed, 3)
        total += elapsed
        df.unpersist()  # free eager ops' result cache between queries
    spark.stop()

    duck = _time_duckdb_oracles(HEADLINE)
    ratios = {
        name: round(timings[name] / duck[name], 2) if duck[name] > 0 else None
        for name in duck
    }
    # floor-adjusted: subtract Spark's measured fixed dispatch cost, which
    # amortizes to ~0 on a cluster while DuckDB's runtime does not — the
    # per-plan comparison the raw ratio obscures for sub-second queries
    ratios_adj = {
        name: (
            round(max(timings[name] - floor, 0.001) / duck[name], 2)
            if duck[name] > 0
            else None
        )
        for name in duck
    }
    spark_subtotal = sum(timings[n] for n in duck)
    duck_total = sum(duck.values())

    suite_ratio = (
        round(spark_subtotal / duck_total, 2) if duck_total > 0 else None
    )
    suite_ratio_adj = (
        round(
            sum(max(timings[n] - floor, 0.001) for n in duck) / duck_total,
            2,
        )
        if duck_total > 0
        else None
    )

    detail = {
        "sf": sf,
        "spark_floor_seconds": floor,
        "spark_queries": timings,
        "spark_build_seconds": builds,
        "duckdb_queries": duck,
        "spark_vs_duckdb": ratios,
        "spark_vs_duckdb_floor_adjusted": ratios_adj,
        "suite_ratio": suite_ratio,
        "suite_ratio_floor_adjusted": suite_ratio_adj,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
        fh.write("\n")

    # compact summary LAST so the driver's bounded tail always contains a
    # complete parseable line
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "spark_floor_seconds": floor,
                "suite_ratio": suite_ratio,
                "suite_ratio_floor_adjusted": suite_ratio_adj,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
