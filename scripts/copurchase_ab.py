#!/usr/bin/env python
"""A/B the two not-yet-tried part_copurchase_lift candidates (r17
verdict item 3) against the shipped plan, warm best-of-N at a target
SF — committed evidence for either a win or the definitive closure.

Variants (pair pipeline only — baskets scan → pair counts → top-K):

  shipped   the r14 packed-BIGINT codegen plan: double Generate
            in-row pair expand → groupBy(pk).count → TakeOrdered.
  arrow_expand   (b) Arrow-side pair expansion: mapInPandas over the
            basket arrays emits packed pks via numpy broadcasting,
            feeding the SAME groupBy(pk) — tests whether the JVM
            Generate×2 + filter is the bottleneck.
  arrow_partial  (a) two-level aggregation with fatter rows:
            mapInPandas partial-counts pks per partition (numpy
            unique) and emits (pk, partial_cnt) rows — the explicit
            Python analogue of Spark's JVM partial hash aggregate,
            shrinking shuffle rows only as far as within-partition
            duplication allows (~99.7% distinct at sf0.1).

Usage:  python scripts/copurchase_ab.py [sf_dir] [n_warm]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_WARM = int(sys.argv[2]) if len(sys.argv) > 2 else 3
TOP_K = 20

_PK_SCHEMA = "pk long"
_PARTIAL_SCHEMA = "pk long, cnt long"


def _expand_arrow(batches):
    import numpy as np
    import pandas as pd

    for pdf in batches:
        out = []
        for parts in pdf["parts"]:
            a = np.sort(np.asarray(parts, dtype=np.int64))
            # all ordered pairs a<b from the sorted copy (Arrow buffers
            # are read-only — in-place sort throws)
            n = a.shape[0]
            if n < 2:
                continue
            ii, jj = np.triu_indices(n, k=1)
            out.append((a[ii] << 32) | a[jj])
        if out:
            yield pd.DataFrame({"pk": np.concatenate(out)})


def _partial_count_arrow(batches):
    import numpy as np
    import pandas as pd

    acc = []
    for pdf in batches:
        acc.append(pdf["pk"].to_numpy(dtype=np.int64))
    if acc:
        pks, cnts = np.unique(np.concatenate(acc), return_counts=True)
        yield pd.DataFrame({"pk": pks, "cnt": cnts})


def main() -> None:
    from googlecloudstorage_blueprints_spark.session import get_spark
    from googlecloudstorage_blueprints_spark.sources.catalog import (
        load_table,
    )

    spark = get_spark(app_name="copurchase-ab")
    li = load_table(spark, SF_DIR, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("parts")
    )

    def shipped():
        pair_base = (
            baskets.select(
                "parts", F.explode_outer("parts").alias("part_a")
            )
            .select("part_a", F.explode_outer("parts").alias("part_b"))
            .where(F.col("part_a") < F.col("part_b"))
        )
        pairs = (
            pair_base.select(
                F.shiftleft(F.col("part_a").cast("long"), 32)
                .bitwiseOR(F.col("part_b").cast("long"))
                .alias("pk")
            )
            .groupBy("pk")
            .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        )
        return pairs.orderBy(F.col("n_both").desc(), "pk").limit(TOP_K)

    def arrow_expand():
        pk = baskets.select("parts").mapInPandas(
            _expand_arrow, _PK_SCHEMA
        )
        pairs = pk.groupBy("pk").agg(
            F.count(F.lit(1)).cast("long").alias("n_both")
        )
        return pairs.orderBy(F.col("n_both").desc(), "pk").limit(TOP_K)

    def arrow_partial():
        pair_base = (
            baskets.select(
                "parts", F.explode_outer("parts").alias("part_a")
            )
            .select("part_a", F.explode_outer("parts").alias("part_b"))
            .where(F.col("part_a") < F.col("part_b"))
        )
        pk = pair_base.select(
            F.shiftleft(F.col("part_a").cast("long"), 32)
            .bitwiseOR(F.col("part_b").cast("long"))
            .alias("pk")
        )
        partials = pk.mapInPandas(_partial_count_arrow, _PARTIAL_SCHEMA)
        pairs = partials.groupBy("pk").agg(
            F.sum("cnt").cast("long").alias("n_both")
        )
        return pairs.orderBy(F.col("n_both").desc(), "pk").limit(TOP_K)

    variants = {
        "shipped": shipped,
        "arrow_expand": arrow_expand,
        "arrow_partial": arrow_partial,
    }
    # warm the python worker pool + codegen for every variant first
    for fn in variants.values():
        fn().write.format("noop").mode("overwrite").save()
    # interleaved A/B: one pass per variant per round, N_WARM rounds
    walls: dict[str, list[float]] = {k: [] for k in variants}
    results: dict[str, list] = {}
    for _ in range(N_WARM):
        for name, fn in variants.items():
            df = fn()
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - start)
    for name, fn in variants.items():
        results[name] = sorted(
            (r["pk"], r["n_both"]) for r in fn().collect()
        )
    base = results["shipped"]
    for name in variants:
        t = walls[name]
        same = results[name] == base
        print(
            f"{name:14s} best={min(t):.3f} med={sorted(t)[len(t)//2]:.3f} "
            f"all={[round(x, 3) for x in t]} topk_match={same}"
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
