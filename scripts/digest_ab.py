#!/usr/bin/env python3
"""A/B harness for the digest-family per-row hash cost (r18 verdict
item 4).  Times the SHIPPED ops against candidate replans, warm,
interleaved, and asserts the candidate's rows are byte-identical to
the shipped op's before reporting a number (an A/B that changes the
answer is disqualified, not fast).

Candidates:

- table_column_digest B: hash-only projection — n_nulls derives from
  ``n_rows − count(h_c)`` (md5(NULL) is NULL on both engines, so the
  per-cell hash column is NULL exactly when the cell is), dropping the
  |cols| original columns and the |cols| ``when(isNull)`` branches
  from the post-repartition projection (guide §2.3: project before
  the exchange / fewer projected expressions).
- table_row_digest B: the r17 conditional fixture-gate repartition
  (``getNumPartitions() < defaultParallelism``) before the 1-hash/row
  projection — multi-split real input never pays it, one-row-group
  fixtures stop serializing the md5 pass on one core.
- table_profile B: the same conditional gate before the 5-way
  count-distinct aggregate (the Expand ×6 row multiplication currently
  runs single-task on the fixture's one row group).

Usage: python scripts/digest_ab.py [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import statistics
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, spark, sf, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    _noop(fn(spark, sf))
    dt = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    return dt


def column_digest_frame_b(spark, sf_dir, tables=None):
    from googlecloudstorage_blueprints_spark.functions.frames import (
        sort_bounded,
    )
    from googlecloudstorage_blueprints_spark.operators.audit import (
        DIGEST_SUM_MOD,
        TABLE_DIGEST_SPEC,
        _cell_expr_col,
    )
    from googlecloudstorage_blueprints_spark.sources.catalog import (
        load_table,
    )

    frames = []
    for t in tables if tables is not None else list(TABLE_DIGEST_SPEC):
        cols = TABLE_DIGEST_SPEC[t]
        df = load_table(spark, sf_dir, t)
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
        proj = []
        for c, kind in cols:
            cell = _cell_expr_col(c, kind)
            proj.append(
                F.conv(F.substring(F.md5(cell), 1, 15), 16, 10)
                .cast("long")
                .alias(f"__h_{c}")
            )
        hashed = df.select(*proj)
        aggs = [F.count(F.lit(1)).alias("__n_rows")]
        for c, _kind in cols:
            aggs.append(F.count(F.col(f"__h_{c}")).alias(f"__nv_{c}"))
            aggs.append(
                F.coalesce(F.expr(f"bit_xor(__h_{c})"), F.lit(0))
                .cast("long")
                .alias(f"__dx_{c}")
            )
            aggs.append(
                F.coalesce(
                    F.expr(
                        f"CAST(pmod(SUM(CAST(__h_{c} AS DECIMAL(38,0))),"
                        f" {DIGEST_SUM_MOD}) AS BIGINT)"
                    ),
                    F.lit(0),
                ).alias(f"__ds_{c}")
            )
        one = hashed.agg(*aggs)
        stack_args = ", ".join(
            f"'{c}', __n_rows - __nv_{c}, __dx_{c}, __ds_{c}"
            for c, _ in cols
        )
        frames.append(
            one.selectExpr(
                f"stack({len(cols)}, {stack_args})"
                " AS (column_name, n_nulls, digest, digest_sum)"
            ).select(
                F.lit(t).alias("table_name"),
                "column_name",
                F.col("n_nulls").cast("long").alias("n_nulls"),
                "digest",
                "digest_sum",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return sort_bounded(out, "table_name", "column_name")


def row_digest_frame_b(spark, sf_dir, tables=None):
    from googlecloudstorage_blueprints_spark.functions.frames import (
        sort_bounded,
    )
    from googlecloudstorage_blueprints_spark.operators.audit import (
        DIGEST_SUM_MOD,
        TABLE_DIGEST_SPEC,
        row_hash_expr,
    )
    from googlecloudstorage_blueprints_spark.sources.catalog import (
        load_table,
    )

    frames = []
    for t in tables if tables is not None else list(TABLE_DIGEST_SPEC):
        df = load_table(spark, sf_dir, t)
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
        _s, h = row_hash_expr(t)
        frames.append(
            df.select(h.alias("h"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.coalesce(F.expr("bit_xor(h)"), F.lit(0))
                .cast("long")
                .alias("digest"),
                F.coalesce(
                    F.expr(
                        "CAST(pmod(SUM(CAST(h AS DECIMAL(38,0))), "
                        f"{DIGEST_SUM_MOD}) AS BIGINT)"
                    ),
                    F.lit(0),
                ).alias("digest_sum"),
            )
            .select(
                F.lit(t).alias("table_name"),
                "n_rows",
                "digest",
                "digest_sum",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return sort_bounded(out, "table_name")


def table_profile_b(spark, sf_dir):
    from googlecloudstorage_blueprints_spark.operators.relational_ext import (
        _PROFILE_COLS,
    )
    from googlecloudstorage_blueprints_spark.sources.catalog import (
        load_table,
    )

    o = load_table(spark, sf_dir, "orders")
    par = spark.sparkContext.defaultParallelism
    if o.rdd.getNumPartitions() < par:
        o = o.repartition(par)
    aggs = []
    for c in _PROFILE_COLS:
        mn, mx = F.min(c), F.max(c)
        if c == "o_totalprice":
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            mn.cast("string").alias(f"{c}__min"),
            mx.cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_value, max_value)"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    from googlecloudstorage_blueprints_spark.operators import all_queries
    from googlecloudstorage_blueprints_spark.session import get_spark

    spark = get_spark()
    qs = all_queries()
    # warmup: codegen + cold read + python pool
    qs["rfm_segments"](spark, args.sf).count()
    qs["similarity_knn_pandas"](spark, args.sf).count()

    pairs = [
        ("table_column_digest", qs["table_column_digest"],
         column_digest_frame_b),
        ("table_row_digest", qs["table_row_digest"], row_digest_frame_b),
        ("table_profile", qs["table_profile"], table_profile_b),
    ]

    # equivalence first: candidate rows must match shipped rows exactly
    for name, a_fn, b_fn in pairs:
        ra = sorted(map(tuple, a_fn(spark, args.sf).collect()))
        rb = sorted(map(tuple, b_fn(spark, args.sf).collect()))
        assert ra == rb, f"{name}: candidate changes the answer!"
        print(f"{name}: candidate rows identical ({len(ra)} rows)")

    walls: dict[str, list[float]] = {}
    for rnd in range(args.rounds):
        for name, a_fn, b_fn in pairs:
            walls.setdefault(f"{name}:A", []).append(
                _timed(a_fn, spark, args.sf, f"{name} A r{rnd}")
            )
            walls.setdefault(f"{name}:B", []).append(
                _timed(b_fn, spark, args.sf, f"{name} B r{rnd}")
            )
    for k in sorted(walls):
        w = walls[k]
        print(
            f"{k}: median={statistics.median(w):.3f} min={min(w):.3f} "
            f"runs={[round(x, 3) for x in w]}"
        )


if __name__ == "__main__":
    main()
