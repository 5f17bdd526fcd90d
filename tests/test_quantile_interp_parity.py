"""Cross-engine probe of interpolated-percentile parity (r10 audit).

Percentile ops rely on Spark ``percentile()`` and DuckDB
``quantile_cont()`` producing BIT-IDENTICAL doubles when fed the same
exact BIGINT inputs.  Both interpolate at ``pos = q * (n - 1)`` — an
implementation detail neither engine documents, so
``test_raw_interpolation_is_bit_identical`` pins it on adversarial and
random inputs.  r15 refinement: the shared evaluation order is the
TWO-SIDED weighted form ``v_lo*(hi - pos) + v_hi*(pos - lo)``, NOT
``lo + (hi - lo) * frac`` — the two differ in the last ulp on ~1-in-10
real groups (found when the ship-latency join twin's Python regroup
used the latter and missed batch ``F.percentile`` by 1 ulp on 3 of 27
quarters; ``_interp_percentile`` in streaming/stateful.py spells the
correct form and is pinned bit-identical against batch output).

The audit's REAL finding is one step later: ``ROUND(qc / 1e9, 6)`` of
an interpolated nano-integer DIVERGES cross-engine when the quantile
lands exactly on a …500 half-boundary (midpoint of two 1000-separated
integers).  Spark ROUND converts the double to its SHORTEST DECIMAL
representation ("1.0000025" — an exact tie, HALF_UP → up) while DuckDB
multiplies the BINARY value by 1e6 (lands a hair below the boundary →
down).  ``test_round_path_diverges_on_exact_midpoint`` preserves the
repro; the safe pattern — integer-space half-up, ``(FLOOR(qc)+500) div
1000`` — is pinned identical by ``test_integer_div_rounding_matches``
and used by ``logprob_quantiles_by_source``.

Every other percentile site in the registry rounds at a grid COARSER
than its input granularity (integer days/cents at 4–6dp), where exact
ties are unreachable — audited r10, note in CLAUDE.md.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

QS = [0.1, 0.25, 0.5, 0.75, 0.9]


def _duck(values: list[int], select: str) -> list:
    con = duckdb.connect()
    con.sql("CREATE TABLE t (v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    return list(con.sql(f"SELECT {select} FROM t").fetchall()[0])


def _spark_df(spark, values: list[int]):
    return spark.createDataFrame([(v,) for v in values], "v long")


def _cases() -> list[list[int]]:
    rng = random.Random(20260814)
    cases = [
        # midpoints landing exactly on …500 (the ROUND-divergence bait)
        [1_000_000_250, 1_000_000_750, 2_000_000_500],
        [i * 500 + 1_000_000_000 for i in range(11)],
        # adjacent integers: frac products 0.5 and 1.5
        [4_999_999_999, 5_000_000_000, 5_000_000_002,
         5_000_000_005, 7_500_000_001, 7_500_000_004],
    ]
    for n in (2, 3, 7, 10, 41, 100):
        cases.append([rng.randrange(10**9, 10**10) for _ in range(n)])
    # consecutive 500-spaced sets with random offsets
    rng2 = random.Random(7)
    for _ in range(5):
        base = rng2.randrange(10**9, 10**10) // 1000 * 1000
        cases.append(
            [base + i * 500 for i in range(rng2.randrange(3, 9))]
        )
    return cases


def test_raw_interpolation_is_bit_identical(spark):
    for values in _cases():
        df = _spark_df(spark, values)
        srow = df.agg(
            *[F.percentile("v", q).alias(f"q{i}") for i, q in enumerate(QS)]
        ).collect()[0]
        drow = _duck(
            values, ", ".join(f"quantile_cont(v, {q})" for q in QS)
        )
        for i in range(len(QS)):
            assert srow[f"q{i}"] == drow[i], (
                f"raw interpolation diverged at q={QS[i]} on {values}"
            )


def test_integer_div_rounding_matches(spark):
    sexpr = (
        "CAST((CAST(FLOOR(percentile(v, {q})) AS BIGINT) + 500)"
        " div 1000 AS DOUBLE) / 1e6"
    )
    dexpr = (
        "CAST((CAST(FLOOR(quantile_cont(v, {q})) AS BIGINT) + 500)"
        " // 1000 AS DOUBLE) / 1e6"
    )
    for values in _cases():
        df = _spark_df(spark, values)
        srow = df.agg(
            *[
                F.expr(sexpr.format(q=q)).alias(f"q{i}")
                for i, q in enumerate(QS)
            ]
        ).collect()[0]
        drow = _duck(
            values, ", ".join(dexpr.format(q=q) for q in QS)
        )
        for i in range(len(QS)):
            assert srow[f"q{i}"] == drow[i], (
                f"integer-div rounding diverged at q={QS[i]} on {values}"
            )


def test_round_path_diverges_on_exact_midpoint(spark):
    """The repro that motivates the rule: keep it red-on-ROUND so the
    divergence stays demonstrable (if an engine upgrade ever makes this
    pass, the integer-div rule can be revisited)."""
    values = [i * 500 + 1_000_000_000 for i in range(11)]
    df = _spark_df(spark, values)
    s = df.agg(
        F.round(F.percentile("v", 0.5) / 1e9, 6).alias("q")
    ).collect()[0]["q"]
    d = _duck(values, "ROUND(quantile_cont(v, 0.5) / 1e9, 6)")[0]
    # qc = 1000002500.0 exactly (both engines, raw): Spark HALF_UP on
    # the shortest repr rounds up, DuckDB's binary multiply rounds down
    assert s == pytest.approx(1.000003)
    assert d == pytest.approx(1.000002)
    assert s != d


def test_shared_form_is_two_sided_weighted(spark):
    """r15 pin of the REFINED formula claim: on [1, 3] at q=0.9 the
    two candidate evaluation orders differ in the last ulp —
    lo + (hi−lo)·frac gives 2.8, the two-sided weighted form
    v_lo·(hi−pos) + v_hi·(pos−lo) gives 2.8000000000000003 — and BOTH
    engines (and the streaming kernels' ``_interp_percentile``)
    produce the weighted value.  Any engine upgrade that flips this
    fails loudly here before it flips an oracle hash."""
    from googlecloudstorage_blueprints_spark.streaming.stateful import (
        _interp_percentile,
    )

    cases = [([1, 3], 0.9), ([2, 3], 0.9), ([3, 11], 0.9)]
    for vals, q in cases:
        pos = q * (len(vals) - 1)
        lo = int(pos)
        lerp = float(vals[lo]) + (
            float(vals[lo + 1]) - float(vals[lo])
        ) * (pos - lo)
        weighted = float(vals[lo]) * (lo + 1 - pos) + float(
            vals[lo + 1]
        ) * (pos - lo)
        assert lerp != weighted, "case must discriminate the forms"
        s = (
            _spark_df(spark, vals)
            .agg(F.percentile("v", q).alias("p"))
            .collect()[0]["p"]
        )
        d = _duck(vals, f"quantile_cont(v, {q})")[0]
        assert s == weighted, (vals, q, s, weighted)
        assert d == weighted, (vals, q, d, weighted)
        assert _interp_percentile(vals, q) == weighted
