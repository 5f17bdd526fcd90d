"""Closed-form semantic pins for the r9 operator wave.

Oracle parity proves Spark == DuckDB; these prove both == the MATH, on
planted inputs whose answers are known in closed form:

- Gini: equal values → 0; a single whale → (n−1)/n.
- Markov entropy: a deterministic chain → 0 bits, top share 1; a
  uniform 2-way branch → ln 2.
- Heaps curve: monotone, and the last checkpoint equals corpus totals.
- Pairwise-cosine histogram: an orthonormal corpus masses entirely in
  the [0, 0.1) bucket.
- Perplexity quantiles: identical docs → p10 = p50 = p90.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from googlecloudstorage_blueprints_spark.operators import all_queries

QUERIES = None


def _q():
    global QUERIES
    if QUERIES is None:
        QUERIES = all_queries()
    return QUERIES


def _write_customers_orders(tmp, cust_rows, order_rows):
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(
                    [r[0] for r in cust_rows], pa.int64()
                ),
                "c_name": pa.array(
                    [f"Customer#{r[0]}" for r in cust_rows], pa.string()
                ),
                "c_nationkey": pa.array(
                    [r[1] for r in cust_rows], pa.int64()
                ),
                "c_acctbal": pa.array(
                    [0.0] * len(cust_rows), pa.float64()
                ),
                "c_mktsegment": pa.array(
                    ["BUILDING"] * len(cust_rows), pa.string()
                ),
            }
        ),
        tmp / "customer.parquet",
    )
    import datetime

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(
                    list(range(1, len(order_rows) + 1)), pa.int64()
                ),
                "o_custkey": pa.array(
                    [r[0] for r in order_rows], pa.int64()
                ),
                "o_orderstatus": pa.array(
                    ["F"] * len(order_rows), pa.string()
                ),
                "o_totalprice": pa.array(
                    [r[1] for r in order_rows], pa.float64()
                ),
                "o_orderdate": pa.array(
                    [datetime.datetime(1997, 1, 1)] * len(order_rows),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    ["3-MEDIUM"] * len(order_rows), pa.string()
                ),
            }
        ),
        tmp / "orders.parquet",
    )


def test_gini_equal_values_is_zero_and_whale_is_max(spark, tmp_path):
    n = 10
    cust = [(i, 0) for i in range(n)] + [(100 + i, 1) for i in range(n)]
    orders = [(i, 50.0) for i in range(n)]  # nation 0: all equal
    orders += [(100, 1000.0)]  # nation 1: one whale, rest zero
    _write_customers_orders(tmp_path, cust, orders)
    rows = {
        r["c_nationkey"]: r
        for r in _q()["customer_value_gini"](spark, str(tmp_path)).collect()
    }
    assert rows[0]["gini"] == 0.0
    assert rows[1]["gini"] == pytest.approx((n - 1) / n, abs=1e-12)
    assert rows[1]["n_customers"] == n


def _write_events(tmp, rows):
    """rows: (user_id, ts_us, event_type)."""
    import datetime

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
                "ts": pa.array(
                    [
                        datetime.datetime(1970, 1, 1)
                        + datetime.timedelta(microseconds=r[1])
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        tmp / "events.parquet",
    )


def test_markov_entropy_chain_and_uniform_branch(spark, tmp_path):
    # user 1: a->b->a->b... deterministic chain
    rows = [(1, i * 1000, "a" if i % 2 == 0 else "b") for i in range(20)]
    # users 2..21: c->a then c->b, ten of each → uniform branch from c
    t = 10_000_000
    for u in range(2, 22):
        rows += [
            (u, t, "c"),
            (u, t + 1000, "a" if u % 2 == 0 else "b"),
        ]
    _write_events(tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in _q()["event_type_markov_entropy"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["a"]["next_entropy"] == 0.0  # a always → b (within users)
    assert got["a"]["top_next_share"] == 1.0
    assert got["c"]["next_entropy"] == pytest.approx(
        math.log(2), abs=1e-5
    )
    assert got["c"]["top_next_share"] == 0.5
    assert got["c"]["n_next_types"] == 2


def _write_docs(tmp, rows):
    """rows: (doc_id, text, source)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        tmp / "documents.parquet",
    )


def test_vocab_growth_monotone_and_totals(spark, tmp_path):
    # 10 docs, doc i introduces word w_i and repeats w_0
    rows = [(i, f"w0 w{i}", "s") for i in range(10)]
    _write_docs(tmp_path, rows)
    out = sorted(
        (r["checkpoint"], r["n_docs"], r["n_tokens"], r["vocab"])
        for r in _q()["vocab_growth_curve"](spark, str(tmp_path)).collect()
    )
    assert [r[0] for r in out] == list(range(1, 11))
    for a, b in zip(out, out[1:]):
        assert b[1] >= a[1] and b[2] >= a[2] and b[3] >= a[3]
    # last checkpoint covers everything: 10 docs, 20 tokens, 10 distinct
    # words (w0 plus w1..w9; doc 0 is "w0 w0")
    assert out[-1][1:] == (10, 20, 10)
    # first checkpoint: doc 0 only → 1 doc, 2 tokens, 1 word
    assert out[0][1:] == (1, 2, 1)


def test_pairwise_histogram_orthonormal_masses_at_zero(spark, tmp_path):
    rng = np.random.default_rng(3)
    base, _ = np.linalg.qr(rng.normal(size=(64, 64)))
    vecs = base.T[:30]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(30), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * 30, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = _q()["embedding_pairwise_cosine_histogram"](
        spark, str(tmp_path)
    ).collect()
    # float32 storage keeps cosines within ±1e-6 of 0: buckets 9/10 only
    assert sum(r["n_pairs"] for r in out) == 30 * 29 // 2
    assert {r["bucket"] for r in out} <= {9, 10}
    assert sum(r["n_pairs"] for r in out if r["bucket"] == 10) >= 1


def test_logprob_quantiles_identical_docs_collapse(spark, tmp_path):
    rows = [(i, "x y z", "s") for i in range(10)]
    _write_docs(tmp_path, rows)
    r = _q()["logprob_quantiles_by_source"](spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    # three words, each p = 1/3 → NLL = ln 3 for every doc
    assert row["p10_nll"] == row["p50_nll"] == row["p90_nll"]
    assert row["p50_nll"] == pytest.approx(math.log(3), abs=1e-5)
    assert row["n_docs"] == 10
