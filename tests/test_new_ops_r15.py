"""Planted-input and closed-form pins for the r15 operator wave
(rrf_fusion_topk / doc_logprob_mad_outliers / segment_weekend_mix),
following the r11 vacuity rule: every detection or classification path
a fixture cannot exercise gets a planted corpus, and every planted
corpus re-runs the driver-style cross-engine hash compare.
"""

from __future__ import annotations

import pyarrow as pa

from googlecloudstorage_blueprints_spark.operators import all_queries

from tests.test_new_ops_r12c import SF, _cross_engine, _planted_dir

_DAY_US = 86_400_000_000


def _docs_table(rows):
    """rows: (doc_id, text, source)"""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


# --- rrf_fusion_topk ----------------------------------------------------------


def test_rrf_fusion_planted_divergent_rankings(spark, tmp_path):
    """On the fixture the BM25 and QL heads overlap heavily, so the
    ranker-missed-doc path (NULL rank, single-term fusion score) is
    near-vacuous — plant a corpus where the heads DISAGREE: 12 short
    docs with one 'spark' each (BM25's short-doc idf favorites, QL's
    too — but only 10 fit the head) and 3 long docs stuffed with 25×
    'table' (BM25 top — tf saturates but idf·tf wins; QL bottom — the
    spark/query background mass dominates).  Both NULL directions must
    fire, and the fusion must carry the closed-form two-term score
    1/(60+4) + 1/(60+1) at its head.  Cross-engine hash compare runs
    on the planted corpus."""
    rows = []
    for i in range(1, 13):
        rows.append(
            (i, "spark " + " ".join(f"f{i}w{j}" for j in range(i)), "web")
        )
    for i in range(13, 16):
        filler = " ".join(f"pad{i}x{j}" for j in range(60))
        rows.append((i, ("table " * 25) + filler, "web"))
    sf_dir = _planted_dir(tmp_path, {"documents": _docs_table(rows)})
    got, cols = _cross_engine(spark, "rrf_fusion_topk", sf_dir)
    by_doc = {r[0]: r for r in got}
    bm_only = {d for d, r in by_doc.items() if r[2] is None}
    ql_only = {d for d, r in by_doc.items() if r[1] is None}
    assert bm_only == {13, 14, 15}, "BM25-head-only docs must carry NULL ql_rank"
    assert ql_only == {8, 9, 10}, "QL-head-only docs must carry NULL bm25_rank"
    # head: doc 1 is rank 4 on BM25 (behind the three table-stuffed
    # docs) and rank 1 on QL — the exact two-term RRF score
    top = got[0]
    assert top[0] == 1 and (top[1], top[2]) == (4, 1)
    assert top[3] == 1.0 / 64 + 1.0 / 61
    # single-ranker docs score exactly one reciprocal term
    assert by_doc[13][3] == 1.0 / 61
    assert by_doc[8][3] == 1.0 / 68


def test_rrf_fusion_fixture_is_consistent_with_inputs(spark):
    """On the fixture: every doc in either ranker head appears exactly
    once, ranks agree with the input orderings, and the output is
    sorted by (rrf_score DESC, doc_id)."""
    qs = all_queries()
    bm = [r["doc_id"] for r in qs["bm25_topk"](spark, SF).collect()]
    ql = [
        r["doc_id"]
        for r in qs["doc_query_likelihood_topk"](spark, SF).collect()
    ]
    fused = [tuple(r) for r in qs["rrf_fusion_topk"](spark, SF).collect()]
    assert sorted(r[0] for r in fused) == sorted(set(bm) | set(ql))
    for doc_id, bm_rank, ql_rank, _score in fused:
        assert bm_rank == (bm.index(doc_id) + 1 if doc_id in bm else None)
        assert ql_rank == (ql.index(doc_id) + 1 if doc_id in ql else None)
    scores = [(-r[3], r[0]) for r in fused]
    assert scores == sorted(scores)


# --- doc_logprob_mad_outliers ---------------------------------------------------


def test_logprob_mad_outliers_planted_gibberish_doc(spark, tmp_path):
    """Fixture sources are homogeneous (the MAD flag can be vacuous) —
    plant a source of 11 identical common-token docs plus ONE
    gibberish doc of corpus-unique tokens: the 11 clones share the
    source-median NLL exactly (dev = 0, mad = 0), so the strictly-
    greater 3·MAD rule flags exactly the gibberish doc.  Cross-engine
    hash compare runs on the planted corpus."""
    rows = [(i, "the cat sat on the mat", "webx") for i in range(1, 12)]
    rows.append((12, "zq1 zq2 zq3 zq4 zq5 zq6", "webx"))
    sf_dir = _planted_dir(tmp_path, {"documents": _docs_table(rows)})
    got, _cols = _cross_engine(
        spark, "doc_logprob_mad_outliers", sf_dir
    )
    (row,) = got
    source, n_docs, med, mad, n_outliers, share = row
    assert (source, n_docs) == ("webx", 12)
    assert mad == 0.0, "11 identical docs pin the MAD at zero"
    assert n_outliers == 1 and share == 1 / 12


def test_logprob_mad_outliers_all_identical_flags_nothing(spark, tmp_path):
    """All-clone source: dev = 0 everywhere and the strictly-greater
    compare (0 > 0) flags nothing — the zero-variance guard."""
    rows = [(i, "alpha beta gamma", "webx") for i in range(1, 6)]
    sf_dir = _planted_dir(tmp_path, {"documents": _docs_table(rows)})
    got, _cols = _cross_engine(
        spark, "doc_logprob_mad_outliers", sf_dir
    )
    (row,) = got
    assert row[4] == 0 and row[5] == 0.0


# --- segment_weekend_mix --------------------------------------------------------


def _orders_table(rows):
    """rows: (o_orderkey, o_custkey, o_orderdate_us, o_totalprice)"""
    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(rows), pa.string()),
            "o_totalprice": pa.array(
                [r[3] for r in rows], pa.float64()
            ),
            "o_orderdate": pa.array(
                [r[2] for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                ["3-MEDIUM"] * len(rows), pa.string()
            ),
        }
    )


def _customer_table(rows):
    """rows: (c_custkey, c_mktsegment)"""
    return pa.table(
        {
            "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "c_name": pa.array(
                [f"Customer#{r[0]}" for r in rows], pa.string()
            ),
            "c_nationkey": pa.array([0] * len(rows), pa.int32()),
            "c_acctbal": pa.array([0.0] * len(rows), pa.float64()),
            "c_mktsegment": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_segment_weekend_mix_planted_calendar(spark, tmp_path):
    """Epoch day 0 = Thursday 1970-01-01, so day 2 = Saturday and
    day 3 = Sunday (the r8 integer weekend rule).  Plant one BUILDING
    customer with orders on Thu/Sat/Sun/Mon: exactly the Sat+Sun pair
    is weekend (2 of 4, share 0.5) and the cents split is exact.
    Cross-engine hash compare runs on the planted corpus."""
    orders = _orders_table(
        [
            (1, 7, 0 * _DAY_US, 100.0),  # Thursday
            (2, 7, 2 * _DAY_US, 10.0),   # Saturday
            (3, 7, 3 * _DAY_US, 20.0),   # Sunday
            (4, 7, 4 * _DAY_US, 1000.0),  # Monday
        ]
    )
    customer = _customer_table([(7, "BUILDING")])
    sf_dir = _planted_dir(
        tmp_path, {"orders": orders, "customer": customer}
    )
    got, _cols = _cross_engine(spark, "segment_weekend_mix", sf_dir)
    (row,) = got
    seg, n_orders, n_weekend, share, wk_cents, wd_cents = row
    assert (seg, n_orders, n_weekend) == ("BUILDING", 4, 2)
    assert share == 0.5
    assert wk_cents == 3_000 and wd_cents == 110_000
