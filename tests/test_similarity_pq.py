"""PQ-ADC ANN quality pins: recall vs. the exact bruteforce,
determinism, and the compression invariant (codes, not vectors, feed
the scan stage)."""

from __future__ import annotations

from googlecloudstorage_blueprints_spark.operators import all_queries

SF = "/root/testdata/sf0.001"
QUERIES = all_queries()


def _neighbor_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_pq_recall_vs_bruteforce(spark):
    exact = _neighbor_sets(
        QUERIES["similarity_knn_bruteforce"](spark, SF).collect()
    )
    approx = _neighbor_sets(
        QUERIES["similarity_knn_pq"](spark, SF).collect()
    )
    assert set(approx) == set(exact), "every query must produce neighbors"
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # 8×32 codebooks + exact re-rank of the ADC top-200: measured 1.00
    # at sf0.001 and 0.86 at sf0.1 (deterministic training, so the
    # fixture-level floor can sit high)
    assert recall >= 0.9, f"recall@10 {recall:.2f} below floor"


def test_pq_deterministic(spark):
    a = sorted(map(tuple, QUERIES["similarity_knn_pq"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["similarity_knn_pq"](spark, SF).collect()))
    assert a == b


def test_pq_reranked_cosines_are_exact(spark):
    """Emitted cosines must be TRUE cosines (the exact-tail contract):
    every (query, neighbor) the PQ op returns must carry the same 6dp
    cosine the bruteforce computes for that pair."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in QUERIES["similarity_knn_bruteforce"](spark, SF).collect()
    }
    for r in QUERIES["similarity_knn_pq"](spark, SF).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:  # pairs the exact top-k also contains
            assert abs(r["cosine"] - exact[key]) < 1e-9, key


def test_ivfpq_composition_recall(spark):
    """The IVF×PQ composition (probe cells, ADC within them, exact
    re-rank) must keep useful recall — the multiplied reductions lose
    only what each tier's own pin already bounds."""
    from googlecloudstorage_blueprints_spark.operators.similarity_pq import (
        ivfpq_topk,
    )

    exact = _neighbor_sets(
        QUERIES["similarity_knn_bruteforce"](spark, SF).collect()
    )
    approx = _neighbor_sets(ivfpq_topk(spark, SF).collect())
    assert set(approx) == set(exact), "every query must produce neighbors"
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # IVF@6/16 cells alone measures ~0.9; PQ alone 1.0 at this SF — the
    # composition floors at the scan cut's loss
    assert recall >= 0.6, f"composed recall@10 {recall:.2f} below floor"
