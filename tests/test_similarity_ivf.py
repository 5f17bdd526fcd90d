"""IVF ANN quality pins: recall vs. the exact bruteforce, determinism."""

from __future__ import annotations

from googlecloudstorage_blueprints_spark.operators import all_queries

SF = "/root/testdata/sf0.001"
QUERIES = all_queries()


def _neighbor_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark):
    exact = _neighbor_sets(
        QUERIES["similarity_knn_bruteforce"](spark, SF).collect()
    )
    approx = _neighbor_sets(QUERIES["similarity_knn_ivf"](spark, SF).collect())
    assert set(approx) == set(exact), "every query must produce neighbors"
    hits = sum(len(exact[q] & approx[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # 4 of 16 cells probed; the fixture corpus clusters weakly, so demand a
    # solid-but-approximate floor (measured ~0.9 at seed-fixed training)
    assert recall >= 0.7, f"recall@10 {recall:.2f} below floor"


def test_ivf_deterministic(spark):
    a = sorted(map(tuple, QUERIES["similarity_knn_ivf"](spark, SF).collect()))
    b = sorted(map(tuple, QUERIES["similarity_knn_ivf"](spark, SF).collect()))
    assert a == b
