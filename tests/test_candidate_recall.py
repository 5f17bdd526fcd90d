"""Recall pins for the LSH candidate-generation paths against their exact
ground truths.  A candidate generator with silent recall collapse is the
worst dedup failure mode — it looks healthy (emits pairs, all verified
precise) while missing most duplicates; these floors catch it."""

from __future__ import annotations

from googlecloudstorage_blueprints_spark.operators import all_queries

SF = "/root/testdata/sf0.001"
QUERIES = all_queries()


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    gt = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["ngram_jaccard_dedup"](spark, SF).collect()
    }
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["minhash_lsh_dedup"](spark, SF).collect()
    }
    assert gt, "ground truth must not be empty"
    recall = len(gt & mh) / len(gt)
    assert recall >= 0.85, f"minhash recall {recall:.2f} below floor"
    # every emitted pair is Jaccard-verified → no false positives
    assert not (mh - gt), f"false positives: {sorted(mh - gt)[:5]}"


def test_rp_lsh_recall_vs_exact_cosine(spark):
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in QUERIES["dedup_embedding_cosine"](spark, SF).collect()
    }
    gt = {k for k, c in exact.items() if c >= 0.4}
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in QUERIES["similarity_rp_lsh"](spark, SF).collect()
    }
    assert gt, "ground truth must not be empty"
    recall = len(gt & lsh) / len(gt)
    # 8 tables x 5 planes: theory ~0.63 at the fixture's cosine range
    # (banded-OR curve in similarity.py); measured 0.59
    assert recall >= 0.5, f"rp-lsh recall {recall:.2f} below floor"
