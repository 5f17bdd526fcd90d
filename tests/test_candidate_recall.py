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


def test_simhash_dedup_equals_bruteforce_hamming(spark):
    """The banded simhash op must return EXACTLY the pairs brute-force
    Hamming finds within radius 3 over the same signatures: pigeonhole
    (4 disjoint 16-bit segments, at most 3 differing bits) guarantees
    every such pair shares a segment, so recall is 1.0 by construction
    and the popcount verify removes every false candidate."""
    from googlecloudstorage_blueprints_spark.operators.dedup import (
        simhash_signatures,
    )

    sigs = {
        r["doc_id"]: r["simhash"] & 0xFFFFFFFFFFFFFFFF
        for r in simhash_signatures(spark, SF).collect()
    }
    ids = sorted(sigs)
    expected = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            ham = bin(sigs[da] ^ sigs[db]).count("1")
            if ham <= 3:
                expected[(da, db)] = ham

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in QUERIES["simhash_dedup"](spark, SF).collect()
    }
    assert got == expected


def test_simhash_dedup_finds_planted_token_permutation(spark, tmp_path):
    """SimHash is order-invariant over the token multiset: a document
    whose words are a permutation of another's must pair at Hamming 0
    even though the texts differ byte-wise (exact dedup would miss it)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        i: " ".join(f"w{i}t{j}" for j in range(40)) for i in range(50)
    }
    texts[27] = " ".join(reversed(texts[3].split(" ")))  # permuted dup
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[i] for i in texts],
            "lang": "en",
            "source": "synth",
            "n_chars": [len(texts[i]) for i in texts],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(pdf), tmp_path / "documents.parquet"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in QUERIES["simhash_dedup"](spark, str(tmp_path)).collect()
    }
    assert got.get((3, 27)) == 0
