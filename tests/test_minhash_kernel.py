"""Arrow minhash kernel ≡ JVM expression aggregate.

The operator computes signatures with the numpy kernel
(``minhash_signatures_arrow``); the 64-min-column JVM aggregate stays
registered as the equivalence oracle.  Both implement
h_p(x) = ((2p+1)·x + p·12582917) mod (2⁶¹-1) over the same shingle-hash
sets, so their signatures must be IDENTICAL — any drift means one side's
integer math changed (overflow, wraparound, permutation reorder).
"""

from __future__ import annotations

from googlecloudstorage_blueprints_spark.operators.dedup import (
    hashed_shingle_docs,
    minhash_signatures,
    minhash_signatures_arrow,
)
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_arrow_kernel_matches_jvm_signatures(spark):
    docs = hashed_shingle_docs(load_table(spark, SF, "documents")).persist()
    jvm = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures(docs).collect()
    }
    arrow = {
        r["doc_id"]: list(r["signature"])
        for r in minhash_signatures_arrow(docs).collect()
    }
    docs.unpersist()
    assert jvm.keys() == arrow.keys()
    assert jvm == arrow
