"""Persist hygiene: ops that cache intermediates must free them.

Round-3 verdict defect #3: ``events_hierarchical_rollup`` and
``similarity_rp_lsh`` persisted intermediates and never unpersisted, so
cached partitions accumulated across the driver's 98-query run.  The
repo convention is now: an op may persist intermediates, but it must
eagerly materialize its (result-sized) output and unpersist everything
else before returning — the ONLY cache an op leaves behind is its own
returned result, which the caller can free with ``df.unpersist()``.
"""

from __future__ import annotations

import pytest

from googlecloudstorage_blueprints_spark.operators import all_queries

SF = "/root/testdata/sf0.001"

# every operator that persists an intermediate frame
PERSISTING_OPS = [
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "dedup_clusters",
    "pareto_revenue",
    "pareto_revenue_scale",
    "events_hierarchical_rollup",
    "similarity_rp_lsh",
    "benchmark_contamination",
    "source_vocab_overlap",
    "source_unigram_kl",
    "rfm_segments",
    "multimodal_phash_dedup",
    "events_sessionized_funnel",
    "sequence_pack",
    "chunk_dedup",
    "copurchase_pagerank",
]


def _persisted_ids(spark) -> set[int]:
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.keysIterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next())
    return ids


@pytest.mark.parametrize("name", PERSISTING_OPS)
def test_op_leaves_only_its_result_persisted(spark, name):
    before = _persisted_ids(spark)
    df = all_queries()[name](spark, SF)
    df.collect()
    df.unpersist(blocking=True)
    leaked = _persisted_ids(spark) - before
    assert not leaked, (
        f"{name}: leaked persisted RDD ids {sorted(leaked)} after "
        "result unpersist"
    )
