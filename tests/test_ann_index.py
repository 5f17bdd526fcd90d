"""Persisted IVF index: build → partition-pruned search → parity with
the in-session IVF operator (whose recall is already pinned)."""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.operators.similarity_ivf import (
    N_CELLS,
    N_QUERIES,
)
from googlecloudstorage_blueprints_spark.pipelines import (
    build_ivf_index,
    search_ivf_index,
)

SF = "/root/testdata/sf0.001"


def test_ivf_index_roundtrip_matches_in_session_operator(spark, tmp_path):
    idx = f"file:{tmp_path}/ivf"
    n = build_ivf_index(spark, SF, idx)
    assert n == 500

    # layout: one hive partition directory per non-empty cell
    cells = glob.glob(f"{tmp_path}/ivf/corpus/cell=*")
    assert 1 < len(cells) <= N_CELLS

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = sorted(
        tuple(r) for r in search_ivf_index(spark, idx, queries).collect()
    )
    ref = sorted(
        tuple(r)
        for r in all_queries()["similarity_knn_ivf"](spark, SF).collect()
    )
    assert got == ref and len(got) > 0


def test_ivf_index_search_prunes_partitions(spark, tmp_path):
    """The probe filter must reach the FILE LISTING (PartitionFilters),
    so a search reads nprobe-cell partitions, not the corpus."""
    idx = f"file:{tmp_path}/ivf2"
    build_ivf_index(spark, SF, idx)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    df = search_ivf_index(spark, idx, queries, nprobe=2)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "PartitionFilters: [cell" in plan or (
        "PartitionFilters" in plan and "cell#" in plan
    ), plan
    # and the result is the 2-cell subset's exact top-k (deterministic)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert all(r["query_id"] == 0 for r in rows)


def test_ivfpq_index_roundtrip_matches_in_session_composition(
    spark, tmp_path
):
    """The persisted IVF-PQ search must reproduce the in-session
    ivfpq_topk composition exactly (same deterministic trainers, probe
    rule, ADC shortlist, and tie order), inheriting its pinned
    recall."""
    from googlecloudstorage_blueprints_spark.operators.similarity_pq import (
        ivfpq_topk,
    )
    from googlecloudstorage_blueprints_spark.pipelines.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    idx = f"file:{tmp_path}/ivfpq"
    n = build_ivfpq_index(spark, SF, idx)
    assert n == 500

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got = sorted(
        tuple(r)
        for r in search_ivfpq_index(spark, idx, queries).collect()
    )
    ref = sorted(tuple(r) for r in ivfpq_topk(spark, SF).collect())
    assert got == ref and len(got) > 0
