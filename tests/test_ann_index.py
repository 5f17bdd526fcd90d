"""Persisted IVF index: build → partition-pruned search → parity with
the in-session IVF operator (whose recall is already pinned)."""

from __future__ import annotations

import pytest

# r19: excluded from the default driver-verify lane (pytest.ini) — this
# module is builder-close-out gated via `-m ""`; see pytest.ini.
pytestmark = pytest.mark.slow

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


def test_ivf_index_append_matches_oneshot_same_quantizer(
    spark, tmp_path
):
    """Incremental append (r10): build on the first 300 vectors, append
    the remaining 200 against the SAME centroids, and the search must
    equal a one-shot assignment of the full corpus under that quantizer
    (the meaningful equivalence — append never retrains, so the fresh
    reference must share the quantizer).  Existing part-files must not
    be rewritten."""
    import os

    from googlecloudstorage_blueprints_spark.pipelines.ann_index import (
        _assign_cells,
        _load_centroids,
        append_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 300)
    shard = emb.where(F.col("vec_id") >= 300).select(
        "vec_id", "embedding"
    )

    # build the base index from a temp fixture dir holding only base
    base_dir = tmp_path / "base_sf"
    base.coalesce(1).write.parquet(f"file:{base_dir}/tmp")
    part = next((base_dir / "tmp").glob("part-*.parquet"))
    os.rename(part, base_dir / "embeddings.parquet")
    idx = f"file:{tmp_path}/ivf_app"
    assert build_ivf_index(spark, str(base_dir), idx) == 300

    files_before = {
        p: p.stat().st_mtime
        for p in (tmp_path / "ivf_app" / "corpus").rglob("*.parquet")
    }
    assert append_ivf_index(spark, idx, shard) == 200
    # append preserved every pre-existing file untouched
    for p, mtime in files_before.items():
        assert p.exists() and p.stat().st_mtime == mtime

    # reference: one-shot assignment of the FULL corpus with the SAME
    # centroids, written to a second index beside the same sidecar
    centroids = _load_centroids(spark, idx)
    ref_idx = f"file:{tmp_path}/ivf_ref"
    _assign_cells(spark, emb, centroids).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(f"{ref_idx}/corpus")
    spark.read.parquet(f"{idx}/centroids").write.mode(
        "overwrite"
    ).parquet(f"{ref_idx}/centroids")

    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
    )
    got = sorted(
        tuple(r) for r in search_ivf_index(spark, idx, queries).collect()
    )
    ref = sorted(
        tuple(r)
        for r in search_ivf_index(spark, ref_idx, queries).collect()
    )
    assert got == ref and len(got) > 0


def test_ivfpq_index_append_matches_oneshot_same_quantizer(
    spark, tmp_path
):
    """The PQ twin: appended vectors are encoded with the EXISTING
    codebooks; search equals a one-shot encode of the full corpus under
    the same centroids + codebooks."""
    import os

    from googlecloudstorage_blueprints_spark.pipelines.ann_index import (
        _assign_cells,
        _full_row_encode_kernel,
        _load_centroids,
        _load_codebooks,
        append_ivfpq_index,
        build_ivfpq_index,
        search_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 300)
    shard = emb.where(F.col("vec_id") >= 300).select(
        "vec_id", "embedding"
    )
    base_dir = tmp_path / "base_sf_pq"
    base.coalesce(1).write.parquet(f"file:{base_dir}/tmp")
    part = next((base_dir / "tmp").glob("part-*.parquet"))
    os.rename(part, base_dir / "embeddings.parquet")
    idx = f"file:{tmp_path}/ivfpq_app"
    assert build_ivfpq_index(spark, str(base_dir), idx) == 300
    assert append_ivfpq_index(spark, idx, shard) == 200

    centroids = _load_centroids(spark, idx)
    books = _load_codebooks(spark, idx)
    ref_idx = f"file:{tmp_path}/ivfpq_ref"
    _assign_cells(spark, emb, centroids).mapInPandas(
        _full_row_encode_kernel(books),
        schema=(
            "vec_id long, embedding array<float>, codes array<int>, "
            "cell int"
        ),
    ).write.mode("overwrite").partitionBy("cell").parquet(
        f"{ref_idx}/corpus"
    )
    for sidecar in ("centroids", "codebooks"):
        spark.read.parquet(f"{idx}/{sidecar}").write.mode(
            "overwrite"
        ).parquet(f"{ref_idx}/{sidecar}")

    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
    )
    got = sorted(
        tuple(r)
        for r in search_ivfpq_index(spark, idx, queries).collect()
    )
    ref = sorted(
        tuple(r)
        for r in search_ivfpq_index(spark, ref_idx, queries).collect()
    )
    assert got == ref and len(got) > 0


def test_ivf_index_append_refuses_overlapping_vec_ids(spark, tmp_path):
    """The r10-ADVICE overlap guard: appending a shard whose vec_ids
    collide with the indexed corpus raises instead of silently
    duplicating rows (duplicates can occupy multiple top-k slots at
    search time).  guard_overlap=False restores the caller-owns-it
    escape hatch."""
    import os

    import pytest

    from googlecloudstorage_blueprints_spark.pipelines.ann_index import (
        append_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 300)
    base_dir = tmp_path / "base_sf"
    base.coalesce(1).write.parquet(f"file:{base_dir}/tmp")
    part = next((base_dir / "tmp").glob("part-*.parquet"))
    os.rename(part, base_dir / "embeddings.parquet")
    idx = f"file:{tmp_path}/ivf_guard"
    assert build_ivf_index(spark, str(base_dir), idx) == 300

    overlapping = emb.where(F.col("vec_id") >= 299).select(
        "vec_id", "embedding"
    )
    with pytest.raises(ValueError, match="append overlap"):
        append_ivf_index(spark, idx, overlapping)
    # nothing was written by the refused append
    n_after = spark.read.parquet(f"{idx}/corpus").count()
    assert n_after == 300
    # escape hatch still appends (caller owns disjointness)
    assert (
        append_ivf_index(
            spark, idx, overlapping, guard_overlap=False
        )
        > 0
    )
