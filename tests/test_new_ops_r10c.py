"""Pins for the late r10 additions (compression screen, orders cohort)."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from googlecloudstorage_blueprints_spark.operators import all_queries

SF = "/root/testdata/sf0.001"

QUERIES = None


def _q():
    global QUERIES
    if QUERIES is None:
        QUERIES = all_queries()
    return QUERIES


def test_compression_ratio_planted_repetitive_vs_unique(spark, tmp_path):
    base = pq.read_table(f"{SF}/documents.parquet")
    rep = "spam ham " * 500
    uniq = " ".join(f"w{i}x{i * 7919 % 104729}" for i in range(600))
    extra = pa.table(
        {
            "doc_id": pa.array([50_000_001, 50_000_002], pa.int64()),
            "text": pa.array([rep, uniq], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["srcREP", "srcUNIQ"], pa.string()),
            "n_chars": pa.array(
                [len(rep), len(uniq)], pa.int64()
            ),
        }
    )
    planted = pa.concat_tables([base.select(extra.column_names), extra])
    out = tmp_path / "sf_z"
    out.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SF}/{t}.parquet", out / f"{t}.parquet")
    pq.write_table(planted, out / "documents.parquet")

    rows = {r["source"]: r for r in
            _q()["doc_compression_ratio"](spark, str(out)).collect()}
    assert rows["srcREP"]["mean_compress_ratio"] < 0.05
    assert rows["srcREP"]["n_high_compress"] == 1
    assert rows["srcREP"]["high_compress_share"] == pytest.approx(1.0)
    assert rows["srcUNIQ"]["mean_compress_ratio"] > 0.3
    assert rows["srcUNIQ"]["n_high_compress"] == 0
    # determinism: a second run returns identical numbers
    again = {r["source"]: r for r in
             _q()["doc_compression_ratio"](spark, str(out)).collect()}
    assert again == rows


def test_compression_ratio_fixture_rows(spark):
    rows = _q()["doc_compression_ratio"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 < r["mean_compress_ratio"] < 1.5


def test_norm_anova_planted_split_scales(spark, tmp_path):
    """Label 0 vectors have norm 1, label 1 vectors norm 3 → the label
    explains (nearly) all norm variance: R² ≈ 1.  Uniform norms → 0."""
    import numpy as np

    dim = 8
    vecs, labels = [], []
    for i in range(6):
        v = np.zeros(dim, dtype=np.float32)
        v[i % dim] = 1.0
        vecs.append(v); labels.append(0)
    for i in range(6):
        v = np.zeros(dim, dtype=np.float32)
        v[i % dim] = 3.0
        vecs.append(v); labels.append(1)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(12), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = tmp_path / "sf_anova"
    out.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents"
    ).split():
        shutil.copy(f"{SF}/{t}.parquet", out / f"{t}.parquet")
    pq.write_table(tbl, out / "embeddings.parquet")
    row = _q()["embedding_norm_label_anova"](
        spark, str(out)
    ).collect()[0]
    assert row["n_vectors"] == 12 and row["n_labels"] == 2
    assert row["norm_anova_r2"] == pytest.approx(1.0, abs=1e-3)


def test_quadrants_partition_and_reconcile(spark):
    import duckdb

    rows = _q()["customer_balance_spend_quadrants"](
        spark, SF
    ).collect()
    n_cust = duckdb.sql(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert sum(r["customer_share"] for r in rows) == pytest.approx(1.0)
    assert all("/" in r["quadrant"] for r in rows)
