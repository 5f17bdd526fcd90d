"""Semantic (embedding-space) near-deduplication — SemDeDup-style.

The r8 verdict named this the one canonical LLM-curation operator the
registry lacked: lexical near-dedup exists (minhash/simhash/ngram), and
exact-cosine duplicate PAIRS exist (``dedup_embedding_cosine``), but
nothing turned embedding-space neighborhoods into a keeper decision.
This module composes the existing tiers into that operator:

- ``dedup_semantic`` (oracle-backed): exact pair tier → greedy lowest-id
  keeper → per-label survivorship summary.  The pair stage IS
  ``dedup_embedding_cosine`` (block-GEMM against the broadcast
  normalized corpus, guarded by ``EXACT_TIER_MAX_ROWS``), so this op is
  the ground-truth variant and shares its oracle form.
- ``dedup_semantic_ann`` (rows-only): the 100 TB path — candidate pairs
  from the banded random-hyperplane LSH tier (``similarity_rp_lsh``,
  bucket equi-join, no quadratic stage), same keeper, same summary.
  Real semantic dups live at cosine ≥ 0.9 where the 8×5 SRP config's
  candidate probability is ≥ 0.99; the fixture's 0.4-band pairs sit far
  below that, so this tier is pinned by planted high-cosine tests
  (``tests/test_semdedup.py``), not the driver oracle.

Keeper semantics (both variants): a vector is DROPPED iff some
lower-vec_id vector lies within the similarity threshold — greedy
dominance, one deterministic pass, no transitive chaining (pairs (1,2)
and (2,3) drop BOTH 2 and 3 even when cos(1,3) < τ; connected-component
clustering is ``dedup_clusters``' job).  Dominance is SQL-expressible,
which is what lets the exact variant be driver-oracle-checked.

Parity: the pair cut reuses the exact tier's RAW cosine ≥ 0.4 comparison
(adjudicated identical cross-engine since r5); the summary emits BIGINT
counts and an exact-integer-ratio drop_rate (bit-identical unrounded,
r2 rule); labels are BIGINT-cast; the 10-label output sorts via
``sort_bounded``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.operators.similarity import (
    dedup_embedding_cosine,
    similarity_rp_lsh,
)
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

# Shared with the exact pair tier (dedup_embedding_cosine's kernel cut).
# Production semantic dedup runs τ ≈ 0.9-0.95; the fixture's planted
# near-pairs top out ~0.5, so the registered ops use the tier cut and the
# realistic-τ behavior is pinned on planted corpora in tests.
SEM_TAU = 0.4


def _survivorship_summary(
    emb: DataFrame, pairs: DataFrame, tau: float
) -> DataFrame:
    """Greedy lowest-id keeper + per-label summary over a duplicate-pair
    frame (columns vec_a < vec_b, cosine).  Dropped = distinct vec_b at
    cosine ≥ tau; the summary is a broadcast-friendly left anti-ish join
    (|dropped| ≤ |pairs|, tiny next to the corpus) followed by a
    |labels|-group aggregate."""
    dropped = (
        pairs.where(F.col("cosine") >= tau)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    labeled = emb.select(
        "vec_id", F.col("label").cast("long").alias("label")
    ).join(F.broadcast(dropped), "vec_id", "left")
    return sort_bounded(
        labeled.groupBy("label").agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
            (
                F.count(F.lit(1))
                - F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            )
            .cast("long")
            .alias("n_kept"),
            (
                F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("drop_rate"),
        ),
        "label",
    )


@register(
    "dedup_semantic",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= {SEM_TAU}
    ),
    dropped AS (SELECT DISTINCT vec_b AS vec_id FROM pairs)
    SELECT CAST(e.label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(d.vec_id) AS BIGINT) AS n_dropped,
           CAST(COUNT(*) - COUNT(d.vec_id) AS BIGINT) AS n_kept,
           CAST(COUNT(d.vec_id) AS DOUBLE) / COUNT(*) AS drop_rate
    FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.vec_id
    GROUP BY e.label
    ORDER BY label
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keeper over exact cosine pairs: which vectors survive
    embedding-space near-dedup, summarized per label.

    Composition: ``dedup_embedding_cosine`` (ground-truth pair tier —
    block-GEMM vs the broadcast normalized corpus, ≥ 0.4 cut,
    EXACT_TIER_MAX_ROWS-guarded) → greedy lowest-id dominance keeper →
    per-label counts + exact-integer drop_rate.  Beyond the exact tier's
    500k-row ceiling the same keeper runs on ``dedup_semantic_ann``'s
    LSH candidates — identical downstream plan, only the pair stage
    swaps."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup_embedding_cosine(spark, sf_dir)
    return _survivorship_summary(emb, pairs, SEM_TAU)


@register("dedup_semantic_ann")  # rows-only: LSH candidate recall < 1 at
# the fixture's 0.4-cosine band (by design; see module docstring)
def dedup_semantic_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB semantic-dedup path: LSH-bucketed candidate pairs →
    exact cosine verify (inside ``similarity_rp_lsh``) → the same greedy
    keeper and per-label summary as ``dedup_semantic``.

    Scale: candidate generation is a (table, sketch) bucket equi-join —
    no quadratic stage, no driver-side corpus; hot buckets are AQE
    skew-split territory.  At the production threshold (cosine ≥ 0.9)
    the 8×5 SRP config's per-pair candidate probability is ≥ 0.99, so
    the summary converges to the exact tier's — pinned on planted
    high-cosine corpora in ``tests/test_semdedup.py``."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity_rp_lsh(spark, sf_dir)
    return _survivorship_summary(emb, pairs, SEM_TAU)
