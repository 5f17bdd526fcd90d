"""End-to-end corpus curation: quality-filter → dedup → split → write.

The composed form of the training-data operator family
(``operators/pipeline.py``, ``operators/dedup.py``, ``sinks/writers.py``)
— what an LLM-data team actually runs nightly.  One logical plan from
scan to partitioned write; Catalyst sees the whole pipeline, so filters
push into the scan and the dedup/split shuffles are the only exchanges.

Stage order is deliberate and matters at 100 TB:

1. **Quality gates first** (map-only): cheap predicates drop the bulk of
   the corpus before anything shuffles.
2. **Exact dedup second**: the hash-agg shuffle runs on survivors only.
3. **Split assignment** (map-only projection) after dedup so replicate
   documents cannot straddle train/test (leakage).
4. **Partitioned write** via the layout-aware writer (repartition-first,
   bounded file counts per split).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.sinks import write_partitioned
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

MIN_CHARS = 150
MIN_TOKENS = 30
MAX_TOP_SHARE = 0.15


@dataclass(frozen=True)
class CurationReport:
    n_input: int
    n_quality: int      # after quality gates
    n_deduped: int      # after exact dedup
    split_counts: dict  # split -> rows written


def _with_quality_metrics(docs: DataFrame) -> DataFrame:
    """Attach n_tokens and top_token_share without leaving the JVM.

    Same metrics as ``quality_filter_funnel`` but computed via the
    explode/groupBy/join shape ONCE and joined back, so the curated rows
    keep their full payload.  NULL-text documents are dropped here (the
    inner join back to metrics removes them), matching the operator's
    explicit ``text IS NOT NULL`` semantics."""
    words = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("w")
    )
    per = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    metrics = per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias(
            "top_token_share"
        ),
    )
    return docs.join(metrics, "doc_id")


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    min_chars: int = MIN_CHARS,
    min_tokens: int = MIN_TOKENS,
    max_top_share: float = MAX_TOP_SHARE,
) -> CurationReport:
    """Run the full curation pipeline over ``documents`` and write the
    result partitioned by split; returns per-stage survivor counts.

    Dedup keeps the smallest doc_id per exact content hash (deterministic
    keeper, same convention as the ``exact_dedup`` operator).  Split is
    the ``stratified_split`` operator's multiplicative-hash 80/10/10."""
    docs = load_table(spark, sf_dir, "documents")
    n_input = docs.count()

    scored = _with_quality_metrics(docs)
    quality = scored.where(
        (F.col("n_chars") >= min_chars)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("top_token_share") <= max_top_share)
    )

    # exact dedup: one hash-agg on the digest, deterministic min keeper
    keeper = (
        quality.groupBy(F.md5("text").alias("content_md5"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(keeper, "doc_id")

    bucket = F.expr("((doc_id % 1000003) * 2654435761) % 100")
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    curated = deduped.withColumn("split", split).select(
        "doc_id", "text", "lang", "source", "n_chars",
        "n_tokens", "top_token_share", "split",
    )

    write_partitioned(curated, out_path, ["split"])

    written = spark.read.parquet(out_path)
    split_counts = {
        r["split"]: r["n"]
        for r in written.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_deduped = sum(split_counts.values())
    return CurationReport(
        n_input=n_input,
        n_quality=quality.count(),
        n_deduped=n_deduped,
        split_counts=split_counts,
    )
