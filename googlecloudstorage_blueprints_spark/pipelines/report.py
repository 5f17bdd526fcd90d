"""Corpus health report: one per-source table joining every
distribution screen the registry computes separately.

The review artifact a data team reads before a training run: each row
is a source, each column a registered QA operator's verdict — lexical
shape (Zipf slope, unigram KL, Simpson diversity, hapax share, bigram
entropy), composition (char-class dilution, digit share, stopword
density), and dedup pressure (exact-dup drop rate).  Composing the
REGISTERED operators (never re-deriving their expressions) keeps every
column oracle-checked by the driver through its source op; this module
only joins |sources|-row frames and writes the result.

Scale: every input is already a per-source reduction, so the report
costs its most expensive constituent plus |sources|-row broadcast
joins.  The heavy shuffles (the (source, word) count, the digest
aggregate) run inside the composed ops exactly as standalone.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# every column family this report joins, by registered operator key
REPORT_SOURCES = (
    "source_quality_scorecard",   # zipf_slope, kl_vs_corpus, chars/digits
    "dedup_rate_by_source",       # exact-dup drop rate
    "stopword_ratio_by_source",   # function-word density
    "hapax_ratio_by_source",      # vocabulary productivity
    "simpson_diversity_by_source",  # collision-probability diversity
    "bigram_entropy_by_source",   # sequence diversity
    "logprob_quantiles_by_source",  # perplexity band (r9: p50 unigram NLL)
    "source_temperature_weights",   # r10: sampling weights (prop vs τ)
    "doc_prefix_dup_share",         # r10: boilerplate-prefix pressure
    "source_token_budget_split",    # r10: exact token quota
    "doc_first_token_profile",      # r11: 1-token boilerplate screen
    "doc_repeated_token_runs",      # r11: degenerate-loop pressure
    "source_lang_entropy",          # r11: language-mix concentration
    "doc_sentence_stats",           # r11: segmentation readiness
    "doc_logprob_mad_outliers",     # r15: robust LM-score outlier rate
)


def corpus_report(
    spark: SparkSession, sf_dir: str, out_path: str | None = None
) -> DataFrame:
    """Build (and optionally write) the per-source health report.

    Returns the joined DataFrame; when ``out_path`` is given the report
    is also written as a single parquet file (it is |sources| rows — a
    report, not a dataset)."""
    from googlecloudstorage_blueprints_spark.operators import all_queries

    qs = all_queries()
    scorecard = qs["source_quality_scorecard"](spark, sf_dir)
    dedup = qs["dedup_rate_by_source"](spark, sf_dir).select(
        "source", "n_docs", "n_dropped", "drop_rate"
    )
    stop = qs["stopword_ratio_by_source"](spark, sf_dir).select(
        "source", "stopword_ratio"
    )
    hapax = qs["hapax_ratio_by_source"](spark, sf_dir).select(
        "source", "vocab_size", "hapax_ratio"
    )
    simpson = qs["simpson_diversity_by_source"](spark, sf_dir).select(
        "source", "simpson_diversity"
    )
    entropy = qs["bigram_entropy_by_source"](spark, sf_dir).select(
        "source", "bigram_entropy"
    )
    nll = qs["logprob_quantiles_by_source"](spark, sf_dir).select(
        "source",
        F.col("p50_nll").alias("median_unigram_nll"),
        F.col("p90_nll").alias("p90_unigram_nll"),
    )
    temp = qs["source_temperature_weights"](spark, sf_dir).select(
        "source", "weight_prop", "weight_temp"
    )
    prefix = qs["doc_prefix_dup_share"](spark, sf_dir).select(
        "source", F.col("dup_share").alias("prefix_dup_share")
    )
    budget = qs["source_token_budget_split"](spark, sf_dir).select(
        "source", "alloc_tokens"
    )
    first_tok = qs["doc_first_token_profile"](spark, sf_dir).select(
        "source", F.col("top_share").alias("first_token_share")
    )
    runs = qs["doc_repeated_token_runs"](spark, sf_dir).select(
        "source", "longest_run", "looping_share"
    )
    langmix = qs["source_lang_entropy"](spark, sf_dir).select(
        "source",
        "n_langs",
        "top_lang",
        "top_lang_share",
        F.col("entropy_e6").alias("lang_entropy_e6"),
    )
    sentences = qs["doc_sentence_stats"](spark, sf_dir).select(
        "source", "unbroken_share", "chars_per_sentence"
    )
    lm_outliers = qs["doc_logprob_mad_outliers"](spark, sf_dir).select(
        "source",
        F.col("n_outliers").alias("n_lm_outliers"),
        F.col("outlier_share").alias("lm_outlier_share"),
    )

    report = (
        scorecard.join(F.broadcast(dedup), "source")
        .join(F.broadcast(stop), "source")
        .join(F.broadcast(hapax), "source")
        .join(F.broadcast(simpson), "source")
        .join(F.broadcast(entropy), "source")
        .join(F.broadcast(nll), "source")
        .join(F.broadcast(temp), "source")
        .join(F.broadcast(prefix), "source")
        .join(F.broadcast(budget), "source")
        .join(F.broadcast(first_tok), "source")
        .join(F.broadcast(runs), "source")
        .join(F.broadcast(langmix), "source")
        .join(F.broadcast(sentences), "source")
        .join(F.broadcast(lm_outliers), "source")
        .orderBy("source")
    )
    if out_path is not None:
        report.coalesce(1).write.mode("overwrite").parquet(out_path)
    return report
