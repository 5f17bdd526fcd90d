"""End-to-end curation pipeline: stage counts must agree with the
individual operators it composes, and the output layout must be the
partitioned split the writer promises."""

from __future__ import annotations

import pytest

# r19: excluded from the default driver-verify lane (pytest.ini) — this
# module is builder-close-out gated via `-m ""`; see pytest.ini.
pytestmark = pytest.mark.slow

import glob

import pyspark.sql.functions as F

from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.pipelines import curate_corpus

SF = "/root/testdata/sf0.001"


def test_curate_corpus_end_to_end(spark, tmp_path):
    out = f"file:{tmp_path}/curated"
    report = curate_corpus(spark, SF, out)

    # stage monotonicity + input count
    assert report.n_input == 500
    assert (
        report.n_input
        >= report.n_quality
        >= report.n_deduped
        >= report.n_near_deduped
        >= report.n_sem_deduped
        >= report.n_clean
        > 0
    )

    # near-dup stage: written docs may not contain BOTH sides of any
    # verified near-dup pair
    nd_pairs = [
        (r["doc_a"], r["doc_b"])
        for r in all_queries()["minhash_lsh_dedup"](spark, SF).collect()
    ]

    # decontamination: no written doc is in the eval slice, and no written
    # doc shares a 3-gram with it (cross-check vs the operator's flag set)
    contaminated_ids = {
        r["doc_id"]
        for r in all_queries()["benchmark_contamination"](spark, SF).collect()
    }
    written_ids = {
        r["doc_id"]
        for r in spark.read.parquet(out).select("doc_id").collect()
    }
    assert not any(i % 97 == 0 for i in written_ids)
    assert not (written_ids & contaminated_ids)
    assert not any(
        a in written_ids and b in written_ids for a, b in nd_pairs
    )

    # semantic stage: no written pair sits at cosine >= SEM_TAU — the
    # lower-id side surviving implies the higher-id side was dropped
    sem_pairs = [
        (r["vec_a"], r["vec_b"])
        for r in all_queries()["dedup_embedding_cosine"](spark, SF).collect()
    ]
    assert sem_pairs, "fixture lost its embedding near-pairs"
    assert not any(
        a in written_ids and b in written_ids for a, b in sem_pairs
    )

    # quality stage must equal the funnel operator's final survivor count
    funnel = {
        r["stage"]: r["survivors"]
        for r in all_queries()["quality_filter_funnel"](spark, SF).collect()
    }
    assert report.n_quality == funnel["03_max_repetition"]

    # layout: hive-partitioned by split, every split non-empty
    assert set(report.split_counts) == {"train", "val", "test"}
    assert all(v > 0 for v in report.split_counts.values())
    assert glob.glob(f"{tmp_path}/curated/split=*")

    # no content duplicates survive, and keepers are the min doc_id
    back = spark.read.parquet(out)
    dup = (
        back.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert dup == 0

    # split sizes roughly 80/10/10 (hash split on ~400 docs: loose bounds)
    total = sum(report.split_counts.values())
    assert report.split_counts["train"] / total > 0.6


def test_curate_corpus_redacts_pii_in_written_text(spark, tmp_path):
    """The written corpus must contain no raw digit runs or email-like
    tokens (the redaction stage ran on every survivor), the placeholder
    counts must reconcile with the report, and redaction must NOT have
    affected dedup (it runs after — originals were deduped as crawled)."""
    import re

    out = f"file:{tmp_path}/curated_red"
    report = curate_corpus(spark, SF, out)
    rows = spark.read.parquet(out).select("text", "n_redactions").collect()
    assert rows
    digit_run = re.compile(r"[0-9]+")
    email_like = re.compile(r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+")
    for r in rows:
        assert not digit_run.search(r["text"]), "unredacted digits written"
        assert not email_like.search(r["text"]), "unredacted email written"
        n_markers = r["text"].count("[NUM]") + r["text"].count("[EMAIL]")
        assert n_markers == r["n_redactions"]
    assert report.n_redactions == sum(r["n_redactions"] for r in rows)


def test_corpus_report_composes_registered_ops(spark, tmp_path):
    """The health report must carry one row per source with every
    column family, each value equal to its source operator's (the
    report only joins — it must never re-derive)."""
    from googlecloudstorage_blueprints_spark.operators import all_queries
    from googlecloudstorage_blueprints_spark.pipelines import corpus_report

    out = f"file:{tmp_path}/report"
    report = corpus_report(spark, SF, out)
    rows = {r["source"]: r for r in report.collect()}

    qs = all_queries()
    sources = {
        r["source"]
        for r in qs["source_quality_scorecard"](spark, SF).collect()
    }
    assert set(rows) == sources and len(sources) > 0

    for col, op in [
        ("simpson_diversity", "simpson_diversity_by_source"),
        ("stopword_ratio", "stopword_ratio_by_source"),
        ("bigram_entropy", "bigram_entropy_by_source"),
        ("drop_rate", "dedup_rate_by_source"),
        ("unbroken_share", "doc_sentence_stats"),
    ]:
        expect = {r["source"]: r[col] for r in qs[op](spark, SF).collect()}
        got = {s: rows[s][col] for s in rows}
        assert got == expect, f"report column {col} diverges from {op}"

    nll = {
        r["source"]: r["p50_nll"]
        for r in qs["logprob_quantiles_by_source"](spark, SF).collect()
    }
    assert {s: rows[s]["median_unigram_nll"] for s in rows} == nll

    lang = {
        r["source"]: r["entropy_e6"]
        for r in qs["source_lang_entropy"](spark, SF).collect()
    }
    assert {s: rows[s]["lang_entropy_e6"] for s in rows} == lang

    lm = {
        r["source"]: (r["n_outliers"], r["outlier_share"])
        for r in qs["doc_logprob_mad_outliers"](spark, SF).collect()
    }
    assert {
        s: (rows[s]["n_lm_outliers"], rows[s]["lm_outlier_share"])
        for s in rows
    } == lm

    written = spark.read.parquet(out)
    assert written.count() == len(sources)


def test_session_mart_composes_registered_ops(spark, tmp_path):
    """Every mart number must equal its source operator's: per-session
    (n_events, duration, total_value) from events_session_stats, entry
    counts + bounces from session_bounce_rate, and the day partitioning
    must be hive-layout on the start epoch-day."""
    import glob as globmod

    from googlecloudstorage_blueprints_spark.pipelines import (
        build_session_mart,
    )

    out = f"file:{tmp_path}/mart"
    report = build_session_mart(spark, SF, out)
    written = spark.read.parquet(out)

    stats = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["duration_sec"], r["total_value"],
        )
        for r in all_queries()["events_session_stats"](spark, SF).collect()
    }
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["duration_sec"], r["total_value"],
        )
        for r in written.collect()
    }
    assert got == stats and len(stats) > 0
    assert report.n_sessions == len(stats)

    bounce = {
        r["entry_type"]: (r["n_sessions"], r["n_bounces"])
        for r in all_queries()["session_bounce_rate"](spark, SF).collect()
    }
    mart_bounce = {
        r["entry_type"]: (r["n"], r["b"])
        for r in written.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_bounce").cast("int")).alias("b"),
        )
        .collect()
    }
    assert mart_bounce == bounce
    assert report.n_bounces == sum(b for _, b in bounce.values())
    assert globmod.glob(f"{tmp_path}/mart/epoch_day=*")


def test_curate_contam_ngram_len_monotone(spark, tmp_path):
    """A longer decontamination shingle can only flag FEWER docs (every
    13-gram hit contains 3-gram hits), so n_clean is monotone
    non-decreasing in contam_ngram_len — the pipeline knob matches the
    contamination_ngram_sensitivity sweep's direction."""
    r3 = curate_corpus(
        spark, SF, str(tmp_path / "c3"), contam_ngram_len=3
    )
    r13 = curate_corpus(
        spark, SF, str(tmp_path / "c13"), contam_ngram_len=13
    )
    # identical upstream stages; only the decontamination gate differs
    assert r13.n_sem_deduped == r3.n_sem_deduped
    assert r13.n_clean >= r3.n_clean


def test_growth_mart_composes_registered_op(spark, tmp_path):
    """Every mart rollup must equal the registered
    user_growth_accounting operator's weekly columns (classes AND the
    report's churn attribution), and the write must be hive-partitioned
    on epoch_week."""
    import glob as globmod

    from googlecloudstorage_blueprints_spark.pipelines import (
        build_growth_mart,
    )

    out = f"file:{tmp_path}/growth"
    report = build_growth_mart(spark, SF, out)
    written = spark.read.parquet(out)

    op = {
        r["epoch_week"]: (
            r["n_active"], r["n_new"], r["n_retained"], r["n_resurrected"]
        )
        for r in all_queries()["user_growth_accounting"](spark, SF).collect()
        if r["n_active"] > 0
    }
    mart = {
        r["epoch_week"]: (r["a"], r["n"], r["t"], r["s"])
        for r in written.groupBy("epoch_week")
        .agg(
            F.count(F.lit(1)).alias("a"),
            F.sum((F.col("cls") == "new").cast("long")).alias("n"),
            F.sum((F.col("cls") == "retained").cast("long")).alias("t"),
            F.sum((F.col("cls") == "resurrected").cast("long")).alias("s"),
        )
        .collect()
    }
    assert mart == op and len(op) > 0
    assert report.n_rows == sum(a for a, *_ in op.values())
    assert report.n_new == sum(n for _a, n, *_ in op.values())
    op_churn = sum(
        r["n_churned"]
        for r in all_queries()["user_growth_accounting"](spark, SF).collect()
    )
    assert report.n_churn_events == op_churn
    assert globmod.glob(f"{tmp_path}/growth/epoch_week=*")


def test_cli_growth_builds_the_mart(tmp_path, capsys):
    from googlecloudstorage_blueprints_spark.fileops.cli import main

    out = f"{tmp_path}/growth_mart"
    assert main([
        "growth", "--sf-dir", "/root/testdata/sf0.001",
        "--output", out,
    ]) == 0
    text = capsys.readouterr().out
    assert "(user, week) rows" in text and "written:" in text
