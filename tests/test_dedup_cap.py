"""Hot-shingle df cap in ngram_jaccard_dedup (r5 verdict item 2).

Without the cap, one corpus-wide shingle (boilerplate header, stopword
run) makes the inverted-index self-join emit df² candidate rows — 10¹²
pairs for a df=10⁶ shingle.  The capped form drops shingles with
document frequency above ``SHINGLE_DF_CAP`` from BOTH the join and the
Jaccard universe, on both engines.
"""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from googlecloudstorage_blueprints_spark.operators import (
    REGISTRY,
    _load_all,
    all_queries,
)
from googlecloudstorage_blueprints_spark.operators.dedup import (
    SHINGLE_DF_CAP,
)

_load_all()


def _write_corpus(spark, tmp_path, n_docs: int):
    """n_docs documents that ALL share one 3-gram ("common boiler plate")
    but are otherwise pairwise-disjoint word soup."""
    rows = [
        (
            i,
            "common boiler plate "
            + " ".join(f"tok{i}x{j}" for j in range(8)),
        )
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "capdir")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_corpus_wide_shingle_emits_no_pairs(spark, tmp_path):
    """Docs whose ONLY common shingle is hotter than the cap must not
    pair at all — the quadratic hot-shingle fan-out is gone, not just
    filtered late by the Jaccard threshold."""
    n_docs = SHINGLE_DF_CAP + 44  # "common boiler plate" df > cap
    sf_dir = _write_corpus(spark, tmp_path, n_docs)
    got = all_queries()["ngram_jaccard_dedup"](spark, sf_dir)
    assert got.count() == 0
    got.unpersist()


def test_candidate_volume_is_bounded(spark, tmp_path):
    """The pre-threshold candidate row count stays ≤ CAP·(shingle rows)
    even when one shingle is corpus-wide: replicate the op's capped join
    and count candidates directly."""
    n_docs = SHINGLE_DF_CAP + 44
    sf_dir = _write_corpus(spark, tmp_path, n_docs)
    from googlecloudstorage_blueprints_spark.operators.dedup import (
        _shingles,
    )
    from googlecloudstorage_blueprints_spark.sources.catalog import (
        load_table,
    )

    sh_all = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode_outer(_shingles()).alias("s")
    )
    hot = (
        sh_all.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
    )
    sh = sh_all.join(hot, "s", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    candidates = a.join(
        b,
        (F.col("a.s") == F.col("b.s"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    # disjoint word soup -> kept shingles are all df=1 -> zero candidates;
    # without the cap the hot shingle alone yields n_docs·(n_docs-1)/2
    assert candidates == 0
    uncapped = (
        sh_all.alias("a")
        .join(
            sh_all.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .count()
    )
    assert uncapped == n_docs * (n_docs - 1) // 2


def test_capped_oracle_matches_spark_on_hot_corpus(spark, tmp_path):
    """Spark and the DuckDB oracle must agree on the capped semantics for
    a corpus that actually trips the cap (the sf fixtures don't)."""
    n_docs = SHINGLE_DF_CAP + 44
    sf_dir = _write_corpus(spark, tmp_path, n_docs)
    # make doc 0/1 true near-dups below the cap so the result is non-empty
    spark_df = all_queries()["ngram_jaccard_dedup"]
    extra = spark.createDataFrame(
        [
            (10_000, "alpha beta gamma delta epsilon zeta eta theta"),
            (10_001, "alpha beta gamma delta epsilon zeta eta iota"),
        ],
        "doc_id long, text string",
    )
    extra.write.mode("append").parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in spark_df(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    oracle = {
        (a, b, round(j, 9))
        for a, b, j in con.execute(
            REGISTRY["ngram_jaccard_dedup"].oracle
        ).fetchall()
    }
    assert got == oracle
    # the genuine near-dup pair survives the cap: 5 shared 3-gram
    # shingles of 6 each -> jaccard 5/7 ≈ 0.714 ≥ 0.6
    assert any(a == 10_000 and b == 10_001 for a, b, _ in got)


def test_cross_source_matrix_finds_planted_copies(spark, tmp_path):
    """The fixtures contain no exact cross-source duplicates (the op
    returns 0 rows there, a trivially-passing oracle) — plant copies
    across and within sources and pin the full matrix: pair counts,
    shared-text counts, and LEAST/GREATEST pair normalization."""
    rows = []
    # 10 unique docs per source
    for s in ("crawl_a", "crawl_b", "crawl_c"):
        for i in range(10):
            rows.append((len(rows), f"unique {s} doc {i} words", s))
    rows.append((100, "copied text one", "crawl_a"))
    rows.append((101, "copied text one", "crawl_b"))   # a<->b
    rows.append((102, "copied text one", "crawl_b"))   # b self-dup too
    rows.append((103, "copied text two", "crawl_c"))
    rows.append((104, "copied text two", "crawl_a"))   # a<->c
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        (r["source_a"], r["source_b"]): (r["n_dup_pairs"], r["n_shared_texts"])
        for r in all_queries()["dedup_cross_source_matrix"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        # "copied text one": pairs (100,101),(100,102) cross + (101,102) self
        ("crawl_a", "crawl_b"): (2, 1),
        ("crawl_b", "crawl_b"): (1, 1),
        # "copied text two": pair (103,104) normalized to (a, c)
        ("crawl_a", "crawl_c"): (1, 1),
    }
