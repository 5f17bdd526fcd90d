"""Information-retrieval operators over the ``documents`` corpus.

Retrieval is the other half of a training-data platform: once a corpus is
curated you need to FIND things in it — lexical search for eval-set
leakage, quality probes, targeted subset extraction.  This module is the
lexical tier (BM25 and index statistics); the embedding tier is
``similarity*.py``.  Everything is DataFrame joins/aggregates over a
(doc_id, word) token stream — the shuffles are word- and doc-keyed, and
the per-term join fan-out is bounded by the query length, so a 100 TB
corpus scores in one pass.  The reference has no search surface
(SURVEY §2.A.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

# the fixed probe query for the oracle-checked BM25 form; terms chosen
# from the fixture vocabulary (TESTDATA.md word salad)
BM25_QUERY_TERMS = ("spark", "query", "table")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    return (
        d.select(
            "doc_id", F.explode_outer(F.split("text", " ")).alias("w")
        )
        .where(F.col("w").isNotNull() & (F.col("w") != ""))
    )


@register(
    "bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    tok AS (SELECT doc_id, w FROM toks WHERE w <> ''),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    corpus AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM tok
        WHERE w IN {BM25_QUERY_TERMS!r}
        GROUP BY doc_id, w
    ),
    df AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY w)
    SELECT tf.doc_id,
           ROUND(SUM(
               ROUND(LN(1 + (corpus.n_docs - df.df + 0.5)
                            / (df.df + 0.5)), 6)
               * (tf.tf * ({BM25_K1} + 1))
               / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                  + {BM25_B} * (CAST(dl.dl AS DOUBLE) / corpus.avgdl)))
           ), 6) AS score
    FROM tf
    JOIN df ON df.w = tf.w
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN corpus
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id
    LIMIT {BM25_TOP_K}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k for a fixed probe query (k1={k1}, b={b}): the
    lexical-search baseline every retrieval stack starts from (Robertson
    & Zaragoza 2009).

    Shape: one token explode → doc-length aggregate; the tf frame only
    keeps query terms, so everything downstream (df, the scoring joins)
    is |query|-bounded per doc — the corpus-sized frames never join each
    other.  The corpus stats (N, avgdl) are a 1-row broadcast crossJoin;
    df broadcasts (≤|query| rows); top-k is ordered DESC with the doc_id
    tiebreaker so the cut is deterministic.  Parity: tf/df/dl are exact
    integers, avgdl is an exact-integer ratio, idf's ln pre-rounds 6dp,
    the per-term sum (≤|query| terms) rounds 6dp."""
    tok = _tokens(spark, sf_dir)
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum("dl").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    tf = (
        tok.where(F.col("w").isin(*BM25_QUERY_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.round(
        F.log(
            1
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        6,
    )
    term_score = idf * (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1
        * (1 - BM25_B + BM25_B * (F.col("dl").cast("double") / F.col("avgdl")))
    )
    return (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )


bm25_topk.__doc__ = bm25_topk.__doc__.format(k1=BM25_K1, b=BM25_B)


@register(
    "inverted_index_stats",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    postings AS (
        SELECT w, COUNT(DISTINCT doc_id) AS df
        FROM toks WHERE w <> ''
        GROUP BY w
    )
    SELECT CAST(df AS BIGINT)        AS posting_len,
           CAST(COUNT(*) AS BIGINT)  AS n_words,
           CAST(SUM(df) AS BIGINT)   AS total_postings
    FROM postings
    GROUP BY df
    ORDER BY posting_len
    """,
)
def inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list length histogram: for each document frequency, how
    many vocabulary words have it and how many index entries they cost —
    the sizing study run before building any inverted index (it exposes
    the stopword head that LSH/jaccard ops cap with HOT_SHINGLE_CAP and
    that an index would stoplist).

    Two hash-aggregates: (word → distinct-doc count), then (df →
    histogram).  The first shuffle is word-keyed partial COUNT DISTINCT;
    the histogram input is |vocab| rows.  All-integer output — no
    parity rounding at all."""
    tok = _tokens(spark, sf_dir)
    postings = tok.groupBy("w").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        postings.groupBy("df")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("df").alias("total_postings"),
        )
        .select(
            F.col("df").cast("long").alias("posting_len"),
            F.col("n_words").cast("long").alias("n_words"),
            F.col("total_postings").cast("long").alias("total_postings"),
        )
        .orderBy("posting_len")
    )
