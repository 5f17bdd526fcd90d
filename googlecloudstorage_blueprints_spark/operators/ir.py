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


# full oracle texts kept as constants so rrf_fusion_topk can compose
# them as subqueries (DuckDB allows WITH inside a parenthesized
# subquery)
_BM25_ORACLE_SQL = f"""
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
           ROUND(CAST(SUM(CAST(ROUND(
               ROUND(LN(1 + (corpus.n_docs - df.df + 0.5)
                            / (df.df + 0.5)), 6)
               * (tf.tf * ({BM25_K1} + 1))
               / (tf.tf + {BM25_K1} * (1 - {BM25_B}
                  + {BM25_B} * (CAST(dl.dl AS DOUBLE) / corpus.avgdl)))
               * 1000000, 0) AS BIGINT)) AS BIGINT) / 1000000.0, 6)
               AS score
    FROM tf
    JOIN df ON df.w = tf.w
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN corpus
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id
    LIMIT {BM25_TOP_K}
    """


@register(
    "bm25_topk",
    oracle=_BM25_ORACLE_SQL,
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
    and each per-(doc, term) score is fixed-pointed ×1e6 to BIGINT
    before the per-doc sum (r7 rule — even a ≤|query|-term double sum
    is merge-order-sensitive in the last ulp, and the rounded score
    feeds the top-k ORDER BY); one closing division."""
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
    term6 = F.round(term_score * 1_000_000, 0).cast("long")
    return (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(term6).cast("double") / 1_000_000.0, 6).alias(
                "score"
            )
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )


bm25_topk.__doc__ = bm25_topk.__doc__.format(k1=BM25_K1, b=BM25_B)


QL_MU = 2000  # Dirichlet smoothing mass (Zhai & Lafferty 2004 default)
QL_TOP_K = 10


_QL_ORACLE_SQL = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    tok AS (SELECT doc_id, w FROM toks WHERE w <> ''),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM tok GROUP BY doc_id),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) AS c_total FROM tok),
    cf AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS cf
        FROM tok WHERE w IN {BM25_QUERY_TERMS!r} GROUP BY w
    ),
    tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE w IN {BM25_QUERY_TERMS!r}
        GROUP BY doc_id, w
    ),
    terms AS (
        SELECT dl.doc_id,
               CAST(ROUND(LN(
                   (COALESCE(tf.tf, 0) + ({QL_MU}.0 * cf.cf) / c.c_total)
                   / (dl.dl + {QL_MU}.0)
               ) * 1000000, 0) AS BIGINT) AS t6
        FROM dl CROSS JOIN cf CROSS JOIN c
        LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.w = cf.w
    )
    SELECT doc_id,
           ROUND(CAST(SUM(t6) AS BIGINT) / 1000000.0, 6) AS score
    FROM terms
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT {QL_TOP_K}
    """


@register(
    "doc_query_likelihood_topk",
    oracle=_QL_ORACLE_SQL,
)
def doc_query_likelihood_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood retrieval (Zhai & Lafferty
    2004) for the same fixed probe query as ``bm25_topk``: score(q,d) =
    Σ_t ln((tf + μ·cf_t/|C|) / (dl + μ)) — the language-model scoring
    tier next to BM25's probabilistic one.  Unlike BM25, every query
    term PRESENT IN THE CORPUS contributes to every document (a
    zero-tf term adds the smoothed background mass), so the scoring
    spine is dl × corpus-present query terms, restored by a LEFT join
    FROM the spine (the r11 restore-empty-rows rule — an inner join
    would silently drop the zero-tf cells that define the model).
    Convention (r13 ADVICE, pinned by a planted absent-term corpus in
    test_new_ops_r13.py): a query term with ZERO corpus frequency has
    no cf row and drops out of the spine on both engines — its
    background mass is ln(0/…) = −∞ under pure Dirichlet smoothing, so
    omission is the standard practical treatment; the score is a sum
    over the corpus-present query subset, identical cross-engine.

    Shape: one token explode feeds dl / corpus-total / cf / tf; cf is a
    ≤|query|-row broadcast, the corpus total a 1-row broadcast
    crossJoin, and the per-doc fan-out is |query|-bounded — corpus-
    sized frames never join each other (the bm25_topk scale story).
    Parity: tf/cf/dl/|C| are exact BIGINTs, the smoothing ratio is
    spelled with identical association on both engines, and each
    per-(doc, term) ln is fixed-pointed round(·1e6)→BIGINT at birth
    (the r7 transcendental rule) so the per-doc sum is
    order-independent; one closing division, 6dp.  (score DESC, doc_id)
    is a total order."""
    tok = _tokens(spark, sf_dir)
    dl = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dl")
    )
    c = tok.agg(F.count(F.lit(1)).cast("long").alias("c_total"))
    q_tok = tok.where(F.col("w").isin(*BM25_QUERY_TERMS))
    cf = q_tok.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("cf")
    )
    tf = q_tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    spine = (
        dl.crossJoin(F.broadcast(cf))
        .crossJoin(F.broadcast(c))
        .alias("sp")
    )
    tfa = tf.alias("tfa")
    t6 = F.round(
        F.log(
            (
                F.coalesce(F.col("tfa.tf"), F.lit(0))
                + (F.lit(float(QL_MU)) * F.col("sp.cf"))
                / F.col("sp.c_total")
            )
            / (F.col("sp.dl") + float(QL_MU))
        )
        * 1_000_000,
        0,
    ).cast("long")
    return (
        spine.join(
            tfa,
            (F.col("tfa.doc_id") == F.col("sp.doc_id"))
            & (F.col("tfa.w") == F.col("sp.w")),
            "left",
        )
        .select(F.col("sp.doc_id").alias("doc_id"), t6.alias("t6"))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("t6").cast("double") / 1_000_000.0, 6).alias(
                "score"
            )
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(QL_TOP_K)
    )


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


PMI_TOP_VOCAB = 100
PMI_MIN_PAIR_DOCS = 5
PMI_TOP_PAIRS = 50


@register(
    "word_pmi_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    tok AS (SELECT DISTINCT doc_id, w FROM toks WHERE w <> ''),
    df AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY w),
    top AS (SELECT w, df FROM df ORDER BY df DESC, w LIMIT {PMI_TOP_VOCAB}),
    pres AS (SELECT t.doc_id, t.w FROM tok t JOIN top ON top.w = t.w),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs
          FROM documents WHERE text IS NOT NULL),
    pairs AS (
        SELECT a.w AS word_a, b.w AS word_b, COUNT(*) AS n_ab
        FROM pres a JOIN pres b
          ON a.doc_id = b.doc_id AND a.w < b.w
        GROUP BY 1, 2
    )
    SELECT p.word_a, p.word_b,
           CAST(p.n_ab AS BIGINT) AS n_both,
           ROUND(LN(CAST(p.n_ab AS DOUBLE) * n.n_docs
                    / (CAST(da.df AS DOUBLE) * CAST(db.df AS DOUBLE))), 6)
               AS pmi
    FROM pairs p
    JOIN top da ON da.w = p.word_a
    JOIN top db ON db.w = p.word_b
    CROSS JOIN n
    WHERE p.n_ab >= {PMI_MIN_PAIR_DOCS}
    ORDER BY pmi DESC, word_a, word_b
    LIMIT {PMI_TOP_PAIRS}
    """,
)
def word_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between head-vocabulary word pairs
    (document-level co-occurrence): the collocation/topic-structure probe
    (Church & Hanks 1990) that tells a curator which terms travel
    together — and, run per source, whether a crawl is topically
    degenerate.

    Scale: the pair join is the quadratic step, so it is BOUNDED before
    it happens — only the top-{vocab} words by document frequency enter
    the presence frame (deterministic df-then-word cut via
    TakeOrderedAndProject, always broadcastable), capping per-doc join
    fan-out at {vocab}²; the doc-keyed self-join then scales linearly
    with corpus size.  Same cap-the-head discipline as
    ngram_jaccard_dedup's HOT_SHINGLE_CAP, from the opposite side.
    Parity: PMI is ln of an exact-integer ratio, rounded 6dp before the
    ORDER BY with (word_a, word_b) tiebreak, so the top-pair cut is
    deterministic on both engines."""
    tok = _tokens(spark, sf_dir).select("doc_id", "w").distinct()
    df = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    top = df.orderBy(F.col("df").desc(), "w").limit(PMI_TOP_VOCAB)
    pres = tok.join(F.broadcast(top.select("w")), "w").select("doc_id", "w")
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    n = d.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    a = pres.alias("a")
    b = pres.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(
            F.col("a.w").alias("word_a"), F.col("b.w").alias("word_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= PMI_MIN_PAIR_DOCS)
    )
    da = top.alias("da")
    db = top.alias("db")
    pmi = F.round(
        F.log(
            F.col("n_ab").cast("double")
            * F.col("n_docs")
            / (F.col("da.df").cast("double") * F.col("db.df").cast("double"))
        ),
        6,
    )
    return (
        pairs.join(F.broadcast(da), F.col("word_a") == F.col("da.w"))
        .join(F.broadcast(db), F.col("word_b") == F.col("db.w"))
        .crossJoin(F.broadcast(n))
        .select(
            "word_a",
            "word_b",
            F.col("n_ab").cast("long").alias("n_both"),
            pmi.alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "word_a", "word_b")
        .limit(PMI_TOP_PAIRS)
    )


word_pmi_pairs.__doc__ = word_pmi_pairs.__doc__.format(vocab=PMI_TOP_VOCAB)


# ---------------------------------------------------------------------------
# reciprocal-rank fusion of the two lexical rankers (r15)
# ---------------------------------------------------------------------------

RRF_K = 60  # Cormack, Clarke & Buettcher 2009 — the standard constant


@register(
    "rrf_fusion_topk",
    oracle=f"""
    WITH bm AS ({_BM25_ORACLE_SQL}),
    ql AS ({_QL_ORACLE_SQL}),
    ra AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS bm25_rank
        FROM bm
    ),
    rb AS (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                    AS BIGINT) AS ql_rank
        FROM ql
    )
    SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
           ra.bm25_rank,
           rb.ql_rank,
           COALESCE(1.0 / ({RRF_K} + ra.bm25_rank), 0.0)
               + COALESCE(1.0 / ({RRF_K} + rb.ql_rank), 0.0) AS rrf_score
    FROM ra FULL OUTER JOIN rb ON rb.doc_id = ra.doc_id
    ORDER BY rrf_score DESC, doc_id
    """,
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 and query-likelihood rankers
    for the shared probe query: score(d) = Σ_r 1/(60 + rank_r(d)) over
    the rankers that retrieved d (Cormack et al. 2009) — the standard
    way to combine retrieval tiers without score calibration, and the
    op a hybrid lexical+LM search stack runs on every query.  A doc
    missing from one ranker's head contributes only the other's term.

    Shape: both input rankers are already TakeOrdered K-row heads, so
    everything here — the two rank windows, the full-outer join, the
    final sort — runs on ≤K-row frames (the bounded-output class; at
    100 TB the cost is the two underlying rankers, shared scan and
    all).  Parity: ranks are exact BIGINTs from total-ordered
    (score DESC, doc_id) windows over hash-matched inputs;
    1/(60+rank) is a single IEEE division of exact integers and the
    fusion sum has exactly two terms in fixed written order, so the
    doubles are bit-identical cross-engine and emit UNROUNDED;
    (rrf_score DESC, doc_id) is a total order.  NULL ranks mark docs
    one ranker missed — on fixtures the two heads overlap heavily, so
    the disjoint-doc path is pinned by a planted divergent-ranking
    corpus (tests/test_new_ops_r15.py)."""
    from pyspark.sql import Window

    bm = bm25_topk(spark, sf_dir)
    ql = doc_query_likelihood_topk(spark, sf_dir)
    # bounded: both inputs are K-row heads, so the global windows sort
    # K rows, never data
    wa = Window.orderBy(F.col("score").desc(), "doc_id")
    ra = bm.select(
        "doc_id", F.row_number().over(wa).cast("long").alias("bm25_rank")
    )
    rb = ql.select(
        "doc_id", F.row_number().over(wa).cast("long").alias("ql_rank")
    )
    from googlecloudstorage_blueprints_spark.functions.frames import (
        sort_bounded,
    )

    fused = ra.join(rb, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "ql_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("ql_rank")),
                F.lit(0.0),
            )
        ).alias("rrf_score"),
    )
    return sort_bounded(fused, F.col("rrf_score").desc(), F.col("doc_id"))
