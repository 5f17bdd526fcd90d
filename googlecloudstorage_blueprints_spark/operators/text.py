"""Text-analysis operators over the ``documents`` corpus.

A 100 TB training-data pipeline needs corpus profiling before filtering:
token counts, quality scores, language identification, fingerprints.  All
hot-path expressions are JVM builtins (split/regexp/aggregate) — no Python
UDFs — so they run inside whole-stage codegen and scale linearly with
executors.  The reference has no text surface (SURVEY.md §2.A.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table


@register(
    "text_stats",
    oracle="""
    SELECT lang,
           COUNT(*)                                  AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)              AS total_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                                                     AS total_tokens,
           CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
           CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
           ROUND(AVG(n_chars), 4)                    AS avg_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per language: document counts, char and token totals.
    Whitespace tokenization via split() — a JVM builtin."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(n_tokens).cast("long").alias("total_tokens"),
            F.min(n_tokens).cast("long").alias("min_tokens"),
            F.max(n_tokens).cast("long").alias("max_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@register(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)        AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT)
                                                               AS alpha_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT)
                                                               AS bpe_ish_tokens,
           CAST(length(text) AS BIGINT)                        AS n_chars_actual
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, alphabetic runs, and a
    BPE-ish word/number regex — the standard pre-tokenization cost estimate
    for training-data budgeting."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+', 0)"))
        .cast("long")
        .alias("alpha_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


@register(
    "quality_score",
    oracle="""
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT)                         AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT)         AS n_tokens,
           (length(text) - len(string_split(text, ' ')) + 1)
               * 1.0 / len(string_split(text, ' '))             AS avg_token_len,
           CAST((length(text) - length(replace(text, 'the', ''))) / 3
                AS BIGINT)                                      AS stopword_hits,
           CASE WHEN len(string_split(text, ' ')) >= 20
                 AND (length(text) - len(string_split(text, ' ')) + 1)
                     * 1.0 / len(string_split(text, ' ')) BETWEEN 2 AND 12
                THEN 1 ELSE 0 END                               AS passes_filter
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features per document (Gopher-rule flavor):
    length, mean token length, stopword hits, and a pass/fail gate —
    all exact integer arithmetic + one exact division."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    n_chars = F.length("text")
    # word soup is single-space separated: chars - (n_tokens-1) = letter count
    avg_tok = (n_chars - n_tokens + 1) * F.lit(1.0) / n_tokens
    stop_hits = (
        (n_chars - F.length(F.regexp_replace("text", "the", ""))) / F.lit(3)
    ).cast("long")
    passes = F.when(
        (n_tokens >= 20) & avg_tok.between(2, 12), 1
    ).otherwise(0)
    return d.select(
        "doc_id",
        "lang",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        avg_tok.alias("avg_token_len"),
        stop_hits.alias("stopword_hits"),
        passes.alias("passes_filter"),
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text)                                   AS content_md5,
           substr(md5(text), 1, 8)                     AS fp_prefix,
           md5(CAST(doc_id AS VARCHAR) || ':' || substr(text, 1, 64))
                                                       AS head_fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: full md5, an 8-hex shard prefix (for routing
    fingerprints to reducers without hotspots), and a head fingerprint over
    the first 64 chars (cheap candidate key for prefix-duplicate hunting).

    The oracle spells the head concat with ``||`` (NULL-propagating on
    DuckDB, like Spark's concat) — DuckDB's concat() SKIPS NULLs, so a
    NULL text would fingerprint as md5('id:') on one engine only
    (null-catalog audit, r18); a NULL doc_id or text yields head_fp
    NULL on both."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.substring(F.md5("text"), 1, 8).alias("fp_prefix"),
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.substring("text", 1, 64),
            )
        ).alias("head_fp"),
    )


# Tiny per-language lexicons for the n-gram/stopword language-ID heuristic.
# Deterministic and self-contained (the fixture corpus is synthetic word
# soup, so this demonstrates the operator mechanics, not linguistic truth).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "fast", "slow"],
    "de": ["der", "und", "nicht", "das", "ist"],
    "es": ["el", "la", "los", "que", "de"],
    "fr": ["le", "les", "des", "est", "une"],
    "zh": ["de", "shi", "le", "bu", "zai"],
}


_LANGS = sorted(_LANG_MARKERS)
# argmax-over-scores in DuckDB: greatest() for the max, then a CASE chain in
# the SAME lexicographic language order as the Spark coalesce() tiebreak.
_LANG_ID_ORACLE = (
    "WITH scored AS (\n"
    "    SELECT doc_id, lang,\n"
    + ",\n".join(
        "           len(list_intersect("
        "list_distinct(string_split(text, ' ')), "
        "[" + ", ".join(f"'{w}'" for w in _LANG_MARKERS[lang]) + "]"
        f")) AS score_{lang}"
        for lang in _LANGS
    )
    + "\n    FROM documents\n"
    ")\n"
    "SELECT doc_id,\n"
    "       lang AS labeled_lang,\n"
    "       CASE\n"
    + "\n".join(
        f"           WHEN score_{lang} = "
        f"greatest({', '.join('score_' + x for x in _LANGS)}) "
        f"THEN '{lang}'"
        for lang in _LANGS
    )
    + "\n       END AS predicted_lang,\n"
    f"       CAST(greatest({', '.join('score_' + x for x in _LANGS)})"
    " AS BIGINT) AS best_score\n"
    "FROM scored"
)


@register("lang_id", oracle=_LANG_ID_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: score = |tokens ∩ marker-lexicon| per
    language, predict the argmax (deterministic lexicographic tiebreak).

    Built from array_intersect over a literal lexicon array — pure JVM
    expression, no UDF, no shuffle; at 100 TB this is a map-only pass."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    scored = d.select(
        "doc_id",
        "lang",
        *[
            F.size(
                F.array_intersect(
                    toks, F.array(*[F.lit(w) for w in words])
                )
            ).alias(f"score_{lang}")
            for lang, words in sorted(_LANG_MARKERS.items())
        ],
    )
    langs = sorted(_LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.coalesce(
        *[
            F.when(F.col(f"score_{lang}") == best, F.lit(lang))
            for lang in langs
        ]
    )
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("long").alias("best_score"),
    )


@register(
    "balanced_sample",
    oracle="""
    WITH sized AS (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id)
                   AS rk
        FROM documents WHERE doc_id IS NOT NULL
    ),
    cap AS (
        SELECT MIN(cnt) AS per_class
        FROM (SELECT COUNT(*) AS cnt FROM documents
              WHERE doc_id IS NOT NULL GROUP BY lang)
    )
    SELECT s.doc_id, s.lang, s.source, s.n_chars,
           CAST(s.rk AS BIGINT) AS rk
    FROM sized s CROSS JOIN cap
    WHERE s.rk <= cap.per_class
    """,
)
def balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language contributes exactly
    min-class-size documents (deterministic: per-class rank over the
    stable doc_id key, not RNG — reruns and engines agree row-for-row).

    Scale shape: one window shuffle on the class key + a broadcast of the
    single-row cap.  For representative (not just deterministic) sampling
    at 100 TB, rank over xxhash64(doc_id) instead of doc_id — same plan,
    pseudo-random order, still seedless-deterministic; kept key-ordered
    here so the DuckDB oracle (whose hash differs) can verify the
    machinery exactly.  NULL doc_ids are dropped on BOTH engines
    (null-catalog audit, r18: they have no deterministic rank — NULLs
    tie in the order — and engine NULL-ordering defaults differ)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    sized = d.select(
        "doc_id", "lang", "source", "n_chars",
        F.row_number().over(w).cast("long").alias("rk"),
    )
    cap = d.groupBy("lang").count().agg(
        F.min("count").alias("per_class")
    )
    return (
        sized.crossJoin(F.broadcast(cap))
        .where(F.col("rk") <= F.col("per_class"))
        .drop("per_class")
    )


_LANG_CONFUSION_ORACLE = (
    "WITH lang_pred AS (\n" + _LANG_ID_ORACLE + "\n)\n"
    "SELECT labeled_lang, predicted_lang,\n"
    "       CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
    "       (labeled_lang = predicted_lang) AS agree\n"
    "FROM lang_pred\n"
    "GROUP BY labeled_lang, predicted_lang"
)


@register("lang_confusion_matrix", oracle=_LANG_CONFUSION_ORACLE)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID quality audit: the (labeled, predicted) confusion
    matrix of the ``lang_id`` heuristic against the corpus's labeled
    ``lang`` column — the report that decides whether a cheap map-only
    classifier is good enough to route documents, or which language
    pairs need a real model.

    Composes the registered ``lang_id`` projection (map-only, no UDF)
    with one |langs|²-bounded aggregate; counts are exact integers."""
    return (
        lang_id(spark, sf_dir)
        .groupBy("labeled_lang", "predicted_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.col("labeled_lang") == F.col("predicted_lang")).alias(
                "agree"
            ),
        )
    )


@register(
    "doc_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, substring(text, CAST(i AS INT), 1) AS c
        FROM documents, UNNEST(range(1, len(text) + 1)) AS t(i)
        WHERE text IS NOT NULL
    ),
    freq AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM chars GROUP BY doc_id, c),
    tot AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n
            FROM freq GROUP BY doc_id)
    SELECT f.doc_id,
           t.n AS n_chars_counted,
           CAST(COUNT(*) AS BIGINT) AS alphabet_size,
           ROUND(-SUM((cnt * 1.0 / n) * log2(cnt * 1.0 / n)) + 0.0, 6)
               AS char_entropy
    FROM freq f JOIN tot t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id, t.n
    """,
)
def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the classic cheap
    detector for pathological text (base64 blobs and hex dumps read
    ~5-6 bits/char, repeated boilerplate reads ~1-2, natural language
    ~4), used as a gating feature alongside ``quality_score``.

    Plan: per-position explode (sequence+explode, codegen — the
    higher-order-transform form runs interpreted) → (doc, char) counts →
    per-doc entropy aggregate.  Two shuffles, both on doc_id-rooted
    keys.  Entropy sums ~dozens of p·log2 p doubles whose order differs
    across engines — rounded 6dp, the convention every ln/pow aggregate
    in this registry follows (see doc_logprob_unigram).  At 100 TB the
    same result comes from one Arrow pass (np.unique per doc); the
    expression form is registered because it is oracle-checkable and the
    explode is map-side."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    chars = d.select(
        "doc_id",
        F.explode_outer(
            F.expr("sequence(1, length(text))")
        ).alias("i"),
        F.col("text"),
    ).select(
        "doc_id", F.expr("substring(text, i, 1)").alias("c")
    )
    freq = chars.groupBy("doc_id", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = freq.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") * 1.0 / F.col("n")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("alphabet_size"),
            # + 0.0 is the NEGATIVE-ZERO guard (unicode audit, r18): a
            # single-char alphabet makes SUM(p·log2 p) exactly +0.0 and
            # its negation -0.0, which DuckDB's ROUND preserves while
            # Spark normalizes — the canonicalizer's repr() sees
            # '-0.0' != '0.0'.  IEEE: -0.0 + 0.0 = +0.0; identity for
            # every nonzero entropy.  Spelled on BOTH engines.
            F.round(-F.sum(p * F.log2(p)) + F.lit(0.0), 6).alias(
                "char_entropy"
            ),
        )
        .select(
            "doc_id",
            F.col("n").alias("n_chars_counted"),
            "alphabet_size",
            "char_entropy",
        )
    )


# PII-shaped scan patterns: emails/digits are the real scrub targets (the
# synthetic corpus contains none — the zero counts still hash-verify the
# plumbing); long tokens and the stopword literal exercise non-zero paths.
_SCAN_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+"
_SCAN_DIGITS = "[0-9]+"
_SCAN_LONG = "[a-z]{6,}"
_SCAN_THE = "the"


@register(
    "pii_pattern_scan",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_SCAN_EMAIL}')) AS BIGINT)
               AS n_email_like,
           CAST(len(regexp_extract_all(text, '{_SCAN_DIGITS}')) AS BIGINT)
               AS n_digit_runs,
           CAST(len(regexp_extract_all(text, '{_SCAN_LONG}')) AS BIGINT)
               AS n_long_tokens,
           CAST(len(regexp_extract_all(text, '{_SCAN_THE}')) AS BIGINT)
               AS n_stopword_the,
           CAST(len(regexp_replace(text, '{_SCAN_DIGITS}', '', 'g'))
                AS BIGINT) AS scrubbed_len
    FROM documents WHERE text IS NOT NULL
    """,
)
def pii_pattern_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-shaped pattern scan per document: email-like and digit-run
    counts (the scrub targets a training pipeline must report before
    release), plus long-token and stopword counts as live non-zero
    controls, plus the post-scrub length — all map-only JVM regex, no
    UDF.

    Regex parity: the patterns use only character classes, literals and
    bounded repetition — the subset where Java regex (Spark) and RE2
    (DuckDB) agree on non-overlapping left-to-right scan counts;
    backreferences/lookarounds are deliberately excluded (RE2 has
    neither).  Scrub uses the global-replace form on both engines."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_SCAN_EMAIL))
        .cast("long")
        .alias("n_email_like"),
        F.regexp_count("text", F.lit(_SCAN_DIGITS))
        .cast("long")
        .alias("n_digit_runs"),
        F.regexp_count("text", F.lit(_SCAN_LONG))
        .cast("long")
        .alias("n_long_tokens"),
        F.regexp_count("text", F.lit(_SCAN_THE))
        .cast("long")
        .alias("n_stopword_the"),
        F.length(F.regexp_replace("text", _SCAN_DIGITS, ""))
        .cast("long")
        .alias("scrubbed_len"),
    )


@register(
    "pii_redact",
    oracle=f"""
    WITH red AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_SCAN_EMAIL}'))
                    AS BIGINT) AS n_email_redacted,
               CAST(len(regexp_extract_all(
                   regexp_replace(text, '{_SCAN_EMAIL}', '[EMAIL]', 'g'),
                   '{_SCAN_DIGITS}')) AS BIGINT) AS n_digit_redacted,
               regexp_replace(
                   regexp_replace(text, '{_SCAN_EMAIL}', '[EMAIL]', 'g'),
                   '{_SCAN_DIGITS}', '[NUM]', 'g') AS redacted
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           n_email_redacted,
           n_digit_redacted,
           CAST(LENGTH(redacted) AS BIGINT) AS n_redacted_chars,
           md5(redacted)                    AS redacted_fp
    FROM red
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: replace email-like tokens then digit runs
    with placeholder tags, reporting per-document redaction counts and
    the redacted text's length + fingerprint — the TRANSFORM stage whose
    report tier is ``pii_pattern_scan`` (scan tells you what's there;
    this is the scrub a release pipeline actually applies).

    Map-only JVM regex, no shuffle.  Emails are replaced BEFORE digit
    runs (identical order on both engines — emails contain digits, so
    the opposite order changes counts); the digit count is taken on the
    email-redacted text for the same reason.  The fingerprint stands in
    for the redacted text itself (scalar-columns rule; the value-exact
    md5 still pins every byte cross-engine).  Patterns are the
    Java/RE2-shared subset with DuckDB's 'g' replace-all flag."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    email_red = F.regexp_replace("text", _SCAN_EMAIL, "[EMAIL]")
    full_red = F.regexp_replace(email_red, _SCAN_DIGITS, "[NUM]")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_SCAN_EMAIL))
        .cast("long")
        .alias("n_email_redacted"),
        F.regexp_count(email_red, F.lit(_SCAN_DIGITS))
        .cast("long")
        .alias("n_digit_redacted"),
        F.length(full_red).cast("long").alias("n_redacted_chars"),
        F.md5(full_red).alias("redacted_fp"),
    )


@register(
    "doc_lang_mismatch",
    oracle=(
        "WITH l AS (\n" + _LANG_ID_ORACLE + "\n)\n"
        "SELECT doc_id, labeled_lang, predicted_lang, best_score\n"
        "FROM l\n"
        "WHERE predicted_lang <> labeled_lang AND best_score >= 1"
    ),
)
def doc_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level language-label disagreements: documents whose
    marker-lexicon prediction contradicts the stored label with at least
    one marker hit — the relabel/review queue behind the aggregate
    ``lang_confusion_matrix`` (the matrix sizes the problem; this lists
    the rows to fix).  Zero-score docs are excluded: no evidence is not
    a disagreement.

    Composes the registered ``lang_id`` operator (same scoring
    expression, same lexicographic argmax tiebreak on both engines) and
    filters — map-only, no shuffle."""
    scored = lang_id(spark, sf_dir)
    return scored.where(
        (F.col("predicted_lang") != F.col("labeled_lang"))
        & (F.col("best_score") >= 1)
    )


@register(
    "doc_ttr",
    oracle="""
    WITH words AS (
        SELECT doc_id, w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)          AS n_tokens,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_types,
           CAST(COUNT(DISTINCT w) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)    AS ttr
    FROM words GROUP BY doc_id
    """,
)
def doc_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document type-token ratio (lexical diversity): distinct words
    over total words — the Gopher-rule companion to
    ``repetition_score`` (repetition counts duplicated n-grams; TTR
    catches the complementary failure of a tiny vocabulary stretched
    over a long document, e.g. keyword stuffing).

    One doc-keyed count/count-distinct aggregate over the token
    explode; TTR is an exact integer ratio, unrounded."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    words = d.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    return words.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("n_types"),
        (
            F.countDistinct("w").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("ttr"),
    )


# --------------------------------------------------------------------------
# quality metrics rolled up by length bucket
# --------------------------------------------------------------------------

QUALITY_LEN_BUCKET = 500


@register(
    "quality_by_length_bucket",
    oracle=f"""
    WITH scored AS (
        SELECT CAST(length(text) AS BIGINT) // {QUALITY_LEN_BUCKET}
                   AS len_bucket,
               CAST(ROUND((length(text) - len(string_split(text, ' ')) + 1)
                          * 1000000.0 / len(string_split(text, ' ')), 0)
                   AS BIGINT) AS atl6,
               CASE WHEN len(string_split(text, ' ')) >= 20
                     AND (length(text) - len(string_split(text, ' ')) + 1)
                         * 1.0 / len(string_split(text, ' '))
                         BETWEEN 2 AND 12
                    THEN 1 ELSE 0 END AS passes
        FROM documents WHERE text IS NOT NULL
    )
    SELECT len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(passes) AS BIGINT) AS n_pass,
           CAST(SUM(passes) AS DOUBLE) / COUNT(*) AS pass_rate,
           ROUND(CAST(SUM(atl6) AS BIGINT)
                 / (COUNT(*) * 1000000.0), 6) AS mean_avg_token_len
    FROM scored
    GROUP BY len_bucket
    ORDER BY len_bucket
    """,
)
def quality_by_length_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality gate's pass rate and mean token length per
    {QUALITY_LEN_BUCKET}-char length bucket — the calibration view for
    the gate itself: a pass rate cratering in one length band means the
    thresholds encode a length bias, not a quality judgment.

    Shape: one map-side projection (the ``quality_score`` features) and
    a length-bounded rollup.  Parity: the bucket key is integer
    division of the exact char count; per-doc mean token length is
    fixed-pointed ×1e6 to BIGINT at birth (averaging raw division
    doubles would be summation-order territory), summed in integer
    space, divided once; pass_rate is an exact integer ratio."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    n_tokens = F.size(F.split("text", " "))
    n_chars = F.length("text")
    avg_tok = (n_chars - n_tokens + 1) * F.lit(1.0) / n_tokens
    scored = d.select(
        F.expr(
            f"CAST(length(text) AS BIGINT) div {QUALITY_LEN_BUCKET}"
        ).alias("len_bucket"),
        F.round(avg_tok * 1000000, 0).cast("long").alias("atl6"),
        F.when((n_tokens >= 20) & avg_tok.between(2, 12), 1)
        .otherwise(0)
        .alias("passes"),
    )
    from googlecloudstorage_blueprints_spark.functions.frames import (
        sort_bounded,
    )

    return sort_bounded(
        scored.groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("passes").cast("long").alias("n_pass"),
            F.round(
                F.sum("atl6").cast("double")
                / (F.count(F.lit(1)) * F.lit(1000000.0)),
                6,
            ).alias("mean_avg_token_len"),
        )
        .select(
            "len_bucket",
            "n_docs",
            "n_pass",
            (F.col("n_pass").cast("double") / F.col("n_docs")).alias(
                "pass_rate"
            ),
            "mean_avg_token_len",
        ),
        "len_bucket",
    )


quality_by_length_bucket.__doc__ = quality_by_length_bucket.__doc__.format(
    QUALITY_LEN_BUCKET=QUALITY_LEN_BUCKET
)


# --------------------------------------------------------------------------
# zlib compression-ratio screen (repetitiveness beyond n-gram stats)
# --------------------------------------------------------------------------

COMPRESS_LEVEL = 6          # zlib default — fixed so ratios are stable
HIGH_COMPRESS_RATIO = 0.30  # below this a doc is template/repetitive


@register("doc_compression_ratio", oracle=None)
def doc_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source zlib compression-ratio profile — the classic
    repetitiveness filter (Gopher-family pipelines gate on it):
    compressed/raw byte ratio is a MODEL-FREE redundancy score that
    catches templating and near-loops that token-level stats
    (``repetition_score``, ``dup_ngram_fraction``) can miss because the
    repeating unit is long or misaligned with token boundaries.

    Shape: one Arrow-batched mapInPandas kernel (zlib is stdlib —
    vectorized per batch, never row-at-a-time Python UDF) over a
    repartitioned scan (the one-row-group fixture trap: Python kernels
    must not serialize on a single task), then a |sources|-row rollup
    with the mean ratio as an exact-integer fixed-point division.
    Rows-only by contract (no SQL zlib); planted pins: a pathological
    repeated string compresses below the gate, unique-ish text doesn't
    (tests/test_new_ops_r10c.py)."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )

    def kernel(batches):
        import zlib

        for pdf in batches:
            if pdf.empty:
                continue
            raw = pdf["text"].str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            n_comp = raw.map(
                lambda b: len(zlib.compress(b, COMPRESS_LEVEL))
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "source": pdf["source"],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                }
            )

    # Round-robin repartition, NOT by "source": keying here would cap
    # the zlib kernel's parallelism at |distinct sources| (a handful),
    # and the downstream groupBy("source") reshuffles anyway (r10
    # ADVICE).  The kernel is per-row, so any partitioning is correct —
    # and a multi-split cluster input already arrives parallel, so the
    # shuffle is paid only when the scan undershoots the core count
    # (the one-row-group fixture trap; same conditional as
    # table_column_digest, r17).
    src = d.select("source", "text")
    par = spark.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    scored = src.mapInPandas(
        kernel, schema="source string, n_bytes long, n_compressed long"
    )
    # ratio6 per doc as an exact ×1e6 integer (order-independent sums)
    ratio6 = F.expr("(n_compressed * 1000000) div n_bytes")
    high = F.when(
        ratio6 < int(HIGH_COMPRESS_RATIO * 1_000_000), 1
    ).otherwise(0)
    return sort_bounded(
        scored.where(F.col("n_bytes") > 0)
        .select("source", ratio6.alias("r6"), high.alias("hc"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (
                F.expr("sum(r6) div count(*)").cast("double") / 1e6
            ).alias("mean_compress_ratio"),
            F.sum("hc").cast("long").alias("n_high_compress"),
            (F.sum("hc").cast("double") / F.count(F.lit(1))).alias(
                "high_compress_share"
            ),
        ),
        "source",
    )


# ---------------------------------------------------------------------------
# tokenizer fertility by language (r11 wave 3)
# ---------------------------------------------------------------------------

@register(
    "tokenizer_fertility_by_lang",
    oracle="""
    WITH per AS (
        SELECT lang, source,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))
                    AS BIGINT) AS bpe_tokens
        FROM documents WHERE text IS NOT NULL
    )
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT)         AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)     AS sum_chars,
           CAST(SUM(ws_tokens) AS BIGINT)   AS sum_ws_tokens,
           CAST(SUM(bpe_tokens) AS BIGINT)  AS sum_bpe_tokens,
           CAST(SUM(n_chars) AS DOUBLE)
               / NULLIF(SUM(bpe_tokens), 0) AS chars_per_bpe_token,
           CAST(SUM(bpe_tokens) AS DOUBLE)
               / NULLIF(SUM(ws_tokens), 0)  AS bpe_per_ws_token
    FROM per
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer-fertility planning table: chars-per-token and
    BPE-ish-tokens-per-word per (lang, source) cell — the
    cost-per-character dial a multilingual token budget needs (a
    high-fertility language pays more tokens for the same text, so a
    char-based mixture underweights it), complementing ``token_count``
    (per-doc counts, no lang dimension) and
    ``source_token_budget_split`` (allocates, doesn't measure).

    Shape: token counting stays inside the scan projection (JVM
    regexp_extract_all codegen, the ``token_count`` convention cited
    there), one (lang, source)-bounded aggregate.  Parity: the regex
    stays in the Java/RE2-shared subset (r6 rule); sums exact BIGINT;
    both ratios unrounded exact-integer ratios, NULLIF-guarded for
    all-empty-text cells identically on both engines."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    per = d.select(
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
        .cast("long")
        .alias("bpe_tokens"),
    )
    return sort_bounded(
        per.groupBy("lang", "source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("ws_tokens").cast("long").alias("sum_ws_tokens"),
            F.sum("bpe_tokens").cast("long").alias("sum_bpe_tokens"),
            (
                F.sum("n_chars").cast("double")
                / F.nullif(F.sum("bpe_tokens"), F.lit(0))
            ).alias("chars_per_bpe_token"),
            (
                F.sum("bpe_tokens").cast("double")
                / F.nullif(F.sum("ws_tokens"), F.lit(0))
            ).alias("bpe_per_ws_token"),
        ),
        "lang",
        "source",
    )
