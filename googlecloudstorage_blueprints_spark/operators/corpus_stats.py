"""Corpus-distribution statistics over the ``documents`` table.

Training-data curation reads distribution summaries before touching any
document: Zipf slope (is this source natural language or boilerplate?),
per-source KL divergence against the corpus unigram model (is one crawl
lexically alien?), character-class composition, length outliers, and a
canonical normalize→fingerprint pass.  Everything is codegen'd JVM
expressions — split/explode/regexp/agg — over one or two shuffles keyed
on (source) or (source, word); no Python in any hot path.  The reference
has no text surface (SURVEY §2.A.4); these extend §2.B's text family.

Parity notes (conventions from operators/relational.py + the repo build docs):
ln()/sqrt() doubles round 6dp before output; means/variances use the
SAME explicit sum formula on both engines instead of each engine's
streaming aggregate; exact-integer ratios stay unrounded; regex patterns
stay inside the Java/RE2-shared subset and DuckDB regexp_replace gets
the 'g' flag to match Spark's replace-all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

# rank cutoff for the Zipf regression: deep-tail ranks are count-1 ties
# that flatten the fit; 500 covers the head on every fixture SF
ZIPF_TOP_RANKS = 500

# |z| threshold for length outliers (rounded z on both engines)
OUTLIER_Z = 1.5


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, word) token stream — explode_outer so the computed split
    array is built once post-shuffle (see verify SKILL: explode's
    implicit size()>0 filter re-runs the array expression)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    return (
        d.select("source", F.explode_outer(F.split("text", " ")).alias("w"))
        .where(F.col("w").isNotNull() & (F.col("w") != ""))
    )


@register(
    "word_zipf_slope",
    oracle=f"""
    WITH words AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT source, w, COUNT(*) AS cnt
        FROM words WHERE w <> ''
        GROUP BY source, w
    ),
    ranked AS (
        SELECT source,
               ROUND(LN(CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY cnt DESC, w)
                   AS DOUBLE)), 6) AS x,
               ROUND(LN(CAST(cnt AS DOUBLE)), 6) AS y
        FROM counts
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY cnt DESC, w) <= {ZIPF_TOP_RANKS}
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_ranks,
           ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6)
               AS zipf_slope
    FROM ranked
    GROUP BY source
    HAVING COUNT(*) >= 2
    ORDER BY source
    """,
)
def word_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law exponent per source: OLS slope of ln(freq) on ln(rank)
    over the top word ranks.  Natural language sits near −1; templated
    or machine-generated sources drift toward 0 (flat head) — a one-scan
    source-quality screen (Gopher/C4-style curation uses exactly this
    family of distribution checks).

    Shape: one (source, word) count aggregate, a per-source row_number
    window on the bounded count frame, then a |sources|-row regression
    aggregate.  The slope is the explicit OLS sum formula — NOT each
    engine's regr_slope, whose internal accumulation orders differ —
    with ln() inputs pre-rounded 6dp (JVM StrictMath vs libm last-ulp)
    and the final ratio rounded 6dp for summation-order drift.  Sources
    with a single ranked word are dropped (HAVING n >= 2 on both
    engines): a one-point fit has a zero OLS denominator, where Spark's
    non-ANSI double division yields NULL but DuckDB's IEEE division
    yields inf — a cross-engine parity trap, and a slope needs two
    points anyway."""
    counts = _words(spark, sf_dir).groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("w")
    )
    ranked = (
        counts.select(
            "source",
            F.row_number().over(w_rank).alias("r"),
            "cnt",
        )
        .where(F.col("r") <= ZIPF_TOP_RANKS)
        .select(
            "source",
            F.round(F.log(F.col("r").cast("double")), 6).alias("x"),
            F.round(F.log(F.col("cnt").cast("double")), 6).alias("y"),
        )
    )
    n = F.count(F.lit(1))
    sx = F.sum("x")
    sy = F.sum("y")
    sxy = F.sum(F.col("x") * F.col("y"))
    sxx = F.sum(F.col("x") * F.col("x"))
    return (
        ranked.groupBy("source")
        .agg(
            n.cast("long").alias("n_ranks"),
            F.round(
                (n * sxy - sx * sy) / (n * sxx - sx * sx), 6
            ).alias("zipf_slope"),
        )
        .where(F.col("n_ranks") >= 2)
        .orderBy("source")
    )


@register(
    "source_unigram_kl",
    oracle="""
    WITH words AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    sw AS (
        SELECT source, w, COUNT(*) AS cnt
        FROM words WHERE w <> ''
        GROUP BY source, w
    ),
    s_tot AS (SELECT source, SUM(cnt) AS tot_s FROM sw GROUP BY source),
    c AS (SELECT w, SUM(cnt) AS cnt_w FROM sw GROUP BY w),
    t AS (SELECT SUM(cnt_w) AS tot FROM c)
    SELECT sw.source,
           CAST(s_tot.tot_s AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(sw.cnt * CAST(ROUND(LN(
                   (CAST(sw.cnt AS DOUBLE) / CAST(s_tot.tot_s AS DOUBLE))
                   / (CAST(c.cnt_w AS DOUBLE) / CAST(t.tot AS DOUBLE))
                 ) * 1000000, 0) AS BIGINT)) AS BIGINT)
                 / CAST(s_tot.tot_s AS DOUBLE) / 1000000.0, 6)
               AS kl_vs_corpus
    FROM sw
    JOIN s_tot ON s_tot.source = sw.source
    JOIN c     ON c.w = sw.w
    CROSS JOIN t
    GROUP BY sw.source, s_tot.tot_s
    ORDER BY sw.source
    """,
)
def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over word unigrams: how lexically alien each
    source is relative to the pooled distribution — the standard
    domain-shift screen before mixing sources into a training run.
    Source vocabularies are subsets of the corpus vocabulary by
    construction, so q(w) > 0 whenever p(w) > 0 and no smoothing term
    is needed.

    Shape: ONE (source, word) count aggregate feeds three consumers
    (per-source totals, corpus word counts re-aggregated from the same
    frame, and the scoring join) — persisted, eagerly materialized,
    unpersisted (repo persist-hygiene rule).  The corpus total is a
    1-row broadcast crossJoin; the word-keyed join fans out at most
    |sources| per word.  Parity: p and q are exact integer ratios
    (identical doubles); each ln(p/q) is scaled ×1e6 and rounded to
    BIGINT per TERM, weighted by the INTEGER count and summed exactly
    (r7 fixed-point rule — the pre-r8 ROUND(SUM(rounded doubles), 6)
    form was order-sensitive in the last ulp WITHIN one engine, the
    events_decay_trend flake class); one closing division.  Scale:
    Σ cnt·|ln·1e6| ≤ tot_s·2e7 stays in BIGINT below ~4e11 tokens per
    source."""
    sw = (
        _words(spark, sf_dir)
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    s_tot = sw.groupBy("source").agg(F.sum("cnt").alias("tot_s"))
    c = sw.groupBy("w").agg(F.sum("cnt").alias("cnt_w"))
    t = c.agg(F.sum("cnt_w").alias("tot"))
    p = F.col("cnt").cast("double") / F.col("tot_s").cast("double")
    q = F.col("cnt_w").cast("double") / F.col("tot").cast("double")
    lnint = F.round(F.log(p / q) * 1_000_000, 0).cast("long")
    out = (
        sw.join(F.broadcast(s_tot), "source")
        .join(c, "w")
        .crossJoin(F.broadcast(t))
        .groupBy("source", "tot_s")
        .agg(
            F.round(
                F.sum(F.col("cnt") * lnint).cast("double")
                / F.col("tot_s").cast("double")
                / 1_000_000.0,
                6,
            ).alias("kl_vs_corpus")
        )
        .select(
            "source",
            F.col("tot_s").cast("long").alias("n_tokens"),
            "kl_vs_corpus",
        )
        .orderBy("source")
        .persist()
    )
    out.count()  # materialize through the cached word-count frame
    sw.unpersist()
    return out


@register(
    "char_class_profile",
    oracle="""
    SELECT source,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
           CAST(SUM(LENGTH(regexp_replace(text, '[^a-z]', '', 'g')))
                AS BIGINT)                   AS alpha_chars,
           CAST(SUM(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')))
                AS BIGINT)                   AS digit_chars,
           CAST(SUM(LENGTH(regexp_replace(text, '[^ ]', '', 'g')))
                AS BIGINT)                   AS space_chars,
           CAST(SUM(LENGTH(text)) AS DOUBLE)
               / CAST(NULLIF(
                   SUM(LENGTH(regexp_replace(text, '[^a-z]', '', 'g'))), 0)
                      AS DOUBLE)             AS chars_per_alpha
    FROM documents
    WHERE text IS NOT NULL
    GROUP BY source
    ORDER BY source
    """,
)
def char_class_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source: total/alpha/digit/space
    char counts and the chars-per-alpha dilution ratio — the C4-style
    "is this prose or a symbol dump" screen, one codegen scan.

    The class counters are negated-class regexp_replace + length (the
    Java/RE2-shared subset; DuckDB needs the 'g' flag to match Spark's
    replace-all).  All counts are exact bigints; the ratio is one IEEE
    division of exact integers — unrounded by the exact-ratio rule.
    The alpha denominator is NULLIF-guarded identically on both engines:
    a source with zero a-z characters would otherwise split NULL
    (Spark, non-ANSI division) vs inf (DuckDB IEEE division)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )

    def n_of(pat: str):
        return F.length(F.regexp_replace("text", pat, ""))

    return (
        d.groupBy("source")
        .agg(
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(n_of("[^a-z]")).cast("long").alias("alpha_chars"),
            F.sum(n_of("[^0-9]")).cast("long").alias("digit_chars"),
            F.sum(n_of("[^ ]")).cast("long").alias("space_chars"),
            (
                F.sum(F.length("text")).cast("double")
                / F.nullif(F.sum(n_of("[^a-z]")), F.lit(0)).cast("double")
            ).alias("chars_per_alpha"),
        )
        .select(
            "source",
            F.col("total_chars").cast("long").alias("total_chars"),
            "alpha_chars",
            "digit_chars",
            "space_chars",
            "chars_per_alpha",
        )
        .orderBy("source")
    )


@register(
    "length_outlier_zscore",
    oracle=f"""
    WITH stats AS (
        SELECT source,
               CAST(COUNT(*) AS DOUBLE)                  AS n,
               CAST(SUM(n_chars) AS DOUBLE)              AS s,
               CAST(SUM(n_chars * n_chars) AS DOUBLE)    AS q
        FROM documents
        GROUP BY source
    )
    SELECT d.doc_id, d.source, d.n_chars,
           ROUND((CAST(d.n_chars AS DOUBLE) - st.s / st.n)
                 / SQRT((st.q - st.s * st.s / st.n)
                        / NULLIF(st.n - 1, 0)), 6)
               AS z
    FROM documents d JOIN stats st ON st.source = d.source
    WHERE ABS(ROUND((CAST(d.n_chars AS DOUBLE) - st.s / st.n)
                    / SQRT((st.q - st.s * st.s / st.n)
                           / NULLIF(st.n - 1, 0)), 6))
          > {OUTLIER_Z}
    """,
)
def length_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length outliers: documents whose char count sits more
    than {z} rounded standard deviations from their source's mean — the
    truncation/concatenation-artifact detector curation runs before
    dedup (an 800 KB doc inside a tweet source is a scrape bug, not
    data).

    Shape: a |sources|-row moment aggregate (count, Σx, Σx² — all exact
    integers) broadcast-joined back onto the scan; no second pass, no
    window.  Parity: mean and stddev are derived from exact integer
    sums via the SAME expression text on both engines, so z is
    deterministic; it is still rounded 6dp before BOTH the filter and
    the output (rounded-before-filter rule)."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("n_chars").cast("double").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("double").alias(
            "q"
        ),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / F.nullif(
        F.col("n") - F.lit(1.0), F.lit(0.0)
    )
    z = F.round(
        (F.col("n_chars").cast("double") - mean) / F.sqrt(var), 6
    )
    return (
        d.join(F.broadcast(stats), "source")
        .select("doc_id", "source", "n_chars", z.alias("z"))
        .where(F.abs(F.col("z")) > OUTLIER_Z)
    )


length_outlier_zscore.__doc__ = length_outlier_zscore.__doc__.format(
    z=OUTLIER_Z
)


@register(
    "text_normalize_fingerprint",
    oracle="""
    SELECT doc_id,
           CAST(LENGTH(TRIM(regexp_replace(regexp_replace(
               translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                               'abcdefghijklmnopqrstuvwxyz'),
               '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g')))
               AS BIGINT) AS n_norm_chars,
           md5(TRIM(regexp_replace(regexp_replace(
               translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                               'abcdefghijklmnopqrstuvwxyz'),
               '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g')))
               AS fp
    FROM documents
    WHERE text IS NOT NULL
    """,
)
def text_normalize_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical normalize→fingerprint pass: lowercase, map every
    non-alphanumeric to space, collapse runs of spaces, trim, md5 — the
    normalization layer every exact-dedup pipeline keys on (cf.
    ``exact_dedup`` hashes raw text; this is the forgiving variant that
    ignores case/punct/whitespace differences).

    One codegen scan, no shuffle: regexp_replace chains and md5 are all
    JVM builtins.  The patterns are the Java/RE2-shared subset ('  +'
    rather than a lookaround; 'g' flag on the DuckDB side); md5 hex is
    lowercase on both engines.

    Case folding is ASCII translate(), NOT lower() (unicode audit,
    r18): engine lower() semantics diverge on special-casing letters —
    JVM lower('İ') is 'i'+U+0307 (full mapping, two code points) while
    DuckDB's is plain 'i' (simple folding) — which flipped this op's
    fingerprint and token count on a planted Turkish doc.  Since the
    fingerprint alphabet is [a-z0-9 ] anyway, non-ASCII letters
    normalize to space regardless of case, so ASCII-only folding is
    both cross-engine-exact and semantics-identical on ASCII input.
    NEW-OP RULE: lower()/upper() whose OUTPUT feeds a hash, join key,
    or emitted column must be spelled as ASCII translate() on both
    engines (or the op must planted-pin the İ/ß divergence away)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    folded = F.translate(
        "text",
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "abcdefghijklmnopqrstuvwxyz",
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(folded, "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    return d.select(
        "doc_id",
        F.length(norm).cast("long").alias("n_norm_chars"),
        F.md5(norm).alias("fp"),
    )


# checkpoints for the vocabulary coverage curve; the largest bounds the
# only non-map-side frame the op keeps (TakeOrdered top-K, never the vocab)
COVERAGE_KS = [10, 100, 1000, 10000]


@register(
    "ngram_coverage_curve",
    oracle=f"""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT w, COUNT(*) AS cnt FROM words WHERE w <> '' GROUP BY w
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT)  AS total_tokens,
               CAST(COUNT(*) AS BIGINT)  AS vocab_size
        FROM counts
    ),
    ranked AS (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS r
        FROM counts
        QUALIFY r <= {max(COVERAGE_KS)}
    ),
    ks AS (SELECT unnest({COVERAGE_KS}) AS k)
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST(SUM(CASE WHEN ranked.r <= ks.k THEN ranked.cnt
                         ELSE 0 END) AS BIGINT) AS covered_tokens,
           tot.total_tokens,
           tot.vocab_size,
           CAST(SUM(CASE WHEN ranked.r <= ks.k THEN ranked.cnt
                         ELSE 0 END) AS DOUBLE)
               / CAST(tot.total_tokens AS DOUBLE) AS coverage
    FROM ranked CROSS JOIN ks CROSS JOIN tot
    GROUP BY ks.k, tot.total_tokens, tot.vocab_size
    ORDER BY k
    """,
)
def ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the fraction of all token occurrences
    covered by the top-K words at K ∈ {ks} — the table a tokenizer
    budget is sized from (how much of the corpus does a 10k vocab
    actually cover?) and the Zipf-head companion to ``word_zipf_slope``.

    Shape: one pooled word-count aggregate, a 1-row total broadcast,
    then TakeOrderedAndProject cuts the top-{kmax} BEFORE any window —
    the rank runs on that literal-bounded frame (the vocab itself never
    sees a global window; the ``global_row_number`` decomposition
    argument).  The |ks|× fan-out and conditional sums reduce to
    {nks} rows.  Parity: coverage is an exact integer ratio, unrounded;
    (cnt DESC, w) is the total order on both engines."""
    kmax = max(COVERAGE_KS)
    counts = _words(spark, sf_dir).groupBy("w").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = counts.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    head = counts.orderBy(F.col("cnt").desc(), "w").limit(kmax)
    ranked = head.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), "w"))
        .alias("r"),
    )
    ks = F.explode(F.array(*[F.lit(k) for k in COVERAGE_KS])).alias("k")
    covered = F.sum(
        F.when(F.col("r") <= F.col("k"), F.col("cnt")).otherwise(0)
    )
    return (
        ranked.select("cnt", "r", ks)
        .crossJoin(F.broadcast(tot))
        .groupBy("k", "total_tokens", "vocab_size")
        .agg(covered.cast("long").alias("covered_tokens"))
        .select(
            F.col("k").cast("long").alias("k"),
            "covered_tokens",
            "total_tokens",
            "vocab_size",
            (
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("coverage"),
        )
        .transform(sort_bounded, "k")
    )


ngram_coverage_curve.__doc__ = ngram_coverage_curve.__doc__.format(
    ks=COVERAGE_KS, kmax=max(COVERAGE_KS), nks=len(COVERAGE_KS)
)


@register(
    "token_length_histogram",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    lens AS (
        SELECT LENGTH(w) AS token_len FROM words WHERE w <> ''
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM lens)
    SELECT CAST(token_len AS BIGINT) AS token_len,
           CAST(COUNT(*) AS BIGINT)  AS n,
           CAST(COUNT(*) AS DOUBLE) / CAST(tot.total AS DOUBLE) AS share
    FROM lens CROSS JOIN tot
    GROUP BY token_len, tot.total
    ORDER BY token_len
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token length distribution over the pooled corpus — the subword
    budget estimator (mean piece length drives tokens-per-byte, and a
    heavy long-token tail flags URLs/base64 that inflate any
    whitespace-based token count).

    Shape: map-side explode → length, one aggregate keyed on the
    ≤|max token length| domain, a 1-row total broadcast.  Parity: share
    is an exact integer ratio, unrounded; all else integer."""
    lens = _words(spark, sf_dir).select(
        F.length("w").cast("long").alias("token_len")
    )
    tot = lens.agg(F.count(F.lit(1)).cast("long").alias("total"))
    return (
        lens.groupBy("token_len")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "token_len",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .transform(sort_bounded, "token_len")
    )


# robust-z threshold (the classic 3.5 from Iglewicz–Hoaglin)
MAD_ROBUST_Z = 3.5


@register(
    "length_outlier_mad",
    oracle=f"""
    WITH med AS (
        SELECT source, quantile_cont(n_chars, 0.5) AS med
        FROM documents GROUP BY source
    ),
    dev AS (
        SELECT d.doc_id, d.source, d.n_chars,
               ABS(CAST(d.n_chars AS DOUBLE) - med.med) AS adev,
               med.med
        FROM documents d JOIN med ON med.source = d.source
    ),
    mad AS (
        SELECT source, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY source
    )
    SELECT dev.doc_id, dev.source,
           CAST(dev.n_chars AS BIGINT) AS n_chars,
           ROUND(0.6745 * (CAST(dev.n_chars AS DOUBLE) - dev.med)
                 / NULLIF(mad.mad, 0), 6) AS robust_z
    FROM dev JOIN mad ON mad.source = dev.source
    WHERE ABS(ROUND(0.6745 * (CAST(dev.n_chars AS DOUBLE) - dev.med)
                    / NULLIF(mad.mad, 0), 6)) > {MAD_ROBUST_Z}
    """,
)
def length_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source length outliers via the median/MAD z-score
    (|0.6745·(x−med)/MAD| > {z}) — the screen that survives what breaks
    ``length_outlier_zscore``: one 800 MB scrape artifact inflates a
    mean/stddev enough to hide itself, but cannot move a median.

    Shape: two |sources|-row percentile aggregates (median, then median
    absolute deviation) each broadcast back onto the scan — two joins,
    no window over data.  Exact interpolated percentiles of integers
    are deterministic halves on both engines; the robust z is one chain
    of identical IEEE ops rounded 6dp before BOTH the filter and the
    output; MAD=0 sources (≥ half identical lengths) are NULLIF-guarded
    identically — NULL z fails the threshold on both engines, avoiding
    the NULL-vs-inf division divergence (round-7 advice rule)."""
    d = load_table(spark, sf_dir, "documents")
    med = d.groupBy("source").agg(
        F.percentile("n_chars", 0.5).alias("med")
    )
    dev = d.join(F.broadcast(med), "source").select(
        "doc_id",
        "source",
        "n_chars",
        "med",
        F.abs(F.col("n_chars").cast("double") - F.col("med")).alias(
            "adev"
        ),
    )
    mad = dev.groupBy("source").agg(
        F.percentile("adev", 0.5).alias("mad")
    )
    rz = F.round(
        F.lit(0.6745)
        * (F.col("n_chars").cast("double") - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0)),
        6,
    )
    return (
        dev.join(F.broadcast(mad), "source")
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            rz.alias("robust_z"),
        )
        .where(F.abs(F.col("robust_z")) > MAD_ROBUST_Z)
    )


length_outlier_mad.__doc__ = length_outlier_mad.__doc__.format(
    z=MAD_ROBUST_Z
)


@register(
    "lang_source_chisq",
    oracle="""
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
        GROUP BY lang, source
    ),
    rl AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rn FROM cells
           GROUP BY lang),
    cs AS (SELECT source, CAST(SUM(o) AS BIGINT) AS cn FROM cells
           GROUP BY source),
    t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
    terms AS (
        SELECT CAST(ROUND(
            POW(CAST(cells.o AS DOUBLE)
                - CAST(rl.rn AS DOUBLE) * CAST(cs.cn AS DOUBLE)
                  / CAST(t.n AS DOUBLE), 2)
            / (CAST(rl.rn AS DOUBLE) * CAST(cs.cn AS DOUBLE)
               / CAST(t.n AS DOUBLE))
            * 1000000, 0) AS BIGINT) AS t6
        FROM cells
        JOIN rl ON rl.lang = cells.lang
        JOIN cs ON cs.source = cells.source
        CROSS JOIN t
    )
    SELECT CAST((SELECT COUNT(*) FROM rl) AS BIGINT)    AS n_langs,
           CAST((SELECT COUNT(*) FROM cs) AS BIGINT)    AS n_sources,
           CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_cells,
           CAST(((SELECT COUNT(*) FROM rl) - 1)
                * ((SELECT COUNT(*) FROM cs) - 1) AS BIGINT) AS dof,
           ROUND(CAST(CAST(SUM(t6) AS BIGINT) AS DOUBLE)
                 / 1000000.0, 6) AS chi2
    FROM terms
    """,
)
def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence statistic between the lang and source columns —
    the composition-drift alarm: if language mix varies strongly by
    source (large χ² vs the (|langs|−1)(|sources|−1) dof), per-source
    curation thresholds tuned on the pooled corpus are miscalibrated.

    Shape: one |langs|×|sources|-cell contingency aggregate; marginals
    re-aggregate from the cells; everything after the first aggregate
    is ≤100 rows.  Parity: expected counts are exact-integer-ratio
    doubles (identical both engines); each cell's (o−e)²/e term is
    scaled 1e6 and rounded to BIGINT before summation (the fixed-point
    rule: integer sums are order-independent where double sums flake in
    the last ulp), and the statistic divides identical integers.
    NULL lang/source rows are un-categorizable — dropped from the
    contingency table on BOTH engines (null-catalog audit, r18:
    Spark's countDistinct ignores the NULL category the oracle's
    group-count rows kept)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("o")
    )
    rl = cells.groupBy("lang").agg(F.sum("o").alias("rn"))
    cs = cells.groupBy("source").agg(F.sum("o").alias("cn"))
    t = cells.agg(F.sum("o").alias("n"))
    e = (
        F.col("rn").cast("double")
        * F.col("cn").cast("double")
        / F.col("n").cast("double")
    )
    t6 = F.round(
        F.pow(F.col("o").cast("double") - e, 2) / e * 1000000, 0
    ).cast("long")
    terms = (
        cells.join(F.broadcast(rl), "lang")
        .join(F.broadcast(cs), "source")
        .crossJoin(F.broadcast(t))
        .select(
            t6.alias("t6"),
            "lang",
            "source",
        )
    )
    n_langs = F.countDistinct("lang")
    n_sources = F.countDistinct("source")
    return terms.agg(
        n_langs.cast("long").alias("n_langs"),
        n_sources.cast("long").alias("n_sources"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        ((n_langs - 1) * (n_sources - 1)).cast("long").alias("dof"),
        F.round(F.sum("t6").cast("double") / 1000000.0, 6).alias(
            "chi2"
        ),
    )


def _scorecard_oracle() -> str:
    from googlecloudstorage_blueprints_spark.operators import REGISTRY

    zipf_sql = REGISTRY["word_zipf_slope"].oracle
    kl_sql = REGISTRY["source_unigram_kl"].oracle
    chars_sql = REGISTRY["char_class_profile"].oracle
    return f"""
    WITH z AS ({zipf_sql}),
    k AS ({kl_sql}),
    c AS ({chars_sql})
    SELECT c.source,
           k.n_tokens,
           z.zipf_slope,
           k.kl_vs_corpus,
           c.chars_per_alpha,
           CAST(c.digit_chars AS DOUBLE)
               / CAST(c.total_chars AS DOUBLE) AS digit_share
    FROM c
    JOIN k ON k.source = c.source
    LEFT JOIN z ON z.source = c.source
    ORDER BY c.source
    """


@register("source_quality_scorecard", oracle=_scorecard_oracle())
def source_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per source joining the three distribution screens —
    Zipf slope (natural language vs template), unigram KL (lexical
    drift from the pooled corpus), character-class dilution and digit
    share — the scorecard a curation run actually reviews, instead of
    three separate reports.  Sources too small for a Zipf fit (n < 2
    ranks) carry a NULL slope by the zipf op's guard, preserved through
    the LEFT join on both engines.

    Composes the registered operators (identical expressions on both
    engines by construction); all joins are |sources|-row broadcasts;
    digit_share is an exact integer ratio, unrounded."""
    z = word_zipf_slope(spark, sf_dir).select("source", "zipf_slope")
    k = source_unigram_kl(spark, sf_dir)
    c = char_class_profile(spark, sf_dir)
    out = (
        c.join(F.broadcast(k), "source")
        .join(F.broadcast(z), "source", "left")
        .select(
            "source",
            "n_tokens",
            "zipf_slope",
            "kl_vs_corpus",
            "chars_per_alpha",
            (
                F.col("digit_chars").cast("double")
                / F.col("total_chars").cast("double")
            ).alias("digit_share"),
        )
        .orderBy("source")
        .persist()
    )
    out.count()  # materialize through the KL op's cached word counts
    k.unpersist()
    return out


# closed-class function words for the stopword density screen — a FIXED
# list shared verbatim by both engines (never an engine/library list,
# whose contents would differ)
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "as", "at", "by", "it", "that", "this", "be", "are",
)
_STOP_IN = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "stopword_ratio_by_source",
    oracle=f"""
    WITH words AS (
        SELECT source, lower(unnest(string_split(text, ' '))) AS w
        FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN w IN {_STOP_IN} THEN 1 ELSE 0 END)
                AS BIGINT)          AS n_stopwords,
           CAST(SUM(CASE WHEN w IN {_STOP_IN} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS stopword_ratio
    FROM words WHERE w <> ''
    GROUP BY source
    ORDER BY source
    """,
)
def stopword_ratio_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Function-word density per source — the cheapest
    natural-language-ness screen in the quality stack: English prose
    sits near 0.3-0.4 stopword share, while code, tables, tag soup and
    keyword-stuffed spam sit far below (quality_score uses the same
    signal per document; this is the source-level calibration view).

    Shape: map-side explode → one aggregate keyed on |sources|; the
    stopword membership test is a 20-literal IN list evaluated in
    codegen — no join, no broadcast.  Parity: both engines test
    lower(w) against the IDENTICAL literal list; stopword_ratio is an
    exact integer ratio, unrounded."""
    w = _words(spark, sf_dir).select(
        "source", F.lower(F.col("w")).alias("w")
    )
    is_stop = F.col("w").isin(*STOPWORDS)
    return sort_bounded(
        w.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(is_stop, 1).otherwise(0)).cast("long").alias(
                "n_stopwords"
            ),
            (
                F.sum(F.when(is_stop, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("stopword_ratio"),
        ),
        "source",
    )


@register(
    "hapax_ratio_by_source",
    oracle="""
    WITH words AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM words WHERE w <> ''
        GROUP BY source, w
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS hapax_ratio
    FROM counts
    GROUP BY source
    ORDER BY source
    """,
)
def hapax_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena share of each source's vocabulary (words seen
    exactly once) — the lexical-productivity twin of word_zipf_slope:
    natural text runs ~0.4-0.6 hapax share, templated/boilerplate
    corpora collapse toward 0, and OCR/garbage noise pushes toward 1.

    Shape: the same (source, word)-keyed count aggregate the Zipf and
    KL ops shuffle on, then a |sources|-row reduction — hapaxness needs
    the exact per-word count, so the first shuffle is irreducible, but
    the second pass carries one row per distinct word, not per token.
    Parity: all-integer counts; hapax_ratio is an exact integer ratio,
    unrounded."""
    counts = _words(spark, sf_dir).groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return sort_bounded(
        counts.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
            (
                F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias("hapax_ratio"),
        ),
        "source",
    )


@register(
    "bigram_entropy_by_source",
    oracle="""
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS a
        FROM documents
        WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT source,
               unnest(list_transform(range(1, len(a)), i -> a[i]))     AS w1,
               unnest(list_transform(range(1, len(a)), i -> a[i + 1])) AS w2
        FROM toks
    ),
    cb AS (
        SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM bg GROUP BY source, w1, w2
    ),
    tot AS (
        SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot_s
        FROM cb GROUP BY source
    )
    SELECT cb.source,
           tot.tot_s AS n_bigrams,
           ROUND(-CAST(SUM(cb.cnt * CAST(ROUND(LN(
                       CAST(cb.cnt AS DOUBLE) / tot.tot_s) * 1000000, 0)
                   AS BIGINT)) AS BIGINT)
                 / CAST(tot.tot_s AS DOUBLE) / 1000000.0, 6)
               AS bigram_entropy
    FROM cb JOIN tot ON tot.source = cb.source
    GROUP BY cb.source, tot.tot_s
    ORDER BY cb.source
    """,
)
def bigram_entropy_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shannon entropy (nats) of each source's bigram distribution —
    the sequence-level diversity screen word_zipf_slope can't see:
    templated text reuses the same word PAIRS (low bigram entropy even
    with a healthy unigram curve), natural prose does not.

    Shape: the r5 in-row arrays_zip bigram build (no token shuffle),
    one (source, w1, w2) count aggregate, per-source totals joined
    back, one entropy reduction per source.  Parity: p = cnt/tot is an
    exact integer ratio; ln(p) is scaled ×1e6 and rounded to BIGINT
    per TERM (r7 fixed-point rule — a ROUND(SUM(doubles)) here would be
    order-sensitive in the last ulp), the integer terms sum exactly,
    and ONE double division closes the sum.  Scale note: |term| ≤
    cnt·2e7, so the per-source sum stays in BIGINT while source token
    counts are < ~1e11."""
    d = load_table(spark, sf_dir, "documents")
    a = F.split("text", " ")
    pairs = F.arrays_zip(
        F.slice(a, 1, F.size(a) - 1), F.slice(a, 2, F.size(a) - 1)
    )
    bg = (
        d.where(F.col("text").isNotNull() & (F.size(a) >= 2))
        .select("source", F.explode_outer(pairs).alias("p"))
        .select("source", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
    )
    cb = bg.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = cb.groupBy("source").agg(F.sum("cnt").alias("tot_s"))
    term = F.col("cnt") * F.round(
        F.log(F.col("cnt").cast("double") / F.col("tot_s")) * 1_000_000,
        0,
    ).cast("long")
    return sort_bounded(
        cb.join(F.broadcast(tot), "source")
        .groupBy("source", "tot_s")
        .agg(
            (
                F.round(
                    -F.sum(term).cast("double")
                    / F.col("tot_s").cast("double")
                    / 1_000_000.0,
                    6,
                )
            ).alias("bigram_entropy")
        )
        .select(
            "source",
            F.col("tot_s").alias("n_bigrams"),
            "bigram_entropy",
        ),
        "source",
    )


@register(
    "simpson_diversity_by_source",
    oracle="""
    WITH counts AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
        GROUP BY source, w
    ),
    sums AS (
        SELECT source,
               CAST(SUM(cnt) AS BIGINT)       AS t,
               CAST(SUM(cnt * cnt) AS BIGINT) AS q
        FROM counts GROUP BY source
    )
    SELECT source,
           t AS n_tokens,
           1.0 - CAST(q AS DOUBLE) / (CAST(t AS DOUBLE) * t)
               AS simpson_diversity
    FROM sums
    ORDER BY source
    """,
)
def simpson_diversity_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Simpson diversity (1 − Σp²) of each source's unigram
    distribution — the collision-probability twin of
    bigram_entropy_by_source: 1 − the chance two random tokens match,
    maximally sensitive to a few dominating tokens (exactly the
    boilerplate signature entropy smooths over).

    Shape: the standard (source, word) count shuffle, then a
    |sources|-row moment reduction.  Parity: Σc and Σc² are exact
    BIGINTs, so the statistic is ONE double expression over exact
    integers — no rounding needed anywhere (the r7 fixed-point ideal:
    the integers never leave integer space until the final division).
    Scale note: Σc² stays in BIGINT while any single word's count in
    one source is < ~3e9 and the per-source sum of squares < ~9e18."""
    counts = _words(spark, sf_dir).groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    sums = counts.groupBy("source").agg(
        F.sum("cnt").alias("t"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("q"),
    )
    return sort_bounded(
        sums.select(
            "source",
            F.col("t").alias("n_tokens"),
            (
                F.lit(1.0)
                - F.col("q").cast("double")
                / (F.col("t").cast("double") * F.col("t"))
            ).alias("simpson_diversity"),
        ),
        "source",
    )


# --------------------------------------------------------------------------
# per-source perplexity quantiles (threshold screen for LM filtering)
# --------------------------------------------------------------------------

@register(
    "logprob_quantiles_by_source",
    oracle="""
    WITH words AS (
        SELECT doc_id, source, w
        FROM (SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    ),
    freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM words GROUP BY w),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM freq),
    scored AS (
        SELECT words.doc_id, words.source,
               CAST(ROUND(-LN(CAST(freq.cnt AS DOUBLE) / tot.n)
                          * 1000000, 0) AS BIGINT) AS nll6
        FROM words JOIN freq ON words.w = freq.w CROSS JOIN tot
    ),
    per_doc AS (
        SELECT source, doc_id,
               CAST(SUM(nll6) AS BIGINT) * 1000
                   // COUNT(*)                     AS avg9
        FROM scored GROUP BY source, doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST((CAST(FLOOR(quantile_cont(avg9, 0.1)) AS BIGINT) + 500)
                // 1000 AS DOUBLE) / 1e6 AS p10_nll,
           CAST((CAST(FLOOR(quantile_cont(avg9, 0.5)) AS BIGINT) + 500)
                // 1000 AS DOUBLE) / 1e6 AS p50_nll,
           CAST((CAST(FLOOR(quantile_cont(avg9, 0.9)) AS BIGINT) + 500)
                // 1000 AS DOUBLE) / 1e6 AS p90_nll
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def logprob_quantiles_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source quantiles of per-document unigram NLL — the screen
    that sets perplexity-filter thresholds: ``doc_logprob_unigram``
    scores documents, this summarizes each source's score distribution
    so the cutoff (keep below p90 of a trusted source, say) is chosen
    from data instead of folklore.

    Shape: the corpus unigram model (one word-count aggregate + scalar
    total), per-doc integer NLL sums, then a |sources|-row percentile
    aggregate.  Parity: every −ln() term is fixed-pointed ×1e6 to
    BIGINT at birth (r7 rule), the per-doc average is scaled to an
    EXACT ×1e9 integer via integer division (identical div on both
    engines), so the percentile interpolates exact integers (the
    norm_quantiles rule: interpolating rounded doubles lands midpoints
    on rounding boundaries).  The closing 6dp step is INTEGER-SPACE
    half-up rounding — (FLOOR(qc)+500) div 1000 — never ROUND(qc/1e9,
    6): interpolated nano-integers can land EXACTLY on …500 (e.g. the
    midpoint of two 1000-separated values), where Spark's
    shortest-decimal-repr HALF_UP rounds up but DuckDB's binary
    multiply rounds down (r10 audit; pinned by
    tests/test_quantile_interp_parity.py)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    words = (
        d.select(
            "doc_id",
            "source",
            F.explode_outer(F.split("text", " ")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("n"))
    nll6 = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("n")) * 1000000, 0
    ).cast("long")
    scored = (
        words.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "source", nll6.alias("nll6"))
    )
    per_doc = scored.groupBy("source", "doc_id").agg(
        F.expr("sum(nll6) * 1000 div count(*)").alias("avg9")
    )
    def p6(q: float) -> F.Column:
        # integer-space 6dp half-up: cross-engine-safe on exact …500
        # midpoints where ROUND(double, 6) diverges (see oracle note)
        return (
            F.expr(
                f"CAST((CAST(FLOOR(percentile(avg9, {q})) AS BIGINT)"
                " + 500) div 1000 AS DOUBLE) / 1e6"
            )
        )

    return sort_bounded(
        per_doc.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            p6(0.1).alias("p10_nll"),
            p6(0.5).alias("p50_nll"),
            p6(0.9).alias("p90_nll"),
        ),
        "source",
    )


# --------------------------------------------------------------------------
# vocabulary growth curve (Heaps' law) at doc-id checkpoints
# --------------------------------------------------------------------------

VOCAB_CHECKPOINTS = 10


@register(
    "vocab_growth_curve",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    ),
    mx AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
    doc_toks AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
        FROM words GROUP BY doc_id
    ),
    first_seen AS (
        SELECT w, MIN(doc_id) AS first_doc FROM words GROUP BY w
    ),
    ks AS (SELECT unnest(range(1, {VOCAB_CHECKPOINTS} + 1)) AS k)
    SELECT CAST(ks.k AS BIGINT) AS checkpoint,
           CAST((SELECT COUNT(*) FROM doc_toks, mx
                 WHERE doc_id * {VOCAB_CHECKPOINTS} < m * ks.k)
               AS BIGINT) AS n_docs,
           CAST((SELECT COALESCE(SUM(n_toks), 0) FROM doc_toks, mx
                 WHERE doc_id * {VOCAB_CHECKPOINTS} < m * ks.k)
               AS BIGINT) AS n_tokens,
           CAST((SELECT COUNT(*) FROM first_seen, mx
                 WHERE first_doc * {VOCAB_CHECKPOINTS} < m * ks.k)
               AS BIGINT) AS vocab
    FROM ks
    ORDER BY checkpoint
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative token count vs distinct
    vocabulary at ten doc-id checkpoints — sub-linear growth is natural
    language, a flat curve is boilerplate duplication, and a straight
    line is id-like noise; the curve also predicts tokenizer OOV rates
    as the corpus grows.

    Shape: NO running-distinct window (distinct doesn't merge across
    frames) — each word contributes via its FIRST doc (min(doc_id)
    aggregate), so "vocab at checkpoint k" is a plain count of
    first-occurrences below the cutoff: one (word) aggregate, one
    (doc) aggregate, then a 10-row conditional rollup on each.
    Checkpoint cutoffs use pure integer arithmetic
    (doc_id·K < max_id·k — no double division anywhere), identical on
    both engines at any id distribution."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.where(F.col("text").isNotNull())
        .select("doc_id", F.explode_outer(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )
    mx = d.agg((F.max("doc_id") + 1).alias("m"))
    doc_toks = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks")
    )
    first_seen = words.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    ks = spark.range(1, VOCAB_CHECKPOINTS + 1).select(
        F.col("id").alias("k")
    )
    K = VOCAB_CHECKPOINTS
    docs_roll = (
        doc_toks.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(ks))
        .where(F.col("doc_id") * K < F.col("m") * F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
    )
    vocab_roll = (
        first_seen.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(ks))
        .where(F.col("first_doc") * K < F.col("m") * F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    # LEFT joins from the checkpoint spine: a checkpoint whose cutoff
    # precedes every doc_id (offset/sparse id domains in regenerated
    # fixtures) must still emit a zero row, as the oracle's scalar
    # subqueries do — an inner join here would drop it (row-count
    # mismatch; the join_anti lesson applied to spines)
    return sort_bounded(
        ks.join(docs_roll, "k", "left")
        .join(vocab_roll, "k", "left")
        .select(
            F.col("k").cast("long").alias("checkpoint"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias(
                "n_tokens"
            ),
            F.coalesce("vocab", F.lit(0)).cast("long").alias("vocab"),
        ),
        "checkpoint",
    )


# --------------------------------------------------------------------------
# temporal bigram novelty per document
# --------------------------------------------------------------------------

@register(
    "doc_ngram_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a
        FROM documents
        WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(a)), i -> a[i]))     AS w1,
               unnest(list_transform(range(1, len(a)), i -> a[i + 1])) AS w2
        FROM toks
    ),
    first_seen AS (
        SELECT w1, w2, MIN(doc_id) AS first_doc FROM bg GROUP BY w1, w2
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(SUM(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = bg.doc_id THEN 1 ELSE 0 END)
               AS DOUBLE) / COUNT(*) AS novelty_rate
    FROM bg JOIN first_seen f ON f.w1 = bg.w1 AND f.w2 = bg.w2
    GROUP BY bg.doc_id
    ORDER BY bg.doc_id
    """,
)
def doc_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal bigram novelty per document: the share of a doc's
    DISTINCT bigrams appearing for the FIRST time (in doc_id order) —
    the freshness screen for incremental crawls: a batch whose novelty
    collapses toward 0 is re-crawling what the corpus already holds,
    and a pure-novelty doc is either genuinely new or line noise.

    Shape: the Heaps-curve trick applied per bigram (min(doc_id) per
    distinct bigram — no running-distinct window), joined back to the
    per-doc distinct-bigram frame on (w1, w2); bigrams build in-row
    via arrays_zip (r5 rule).  Parity: counts are exact integers,
    novelty_rate an exact integer ratio (unrounded); |docs|-sized
    output left unsorted (driver hash is order-insensitive)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    a = F.split("text", " ")
    pairs_arr = F.arrays_zip(
        F.slice(a, 1, F.size(a) - 1), F.slice(a, 2, F.size(a) - 1)
    )
    bg = (
        d.where(F.size(a) >= 2)
        .select("doc_id", F.explode_outer(pairs_arr).alias("p"))
        .select(
            "doc_id",
            F.col("p.0").alias("w1"),
            F.col("p.1").alias("w2"),
        )
        .distinct()
    )
    first_seen = bg.groupBy("w1", "w2").agg(
        F.min("doc_id").alias("first_doc")
    )
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        bg.join(first_seen, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
            F.sum(novel).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_distinct_bigrams",
            "n_novel",
            (
                F.col("n_novel").cast("double")
                / F.col("n_distinct_bigrams")
            ).alias("novelty_rate"),
        )
    )


# --------------------------------------------------------------------------
# leading-token concentration per source (boilerplate detector, r11)
# --------------------------------------------------------------------------

@register(
    "doc_first_token_profile",
    oracle="""
    WITH ft AS (
        SELECT source, string_split(text, ' ')[1] AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    cnts AS (
        SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ft GROUP BY 1, 2
    ),
    ranked AS (
        SELECT source, tok, cnt,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY cnt DESC, tok) AS r,
               CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT)
                   AS n_docs,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
                   AS n_distinct_first
        FROM cnts
    )
    SELECT source,
           n_docs,
           n_distinct_first,
           tok AS top_first_token,
           cnt AS top_count,
           CAST(cnt AS DOUBLE) / n_docs AS top_share
    FROM ranked WHERE r = 1
    ORDER BY source
    """,
)
def doc_first_token_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leading-token concentration per source: the most common FIRST
    token of a document and its share — the boilerplate/header detector
    (a source whose docs all open with the same token is template
    output; ``doc_prefix_dup_share`` needs a 5-token prefix to agree,
    this fires on the cheaper 1-token signal first).

    Shape: one (source, first-token) count aggregate — only the first
    token is extracted, the text is never exploded — then rank/total
    windows over the source-keyed count frame (bounded by the
    per-source leading-token vocabulary).  Parity: (cnt DESC, tok) is the total
    order on both engines; shares are unrounded exact-integer ratios;
    Spark's 0-based getItem(0) is DuckDB's 1-based [1]."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    cnts = d.select(
        "source", F.split("text", " ").getItem(0).alias("tok")
    ).groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wsrc = Window.partitionBy("source")
    wrank = wsrc.orderBy(F.col("cnt").desc(), "tok")
    ranked = cnts.select(
        "source",
        "tok",
        "cnt",
        F.row_number().over(wrank).alias("r"),
        F.sum("cnt").over(wsrc).cast("long").alias("n_docs"),
        F.count(F.lit(1)).over(wsrc).cast("long").alias(
            "n_distinct_first"
        ),
    )
    return sort_bounded(
        ranked.where(F.col("r") == 1).select(
            "source",
            "n_docs",
            "n_distinct_first",
            F.col("tok").alias("top_first_token"),
            F.col("cnt").alias("top_count"),
            (F.col("cnt").cast("double") / F.col("n_docs")).alias(
                "top_share"
            ),
        ),
        "source",
    )


# --------------------------------------------------------------------------
# adjacent repeated-token runs (loop detector, r11)
# --------------------------------------------------------------------------

RUN_ALERT_LEN = 3  # a run of >= 3 identical adjacent tokens flags a doc


@register(
    "doc_repeated_token_runs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               unnest(range(1, len(string_split(text, ' ')) + 1))
                   AS pos,
               unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    grp AS (
        SELECT doc_id, source, tok,
               pos - ROW_NUMBER() OVER (
                   PARTITION BY doc_id, tok ORDER BY pos) AS g
        FROM toks
    ),
    runs AS (
        SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM grp GROUP BY doc_id, source, tok, g
    ),
    per_doc AS (
        SELECT doc_id, source, CAST(MAX(run_len) AS BIGINT) AS max_run
        FROM runs GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MAX(max_run) AS BIGINT) AS longest_run,
           CAST(SUM(CASE WHEN max_run >= {RUN_ALERT_LEN}
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_looping,
           CAST(SUM(CASE WHEN max_run >= {RUN_ALERT_LEN}
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS looping_share
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def doc_repeated_token_runs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Adjacent repeated-token runs per source: the longest identical
    run per doc and the share of docs with a run ≥ {RUN_ALERT_LEN} —
    the degenerate-loop detector ("batch batch batch") that
    ``repetition_score``'s n-gram ratios dilute when the doc is long
    and ``doc_compression_ratio`` only sees once the loop dominates.

    Shape: the islands-by-value decomposition — positional explode,
    ONE (doc, token)-keyed row_number window (pos − rank is constant
    within a run), then pure keyed aggregates; every shuffle is doc-
    keyed, nothing global.  Parity: positions zip positionally on both
    engines (the r7 dual-unnest rule); counts exact; the share an
    unrounded exact-integer ratio."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode_outer(F.split("text", " ")).alias("pos0", "tok"),
    ).select(
        "doc_id", "source", (F.col("pos0") + 1).alias("pos"), "tok"
    )
    w = Window.partitionBy("doc_id", "tok").orderBy("pos")
    grp = toks.select(
        "doc_id",
        "source",
        "tok",
        (F.col("pos") - F.row_number().over(w)).alias("g"),
    )
    runs = grp.groupBy("doc_id", "source", "tok", "g").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    per_doc = runs.groupBy("doc_id", "source").agg(
        F.max("run_len").cast("long").alias("max_run")
    )
    looping = F.when(
        F.col("max_run") >= RUN_ALERT_LEN, 1
    ).otherwise(0)
    return sort_bounded(
        per_doc.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("max_run").cast("long").alias("longest_run"),
            F.sum(looping).cast("long").alias("n_docs_looping"),
            (
                F.sum(looping).cast("double") / F.count(F.lit(1))
            ).alias("looping_share"),
        ),
        "source",
    )


doc_repeated_token_runs.__doc__ = doc_repeated_token_runs.__doc__.format(
    RUN_ALERT_LEN=RUN_ALERT_LEN
)


# --------------------------------------------------------------------------
# (lang, source) length interaction screen (r11)
# --------------------------------------------------------------------------

@register(
    "length_lang_source_interaction",
    oracle="""
    WITH cells AS (
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT)     AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM documents WHERE text IS NOT NULL
              AND lang IS NOT NULL AND source IS NOT NULL
        GROUP BY lang, source
    ),
    m AS (
        SELECT lang, source, n_docs, chars,
               CAST(chars AS DOUBLE) / n_docs AS cell_mean,
               CAST(SUM(chars) OVER (PARTITION BY lang) AS DOUBLE)
                   / SUM(n_docs) OVER (PARTITION BY lang)
                   AS lang_mean,
               CAST(SUM(chars) OVER (PARTITION BY source) AS DOUBLE)
                   / SUM(n_docs) OVER (PARTITION BY source)
                   AS source_mean,
               CAST(SUM(chars) OVER () AS DOUBLE)
                   / SUM(n_docs) OVER () AS grand_mean
        FROM cells
    )
    SELECT lang, source, n_docs, cell_mean,
           cell_mean - lang_mean - source_mean + grand_mean
               AS interaction_dev
    FROM m
    ORDER BY lang, source
    """,
)
def length_lang_source_interaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-way interaction screen on document length: for every
    (lang, source) cell, the deviation of its mean length from the
    additive lang-effect + source-effect model — near 0 everywhere the
    mix is homogeneous; a hot cell means ONE source is short/long in
    ONE language specifically (a scraper truncating only its Korean
    pages), which per-lang or per-source marginals each average away.

    Shape: one (lang, source) count/sum aggregate, then the margin
    means re-aggregated from that |langs|×|sources|-BOUNDED cell frame
    (three tiny rollups broadcast-joined back — never the doc stream,
    and no SinglePartition window).  Parity: every mean is an unrounded
    exact-integer ratio computed from the SAME BIGINT cell sums on both
    engines, and the interaction is one subtraction chain of those
    bit-identical doubles.  NULL lang/source rows are un-categorizable
    — dropped from the two-way table on BOTH engines (null-catalog
    audit, r18: Spark's margin joins drop NULL-category cells the
    oracle's windows kept)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("source").isNotNull()
    )
    cells = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    lm = cells.groupBy("lang").agg(
        (F.sum("chars").cast("double") / F.sum("n_docs")).alias(
            "lang_mean"
        )
    )
    sm = cells.groupBy("source").agg(
        (F.sum("chars").cast("double") / F.sum("n_docs")).alias(
            "source_mean"
        )
    )
    gm = cells.agg(
        (F.sum("chars").cast("double") / F.sum("n_docs")).alias(
            "grand_mean"
        )
    )
    cell_mean = F.col("chars").cast("double") / F.col("n_docs")
    return sort_bounded(
        cells.join(F.broadcast(lm), "lang")
        .join(F.broadcast(sm), "source")
        .crossJoin(F.broadcast(gm))
        .select(
            "lang",
            "source",
            "n_docs",
            cell_mean.alias("cell_mean"),
            (
                cell_mean
                - F.col("lang_mean")
                - F.col("source_mean")
                + F.col("grand_mean")
            ).alias("interaction_dev"),
        ),
        "lang",
        "source",
    )


# --------------------------------------------------------------------------
# per-source language-mix entropy (r11 wave 2)
# --------------------------------------------------------------------------

@register(
    "source_lang_entropy",
    oracle="""
    WITH cells AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents WHERE text IS NOT NULL
        GROUP BY source, lang
    ),
    tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_langs
        FROM cells GROUP BY source
    ),
    ent AS (
        SELECT c.source,
               CAST(SUM(c.c * CAST(ROUND(
                   ln(CAST(t.n AS DOUBLE) / c.c) * 1000000, 0)
                   AS BIGINT)) AS BIGINT) // ANY_VALUE(t.n)
                   AS entropy_e6
        FROM cells c JOIN tot t ON t.source = c.source
        GROUP BY c.source
    ),
    top AS (
        SELECT source, lang AS top_lang, c AS top_c
        FROM (
            SELECT source, lang, c,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY c DESC, lang) AS rn
            FROM cells
        ) WHERE rn = 1
    )
    SELECT t.source,
           t.n AS n_docs,
           t.n_langs,
           top.top_lang,
           CAST(top.top_c AS DOUBLE) / t.n AS top_lang_share,
           e.entropy_e6
    FROM tot t
    JOIN top ON top.source = t.source
    JOIN ent e ON e.source = t.source
    ORDER BY t.source
    """,
)
def source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix concentration per source: Shannon entropy (nats,
    ×1e6 integer) of each source's language distribution plus the modal
    language and its share — the multilinguality dial a sampling plan
    reads (entropy 0 = monolingual feed; near ln|langs| = uniform mix),
    where ``lang_source_chisq`` tests independence and
    ``length_lang_source_interaction`` screens length, neither names
    the mix itself.

    Shape: one (source, lang) count aggregate, then every reduction —
    totals, entropy terms, modal-language argmax — runs on the
    |sources|×|langs|-BOUNDED cell frame (the argmax window is
    bounded-frame, never data-sized).  Parity: each ln term is
    fixed-pointed ×1e6 to BIGINT per TERM (r7 rule) and the per-source
    sum closes with integer division; the modal share an unrounded
    exact-integer ratio; the argmax total-orders on (count DESC,
    lang)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = cells.groupBy("source").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    term = F.col("c") * F.round(
        F.log(F.col("n").cast("double") / F.col("c")) * 1_000_000, 0
    ).cast("long")
    ent = (
        cells.join(tot.select("source", "n"), "source")
        .groupBy("source")
        .agg(
            F.sum(term).cast("long").alias("tsum"),
            F.first("n").alias("n0"),
        )
        .select("source", F.expr("tsum div n0").alias("entropy_e6"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("lang")
    )
    top = (
        cells.select(
            "source", "lang", "c", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("c").alias("top_c"),
        )
    )
    return sort_bounded(
        tot.join(top, "source")
        .join(ent, "source")
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "n_langs",
            "top_lang",
            (F.col("top_c").cast("double") / F.col("n")).alias(
                "top_lang_share"
            ),
            "entropy_e6",
        ),
        "source",
    )


# --------------------------------------------------------------------------
# sentence-granularity stats (r11 wave 2)
# --------------------------------------------------------------------------

_SENTENCE_BREAK = "[.!?]+"


@register(
    "doc_sentence_stats",
    oracle=f"""
    WITH per AS (
        SELECT source, n_chars,
               CAST(len(regexp_extract_all(text, '{_SENTENCE_BREAK}'))
                    AS BIGINT) AS n_breaks
        FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)        AS n_docs,
           CAST(SUM(n_breaks) AS BIGINT)   AS n_breaks,
           CAST(SUM(CASE WHEN n_breaks = 0 THEN 1 ELSE 0 END)
                AS BIGINT)                 AS n_unbroken_docs,
           CAST(SUM(CASE WHEN n_breaks = 0 THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*)      AS unbroken_share,
           CAST(SUM(n_breaks) AS DOUBLE) / COUNT(*)
               AS sentences_per_doc,
           CAST(SUM(n_chars) AS DOUBLE) / SUM(n_breaks + 1)
               AS chars_per_sentence
    FROM per
    GROUP BY source
    ORDER BY source
    """,
)
def doc_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-granularity profile per source: terminator-run counts
    ([.!?]+), the share of docs with NO sentence break (list dumps,
    code, truncated crawls — a chunker's worst input), and mean chars
    per sentence — the segmentation-readiness screen that char/token
    stats (``text_stats``, ``char_class_profile``) don't express.

    Shape: one regexp_count projection inside the scan (JVM codegen,
    no Python), one source-keyed aggregate.  Parity: the break pattern
    stays in the Java/RE2-shared subset (char class + unbounded +, no
    backrefs — r6 rule); counts exact BIGINT; both means unrounded
    exact-integer ratios (chars-per-sentence divides by Σ(breaks+1) ≥
    n_docs ≥ 1)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    per = d.select(
        "source",
        "n_chars",
        F.regexp_count("text", F.lit(_SENTENCE_BREAK))
        .cast("long")
        .alias("n_breaks"),
    )
    unbroken = F.when(F.col("n_breaks") == 0, 1).otherwise(0)
    return sort_bounded(
        per.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_breaks").cast("long").alias("n_breaks"),
            F.sum(unbroken).cast("long").alias("n_unbroken_docs"),
            (
                F.sum(unbroken).cast("double") / F.count(F.lit(1))
            ).alias("unbroken_share"),
            (
                F.sum("n_breaks").cast("double") / F.count(F.lit(1))
            ).alias("sentences_per_doc"),
            (
                F.sum("n_chars").cast("double")
                / F.sum(F.col("n_breaks") + 1)
            ).alias("chars_per_sentence"),
        ),
        "source",
    )


# ---------------------------------------------------------------------------
# vocabulary top-k coverage (r12) — tokenizer-budget planning ledger
# ---------------------------------------------------------------------------

VOCAB_TOPK_SWEEP = (100, 1000, 10000)


@register(
    "vocab_topk_coverage",
    oracle=f"""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS v
        FROM words WHERE w <> '' GROUP BY w
    ),
    ledger AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS m
        FROM counts GROUP BY v
    ),
    cum AS (
        SELECT v, m,
               CAST(SUM(m) OVER (ORDER BY v DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cumw_after
        FROM ledger
    ),
    t AS (SELECT unnest([{", ".join(str(k) for k in VOCAB_TOPK_SWEEP)}])
              AS vocab_size),
    tot AS (SELECT CAST(SUM(m * v) AS BIGINT) AS total_tokens,
                   CAST(SUM(m) AS BIGINT)     AS n_vocab
            FROM ledger),
    cov AS (
        SELECT t.vocab_size,
               CAST(SUM(CASE
                   WHEN cum.cumw_after <= t.vocab_size THEN cum.m * cum.v
                   WHEN cum.cumw_after - cum.m >= t.vocab_size THEN 0
                   ELSE (t.vocab_size - (cum.cumw_after - cum.m)) * cum.v
               END) AS BIGINT) AS covered_tokens
        FROM cum CROSS JOIN t
        GROUP BY t.vocab_size
    )
    SELECT CAST(t.vocab_size AS BIGINT) AS vocab_size,
           COALESCE(c.covered_tokens, 0) AS covered_tokens,
           tot.total_tokens,
           tot.n_vocab,
           CAST(COALESCE(c.covered_tokens, 0) AS DOUBLE)
               / NULLIF(tot.total_tokens, 0) AS coverage
    FROM t
    LEFT JOIN cov c ON c.vocab_size = t.vocab_size
    CROSS JOIN tot
    ORDER BY vocab_size
    """,
)
def vocab_topk_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What share of token occurrences does a k-word vocabulary cover?
    The tokenizer-budget dial (OOV rate = 1 − coverage) for k ∈
    {100, 1000, 10000} — the planning companion of
    ``ngram_coverage_curve`` (n-grams) and ``vocab_growth_curve``
    (Heaps' law): coverage saturating early means a small vocab +
    byte-fallback suffices; a flat curve means long-tail-heavy text.

    Shape: the scale pattern here is the COUNTS-OF-COUNTS LEDGER (the
    r8 value-bucket rule, applied to vocabulary): covering the top-k
    words needs a rank over |vocab| rows, but ranks are only consumed
    through the cutoff sum — so the op aggregates words to count
    values (|ledger| ≈ distinct frequencies, thousands at any corpus
    size), cumsums the BOUNDED ledger, and resolves each k cutoff
    arithmetically, splitting the boundary frequency group
    pro-rata-by-count ((k − words_above)·v — deterministic, no
    per-word rank, no tie ambiguity since ties only exist WITHIN a
    group the formula never orders).  No data-sized window anywhere.
    Parity: everything is BIGINT until the single coverage division
    (exact-integer ratio, unrounded, NULLIF-guarded)."""
    counts = _words(spark, sf_dir).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    ledger = counts.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    w_cum = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # bounded |distinct frequencies| ledger cumulative — never the vocab
    cum = ledger.select(
        "v",
        "m",
        F.sum("m").over(w_cum).cast("long").alias("cumw_after"),
    )
    t = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(k) for k in VOCAB_TOPK_SWEEP])
        ).alias("vocab_size")
    )
    contrib = (
        F.when(
            F.col("cumw_after") <= F.col("vocab_size"),
            F.col("m") * F.col("v"),
        )
        .when(
            F.col("cumw_after") - F.col("m") >= F.col("vocab_size"),
            F.lit(0),
        )
        .otherwise(
            (
                F.col("vocab_size").cast("long")
                - (F.col("cumw_after") - F.col("m"))
            )
            * F.col("v")
        )
    )
    cov = (
        cum.crossJoin(F.broadcast(t))
        .groupBy("vocab_size")
        .agg(F.sum(contrib).cast("long").alias("covered_tokens"))
    )
    tot = ledger.agg(
        F.sum(F.col("m") * F.col("v")).cast("long").alias("total_tokens"),
        F.sum("m").cast("long").alias("n_vocab"),
    )
    return sort_bounded(
        t.join(cov, "vocab_size", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("vocab_size").cast("long").alias("vocab_size"),
            F.coalesce(F.col("covered_tokens"), F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
            F.col("total_tokens"),
            F.col("n_vocab"),
            (
                F.coalesce(F.col("covered_tokens"), F.lit(0)).cast(
                    "double"
                )
                / F.nullif(F.col("total_tokens"), F.lit(0))
            ).alias("coverage"),
        ),
        "vocab_size",
    )


# ---------------------------------------------------------------------------
# word burstiness (r12) — Church–Gale clumping of the head vocabulary
# ---------------------------------------------------------------------------

BURSTINESS_TOP_K = 20


@register(
    "word_burstiness_topk",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    stats AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT)                 AS cnt,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT)   AS df
        FROM words WHERE w <> ''
        GROUP BY w
    )
    SELECT w, cnt, df,
           CAST(cnt AS DOUBLE) / df AS burstiness
    FROM stats
    ORDER BY cnt DESC, w
    LIMIT {BURSTINESS_TOP_K}
    """,
)
def word_burstiness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church–Gale burstiness (occurrences per containing doc) for the
    head vocabulary: function words read ≈ their per-doc rate (spread
    evenly), while topical/templated words CLUMP — a head word with
    high burstiness in a web corpus is usually boilerplate repeating
    inside pages, the same signal ``repetition_score`` reads per doc,
    here aggregated per word.  Complements ``word_zipf_slope`` (rank
    curve) and ``hapax_ratio_by_source`` (tail mass).

    Shape: one (word) aggregate carrying count + distinct-doc count
    (Spark expands the distinct via one grouping-sets-style pass),
    then TakeOrdered K — never a vocab-sized sort.  Parity:
    (cnt DESC, w) is a total order; burstiness is an unrounded
    exact-integer ratio (df ≥ 1 by construction)."""
    stats = _words_with_doc(spark, sf_dir).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    return (
        stats.select(
            "w",
            "cnt",
            "df",
            (F.col("cnt").cast("double") / F.col("df")).alias(
                "burstiness"
            ),
        )
        .orderBy(F.col("cnt").desc(), "w")
        .limit(BURSTINESS_TOP_K)
    )


def _words_with_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w) token stream — the _words() projection keeping the
    doc key (for df-style aggregates)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    return (
        d.select(
            "doc_id",
            F.explode_outer(F.split("text", " ")).alias("w"),
        )
        .where(F.col("w").isNotNull() & (F.col("w") != ""))
    )


# --------------------------------------------------------------------------
# positional novelty profile (r12) — where in the doc do new words stop?
# --------------------------------------------------------------------------

@register(
    "doc_position_novelty",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n,
               unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos,
               unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    marked AS (
        SELECT (pos - 1) * 10 // n AS decile,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY doc_id, tok ORDER BY pos) = 1
                    THEN 1 ELSE 0 END AS is_first
        FROM toks
    )
    SELECT CAST(decile AS BIGINT)        AS decile,
           CAST(COUNT(*) AS BIGINT)      AS n_tokens,
           CAST(SUM(is_first) AS BIGINT) AS n_first,
           CAST(SUM(is_first) AS DOUBLE) / COUNT(*) AS novelty_share
    FROM marked GROUP BY decile ORDER BY decile
    """,
)
def doc_position_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc novelty by POSITION decile: the share of tokens that
    are the first occurrence of their word in the doc, bucketed by
    where they sit (decile 0 = opening 10%, 9 = closing 10%).  Healthy
    prose decays smoothly; template/boilerplate corpora decay to near
    zero immediately, and generation loops show a LATE collapse that
    doc-level ratios (``doc_ttr``, ``repetition_score``) average away
    — this is the positional view a truncation/curriculum decision
    actually needs.

    Shape: positional explode inside the scan (codegen), ONE
    (doc, token)-keyed row_number window marks first occurrences (the
    scale-safe shape — in-row array_position rescans would be O(len²)
    per doc), then a 10-row bounded aggregate.  Parity: positions zip
    positionally on both engines (the r7 dual-unnest rule); the decile
    key is pure-integer ((pos0·10) div n); counts exact; the share an
    unrounded exact-integer ratio (n_tokens ≥ 1 per emitted row)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n"),
        F.posexplode(F.split("text", " ")).alias("pos0", "tok"),
    )
    w = Window.partitionBy("doc_id", "tok").orderBy("pos0")
    marked = toks.select(
        F.expr("pos0 * 10 div n").alias("decile"),
        F.when(F.row_number().over(w) == 1, 1).otherwise(0).alias(
            "is_first"
        ),
    )
    return sort_bounded(
        marked.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("is_first").cast("long").alias("n_first"),
            (
                F.sum("is_first").cast("double") / F.count(F.lit(1))
            ).alias("novelty_share"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_tokens",
            "n_first",
            "novelty_share",
        ),
        "decile",
    )


# ---------------------------------------------------------------------------
# head-vocabulary rank shift per source (r12c) — who reorders the top words?
# ---------------------------------------------------------------------------

RANK_SHIFT_K = 20


@register(
    "vocab_rank_shift_topk",
    oracle=f"""
    WITH words AS (
        SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    v AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM words WHERE w <> '' GROUP BY source, w
    ),
    g AS (SELECT w, CAST(SUM(c) AS BIGINT) AS c FROM v GROUP BY w),
    gr AS (
        SELECT w, r FROM (
            SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS r
            FROM g
        ) WHERE r <= {RANK_SHIFT_K}
    ),
    sr AS (
        SELECT source, w, r FROM (
            SELECT source, w,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY c DESC, w) AS r
            FROM v
        ) WHERE r <= {RANK_SHIFT_K}
    )
    SELECT sr.source,
           CAST(COUNT(*) AS BIGINT)     AS n_topk_words,
           CAST(COUNT(gr.w) AS BIGINT)  AS n_overlap,
           CAST(COALESCE(SUM(ABS(sr.r - gr.r)), 0) AS BIGINT)
                                        AS footrule,
           CAST(COUNT(gr.w) AS DOUBLE) / {RANK_SHIFT_K}
                                        AS coverage_share
    FROM sr LEFT JOIN gr ON sr.w = gr.w
    GROUP BY sr.source
    ORDER BY sr.source
    """,
)
def vocab_rank_shift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-vocabulary drift per source: each source's top-{RANK_SHIFT_K}
    words compared against the CORPUS top-{RANK_SHIFT_K} — overlap
    count, Spearman-footrule rank displacement over the overlap, and
    the share of the global head the source covers.  A source whose
    head vocabulary reorders hard against the corpus (low overlap,
    high footrule) is the one that will fight the shared tokenizer and
    skew any frequency-derived mixture weight — the drilldown behind
    ``source_unigram_kl``'s single divergence number.

    Shape: one word scan feeds both rank frames; the GLOBAL head is a
    TakeOrdered {RANK_SHIFT_K}-row cut (orderBy+limit — never a
    vocab-sized global sort) ranked on the bounded result, and the
    per-source heads use the ``topk_per_group`` window idiom (source-
    keyed vocab sort, rows ≤ |source vocab|); the compare join is
    K-row broadcast-sized.  Parity: ranks total-ordered by
    (count DESC, word) on both engines; counts and footrule exact
    BIGINTs (COALESCE'd to 0 for zero-overlap sources identically);
    coverage an unrounded exact-integer ratio over the constant K."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    words = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    v = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    g = v.groupBy("w").agg(F.sum("c").cast("long").alias("c"))
    g_top = g.orderBy(F.col("c").desc(), "w").limit(RANK_SHIFT_K)
    w_glob = Window.orderBy(F.col("c").desc(), "w")  # bounded: K rows
    gr = g_top.select(
        "w", F.row_number().over(w_glob).cast("long").alias("r")
    )
    w_src = Window.partitionBy("source").orderBy(
        F.col("c").desc(), "w"
    )
    sr = v.select(
        "source",
        "w",
        F.row_number().over(w_src).cast("long").alias("r"),
    ).where(F.col("r") <= RANK_SHIFT_K)
    joined = sr.join(
        F.broadcast(gr.withColumnRenamed("r", "gr_r")), "w", "left"
    )
    return sort_bounded(
        joined.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_topk_words"),
            F.count("gr_r").cast("long").alias("n_overlap"),
            F.coalesce(
                F.sum(F.abs(F.col("r") - F.col("gr_r"))), F.lit(0)
            )
            .cast("long")
            .alias("footrule"),
            (
                F.count("gr_r").cast("double") / F.lit(RANK_SHIFT_K)
            ).alias("coverage_share"),
        ),
        "source",
    )


vocab_rank_shift_topk.__doc__ = vocab_rank_shift_topk.__doc__.format(
    RANK_SHIFT_K=RANK_SHIFT_K
)


DOC_ENTROPY_TOP_K = 15


@register(
    "doc_unigram_entropy_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    tok AS (SELECT doc_id, w FROM toks WHERE w <> ''),
    tc AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY doc_id, w
    ),
    d AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT)   AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(c * CAST(ROUND(LN(c) * 1000000, 0) AS BIGINT))
                    AS BIGINT)          AS s6
        FROM tc GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           CAST(CAST(ROUND(LN(n_tokens) * 1000000, 0) AS BIGINT)
                    * n_tokens - s6 AS DOUBLE)
               / (CAST(n_tokens AS DOUBLE) * 1000000.0) AS entropy
    FROM d
    ORDER BY entropy DESC, doc_id
    LIMIT {DOC_ENTROPY_TOP_K}
    """,
)
def doc_unigram_entropy_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document token Shannon entropy, highest-entropy head: H(d) =
    ln(dl) − Σ c·ln(c)/dl over the doc's token counts — the
    distributional cousin of ``doc_ttr`` (a repetitive doc scores near
    0, an all-distinct doc exactly ln(dl)); the quality screen that
    catches keyword-stuffed or template docs whose TTR still looks
    healthy.

    Shape: one token explode → (doc, token)-keyed count → doc-keyed
    reduction; the top-K head is a TakeOrdered cut, so nothing
    doc-sized sorts globally.  Parity: each ln fixed-points
    round(·1e6)→BIGINT AT BIRTH (the r7 transcendental rule — the
    per-doc sum is order-independent), and the entropy closes as ONE
    division of exact integers (round(ln dl·1e6)·dl − Σ c·round(ln
    c·1e6)) / (dl·1e6) — bit-identical cross-engine, emitted UNROUNDED
    (the r10 rule); (entropy DESC, doc_id) is a total order because
    the ratio doubles are identical on both engines."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    tc = tok.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ln6 = lambda col: F.round(F.log(col) * 1_000_000, 0).cast("long")  # noqa: E731
    doc = tc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("c") * ln6(F.col("c"))).cast("long").alias("s6"),
    )
    entropy = (
        (ln6(F.col("n_tokens")) * F.col("n_tokens") - F.col("s6")).cast(
            "double"
        )
        / (F.col("n_tokens").cast("double") * 1_000_000.0)
    )
    return (
        doc.select(
            "doc_id", "n_tokens", "n_distinct", entropy.alias("entropy")
        )
        .orderBy(F.col("entropy").desc(), "doc_id")
        .limit(DOC_ENTROPY_TOP_K)
    )


@register(
    "source_length_gini",
    oracle="""
    WITH ranked AS (
        SELECT source, n_chars,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY n_chars, doc_id) AS BIGINT) AS r,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM documents
        WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)     AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM((2 * r - n - 1) * n_chars) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * NULLIF(SUM(n_chars), 0))
               AS gini
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def source_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source — the
    inequality lens on the corpus mix: a source whose token mass sits
    in a handful of giant documents (gini → 1) packs, dedups and
    samples very differently from one with even lengths (gini → 0),
    and a high-gini source is the first place a length-curriculum or
    context-packing plan goes wrong.  ``customer_value_gini``'s
    formula applied to the corpus axis.

    Shape: a rank window PARTITIONED BY SOURCE (a keyed sort, never
    global), then one per-source reduction of G = Σ(2r − n − 1)·x /
    (n·Σx).  All docs count, null-text rows at their stored n_chars —
    excluding them would understate concentration.  Parity: n_chars is
    already BIGINT, ranks total-ordered by (n_chars, doc_id), the
    weighted sum is exact integer arithmetic, the closing division
    casts its factors separately (r8 overflow rule), NULLIF guards an
    all-empty source, gini emitted UNROUNDED (exact-integer ratio).
    NULL n_chars / NULL doc_id rows have no rank — dropped on BOTH
    engines (null-catalog audit, r18: engine NULL-ordering defaults
    shift every other rank)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("n_chars").isNotNull() & F.col("doc_id").isNotNull()
    )
    wr = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(wr).cast("long").alias("r"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    )
    return sort_bounded(
        ranked.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (
                F.sum(
                    (2 * F.col("r") - F.col("n") - 1) * F.col("n_chars")
                ).cast("double")
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.nullif(F.sum("n_chars"), F.lit(0))
                )
            ).alias("gini"),
        ),
        "source",
    )


# ---------------------------------------------------------------------------
# robust LM-score outlier screen per source (r15)
# ---------------------------------------------------------------------------


@register(
    "doc_logprob_mad_outliers",
    oracle="""
    WITH words AS (
        SELECT doc_id, source, w
        FROM (SELECT doc_id, source,
                     unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    ),
    freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM words GROUP BY w),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM freq),
    scored AS (
        SELECT words.doc_id, words.source,
               CAST(ROUND(-LN(CAST(freq.cnt AS DOUBLE) / tot.n)
                          * 1000000, 0) AS BIGINT) AS nll6
        FROM words JOIN freq ON words.w = freq.w CROSS JOIN tot
    ),
    per_doc AS (
        SELECT source, doc_id,
               CAST(SUM(nll6) AS BIGINT) * 1000
                   // COUNT(*)                     AS avg9
        FROM scored GROUP BY source, doc_id
    ),
    m AS (SELECT source, quantile_cont(avg9, 0.5) AS med
          FROM per_doc GROUP BY source),
    dev AS (
        SELECT p.source, p.doc_id, p.avg9, m.med,
               ABS(p.avg9 - m.med) AS dev
        FROM per_doc p JOIN m ON m.source = p.source
    ),
    md AS (SELECT source, quantile_cont(dev, 0.5) AS mad
           FROM dev GROUP BY source)
    SELECT dev.source AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           dev.med                  AS med_nll9,
           md.mad                   AS mad_nll9,
           CAST(SUM(CASE WHEN dev.dev > 3 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT)          AS n_outliers,
           CAST(SUM(CASE WHEN dev.dev > 3 * md.mad THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS outlier_share
    FROM dev JOIN md ON md.source = dev.source
    GROUP BY dev.source, dev.med, md.mad
    ORDER BY dev.source
    """,
)
def doc_logprob_mad_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Robust perplexity-style quality screen: per source, how many
    documents' unigram NLL deviates from the source median by more than
    3× the median absolute deviation — the outlier gate a CCNet-style
    LM filter runs where ``logprob_quantiles_by_source`` only reports
    the distribution (MAD, not z-score, because the degenerate docs
    being hunted are exactly what drags a mean/σ threshold —
    ``events_anomaly_mad`` over the LM-score axis).

    Shape: the corpus unigram model (one word-count aggregate + scalar
    total), per-doc integer NLL, then two |sources|-row percentile
    aggregates broadcast back onto the doc frame — no window, no
    data-sized sort; the per-doc aggregate exchange is shared between
    the median branch and the deviation branch (ReusedExchange).
    Parity: each −ln fixed-points ×1e6→BIGINT at birth, the per-doc
    average scales to an EXACT ×1e9 integer via integer division (the
    logprob_quantiles rule), so per-source interpolated medians of
    exact integers are bit-identical cross-engine (r10 probe),
    deviations are exact dyadic rationals, 3·mad is exact, and the
    strictly-greater compare can never sit on a float boundary —
    med/mad emit UNROUNDED (the r10 rule), the share an exact-integer
    ratio.  Stable fixtures may flag nothing — the detection path is
    pinned by a planted gibberish-doc test
    (tests/test_new_ops_r15.py)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    words = (
        d.select(
            "doc_id",
            "source",
            F.explode_outer(F.split("text", " ")).alias("w"),
        )
        .where(F.col("w") != "")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("n"))
    nll6 = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("n")) * 1000000, 0
    ).cast("long")
    scored = (
        words.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", "source", nll6.alias("nll6"))
    )
    per_doc = scored.groupBy("source", "doc_id").agg(
        F.expr("CAST(SUM(nll6) AS BIGINT) * 1000 div COUNT(*)").alias(
            "avg9"
        )
    )
    m = per_doc.groupBy("source").agg(
        F.percentile("avg9", 0.5).alias("med")
    )
    dev = per_doc.join(F.broadcast(m), "source").select(
        "source",
        "avg9",
        "med",
        F.abs(F.col("avg9") - F.col("med")).alias("dev"),
    )
    md = dev.groupBy("source").agg(F.percentile("dev", 0.5).alias("mad"))
    flagged = F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
    return sort_bounded(
        dev.join(F.broadcast(md), "source")
        .groupBy("source", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(flagged).cast("long").alias("n_outliers"),
            (
                F.sum(flagged).cast("double") / F.count(F.lit(1))
            ).alias("outlier_share"),
        )
        .select(
            "source",
            "n_docs",
            F.col("med").alias("med_nll9"),
            F.col("mad").alias("mad_nll9"),
            "n_outliers",
            "outlier_share",
        ),
        "source",
    )
