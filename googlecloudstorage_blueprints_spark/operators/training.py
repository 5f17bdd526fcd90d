"""Training-data assembly operators: context packing, decontamination,
TF-IDF term ranking.

These extend the LLM-pipeline family (dedup.py, text.py, pipeline.py)
with the assembly-side shapes a 100 TB pretraining pipeline needs; the
file-transfer reference has no analytics counterpart (SURVEY.md §2.A.4 —
additions mandated by the build brief, not ported behavior).

Parity conventions (operators/relational.py docstring): bigint-cast
integer-returning expressions, exact-integer ratios left unrounded,
ln()-derived doubles rounded to 6dp on BOTH engines before they feed an
ORDER BY, window orderings made total with unique tiebreakers, NULL text
excluded explicitly on both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

PACK_CONTEXT_TOKENS = 2048  # context-window capacity for sequence_pack
PACK_SHARD_DOCS = 4096      # docs per sub-shard of the packing window
CONTAM_EVAL_MOD = 97        # doc_id % MOD == 0 -> held-out eval slice
TFIDF_TOP_K = 3


def _packed_bins(toks: DataFrame, shard_docs: int = PACK_SHARD_DOCS) -> DataFrame:
    """Assign each doc its pack ``bin_id`` without a per-source serial window.

    Semantics: ``bin_id = floor(tokens_before_doc / C)`` with docs ordered
    by doc_id within their source — identical to one cumulative-sum window
    partitioned by ``source``, but decomposed so no window partition scales
    with corpus size (a single hot source would otherwise serialize the
    whole pack on one task after the sort).

    Two-level exact decomposition (same trick as
    ``relational_ext.pareto_revenue_scale``):

    1. shard = ``doc_id div shard_docs`` — doc_id is monotone, so
       (shard, doc_id) order == doc_id order and shards are contiguous
       doc ranges; each (source, shard) window partition is ≤ shard_docs
       rows no matter how hot the source.
    2. ``local_before``: cumulative tokens before the doc WITHIN its
       (source, shard) partition.
    3. ``shard_before``: per-source cumulative total of preceding shards —
       a window over the per-shard AGGREGATE frame (one 24-byte row per
       shard, corpus/shard_docs rows: ~2.4 M rows for 10 B docs — the only
       per-source serial pass left, and it runs on totals, not docs).
    4. ``tokens_before = shard_before + local_before`` — exact, because
       shards partition each source's doc sequence into contiguous runs.
    """
    sharded = toks.withColumn("shard", F.expr(f"doc_id div {shard_docs}"))
    local = sharded.withColumn(
        "local_before",
        F.expr(
            "coalesce(sum(n_tokens) over ("
            "partition by source, shard order by doc_id "
            "rows between unbounded preceding and 1 preceding), 0)"
        ),
    )
    offsets = (
        sharded.groupBy("source", "shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .withColumn(
            "shard_before",
            F.expr(
                "coalesce(sum(shard_tokens) over ("
                "partition by source order by shard "
                "rows between unbounded preceding and 1 preceding), 0)"
            ),
        )
        .select("source", "shard", "shard_before")
    )
    return local.join(offsets, ["source", "shard"]).withColumn(
        "bin_id",
        F.expr(
            f"(shard_before + local_before) div {PACK_CONTEXT_TOKENS}"
        ),
    )


@register(
    "sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
        WHERE text IS NOT NULL
              AND source IS NOT NULL AND doc_id IS NOT NULL
    ),
    packed AS (
        SELECT source, doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) // {PACK_CONTEXT_TOKENS} AS bin_id
        FROM toks
    )
    SELECT source, CAST(bin_id AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS BIGINT) * 1.0 / {PACK_CONTEXT_TOKENS}
               AS fill_ratio
    FROM packed
    GROUP BY source, bin_id
    """,
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-token context windows, per source shard.

    Assignment rule: docs stream in doc_id order within their source;
    a doc lands in bin ``floor(tokens_before_it / C)`` — the standard
    streaming approximation of greedy packing (a bin may overflow by at
    most one document, never underfill by more than the next doc).

    Scale: the cumulative sum is decomposed over (source, doc_id div K)
    sub-shards with a per-shard offset pass (``_packed_bins``) — exact
    same bin assignment as one per-source window (the oracle keeps the
    single-window SQL as the semantic spec), but no window partition
    whose size scales with corpus size: a terabyte-hot source packs in
    parallel across its shards.  fill_ratio is an exact integer ratio
    (identical bigints ÷ constant) — bit-identical across engines
    unrounded.  NULL source/doc_id rows have no pack position —
    dropped on BOTH engines (null-catalog audit, r18: the NULL-source
    partition survives the oracle window but falls out of the shard
    decomposition's offset join; NULL doc_ids order differently per
    engine)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
        & F.col("source").isNotNull()
        & F.col("doc_id").isNotNull()
    )
    # the token frame feeds BOTH branches of the decomposition (doc-level
    # window + per-shard offsets) and is one 3-column row per doc — far
    # smaller than the input — so persist it rather than scanning the
    # corpus twice; materialize eagerly and unpersist before returning
    toks = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    ).persist()
    # integer `div` throughout (floating division would jitter at exact
    # capacity boundaries and diverge from the oracle)
    packed = _packed_bins(toks)
    out = (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens") * 1.0 / PACK_CONTEXT_TOKENS).alias(
                "fill_ratio"
            ),
        )
        .persist()
    )
    out.count()  # materialize through the cached token frame
    toks.unpersist()
    return out


@register(
    "benchmark_contamination",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id,
                     unnest(list_distinct(list_transform(
                         range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
                         i -> array_to_string(string_split(text,' ')[i:i+2], ' ')
                     ))) AS s
              FROM documents
              WHERE text IS NOT NULL)
    ),
    ev AS (SELECT doc_id, s FROM sh WHERE doc_id % {CONTAM_EVAL_MOD} = 0),
    corp AS (SELECT doc_id, s FROM sh WHERE doc_id % {CONTAM_EVAL_MOD} <> 0)
    SELECT corp.doc_id AS doc_id,
           CAST(COUNT(DISTINCT corp.s) AS BIGINT) AS n_shared_ngrams,
           CAST(COUNT(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs_hit
    FROM corp JOIN ev ON corp.s = ev.s
    GROUP BY corp.doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination scan: corpus docs sharing 3-gram text spans with a
    held-out eval slice (``doc_id % 97 == 0``).

    The shape every pretraining pipeline runs before training: an
    inverted-index join from corpus n-grams to eval n-grams, grouped per
    corpus doc.  Scale: the eval side is ~1% of the corpus; the join
    shuffles on the shingle value (hot shingles are stopword-y phrases —
    AQE skew-split territory), and at 100 TB the eval shingle index is
    the side you bucket or broadcast per partition.  Counts are exact
    integers on both engines."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        # single-row-group fixture: spread the shingle explode
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    from googlecloudstorage_blueprints_spark.functions.columns import (
        shingle_structs,
    )

    # codegen shingles (arrays_zip of shifted slices — no interpreted
    # lambda), deduped per doc to keep the join fan-out bounded.  The
    # distinct shingle frame feeds BOTH sides of the inverted-index join —
    # persist it so it is computed once, and materialize the result
    # eagerly so the cache can be dropped before returning (same hygiene
    # as minhash_lsh_dedup)
    sh = (
        d.select(
            "doc_id", F.explode_outer(shingle_structs("text", 3)).alias("p")
        )
        .select(
            "doc_id", F.concat_ws(" ", "p.0", "p.1", "p.2").alias("s")
        )
        .dropDuplicates(["doc_id", "s"])
        .persist()
    )
    ev = sh.where(F.col("doc_id") % CONTAM_EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc_id"), "s"
    )
    corp = sh.where(F.col("doc_id") % CONTAM_EVAL_MOD != 0)
    out = (
        corp.join(ev, "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_ngrams"),
            F.countDistinct("eval_doc_id").alias("n_eval_docs_hit"),
        )
        .persist()
    )
    out.count()  # materialize through the cached shingle frame
    sh.unpersist()
    return out


@register(
    "tfidf_topk",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    ),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM words GROUP BY doc_id, w),
    df AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM words GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents WHERE text IS NOT NULL),
    scored AS (
        SELECT tf.doc_id, tf.w AS term, tf.tf,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6)
                   AS tfidf
        FROM tf JOIN df ON tf.w = df.w CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tf, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term ASC
               ) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT doc_id, term, tf, tfidf, rnk
    FROM ranked WHERE rnk <= {TFIDF_TOP_K}
    """,
)
def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} characteristic terms per document by TF-IDF.

    tfidf = tf · ln(N / df), rounded to 6dp on BOTH engines BEFORE the
    ranking window reads it — ln() may differ between engines in the
    last ulp, and an unrounded ORDER BY would let that flip ranks.  The
    window is made total with a ``term ASC`` tiebreaker.

    Scale: two hash-aggregates (tf, df) plus one broadcast scalar (N)
    and a per-doc window.  The tf⋈df join carries NO broadcast hint: on a
    raw web corpus the distinct-term table is billions of rows (typos,
    code, CJK segments) — far past broadcastable — so the safe default is
    a shuffle on ``w`` (both aggregates already partition by ``w``-derived
    keys) and AQE upgrades to broadcast at runtime only when the measured
    df side is actually small.  Nothing orders globally."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = (
        d.select("doc_id", F.explode_outer(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )
    tf = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = words.groupBy("w").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.col("w").alias("term"),
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn(
            "rnk", F.row_number().over(w_rank).cast("long")
        )
        .where(F.col("rnk") <= TFIDF_TOP_K)
    )


MIXTURE_ALPHA = 0.7  # temperature exponent for source reweighting


@register(
    "source_mixture_weights",
    oracle=f"""
    WITH per_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL
        GROUP BY source
    ),
    tot AS (
        SELECT SUM(pow(n_tokens, {MIXTURE_ALPHA})) AS z,
               CAST(SUM(n_tokens) AS BIGINT)       AS t
        FROM per_src
    )
    SELECT source, n_docs, n_tokens,
           round(pow(n_tokens, {MIXTURE_ALPHA}) / z, 6) AS weight,
           round((pow(n_tokens, {MIXTURE_ALPHA}) / z)
                 / (CAST(n_tokens AS DOUBLE) / t), 6)   AS boost
    FROM per_src CROSS JOIN tot
    """,
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based pretraining mixture: sampling weight per source
    ∝ tokens^α (α={alpha}) — the standard recipe for upweighting small
    high-quality sources against a dominant crawl (GPT-3/LLaMA-style
    data mixtures; α=1 is proportional, α=0 uniform).

    ``weight`` is each source's share of the training mixture; ``boost``
    is weight ÷ natural share — >1 means the source is oversampled.

    Scale: one token-count aggregate over the corpus (map-side partial
    sum of size(split())), then a |sources|-row frame crossed with a
    1-row normalizer — everything after the first aggregate is
    scalar-sized.  pow()-derived doubles are rounded 6dp on BOTH engines
    before output (libm last-ulp drift), same convention as tfidf's ln.
    """
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("long")).alias("n_tokens"),
    )
    w_raw = F.pow(F.col("n_tokens"), MIXTURE_ALPHA)
    tot = per_src.agg(
        F.sum(F.pow(F.col("n_tokens"), MIXTURE_ALPHA)).alias("z"),
        F.sum("n_tokens").alias("t"),
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(w_raw / F.col("z"), 6).alias("weight"),
        F.round(
            (w_raw / F.col("z"))
            / (F.col("n_tokens").cast("double") / F.col("t")),
            6,
        ).alias("boost"),
    )


source_mixture_weights.__doc__ = source_mixture_weights.__doc__.format(
    alpha=MIXTURE_ALPHA
)


@register(
    "source_vocab_overlap",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT source, w
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    ),
    sizes AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS vsize
        FROM vocab GROUP BY source
    ),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(COUNT(*) AS BIGINT) AS common_words
        FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b, p.common_words,
           p.common_words * 1.0
               / (sa.vsize + sb.vsize - p.common_words) AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.source = p.source_a
    JOIN sizes sb ON sb.source = p.source_b
    """,
)
def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source redundancy: vocabulary Jaccard between every pair
    of sources — the corpus-curation probe for "are these two crawls the
    same thing twice" before spending dedup compute on them.

    Scale: the join is keyed on the WORD with fan-out bounded by
    |sources|² per word (sources are dozens, not data-sized), so hot
    stopwords cannot blow up the shuffle the way doc-keyed pair joins
    do; the distinct-vocab frame is one hash-aggregate.  jaccard is an
    exact integer ratio (bigints ÷ bigints) — bit-identical across
    engines unrounded."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    # the distinct-vocab frame feeds THREE consumers (sizes + both join
    # sides): persist it so the explode+distinct runs once, materialize
    # the |sources|²-row result eagerly, unpersist before returning
    vocab = (
        d.select(
            "source", F.explode_outer(F.split("text", " ")).alias("w")
        )
        .where(F.col("w") != "")
        .distinct()
        .persist()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("vsize"))
    a = vocab.alias("a")
    b = vocab.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("common_words"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        pairs.join(
            F.broadcast(sa), F.col("source_a") == F.col("sa.source")
        )
        .join(F.broadcast(sb), F.col("source_b") == F.col("sb.source"))
        .select(
            "source_a",
            "source_b",
            "common_words",
            (
                F.col("common_words")
                * 1.0
                / (
                    F.col("sa.vsize")
                    + F.col("sb.vsize")
                    - F.col("common_words")
                )
            ).alias("jaccard"),
        )
        .persist()
    )
    out.count()  # materialize through the cached vocab frame
    vocab.unpersist()
    return out


# docs drawn when materializing the temperature mixture (constant across
# SFs: the mixture is a per-source quota, not a fraction of the corpus)
MIXTURE_SAMPLE_TOTAL = 200


def _mixture_resample_oracle() -> str:
    from googlecloudstorage_blueprints_spark.operators import REGISTRY

    weights_sql = REGISTRY["source_mixture_weights"].oracle
    return f"""
    WITH w AS ({weights_sql}),
    quota AS (
        SELECT source,
               CAST(FLOOR(weight * {MIXTURE_SAMPLE_TOTAL}) AS BIGINT)
                   AS quota
        FROM w
    ),
    ranked AS (
        SELECT source, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS sample_rank
        FROM documents WHERE text IS NOT NULL
    )
    SELECT r.source, r.doc_id, r.sample_rank, q.quota
    FROM ranked r JOIN quota q ON q.source = r.source
    WHERE r.sample_rank <= q.quota
    """


@register("mixture_resample", oracle=_mixture_resample_oracle())
def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature-based training mixture: draw each
    source's quota of {total} docs per ``source_mixture_weights`` — the
    APPLY step of the mixture recipe (the weights op sizes the mixture;
    this emits the actual reproducible sample a training run reads).

    Deterministic sampling by md5(doc_id) order (the
    ``uniform_sample_hash`` convention — same sample on every run,
    retry, and engine; no RNG state, no driver pass), with the
    per-source quota joined from the |sources|-row weight frame
    (broadcast).  The rank window computes a partial top-k per
    partition before its shuffle, so only candidate rows move.
    Parity: quota = FLOOR(6dp-rounded weight × {total}) — FLOOR of an
    identical double on both engines; ranks are BIGINT."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    weights = source_mixture_weights(spark, sf_dir).select(
        "source",
        F.floor(F.col("weight") * MIXTURE_SAMPLE_TOTAL)
        .cast("long")
        .alias("quota"),
    )
    hkey = F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8"))
    w = Window.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id"))
    ranked = d.select(
        "source",
        "doc_id",
        F.row_number().over(w).cast("long").alias("sample_rank"),
    )
    return (
        ranked.join(F.broadcast(weights), "source")
        .where(F.col("sample_rank") <= F.col("quota"))
        .select("source", "doc_id", "sample_rank", "quota")
    )


mixture_resample.__doc__ = mixture_resample.__doc__.format(
    total=MIXTURE_SAMPLE_TOTAL
)


# a bin whose fill is below this is "underfilled" (wasted context window)
PACK_UNDERFILL = 0.5


def _packing_efficiency_oracle() -> str:
    from googlecloudstorage_blueprints_spark.operators import REGISTRY

    pack_sql = REGISTRY["sequence_pack"].oracle
    return f"""
    WITH bins AS ({pack_sql})
    SELECT source,
           CAST(COUNT(*) AS BIGINT)           AS n_bins,
           CAST(SUM(total_tokens) AS BIGINT)  AS total_tokens,
           CAST(SUM(total_tokens) AS DOUBLE)
               / (COUNT(*) * {PACK_CONTEXT_TOKENS}.0) AS mean_fill,
           CAST(SUM(CASE WHEN fill_ratio < {PACK_UNDERFILL}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_underfilled,
           CAST(MAX(total_tokens) AS BIGINT)  AS max_bin_tokens
    FROM bins
    GROUP BY source
    ORDER BY source
    """


@register("packing_efficiency_report", oracle=_packing_efficiency_oracle())
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup of ``sequence_pack``'s bins into the per-source packing
    scorecard a training run reads before committing a layout: bin
    count, mean fill, underfilled-bin count (wasted context windows —
    the padding a packer exists to eliminate), and the largest bin (an
    overflow sentinel: the streaming rule may overflow by at most one
    document).

    Composes the registered packer — same bins, one extra
    |sources|-row aggregate.  Parity: mean_fill divides exact integers
    by a constant; fill_ratio is already exact, so the underfill
    comparison is exact on both engines."""
    bins = sequence_pack(spark, sf_dir)
    out = bins.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("total_tokens").cast("long").alias("total_tokens"),
        (
            F.sum("total_tokens").cast("double")
            / (F.count(F.lit(1)) * F.lit(float(PACK_CONTEXT_TOKENS)))
        ).alias("mean_fill"),
        F.sum(
            F.when(F.col("fill_ratio") < PACK_UNDERFILL, 1).otherwise(0)
        ).cast("long").alias("n_underfilled"),
        F.max("total_tokens").cast("long").alias("max_bin_tokens"),
    )
    out = out.orderBy("source").persist()
    out.count()  # materialize before the packer's cached frames free
    bins.unpersist()
    return out


# --------------------------------------------------------------------------
# token-budget allocation across sources (largest-remainder method)
# --------------------------------------------------------------------------

TOKEN_BUDGET = 100_000


@register(
    "source_token_budget_split",
    oracle=f"""
    WITH words AS (
        SELECT source
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    ),
    tok AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM words GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM tok),
    base AS (
        SELECT source, n_tokens,
               CAST(n_tokens * {TOKEN_BUDGET} // t AS BIGINT) AS floor_alloc,
               CAST(n_tokens * {TOKEN_BUDGET} % t AS BIGINT)  AS rem
        FROM tok CROSS JOIN tot
    ),
    need AS (SELECT CAST({TOKEN_BUDGET} - SUM(floor_alloc) AS BIGINT)
                 AS extra FROM base),
    ranked AS (
        SELECT source, n_tokens, floor_alloc,
               CAST(ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                    AS BIGINT) AS rk
        FROM base
    )
    SELECT r.source, r.n_tokens,
           CAST(r.floor_alloc
                + CASE WHEN r.rk <= n.extra THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens
    FROM ranked r CROSS JOIN need n
    ORDER BY r.source
    """,
)
def source_token_budget_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Integer allocation of a {TOKEN_BUDGET}-token training budget
    across sources, proportional to each source's token count, by the
    LARGEST-REMAINDER method — allocations sum to the budget EXACTLY
    (floor quotas + one extra token to the largest remainders), the
    property every mixture sampler downstream assumes
    (``mixture_resample`` consumes exactly this kind of table).

    Shape: one token-count aggregate, a scalar total, then pure integer
    arithmetic over the |sources|-row frame (the remainder-rank window
    is dimension-bounded).  Parity: quotas and remainders are exact
    integer div/mod (both engines floor for positives); the remainder
    tie breaks on source.  Scale note: ``n_tokens × budget`` stays in
    BIGINT while corpus tokens < 2⁶³/budget ≈ 9e13 — ~90T tokens at
    this budget; beyond that, pre-divide the counts."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    words = d.select(
        "source", F.explode_outer(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    tok = words.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    tot = tok.agg(F.sum("n_tokens").cast("long").alias("t"))
    base = tok.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        F.expr(f"CAST(n_tokens * {TOKEN_BUDGET} div t AS BIGINT)").alias(
            "floor_alloc"
        ),
        F.expr(f"CAST(n_tokens * {TOKEN_BUDGET} % t AS BIGINT)").alias(
            "rem"
        ),
    )
    need = base.agg(
        (F.lit(TOKEN_BUDGET) - F.sum("floor_alloc"))
        .cast("long")
        .alias("extra")
    )
    w = Window.orderBy(F.col("rem").desc(), "source")
    ranked = base.select(
        "source",
        "n_tokens",
        "floor_alloc",
        F.row_number().over(w).cast("long").alias("rk"),
    )
    return sort_bounded(
        ranked.crossJoin(F.broadcast(need)).select(
            "source",
            "n_tokens",
            (
                F.col("floor_alloc")
                + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc_tokens"),
        ),
        "source",
    )


source_token_budget_split.__doc__ = source_token_budget_split.__doc__.replace(
    "{TOKEN_BUDGET}", str(TOKEN_BUDGET)
)


# --------------------------------------------------------------------------
# temperature-scaled source mixture weights (τ-sampling)
# --------------------------------------------------------------------------

MIX_TEMPERATURE = 0.7


@register(
    "source_temperature_weights",
    oracle=f"""
    WITH words AS (
        SELECT source
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    ),
    tok AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM words GROUP BY source),
    powed AS (
        SELECT source, n_tokens,
               CAST(ROUND(pow(CAST(n_tokens AS DOUBLE),
                              {MIX_TEMPERATURE}) * 1000000, 0)
                    AS BIGINT) AS p6
        FROM tok
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
                   CAST(SUM(p6) AS BIGINT)       AS tp
            FROM powed)
    SELECT p.source, p.n_tokens,
           CAST(p.n_tokens AS DOUBLE) / t.t AS weight_prop,
           CAST(p.p6 AS DOUBLE) / t.tp      AS weight_temp
    FROM powed p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def source_temperature_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled mixture weights: w_s ∝ tokens_s^τ with
    τ = {MIX_TEMPERATURE} — the standard LM-pretraining rebalance that
    up-samples small high-quality sources relative to raw proportional
    sampling (τ = 1).  Emitted beside the proportional weight so the
    rebalancing effect is visible per source;
    ``source_token_budget_split`` turns either column into exact token
    quotas.

    Shape: one token-count aggregate and a broadcast scalar pair.
    Parity: pow() doubles may differ cross-engine in the last ulp →
    fixed-pointed ×1e6 to BIGINT immediately (the r5 pow/ln rule, made
    integer per r7); both weights are then unrounded exact-integer
    ratios (r2 rule)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    words = d.select(
        "source", F.explode_outer(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    tok = words.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    powed = tok.select(
        "source",
        "n_tokens",
        F.round(
            F.pow(F.col("n_tokens").cast("double"), MIX_TEMPERATURE)
            * 1000000,
            0,
        )
        .cast("long")
        .alias("p6"),
    )
    tot = powed.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.sum("p6").cast("long").alias("tp"),
    )
    return sort_bounded(
        powed.crossJoin(F.broadcast(tot)).select(
            "source",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("t")).alias(
                "weight_prop"
            ),
            (F.col("p6").cast("double") / F.col("tp")).alias(
                "weight_temp"
            ),
        ),
        "source",
    )


source_temperature_weights.__doc__ = (
    source_temperature_weights.__doc__.replace(
        "{MIX_TEMPERATURE}", str(MIX_TEMPERATURE)
    )
)


# --------------------------------------------------------------------------
# length-curriculum stages (r11)
# --------------------------------------------------------------------------

CURRICULUM_BOUNDS = (100, 200, 400)  # n_chars cuts -> 4 stages


@register(
    "length_curriculum_stages",
    oracle=f"""
    WITH staged AS (
        SELECT CASE WHEN n_chars < {CURRICULUM_BOUNDS[0]} THEN 0
                    WHEN n_chars < {CURRICULUM_BOUNDS[1]} THEN 1
                    WHEN n_chars < {CURRICULUM_BOUNDS[2]} THEN 2
                    ELSE 3 END AS stage,
               n_chars,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents WHERE text IS NOT NULL
    ),
    per AS (
        SELECT CAST(stage AS BIGINT) AS stage,
               CAST(COUNT(*) AS BIGINT)      AS n_docs,
               CAST(SUM(n_chars) AS BIGINT)  AS total_chars,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM staged GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(total_chars) AS BIGINT) AS all_chars
            FROM per)
    SELECT per.stage, per.n_docs, per.total_chars, per.total_tokens,
           CAST(per.total_chars AS DOUBLE) / tot.all_chars
               AS char_share,
           CAST(CAST(SUM(per.total_chars) OVER (
                    ORDER BY per.stage ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS DOUBLE) / tot.all_chars
               AS cum_char_share
    FROM per CROSS JOIN tot
    ORDER BY stage
    """,
)
def length_curriculum_stages(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-curriculum stage table: documents cut into short→long
    stages at fixed n_chars bounds, with per-stage doc/char/token
    budgets and the cumulative char share — the schedule a
    curriculum-ordered pretraining run feeds from (start on stage 0,
    unlock the next when the cumulative share crosses the plan;
    ``sequence_pack`` then packs within a stage).

    Shape: one scan computing stage + token count in-row (no explode —
    len(split) is codegen), a 4-row stage rollup, and the cumulative
    window over that 4-row LEDGER only.  Parity: integer stage cuts
    (no double can sit on a boundary), exact BIGINT budgets, shares
    unrounded exact-integer ratios."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    b = CURRICULUM_BOUNDS
    stage = (
        F.when(F.col("n_chars") < b[0], 0)
        .when(F.col("n_chars") < b[1], 1)
        .when(F.col("n_chars") < b[2], 2)
        .otherwise(3)
    )
    per = (
        d.select(
            stage.cast("long").alias("stage"),
            "n_chars",
            F.size(F.split("text", " ")).alias("n_tokens"),
        )
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    tot = per.agg(F.sum("total_chars").cast("long").alias("all_chars"))
    w = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return sort_bounded(
        per.crossJoin(F.broadcast(tot)).select(
            "stage",
            "n_docs",
            "total_chars",
            "total_tokens",
            (
                F.col("total_chars").cast("double") / F.col("all_chars")
            ).alias("char_share"),
            (
                F.sum("total_chars").over(w).cast("long").cast("double")
                / F.col("all_chars")
            ).alias("cum_char_share"),
        ),
        "stage",
    )


# ---------------------------------------------------------------------------
# context-window coverage (r11 wave 3)
# ---------------------------------------------------------------------------

CONTEXT_WINDOWS_TOKENS = (32, 64, 128, 512, 2048)


@register(
    "doc_context_window_coverage",
    oracle=f"""
    WITH per AS (
        SELECT CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))
                    AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL
    ),
    w AS (
        SELECT unnest([{", ".join(str(w) for w in CONTEXT_WINDOWS_TOKENS)}])
                   AS window_tokens
    )
    SELECT CAST(w.window_tokens AS BIGINT) AS window_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN p.n_tokens <= w.window_tokens
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_fit,
           CAST(SUM(CASE WHEN p.n_tokens <= w.window_tokens
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS fit_share,
           CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(least(p.n_tokens, CAST(w.window_tokens AS BIGINT)))
                AS BIGINT) AS kept_tokens,
           CAST(SUM(least(p.n_tokens, CAST(w.window_tokens AS BIGINT)))
                AS DOUBLE) / NULLIF(SUM(p.n_tokens), 0) AS kept_share
    FROM per p CROSS JOIN w
    GROUP BY w.window_tokens
    ORDER BY window_tokens
    """,
)
def doc_context_window_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Context-window planning sweep: for each candidate window size,
    the share of docs that FIT whole and the share of corpus tokens a
    truncate-at-window policy KEEPS — the table that decides whether a
    longer-context run buys real data (a kept_share jump 512→2048 says
    the corpus has long-document mass worth paying attention for),
    where ``length_curriculum_stages`` orders docs and
    ``packing_efficiency_report`` measures bin fill, neither answers
    fit-vs-truncate.

    Shape: the per-doc token count is computed ONCE inside the scan
    (JVM regexp codegen, the ``token_count`` convention), then each doc
    meets the |windows|-row literal (5-row broadcast crossJoin — one
    scan, not five; the same sweep shape as
    ``sessionize_gap_sensitivity``/``dedup_threshold_sensitivity``).
    Parity: counts and least() mins are exact BIGINT; both shares
    unrounded exact-integer ratios (denominators NULLIF-guarded /
    ≥ n_docs ≥ 1)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    per = d.select(
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)"))
        .cast("long")
        .alias("n_tokens")
    )
    w = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x) for x in CONTEXT_WINDOWS_TOKENS])
        ).alias("window_tokens")
    )
    fit = F.when(
        F.col("n_tokens") <= F.col("window_tokens").cast("long"), 1
    ).otherwise(0)
    kept = F.least(
        F.col("n_tokens"), F.col("window_tokens").cast("long")
    )
    return sort_bounded(
        per.crossJoin(F.broadcast(w))
        .groupBy("window_tokens")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(fit).cast("long").alias("n_docs_fit"),
            (F.sum(fit).cast("double") / F.count(F.lit(1))).alias(
                "fit_share"
            ),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(kept).cast("long").alias("kept_tokens"),
            (
                F.sum(kept).cast("double")
                / F.nullif(F.sum("n_tokens"), F.lit(0))
            ).alias("kept_share"),
        )
        .select(
            F.col("window_tokens").cast("long").alias("window_tokens"),
            "n_docs",
            "n_docs_fit",
            "fit_share",
            "total_tokens",
            "kept_tokens",
            "kept_share",
        ),
        "window_tokens",
    )


# ---------------------------------------------------------------------------
# contamination n-gram-length sensitivity (r12)
# ---------------------------------------------------------------------------

# 3 = the production scan's n (benchmark_contamination); 8/13 = the
# Brown et al. / GPT-3 decontamination conventions
CONTAM_NGRAM_SWEEP = (3, 8, 13)


def _contam_sweep_oracle() -> str:
    per_n = "\n        UNION ALL\n".join(
        f"""
        SELECT {n} AS ngram_len, doc_id, s
        FROM (SELECT DISTINCT doc_id,
                     unnest(list_distinct(list_transform(
                         range(1, greatest(len(string_split(text,' ')) - {n - 1}, 1) + 1),
                         i -> array_to_string(string_split(text,' ')[i:i+{n - 1}], ' ')
                     ))) AS s
              FROM documents
              WHERE text IS NOT NULL)"""
        for n in CONTAM_NGRAM_SWEEP
    )
    sweep = ", ".join(str(n) for n in CONTAM_NGRAM_SWEEP)
    return f"""
    WITH sh AS ({per_n}
    ),
    ev   AS (SELECT * FROM sh WHERE doc_id % {CONTAM_EVAL_MOD} = 0),
    corp AS (SELECT * FROM sh WHERE doc_id % {CONTAM_EVAL_MOD} <> 0),
    hits AS (
        SELECT corp.ngram_len,
               CAST(COUNT(DISTINCT corp.doc_id) AS BIGINT) AS n_flagged_docs,
               CAST(COUNT(DISTINCT ev.doc_id) AS BIGINT)   AS n_eval_docs_hit,
               CAST(COUNT(DISTINCT corp.s) AS BIGINT)      AS n_shared_ngrams
        FROM corp JOIN ev
          ON ev.ngram_len = corp.ngram_len AND ev.s = corp.s
        GROUP BY corp.ngram_len
    ),
    t AS (SELECT unnest([{sweep}]) AS ngram_len),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus_docs
           FROM documents
           WHERE text IS NOT NULL AND doc_id % {CONTAM_EVAL_MOD} <> 0)
    SELECT CAST(t.ngram_len AS BIGINT)  AS ngram_len,
           COALESCE(h.n_flagged_docs, 0)  AS n_flagged_docs,
           COALESCE(h.n_eval_docs_hit, 0) AS n_eval_docs_hit,
           COALESCE(h.n_shared_ngrams, 0) AS n_shared_ngrams,
           CAST(COALESCE(h.n_flagged_docs, 0) AS DOUBLE)
               / NULLIF(nd.n_corpus_docs, 0) AS flagged_share
    FROM t
    LEFT JOIN hits h ON h.ngram_len = t.ngram_len
    CROSS JOIN nd
    ORDER BY ngram_len
    """


@register("contamination_ngram_sensitivity", oracle=_contam_sweep_oracle())
def contamination_ngram_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """How much does the decontamination verdict depend on the n-gram
    length?  ``benchmark_contamination`` scans at the production n=3;
    this sweeps {3, 8, 13} (8/13-gram being the Brown et al./GPT-3
    conventions) and reports, per length, how many corpus docs share at
    least one n-gram with the held-out eval slice — the sweep an eval
    owner runs before a release: if flagged docs collapse between 3 and
    8, the 3-gram scan is mostly stopword-phrase noise; if 13-gram
    still flags, those are verbatim spans.

    Shape: ONE corpus scan — the persisted documents frame feeds a
    union of three codegen shingle branches (arrays_zip of shifted
    slices per n, the r5 in-row rule), then ONE inverted-index join
    keyed on (ngram_len, s) covers every length, closing to a
    |sweep|-row summary.  Missing lengths are restored by a LEFT join
    from the sweep literal (empty rows always emit — at 13 the fixture
    output IS empty, so the planted verbatim-span test in
    tests/test_new_ops_r12b.py pins the detection path).  Parity:
    counts exact BIGINT; flagged_share an unrounded exact-integer
    ratio; truncated shingles for docs shorter than n agree with the
    oracle's inclusive-slice construction (benchmark_contamination
    precedent)."""
    from googlecloudstorage_blueprints_spark.functions.columns import (
        shingle_structs,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", "text")
        .persist()
    )
    branches = []
    for n in CONTAM_NGRAM_SWEEP:
        branches.append(
            d.select(
                "doc_id",
                F.explode_outer(shingle_structs("text", n)).alias("p"),
            )
            .select(
                F.lit(n).alias("ngram_len"),
                "doc_id",
                F.concat_ws(
                    " ", *[f"p.{i}" for i in range(n)]
                ).alias("s"),
            )
            .dropDuplicates(["ngram_len", "doc_id", "s"])
        )
    sh = branches[0]
    for b in branches[1:]:
        sh = sh.unionByName(b)
    ev = sh.where(F.col("doc_id") % CONTAM_EVAL_MOD == 0).select(
        "ngram_len", F.col("doc_id").alias("eval_doc_id"), "s"
    )
    corp = sh.where(F.col("doc_id") % CONTAM_EVAL_MOD != 0)
    hits = (
        corp.join(ev, ["ngram_len", "s"])
        .groupBy("ngram_len")
        .agg(
            F.countDistinct("doc_id").cast("long").alias(
                "n_flagged_docs"
            ),
            F.countDistinct("eval_doc_id")
            .cast("long")
            .alias("n_eval_docs_hit"),
            F.countDistinct("s").cast("long").alias("n_shared_ngrams"),
        )
    )
    nd = d.where(F.col("doc_id") % CONTAM_EVAL_MOD != 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus_docs")
    )
    t = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(n) for n in CONTAM_NGRAM_SWEEP])
        ).alias("ngram_len")
    )
    out = sort_bounded(
        t.join(hits, "ngram_len", "left")
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("ngram_len").cast("long").alias("ngram_len"),
            F.coalesce(F.col("n_flagged_docs"), F.lit(0))
            .cast("long")
            .alias("n_flagged_docs"),
            F.coalesce(F.col("n_eval_docs_hit"), F.lit(0))
            .cast("long")
            .alias("n_eval_docs_hit"),
            F.coalesce(F.col("n_shared_ngrams"), F.lit(0))
            .cast("long")
            .alias("n_shared_ngrams"),
            (
                F.coalesce(F.col("n_flagged_docs"), F.lit(0)).cast(
                    "double"
                )
                / F.nullif(F.col("n_corpus_docs"), F.lit(0))
            ).alias("flagged_share"),
        ),
        "ngram_len",
    ).persist()
    out.count()  # materialize through the cached documents frame
    d.unpersist()
    return out


# --------------------------------------------------------------------------
# worker shard balance (r12c) — will the readers starve?
# --------------------------------------------------------------------------

SHARD_WORKERS = 32


@register(
    "worker_shard_balance",
    oracle=f"""
    WITH per AS (
        SELECT doc_id % {SHARD_WORKERS} AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        FROM documents WHERE text IS NOT NULL
    ),
    shards AS (
        SELECT shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS n_tokens
        FROM per GROUP BY shard
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
               CAST(COUNT(*) AS BIGINT)      AS k,
               CAST(MAX(n_tokens) AS BIGINT) AS mx,
               CAST(MIN(n_tokens) AS BIGINT) AS mn
        FROM shards
    )
    SELECT CAST(shard AS BIGINT) AS shard, n_docs, n_tokens,
           CAST(n_tokens AS DOUBLE) * (SELECT k FROM tot)
               / (SELECT t FROM tot)              AS load_factor,
           CAST((SELECT mx FROM tot) AS DOUBLE)
               / (SELECT mn FROM tot)             AS max_min_ratio
    FROM shards ORDER BY shard
    """,
)
def worker_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-loader shard balance: documents dealt to {SHARD_WORKERS}
    workers by ``doc_id % {SHARD_WORKERS}`` (the deterministic reader
    assignment a fixed-host training job uses), with per-shard doc and
    token loads, each shard's load factor vs the uniform ideal, and the
    global max/min straggler ratio — the number that decides whether
    epoch time is gated by one hot reader.  ``source_token_budget_split``
    plans WHAT each source contributes; this checks WHERE it lands.

    Shape: one scan, one {SHARD_WORKERS}-row keyed aggregate, a 1-row
    total joined back as a broadcast literal.  Parity: the shard key is
    pure-integer modulo (never an engine hash — Spark's murmur3 and
    DuckDB's hash disagree by construction); counts exact BIGINTs; the
    load factor and straggler ratio are unrounded exact-integer ratios
    (denominators ≥ 1: every shard row carries ≥ 1 doc).  The min over
    PRESENT shards equals the true min whenever all {SHARD_WORKERS}
    shards are hit (fixture asserts it); empty shards would need a
    worker spine — deliberately omitted to keep the op spine-free."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    per = d.select(
        (F.col("doc_id") % SHARD_WORKERS).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    shards = per.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
    )
    tot = shards.agg(
        F.sum("n_tokens").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("n_tokens").cast("long").alias("mx"),
        F.min("n_tokens").cast("long").alias("mn"),
    )
    return sort_bounded(
        shards.crossJoin(F.broadcast(tot)).select(
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "n_tokens",
            (
                F.col("n_tokens").cast("double")
                * F.col("k")
                / F.col("t")
            ).alias("load_factor"),
            (F.col("mx").cast("double") / F.col("mn")).alias(
                "max_min_ratio"
            ),
        ),
        "shard",
    )


worker_shard_balance.__doc__ = worker_shard_balance.__doc__.format(
    SHARD_WORKERS=SHARD_WORKERS
)


# --------------------------------------------------------------------------
# capped epoch water-filling (r12c) — the data-constrained scaling plan
# --------------------------------------------------------------------------

WATERFILL_BUDGET_MULT = 2  # token budget = 2 x the corpus
WATERFILL_EPOCH_CAP = 4   # no source repeats more than 4 epochs
WATERFILL_TAU = 0.5       # temperature on the proportional weights


@register(
    "source_epoch_waterfill",
    oracle=f"""
    WITH per AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS n_tokens
        FROM documents WHERE text IS NOT NULL
        GROUP BY source
    ),
    wtd AS (
        SELECT source, n_tokens,
               CAST(ROUND(POWER(CAST(n_tokens AS DOUBLE),
                                {WATERFILL_TAU}) * 1000000, 0) AS BIGINT)
                   AS w_e6,
               CAST({WATERFILL_EPOCH_CAP} * n_tokens AS BIGINT) AS cap
        FROM per
    ),
    tot AS (
        SELECT CAST(SUM(n_tokens) * {WATERFILL_BUDGET_MULT} AS BIGINT)
                   AS budget,
               CAST(SUM(w_e6) AS BIGINT) AS w_tot
        FROM wtd
    ),
    ordered AS (
        SELECT wtd.*, tot.budget,
               COALESCE(CAST(SUM(cap) OVER (
                   ORDER BY cap * 1000000 // w_e6, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS pc_prev,
               tot.w_tot - COALESCE(CAST(SUM(w_e6) OVER (
                   ORDER BY cap * 1000000 // w_e6, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS BIGINT), 0) AS sw_prev
        FROM wtd, tot
    ),
    flagged AS (
        SELECT *,
               CASE WHEN (budget - pc_prev) * w_e6 >= cap * sw_prev
                    THEN 1 ELSE 0 END AS capped
        FROM ordered
    ),
    pools AS (
        SELECT CAST(COALESCE(SUM(CASE WHEN capped = 1 THEN cap END), 0)
                    AS BIGINT) AS capped_cap,
               CAST(COALESCE(SUM(CASE WHEN capped = 0 THEN w_e6 END), 0)
                    AS BIGINT) AS free_w
        FROM flagged
    )
    SELECT f.source,
           f.n_tokens,
           f.w_e6 AS weight_e6,
           CAST(f.capped AS BIGINT) AS capped,
           CAST(CASE WHEN f.capped = 1 THEN f.cap
                     ELSE (f.budget - p.capped_cap) * f.w_e6
                          // NULLIF(p.free_w, 0)
                END AS BIGINT) AS alloc_tokens,
           CAST((CASE WHEN f.capped = 1 THEN f.cap
                      ELSE (f.budget - p.capped_cap) * f.w_e6
                           // NULLIF(p.free_w, 0)
                 END) * 1000000 // f.n_tokens AS BIGINT) AS epochs_e6
    FROM flagged f, pools p
    ORDER BY f.source
    """,
)
def source_epoch_waterfill(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The data-constrained scaling plan (Muennighoff et al.): given a
    token budget of {WATERFILL_BUDGET_MULT}× the corpus and a
    {WATERFILL_EPOCH_CAP}-epoch repeat cap per source, water-fill the
    budget across sources proportionally to temperature weights
    w_s = tokens_s^{WATERFILL_TAU} — small high-weight sources hit the
    repeat cap and their unfilled demand overflows to the rest.
    ``source_token_budget_split`` divides a budget with NO cap;
    ``source_temperature_weights`` stops at the weights; this is the
    allocation a data-constrained pretraining run actually executes
    (alloc_tokens and fractional epochs_e6 per source).

    Shape: one token-count scan, then ALL waterfill algebra on the
    |sources|-bounded frame (one ordered window for the prefix pools,
    one bounded conditional aggregate, one broadcast join).  Parity:
    the cap ratio order key is pure-integer (cap·1e6 div w_e6, source
    tiebreak); the cap test cross-multiplies BIGINTs — never a double
    water level; sqrt is IEEE-correctly-rounded on both engines so the
    ×1e6-at-birth weight is identical (the temperature-weights rule);
    allocations and epochs are integer-div truncations with explicit
    NULLIF on the all-capped edge (budget > total cap leaves free_w=0;
    fixture budget can't reach it — planted).  Capping is prefix-closed
    in ratio order (standard waterfill lemma), pinned planted.  At
    extreme corpus sizes the cross-products approach BIGINT range —
    promote to DECIMAL(38,0); ANSI mode fails loudly."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")))
        .cast("long")
        .alias("n_tokens")
    )
    wtd = per.select(
        "source",
        "n_tokens",
        F.round(
            F.pow(F.col("n_tokens").cast("double"), WATERFILL_TAU)
            * 1_000_000,
            0,
        )
        .cast("long")
        .alias("w_e6"),
        (F.lit(WATERFILL_EPOCH_CAP) * F.col("n_tokens"))
        .cast("long")
        .alias("cap"),
    )
    tot = wtd.agg(
        (F.sum("n_tokens") * WATERFILL_BUDGET_MULT)
        .cast("long")
        .alias("budget"),
        F.sum("w_e6").cast("long").alias("w_tot"),
    )
    w = (
        Window.orderBy(F.expr("cap * 1000000 div w_e6"), F.col("source"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # bounded: |sources| frame
    ordered = wtd.crossJoin(F.broadcast(tot)).select(
        "*",
        F.coalesce(F.sum("cap").over(w), F.lit(0))
        .cast("long")
        .alias("pc_prev"),
        (
            F.col("w_tot")
            - F.coalesce(F.sum("w_e6").over(w), F.lit(0))
        )
        .cast("long")
        .alias("sw_prev"),
    )
    flagged = ordered.select(
        "*",
        F.when(
            (F.col("budget") - F.col("pc_prev")) * F.col("w_e6")
            >= F.col("cap") * F.col("sw_prev"),
            1,
        )
        .otherwise(0)
        .alias("capped"),
    )
    pools = flagged.agg(
        F.coalesce(
            F.sum(F.when(F.col("capped") == 1, F.col("cap"))), F.lit(0)
        )
        .cast("long")
        .alias("capped_cap"),
        F.coalesce(
            F.sum(F.when(F.col("capped") == 0, F.col("w_e6"))), F.lit(0)
        )
        .cast("long")
        .alias("free_w"),
    )
    alloc = F.when(F.col("capped") == 1, F.col("cap")).otherwise(
        F.expr(
            "(budget - capped_cap) * w_e6 div nullif(free_w, 0)"
        )
    )
    return sort_bounded(
        flagged.crossJoin(F.broadcast(pools)).select(
            "source",
            "n_tokens",
            F.col("w_e6").alias("weight_e6"),
            F.col("capped").cast("long").alias("capped"),
            alloc.cast("long").alias("alloc_tokens"),
            F.expr(
                "(CASE WHEN capped = 1 THEN cap"
                " ELSE (budget - capped_cap) * w_e6"
                " div nullif(free_w, 0) END) * 1000000 div n_tokens"
            )
            .cast("long")
            .alias("epochs_e6"),
        ),
        "source",
    )


source_epoch_waterfill.__doc__ = source_epoch_waterfill.__doc__.format(
    WATERFILL_BUDGET_MULT=WATERFILL_BUDGET_MULT,
    WATERFILL_EPOCH_CAP=WATERFILL_EPOCH_CAP,
    WATERFILL_TAU=WATERFILL_TAU,
)
