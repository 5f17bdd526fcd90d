"""Training-data pipeline operators over ``documents`` / ``embeddings``.

The LLM-corpus preparation surface beyond dedup/similarity (SURVEY.md §2.B
tail): deterministic splits, corpus statistics, n-gram mining, repetition
scoring, a quality-filter funnel, and embedding hygiene checks.  Every op
is a plain DataFrame plan (no UDFs) with a DuckDB oracle; cross-engine
double comparisons follow the parity rules in ``relational.py`` (exact
integer ratios or rounded order-dependent aggregates).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

# Knuth multiplicative hash for the split bucket.  doc_id is folded mod a
# prime FIRST so the product stays far below 2^63 for any conceivable id
# (Spark 4 runs ANSI mode: a silent overflow would THROW) — and the same
# integer math runs identically in DuckDB, which engine-native hash
# functions would not.
_SPLIT_BUCKET = "((doc_id % 1000003) * 2654435761) % 100"


@register(
    "stratified_split",
    oracle=f"""
    SELECT lang,
           CASE WHEN {_SPLIT_BUCKET} < 80 THEN 'train'
                WHEN {_SPLIT_BUCKET} < 90 THEN 'val'
                ELSE 'test' END                       AS split,
           CAST(COUNT(*) AS BIGINT)                   AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)               AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) by a
    multiplicative hash of the stable doc_id — seedless, rerun-stable, and
    engine-portable (pure BIGINT math, no engine hash function).

    Scale: split assignment is a map-only projection; the per-(lang, split)
    rollup is one partial-aggregated shuffle.  Writing the actual splits is
    ``write_partitioned(df, ["split"])`` on the same expression."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPLIT_BUCKET)
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@register(
    "doc_length_histogram",
    oracle="""
    SELECT n_chars // 100                  AS bucket,
           CAST(COUNT(*) AS BIGINT)        AS n_docs,
           CAST(MIN(n_chars) AS BIGINT)    AS min_chars,
           CAST(MAX(n_chars) AS BIGINT)    AS max_chars
    FROM documents
    GROUP BY 1
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length histogram in 100-char buckets — the first diagnostic
    of any crawl snapshot (truncation spikes, boilerplate shelves).

    Bucketing uses INTEGER division (``div``): double divide + floor can
    jitter at exact boundaries and break the cross-engine bucket cover
    (verify-skill trap)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(
        F.expr("n_chars div 100").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


TOPK_NGRAMS = 20


@register(
    "ngram_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(text, ' '))                 AS w,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    bigrams AS (
        SELECT w, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM toks
    )
    SELECT concat(w, ' ', w2)            AS bigram,
           CAST(COUNT(*) AS BIGINT)      AS n_occurrences
    FROM bigrams
    WHERE w2 IS NOT NULL
    GROUP BY 1
    ORDER BY n_occurrences DESC, bigram
    LIMIT {TOPK_NGRAMS}
    """,
)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-{20} word bigrams — boilerplate/contamination
    detector (a bigram appearing in half the corpus is a template).

    Shape: bigrams are assembled IN-ROW — ``arrays_zip`` of two shifted
    ``slice``s of the token array (all codegen, no interpreted lambda) —
    then exploded straight into one partial-aggregated count shuffle and
    a global top-k (TakeOrderedAndProject).  The previous form shuffled
    every token on doc_id just to run ``lead()``; zipping adjacent
    elements in-row removes that shuffle and the window sort entirely
    (40% faster at sf0.1, bit-identical counts).  At 100 TB the only
    shuffle carries one row per DISTINCT bigram after map-side combine.
    NULL doc_id/text rows are dropped on BOTH engines (null-catalog
    audit, r18: the oracle's doc_id-partitioned lead() would BRIDGE
    bigrams across distinct NULL-id docs — one window partition — while
    the in-row zip never crosses a document)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    a = F.split("text", " ")
    pairs = F.arrays_zip(
        F.slice(a, 1, F.size(a) - 1), F.slice(a, 2, F.size(a) - 1)
    )
    bigrams = d.select(F.explode_outer(pairs).alias("p")).where(
        F.col("p.1").isNotNull()
    )
    return (
        bigrams.groupBy(
            F.concat_ws(" ", "p.0", "p.1").alias("bigram")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "bigram")
        .limit(TOPK_NGRAMS)
    )


@register(
    "repetition_score",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    per AS (
        SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY doc_id, w
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT)  AS n_tokens,
           CAST(MAX(cnt) AS BIGINT)  AS max_token_count,
           CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top_token_share
    FROM per GROUP BY doc_id
    """,
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition: share of the single most frequent token —
    the cheap tier of Gopher-style repetition filtering (high share =
    degenerate/templated text).

    ``top_token_share`` is a ratio of two EXACT integers, so the double is
    bit-identical across engines without rounding.  Two shuffles, both
    partial-aggregated; the (doc_id, word) key is high-cardinality and
    skew-free by construction.

    NULL-text documents are excluded EXPLICITLY on both engines: Spark's
    ``explode_outer(split(NULL))`` would emit a null-token row while
    DuckDB's ``unnest(string_split(NULL))`` emits none — the filter (not
    the explode flavor) is what keeps the engines aligned.  explode_outer
    itself stays, per the Catalyst pushdown trap in the verify skill."""
    d = load_table(spark, sf_dir, "documents")
    words = d.where(F.col("text").isNotNull()).select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("w")
    )
    per = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    return per.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.max("cnt").cast("long").alias("max_token_count"),
        (
            F.max("cnt").cast("double") / F.sum("cnt")
        ).alias("top_token_share"),
    )


# Funnel thresholds — cumulative, each stage ANDs onto the previous one.
_MIN_CHARS = 150
_MIN_TOKENS = 30
_MAX_TOP_SHARE = 0.15


@register(
    "quality_filter_funnel",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
    ),
    per AS (
        SELECT doc_id, w, COUNT(*) AS cnt FROM words GROUP BY doc_id, w
    ),
    metrics AS (
        SELECT p.doc_id,
               MAX(d.n_chars)                        AS n_chars,
               SUM(p.cnt)                            AS n_tokens,
               CAST(MAX(p.cnt) AS DOUBLE)/SUM(p.cnt) AS share
        FROM per p JOIN documents d ON p.doc_id = d.doc_id
        GROUP BY p.doc_id
    ),
    agg AS (
        SELECT COUNT(*) AS total,
               SUM(CASE WHEN n_chars >= {_MIN_CHARS} THEN 1 ELSE 0 END)
                   AS s1,
               SUM(CASE WHEN n_chars >= {_MIN_CHARS}
                         AND n_tokens >= {_MIN_TOKENS} THEN 1 ELSE 0 END)
                   AS s2,
               SUM(CASE WHEN n_chars >= {_MIN_CHARS}
                         AND n_tokens >= {_MIN_TOKENS}
                         AND share <= {_MAX_TOP_SHARE} THEN 1 ELSE 0 END)
                   AS s3
        FROM metrics
    )
    SELECT '00_total' AS stage, CAST(total AS BIGINT) AS survivors FROM agg
    UNION ALL
    SELECT '01_min_chars', CAST(s1 AS BIGINT) FROM agg
    UNION ALL
    SELECT '02_min_tokens', CAST(s2 AS BIGINT) FROM agg
    UNION ALL
    SELECT '03_max_repetition', CAST(s3 AS BIGINT) FROM agg
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style filter funnel: per-stage survivor counts for the
    cumulative length → token-count → repetition gates, so a pipeline
    owner sees exactly where the corpus shrinks.

    One pass computes all per-doc metrics; a single-row aggregate holds
    every stage's conditional count, then ``stack`` unpivots it to
    stage-per-row (no per-stage re-scan).  The repetition gate compares the
    exact-integer ratio, identical in both engines unrounded.

    NULL-text documents are excluded on BOTH engines before tokenizing
    (same cross-engine explode/unnest divergence as ``repetition_score``;
    the ``documents_text_not_null`` check in ``table_checks`` is where
    NULL text is surfaced).  NULL doc_ids too (null-catalog audit, r18:
    Spark's inline groupBy collapsed distinct NULL-id docs into one
    metrics row the oracle's doc join dropped)."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    )
    words = d.where(F.col("text").isNotNull()).select(
        "doc_id", "n_chars", F.explode_outer(F.split("text", " ")).alias("w")
    )
    per = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("n_chars").alias("n_chars")
    )
    metrics = per.groupBy("doc_id").agg(
        F.max("n_chars").alias("n_chars"),
        F.sum("cnt").alias("n_tokens"),
        (F.max("cnt").cast("double") / F.sum("cnt")).alias("share"),
    )
    c1 = F.col("n_chars") >= _MIN_CHARS
    c2 = F.col("n_tokens") >= _MIN_TOKENS
    c3 = F.col("share") <= _MAX_TOP_SHARE
    one = metrics.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(c1, 1).otherwise(0)).alias("s1"),
        F.sum(F.when(c1 & c2, 1).otherwise(0)).alias("s2"),
        F.sum(F.when(c1 & c2 & c3, 1).otherwise(0)).alias("s3"),
    )
    return one.select(
        F.expr(
            "stack(4, '00_total', CAST(total AS BIGINT), "
            "'01_min_chars', CAST(s1 AS BIGINT), "
            "'02_min_tokens', CAST(s2 AS BIGINT), "
            "'03_max_repetition', CAST(s3 AS BIGINT)) AS (stage, survivors)"
        )
    )


@register(
    "embedding_norms",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           ROUND(sqrt(list_sum(list_transform(
               CAST(embedding AS DOUBLE[]), x -> x * x))), 4) AS l2_norm
    FROM embeddings
    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene: per-vector dimensionality and L2 norm — catches
    truncated rows, zero vectors, and un-normalized batches before any
    cosine-based op silently mis-scores them.

    Spark side explodes the stored array and sums codegen'd ``v*v``
    columns (interpreted ``aggregate()`` lambdas are the slow path —
    verify-skill trap); the norm is rounded to 4dp because float summation
    order differs between engines.  Rows with a NULL vec_id (un-keyable
    — Spark's groupBy would collapse them into one group the oracle's
    per-row scan keeps apart) or a NULL embedding are dropped on BOTH
    engines (null-catalog audit, r18)."""
    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    ex = e.select(
        "vec_id",
        F.explode_outer(F.col("embedding").cast("array<double>")).alias("v"),
    )
    return ex.groupBy("vec_id").agg(
        F.count("v").cast("long").alias("dim"),
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))), 4).alias("l2_norm"),
    )


@register(
    "table_checks",
    oracle="""
    SELECT 'orders_custkey_fk' AS check_name,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem_orderkey_fk',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer_key_unique',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)
                AS BIGINT)
    UNION ALL
    SELECT 'orders_key_unique',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
                AS BIGINT)
    UNION ALL
    SELECT 'documents_id_unique',
           CAST((SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents)
                AS BIGINT)
    UNION ALL
    SELECT 'documents_text_not_null',
           CAST((SELECT COUNT(*) FROM documents WHERE text IS NULL)
                AS BIGINT)
    UNION ALL
    SELECT 'lineitem_quantity_positive',
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
                AS BIGINT)
    """,
)
def table_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dbt-style data-quality assertions as one queryable result: one row
    per check with its violation count — referential integrity (anti
    joins), key uniqueness (count vs distinct), null and range gates.

    Scale shape: each FK check is ONE left-anti join (the dimension side
    broadcasts when small); uniqueness is a single aggregate — no check
    materializes violating rows, only counts them, so the whole suite is
    safe to run inline before every pipeline publish."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    d = load_table(spark, sf_dir, "documents")

    def one(name: str, count_df) -> DataFrame:
        return count_df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    checks = [
        one(
            "orders_custkey_fk",
            o.join(
                c, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "lineitem_orderkey_fk",
            li.join(
                o, F.col("l_orderkey") == F.col("o_orderkey"), "left_anti"
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        one(
            "customer_key_unique",
            c.agg(
                (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("n")
            ),
        ),
        one(
            "orders_key_unique",
            o.agg(
                (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n")
            ),
        ),
        one(
            "documents_id_unique",
            d.agg(
                (F.count(F.lit(1)) - F.countDistinct("doc_id")).alias("n")
            ),
        ),
        one(
            "documents_text_not_null",
            d.where(F.col("text").isNull()).agg(
                F.count(F.lit(1)).alias("n")
            ),
        ),
        one(
            "lineitem_quantity_positive",
            li.where(F.col("l_quantity") <= 0).agg(
                F.count(F.lit(1)).alias("n")
            ),
        ),
    ]
    out = checks[0]
    for df in checks[1:]:
        out = out.unionByName(df)
    return out


@register(
    "incremental_dedup",
    oracle="""
    WITH corpus AS (
        SELECT DISTINCT md5(text) AS h FROM documents
        WHERE source <> 'src0'
    )
    SELECT d.doc_id,
           (c.h IS NOT NULL) AS is_duplicate
    FROM documents d
    LEFT JOIN corpus c ON md5(d.text) = c.h
    WHERE d.source = 'src0'
    """,
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: flag each document of a NEW shard
    (source 'src0' stands in for tonight's crawl) whose exact content
    already exists in the accumulated corpus — the nightly pattern that
    avoids re-deduplicating 100 TB on every ingest.

    Shape: the corpus side reduces to DISTINCT digests once (at scale
    this digest index is a maintained table, bucketed by hash prefix so
    the probe join is shuffle-free); the new shard probes it with one
    equi-join on the digest.  Only hashes move — document bodies never
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    corpus_hashes = (
        d.where(F.col("source") != "src0")
        .select(F.md5("text").alias("h"))
        .distinct()
    )
    shard = d.where(F.col("source") == "src0").select(
        "doc_id", F.md5("text").alias("h_new")
    )
    return shard.join(
        corpus_hashes, F.col("h_new") == F.col("h"), "left_outer"
    ).select(
        "doc_id",
        F.col("h").isNotNull().alias("is_duplicate"),
    )


@register(
    "dup_ngram_fraction",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
                   i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')
               )) AS s
        FROM documents WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)          AS n_ngrams,
           CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct,
           (COUNT(*) - COUNT(DISTINCT s)) * 1.0 / COUNT(*) AS dup_fraction
    FROM sh GROUP BY doc_id
    """,
)
def dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate 3-gram share — the Gopher repetition
    rule one level up from ``repetition_score``'s top-token share: a doc
    whose n-grams repeat is boilerplate/spam even when no single token
    dominates.

    Shape: codegen shingle structs (arrays_zip of shifted slices)
    exploded into ONE per-doc aggregate (count + count-distinct) — the
    only shuffle carries (doc_id, shingle) rows with map-side partials.
    dup_fraction is an exact integer ratio, bit-identical unrounded."""
    from googlecloudstorage_blueprints_spark.functions.columns import (
        shingle_structs,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    sh = d.select(
        "doc_id", F.explode_outer(shingle_structs("text", 3)).alias("p")
    ).select("doc_id", F.concat_ws(" ", "p.0", "p.1", "p.2").alias("s"))
    return sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.countDistinct("s").alias("n_distinct"),
        (
            (F.count(F.lit(1)) - F.countDistinct("s"))
            * 1.0
            / F.count(F.lit(1))
        ).alias("dup_fraction"),
    )


CHUNK_TOKENS = 16  # non-overlapping chunk width for chunk-level dedup


@register(
    "chunk_dedup",
    oracle=f"""
    WITH chunks AS (
        SELECT doc_id,
               md5(array_to_string(
                   string_split(text, ' ')[(i - 1) * {CHUNK_TOKENS} + 1
                                           : (i - 1) * {CHUNK_TOKENS}
                                             + {CHUNK_TOKENS}], ' '
               )) AS ch
        FROM documents,
             unnest(range(1,
                 greatest((len(string_split(text, ' ')) - 1)
                          // {CHUNK_TOKENS} + 1, 1) + 1)) AS t(i)
        WHERE text IS NOT NULL
    ),
    freq AS (
        SELECT ch, COUNT(DISTINCT doc_id) AS n_docs
        FROM chunks GROUP BY ch
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared_chunks,
           CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               * 1.0 / COUNT(*) AS shared_share
    FROM chunks c JOIN freq f ON c.ch = f.ch
    GROUP BY c.doc_id
    """,
)
def chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level cross-document duplication (RefinedWeb/C4-style line
    dedup, with fixed {k}-token chunks standing in for lines in the
    newline-free fixture corpus): per doc, how many of its chunks also
    appear verbatim in ANOTHER document.

    Chunks are md5-hashed before they leave the row, so the
    corpus-wide frequency aggregate and the join back shuffle 32-byte
    digests, never chunk text (same posture as exact_dedup).  The chunk
    assembly is a transform() lambda — interpreted, but per CHUNK (1/{k}
    of the per-token cost that disqualified it for shingles) and with a
    stride the zip-slice trick cannot express.  Counts and the share are
    exact integers / integer ratios on both engines."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    chunk_arr = F.expr(
        f"transform(sequence(0, greatest((size(split(text, ' ')) - 1) "
        f"div {CHUNK_TOKENS}, 0)), "
        f"i -> md5(concat_ws(' ', slice(split(text, ' '), "
        f"i * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS}))))"
    )
    chunks = d.select(
        "doc_id", F.explode_outer(chunk_arr).alias("ch")
    ).persist()
    freq = chunks.groupBy("ch").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    out = (
        chunks.join(freq, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_chunks"),
            (
                F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1))
            ).alias("shared_share"),
        )
        .persist()
    )
    out.count()  # materialize through the cached chunk frame
    chunks.unpersist()
    return out


chunk_dedup.__doc__ = chunk_dedup.__doc__.format(k=CHUNK_TOKENS)


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH ex AS (
        SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    stats AS (
        SELECT vec_id, MAX(ABS(v)) AS max_abs FROM ex GROUP BY vec_id
    ),
    q AS (
        SELECT ex.vec_id, v, max_abs,
               CASE WHEN max_abs > 0
                    THEN v - floor(v * (127.0 / max_abs) + 0.5)
                             / (127.0 / max_abs)
                    ELSE 0.0 END AS err
        FROM ex JOIN stats ON ex.vec_id = stats.vec_id
    )
    SELECT vec_id,
           CAST(COUNT(*) AS BIGINT)      AS dim,
           ROUND(MAX(max_abs), 6)        AS max_abs,
           ROUND(SQRT(AVG(err * err)), 6) AS quant_rmse,
           ROUND(MAX(ABS(err)), 6)       AS quant_max_err
    FROM q GROUP BY vec_id
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization report per vector: scale =
    127/max|x|, quantize with the explicit ``floor(x·scale + 0.5)``
    rule (identical integer rounding on every engine — bare ``round``
    half-up/half-even conventions differ), and measure the round-trip
    RMSE and max error — the metrics that decide whether an embedding
    store can ship int8 (4× smaller, GEMM-compatible) instead of
    float32.

    Shape: explode → per-vector max aggregate → join back → per-vector
    error aggregate — all codegen (the same explode convention as
    ``embedding_norms``; interpreted per-element lambdas are the slow
    path).  max_abs is an exact MAX (no summation order), so the scale
    is bit-identical across engines; averaged errors are rounded 6dp.
    Zero vectors quantize to themselves (error 0) rather than dividing
    by zero."""
    e = load_table(spark, sf_dir, "embeddings")
    # inner explode (not explode_outer): the oracle's unnest() emits no
    # rows for NULL/empty embedding arrays, so a NULL-vector doc must
    # vanish here too, not surface as a (dim=1, rmse=0) row.  The column
    # is stored (not computed), so the implicit size()>0 filter lands in
    # the scan — the explode_outer perf trap doesn't apply.
    ex = e.select(
        "vec_id",
        F.explode(F.col("embedding").cast("array<double>")).alias("v"),
    )
    stats = ex.groupBy("vec_id").agg(
        F.max(F.abs(F.col("v"))).alias("max_abs")
    )
    scale = F.lit(127.0) / F.col("max_abs")
    err = F.when(F.col("max_abs") > 0,
                 F.col("v")
                 - F.floor(F.col("v") * scale + 0.5) / scale
                 ).otherwise(F.lit(0.0))
    q = ex.join(stats, "vec_id").select(
        "vec_id", "max_abs", err.alias("err")
    )
    return q.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("dim"),
        F.round(F.max("max_abs"), 6).alias("max_abs"),
        F.round(F.sqrt(F.avg(F.col("err") * F.col("err"))), 6).alias(
            "quant_rmse"
        ),
        F.round(F.max(F.abs(F.col("err"))), 6).alias("quant_max_err"),
    )


@register(
    "doc_logprob_unigram",
    oracle="""
    WITH words AS (
        SELECT doc_id, w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE text IS NOT NULL)
        WHERE w <> ''
    ),
    freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM words GROUP BY w),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM freq),
    scored AS (
        SELECT words.doc_id,
               ln(CAST(freq.cnt AS DOUBLE) / tot.n) AS lp
        FROM words JOIN freq ON words.w = freq.w CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT)       AS n_tokens,
           ROUND(AVG(-lp), 6)             AS avg_neg_logprob,
           ROUND(MAX(-lp), 6)             AS max_neg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def doc_logprob_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-probability under the corpus
    unigram distribution — the cheapest useful language-model quality
    filter (degenerate/rare-token documents score high, boilerplate
    scores low); the unigram tier of perplexity-based corpus filtering.

    Scale: one corpus word-count aggregate (map-side partials), a scalar
    total, and a words⋈freq join keyed on the word with NO broadcast
    hint — the distinct-token table is billions of rows on a raw web
    corpus (same reasoning as tfidf_topk) and AQE upgrades to broadcast
    only when the measured side is small.  ln()-derived doubles are
    rounded 6dp on both engines (parity convention)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    words = (
        d.select("doc_id", F.explode_outer(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )
    freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    tot = freq.agg(F.sum("cnt").alias("n"))
    lp = F.log(F.col("cnt").cast("double") / F.col("n"))
    scored = (
        words.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg(-F.col("lp")), 6).alias("avg_neg_logprob"),
        F.round(F.max(-F.col("lp")), 6).alias("max_neg_logprob"),
    )


SAMPLE_PER_SOURCE = 20


@register(
    "uniform_sample_hash",
    oracle=f"""
    SELECT source, doc_id, sample_rank FROM (
        SELECT source, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS sample_rank
        FROM documents)
    WHERE sample_rank <= {SAMPLE_PER_SOURCE}
    """,
)
def uniform_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source uniform sample: the first
    SAMPLE_PER_SOURCE docs of each source in md5(doc_id) order — the
    distributed replacement for reservoir sampling when reproducibility
    matters (same sample on every run/retry/engine, no RNG state, no
    driver pass; md5 of the id is a uniform permutation of the corpus).

    One shuffle (partition by source); the rank window computes a
    partial top-k per partition before it, so only candidate rows move.
    md5 hex strings compare identically on both engines; doc_id breaks
    the (impossible) hash tie to keep the order total."""
    d = load_table(spark, sf_dir, "documents")
    hkey = F.md5(F.encode(F.col("doc_id").cast("string"), "utf-8"))
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(hkey.asc(), F.col("doc_id"))
    return (
        d.select("source", "doc_id")
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .where(F.col("sample_rank") <= SAMPLE_PER_SOURCE)
    )


# interpolation weight for the bigram LM: λ·p(w2|w1) + (1−λ)·p(w2)
BIGRAM_LAMBDA = 0.8


@register(
    "doc_logprob_bigram",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a
        FROM documents
        WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(a)), i -> a[i]))     AS w1,
               unnest(list_transform(range(1, len(a)), i -> a[i + 1])) AS w2
        FROM toks
    ),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cnt1
           FROM bg GROUP BY w1),
    c2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS cnt2
           FROM bg GROUP BY w2),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bg),
    scored AS (
        SELECT bg.doc_id,
               CAST(ROUND(-LN(
                   {BIGRAM_LAMBDA} * (CAST(cb.cnt AS DOUBLE)
                                      / CAST(c1.cnt1 AS DOUBLE))
                   + {1 - BIGRAM_LAMBDA} * (CAST(c2.cnt2 AS DOUBLE)
                                            / CAST(t.n AS DOUBLE))
               ) * 1000000, 0) AS BIGINT) AS nll6
        FROM bg
        JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
        JOIN c1 ON c1.w1 = bg.w1
        JOIN c2 ON c2.w2 = bg.w2
        CROSS JOIN t
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(CAST(SUM(nll6) AS BIGINT) AS DOUBLE)
                 / (COUNT(*) * 1000000.0), 6) AS avg_neg_logprob,
           ROUND(CAST(MAX(nll6) AS DOUBLE) / 1000000.0, 6)
               AS max_neg_logprob
    FROM scored GROUP BY doc_id
    """,
)
def doc_logprob_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document negative log-probability under an INTERPOLATED
    corpus bigram model (λ·p(w₂|w₁) + (1−λ)·p(w₂)) — the second rung of
    perplexity-based corpus filtering above ``doc_logprob_unigram``:
    shuffled or template-stitched text that fools unigram stats scores
    high here because its word ORDER is unnatural.

    Shape (r10): in-row adjacent bigrams via arrays_zip of shifted
    slices (codegen — never a lead() window that would shuffle every
    token, per the round-5 n-gram rule), then the model is scored on
    the DISTINCT-bigram table with NO joins inside the score frame:
    cnt1/cnt2 are keyed windows over cb (SUM OVER PARTITION BY w1/w2 —
    distributed, |cb|-sized shuffles) and the corpus total is a SCALAR
    SUBQUERY (a separate distributed aggregate whose result is injected
    as a literal).  Why it matters: the r9 shape assembled the score
    table as cb⋈c1⋈c2⋈t, and a JOIN subtree's static size estimate is
    the PRODUCT of its children — Catalyst planned SMJ for the bg⋈score
    join and paid the full bigram frame's map shuffle before AQE's
    runtime broadcast conversion could fire (the r9 AQE trap, SCALE.md
    "Bigram-LM probe caveat").  Window-over-Aggregate keeps the honest
    aggregate-sized estimate, so locally the 931-row score table gets a
    static BroadcastHashJoin (bg never shuffles for the join — measured
    1.10s → ~0.6s at sf0.1) while at web scale, where vocab² is huge,
    the same plan degrades to the CORRECT SMJ with no hint to un-pick.
    Every bigram in a doc exists in the corpus model by construction,
    so no smoothing floor is needed.

    Parity: p components are exact integer ratios; the mixed
    probability is one chain of identical IEEE ops; −ln() is scaled 1e6
    and rounded to a BIGINT immediately (the decay-trend rule: summing
    rounded DOUBLES is order-sensitive in the last ulp and can flip a
    6dp rounding between runs — integer sums cannot), so per-doc
    avg/max divide identical integers on both engines."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    # no pre-explode repartition: the bigram build is pure codegen
    # (arrays_zip of slices), and measured timing showed the extra
    # full-text shuffle costs more than the single-task scan saves —
    # the downstream count groupBys restore parallelism immediately
    a = F.split("text", " ")
    pairs = F.arrays_zip(
        F.slice(a, 1, F.size(a) - 1), F.slice(a, 2, F.size(a) - 1)
    )
    bg = (
        d.where(F.size(a) >= 2)
        .select("doc_id", F.explode_outer(pairs).alias("p"))
        .select(
            "doc_id",
            F.col("p.0").alias("w1"),
            F.col("p.1").alias("w2"),
        )
    )
    bg.createOrReplaceTempView("bg_doc_logprob_bigram")
    # marginals as keyed windows over the distinct-bigram table (same
    # exact integers as the c1/c2 groupBys: SUM of group counts), total
    # as a scalar subquery — no join node inside the score subtree
    return spark.sql(
        f"""
        WITH cb AS (SELECT w1, w2, COUNT(*) AS cnt
                    FROM bg_doc_logprob_bigram GROUP BY w1, w2),
        sc AS (
            SELECT w1, w2,
                   CAST(ROUND(-LN(
                       {BIGRAM_LAMBDA} * (CAST(cnt AS DOUBLE)
                           / CAST(SUM(cnt) OVER (PARTITION BY w1)
                                  AS DOUBLE))
                     + {1 - BIGRAM_LAMBDA}
                         * (CAST(SUM(cnt) OVER (PARTITION BY w2)
                                 AS DOUBLE)
                            / CAST((SELECT SUM(cnt) FROM cb)
                                   AS DOUBLE))
                   ) * 1000000, 0) AS BIGINT) AS nll6
            FROM cb
        )
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               ROUND(CAST(SUM(nll6) AS DOUBLE)
                     / (COUNT(*) * 1000000.0), 6) AS avg_neg_logprob,
               ROUND(CAST(MAX(nll6) AS DOUBLE) / 1000000.0, 6)
                   AS max_neg_logprob
        FROM bg_doc_logprob_bigram JOIN sc USING (w1, w2)
        GROUP BY doc_id
        """
    )


# --------------------------------------------------------------------------
# deterministic weighted sample (Efraimidis–Spirakis A-ES, no RNG state)
# --------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 20


@register(
    "weighted_sample_topk",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source,
               CAST(n_chars AS BIGINT) AS w,
               -- u in (0,1] from the first 8 md5 hex chars (exact in
               -- double: 32-bit integer over 2^32)
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) + 1) / 4294967296.0 AS u
        FROM documents
        WHERE n_chars > 0 AND doc_id IS NOT NULL
    ),
    scored AS (
        SELECT doc_id, source, w,
               CAST(ROUND(-LN(u) * 1000000, 0) AS BIGINT) AS negln6
        FROM keyed
    )
    SELECT doc_id, source, w AS weight,
           CAST(ROW_NUMBER() OVER (
               ORDER BY CAST(negln6 AS DOUBLE) / w, doc_id
           ) AS BIGINT) AS sample_rank
    FROM scored
    ORDER BY sample_rank
    LIMIT {WEIGHTED_SAMPLE_K}
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample (Efraimidis–Spirakis A-ES): keep
    the k docs minimizing −ln(u)/w with u a uniform hash of the doc id
    — inclusion probability proportional to weight (n_chars here:
    char-weighted sampling approximates token-budget sampling), with
    NO RNG state, so the sample is identical on every run, retry, and
    engine — ``uniform_sample_hash``'s weighted sibling and the
    distributed replacement for weighted reservoir sampling.

    Parity: u is built from the first 8 md5 hex chars — a 32-bit
    integer, exact in double, identical text both engines; −ln(u) is
    fixed-pointed ×1e6 to BIGINT per doc (r7 rule), and the ranking key
    is ONE division of that exact integer by the exact weight — a
    deterministic double both engines order identically, doc_id
    tiebreak.  Shape: map-side key computation + a global top-k
    (TakeOrderedAndProject — no full sort).  NULL doc_ids can't be
    hashed to a u — dropped on BOTH engines (null-catalog audit, r18:
    their NULL sort key would fill the top-k under Spark's ASC NULLS
    FIRST and vanish under DuckDB's NULLS LAST)."""
    d = load_table(spark, sf_dir, "documents").where(
        (F.col("n_chars") > 0) & F.col("doc_id").isNotNull()
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long")
        + 1
    ) / F.lit(4294967296.0)
    negln6 = F.round(-F.log(u) * 1000000, 0).cast("long")
    key = (F.col("negln6").cast("double") / F.col("w")).alias("aes_key")
    keyed = d.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("w"),
        negln6.alias("negln6"),
    ).select("doc_id", "source", "w", key)
    # global top-k via orderBy+limit (TakeOrderedAndProject — per-
    # partition partial top-k, never a SinglePartition sort); the rank
    # window then runs over the K-ROW survivor frame only
    topk = keyed.orderBy("aes_key", "doc_id").limit(WEIGHTED_SAMPLE_K)
    wnd = Window.orderBy("aes_key", "doc_id")
    return topk.select(
        "doc_id",
        "source",
        F.col("w").alias("weight"),
        F.row_number().over(wnd).cast("long").alias("sample_rank"),
    ).orderBy("sample_rank")
