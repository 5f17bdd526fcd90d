"""Embedding-column statistics over the ``embeddings`` fixture.

A 100 TB embedding store needs corpus-level QA before any ANN index is
built: per-dimension distribution drift (a dead or exploding dimension
breaks cosine geometry silently) and per-label cluster shape (centroid
norms approaching zero mean label collapse).  Both operators keep the
vectors JVM-side — posexplode + codegen aggregates, no Python — and both
shuffle only (dim)- or (label, dim)-keyed partial aggregates, never raw
vectors.  The reference has no embedding surface (SURVEY §2.A.4); these
extend the §2.B similarity family's QA tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.functions.columns import (
    cosine_similarity,
)
from googlecloudstorage_blueprints_spark.functions.frames import (
    local_rows_frame,
    sort_bounded,
)
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table


@register(
    "embedding_dim_stats",
    oracle="""
    WITH vals AS (
        SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(unnest(embedding) AS DOUBLE)                 AS val
        FROM embeddings
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT)           AS n,
           ROUND(SUM(val) / COUNT(*), 6)      AS mean,
           ROUND(MIN(val), 6)                 AS min_val,
           ROUND(MAX(val), 6)                 AS max_val,
           ROUND((SUM(val * val) - SUM(val) * SUM(val) / COUNT(*))
                 / NULLIF(COUNT(*) - 1, 0), 6) AS var
    FROM vals
    GROUP BY dim
    ORDER BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution profile: count, mean, min/max, sample
    variance — the drift dashboard for an embedding store.

    posexplode flattens each vector to (dim, val) rows (1-based to match
    DuckDB's generate_subscripts); one hash-aggregate on dim does the
    rest map-side-partial.  Scale: the shuffle carries |dims| × partials,
    never vectors.  Parity: float32→double widening is exact; mean and
    variance are spelled as the SAME explicit sum formula on both engines
    (not each engine's streaming var_samp, whose accumulation orders
    differ) and rounded 6dp against summation-order drift; min/max are
    exact but rounded for symmetry."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        F.posexplode("embedding").alias("pos", "fval")
    ).select(
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("fval").cast("double").alias("val"),
    )
    n = F.count(F.lit(1))
    s = F.sum("val")
    q = F.sum(F.col("val") * F.col("val"))
    return (
        vals.groupBy("dim")
        .agg(
            n.cast("long").alias("n"),
            F.round(s / n, 6).alias("mean"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
            F.round(
                (q - s * s / n) / F.nullif(n - F.lit(1), F.lit(0)), 6
            ).alias("var"),
        )
        .orderBy("dim")
    )


@register(
    "embedding_label_centroids",
    oracle="""
    WITH vals AS (
        SELECT label,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(unnest(embedding) AS DOUBLE)                 AS val
        FROM embeddings
    ),
    centroid AS (
        SELECT label, dim,
               COUNT(*)           AS n_vals,
               SUM(val) / COUNT(*) AS c
        FROM vals
        GROUP BY label, dim
    )
    SELECT CAST(label AS BIGINT)            AS label,
           CAST(MAX(n_vals) AS BIGINT)      AS n_vecs,
           ROUND(SQRT(SUM(c * c)), 6)       AS centroid_norm,
           ROUND(MAX(ABS(c)), 6)            AS max_abs_coord
    FROM centroid
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid geometry: vector count, centroid L2 norm, and
    the largest-magnitude centroid coordinate.  Centroid norms near zero
    flag label collapse (members cancel); a dominant coordinate flags a
    degenerate axis — the two cheapest cluster-health checks that need
    no pairwise distances.

    Two-level aggregate: (label, dim) partial means, then a |labels|-row
    rollup — the shuffle carries |labels|×|dims| partials.  Parity: the
    per-cell count equals the label's vector count (fixture vectors are
    fixed-width), so n_vecs is MAX(n_vals); mean/norm use the explicit
    sum formula rounded 6dp (SQRT of an identical double is identical)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "label", F.posexplode("embedding").alias("pos", "fval")
    ).select(
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("fval").cast("double").alias("val"),
    )
    centroid = vals.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vals"),
        (F.sum("val") / F.count(F.lit(1))).alias("c"),
    )
    return (
        centroid.groupBy("label")
        .agg(
            F.max("n_vals").cast("long").alias("n_vecs"),
            F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias(
                "centroid_norm"
            ),
            F.round(F.max(F.abs("c")), 6).alias("max_abs_coord"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            "centroid_norm",
            "max_abs_coord",
        )
        .orderBy("label")
    )


MAHALANOBIS_TOP_K = 20


@register(
    "embedding_outlier_mahalanobis",
    oracle=f"""
    WITH vals AS (
        SELECT vec_id, label,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(unnest(embedding) AS DOUBLE)                 AS val
        FROM embeddings
    ),
    stats AS (
        SELECT label, dim,
               CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(val)                 AS s,
               SUM(val * val)           AS q
        FROM vals
        GROUP BY label, dim
    )
    SELECT v.vec_id,
           CAST(v.label AS BIGINT) AS label,
           ROUND(SUM(
               (v.val - st.s / st.n) * (v.val - st.s / st.n)
               / ((st.q - st.s * st.s / st.n) / NULLIF(st.n - 1, 0))
           ), 6) AS m2
    FROM vals v
    JOIN stats st ON st.label = v.label AND st.dim = v.dim
    GROUP BY v.vec_id, v.label
    ORDER BY m2 DESC, v.vec_id
    LIMIT {MAHALANOBIS_TOP_K}
    """,
)
def embedding_outlier_mahalanobis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-k embedding outliers by diagonal Mahalanobis distance to their
    OWN label's distribution: Σ_dims (x−μ)²/σ² with per-(label, dim)
    moments — the mislabeled-vector / corrupted-embedding detector that
    needs no pairwise distances and no covariance inversion (diagonal
    approximation: the standard first screen before anything O(d²)).

    Scale: the moment table is |labels|×|dims| rows — always broadcast;
    the per-vector reduce is one (vec_id)-keyed aggregate over exploded
    values, so vectors never shuffle whole.  Parity: moments are spelled
    as the explicit n/Σx/Σx² formula (identical expression text both
    engines); the per-vector sum of ~|dims| deterministic doubles rounds
    6dp before the ordered top-k cut with the vec_id tiebreaker."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "fval")
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("fval").cast("double").alias("val"),
    )
    stats = vals.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("val").alias("s"),
        F.sum(F.col("val") * F.col("val")).alias("q"),
    )
    mu = F.col("s") / F.col("n")
    var = (F.col("q") - F.col("s") * F.col("s") / F.col("n")) / F.nullif(
        F.col("n") - F.lit(1.0), F.lit(0.0)
    )
    term = (F.col("val") - mu) * (F.col("val") - mu) / var
    return (
        vals.join(F.broadcast(stats), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.round(F.sum(term), 6).alias("m2"))
        .select(
            "vec_id", F.col("label").cast("long").alias("label"), "m2"
        )
        .orderBy(F.col("m2").desc(), "vec_id")
        .limit(MAHALANOBIS_TOP_K)
    )


CENTROID_MARGIN_TOP_K = 20


@register(
    "embedding_centroid_margin",
    oracle=f"""
    WITH vals AS (
        SELECT vec_id, label,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(unnest(embedding) AS DOUBLE)                 AS val
        FROM embeddings
    ),
    cent AS (
        SELECT label AS clabel, dim, SUM(val) / COUNT(*) AS c
        FROM vals GROUP BY label, dim
    ),
    cnorm AS (
        SELECT clabel, SQRT(SUM(c * c)) AS cn FROM cent GROUP BY clabel
    ),
    vnorm AS (
        SELECT vec_id, SQRT(SUM(val * val)) AS vn
        FROM vals GROUP BY vec_id
    ),
    dots AS (
        SELECT v.vec_id, v.label, ce.clabel, SUM(v.val * ce.c) AS dot
        FROM vals v JOIN cent ce ON ce.dim = v.dim
        GROUP BY v.vec_id, v.label, ce.clabel
    ),
    cosines AS (
        SELECT d.vec_id, d.label, d.clabel,
               ROUND(d.dot / (vn.vn * cn.cn), 6) AS cos
        FROM dots d
        JOIN vnorm vn ON vn.vec_id = d.vec_id
        JOIN cnorm cn ON cn.clabel = d.clabel
    )
    SELECT vec_id,
           CAST(label AS BIGINT) AS label,
           MAX(CASE WHEN clabel = label THEN cos END) AS own_cos,
           MAX(CASE WHEN clabel <> label THEN cos END) AS best_other_cos,
           ROUND(MAX(CASE WHEN clabel = label THEN cos END)
                 - MAX(CASE WHEN clabel <> label THEN cos END), 6)
               AS margin
    FROM cosines
    GROUP BY vec_id, label
    HAVING MAX(CASE WHEN clabel <> label THEN cos END) IS NOT NULL
    ORDER BY margin, vec_id
    LIMIT {CENTROID_MARGIN_TOP_K}
    """,
)
def embedding_centroid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screen: each vector's cosine to its own label
    centroid vs its best cosine to any OTHER centroid, surfacing the
    {k} worst margins — vectors that sit closer to a foreign cluster
    than their own are the mislabeled-example candidates every
    classifier-data pipeline reviews first.

    Shape: the |labels|×|dims| centroid frame and the |labels| norm row
    are broadcast; the dim-keyed score join fans the exploded (vec, dim)
    frame out |labels|× and immediately re-aggregates on (vec_id,
    clabel) — the shuffle carries per-vector partial dots, never raw
    vectors; TakeOrdered cuts the top-k.  Parity: cosines use the
    explicit sum formulas (no engine-native aggregates) rounded 6dp
    before the margin subtraction, so both engines difference identical
    doubles; (margin, vec_id) is a total order."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "fval")
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("fval").cast("double").alias("val"),
    )
    cent = vals.groupBy(F.col("label").alias("clabel"), "dim").agg(
        (F.sum("val") / F.count(F.lit(1))).alias("c")
    )
    cnorm = cent.groupBy("clabel").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn")
    )
    vnorm = vals.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("vn")
    )
    dots = (
        vals.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum(F.col("val") * F.col("c")).alias("dot"))
    )
    cosines = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "clabel")
        .select(
            "vec_id",
            "label",
            "clabel",
            F.round(
                F.col("dot") / (F.col("vn") * F.col("cn")), 6
            ).alias("cos"),
        )
    )
    own = F.max(
        F.when(F.col("clabel") == F.col("label"), F.col("cos"))
    )
    other = F.max(
        F.when(F.col("clabel") != F.col("label"), F.col("cos"))
    )
    return (
        cosines.groupBy("vec_id", "label")
        .agg(
            own.alias("own_cos"),
            other.alias("best_other_cos"),
            F.round(own - other, 6).alias("margin"),
        )
        .select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            "own_cos",
            "best_other_cos",
            "margin",
        )
        # single-label corpus ⇒ best_other_cos/margin are NULL; Spark
        # sorts NULLs first ascending, DuckDB last, so the top-k cut
        # would diverge — a NULL margin is "no competing centroid",
        # which is not a candidate anyway: drop it on both engines.
        .where(F.col("best_other_cos").isNotNull())
        .orderBy("margin", "vec_id")
        .limit(CENTROID_MARGIN_TOP_K)
    )


embedding_centroid_margin.__doc__ = embedding_centroid_margin.__doc__.format(
    k=CENTROID_MARGIN_TOP_K
)


@register(
    "embedding_norm_quantiles",
    oracle="""
    WITH norms AS (
        SELECT label,
               CAST(ROUND(sqrt(list_sum(list_transform(
                   CAST(embedding AS DOUBLE[]), x -> x * x))) * 10000, 0)
                   AS BIGINT) AS norm4
        FROM embeddings
        WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(quantile_cont(norm4, 0.1) / 10000.0, 6) AS p10_norm,
           ROUND(quantile_cont(norm4, 0.5) / 10000.0, 6) AS p50_norm,
           ROUND(quantile_cont(norm4, 0.9) / 10000.0, 6) AS p90_norm
    FROM norms
    GROUP BY label
    ORDER BY label
    """,
)
def embedding_norm_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm quantiles — the distribution view behind
    embedding_norms' per-vector hygiene: a label whose norm band shifts
    was embedded by a different model/config, which cosine comparisons
    silently absorb until recall craters.

    Shape: per-vector norm (explode + codegen'd v·v sum, same form as
    embedding_norms), then one |labels|-row percentile aggregate.
    Parity: norms are fixed-pointed to BIGINT ×1e4 at birth (the 4dp
    convention embedding_norms established, made integer so the
    percentile interpolates EXACT integers — interpolating 4dp doubles
    lands midpoints on 5th-decimal rounding boundaries); the single
    /1e4 division and 6dp round close it out identically.  NULL vec_id
    / NULL embedding rows dropped on BOTH engines (null-catalog audit,
    r18 — see embedding_norms)."""
    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    ex = e.select(
        "label",
        "vec_id",
        F.explode_outer(F.col("embedding").cast("array<double>")).alias(
            "v"
        ),
    )
    # label rides the fixture's int32; cast to long per the repo's
    # bigint-cast convention (oracle CASTs it, siblings all emit long)
    ex = ex.withColumn("label", F.col("label").cast("long"))
    norms = ex.groupBy("label", "vec_id").agg(
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))) * 10000, 0)
        .cast("long")
        .alias("norm4")
    )
    return sort_bounded(
        norms.groupBy("label").agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.percentile("norm4", 0.1) / 10000.0, 6).alias(
                "p10_norm"
            ),
            F.round(F.percentile("norm4", 0.5) / 10000.0, 6).alias(
                "p50_norm"
            ),
            F.round(F.percentile("norm4", 0.9) / 10000.0, 6).alias(
                "p90_norm"
            ),
        ),
        "label",
    )


# --------------------------------------------------------------------------
# pairwise-cosine histogram over a deterministic sample (collapse probe)
# --------------------------------------------------------------------------

PAIR_SAMPLE = 100  # first PAIR_SAMPLE vec_ids → 4 950 pairs, bounded


@register(
    "embedding_pairwise_cosine_histogram",
    oracle=f"""
    WITH s AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < {PAIR_SAMPLE}
    ),
    pc AS (
        SELECT LEAST((CAST(ROUND(list_cosine_similarity(a.v, b.v)
                                 * 1000000, 0) AS BIGINT)
                      + 1000000) // 100000, 19) AS bucket
        FROM s a JOIN s b ON a.vec_id < b.vec_id
    )
    SELECT CAST(bucket AS BIGINT)                 AS bucket,
           ROUND(bucket / 10.0 - 1.0, 1)          AS cos_lo,
           CAST(COUNT(*) AS BIGINT)               AS n_pairs
    FROM pc
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def embedding_pairwise_cosine_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram of pairwise cosines over a deterministic corpus sample
    — the geometry-health probe read before any similarity work: a
    healthy corpus masses near 0 (high-dim near-orthogonality), a hump
    near 1 means embedding collapse / duplicated inputs, and a shifted
    mode means an un-centered model.  Complements
    ``embedding_centroid_margin`` (label view) with the global view.

    Shape: the sample is bounded (first {PAIR_SAMPLE} vec_ids — the
    query-block convention of the similarity tiers), so the pair space
    is a broadcast self-join of {PAIR_SAMPLE} rows — never the corpus
    pair space; the histogram is a 20-row aggregate.  Parity: the
    cosine is fixed-pointed ×1e6 to BIGINT and bucketed with INTEGER
    division (double-division bucketing jitters at exact boundaries —
    the round-1 bucket rule); edges re-derived from the integer."""
    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.where(F.col("vec_id") < PAIR_SAMPLE).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = s.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = s.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    bucket = F.least(
        F.expr(
            "(CAST(ROUND(cos * 1000000, 0) AS BIGINT) + 1000000)"
            " div 100000"
        ),
        F.lit(19),
    )
    pc = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(cosine_similarity("va", "vb").alias("cos"))
        .select(bucket.alias("bucket"))
    )
    return sort_bounded(
        pc.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs")
        ).select(
            F.col("bucket").cast("long").alias("bucket"),
            F.round(F.col("bucket") / 10.0 - 1.0, 1).alias("cos_lo"),
            "n_pairs",
        ),
        "bucket",
    )


# --------------------------------------------------------------------------
# label purity of the cosine neighborhood (embedding quality metric)
# --------------------------------------------------------------------------

PURITY_QUERIES = 50
PURITY_K = 10


@register(
    "embedding_knn_label_purity",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, label AS qlabel,
               CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < {PURITY_QUERIES}
    ),
    scored AS (
        SELECT q.query_id, q.qlabel, e.label AS nlabel,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(
                       q.qv, CAST(e.embedding AS DOUBLE[])) DESC,
                       e.vec_id) AS rk
        FROM q, embeddings e
        WHERE e.vec_id != q.query_id
    ),
    per_query AS (
        SELECT query_id, qlabel,
               CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_match
        FROM scored WHERE rk <= {PURITY_K}
        GROUP BY query_id, qlabel
    )
    SELECT CAST(qlabel AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(n_match) AS BIGINT) AS n_label_matches,
           CAST(SUM(n_match) AS DOUBLE) / (COUNT(*) * {PURITY_K})
               AS knn_purity
    FROM per_query
    GROUP BY qlabel
    ORDER BY label
    """,
)
def embedding_knn_label_purity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """k-NN label purity per label: for each query vector, the fraction
    of its top-{PURITY_K} cosine neighbors sharing its label, averaged
    per label — THE scalar embedding-quality metric (purity near the
    label's base rate means the embedding carries no label signal;
    near 1 means tight label clusters) and the ground truth that
    validates ANN-tier recall claims against labels rather than
    distances.

    Shape: the bruteforce-KNN scoring pattern (broadcast the bounded
    query block with labels attached, cosine against the corpus, partial
    top-k window per query), then a |labels|-row rollup.  Parity: both
    engines compute float64 cosines over identical inputs (bit-identical
    ranks, the r2 finding); purity is an exact integer ratio
    SUM(matches)/(n_q·k), unrounded."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < PURITY_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("qv"),
    )
    from pyspark.sql import Window

    corpus = emb.repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    scored = corpus.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        "qlabel",
        F.col("label").alias("nlabel"),
        F.col("vec_id").alias("neighbor_id"),
        cosine_similarity("qv", "embedding").alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    per_query = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PURITY_K)
        .groupBy("query_id", "qlabel")
        .agg(
            F.sum(
                F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_match")
        )
    )
    return sort_bounded(
        per_query.groupBy(F.col("qlabel").cast("long").alias("label")).agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum("n_match").cast("long").alias("n_label_matches"),
            (
                F.sum("n_match").cast("double")
                / (F.count(F.lit(1)) * F.lit(PURITY_K))
            ).alias("knn_purity"),
        ),
        "label",
    )


embedding_knn_label_purity.__doc__ = (
    embedding_knn_label_purity.__doc__.format(PURITY_K=PURITY_K)
)


# --------------------------------------------------------------------------
# most-correlated dimension pairs (redundancy / rotation QA)
# --------------------------------------------------------------------------

DIMCORR_TOP_K = 15


@register(
    "embedding_dim_correlation_topk",
    oracle=f"""
    WITH vals AS (
        SELECT vec_id,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000, 0)
                   AS BIGINT) AS v6
        FROM embeddings
    ),
    pairs AS (
        SELECT a.dim AS dim_a, b.dim AS dim_b,
               CAST(COUNT(*) AS BIGINT)         AS n,
               CAST(SUM(a.v6) AS BIGINT)        AS sx,
               CAST(SUM(b.v6) AS BIGINT)        AS sy,
               CAST(SUM(a.v6 * b.v6) AS BIGINT) AS sxy,
               CAST(SUM(a.v6 * a.v6) AS BIGINT) AS sxx,
               CAST(SUM(b.v6 * b.v6) AS BIGINT) AS syy
        FROM vals a JOIN vals b
          ON b.vec_id = a.vec_id AND a.dim < b.dim
        GROUP BY a.dim, b.dim
    ),
    corr AS (
        SELECT dim_a, dim_b, n,
               ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / NULLIF(SQRT((CAST(n AS DOUBLE) * sxx
                                    - CAST(sx AS DOUBLE) * sx)
                                   * (CAST(n AS DOUBLE) * syy
                                      - CAST(sy AS DOUBLE) * sy)), 0),
                     6) AS pearson
        FROM pairs
    )
    SELECT dim_a, dim_b, pearson
    FROM corr
    WHERE pearson IS NOT NULL
    ORDER BY ABS(pearson) DESC, dim_a, dim_b
    LIMIT {DIMCORR_TOP_K}
    """,
)
def embedding_dim_correlation_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The top-{DIMCORR_TOP_K} most-correlated embedding dimension
    pairs — the redundancy probe behind PQ subspace design and
    dimensionality debates: |corr| near 1 means the model wastes
    capacity (or a projection bug duplicated an axis), and the PQ
    tier's independence assumption weakens exactly where this list is
    hot.

    Shape: values fix-point to ×1e6 BIGINTs at birth, the pair space is
    a per-vector self-join on dim (fan-out d²/2 per vector — bounded by
    the EMBEDDING WIDTH, never by the corpus), and the moment aggregate
    shuffles only |dim-pair| partials (2 016 for d=64) regardless of
    corpus size.  Parity: all five sums are exact BIGINTs; Pearson
    factors cast to double SEPARATELY before multiplying (r8 overflow
    rule); NULLIF guards constant dimensions; 6dp round BEFORE the
    |corr| ordering, (dim_a, dim_b) tiebreak.  Scale note: Σ(v6)² per
    pair stays in BIGINT while |corpus| · (1e6·|v|)² < 9e18 — ~9e4
    vectors at |v| ≤ 10; beyond that drop the fixed-point scale to 1e4
    (values are float32, so 1e6 over-resolves anyway)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "fval")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.round(F.col("fval").cast("double") * 1000000, 0)
        .cast("long")
        .alias("v6"),
    )
    a = vals.alias("a")
    b = vals.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.vec_id") == F.col("a.vec_id"))
            & (F.col("a.dim") < F.col("b.dim")),
        )
        .groupBy(
            F.col("a.dim").alias("dim_a"), F.col("b.dim").alias("dim_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("a.v6").cast("long").alias("sx"),
            F.sum("b.v6").cast("long").alias("sy"),
            F.sum(F.col("a.v6") * F.col("b.v6")).cast("long").alias("sxy"),
            F.sum(F.col("a.v6") * F.col("a.v6")).cast("long").alias("sxx"),
            F.sum(F.col("b.v6") * F.col("b.v6")).cast("long").alias("syy"),
        )
    )
    num = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    fx = F.col("n").cast("double") * F.col("sxx") - F.col("sx").cast(
        "double"
    ) * F.col("sx")
    fy = F.col("n").cast("double") * F.col("syy") - F.col("sy").cast(
        "double"
    ) * F.col("sy")
    pearson = F.round(num / F.nullif(F.sqrt(fx * fy), F.lit(0.0)), 6)
    return (
        pairs.select("dim_a", "dim_b", pearson.alias("pearson"))
        .where(F.col("pearson").isNotNull())
        .orderBy(F.abs(F.col("pearson")).desc(), "dim_a", "dim_b")
        .limit(DIMCORR_TOP_K)
    )


embedding_dim_correlation_topk.__doc__ = (
    embedding_dim_correlation_topk.__doc__.format(
        DIMCORR_TOP_K=DIMCORR_TOP_K
    )
)


# --------------------------------------------------------------------------
# label separation from centroid algebra (no pairwise stage)
# --------------------------------------------------------------------------

SEP_SCALE = 10_000  # ×1e4 fixed point for normalized coordinates


@register(
    "embedding_label_separation",
    oracle=f"""
    WITH vals AS (
        SELECT vec_id, label,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(unnest(embedding) AS DOUBLE)                 AS val
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id, sqrt(SUM(val * val)) AS nrm
        FROM vals GROUP BY vec_id
    ),
    qv AS (
        SELECT v.vec_id, v.label, v.dim,
               CAST(ROUND(v.val / n.nrm * {SEP_SCALE}, 0) AS BIGINT) AS q
        FROM vals v JOIN norms n USING (vec_id)
    ),
    sld AS (SELECT label, dim, CAST(SUM(q) AS BIGINT) AS s
            FROM qv GROUP BY label, dim),
    lab AS (SELECT label, CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n,
                   CAST(SUM(q * q) AS BIGINT) AS qq
            FROM qv GROUP BY label),
    gd AS (SELECT dim, CAST(SUM(s) AS BIGINT) AS g FROM sld GROUP BY dim),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM lab),
    dots AS (
        SELECT sld.label,
               CAST(SUM(sld.s * sld.s) AS BIGINT)  AS ss,
               CAST(SUM(sld.s * gd.g) AS BIGINT)   AS sg
        FROM sld JOIN gd USING (dim) GROUP BY sld.label
    )
    SELECT CAST(l.label AS BIGINT) AS label,
           l.n                     AS n_vectors,
           CAST(d.ss - l.qq AS DOUBLE)
               / NULLIF(l.n * (l.n - 1), 0)
               / {SEP_SCALE * SEP_SCALE} AS intra_cos,
           CAST(d.sg - d.ss AS DOUBLE)
               / NULLIF(l.n * (t.big_n - l.n), 0)
               / {SEP_SCALE * SEP_SCALE}
               AS inter_cos
    FROM lab l JOIN dots d USING (label) CROSS JOIN tot t
    ORDER BY label
    """,
)
def embedding_label_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean intra-label vs inter-label cosine per label WITHOUT any
    pairwise stage: on (quantized) unit vectors the mean pairwise dot
    within a label is (‖Σv‖² − Σ‖v‖²)/(n(n−1)) and against the rest of
    the corpus it is (Σv·(S−Σv))/(n(N−n)) — centroid algebra turns the
    O(N²) separation statistic into per-(label, dim) SUMS.  A label
    whose intra/inter gap collapses is the first place kNN label purity
    dies; this is the screen that says WHERE.

    Shape: explode to (label, dim) sums — the only data-sized pass —
    then everything downstream is |labels|×|dims| bounded.  At 100 TB
    the corpus contributes one map-side-combined aggregate; no pair
    space ever exists (contrast: ``embedding_knn_label_purity`` samples
    because its neighbor graph is quadratic).  Parity: normalized
    coordinates are fixed-pointed ×1e4 to BIGINT at birth (r7 rule), so
    every Σ, ‖·‖², and dot product is EXACT integer arithmetic at any
    summation order; the two output ratios divide exact integers once,
    emitted UNROUNDED (bit-identical, r2 rule — rounding would
    re-introduce the r10 shortest-repr tie class).  Scale note: the
    integer dot products stay in BIGINT while n·1e4 < 3e9 per (label,
    dim) — ~300k vectors per label at this scale; beyond that raise the
    descale or pre-divide by n."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).cast("long").alias("dim"),
        "val",
    )
    norms = vals.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    qv = vals.join(norms, "vec_id").select(
        "vec_id",
        "label",
        "dim",
        F.round(F.col("val") / F.col("nrm") * SEP_SCALE, 0)
        .cast("long")
        .alias("q"),
    )
    sld = qv.groupBy("label", "dim").agg(
        F.sum("q").cast("long").alias("s")
    )
    lab = qv.groupBy("label").agg(
        F.countDistinct("vec_id").cast("long").alias("n"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("qq"),
    )
    gd = sld.groupBy("dim").agg(F.sum("s").cast("long").alias("g"))
    tot = lab.agg(F.sum("n").cast("long").alias("big_n"))
    dots = (
        sld.join(gd, "dim")
        .groupBy("label")
        .agg(
            F.sum(F.col("s") * F.col("s")).cast("long").alias("ss"),
            F.sum(F.col("s") * F.col("g")).cast("long").alias("sg"),
        )
    )
    scale2 = SEP_SCALE * SEP_SCALE
    return sort_bounded(
        lab.join(dots, "label")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("n").alias("n_vectors"),
            (
                (F.col("ss") - F.col("qq")).cast("double")
                / F.nullif(
                    F.col("n") * (F.col("n") - 1), F.lit(0)
                )
                / F.lit(scale2)
            ).alias("intra_cos"),
            (
                (F.col("sg") - F.col("ss")).cast("double")
                / F.nullif(
                    F.col("n") * (F.col("big_n") - F.col("n")), F.lit(0)
                )
                / F.lit(scale2)
            ).alias("inter_cos"),
        ),
        "label",
    )


# --------------------------------------------------------------------------
# does the norm distribution differ by label? (integer ANOVA)
# --------------------------------------------------------------------------

@register(
    "embedding_norm_label_anova",
    oracle="""
    WITH vals AS (
        SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
        WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
    ),
    norms AS (
        SELECT vec_id, CAST(ANY_VALUE(label) AS BIGINT) AS label,
               CAST(ROUND(sqrt(SUM(val * val)) * 10000, 0) AS BIGINT)
                   AS norm4
        FROM vals GROUP BY vec_id
    ),
    g AS (
        SELECT label, CAST(SUM(norm4) AS BIGINT) AS sg,
               CAST(COUNT(*) AS BIGINT) AS ng
        FROM norms GROUP BY label
    ),
    t AS (SELECT CAST(SUM((sg * sg) // ng) AS BIGINT)
                     AS tt,
                 CAST(COUNT(*) AS BIGINT) AS n_labels
          FROM g),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(norm4) AS BIGINT) AS s,
                 CAST(SUM(norm4 * norm4) AS BIGINT) AS q
          FROM norms)
    SELECT m.n AS n_vectors,
           t.n_labels,
           CAST(t.tt - (m.s * m.s) // m.n AS DOUBLE)
               / NULLIF(m.q - (m.s * m.s) // m.n, 0)
               AS norm_anova_r2
    FROM m CROSS JOIN t
    """,
)
def embedding_norm_label_anova(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-number answer to "was every label embedded by the same
    model/config?": ANOVA R² of label means over the per-vector norm
    distribution — near 0 the labels share a norm band (healthy), a
    jump means some label came from a different encoder or scaling
    (the drift ``embedding_norm_quantiles`` shows per label, reduced to
    a single monitorable scalar).

    Shape: per-vector norms (the established explode + codegen v·v
    sum), then |labels|-bounded integer moments.  Parity: norms
    fixed-pointed ×1e4 to BIGINT (the norm_quantiles convention); the
    non-integer ANOVA terms ``sg² div ng`` / ``s² div n`` are
    INTEGER-DIVIDED (both engines floor positives; the ≤1-unit
    truncation loss is identical cross-engine and negligible vs the
    1e8-scale SST), so R² is one exact-integer ratio of BIGINTs,
    unrounded; NULLIF guards the constant-norm degenerate.  No scale
    factor multiplies the SS terms (an earlier ×1e6 cancelled between
    numerator and denominator but made ``q·1e6`` the binding overflow
    at ~9e4 vectors — r10 ADVICE).  Scale note: the binding term is
    now ``s*s`` (s = Σnorm4 ≈ n·1e4 for unit vectors), exact in
    BIGINT while s < 3.03e9, i.e. ~300k unit-norm vectors globally;
    beyond that pre-divide per label first (q = Σnorm4² alone holds
    to ~9e10 vectors).  NULL vec_id / NULL embedding rows dropped on
    BOTH engines (null-catalog audit, r18 — see embedding_norms)."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    ex = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.explode_outer(F.col("embedding").cast("array<double>")).alias(
            "v"
        ),
    )
    norms = ex.groupBy("vec_id").agg(
        F.first("label").alias("label"),
        F.round(F.sqrt(F.sum(F.col("v") * F.col("v"))) * 10000, 0)
        .cast("long")
        .alias("norm4"),
    )
    g = norms.groupBy("label").agg(
        F.sum("norm4").cast("long").alias("sg"),
        F.count(F.lit(1)).cast("long").alias("ng"),
    )
    t = g.agg(
        F.sum(F.expr("(sg * sg) div ng"))
        .cast("long")
        .alias("tt"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
    )
    m = norms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("norm4").cast("long").alias("s"),
        F.sum(F.col("norm4") * F.col("norm4")).cast("long").alias("q"),
    )
    ssb = F.expr("tt - (s * s) div n")
    sst = F.expr("q - (s * s) div n")
    return (
        m.crossJoin(F.broadcast(t)).select(
            F.col("n").alias("n_vectors"),
            "n_labels",
            (ssb.cast("double") / F.nullif(sst, F.lit(0))).alias(
                "norm_anova_r2"
            ),
        )
    )


# --------------------------------------------------------------------------
# PC1 spectrum share (encoder-health eigendecomposition, r11)
# --------------------------------------------------------------------------

PCA_TOP_SHARES = 5  # report the top-1 and top-5 eigenvalue shares


@register("embedding_pc1_spectrum", oracle=None)
def embedding_pc1_spectrum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spectral health of the embedding space: the share of total
    variance carried by the top principal component (and the top
    {PCA_TOP_SHARES}) — the anisotropy number behind every "embedding
    collapse" postmortem (PC1 share near 1 means the encoder squeezed
    everything onto one axis and cosine similarity is mush;
    ``embedding_dim_correlation_topk`` sees pairwise symptoms, this is
    the eigenvalue diagnosis).  Rows-only by contract (no SQL
    eigensolver); the planted anisotropic/isotropic pins are the
    semantic check (tests/test_new_ops_r11.py).

    Shape: the scalable PCA decomposition — one Arrow-batched
    mapInPandas pass computes per-partition GEMM partials (n, Σx,
    XᵀX as a d² vector; numpy does the d×n·d work per batch), the
    driver sums the ≤|partitions| partial rows (bounded collect, the
    IVF-trainer convention) and eigensolves the d×d covariance with
    ``numpy.linalg.eigvalsh`` (deterministic).  Raw vectors never
    shuffle; the only data-sized work is the embarrassingly parallel
    partial pass.  d is read from the first batch; d² doubles per
    partition is the entire transfer."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    n_parts = spark.sparkContext.defaultParallelism

    def kernel(batches):
        n = 0
        s = None
        xtx = None
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(
                np.float64
            )
            if s is None:
                s = np.zeros(x.shape[1])
                xtx = np.zeros((x.shape[1], x.shape[1]))
            n += x.shape[0]
            s += x.sum(axis=0)
            xtx += x.T @ x
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "n": [n],
                "s": [s.tolist()],
                "xtx": [xtx.ravel().tolist()],
            }
        )

    src = emb.select("vec_id", "embedding")
    if src.rdd.getNumPartitions() < n_parts:
        src = src.repartition(n_parts)  # one-row-group fixture trap
        # (conditional: a multi-split input is already parallel, r17)
    partials = (
        src.mapInPandas(
            kernel,
            schema="n long, s array<double>, xtx array<double>",
        )
        .collect()  # bounded: <= defaultParallelism rows of d^2 doubles
    )
    if not partials:
        # zero-row input (empty-catalog audit, r17): no spectrum
        return local_rows_frame(
            spark,
            [],
            schema=(
                "n_vectors long, dim long, total_variance double, "
                "pc1_share double, top5_share double"
            ),
        )
    n = sum(r["n"] for r in partials)
    d = len(partials[0]["s"])
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for r in partials:
        s += np.asarray(r["s"])
        xtx += np.asarray(r["xtx"]).reshape(d, d)
    mean = s / n
    cov = (xtx - n * np.outer(mean, mean)) / max(n - 1, 1)
    eig = np.linalg.eigvalsh(cov)[::-1]  # descending
    total = float(eig.sum())
    top1 = float(eig[0]) / total if total > 0 else 0.0
    topk = (
        float(eig[:PCA_TOP_SHARES].sum()) / total if total > 0 else 0.0
    )
    # LocalRelation (r18): the 1-row solve result needs no Python RDD
    return local_rows_frame(
        spark,
        [
            (
                int(n),
                int(d),
                round(total, 6),
                round(top1, 6),
                round(topk, 6),
            )
        ],
        "n_vectors long, dim long, total_variance double, "
        "pc1_share double, top5_share double",
    )


embedding_pc1_spectrum.__doc__ = embedding_pc1_spectrum.__doc__.format(
    PCA_TOP_SHARES=PCA_TOP_SHARES
)


# --------------------------------------------------------------------------
# k-means inertia curve (r12) — the iterative-refinement scale template
# --------------------------------------------------------------------------

KMEANS_K = 8
KMEANS_ITERS = 3


@register("embedding_kmeans_inertia", oracle=None)
def embedding_kmeans_inertia(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lloyd k-means over the embedding table, reporting the inertia
    (within-cluster sum of squared distances) and max centroid shift
    per iteration — the convergence curve behind every coarse
    quantizer (the IVF/PQ trainers sample; this is the full-corpus
    distributed loop, and the template for ANY iterative-refinement
    op: broadcast the model down, tree-aggregate sufficient statistics
    up, update on the driver).  Rows-only by contract (no SQL
    iterative solver); the planted 8-blob closed-form pins are the
    semantic check (tests/test_new_ops_r12c.py).

    Shape: deterministic seeding (the K={KMEANS_K} smallest vec_ids via
    TakeOrdered, never a global sort); each of the {KMEANS_ITERS}
    iterations is ONE Arrow-batched mapInPandas pass emitting
    per-partition sufficient statistics (counts[k], sums[k·d],
    inertia partial — numpy GEMM does the n·k·d work per batch); the
    driver sums the ≤|partitions| partial rows IN PARTITION-ID ORDER
    (deterministic float merge) and moves the centroids.  Raw vectors
    never shuffle; per-iteration transfer is k·d doubles each way.
    Empty clusters keep their previous centroid (deterministic).
    Inertia is evaluated against the ITERATION-START centroids, so
    iteration 1's value is the seeding quality and the sequence is
    non-increasing (Lloyd monotonicity — pinned)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    n_parts = spark.sparkContext.defaultParallelism
    seeds = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(KMEANS_K)
        .collect()
    )
    if not seeds:
        # zero-row input (empty-catalog audit, r17): no corpus, no loop
        return local_rows_frame(
            spark,
            [],
            schema=(
                "iteration long, inertia double, max_shift double, "
                "n_empty_clusters long"
            ),
        )
    cents = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in seeds]
    )
    data = emb.select("vec_id", "embedding").repartition(
        n_parts, "vec_id"
    )
    out_rows = []
    for it in range(1, KMEANS_ITERS + 1):
        c = cents  # capture current centroids in the kernel closure

        def kernel(batches, c=c):
            from pyspark import TaskContext

            k, d = c.shape
            cnt = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, d))
            inertia = 0.0
            for pdf in batches:
                if pdf.empty:
                    continue
                x = np.stack(pdf["embedding"].to_numpy()).astype(
                    np.float64
                )
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2  (GEMM form)
                d2 = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ c.T)
                    + (c * c).sum(axis=1)[None, :]
                )
                a = d2.argmin(axis=1)
                inertia += float(d2[np.arange(len(a)), a].sum())
                np.add.at(cnt, a, 1)
                np.add.at(sums, a, x)
            if cnt.sum() == 0:
                return
            yield pd.DataFrame(
                {
                    "pid": [TaskContext.get().partitionId()],
                    "cnt": [cnt.tolist()],
                    "sums": [sums.ravel().tolist()],
                    "inertia": [inertia],
                }
            )

        partials = sorted(
            data.mapInPandas(
                kernel,
                schema=(
                    "pid long, cnt array<long>, "
                    "sums array<double>, inertia double"
                ),
            ).collect(),  # bounded: one partial row per partition
            key=lambda r: r["pid"],
        )
        k, d = cents.shape
        cnt = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d))
        inertia = 0.0
        for r in partials:  # bounded: <= n_parts rows, summed in order
            cnt += np.asarray(r["cnt"], dtype=np.int64)
            sums += np.asarray(r["sums"]).reshape(k, d)
            inertia += r["inertia"]
        new_cents = cents.copy()
        nonempty = cnt > 0
        new_cents[nonempty] = sums[nonempty] / cnt[nonempty, None]
        shift = float(
            np.sqrt(((new_cents - cents) ** 2).sum(axis=1)).max()
        )
        out_rows.append(
            (
                it,
                round(inertia, 6),
                round(shift, 6),
                int((~nonempty).sum()),
            )
        )
        cents = new_cents
    # LocalRelation (r18): the Lloyd trace is driver-resident already
    return local_rows_frame(
        spark,
        out_rows,
        "iteration long, inertia double, max_shift double, "
        "n_empty_clusters long",
    )


embedding_kmeans_inertia.__doc__ = embedding_kmeans_inertia.__doc__.format(
    KMEANS_K=KMEANS_K, KMEANS_ITERS=KMEANS_ITERS
)


# --------------------------------------------------------------------------
# exact-duplicate vectors (r12c) — retry/ingest dup screen
# --------------------------------------------------------------------------

@register(
    "embedding_exact_dup_stats",
    oracle="""
    WITH g AS (
        SELECT embedding, CAST(COUNT(*) AS BIGINT) AS sz
        FROM embeddings WHERE embedding IS NOT NULL
        GROUP BY embedding
    )
    SELECT CAST(sz AS BIGINT)            AS cluster_size,
           CAST(COUNT(*) AS BIGINT)      AS n_clusters,
           CAST(sz * COUNT(*) AS BIGINT) AS n_vectors
    FROM g GROUP BY sz ORDER BY sz
    """,
)
def embedding_exact_dup_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bitwise-identical embedding vectors, as a cluster-size
    histogram — the cheap screen that catches ingest retries, frozen
    encoders fed identical inputs, and zero-vector fallbacks BEFORE
    the semantic tiers spend compute on them (``dedup_semantic`` finds
    near-dups; exact dups are a groupBy).  cluster_size 1 rows count
    the unique mass, so the histogram also audits total coverage
    (Σ n_vectors = corpus size — test-pinned).

    Shape: one structural group-by on the vector value, closing to a
    counts-of-counts histogram (bounded by |distinct cluster sizes|).
    At 100 TB pre-hash each vector to a 128-bit digest Spark-side so
    the exchange carries 16 B/row instead of 4d B — the histogram is
    digest-invariant.  Parity: array equality is elementwise float
    identity on both engines (no arithmetic, no tolerance — fixture
    floats round-trip exactly); counts exact BIGINTs; fixture vectors
    are all DISTINCT (histogram = one all-ones row), so the planted
    duplicate test is the semantic check."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    g = emb.groupBy("embedding").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return sort_bounded(
        g.groupBy("sz")
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
        .select(
            F.col("sz").cast("long").alias("cluster_size"),
            "n_clusters",
            (F.col("sz") * F.col("n_clusters"))
            .cast("long")
            .alias("n_vectors"),
        ),
        "cluster_size",
    )


# --------------------------------------------------------------------------
# did the embedding distribution move between ingest epochs? (r16)
# --------------------------------------------------------------------------

@register(
    "embedding_epoch_drift",
    oracle=f"""
    WITH vals AS (
        SELECT vec_id, label, vec_id % 2 AS epoch,
               CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
               CAST(unnest(embedding) AS DOUBLE)                 AS val
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id, sqrt(SUM(val * val)) AS nrm
        FROM vals GROUP BY vec_id
    ),
    qv AS (
        SELECT v.vec_id, v.label, v.epoch, v.dim,
               CAST(ROUND(v.val / n.nrm * {SEP_SCALE}, 0) AS BIGINT) AS q
        FROM vals v JOIN norms n USING (vec_id)
    ),
    sld AS (
        SELECT label, dim,
               CAST(SUM(CASE WHEN epoch = 0 THEN q ELSE 0 END)
                    AS BIGINT) AS s0,
               CAST(SUM(CASE WHEN epoch = 1 THEN q ELSE 0 END)
                    AS BIGINT) AS s1
        FROM qv GROUP BY label, dim
    ),
    lab AS (
        SELECT label,
               CAST(COUNT(DISTINCT CASE WHEN epoch = 0 THEN vec_id END)
                    AS BIGINT) AS n_epoch0,
               CAST(COUNT(DISTINCT CASE WHEN epoch = 1 THEN vec_id END)
                    AS BIGINT) AS n_epoch1
        FROM qv GROUP BY label
    ),
    dots AS (
        SELECT label,
               CAST(SUM(s0 * s1) AS BIGINT) AS dot,
               CAST(SUM(s0 * s0) AS BIGINT) AS a,
               CAST(SUM(s1 * s1) AS BIGINT) AS b
        FROM sld GROUP BY label
    )
    SELECT CAST(l.label AS BIGINT) AS label,
           l.n_epoch0, l.n_epoch1,
           CAST(d.dot AS DOUBLE)
               / NULLIF(sqrt(CAST(d.a AS DOUBLE))
                        * sqrt(CAST(d.b AS DOUBLE)), 0) AS drift_cos
    FROM lab l JOIN dots d USING (label)
    ORDER BY label
    """,
)
def embedding_epoch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between two interleaved ingest epochs
    (``vec_id % 2`` — the deterministic even/odd split a re-embedding
    or encoder-upgrade A/B actually produces): cosine between the
    epoch-0 and epoch-1 label centroids.  A label whose drift_cos sags
    below ~1 has moved in embedding space between ingests — the drift
    monitor you run BEFORE trusting any cross-epoch similarity join or
    ANN index built on mixed batches (an index cell boundary trained on
    epoch 0 misroutes epoch-1 queries exactly where this sags).

    Centroid algebra, no pair space: cos(Σ₀v, Σ₁v) needs only the
    per-(label, dim) epoch sums — one conditional aggregate over the
    exploded coordinates (the only data-sized pass, map-side combined),
    then everything is |labels|×|dims| bounded.  Parity: normalized
    coordinates fixed-pointed ×{SEP_SCALE} to BIGINT at birth (the r7
    rule, shared with embedding_label_separation), so the dot and the
    two squared norms are EXACT integers at any summation order;
    drift_cos divides once in a FIXED two-term written order
    (dot / (sqrt(a)·sqrt(b)), each factor cast to DOUBLE separately —
    the r8 overflow rule — and sqrt of an exact-integer double is
    IEEE-correctly-rounded, so the expression is bit-identical
    cross-engine: the r15 ≤2-term fixed-order safe-double class),
    emitted UNROUNDED.  A label with no vectors in one epoch has a
    zero centroid there → NULLIF → NULL drift on both engines (planted
    pin).  Headroom: Σ_dim (n·1e4)² stays in BIGINT while n ≤ ~75k
    vectors per (label, epoch) at 16 dims; beyond that pre-divide the
    epoch sums by n (true centroids) before the dot."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        "label",
        (F.col("vec_id") % 2).cast("long").alias("epoch"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "val"
        ),
    ).select(
        "vec_id",
        "label",
        "epoch",
        (F.col("pos") + 1).cast("long").alias("dim"),
        "val",
    )
    norms = vals.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    qv = vals.join(norms, "vec_id").select(
        "vec_id",
        "label",
        "epoch",
        "dim",
        F.round(F.col("val") / F.col("nrm") * SEP_SCALE, 0)
        .cast("long")
        .alias("q"),
    )
    sld = qv.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("epoch") == 0, F.col("q")).otherwise(0))
        .cast("long")
        .alias("s0"),
        F.sum(F.when(F.col("epoch") == 1, F.col("q")).otherwise(0))
        .cast("long")
        .alias("s1"),
    )
    lab = qv.groupBy("label").agg(
        F.countDistinct(
            F.when(F.col("epoch") == 0, F.col("vec_id"))
        ).cast("long").alias("n_epoch0"),
        F.countDistinct(
            F.when(F.col("epoch") == 1, F.col("vec_id"))
        ).cast("long").alias("n_epoch1"),
    )
    dots = sld.groupBy("label").agg(
        F.sum(F.col("s0") * F.col("s1")).cast("long").alias("dot"),
        F.sum(F.col("s0") * F.col("s0")).cast("long").alias("a"),
        F.sum(F.col("s1") * F.col("s1")).cast("long").alias("b"),
    )
    return sort_bounded(
        lab.join(dots, "label").select(
            F.col("label").cast("long").alias("label"),
            "n_epoch0",
            "n_epoch1",
            (
                F.col("dot").cast("double")
                / F.nullif(
                    F.sqrt(F.col("a").cast("double"))
                    * F.sqrt(F.col("b").cast("double")),
                    F.lit(0.0),
                )
            ).alias("drift_cos"),
        ),
        "label",
    )
