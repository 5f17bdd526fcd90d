"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Core LLM-training-data pipeline surface (driver north star; the reference
itself has no dedup — SURVEY.md §2.A.4).  Design rules:

- **UDF-free.** Shingling, hashing, minhashing, banding and Hamming math are
  all JVM higher-order functions (`transform`, `aggregate`, `xxhash64`) —
  whole-stage-codegen'd, Arrow never involved.
- **Deterministic.** Fixed hash seeds; "keeper" of a duplicate group is
  always min(doc_id); pair outputs are (lo, hi) ordered.
- **Scale shape.** Exact dedup is one hash-aggregate (shuffle ∝ distinct
  keys).  MinHash-LSH bounds candidate generation to per-band buckets —
  never the O(n²) cross join — and the final Jaccard verify only touches
  candidate pairs.  At 100 TB: band buckets are salted-skew-safe since a
  bucket key is (band_id, band_hash) — hot buckets indicate true heavy
  duplicate clusters, which AQE skew-split handles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

SHINGLE_K = 3            # words per shingle
MINHASH_PERMS = 64       # minhash signature length
LSH_BANDS = 16           # 16 bands × 4 rows — ~0.5 jaccard threshold knee
JACCARD_THRESHOLD = 0.6  # verified-duplicate cutoff
SHINGLE_DF_CAP = 256     # drop shingles seen in more docs (stopword n-grams)

# MinHash permutation family h_p(x) = (A[p]·x + B[p]) mod (2³¹−1) over
# 31-bit shingle hashes.  The modulus MUST be small enough that the
# product actually wraps: the pre-r12 family used small multipliers
# (2p+1 ≤ 129) against mod 2⁶¹−1, so h_p(x) < 2³⁸ never wrapped — every
# "permutation" was monotone in x, all 64 minima picked the SAME argmin
# (the minimum shingle hash), and LSH banding degenerated to
# single-hash matching (recall ≈ J instead of the banding curve; found
# by the r12 planted mid-Jaccard pin, confirmed by a 0/64
# signature-slot match at J≈0.67 where true minhash reads ~43/64).
# With a full-range A and mod 2³¹−1 the orderings genuinely permute.
# A[p]·x < 2⁶² fits a long, so the JVM expression stays ANSI-safe.
# Constants are fixed (seeded Mersenne-Twister — stable across Python
# versions), identical in the JVM and Arrow kernels.
_MERSENNE = (1 << 61) - 1  # kept for the historical docstring reference
_P31 = (1 << 31) - 1

import random as _random  # noqa: E402  (module-level, deterministic)

_minhash_rng = _random.Random(0x12C0FFEE)
MINHASH_A = tuple(
    _minhash_rng.randrange(1, _P31) for _ in range(MINHASH_PERMS)
)
MINHASH_B = tuple(
    _minhash_rng.randrange(0, _P31) for _ in range(MINHASH_PERMS)
)
del _minhash_rng


def _shingles(col: str = "text"):
    """k-word shingles as a distinct array<string> — the shared
    expression from functions/columns.py (single parity-critical copy)."""
    from googlecloudstorage_blueprints_spark.functions.columns import (
        word_shingles,
    )

    return word_shingles(col, SHINGLE_K)


def hashed_shingle_docs(d: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sh_hashes: array<bigint>) — k-word shingles as combined
    hashes, never materializing shingle strings.

    Shingle strings via slice + concat_ws allocate per element inside an
    interpreted higher-order function — measured ~0.8 ms per 100-word doc.
    Instead each word is hashed ONCE into a separate column (so the lambda
    below indexes a precomputed array instead of re-running the word-hash
    transform per element), then consecutive triples combine through
    xxhash64 masked to 31 bits (feeding the minhash permutation family
    directly; the 64-bit word hashes make word-level collisions ~2⁻⁶⁴).
    31-bit shingle collisions only perturb candidate generation; they
    cannot create false positives because output pairs are
    Jaccard-verified.  Docs shorter than SHINGLE_K words have no k-shingle
    and are dropped.

    The input is repartitioned before the per-doc compute: the fixture is
    a single-row-group parquet file, which Spark cannot split, so without
    the repartition every downstream per-doc lambda would serialize on one
    core.  (At production scale inputs are many files and the repartition
    spreads a ~KB/doc projection — cheap either way.)"""
    parallelism = d.sparkSession.sparkContext.defaultParallelism
    words = F.split(text_col, " ")
    with_wh = (
        d.where(F.size(words) >= SHINGLE_K)
        .repartition(parallelism, "doc_id")
        .select(
            "doc_id",
            F.expr(
                f"transform(split({text_col}, ' '), w -> xxhash64(w))"
            ).alias("wh"),
        )
    )
    combine = F.expr(
        f"array_distinct(transform(sequence(0, size(wh) - {SHINGLE_K}), "
        f"i -> xxhash64(wh[i], wh[i + 1], wh[i + 2]) & 2147483647))"
    )
    return with_wh.select("doc_id", combine.alias("sh_hashes"))


@register(
    "exact_dedup",
    oracle="""
    SELECT md5(text)        AS content_hash,
           MIN(doc_id)      AS keep_doc_id,
           COUNT(*)         AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one hash-aggregate keyed on md5(text).

    Deterministic keeper = min(doc_id) — never dropDuplicates(), whose
    survivor depends on partition order.  At 100 TB the group key is the
    16-byte digest, not the document text, so the shuffle carries hashes."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "ngram_jaccard_dedup",
    oracle=f"""
    WITH sh_all AS (
        SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id,
                     unnest(list_distinct(list_transform(
                         range(1, greatest(len(string_split(text,' ')) - {SHINGLE_K - 1}, 1) + 1),
                         i -> array_to_string(string_split(text,' ')[i:i+{SHINGLE_K - 1}], ' ')
                     ))) AS s
              FROM documents WHERE text IS NOT NULL)
    ),
    kept AS (SELECT s FROM sh_all GROUP BY s
             HAVING COUNT(*) <= {SHINGLE_DF_CAP}),
    sh AS (SELECT sh_all.doc_id, sh_all.s FROM sh_all JOIN kept USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE i.n_common * 1.0 / (sa.sz + sb.sz - i.n_common) >= {JACCARD_THRESHOLD}
    """,
)
def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram (3-word-shingle) Jaccard near-dup pairs ≥ threshold,
    over the df-capped shingle universe.

    Inverted-index join: explode distinct shingles, drop shingles whose
    document frequency exceeds ``SHINGLE_DF_CAP`` (a corpus-wide n-gram
    — boilerplate, stopword runs — carries no near-dup signal but makes
    the self-join emit df² candidate rows; capping bounds every
    shingle's join fan-out at CAP², the standard stopword-shingle trick),
    then self-join on shingle, count intersections, and derive |A∪B|
    from the capped set sizes.  Jaccard is a ratio of identical integers
    on both engines → exact double, no rounding.  Both the Spark plan
    and the DuckDB oracle cap identically, so values stay hash-equal.

    Scale: with the cap, worst-case candidate volume is
    Σ_kept df(s)² ≤ CAP · Σ df(s) — linear in corpus shingle count, not
    quadratic in hot-shingle df.  In production the exact verify still
    runs preferentially on LSH candidate pairs (see minhash_lsh_dedup);
    standalone it is the ground-truth oracle the LSH recall is judged
    against, now safe to run as registered."""
    # NULL text must not shingle: word_shingles(NULL) yields [""] on
    # Spark (concat_ws over a NULL slice) while DuckDB's list pipeline
    # propagates NULL to zero rows — a phantom ""-shingle clique
    # (null-catalog audit, r18); filter BOTH engines
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    # repartition before the interpreted shingle-string lambda: the fixture
    # is one unsplittable row group (see hashed_shingle_docs)
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sh_all = d.select("doc_id", F.explode_outer(_shingles()).alias("s"))
    # single computation of the exploded shingles feeds df-count AND join
    sh_all = sh_all.persist()
    hot = (
        sh_all.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
    )
    # anti-join out the hot shingles.  No forced broadcast: the hot set
    # is usually tiny (boilerplate n-grams) and AQE will broadcast it
    # from runtime stats, but its worst-case size is rows/CAP — on an
    # adversarial corpus a shuffle anti-join on s is the safe fallback,
    # and the self-join below needs sh partitioned by s anyway.
    sh = sh_all.join(hot, "s", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") * 1.0 / (
        F.col("sa.sz") + F.col("sb.sz") - F.col("n_common")
    )
    out = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .persist()
    )
    out.count()  # materialize through the cached shingle frame
    sh_all.unpersist()
    return out


def minhash_signatures_arrow(
    hashed_docs: DataFrame, emit_bands: bool = False
) -> DataFrame:
    """doc_id + array<bigint> minhash signature via ONE Arrow-batched
    numpy kernel — the production signature path.  With
    ``emit_bands=True`` the same kernel emits the LSH band rows
    (doc_id, band_id, band_hash) directly — one Python pass for
    signature AND banding (band_hash is an FNV-1a mix of the band's
    permutation minima; any deterministic injective-enough combiner
    works, since both sides of the bucket self-join use the same one).

    Same permutation family as :func:`minhash_signatures`
    (h_p(x) = (A[p]·x + B[p]) mod (2³¹−1) — full-range multipliers so
    the mod genuinely wraps; see the MINHASH_A comment for the r12
    degenerate-family fix), vectorized as one modmul over the flattened
    shingle hashes per batch plus a ``minimum.reduceat`` per
    permutation (products < 2⁶² — exact in uint64).  Chosen over the JVM
    64-min-column aggregate because that plan pays ~3.5 s of whole-stage
    codegen compilation PER SESSION (the generated class is huge) before
    computing anything, and its explode feeds 64 aggregate expressions
    per shingle row; the numpy kernel is a dense array pass with zero
    compile cost.  The JVM version remains registered as the
    equivalence oracle (tests/test_minhash_kernel.py pins signature
    equality).  Map-side only: no shuffle — the kernel runs on whatever
    partitioning ``hashed_docs`` already has."""

    rows_per_band = MINHASH_PERMS // LSH_BANDS

    def kernel(batches):
        import numpy as np
        import pandas as pd

        mult = np.array(MINHASH_A, dtype=np.uint64)
        add = np.array(MINHASH_B, dtype=np.uint64)
        p31 = np.uint64(_P31)
        fnv_prime = np.uint64(1099511628211)
        fnv_basis = np.uint64(14695981039346656037)
        for pdf in batches:
            if pdf.empty:
                continue
            lens = pdf["sh_hashes"].map(len).to_numpy()
            flat = np.concatenate(pdf["sh_hashes"].to_list()).astype(
                np.uint64
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            n = len(lens)
            sig = np.empty((n, MINHASH_PERMS), dtype=np.uint64)
            for p in range(MINHASH_PERMS):
                h = (mult[p] * flat + add[p]) % p31
                sig[:, p] = np.minimum.reduceat(h, starts)
            if not emit_bands:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "signature": list(sig.astype(np.int64)),
                    }
                )
                continue
            grouped = sig.reshape(n, LSH_BANDS, rows_per_band)
            bh = np.full((n, LSH_BANDS), fnv_basis, dtype=np.uint64)
            for j in range(rows_per_band):  # uint64 wrap is the FNV mod
                bh = (bh ^ grouped[:, :, j]) * fnv_prime
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(pdf["doc_id"].to_numpy(), LSH_BANDS),
                    "band_id": np.tile(
                        np.arange(LSH_BANDS, dtype=np.int32), n
                    ),
                    "band_hash": bh.reshape(-1).astype(np.int64),
                }
            )

    if emit_bands:
        return hashed_docs.mapInPandas(
            kernel, schema="doc_id long, band_id int, band_hash long"
        )
    return hashed_docs.mapInPandas(
        kernel, schema="doc_id long, signature array<long>"
    )


def minhash_signatures(hashed_docs: DataFrame) -> DataFrame:
    """doc_id + array<bigint> minhash signature (MINHASH_PERMS values)
    from (doc_id, sh_hashes) as produced by :func:`hashed_shingle_docs`.

    Shingle hashes are 31-bit and A[p] < 2³¹, so the permutation family
    h_p(x) = (A[p]·x + B[p]) mod (2³¹−1) never overflows a long
    (product < 2⁶²; ANSI mode makes overflow an error in Spark 4).  The
    small modulus is load-bearing — see the MINHASH_A comment for the
    r12 fix of the non-wrapping (and therefore non-permuting) family.

    Shape: explode shingle hashes → ONE hash-aggregate with MINHASH_PERMS
    codegen'd min() columns.  This deliberately avoids higher-order
    functions (array_min∘transform), which Spark evaluates interpreted
    per-element — measured ~20× slower than the codegen'd aggregate form.
    The aggregate combines map-side, so the shuffle carries one 64-long
    row per document regardless of shingle count.  NOTE: kept as the
    JVM-expression equivalence oracle for
    :func:`minhash_signatures_arrow`, which replaces it in the operator
    (the 64-column codegen costs ~3.5 s of compile per session)."""
    # explode_outer: plain explode adds an implicit size()>0 filter that
    # Catalyst pushes below the repartition, re-running the whole
    # interpreted shingle lambda single-threaded before the shuffle
    hashed = hashed_docs.select(
        "doc_id", F.explode_outer("sh_hashes").alias("h")
    )
    mins = [
        F.min(
            (
                F.lit(MINHASH_A[p]).cast("long") * F.col("h")
                + F.lit(MINHASH_B[p]).cast("long")
            )
            % F.lit(_P31).cast("long")
        ).alias(f"m{p}")
        for p in range(MINHASH_PERMS)
    ]
    return (
        hashed.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[f"m{p}" for p in range(MINHASH_PERMS)]).alias(
                "signature"
            ),
        )
    )


@register("minhash_lsh_dedup")  # rows-only: minhash banding isn't ANSI SQL
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup pairs over the fixture corpus —
    thin registry wrapper around :func:`minhash_pairs` (which the
    curation pipeline also calls on its survivor frame)."""
    return minhash_pairs(load_table(spark, sf_dir, "documents"))


def minhash_pairs(d: DataFrame) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, exact-Jaccard verified.

    Pipeline: hashed shingles → 64-perm minhash signature → 16 bands × 4
    rows → bucket-join on (band_id, band_hash) → distinct candidate pairs
    → exact shingle-hash-Jaccard verify ≥ threshold.

    Scale: candidates come from band buckets only (no cross join); the
    verify operates on 31-bit shingle hashes (collision error ~2⁻²¹ per
    pair of shingles — far below the threshold granularity), so shingle
    strings never materialize anywhere in the pipeline.

    The expensive frame is ``docs`` (the per-doc shingle-hash projection):
    it feeds the signature aggregation AND both sides of the verify join,
    so it is persisted for the duration of the op (round-3 verdict: the
    unpersisted frame recomputed the projection on the verify side — the
    slowest query on the bench).  The verify itself joins candidates back
    to ``docs``' distinct-hash ARRAYS and computes Jaccard with
    ``array_intersect`` — only candidate documents' arrays ever shuffle,
    instead of an exploded row per (doc, shingle) over the whole corpus.
    The output is materialized eagerly (persist + count) so the
    intermediates can be unpersisted before returning; the caller sees a
    cached result sized to the actual duplicate pairs."""
    docs = hashed_shingle_docs(d).persist()
    # one Arrow pass computes signatures AND band hashes (emit_bands)
    bands = minhash_signatures_arrow(docs, emit_bands=True)
    # bands are tiny (LSH_BANDS rows × 24B per doc — KBs per million docs);
    # persist so the self-join doesn't recompute the signature kernel
    # on both sides
    bands = bands.persist()
    ba = bands.alias("ba")
    bb = bands.alias("bb")
    candidates = (
        ba.join(
            bb,
            (F.col("ba.band_id") == F.col("bb.band_id"))
            & (F.col("ba.band_hash") == F.col("bb.band_hash"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"),
            F.col("bb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # exact verify on candidates only: join the candidate ids back to the
    # persisted distinct-shingle-hash arrays and intersect in the JVM —
    # |A∩B| / (|A| + |B| - |A∩B|) over already-distinct arrays
    da = docs.alias("da")
    db = docs.alias("db")
    n_common = F.size(
        F.array_intersect(F.col("da.sh_hashes"), F.col("db.sh_hashes"))
    )
    jac = n_common * 1.0 / (
        F.size(F.col("da.sh_hashes"))
        + F.size(F.col("db.sh_hashes"))
        - n_common
    )
    out = (
        candidates.join(da, F.col("doc_a") == F.col("da.doc_id"))
        .join(db, F.col("doc_b") == F.col("db.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .persist()
    )
    out.count()  # materialize through the cached intermediates
    docs.unpersist()
    bands.unpersist()
    return out


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — the 64-bit SimHash signature stage, factored
    out so ground-truth tests can brute-force Hamming over the SAME
    signatures the banded op buckets (tests/test_candidate_recall.py).

    Signature bit j = sign of Σ_tokens (±1 by bit j of xxhash64(token)):
    explode token hashes → 64 codegen'd conditional-sum aggregates (one
    per signature bit); HOF aggregate∘transform would run interpreted
    per-element — same ~20× penalty minhash_signatures avoids."""
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    toks = d.select(
        "doc_id",
        F.explode_outer(
            F.expr("transform(split(text, ' '), t -> xxhash64(t))")
        ).alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.expr(f"(shiftright(h, {j}) & 1) = 1"), 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(64)
    ]
    # assemble signature with bitwise OR (addition of 2^63 would overflow)
    sig_expr = " | ".join(
        f"(CASE WHEN v{j} > 0 THEN shiftleft(1L, {j}) ELSE 0L END)"
        for j in range(64)
    )
    return (
        toks.groupBy("doc_id")
        .agg(*votes)
        .select("doc_id", F.expr(sig_expr).alias("simhash"))
    )


@register("simhash_dedup")  # rows-only: 64-bit bit-bucketing isn't ANSI SQL
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature from token hashes, candidate
    pairs via 4-segment Hamming blocking (pigeonhole: Hamming ≤ 3 ⇒ at
    least one of 4 16-bit segments equal), verified with exact popcount."""
    sigs = simhash_signatures(spark, sf_dir)
    # block on 16-bit segments (Hamming ≤ 3 guaranteed recall)
    segs = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), s -> "
                "  struct(s AS seg_id, "
                "         shiftright(simhash, s * 16) & 65535 AS seg_val))"
            )
        ).alias("seg"),
    ).select("doc_id", "simhash", "seg.seg_id", "seg.seg_val")
    a = segs.alias("a")
    b = segs.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.seg_id") == F.col("b.seg_id"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.expr("bit_count(sig_a ^ sig_b)")
    return (
        pairs.select(
            "doc_a", "doc_b", hamming.cast("long").alias("hamming")
        )
        .where(F.col("hamming") <= 3)
    )


@register(
    "dedup_survivorship",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_hash,
           CAST(COUNT(*) OVER w AS BIGINT)          AS n_copies,
           MIN(doc_id) OVER w                       AS keeper_doc_id,
           CASE WHEN doc_id = MIN(doc_id) OVER w
                THEN 1 ELSE 0 END                   AS is_keeper
    FROM documents
    WINDOW w AS (PARTITION BY md5(text))
    """,
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level survivorship view of exact dedup: one row PER DOCUMENT
    with its group's keeper and a keep/drop flag — the decision table a
    pipeline actually materializes and joins against (``exact_dedup`` is
    the group-level rollup of the same aggregate; the curation pipeline
    consumes exactly this shape between its gate and split stages,
    pipelines/curate.py).

    One shuffle on the 16-byte digest serves both window functions
    (COUNT and MIN share the partition); text never shuffles.  Keeper =
    min(doc_id) — deterministic, never dropDuplicates() partition-order
    roulette.  All-integer output plus the digest: no rounding."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    return d.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_copies"),
        F.min("doc_id").over(w).alias("keeper_doc_id"),
        F.when(F.col("doc_id") == F.min("doc_id").over(w), 1)
        .otherwise(0)
        .alias("is_keeper"),
    )


@register(
    "dedup_cross_source_matrix",
    oracle="""
    WITH h AS (
        SELECT doc_id, source, md5(text) AS fp
        FROM documents WHERE text IS NOT NULL
    )
    SELECT LEAST(a.source, b.source)    AS source_a,
           GREATEST(a.source, b.source) AS source_b,
           CAST(COUNT(*) AS BIGINT)     AS n_dup_pairs,
           CAST(COUNT(DISTINCT a.fp) AS BIGINT) AS n_shared_texts
    FROM h a JOIN h b ON b.fp = a.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    ORDER BY source_a, source_b
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-flow matrix between sources: exact-duplicate pairs
    aggregated by normalized source pair — WHICH crawls copy each other
    (off-diagonal) and how much each source self-duplicates (diagonal).
    This is the table that decides dedup ORDER in a multi-crawl corpus:
    dedup the copier against the copied, not alphabetically.

    Shape: one digest self-join — the only shuffle key is md5(text), so
    text never shuffles and the join fan-out is |group|² per duplicated
    digest (duplicate groups are small by nature; a pathological
    corpus-wide duplicate is exactly what the report exists to expose,
    and AQE skew-split handles its bucket).  LEAST/GREATEST normalize
    the pair so (a,b) and (b,a) merge.  All-integer output."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    h = d.select("doc_id", "source", F.md5("text").alias("fp"))
    a = h.alias("a")
    b = h.alias("b")
    return (
        a.join(
            b,
            (F.col("b.fp") == F.col("a.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.source"), F.col("b.source")).alias("source_a"),
            F.greatest(F.col("a.source"), F.col("b.source")).alias(
                "source_b"
            ),
            F.col("a.fp").alias("fp"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_pairs"),
            F.countDistinct("fp").cast("long").alias("n_shared_texts"),
        )
        .transform(sort_bounded, "source_a", "source_b")
    )


@register(
    "dedup_rate_by_source",
    oracle="""
    WITH h AS (
        SELECT doc_id, source, md5(text) AS fp,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT)                 AS n_docs,
           CAST(SUM(CASE WHEN doc_id <> keeper
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN doc_id <> keeper
                         THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)           AS drop_rate
    FROM h
    GROUP BY source
    ORDER BY source
    """,
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup loss dashboard: per source, how many documents would
    be DROPPED by min-doc_id survivorship — the number a curation run
    reports per crawl before committing to a dedup pass (a source
    losing half its rows to dedup is a re-crawl bug, not redundancy).

    Shape: one digest-partitioned window (same single md5-keyed shuffle
    as ``dedup_survivorship`` — text never shuffles) feeding a
    |sources|-row aggregate.  drop_rate is an exact integer ratio,
    unrounded; all else integer."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    w = Window.partitionBy(F.md5("text"))
    h = d.select(
        "doc_id",
        "source",
        F.min("doc_id").over(w).alias("keeper"),
    )
    dropped = F.sum(
        F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
    )
    return (
        h.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            dropped.cast("long").alias("n_dropped"),
            (
                dropped.cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("drop_rate"),
        )
        .transform(sort_bounded, "source")
    )


@register(
    "dedup_cluster_size_histogram",
    oracle="""
    WITH g AS (
        SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS copies
        FROM documents GROUP BY md5(text)
    )
    SELECT copies,
           CAST(COUNT(*) AS BIGINT)   AS n_clusters,
           CAST(SUM(copies) AS BIGINT) AS n_docs
    FROM g
    GROUP BY copies
    ORDER BY copies
    """,
)
def dedup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact-duplicate cluster-size distribution — the dedup planning
    view: a heavy tail of large clusters means boilerplate/mirror
    content dominating the corpus (and predicts the hot LSH buckets
    AQE will skew-split); copies=1 rows quantify the unique mass.

    Shape: the same digest-keyed hash-aggregate as exact_dedup, then a
    second reduction over the ≤|max cluster size| domain — the shuffle
    carries digests, the histogram carries integers.  All-integer
    output, no rounding."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("long").alias("copies")
    )
    return sort_bounded(
        g.groupBy("copies").agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("copies").cast("long").alias("n_docs"),
        ),
        "copies",
    )


# --------------------------------------------------------------------------
# boilerplate-prefix share (leading-k-token exact clusters, by source)
# --------------------------------------------------------------------------

PREFIX_TOKENS = 5


@register(
    "doc_prefix_dup_share",
    oracle=f"""
    WITH pfx AS (
        SELECT doc_id, source,
               array_to_string(
                   list_slice(string_split(text, ' '), 1,
                              {PREFIX_TOKENS}), ' ') AS prefix
        FROM documents WHERE text IS NOT NULL
    ),
    grp AS (SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n
            FROM pfx GROUP BY prefix)
    SELECT p.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN g.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_prefix_dup,
           CAST(SUM(CASE WHEN g.n >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS dup_share
    FROM pfx p JOIN grp g USING (prefix)
    GROUP BY p.source
    ORDER BY p.source
    """,
)
def doc_prefix_dup_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of documents per source whose leading {PREFIX_TOKENS}-token
    prefix is shared with at least one other document — the
    boilerplate/template detector that catches header-stamped crawls
    EXACT dedup misses (bodies differ) and n-gram dedup over-pays for
    (the signal is entirely in the prefix).

    Shape: the prefix is an in-row slice+join (codegen), one
    prefix-keyed count aggregate, a prefix-keyed join back (AQE
    broadcasts the group table when small), and a |sources|-row rollup
    — no pairwise stage, same bucket-then-verify scaling as the rest of
    the dedup family.  Parity: both engines' token-slice clamps short
    documents; counts exact; dup_share an unrounded integer ratio."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    pfx = d.select(
        "doc_id",
        "source",
        F.concat_ws(
            " ", F.slice(F.split("text", " "), 1, PREFIX_TOKENS)
        ).alias("prefix"),
    )
    grp = pfx.groupBy("prefix").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    dup = F.when(F.col("n") >= 2, 1).otherwise(0)
    return sort_bounded(
        pfx.join(grp, "prefix")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(dup).cast("long").alias("n_prefix_dup"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias(
                "dup_share"
            ),
        ),
        "source",
    )


doc_prefix_dup_share.__doc__ = doc_prefix_dup_share.__doc__.replace(
    "{PREFIX_TOKENS}", str(PREFIX_TOKENS)
)


# --------------------------------------------------------------------------
# prefix-dedup sensitivity curve (how aggressive is k-token keying?)
# --------------------------------------------------------------------------

SENSITIVITY_KS = (1, 2, 3, 5, 8)


@register(
    "prefix_dedup_sensitivity",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS a
        FROM documents WHERE text IS NOT NULL
    ),
    pfx AS (
        SELECT doc_id,
               unnest([{", ".join(str(k) for k in SENSITIVITY_KS)}]) AS k,
               unnest([{", ".join(
                   f"array_to_string(list_slice(a, 1, {k}), ' ')"
                   for k in SENSITIVITY_KS)}]) AS prefix
        FROM toks
    ),
    grp AS (
        SELECT k, prefix, CAST(COUNT(*) AS BIGINT) AS n
        FROM pfx GROUP BY k, prefix
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT)   AS n_prefixes,
           CAST(SUM(n) AS BIGINT)     AS n_docs,
           CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
               AS n_dup_docs,
           CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS DOUBLE)
               / SUM(n) AS dup_share
    FROM grp
    GROUP BY k
    ORDER BY k
    """,
)
def prefix_dedup_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup-aggressiveness curve: for each prefix length k ∈
    {SENSITIVITY_KS}, how many documents would a leading-k-token
    exact-dedup key collide — the calibration table read BEFORE picking
    the ``doc_prefix_dup_share`` key length (k too small merges
    unrelated docs, too large misses templates; the knee of this curve
    is the right k).

    Shape: the k-level prefixes expand IN-ROW (one positional
    struct-array explode per doc — {n_ks} rows each, codegen), one
    (k, prefix) count aggregate, and a {n_ks}-row rollup.  The DuckDB
    twin zips two positional unnests (the r7 n-gram-pair rule).
    Parity: counts exact, shares unrounded integer ratios."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    a = F.split("text", " ")
    levels = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("k"),
                F.concat_ws(" ", F.slice(a, 1, k)).alias("prefix"),
            )
            for k in SENSITIVITY_KS
        ]
    )
    pfx = d.select(
        "doc_id", F.explode_outer(levels).alias("p")
    ).select("doc_id", F.col("p.k").alias("k"), F.col("p.prefix").alias("prefix"))
    grp = pfx.groupBy("k", "prefix").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    dup_n = F.when(F.col("n") >= 2, F.col("n")).otherwise(0)
    return sort_bounded(
        grp.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n_prefixes"),
            F.sum("n").cast("long").alias("n_docs"),
            F.sum(dup_n).cast("long").alias("n_dup_docs"),
            (F.sum(dup_n).cast("double") / F.sum("n")).alias(
                "dup_share"
            ),
        ),
        "k",
    )


prefix_dedup_sensitivity.__doc__ = prefix_dedup_sensitivity.__doc__.replace(
    "{SENSITIVITY_KS}", str(SENSITIVITY_KS)
).replace("{n_ks}", str(len(SENSITIVITY_KS)))


# --------------------------------------------------------------------------
# dedup quality bias + train/test leakage (curation-composition audits)
# --------------------------------------------------------------------------

@register(
    "dedup_quality_bias",
    oracle="""
    WITH grp AS (
        SELECT md5(text) AS h, MIN(doc_id) AS keeper
        FROM documents GROUP BY md5(text)
    ),
    marked AS (
        SELECT d.n_chars,
               CASE WHEN d.doc_id = g.keeper THEN 'kept'
                    ELSE 'dropped' END AS status
        FROM documents d JOIN grp g ON md5(d.text) = g.h
    )
    SELECT status,
           CAST(COUNT(*) AS BIGINT)           AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)       AS total_chars,
           CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*)
               AS mean_chars
    FROM marked
    GROUP BY status
    ORDER BY status
    """,
)
def dedup_quality_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is exact dedup biased? Length profile of KEPT vs DROPPED
    documents under the min-doc_id survivorship rule — if dropped docs
    are systematically longer/shorter than survivors, the dedup stage
    is shifting the corpus distribution, not just shrinking it (the
    check every curation pipeline should print next to its drop rate).

    Shape: the digest aggregate (the exact_dedup shuffle, digests not
    bodies) joined back on the digest, then a 2-row rollup.  Parity:
    status from an exact integer/key compare; mean_chars an
    exact-integer ratio, unrounded."""
    d = load_table(spark, sf_dir, "documents")
    grp = d.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("keeper")
    )
    marked = (
        d.select("doc_id", "n_chars", F.md5("text").alias("h"))
        .join(grp, "h")
        .select(
            "n_chars",
            F.when(F.col("doc_id") == F.col("keeper"), "kept")
            .otherwise("dropped")
            .alias("status"),
        )
    )
    return sort_bounded(
        marked.groupBy("status").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            (
                F.sum("n_chars").cast("long").cast("double")
                / F.count(F.lit(1))
            ).alias("mean_chars"),
        ),
        "status",
    )


_LEAK_SPLIT = (
    "CASE WHEN ((doc_id % 1000003) * 2654435761) % 100 < 80 "
    "THEN 'train' WHEN ((doc_id % 1000003) * 2654435761) % 100 < 90 "
    "THEN 'val' ELSE 'test' END"
)


@register(
    "split_leakage_check",
    oracle=f"""
    WITH tagged AS (
        SELECT doc_id, md5(text) AS h, {_LEAK_SPLIT} AS split
        FROM documents
    ),
    grp AS (
        SELECT h,
               CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
               CAST(COUNT(*) AS BIGINT)              AS n_docs
        FROM tagged GROUP BY h
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_content_groups,
           CAST(SUM(CASE WHEN n_splits >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaking_groups,
           CAST(SUM(CASE WHEN n_splits >= 2 THEN n_docs ELSE 0 END)
                AS BIGINT) AS n_leaking_docs
    FROM grp
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: content groups (exact-duplicate sets)
    whose members land in MORE THAN ONE split under the deterministic
    stratified_split hash — the failure mode dedup-then-split exists to
    prevent, measured directly (a leaking group puts the same text in
    train AND test, inflating eval).  The fixture corpus has exact
    duplicates, so the counters fire naturally; the planted test pins a
    constructed leak.

    Shape: the digest aggregate again (split cardinality per content
    group — a 16-byte-key shuffle), then a scalar rollup.  Parity: the
    split expression is the SAME pure-BIGINT multiplicative hash
    stratified_split uses (no engine hash function), counts exact."""
    d = load_table(spark, sf_dir, "documents")
    tagged = d.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.expr(_LEAK_SPLIT).alias("split"),
    )
    grp = tagged.groupBy("h").agg(
        F.countDistinct("split").cast("long").alias("n_splits"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    leak = F.when(F.col("n_splits") >= 2, 1).otherwise(0)
    leak_docs = F.when(
        F.col("n_splits") >= 2, F.col("n_docs")
    ).otherwise(0)
    return grp.agg(
        F.count(F.lit(1)).cast("long").alias("n_content_groups"),
        F.sum(leak).cast("long").alias("n_leaking_groups"),
        F.sum(leak_docs).cast("long").alias("n_leaking_docs"),
    )


# ---------------------------------------------------------------------------
# dedup threshold sensitivity (r11 wave 3)
# ---------------------------------------------------------------------------

DEDUP_THRESHOLD_SWEEP_PCT = (50, 60, 70, 80, 90)


def _capped_pair_frame(spark: SparkSession, sf_dir: str):
    """(documents, persisted shingle frame, pair frame) — the df-capped
    inverted-index pair frame ``ngram_jaccard_dedup`` defines, WITHOUT a
    threshold: (doc_a, doc_b, n_common, n_union) for every intersecting
    pair.  Shared by ``dedup_threshold_sensitivity`` (threshold sweep)
    and ``pair_similarity_histogram`` (full distribution) — factored
    r12, byte-identical plan to the r11 inline form.  Callers must
    materialize through and then unpersist the returned shingle
    frame."""
    d = load_table(spark, sf_dir, "documents")
    # shingle input drops NULL text on BOTH engines (the ""-shingle
    # clique, null-catalog audit r18 — see ngram_jaccard_dedup); the
    # returned d stays UNFILTERED (consumers' n_docs denominators
    # count the whole table, matching their oracles' bare COUNT(*))
    dr = d.where(F.col("text").isNotNull()).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    sh_all = dr.select("doc_id", F.explode_outer(_shingles()).alias("s"))
    sh_all = sh_all.persist()
    hot = (
        sh_all.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
    )
    sh = sh_all.join(hot, "s", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    pairs = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("long").alias("n_common"),
            (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
            .cast("long")
            .alias("n_union"),
            # r14: the smaller side's size, for containment metrics —
            # column-pruned away by the Jaccard-only consumers
            F.least(F.col("sa.sz"), F.col("sb.sz"))
            .cast("long")
            .alias("n_min"),
        )
    )
    return d, sh_all, pairs


@register(
    "dedup_threshold_sensitivity",
    oracle=f"""
    WITH sh_all AS (
        SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id,
                     unnest(list_distinct(list_transform(
                         range(1, greatest(len(string_split(text,' ')) - {SHINGLE_K - 1}, 1) + 1),
                         i -> array_to_string(string_split(text,' ')[i:i+{SHINGLE_K - 1}], ' ')
                     ))) AS s
              FROM documents WHERE text IS NOT NULL)
    ),
    kept AS (SELECT s FROM sh_all GROUP BY s
             HAVING COUNT(*) <= {SHINGLE_DF_CAP}),
    sh AS (SELECT sh_all.doc_id, sh_all.s FROM sh_all JOIN kept USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_common AS BIGINT) AS n_common,
               CAST(sa.sz + sb.sz - i.n_common AS BIGINT) AS n_union
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
    ),
    t AS (
        SELECT unnest([{", ".join(str(p) for p in DEDUP_THRESHOLD_SWEEP_PCT)}])
                   AS threshold_pct
    ),
    hits AS (
        SELECT t.threshold_pct,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT p.doc_b) AS BIGINT) AS n_docs_flagged
        FROM pairs p CROSS JOIN t
        WHERE p.n_common * 100 >= CAST(t.threshold_pct AS BIGINT) * p.n_union
        GROUP BY t.threshold_pct
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT CAST(t.threshold_pct AS BIGINT) AS threshold_pct,
           COALESCE(h.n_pairs, 0)          AS n_pairs,
           COALESCE(h.n_docs_flagged, 0)   AS n_docs_flagged,
           CAST(COALESCE(h.n_docs_flagged, 0) AS DOUBLE)
               / NULLIF(nd.n_docs, 0) AS flagged_share
    FROM t
    LEFT JOIN hits h ON h.threshold_pct = t.threshold_pct
    CROSS JOIN nd
    ORDER BY threshold_pct
    """,
)
def dedup_threshold_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Is the 0.6-Jaccard near-dup cutoff a knife-edge?  Pair and
    flagged-doc counts under a 50/60/70/80/90% threshold sweep — the
    dedup-aggressiveness dial for exact n-gram Jaccard, the companion
    of ``prefix_dedup_sensitivity`` (prefix lengths) and
    ``sessionize_gap_sensitivity`` (session gaps): if flagged docs
    double between 60 and 50, the corpus has a near-dup mass sitting
    just under the production cutoff.

    Shape: the df-capped shingle self-join (the SAME inverted-index
    pair frame ``ngram_jaccard_dedup`` pays, cited there) is computed
    ONCE without a threshold; each pair then meets the |sweep|-row
    literal (5-row broadcast) — the sweep costs one pair pass, not
    five dedup runs.  Missing thresholds are restored by a LEFT join
    from the literal frame so all 5 rows always emit.  Parity: the
    threshold test is PURE BIGINT (100·n_common ≥ pct·n_union — never
    a double Jaccard compare, the r9 bucket-key rule); flagged docs
    count DISTINCT doc_b (the non-keeper side under the min-doc_id
    keeper convention); the share an unrounded exact-integer ratio."""
    d, sh_all, pairs = _capped_pair_frame(spark, sf_dir)
    t = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(p) for p in DEDUP_THRESHOLD_SWEEP_PCT])
        ).alias("threshold_pct")
    )
    hits = (
        pairs.crossJoin(F.broadcast(t))
        .where(
            F.col("n_common") * 100
            >= F.col("threshold_pct").cast("long") * F.col("n_union")
        )
        .groupBy("threshold_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("doc_b").cast("long").alias("n_docs_flagged"),
        )
    )
    nd = d.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    out = sort_bounded(
        t.join(hits, "threshold_pct", "left")
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("threshold_pct").cast("long").alias("threshold_pct"),
            F.coalesce(F.col("n_pairs"), F.lit(0))
            .cast("long")
            .alias("n_pairs"),
            F.coalesce(F.col("n_docs_flagged"), F.lit(0))
            .cast("long")
            .alias("n_docs_flagged"),
            (
                F.coalesce(F.col("n_docs_flagged"), F.lit(0)).cast("double")
                / F.nullif(F.col("n_docs"), F.lit(0))
            ).alias("flagged_share"),
        ),
        "threshold_pct",
    ).persist()
    out.count()  # materialize through the cached shingle frame
    sh_all.unpersist()
    return out


# ---------------------------------------------------------------------------
# LSH banding sensitivity (r12) — recall/cost curve for (b, r) choices
# ---------------------------------------------------------------------------

# (bands, rows_per_band) pairs partitioning the SAME 64-perm signature;
# the production config (LSH_BANDS=16, 4) sits inside the sweep.  With
# consecutive-slice banding and doubling band counts, candidate sets are
# NESTED: a (b, r) band match means its two (2b, r/2) halves match, so
# candidates(4,16) ⊆ candidates(8,8) ⊆ candidates(16,4) ⊆ candidates(32,2)
# and both recall and cost are deterministically monotone along the sweep
# (pinned in tests/test_new_ops_r12b.py).
LSH_BAND_SWEEP = ((4, 16), (8, 8), (16, 4), (32, 2))


def minhash_band_rows_multi(hashed_docs: DataFrame) -> DataFrame:
    """(n_bands, doc_id, band_id, band_hash) rows for every banding in
    :data:`LSH_BAND_SWEEP`, from ONE signature computation.

    Same permutation family and FNV band combiner as
    :func:`minhash_signatures_arrow` (which stays the single-config
    production path); the signature matrix is computed once per Arrow
    batch and re-sliced per config, so the sweep pays one Python pass —
    Σb extra OUTPUT rows per doc (60 for the default sweep), never extra
    signature work.  Map-side only: rides ``hashed_docs``' partitioning."""

    def kernel(batches):
        import numpy as np
        import pandas as pd

        mult = np.array(MINHASH_A, dtype=np.uint64)
        add = np.array(MINHASH_B, dtype=np.uint64)
        p31 = np.uint64(_P31)
        fnv_prime = np.uint64(1099511628211)
        fnv_basis = np.uint64(14695981039346656037)
        for pdf in batches:
            if pdf.empty:
                continue
            lens = pdf["sh_hashes"].map(len).to_numpy()
            flat = np.concatenate(pdf["sh_hashes"].to_list()).astype(
                np.uint64
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            n = len(lens)
            sig = np.empty((n, MINHASH_PERMS), dtype=np.uint64)
            for p in range(MINHASH_PERMS):
                h = (mult[p] * flat + add[p]) % p31
                sig[:, p] = np.minimum.reduceat(h, starts)
            frames = []
            for n_bands, rpb in LSH_BAND_SWEEP:
                grouped = sig.reshape(n, n_bands, rpb)
                bh = np.full((n, n_bands), fnv_basis, dtype=np.uint64)
                for j in range(rpb):  # uint64 wrap is the FNV mod
                    bh = (bh ^ grouped[:, :, j]) * fnv_prime
                frames.append(
                    pd.DataFrame(
                        {
                            "n_bands": np.full(
                                n * n_bands, n_bands, dtype=np.int32
                            ),
                            "doc_id": np.repeat(
                                pdf["doc_id"].to_numpy(), n_bands
                            ),
                            "band_id": np.tile(
                                np.arange(n_bands, dtype=np.int32), n
                            ),
                            "band_hash": bh.reshape(-1).astype(np.int64),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return hashed_docs.mapInPandas(
        kernel,
        schema="n_bands int, doc_id long, band_id int, band_hash long",
    )


@register("lsh_band_sensitivity")  # rows-only: minhash banding isn't
# ANSI SQL; the monotone-nesting + planted mid-similarity pins live in
# tests/test_new_ops_r12b.py
def lsh_band_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-vs-cost curve for the MinHash LSH banding choice — the
    planning sweep a dedup owner runs before picking (b, r), the r11
    one-frame-sweep pattern (``dedup_threshold_sensitivity``) applied
    to ``minhash_lsh_dedup``'s own knob.  More, narrower bands catch
    lower-Jaccard pairs (recall↑) but emit more candidate pairs for
    the exact-verify tier (cost↑); the curve shows where the
    production (16, 4) sits on that trade.

    Ground truth: exact shingle-hash Jaccard ≥ the production
    threshold over the SAME df-capped inverted-index pair frame
    ``ngram_jaccard_dedup`` defines (hash domain, so shingle strings
    never materialize) — itself oracle-checked via that op.  Recall is
    measured against it; cost is the candidate-pair count the verify
    tier would pay.

    Shape: the expensive frames are computed ONCE — one persisted
    shingle-hash projection feeds (a) one Arrow pass emitting band
    rows for ALL four configs (one signature computation, re-sliced)
    and (b) the truth pair frame; candidates come from ONE bucket
    self-join keyed on (n_bands, band_id, band_hash) covering every
    config (never per-config jobs, never all-pairs).  Empty configs
    are restored by a LEFT join from the config literal.  Parity
    hygiene (though rows-only): the truth threshold is the pure-BIGINT
    100·n_common ≥ pct·n_union compare; recall is an unrounded
    exact-integer ratio, NULLIF-guarded for an empty truth set."""
    d = load_table(spark, sf_dir, "documents")
    docs = hashed_shingle_docs(d).persist()
    bands = minhash_band_rows_multi(docs).persist()
    ba, bb = bands.alias("ba"), bands.alias("bb")
    candidates = (
        ba.join(
            bb,
            (F.col("ba.n_bands") == F.col("bb.n_bands"))
            & (F.col("ba.band_id") == F.col("bb.band_id"))
            & (F.col("ba.band_hash") == F.col("bb.band_hash"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.n_bands").alias("n_bands"),
            F.col("ba.doc_id").alias("doc_a"),
            F.col("bb.doc_id").alias("doc_b"),
        )
        .distinct()
        .persist()
    )
    # truth tier: df-capped shingle-hash inverted index (the
    # ngram_jaccard_dedup frame on the hash domain)
    sh_all = docs.select(
        "doc_id", F.explode_outer("sh_hashes").alias("h")
    ).persist()
    hot = (
        sh_all.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > SHINGLE_DF_CAP)
        .select("h")
    )
    sh = sh_all.join(hot, "h", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    thresh_pct = int(round(JACCARD_THRESHOLD * 100))
    truth = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(
            F.col("n_common") * 100
            >= F.lit(thresh_pct)
            * (F.col("sa.sz") + F.col("sb.sz") - F.col("n_common"))
        )
        .select("doc_a", "doc_b")
        .persist()
    )
    n_true = truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_true_pairs")
    )
    cand_counts = candidates.groupBy("n_bands").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs")
    )
    recalled = (
        candidates.join(truth, ["doc_a", "doc_b"])
        .groupBy("n_bands")
        .agg(F.count(F.lit(1)).cast("long").alias("n_recalled"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(nb).alias("n_bands"),
                        F.lit(rpb).alias("rows_per_band"),
                    )
                    for nb, rpb in LSH_BAND_SWEEP
                ]
            )
        ).alias("c")
    ).select("c.n_bands", "c.rows_per_band")
    out = sort_bounded(
        spine.join(cand_counts, "n_bands", "left")
        .join(recalled, "n_bands", "left")
        .crossJoin(F.broadcast(n_true))
        .select(
            F.col("n_bands").cast("long").alias("n_bands"),
            F.col("rows_per_band").cast("long").alias("rows_per_band"),
            F.coalesce(F.col("n_candidate_pairs"), F.lit(0))
            .cast("long")
            .alias("n_candidate_pairs"),
            F.col("n_true_pairs"),
            F.coalesce(F.col("n_recalled"), F.lit(0))
            .cast("long")
            .alias("n_recalled"),
            (
                F.coalesce(F.col("n_recalled"), F.lit(0)).cast("double")
                / F.nullif(F.col("n_true_pairs"), F.lit(0))
            ).alias("recall"),
        ),
        "n_bands",
    ).persist()
    out.count()  # materialize through the cached intermediates
    docs.unpersist()
    bands.unpersist()
    sh_all.unpersist()
    candidates.unpersist()
    truth.unpersist()
    return out


# ---------------------------------------------------------------------------
# pair similarity histogram (r12) — the full Jaccard distribution
# ---------------------------------------------------------------------------

SIM_HIST_BUCKETS = 10


@register(
    "pair_similarity_histogram",
    oracle=f"""
    WITH sh_all AS (
        SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id,
                     unnest(list_distinct(list_transform(
                         range(1, greatest(len(string_split(text,' ')) - {SHINGLE_K - 1}, 1) + 1),
                         i -> array_to_string(string_split(text,' ')[i:i+{SHINGLE_K - 1}], ' ')
                     ))) AS s
              FROM documents WHERE text IS NOT NULL)
    ),
    kept AS (SELECT s FROM sh_all GROUP BY s
             HAVING COUNT(*) <= {SHINGLE_DF_CAP}),
    sh AS (SELECT sh_all.doc_id, sh_all.s FROM sh_all JOIN kept USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT CAST(i.n_common AS BIGINT) AS n_common,
               CAST(sa.sz + sb.sz - i.n_common AS BIGINT) AS n_union
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
    ),
    h AS (
        SELECT LEAST({SIM_HIST_BUCKETS - 1},
                     (n_common * {SIM_HIST_BUCKETS}) // n_union) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1
    ),
    t AS (SELECT unnest(range({SIM_HIST_BUCKETS})) AS bucket),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM pairs)
    SELECT CAST(t.bucket AS BIGINT)                AS bucket,
           CAST(t.bucket AS DOUBLE) / {SIM_HIST_BUCKETS}       AS j_lo,
           CAST(t.bucket + 1 AS DOUBLE) / {SIM_HIST_BUCKETS}   AS j_hi,
           COALESCE(h.n_pairs, 0)                  AS n_pairs,
           CAST(COALESCE(h.n_pairs, 0) AS DOUBLE)
               / NULLIF(tot.n_total, 0)            AS pair_share
    FROM t
    LEFT JOIN h ON h.bucket = t.bucket
    CROSS JOIN tot
    ORDER BY bucket
    """,
)
def pair_similarity_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The FULL Jaccard distribution of intersecting document pairs —
    where ``dedup_threshold_sensitivity`` answers "what changes at
    these five cutoffs", this shows the whole curve: a mass in the
    0.4-0.6 buckets is near-dup content sitting under the production
    threshold, mass at 0.9+ is the boilerplate/mirror tail the LSH
    banding must catch (``lsh_band_sensitivity``'s recall target).

    Shape: the SAME df-capped inverted-index pair frame (factored
    ``_capped_pair_frame``; candidate volume bounded by the df cap,
    never hot-shingle df²), closed to a 10-bucket histogram.  Parity:
    the bucket key is PURE BIGINT — least(9, (10·n_common) div
    n_union), the r9 bucket-key rule, so a J=0.6 pair lands in bucket
    6 identically on both engines with no double division anywhere;
    bucket bounds and pair_share are exact-integer ratios, unrounded;
    empty buckets restored by a LEFT join from the bucket literal;
    NULLIF guards the zero-pair corpus."""
    _, sh_all, pairs = _capped_pair_frame(spark, sf_dir)
    bucket = F.least(
        F.lit(SIM_HIST_BUCKETS - 1),
        F.expr(f"(n_common * {SIM_HIST_BUCKETS}) div n_union"),
    )
    h = (
        pairs.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    tot = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    t = spark.range(SIM_HIST_BUCKETS).select(
        F.col("id").alias("bucket")
    )
    out = sort_bounded(
        t.join(h, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            (
                F.col("bucket").cast("double") / SIM_HIST_BUCKETS
            ).alias("j_lo"),
            (
                (F.col("bucket") + 1).cast("double") / SIM_HIST_BUCKETS
            ).alias("j_hi"),
            F.coalesce(F.col("n_pairs"), F.lit(0))
            .cast("long")
            .alias("n_pairs"),
            (
                F.coalesce(F.col("n_pairs"), F.lit(0)).cast("double")
                / F.nullif(F.col("n_total"), F.lit(0))
            ).alias("pair_share"),
        ),
        "bucket",
    ).persist()
    out.count()  # materialize through the cached shingle frame
    sh_all.unpersist()
    return out


@register(
    "pair_containment_histogram",
    oracle=f"""
    WITH sh_all AS (
        SELECT DISTINCT doc_id, s
        FROM (SELECT doc_id,
                     unnest(list_distinct(list_transform(
                         range(1, greatest(len(string_split(text,' ')) - {SHINGLE_K - 1}, 1) + 1),
                         i -> array_to_string(string_split(text,' ')[i:i+{SHINGLE_K - 1}], ' ')
                     ))) AS s
              FROM documents WHERE text IS NOT NULL)
    ),
    kept AS (SELECT s FROM sh_all GROUP BY s
             HAVING COUNT(*) <= {SHINGLE_DF_CAP}),
    sh AS (SELECT sh_all.doc_id, sh_all.s FROM sh_all JOIN kept USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT CAST(i.n_common AS BIGINT) AS n_common,
               CAST(sa.sz + sb.sz - i.n_common AS BIGINT) AS n_union,
               CAST(LEAST(sa.sz, sb.sz) AS BIGINT) AS n_min
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
    ),
    h AS (
        SELECT LEAST({SIM_HIST_BUCKETS - 1},
                     (n_common * {SIM_HIST_BUCKETS}) // n_min) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN 2 * n_common < n_union
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_low_jaccard
        FROM pairs GROUP BY 1
    ),
    t AS (SELECT unnest(range({SIM_HIST_BUCKETS})) AS bucket),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM pairs)
    SELECT CAST(t.bucket AS BIGINT)                      AS bucket,
           CAST(t.bucket AS DOUBLE) / {SIM_HIST_BUCKETS}     AS c_lo,
           CAST(t.bucket + 1 AS DOUBLE) / {SIM_HIST_BUCKETS} AS c_hi,
           COALESCE(h.n_pairs, 0)                        AS n_pairs,
           COALESCE(h.n_low_jaccard, 0)                  AS n_low_jaccard,
           CAST(COALESCE(h.n_pairs, 0) AS DOUBLE)
               / NULLIF(tot.n_total, 0)                  AS pair_share
    FROM t
    LEFT JOIN h ON h.bucket = t.bucket
    CROSS JOIN tot
    ORDER BY bucket
    """,
)
def pair_containment_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The CONTAINMENT distribution of intersecting document pairs —
    containment = n_common / min(|A|, |B|), the asymmetric companion
    to ``pair_similarity_histogram``'s Jaccard: a short doc embedded
    verbatim in a long one scores containment ≈ 1 while its Jaccard
    stays low, so symmetric dedup never sees it.  ``n_low_jaccard``
    counts exactly those pairs per bucket (containment-bucketed pairs
    whose Jaccard < ½) — mass in the HIGH-containment/low-Jaccard
    corner is the subset-duplicate class (quote farms, boilerplate
    wrappers, doc-in-doc mirrors) a curation pass must handle
    separately from near-dups.

    Shape: the SAME df-capped inverted-index pair frame
    (``_capped_pair_frame``, now carrying the smaller side's size),
    closed to a 10-bucket histogram.  Parity: bucket key PURE BIGINT —
    least(9, (10·n_common) div n_min) (the r9 rule); the Jaccard<½
    test is the integer compare 2·n_common < n_union (never a double
    ratio); bounds and pair_share exact-integer ratios, unrounded;
    empty buckets restored by a LEFT join from the bucket literal;
    NULLIF guards the zero-pair corpus."""
    _, sh_all, pairs = _capped_pair_frame(spark, sf_dir)
    bucket = F.least(
        F.lit(SIM_HIST_BUCKETS - 1),
        F.expr(f"(n_common * {SIM_HIST_BUCKETS}) div n_min"),
    )
    h = pairs.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when(2 * F.col("n_common") < F.col("n_union"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_low_jaccard"),
    )
    tot = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    t = spark.range(SIM_HIST_BUCKETS).select(F.col("id").alias("bucket"))
    out = sort_bounded(
        t.join(h, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            (F.col("bucket").cast("double") / SIM_HIST_BUCKETS).alias(
                "c_lo"
            ),
            (
                (F.col("bucket") + 1).cast("double") / SIM_HIST_BUCKETS
            ).alias("c_hi"),
            F.coalesce(F.col("n_pairs"), F.lit(0))
            .cast("long")
            .alias("n_pairs"),
            F.coalesce(F.col("n_low_jaccard"), F.lit(0))
            .cast("long")
            .alias("n_low_jaccard"),
            (
                F.coalesce(F.col("n_pairs"), F.lit(0)).cast("double")
                / F.nullif(F.col("n_total"), F.lit(0))
            ).alias("pair_share"),
        ),
        "bucket",
    ).persist()
    out.count()  # materialize through the cached shingle frame
    sh_all.unpersist()
    return out
