"""Layout-aware DataFrame writers.

The reference's only sink is an opaque byte upload
(``upload_file.py:177-189``); the engine's structured sinks add the layout
decisions that dominate read cost at 100 TB:

- **Partitioned writes** prune at the directory level: a reader's filter on
  the partition column skips whole directories (``PartitionFilters`` in the
  scan plan) — the engine-side analog of the reference's prefix-scoped
  listing (``download_file.py:248-249``).
- **Small-file control**: naive ``partitionBy`` writes
  |tasks| × |partition values| files.  Repartitioning on the partition
  columns first means each output directory is written by as few tasks as
  hold its data — one shuffle traded for a file count that doesn't melt
  the namenode/listing path.
- **Sorted writes** give parquet min/max row-group statistics real
  selectivity, so point predicates on the sort key skip row groups
  (the poor man's z-order; enough for single-key access patterns).

All writers take any Hadoop-FS URI (``file:/``, ``gs://`` via the GCS
connector) — same code path either way.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Hive-style partitioned parquet with bounded file counts.

    ``repartition(partition_by)`` co-locates each partition value's rows
    before the write; ``maxRecordsPerFile`` re-splits only genuinely large
    partitions.  Skewed partition values are the known failure mode — one
    giant directory written by one task — and AQE rebalances that shuffle
    when ``spark.sql.adaptive.enabled`` is on (engine default)."""
    (
        df.repartition(*partition_by)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Range-partitioned + within-file sorted parquet: global range
    partitioning puts disjoint key ranges in each file, the within-partition
    sort makes parquet row-group min/max stats tight — a point/range filter
    on the sort key then skips files AND row groups."""
    out = df.repartitionByRange(*sort_by) if n_files is None else (
        df.repartitionByRange(n_files, *sort_by)
    )
    out.sortWithinPartitions(*sort_by).write.mode(mode).parquet(path)


Z_BITS = 6  # 64 quantile buckets per dimension → 12-bit Morton codes


def _morton2(x: str, y: str, bits: int = Z_BITS):
    """Interleave the low ``bits`` of two integer columns (x even lanes,
    y odd) — a literal shift/or expression, fully codegen'd."""
    import pyspark.sql.functions as F

    lanes = []
    for i in range(bits):
        lanes.append(f"(shiftleft(({x} >> {i}) & 1, {2 * i}))")
        lanes.append(f"(shiftleft(({y} >> {i}) & 1, {2 * i + 1}))")
    return F.expr(" | ".join(lanes))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered parquet over exactly two columns.

    ``write_sorted`` skips files for ONE key; a second predicate column
    spans the full range in every file.  Z-ordering quantile-buckets both
    columns (equi-depth, from driver-side ``approxQuantile`` — sampled,
    O(1) rows), interleaves the bucket bits into a Morton code, and
    range-partitions + sorts by it: every file then covers a small
    sub-rectangle of the (col1, col2) space, so min/max stats prune files
    for predicates on EITHER column.  This is the same layout contract as
    Delta's OPTIMIZE ZORDER, built from stock Spark primitives.  The
    bucketing CASE chain and Morton interleave are literal integer
    expressions — whole-stage codegen, no UDFs."""
    import pyspark.sql.functions as F

    assert len(cols) == 2, "z-order here is the 2-column form"
    probs = [i / (1 << Z_BITS) for i in range(1, 1 << Z_BITS)]
    work = df
    bucket_cols = []
    for c in cols:
        numeric = f"CAST({c} AS DOUBLE)"
        bounds = sorted(
            set(
                df.selectExpr(f"{numeric} AS v").approxQuantile(
                    "v", probs, 0.001
                )
            )
        )
        # all-NULL or empty column → approxQuantile returns no bounds;
        # degrade to a single bucket instead of an unparseable expression
        cmp_sum = " + ".join(
            f"(CASE WHEN {numeric} > {b!r} THEN 1 ELSE 0 END)"
            for b in bounds
        ) or "0"
        bc = f"__zb_{c}"
        work = work.withColumn(bc, F.expr(f"CAST({cmp_sum} AS INT)"))
        bucket_cols.append(bc)
    work = work.withColumn(
        "__z", _morton2(bucket_cols[0], bucket_cols[1])
    )
    (
        work.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *bucket_cols)
        .write.mode(mode)
        .parquet(path)
    )


def upsert_parquet(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """Merge-by-key into a parquet directory: rows in ``updates`` replace
    target rows with the same key; new keys append.

    Plain parquet has no transactional MERGE (that's Delta/Iceberg
    territory); this is the rewrite formulation: keep target rows whose
    key is absent from updates (null-safe anti join — a NULL key in
    updates replaces NULL-key target rows, matching ``eqNullSafe``
    semantics), union the updates, then swap directories: the old target
    is renamed aside BEFORE the new data is renamed in, and only deleted
    once the swap succeeded.  Hadoop FS rename returns False instead of
    raising; every return is checked.

    NOT transactional — two windows are reader/crash-visible:

    - between rename(target → __upsert_old) and rename(tmp → target),
      concurrent readers of ``target`` see NO table (seconds-scale: two
      metadata renames, no data copy);
    - a crash inside that window leaves the complete old table at
      ``<target>__upsert_old`` only.  Recovery is automatic: the next
      ``upsert_parquet`` (or any caller probing the same layout) finds
      ``__upsert_old`` with no ``target`` and renames it back before
      proceeding.  A leftover ``__upsert_old`` alongside an intact
      ``target`` means the crash happened after install; it is stale and
      deleted.

    Serialize writers externally; for concurrent readers+writers you want
    a table format with snapshot isolation (Delta/Iceberg).  At 100 TB,
    pair with partitioned layout and rewrite ONLY the partitions updates
    touch — the same anti-join per partition."""
    sc0 = spark.sparkContext
    Path0 = sc0._jvm.org.apache.hadoop.fs.Path
    dst0 = Path0(target)
    fs0 = dst0.getFileSystem(sc0._jsc.hadoopConfiguration())
    old0 = Path0(target + "__upsert_old")
    if fs0.exists(old0) and not fs0.exists(dst0):
        # previous upsert crashed mid-swap: the old table is the only
        # complete copy — reinstall it before reading
        if not fs0.rename(old0, dst0):
            raise RuntimeError(
                f"upsert: crash recovery failed — could not restore "
                f"{target}__upsert_old to {target}"
            )
    existing = spark.read.parquet(target)
    cond = None
    for k in keys:
        c = existing[k].eqNullSafe(updates[k])
        cond = c if cond is None else (cond & c)
    merged = existing.join(
        updates.select(*keys), cond, "left_anti"
    ).unionByName(updates)

    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    tmp = Path(target + "__upsert_tmp")
    old = Path(target + "__upsert_old")
    dst = Path(target)
    fs = dst.getFileSystem(conf)
    merged.write.mode("overwrite").parquet(target + "__upsert_tmp")
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(dst, old):
        raise RuntimeError(f"upsert: could not move {target} aside")
    if not fs.rename(tmp, dst):
        fs.rename(old, dst)  # restore; table unchanged
        raise RuntimeError(f"upsert: could not install new data at {target}")
    fs.delete(old, True)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Rewrite a small-file parquet directory into ~target-sized files;
    returns the output file count.

    Small files are the silent killer of 100 TB reads: every file is a
    listing call, a footer fetch, and (often) a task.  Sizing comes from
    the ACTUAL on-disk bytes via the Hadoop FileSystem (same API the
    file-ops verbs use — works for ``file:/`` and ``gs://`` alike), not
    row counts, so compression ratio is accounted for.  The rewrite is one
    round-robin repartition — no key assumptions; use ``write_sorted`` when
    a sort key should also be restored."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(conf)
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dst)
    return n_files


def table_diff(
    spark: SparkSession,
    old_path: str,
    new_path: str,
    keys: list[str],
    compare: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two parquet snapshots by key: the audit view
    behind every upsert/compaction/backfill — what did the rewrite
    actually change?  Returns one row per differing key with
    ``change_type`` ∈ {inserted, deleted, updated} plus the new-side
    column values (NULL for deleted keys).

    Formulation: full outer join on the (null-safe) keys, then a
    comparison expression over ``compare`` columns (default: every
    non-key column both sides share).  Unchanged keys are filtered OUT
    before anything materializes, so the result is |changes|-sized, not
    |table|-sized — at 100 TB the outer join is the one shuffle per
    side, co-located if both snapshots are bucketed by the key, and
    partition-pruned when the caller diffs only rewritten partitions.
    Value comparison is null-safe equality (``<=>``): NULL → NULL is
    unchanged, NULL → value is a change — the SQL trap a naive ``=``
    diff silently drops.

    Precondition: ``keys`` must uniquely identify rows in BOTH
    snapshots.  A duplicated key turns the outer join into a per-key
    cross product — every old-row × new-row pairing is classified
    independently, inflating and misclassifying the diff.  Deduplicate
    or aggregate to key grain first (``upsert_parquet`` asserts this;
    here it is the caller's contract because asserting uniqueness costs
    a full aggregate over both snapshots per diff)."""
    import pyspark.sql.functions as F

    old = spark.read.parquet(old_path)
    new = spark.read.parquet(new_path)
    if compare is None:
        compare = [
            c
            for c in new.columns
            if c not in keys and c in set(old.columns)
        ]
    # presence markers must survive legitimately-NULL keys: key columns
    # can't distinguish "row absent" from "key is NULL", so each side
    # carries a literal that is NULL exactly when the side didn't match
    o = old.withColumn("__present", F.lit(1)).alias("o")
    n = new.withColumn("__present", F.lit(1)).alias("n")
    cond = None
    for k in keys:
        clause = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = clause if cond is None else (cond & clause)
    joined = o.join(n, cond, "full_outer")
    old_mark = F.col("o.__present").isNotNull()
    new_mark = F.col("n.__present").isNotNull()
    changed_vals = F.lit(False)
    for c in compare:
        changed_vals = changed_vals | ~F.col(f"o.{c}").eqNullSafe(
            F.col(f"n.{c}")
        )
    change_type = (
        F.when(~old_mark, F.lit("inserted"))
        .when(~new_mark, F.lit("deleted"))
        .when(changed_vals, F.lit("updated"))
    )
    out_cols = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
        for k in keys
    ]
    out_cols.append(change_type.alias("change_type"))
    out_cols.extend(F.col(f"n.{c}").alias(c) for c in compare)
    return (
        joined.select(*out_cols)
        .where(F.col("change_type").isNotNull())
    )


def apply_scd2_batch(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
) -> None:
    """Apply a CDC batch to a stored SCD2 parquet table — the nightly
    warehouse-maintenance MERGE, without rebuilding history from the
    raw changelog (which at 100 TB no longer exists in one place).

    ``target`` holds intervals (user_id, event_type, valid_from_us,
    valid_to_us — NULL = open); ``updates`` holds new changelog rows
    (user_id, event_type, ts_us, event_id).  Keys untouched by the
    batch are copied through WITHOUT recomputation (anti join on the
    update keys — at scale this is the whole point: the rewrite cost
    tracks the batch's key set, not table history).  Affected keys are
    rebuilt by unioning their EXISTING change points (an SCD2 table is
    already exactly its key's change history — valid_from_us is the
    change timestamp) with the update rows and re-running the shared
    :func:`~googlecloudstorage_blueprints_spark.operators.warehouse.
    scd2_from_changelog` reconstruction; a synthetic event_id of -1
    orders existing change points before any real update at the same
    microsecond.  Same-type update rows are absorbed by the lag-compare
    (no spurious interval splits), so replaying an already-applied
    batch is a no-op — the idempotence the test pins.

    Install uses the same tmp/old rename swap (and crash-recovery
    probe) as ``upsert_parquet``; the same non-transactional windows
    apply."""
    import pyspark.sql.functions as F

    from googlecloudstorage_blueprints_spark.operators.warehouse import (
        scd2_from_changelog,
    )

    sc0 = spark.sparkContext
    Path0 = sc0._jvm.org.apache.hadoop.fs.Path
    dst0 = Path0(target)
    fs0 = dst0.getFileSystem(sc0._jsc.hadoopConfiguration())
    old0 = Path0(target + "__upsert_old")
    if fs0.exists(old0) and not fs0.exists(dst0):
        if not fs0.rename(old0, dst0):
            raise RuntimeError(
                f"apply_scd2_batch: crash recovery failed — could not "
                f"restore {target}__upsert_old to {target}"
            )

    existing = spark.read.parquet(target)
    affected = updates.select("user_id").distinct()
    keep = existing.join(affected, "user_id", "left_anti")
    existing_changes = existing.join(affected, "user_id", "left_semi").select(
        "user_id",
        "event_type",
        F.col("valid_from_us").alias("ts_us"),
        F.lit(-1).cast("long").alias("event_id"),
    )
    merged_changelog = existing_changes.unionByName(
        updates.select("user_id", "event_type", "ts_us", "event_id")
    )
    rebuilt = scd2_from_changelog(merged_changelog)
    result = keep.unionByName(rebuilt)

    jvm = sc0._jvm
    conf = sc0._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    tmp = Path(target + "__upsert_tmp")
    old = Path(target + "__upsert_old")
    dst = Path(target)
    fs = dst.getFileSystem(conf)
    result.write.mode("overwrite").parquet(target + "__upsert_tmp")
    if fs.exists(old):
        fs.delete(old, True)
    if not fs.rename(dst, old):
        raise RuntimeError(
            f"apply_scd2_batch: could not move {target} aside"
        )
    if not fs.rename(tmp, dst):
        fs.rename(old, dst)
        raise RuntimeError(
            f"apply_scd2_batch: could not install new data at {target}"
        )
    fs.delete(old, True)
