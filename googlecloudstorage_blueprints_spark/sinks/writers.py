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
