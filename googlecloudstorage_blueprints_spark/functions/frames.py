"""DataFrame-level helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

__all__ = ["sort_bounded", "local_rows_frame"]


def local_rows_frame(
    spark: SparkSession, rows: list, schema: str
) -> DataFrame:
    """Small driver-side literal/result frame as a JVM LocalRelation.

    ``spark.createDataFrame(python_list)`` parallelizes the rows into a
    PYTHON RDD spread over ``defaultParallelism`` partitions (plan:
    ``Scan ExistingRDD``): every materialization of the frame pays one
    Python-worker handshake per partition (~150 ms each at local[32]),
    and under ``coalesce(1)`` (``sort_bounded``) those handshakes
    serialize into ONE task — measured ~5 s per run for a 4-row cuts
    frame (r18, user_event_pareto).  Converting through pandas + Arrow
    instead lands the rows in a LocalRelation (plan:
    ``LocalTableScan`` — zero tasks and zero Python at evaluation,
    ~0.1 s), and the conversion happens ONCE at construction.

    Values are identical either way: int64/float64/strings/lists pass
    through Arrow bit-exact, ``None`` stays NULL.  Only for small
    driver-resident row sets (parameter cuts, probe batches, solver
    outputs) — data-sized frames must never route through the driver.
    Falls back to the classic path on any conversion failure (same
    values, just slower)."""
    try:
        import pandas as pd
        from pyspark.sql.types import _parse_datatype_string

        names = [f.name for f in _parse_datatype_string(schema).fields]
        pdf = pd.DataFrame(
            [tuple(r) for r in rows], columns=names, dtype=object
        )
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(rows, schema=schema)


def sort_bounded(df: DataFrame, *cols: str | Column) -> DataFrame:
    """Total-order a BOUNDED result without a range-exchange sampling job.

    ``df.orderBy(...)`` plans a range shuffle whose partitioner is built by
    an extra sampling job over the child — two scheduling round-trips to
    sort what is often a handful of grouped rows.  When the row count is
    bounded by a small enum/bucket domain (report groups, nations, hourly
    buckets — NOT anything data-sized), coalescing to one partition and
    sorting within it yields the same totally-ordered output with zero
    extra jobs, at any scale.

    Use ONLY on provably bounded frames: ``coalesce(1)`` collapses the
    final stage to a single task, which is exactly right for a result that
    fits in one glance and exactly wrong for anything that grows with the
    data.
    """
    return df.coalesce(1).sortWithinPartitions(*cols)
