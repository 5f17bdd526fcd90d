"""DataFrame-level helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

__all__ = ["sort_bounded"]


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
