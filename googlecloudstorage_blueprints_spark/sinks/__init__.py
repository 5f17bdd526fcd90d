"""DataFrame sinks: partitioned / sorted parquet layout control."""

from googlecloudstorage_blueprints_spark.sinks.writers import (
    apply_scd2_batch,
    compact_parquet,
    table_diff,
    upsert_parquet,
    write_partitioned,
    write_sorted,
    write_zordered,
)

__all__ = [
    "apply_scd2_batch",
    "compact_parquet",
    "table_diff",
    "upsert_parquet",
    "write_partitioned",
    "write_sorted",
    "write_zordered",
]
