"""DataFrame sinks: partitioned / sorted parquet layout control."""

from googlecloudstorage_blueprints_spark.sinks.writers import (
    compact_parquet,
    upsert_parquet,
    write_partitioned,
    write_sorted,
    write_zordered,
)

__all__ = [
    "compact_parquet",
    "upsert_parquet",
    "write_partitioned",
    "write_sorted",
    "write_zordered",
]
