"""DataFrame sinks: partitioned / sorted parquet layout control."""

from googlecloudstorage_blueprints_spark.sinks.writers import (
    write_partitioned,
    write_sorted,
)

__all__ = ["write_partitioned", "write_sorted"]
