"""Plan-inspection helpers (scale hygiene checks)."""

from googlecloudstorage_blueprints_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "shuffle_count",
]
