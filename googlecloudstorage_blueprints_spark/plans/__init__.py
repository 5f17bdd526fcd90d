"""Plan-inspection helpers (scale hygiene checks)."""

from googlecloudstorage_blueprints_spark.plans.inspect import (
    codegen_span_count,
    explain_str,
    has_broadcast_join,
    op_count,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

__all__ = [
    "codegen_span_count",
    "explain_str",
    "op_count",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "shuffle_count",
]
