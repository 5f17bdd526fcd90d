"""Source readers: fixture catalog + generic file readers."""

from googlecloudstorage_blueprints_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
)
from googlecloudstorage_blueprints_spark.sources.formats import (
    read_csv,
    read_jsonl,
    read_text,
    write_csv,
    write_jsonl,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_csv",
    "read_jsonl",
    "read_text",
    "write_csv",
    "write_jsonl",
]
