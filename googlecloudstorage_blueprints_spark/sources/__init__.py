"""Source readers: fixture catalog + generic file readers."""

from googlecloudstorage_blueprints_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
)

__all__ = ["TABLES", "load_table", "register_views"]
