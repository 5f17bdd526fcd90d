"""Reusable column-level functions (JVM-expression builders)."""

from googlecloudstorage_blueprints_spark.functions.columns import (
    cosine_similarity,
    file_basename,
    enumerate_name_col,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "file_basename",
    "enumerate_name_col",
    "word_shingles",
]
