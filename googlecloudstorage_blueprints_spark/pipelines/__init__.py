"""Composed end-to-end pipelines built from the operator library."""

from googlecloudstorage_blueprints_spark.pipelines.curate import (
    curate_corpus,
)

__all__ = ["curate_corpus"]
