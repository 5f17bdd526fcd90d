"""Composed end-to-end pipelines built from the operator library."""

from googlecloudstorage_blueprints_spark.pipelines.curate import (
    curate_corpus,
)
from googlecloudstorage_blueprints_spark.pipelines.report import (
    corpus_report,
)
from googlecloudstorage_blueprints_spark.pipelines.ann_index import (
    append_ivf_index,
    append_ivfpq_index,
    build_ivf_index,
    build_ivfpq_index,
    search_ivf_index,
    search_ivfpq_index,
)
from googlecloudstorage_blueprints_spark.pipelines.sessions import (
    build_session_mart,
)
from googlecloudstorage_blueprints_spark.pipelines.growth import (
    GrowthMartReport,
    build_growth_mart,
)

__all__ = [
    "curate_corpus",
    "corpus_report",
    "build_session_mart",
    "build_growth_mart",
    "GrowthMartReport",
    "build_ivf_index",
    "search_ivf_index",
    "build_ivfpq_index",
    "search_ivfpq_index",
    "append_ivf_index",
    "append_ivfpq_index",
]
