"""googlecloudstorage_blueprints_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the capabilities of
shipyardapp/googlecloudstorage-blueprints (cloud-storage file-pipeline verbs:
upload / download / move / remove with exact & regex selection — see
reference ``download_file.py``, ``upload_file.py``, ``move_file.py``,
``remove_file.py``), extended with the DataFrame analytics surface a
large-scale (100 TB) LLM-data pipeline needs: relational operators
(scan/filter/join/aggregate/window/set-ops), semi-structured (JSON, arrays),
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search, text analysis, event sessionization, and
Structured Streaming twins.

Design: DataFrame/SQL first — Catalyst plans everything; no custom
optimizer. File-management verbs are control-plane operations on the Hadoop
FileSystem API so `file:/`, `hdfs:/` and `gs://` share one code path.
"""

from googlecloudstorage_blueprints_spark.errors import (
    EXIT_CODE_INVALID_CREDENTIALS,
    EXIT_CODE_INVALID_BUCKET,
    EXIT_CODE_FILE_NOT_FOUND,
    BlueprintError,
    InvalidCredentialsError,
    InvalidBucketError,
    FileNotFoundBlueprintError,
)
from googlecloudstorage_blueprints_spark.session import get_spark
from googlecloudstorage_blueprints_spark.sources.catalog import (
    TABLES,
    load_table,
    register_views,
)

__all__ = [
    "EXIT_CODE_INVALID_CREDENTIALS",
    "EXIT_CODE_INVALID_BUCKET",
    "EXIT_CODE_FILE_NOT_FOUND",
    "BlueprintError",
    "InvalidCredentialsError",
    "InvalidBucketError",
    "FileNotFoundBlueprintError",
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
]

__version__ = "0.1.0"
