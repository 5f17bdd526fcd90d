"""File-manifest operators — the reference's listing/selection surface
(SURVEY.md §2.A.1/§2.A.3) re-expressed as queries.

``file_manifest`` is the reference's `find_google_cloud_storage_file_names`
+ regex matching (``download_file.py:147-164``) as a DataFrame: list a
directory, project (path, name, size, mtime), filter with `rlike` —
`rlike` is `re.search`-style substring matching, the exact semantics of the
reference's ``re.search(pattern, name)`` (``download_file.py:155-164``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.operators import register


@register("file_manifest")  # rows-only: paths/sizes are environment-bound
def file_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest of the fixture directory via the binaryFile source
    (path/length/modificationTime schema), with a regex name selection.

    Scale: binaryFile listing is distributed and lazy about content —
    with `pathGlobFilter` + partitioned layouts the listing prunes
    server-side; content bytes are never read for a metadata-only query
    because the projection drops `content` before the scan."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return (
        df.select(
            name.alias("file_name"),
            F.col("length").alias("size_bytes"),
        )
        # regex selection, re.search-parity: substring match, not fullmatch
        .where(name.rlike(r"^[a-z]+\.parquet"))
        .orderBy("file_name")
    )


@register(
    "file_manifest_stats",
    oracle="""
    SELECT COUNT(*) AS n_tables FROM (
        SELECT 'region' UNION ALL SELECT 'nation' UNION ALL
        SELECT 'customer' UNION ALL SELECT 'supplier' UNION ALL
        SELECT 'part' UNION ALL SELECT 'orders' UNION ALL
        SELECT 'lineitem' UNION ALL SELECT 'events' UNION ALL
        SELECT 'documents' UNION ALL SELECT 'embeddings'
    )
    """,
)
def file_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-count over the manifest — a deterministic scalar the oracle
    can state independently of the environment (the fixture contract pins
    exactly ten tables per sf directory)."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return df.select(
        F.count(F.lit(1)).alias("n_tables")
    )
