"""File-management verbs (the reference's actual surface, SURVEY.md §2.A).

Control-plane operations over the Hadoop FileSystem API so `file:/`,
`hdfs:/` and `gs://` (via the GCS connector) share one code path; data
never moves through executors for move/remove (server-side metadata ops,
mirroring the reference's `copy_blob` + delete design, move_file.py:150-153).
"""

from googlecloudstorage_blueprints_spark.fileops.core import (
    FsClient,
    download_files,
    move_files,
    remove_files,
    upload_files,
)

__all__ = [
    "FsClient",
    "download_files",
    "upload_files",
    "move_files",
    "remove_files",
]
