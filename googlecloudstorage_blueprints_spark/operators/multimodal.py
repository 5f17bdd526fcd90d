"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store payloads as `binary` columns
(or binaryFile-sourced paths) with typed metadata columns alongside;
decode / feature-extract in Arrow-batched `mapInPandas` kernels so bytes
move in columnar batches, never row-at-a-time.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic STUB (documented NotImplementedError path +
byte-level fake features) — the Spark-side plumbing (schema, batching,
partitioning, UDF signature) is real and tested, per the build brief.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

HAVE_PIL = False
try:  # image codecs are absent in this container; keep the real path gated
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def _decode_image_real(payload: bytes):
    """Real decode path (requires PIL) — not available in this container."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires pillow; this environment stubs it — "
            "see _fake_features for the deterministic stand-in"
        )
    import io

    import PIL.Image

    return PIL.Image.open(io.BytesIO(payload))


def _fake_features(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for decode+feature-extract: (pseudo-width,
    pseudo-height, sha1) derived from the bytes themselves."""
    digest = hashlib.sha1(payload).hexdigest()
    return (
        16 + payload[0] % 64 if payload else 0,
        16 + (payload[-1] % 64 if payload else 0),
        digest,
    )


@register("multimodal_features")  # rows-only: binary plumbing, not ANSI SQL
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction through mapInPandas.

    Builds a binary payload column from document text (the fixture corpus
    has no real media; payload bytes stand in for an encoded image), then
    runs an Arrow-batched kernel producing typed features.  The kernel
    shape — Iterator[pd.DataFrame] → Iterator[pd.DataFrame], fixed output
    schema, no pandas index games — is exactly what a real decoder uses."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("payload_bytes"),
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": pdf["payload_bytes"],
                    "pseudo_width": [f[0] for f in feats],
                    "pseudo_height": [f[1] for f in feats],
                    "content_sha1": [f[2] for f in feats],
                }
            )

    return payloads.mapInPandas(
        kernel,
        schema=(
            "doc_id long, payload_bytes long, pseudo_width long, "
            "pseudo_height long, content_sha1 string"
        ),
    )


@register(
    "multimodal_metadata_agg",
    oracle="""
    SELECT source,
           COUNT(*)                              AS n_assets,
           CAST(SUM(length(text)) AS BIGINT)     AS total_payload_bytes,
           CAST(MAX(length(text)) AS BIGINT)     AS max_payload_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the asset table — the control-plane
    query pattern for media datasets (payload sizes per source shard);
    payload bytes themselves are never shuffled."""
    d = load_table(spark, sf_dir, "documents")
    size = F.length(F.encode("text", "utf-8")).cast("long")
    return (
        d.select("source", size.alias("payload_bytes"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("payload_bytes").alias("total_payload_bytes"),
            F.max("payload_bytes").alias("max_payload_bytes"),
        )
        .orderBy("source")
    )
