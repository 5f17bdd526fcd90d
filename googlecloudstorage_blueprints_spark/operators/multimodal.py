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
    # fixture parquet is one unsplittable row group — spread the Python
    # kernel across workers instead of one serial task
    n_parts = max(8, spark.sparkContext.defaultParallelism // 4)
    payloads = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("payload_bytes"),
    ).repartition(n_parts, "doc_id")

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


THUMB_W, THUMB_H = 32, 32
FRAMES_PER_ASSET = 4


@register("multimodal_resize")  # rows-only: binary plumbing, not ANSI SQL
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize kernel plumbing: binary in → fixed-size binary out (1:1).

    The stub "resize" deterministically resamples payload bytes to a
    THUMB_W×THUMB_H byte grid (real path: PIL ``Image.resize`` behind the
    same signature — gated on HAVE_PIL like ``_decode_image_real``).  What
    is real and load-bearing: the output column is ``binary`` with a fixed
    per-row size, so downstream Arrow batches have predictable memory — the
    property that lets you size ``maxRecordsPerBatch`` for 100 TB media."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    size = THUMB_W * THUMB_H

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                b = bytes(p) or b"\x00"
                # nearest-neighbor byte resample — deterministic stand-in
                thumbs.append(
                    bytes(b[(i * len(b)) // size] for i in range(size))
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_w": THUMB_W,
                    "thumb_h": THUMB_H,
                }
            )

    return payloads.mapInPandas(
        kernel, schema="doc_id long, thumb binary, thumb_w int, thumb_h int"
    )


@register("multimodal_frame_sample")  # rows-only: binary plumbing
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling kernel plumbing: one asset row → N frame rows.

    Emits FRAMES_PER_ASSET evenly-spaced byte slices per payload (stand-in
    for video keyframe extraction; real path decodes with pyav/ffmpeg
    behind the same signature).  The load-bearing part is the 1→N output
    shape: mapInPandas output row count is independent of input — the
    fan-out pattern for frames/clips — and each frame carries its own
    (frame_idx, offset) metadata so downstream ops treat frames as
    first-class rows, partitionable independently of their source asset."""
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "byte_offset": [],
                "frame": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p) or b"\x00"
                step = max(len(b) // FRAMES_PER_ASSET, 1)
                for i in range(FRAMES_PER_ASSET):
                    off = min(i * step, len(b) - 1)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["byte_offset"].append(off)
                    out["frame"].append(b[off : off + step])
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        kernel,
        schema="doc_id long, frame_idx int, byte_offset long, frame binary",
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
