"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store payloads as `binary` columns
(or binaryFile-sourced paths) with typed metadata columns alongside;
decode / feature-extract in Arrow-batched `mapInPandas` kernels so bytes
move in columnar batches, never row-at-a-time.

Decode tiers in this module:

- ``multimodal_decode`` / ``multimodal_resize`` run a REAL image decode:
  payloads are valid binary PPM (P6) images — ASCII header + raw RGB24 —
  synthesized JVM-side, and the kernels parse the header and pixel buffer
  with numpy (no codec library involved; PPM is self-describing).  Pixel
  statistics and the nearest-neighbor thumbnail are exact image math.
- Compressed formats (JPEG/PNG/video) need codecs absent from this
  container: ``_decode_image_real`` stays gated on PIL with a documented
  NotImplementedError, and ``multimodal_features``/``frame_sample`` use
  byte-level stand-ins where a codec would slot in.  The Spark-side
  plumbing (schema, batching, partitioning, 1:1 and 1→N kernel shapes)
  is identical either way.
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
    # NULL doc_id rows are unkeyable assets (dropped — null-catalog
    # audit, r18); NULL text gets the same single-space stand-in as
    # _ppm_payloads so the kernel never sees a None payload
    src = F.coalesce(F.col("text"), F.lit(" "))
    payloads = d.where(F.col("doc_id").isNotNull()).select(
        "doc_id",
        F.encode(src, "utf-8").alias("payload"),
        F.length(F.encode(src, "utf-8")).cast("long").alias("payload_bytes"),
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


def _ppm_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a valid PPM (P6) image per document, JVM-side.

    Width/height vary per doc_id; the RGB24 pixel buffer is the document
    text tiled to w*h*3 bytes (ASCII corpus → 1 byte per char, so string
    repeat+substr IS byte math).  The result is a REAL image file in a
    self-describing uncompressed format — what a production pipeline
    stores after transcoding, minus the codec.

    NULL or empty text falls back to a single-space pixel source so every
    document still yields a full w*h*3 buffer (round-3 verdict: an empty
    buffer reached ``reshape(h, w, 3)`` and crashed all three kernels).
    NULL doc_id rows are dropped — the dims derive from doc_id, so a
    NULL id nulls the whole payload and crashes every downstream kernel
    (null-catalog audit, r18); an unkeyable asset has no pipeline row."""
    d = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id").isNotNull()
    )
    w = (8 + F.col("doc_id") % 24).cast("int")
    h = (8 + (F.col("doc_id") * 7) % 24).cast("int")
    n_bytes = (w * h * 3).cast("int")
    src = F.coalesce(F.nullif(F.col("text"), F.lit("")), F.lit(" "))
    reps = (n_bytes / F.greatest(F.length(src), F.lit(1)) + 1).cast("int")
    pixels = F.substring(F.repeat(src, reps), 1, n_bytes)
    header = F.format_string("P6\n%d %d\n255\n", w, h)
    return d.select(
        "doc_id",
        F.encode(F.concat(header, pixels), "utf-8").alias("payload"),
    )


def _parse_ppm(payload: bytes):
    """Real P6 decode to a (h, w, 3) uint8 array, full netpbm header
    grammar (not just the happy path the synthesizer emits):

    - ``#`` comments anywhere between header tokens, to end-of-line;
    - any whitespace run separating the magic / width / height / maxval
      tokens (the spec's definition, not only ``\\n``);
    - maxval 1..65535: >255 means two-byte big-endian samples, scaled to
      8-bit with round-to-nearest v·255/maxval;
    - truncated pixel buffers raise ``ValueError`` like any decoder
      (previously they reshaped garbage or died inside numpy).

    Grammar cited from the netpbm P6 spec; adversarial-header cases are
    pinned in tests/test_multimodal.py."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")

    pos = 2
    n = len(payload)
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and # comments between tokens
        while pos < n:
            c = payload[pos : pos + 1]
            if c.isspace():
                pos += 1
            elif c == b"#":
                nl = payload.find(b"\n", pos)
                pos = n if nl < 0 else nl + 1
            else:
                break
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            if payload[pos : pos + 1] == b"#":
                break
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        try:
            tokens.append(int(payload[start:pos]))
        except ValueError as exc:
            raise ValueError(
                f"bad PPM header token {payload[start:pos]!r}"
            ) from exc
    w, h, maxval = tokens
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"bad PPM dimensions {w}x{h} maxval={maxval}")
    # exactly ONE whitespace byte separates maxval from the pixel buffer
    if pos >= n or not payload[pos : pos + 1].isspace():
        raise ValueError("missing header/raster separator")
    pos += 1

    n_samples = w * h * 3
    raster = payload[pos:]
    if maxval > 255:
        if len(raster) < n_samples * 2:
            raise ValueError("truncated PPM raster")
        wide = np.frombuffer(raster[: n_samples * 2], dtype=">u2")
        pix = ((wide.astype(np.uint32) * 255 + maxval // 2) // maxval).astype(
            np.uint8
        )
    else:
        if len(raster) < n_samples:
            raise ValueError("truncated PPM raster")
        pix = np.frombuffer(raster[:n_samples], dtype=np.uint8)
        if maxval != 255:
            pix = (
                (pix.astype(np.uint32) * 255 + maxval // 2) // maxval
            ).astype(np.uint8)
    return pix.reshape(h, w, 3)


@register("multimodal_decode")  # rows-only: binary decode isn't ANSI SQL;
# exact pixel-math correctness is pinned in tests/test_multimodal.py
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode + per-channel statistics over a binary column.

    The kernel parses each PPM payload (header + raw RGB24) and computes
    exact width/height and mean R/G/B — genuine decode work, not a byte
    hash.  Arrow moves the payload batches; numpy does the pixel math.
    At 100 TB the identical kernel signature wraps a JPEG/WEBP decoder
    (PIL/libvips) — the engine-side contract does not change."""
    n_parts = max(8, spark.sparkContext.defaultParallelism // 4)
    payloads = _ppm_payloads(spark, sf_dir).repartition(n_parts, "doc_id")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [],
                "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = _parse_ppm(bytes(p))
                means = img.reshape(-1, 3).mean(axis=0)
                rows["doc_id"].append(doc_id)
                rows["height"].append(img.shape[0])
                rows["width"].append(img.shape[1])
                rows["mean_r"].append(round(float(means[0]), 4))
                rows["mean_g"].append(round(float(means[1]), 4))
                rows["mean_b"].append(round(float(means[2]), 4))
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(
        kernel,
        schema=(
            "doc_id long, width int, height int, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


@register("multimodal_resize")  # rows-only: binary plumbing, not ANSI SQL
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor image resize: decode the PPM payload, index
    the pixel grid down to THUMB_W×THUMB_H×3, emit the thumbnail bytes.

    This is the exact resize math (numpy coordinate indexing — what
    PIL's NEAREST filter computes); the output column is fixed-size
    ``binary``, so downstream Arrow batches have predictable memory — the
    property that lets you size ``maxRecordsPerBatch`` for 100 TB media.
    Swapping in a real photo corpus only changes ``_parse_ppm`` to a
    codec call."""
    import numpy as np

    n_parts = max(8, spark.sparkContext.defaultParallelism // 4)
    payloads = _ppm_payloads(spark, sf_dir).repartition(n_parts, "doc_id")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            thumbs = []
            for p in pdf["payload"]:
                img = _parse_ppm(bytes(p))
                h, w = img.shape[:2]
                ys = (np.arange(THUMB_H) * h) // THUMB_H
                xs = (np.arange(THUMB_W) * w) // THUMB_W
                thumbs.append(img[ys][:, xs].tobytes())
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
    """Frame sampling: one asset row → N frame rows, each a REAL decoded
    slice.

    The kernel decodes the PPM payload and emits FRAMES_PER_ASSET
    evenly-spaced horizontal row-bands of the pixel grid (the image
    analogue of video keyframes; a video corpus swaps ``_parse_ppm`` for
    pyav/ffmpeg behind the same signature).  The load-bearing part is the
    1→N output shape: mapInPandas output row count is independent of
    input — the fan-out pattern for frames/clips — and each frame carries
    its own (frame_idx, row_offset, frame_h) metadata so downstream ops
    treat frames as first-class rows, partitionable independently of
    their source asset."""
    n_parts = max(8, spark.sparkContext.defaultParallelism // 4)
    payloads = _ppm_payloads(spark, sf_dir).repartition(n_parts, "doc_id")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "row_offset": [],
                "frame_h": [],
                "frame": [],
            }
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                img = _parse_ppm(bytes(p))
                h = img.shape[0]
                band = max(h // FRAMES_PER_ASSET, 1)
                for i in range(FRAMES_PER_ASSET):
                    top = min(i * band, h - 1)
                    sl = img[top : top + band]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["row_offset"].append(top)
                    out["frame_h"].append(sl.shape[0])
                    out["frame"].append(sl.tobytes())
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        kernel,
        schema=(
            "doc_id long, frame_idx int, row_offset int, "
            "frame_h int, frame binary"
        ),
    )


@register(
    "multimodal_metadata_agg",
    oracle="""
    SELECT source,
           COUNT(*)                              AS n_assets,
           CAST(SUM(strlen(text)) AS BIGINT)     AS total_payload_bytes,
           CAST(MAX(strlen(text)) AS BIGINT)     AS max_payload_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_metadata_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata aggregation over the asset table — the control-plane
    query pattern for media datasets (payload sizes per source shard);
    payload bytes themselves are never shuffled.

    Parity (unicode audit, r18): the columns are BYTES — the Spark side
    measures the UTF-8 encoding, so the oracle must be DuckDB strlen()
    (octet count), NOT length() (code points).  Identical on ASCII,
    divergent on any multi-byte text — exactly the silent class the
    hostile-unicode catalog sweep exists to catch."""
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


# ---------------------------------------------------------------------------
# perceptual-hash image near-dup: dHash + banded Hamming buckets
# ---------------------------------------------------------------------------

PHASH_BANDS = 4  # 4 × 16-bit bands over the 64-bit dHash
PHASH_HAMMING_MAX = 6  # report pairs within this Hamming radius


def _dhash64(img) -> int:
    """64-bit difference hash (dHash) of a decoded (h, w, 3) uint8 image:
    grayscale → nearest-neighbor 9×8 grid → row-wise brightness-gradient
    sign bits, packed row-major (Krawetz's dHash; the standard cheap
    perceptual fingerprint).  Returns an UNSIGNED 64-bit value as a
    Python int — callers mask/shift for bands and two's-complement for
    storage in a signed Spark long."""
    import numpy as np

    h, w = img.shape[0], img.shape[1]
    gray = img.astype(np.float64).mean(axis=2)
    rows = (np.arange(8) * h) // 8
    cols = (np.arange(9) * w) // 9
    g = gray[np.ix_(rows, cols)]
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


@register("multimodal_phash_dedup")  # rows-only: binary kernel, not ANSI
# SQL; exactness vs a brute-force reference is pinned in
# tests/test_multimodal.py (banded candidates ∩ Hamming radius)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate IMAGE detection: per-payload 64-bit dHash in one
    Arrow kernel, then the same banded-bucket discipline as
    ``simhash_dedup`` — the hash splits into 4×16-bit bands, candidates
    are pairs sharing a (band_id, band_value) bucket, and the exact
    Hamming distance is codegen ``bit_count(a ^ b)`` on the candidates
    only.  By pigeonhole every pair within Hamming ≤ 3 shares a clean
    band (guaranteed recall); the reported radius is ≤ {radius}.

    Scale: no all-pairs stage exists — signatures are one kernel pass
    (8 bigints per image shuffle, payloads never leave their scan), the
    self-join is bucket-keyed, and hot buckets are real near-dup
    clusters (AQE skew territory).  This is the image twin of the text
    MinHash/SimHash path, sharing its plan shape end-to-end."""
    n_parts = max(8, spark.sparkContext.defaultParallelism // 4)
    payloads = _ppm_payloads(spark, sf_dir).repartition(n_parts, "doc_id")

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "phash": [], "b0": [], "b1": [],
                    "b2": [], "b3": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                u = _dhash64(_parse_ppm(bytes(p)))
                rows["doc_id"].append(doc_id)
                # two's-complement into a signed Spark long
                rows["phash"].append(u - (1 << 64) if u >= (1 << 63) else u)
                for k in range(PHASH_BANDS):
                    rows[f"b{k}"].append((u >> (16 * k)) & 0xFFFF)
            yield pd.DataFrame(rows)

    sig = payloads.mapInPandas(
        kernel,
        schema="doc_id long, phash long, b0 int, b1 int, b2 int, b3 int",
    ).persist()

    bands = sig.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias(
            "band_id", "band_val"
        ),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ha = sig.select(F.col("doc_id").alias("doc_a"),
                    F.col("phash").alias("phash_a"))
    hb = sig.select(F.col("doc_id").alias("doc_b"),
                    F.col("phash").alias("phash_b"))
    out = (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(
                F.col("phash_a").bitwiseXOR(F.col("phash_b"))
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= PHASH_HAMMING_MAX)
        .persist()
    )
    out.count()  # materialize through the cached signature frame
    sig.unpersist()
    return out


multimodal_phash_dedup.__doc__ = multimodal_phash_dedup.__doc__.format(
    radius=PHASH_HAMMING_MAX
)
