"""Multimodal decode/resize: the PPM path is REAL image math — pin it
against hand-computed pixels, then end-to-end through the operators."""

from __future__ import annotations

import numpy as np
import pytest

from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.operators.multimodal import (
    THUMB_H,
    THUMB_W,
    _parse_ppm,
)

SF = "/root/testdata/sf0.001"


def _ppm(w: int, h: int, pixels: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + pixels


def test_parse_ppm_exact_pixels():
    # 2x2 image: R, G, B, white
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    img = _parse_ppm(_ppm(2, 2, pix))
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 255, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [255, 255, 255]


def test_parse_ppm_rejects_non_ppm():
    with pytest.raises(ValueError):
        _parse_ppm(b"JFIF....")


def test_parse_ppm_comments_and_whitespace_grammar():
    """Full netpbm header grammar: # comments between any tokens, and
    arbitrary whitespace runs as separators (r5 verdict item 5)."""
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    weird = (
        b"P6 # magic then comment\n"
        b"# a full-line comment\n"
        b"  2\t# width\n"
        b"\t2 # height\n"
        b"255\n" + pix
    )
    img = _parse_ppm(weird)
    assert img.shape == (2, 2, 3)
    assert img[1, 1].tolist() == [255, 255, 255]
    # single-space separators only
    assert _parse_ppm(b"P6 2 2 255 " + pix).shape == (2, 2, 3)


def test_parse_ppm_scales_small_maxval():
    """maxval 15: samples scale to 8-bit with round-to-nearest."""
    pix = bytes([15, 0, 7, 0, 15, 0, 0, 0, 15, 15, 15, 15])
    img = _parse_ppm(b"P6\n2 2\n15\n" + pix)
    assert img[0, 0].tolist() == [255, 0, 119]  # (7*255+7)//15 = 119
    assert img[1, 1].tolist() == [255, 255, 255]


def test_parse_ppm_16bit_maxval():
    """maxval > 255: two-byte big-endian samples, scaled to 8-bit."""
    import struct

    samples = [65535, 0, 32768, 0, 65535, 0, 0, 0, 65535, 65535, 65535, 65535]
    pix = struct.pack(">12H", *samples)
    img = _parse_ppm(b"P6\n2 2\n65535\n" + pix)
    assert img[0, 0].tolist() == [255, 0, 128]  # (32768*255+32767)//65535
    assert img[1, 1].tolist() == [255, 255, 255]


def test_parse_ppm_truncation_raises_cleanly():
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    with pytest.raises(ValueError, match="truncated PPM raster"):
        _parse_ppm(b"P6\n2 2\n255\n" + pix[:-1])
    with pytest.raises(ValueError, match="truncated PPM raster"):
        _parse_ppm(b"P6\n2 2\n65535\n" + pix)  # 16-bit needs 24 bytes
    with pytest.raises(ValueError, match="truncated PPM header"):
        _parse_ppm(b"P6\n2 2")
    with pytest.raises(ValueError, match="bad PPM header token"):
        _parse_ppm(b"P6\n2 two\n255\n" + pix)
    with pytest.raises(ValueError, match="bad PPM dimensions"):
        _parse_ppm(b"P6\n0 2\n255\n" + pix)
    with pytest.raises(ValueError, match="bad PPM dimensions"):
        _parse_ppm(b"P6\n2 2\n70000\n" + pix)


def test_parse_ppm_rejects_ascii_p3_variant():
    """P3 is the ASCII-raster sibling format: same header grammar, but
    decimal sample text instead of binary — structurally valid netpbm
    that a P6 decoder must refuse at the magic, not misread as pixels
    (r6 verdict item 4)."""
    p3 = b"P3\n2 2\n255\n255 0 0  0 255 0\n0 0 255  255 255 255\n"
    with pytest.raises(ValueError, match="not a P6"):
        _parse_ppm(p3)
    # magic must be exactly 'P6' + separator: a glued suffix makes the
    # first header token non-numeric, never a silent 'P6' match
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    with pytest.raises(ValueError, match="bad PPM header token"):
        _parse_ppm(b"P6x\n2 2\n255\n" + pix)


def test_parse_ppm_overlong_header_fuzz():
    """Pathological headers must fail with ValueError, never hang,
    overflow, or allocate raster-sized buffers (r6 verdict item 4):
    a 5000-digit width trips CPython's int-conversion digit limit inside
    the token parse (re-raised as a bad header token); a 4000-digit one
    parses as a bignum and dies at the raster-length check; a header
    that is ONE giant comment dies as truncated; a negative width dies
    at the dimension check."""
    pix = bytes(12)
    with pytest.raises(ValueError, match="bad PPM header token"):
        _parse_ppm(b"P6\n" + b"9" * 5000 + b" 2\n255\n" + pix)
    with pytest.raises(ValueError, match="truncated PPM raster"):
        _parse_ppm(b"P6\n" + b"9" * 4000 + b" 2\n255\n" + pix)
    with pytest.raises(ValueError, match="truncated PPM header"):
        _parse_ppm(b"P6\n#" + b"c" * 10000)
    with pytest.raises(ValueError, match="bad PPM dimensions"):
        _parse_ppm(b"P6\n-2 2\n255\n" + pix)
    with pytest.raises(ValueError, match="bad PPM dimensions"):
        _parse_ppm(b"P6\n2 2\n0\n" + pix)


def test_parse_ppm_random_bytes_never_crash_uncontrolled():
    """Property fuzz: any byte soup after the magic either decodes or
    raises ValueError — no IndexError/OverflowError/numpy internals
    escaping the decoder (the contract the mapInPandas kernels rely on
    to classify rows as decode_ok=false)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=200))
    def run(tail):
        try:
            img = _parse_ppm(b"P6" + tail)
            assert img.ndim == 3 and img.shape[2] == 3
        except ValueError:
            pass

    run()


def test_multimodal_decode_matches_hand_computation(spark):
    """The operator's per-channel means must equal a pure-python decode of
    the same deterministic payload (text tiled to w*h*3 bytes)."""
    import duckdb

    con = duckdb.connect()
    doc = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "WHERE doc_id = 3"
    ).fetchone()
    con.close()
    doc_id, text = doc
    w = 8 + doc_id % 24
    h = 8 + (doc_id * 7) % 24
    n = w * h * 3
    raw = text.encode()
    tiled = (raw * (n // len(raw) + 1))[:n]
    expected = np.frombuffer(tiled, np.uint8).reshape(-1, 3).mean(axis=0)

    rows = {
        r["doc_id"]: r
        for r in all_queries()["multimodal_decode"](spark, SF).collect()
    }
    got = rows[doc_id]
    assert (got["width"], got["height"]) == (w, h)
    assert got["mean_r"] == round(float(expected[0]), 4)
    assert got["mean_g"] == round(float(expected[1]), 4)
    assert got["mean_b"] == round(float(expected[2]), 4)
    assert len(rows) == 500  # every document decoded


def test_multimodal_resize_real_nearest_neighbor(spark):
    """Thumbnails are exact nearest-neighbor samples of the decoded grid:
    fixed byte size, and spot-pixels equal the numpy reference."""
    import duckdb

    con = duckdb.connect()
    doc_id, text = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "WHERE doc_id = 7"
    ).fetchone()
    con.close()
    w = 8 + doc_id % 24
    h = 8 + (doc_id * 7) % 24
    n = w * h * 3
    raw = text.encode()
    img = np.frombuffer(
        (raw * (n // len(raw) + 1))[:n], np.uint8
    ).reshape(h, w, 3)
    ys = (np.arange(THUMB_H) * h) // THUMB_H
    xs = (np.arange(THUMB_W) * w) // THUMB_W
    expected = img[ys][:, xs].tobytes()

    rows = {
        r["doc_id"]: r
        for r in all_queries()["multimodal_resize"](spark, SF).collect()
    }
    got = rows[doc_id]
    assert bytes(got["thumb"]) == expected
    assert all(
        len(bytes(r["thumb"])) == THUMB_W * THUMB_H * 3
        for r in rows.values()
    )


def test_ppm_kernels_survive_null_and_empty_text(spark, tmp_path):
    """Round-3 verdict defect #4: NULL/empty text produced an empty pixel
    buffer that crashed ``reshape(h, w, 3)`` in all three PPM kernels.
    The pixel source now falls back to a space-filled buffer; every doc
    must come out of decode/resize/frame_sample with full dimensions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array([None, "", "normal text body"], pa.string()),
                "lang": pa.array(["en"] * 3, pa.string()),
                "source": pa.array(["src0"] * 3, pa.string()),
                "n_chars": pa.array([0, 0, 16], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    q = all_queries()
    sf = str(tmp_path)

    dec = {r["doc_id"]: r for r in q["multimodal_decode"](spark, sf).collect()}
    assert set(dec) == {1, 2, 3}
    for r in dec.values():
        assert r["width"] >= 8 and r["height"] >= 8
    # space-filled image: all channels exactly 32.0
    assert dec[1]["mean_r"] == 32.0 and dec[2]["mean_b"] == 32.0

    thumbs = q["multimodal_resize"](spark, sf).collect()
    assert {r["doc_id"] for r in thumbs} == {1, 2, 3}
    assert all(len(r["thumb"]) == THUMB_W * THUMB_H * 3 for r in thumbs)

    frames = q["multimodal_frame_sample"](spark, sf).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == {1, 2, 3}


def _expected_decode_frame(sf_dir: str):
    """Independent full-corpus reference: decode every synthesized PPM
    with pure python/numpy straight from the parquet (no Spark)."""
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    con.close()
    out = {}
    for doc_id, text in docs:
        w = 8 + doc_id % 24
        h = 8 + (doc_id * 7) % 24
        n = w * h * 3
        raw = (text or "").encode() or b" "
        img = np.frombuffer(
            (raw * (n // len(raw) + 1))[:n], np.uint8
        ).reshape(h, w, 3)
        out[doc_id] = (w, h, img)
    return out


def test_multimodal_decode_golden_hash_sf0_01_corpus():
    """Round-4 verdict #6: a corpus-wide golden hash ahead of driver
    adjudication — every doc's (w, h, channel means) at sf0.01, digested
    and compared against an independent non-Spark decode of the same
    fixture (an independent recomputation, not a frozen constant: the
    driver regenerates fixtures between rounds)."""
    import hashlib

    from googlecloudstorage_blueprints_spark.session import get_spark

    sf = "/root/testdata/sf0.01"
    spark = get_spark(app_name="mm-golden", master="local[8]")
    rows = all_queries()["multimodal_decode"](spark, sf).collect()
    got = hashlib.sha256(
        "".join(
            f"{r['doc_id']}:{r['width']}x{r['height']}:"
            f"{r['mean_r']:.4f},{r['mean_g']:.4f},{r['mean_b']:.4f};"
            for r in sorted(rows, key=lambda r: r["doc_id"])
        ).encode()
    ).hexdigest()

    ref = _expected_decode_frame(sf)
    exp = hashlib.sha256(
        "".join(
            f"{doc_id}:{w}x{h}:"
            + ",".join(
                f"{round(float(m), 4):.4f}"
                for m in img.reshape(-1, 3).mean(axis=0)
            )
            + ";"
            for doc_id, (w, h, img) in sorted(ref.items())
        ).encode()
    ).hexdigest()
    assert len(rows) == len(ref)
    assert got == exp


def test_multimodal_resize_golden_hash_sf0_01_corpus():
    """Thumbnail bytes for the WHOLE sf0.01 corpus, digested against the
    independent numpy nearest-neighbor reference."""
    import hashlib

    from googlecloudstorage_blueprints_spark.session import get_spark

    sf = "/root/testdata/sf0.01"
    spark = get_spark(app_name="mm-golden", master="local[8]")
    rows = all_queries()["multimodal_resize"](spark, sf).collect()
    digest = hashlib.sha256()
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        digest.update(str(r["doc_id"]).encode())
        digest.update(bytes(r["thumb"]))
    got = digest.hexdigest()

    ref = _expected_decode_frame(sf)
    exp_digest = hashlib.sha256()
    for doc_id, (w, h, img) in sorted(ref.items()):
        ys = (np.arange(THUMB_H) * h) // THUMB_H
        xs = (np.arange(THUMB_W) * w) // THUMB_W
        exp_digest.update(str(doc_id).encode())
        exp_digest.update(img[ys][:, xs].tobytes())
    assert got == exp_digest.hexdigest()


def test_multimodal_phash_dedup_equals_bruteforce(spark):
    """The banded-bucket op must return EXACTLY the pairs a brute-force
    reference finds within the Hamming radius among band-sharing pairs —
    and by pigeonhole, every pair within Hamming ≤ 3 (4 bands, 3 bit
    flips can't dirty all four)."""
    from googlecloudstorage_blueprints_spark.operators.multimodal import (
        PHASH_BANDS,
        PHASH_HAMMING_MAX,
        _dhash64,
    )

    ref = _expected_decode_frame(SF)
    hashes = {doc_id: _dhash64(img) for doc_id, (_, _, img) in ref.items()}
    ids = sorted(hashes)

    def bands(u):
        return [(u >> (16 * k)) & 0xFFFF for k in range(PHASH_BANDS)]

    expected = {}
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            ham = bin(hashes[da] ^ hashes[db]).count("1")
            if ham <= PHASH_HAMMING_MAX and any(
                x == y for x, y in zip(bands(hashes[da]), bands(hashes[db]))
            ):
                expected[(da, db)] = ham

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in all_queries()["multimodal_phash_dedup"](
            spark, SF
        ).collect()
    }
    assert got == expected
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            if bin(hashes[da] ^ hashes[db]).count("1") <= 3:
                assert (da, db) in got, "pigeonhole recall violated"


def test_multimodal_phash_dedup_finds_planted_duplicates(spark, tmp_path):
    """A corpus with two identical images (same text, doc_ids congruent
    mod 24 so the synthesized dimensions match) must yield that pair at
    Hamming 0."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = {
        i: f"doc {i} body words vary {i * 17 % 31}" for i in range(50)
    }
    texts[27] = texts[3]  # 27 ≡ 3 (mod 24) → same w, h, same pixels
    pdf = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[i] for i in texts],
            "lang": "en",
            "source": "synth",
            "n_chars": [len(texts[i]) for i in texts],
        }
    )
    pq.write_table(
        pa.Table.from_pandas(pdf), tmp_path / "documents.parquet"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in all_queries()["multimodal_phash_dedup"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got.get((3, 27)) == 0
