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
