"""Round-11 review pins for operators/multimodal.py: flat-image
zero-hash exclusion, kind filtering, 64-bit hash capacity guard, NULL
payload skip, center-crop for non-divisible geometry, and the
use_stub flag reaching the kernel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mssql_dataframe_spark.operators import multimodal as M


def _media(spark, rows):
    return spark.createDataFrame(rows, M.IMAGE_SCHEMA)


def test_ahash_rejects_grids_over_64_bits(spark):
    media = _media(spark, [(1, M.encode_ppm(M._formula_image(1)))])
    with pytest.raises(ValueError, match="64-bit"):
        M.ahash_near_dup_pairs(media, out_w=16, out_h=8)


def test_ahash_excludes_flat_images(spark):
    """Two solid images of DIFFERENT colors both hash to 0 (every cell
    sits at the mean); they must not be reported as duplicates."""
    black = np.zeros((32, 30, 3), np.uint8)
    white = np.full((32, 30, 3), 255, np.uint8)
    media = _media(spark, [
        (1, M.encode_ppm(black)),
        (2, M.encode_ppm(white)),
        (3, M.encode_ppm(M._formula_image(3))),
        (4, M.encode_bmp(M._formula_image(3))),  # true dup of 3
    ])
    pairs = {
        (r["id1"], r["id2"])
        for r in M.ahash_near_dup_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) not in pairs
    assert (3, 4) in pairs


def test_ahash_filters_to_image_kind(spark):
    """With a kind column present, audio/video rows never reach the
    image decoder (their payloads are not image bytes)."""
    rows = [
        (1, "image", bytearray(M.encode_ppm(M._formula_image(1)))),
        (2, "image", bytearray(M.encode_bmp(M._formula_image(1)))),
        (3, "audio", bytearray(b"not an image at all")),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    pairs = M.ahash_near_dup_pairs(media, max_hamming=3).collect()
    assert {(r["id1"], r["id2"]) for r in pairs} == {(1, 2)}


def test_decode_pixels_skips_null_payloads(spark):
    media = spark.createDataFrame(
        [(1, bytearray(M.encode_ppm(M._formula_image(1)))), (2, None)],
        M.IMAGE_SCHEMA,
    )
    out = M.decode_box_resize_pixels(media, 6, 8)
    ids = {r["media_id"] for r in out.collect()}
    assert ids == {1}


def test_decode_pixels_center_crops_non_divisible(spark):
    """A 31x33 image is not divisible by 6x8; the kernel center-crops
    to 30x32 and still emits exactly one row per output cell."""
    img = M._formula_image(7, w=31, h=33)
    media = _media(spark, [(7, M.encode_ppm(img))])
    out = M.decode_box_resize_pixels(media, 6, 8).collect()
    assert len(out) == 48
    # crop offsets: x0=(31-30)//2=0, y0=(33-32)//2=0 -> same block sums
    want = M.box_resize(img[0:32, 0:30], 6, 8)
    got = {(r["px_x"], r["px_y"]): (r["r"], r["g"], r["b"]) for r in out}
    assert got[(0, 0)] == tuple(int(v) for v in want[0, 0])
    assert got[(5, 7)] == tuple(int(v) for v in want[7, 5])


def test_audio_features_skip_null_payloads(spark):
    media = spark.createDataFrame(
        [
            (1, bytearray(M.encode_wav(M._formula_samples(1)))),
            (2, None),
        ],
        M.IMAGE_SCHEMA,
    )
    out = M.decode_audio_features(media).collect()
    assert {r["media_id"] for r in out} == {1}


def test_extract_features_stub_flag_reaches_kernel(spark, monkeypatch):
    """use_stub=False with decoders 'available' must not silently fall
    back to fake features — the honest decode_real stub raises."""
    media = M.synthesize_media_from_documents(
        spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    )
    monkeypatch.setattr(M, "REAL_DECODERS_AVAILABLE", True)
    with pytest.raises(Exception, match="real image/audio decode"):
        M.extract_features(media, use_stub=False).collect()
