"""Real image codec kernels (PPM P6 / 24-bit BMP) + box-filter resize,
and the Arrow-batch decode plumbing around them.

Mirrors the reference's test style of exact round-trip contracts
(reference tests/test_core/test_conversion.py checks write->read
round-trips per type); here the contract is encode->decode identity
per codec and exact integer box means.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mssql_dataframe_spark.operators import multimodal as M


def _img(seed: int, w: int = 30, h: int = 32) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    img = _img(1)
    assert np.array_equal(M.decode_ppm(M.encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _img(2, w=4, h=3)
    body = img.tobytes()
    payload = b"P6 # c1\n# full line comment\n  4\t3 # dims\n 255\n" + body
    assert np.array_equal(M.decode_ppm(payload), img)


def test_bmp_roundtrip_padded_rows():
    # width 30 -> 90-byte rows -> 2 pad bytes/row; exercises the
    # stride math both directions
    img = _img(3)
    payload = M.encode_bmp(img)
    assert len(payload) == 54 + 32 * 92
    assert np.array_equal(M.decode_bmp(payload), img)


def test_bmp_topdown_decode():
    # negative biHeight = top-down row order; synthesize by patching
    # the header and re-ordering the raster of a bottom-up file
    img = _img(4, w=4, h=2)
    up = bytearray(M.encode_bmp(img))
    stride = (4 * 3 + 3) & ~3
    rows = [bytes(up[54 + i * stride : 54 + (i + 1) * stride]) for i in range(2)]
    struct.pack_into("<i", up, 22, -2)  # biHeight = -2
    down = bytes(up[:54]) + b"".join(reversed(rows))
    assert np.array_equal(M.decode_bmp(down), img)


def test_decode_image_dispatch_and_stub_boundary():
    img = _img(5, w=4, h=4)
    assert np.array_equal(M.decode_image(M.encode_ppm(img)), img)
    assert np.array_equal(M.decode_image(M.encode_bmp(img)), img)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\xff\xd8\xff\xe0jpeg-ish")  # JPEG magic stays stubbed


def test_box_resize_exact_integer_means():
    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = M.box_resize(img, 2, 1)  # 2x2 blocks
    # block mean of channel c at (0,0): values {c, c+3, c+12, c+15} -> +7.5 -> floor
    assert out.shape == (1, 2, 3)
    assert out[0, 0, 0] == (0 + 3 + 12 + 15) // 4
    assert out[0, 1, 2] == (8 + 11 + 20 + 23) // 4
    with pytest.raises(ValueError):
        M.box_resize(img, 3, 1)  # non-integral ratio


def test_formula_image_matches_oracle_formula():
    img = M._formula_image(7, w=5, h=4)
    for y in range(4):
        for x in range(5):
            for c in range(3):
                assert img[y, x, c] == (7 * 31 + y * 7 + x * 3 + c * 11) % 256


def test_decode_box_resize_pixels_end_to_end(spark):
    ids = spark.createDataFrame([(0,), (1,)], "doc_id long")  # PPM + BMP
    out = (
        M.decode_box_resize_pixels(M.synthesize_images(ids), 6, 8)
        .toPandas()
        .sort_values(["media_id", "px_y", "px_x"])
        .reset_index(drop=True)
    )
    assert len(out) == 2 * 48
    for mid in (0, 1):
        expect = M.box_resize(M._formula_image(mid), 6, 8)
        got = out[out.media_id == mid]
        arr = np.stack(
            [got[c].to_numpy().reshape(8, 6) for c in ("r", "g", "b")], axis=-1
        )
        assert np.array_equal(arr, expect)


def test_ahash_brightness_invariance_and_blocking(spark):
    """aHash: a brightness-shifted copy keeps its bit pattern (cells
    and mean shift together) -> hamming 0; a structurally different
    image exceeds the budget; pairs come back exactly once."""
    import numpy as np

    from mssql_dataframe_spark.operators.multimodal import (
        ahash_near_dup_pairs, encode_bmp, encode_ppm,
    )

    rng = np.random.RandomState(3)
    base = rng.randint(0, 200, size=(32, 30, 3)).astype(np.uint8)
    shifted = np.clip(base.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    other = rng.randint(0, 256, size=(32, 30, 3)).astype(np.uint8)
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_ppm(base))),
            (2, bytearray(encode_bmp(shifted))),   # other codec, same image
            (3, bytearray(encode_ppm(other))),
        ],
        "media_id long, payload binary",
    )
    out = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in ahash_near_dup_pairs(media, max_hamming=3).collect()
    }
    assert out.get((1, 2)) == 0
    assert (1, 3) not in out and (2, 3) not in out
