"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Two tiers of decode kernels:

- **Real, in-repo pure-Python codecs** for uncompressed formats:
  PPM (P6) and 24-bit BI_RGB BMP parse/serialize plus an exact
  integer box-filter resize (`decode_image`, `box_resize`). These run
  behind the same ``mapInPandas`` Arrow-batch plumbing a production
  decoder would use, and their pixel output is oracle-verified.
- **Stubs** for compressed formats (JPEG/PNG/audio/video): the
  container ships no codec libraries, so those kernels raise
  ``NotImplementedError`` / use a deterministic fake — the Spark-side
  plumbing (schemas, batch shape, partitioning, UDF signatures) is
  identical, so swapping in PIL/torchaudio changes nothing else.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media row schema: opaque payload + typed metadata (SURVEY-extension)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

REAL_DECODERS_AVAILABLE = False  # no PIL/torchaudio in this container


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake feature vector (8-dim) from the payload hash.

    Production swap-in point: decode with PIL / torchaudio / ffmpeg and
    run the real feature extractor here. Raise if callers demand real
    decoding.
    """
    if payload is None:
        return None
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:8]]


def decode_real(payload: bytes, kind: str):
    raise NotImplementedError(
        "real image/audio decode requires PIL/torchaudio, not present in "
        "this container — use extract_features(use_stub=True)"
    )


def extract_features(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    ``mapInPandas`` streams Arrow record batches through Python once per
    partition — the correct shape for decode workloads (CPU-bound per
    row, no shuffle). Partition count should track cluster cores; the
    payload column is only materialized inside the batch iterator.
    Arrow batch sizing is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """
    if not use_stub and not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError("no real decoders in this environment")
    # the kernel honors the flag too: a production build that flips
    # REAL_DECODERS_AVAILABLE must never get stub features silently
    # labeled as real ones
    decode = _decode_stub if use_stub else decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else None for p in pdf["payload"]
                    ],
                    "content_hash": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table, used
    to exercise the plumbing end-to-end without real codecs: the text
    bytes stand in for an encoded payload."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def resize_stub(
    media: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Image-resize plumbing over Arrow batches.

    The stub "resize" deterministically truncates/cycles the payload to
    width*height bytes (a real kernel would decode -> resample ->
    re-encode in the same ``mapInPandas`` slot); metadata columns are
    updated exactly as production would. Runs image rows only.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                elif len(p) >= target:
                    payloads.append(bytes(p[:target]))
                else:  # cycle to length (deterministic fake upscale)
                    reps = (target + len(p) - 1) // len(p) if len(p) else 1
                    payloads.append(bytes((p * reps)[:target]) if p else b"")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "n_bytes": [
                        len(p) if p is not None else None for p in payloads
                    ],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


# ---------------------------------------------------------------------------
# real pure-Python image codecs: PPM (P6) and uncompressed 24-bit BMP
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as binary PPM (P6)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM P6 requires 3 channels")
    header = b"P6\n# synthetic\n" + f"{w} {h}\n255\n".encode("ascii")
    return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse binary PPM (P6) -> (h, w, 3) uint8 RGB. Handles arbitrary
    header whitespace and ``#`` comments per the netpbm spec."""
    pos = 0

    def token() -> bytes:
        nonlocal pos
        while pos < len(payload):
            ch = payload[pos : pos + 1]
            if ch == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif ch.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        return payload[start:pos]

    if token() != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    w, h, maxval = int(token()), int(token()), int(token())
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # exactly one whitespace byte separates header from raster
    need = w * h * 3
    data = payload[pos : pos + need]
    if len(data) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(data, np.uint8).reshape(h, w, 3).copy()


def encode_bmp(img: np.ndarray) -> bytes:
    """Serialize an (h, w, 3) uint8 RGB array as an uncompressed
    24-bit BI_RGB BMP (bottom-up rows, BGR order, rows padded to 4)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("BMP writer requires 3 channels")
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    bgr = np.ascontiguousarray(img[..., ::-1], dtype=np.uint8)
    raster = b"".join(bgr[y].tobytes() + pad for y in range(h - 1, -1, -1))
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 54)
    return head + info + raster


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse an uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB.
    Handles bottom-up (positive height) and top-down (negative) rows
    and 4-byte row padding."""
    magic, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    _hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BI_RGB BMP supported")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), np.uint8)
    for i in range(h):
        row = np.frombuffer(
            payload[offset + i * stride : offset + i * stride + w * 3],
            np.uint8,
        ).reshape(w, 3)
        out[i if top_down else h - 1 - i] = row[:, ::-1]  # BGR -> RGB
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes to the in-repo codecs. Compressed
    formats (JPEG/PNG/...) stay stubbed — no codec libs in this
    container; a production build registers them here."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "no in-repo codec for this format (PPM P6 and 24-bit BMP ship "
        "in-repo; JPEG/PNG need PIL, absent in this container)"
    )


def box_resize(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Exact integer box-filter downscale: each output pixel is the
    floor-mean of its (h/out_h) x (w/out_w) source block. Integral
    ratios only — keeps the arithmetic bit-reproducible (the oracle
    recomputes the same integer sums)."""
    h, w, c = img.shape
    if h % out_h or w % out_w:
        raise ValueError("box_resize requires integral downscale ratios")
    bh, bw = h // out_h, w // out_w
    s = (
        img.astype(np.int64)
        .reshape(out_h, bh, out_w, bw, c)
        .sum(axis=(1, 3))
    )
    return (s // (bh * bw)).astype(np.uint8)


# synthetic image geometry: width 30 exercises BMP row padding
# (30*3 = 90 bytes -> 2 pad bytes); 30x32 -> 6x8 via 5x4 blocks
IMG_W, IMG_H = 30, 32


def _formula_image(media_id: int, w: int = IMG_W, h: int = IMG_H) -> np.ndarray:
    """Deterministic pixels the DuckDB oracle can recompute in SQL:
    v(x, y, c) = (media_id*31 + y*7 + x*3 + c*11) % 256."""
    ys, xs = np.mgrid[0:h, 0:w]
    base = media_id * 31 + ys * 7 + xs * 3
    return np.stack(
        [(base + c * 11) % 256 for c in range(3)], axis=-1
    ).astype(np.uint8)


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def synthesize_images(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Encode one formula image per id — even ids as PPM, odd as BMP —
    so the decode path exercises both parsers in one run."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = pdf["media_id"].tolist()
            payloads = [
                (encode_bmp if m % 2 else encode_ppm)(_formula_image(m))
                for m in ids_
            ]
            yield pd.DataFrame({"media_id": ids_, "payload": payloads})

    return ids.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, schema=IMAGE_SCHEMA
    )


PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("px_x", T.IntegerType(), False),
        T.StructField("px_y", T.IntegerType(), False),
        T.StructField("r", T.IntegerType(), False),
        T.StructField("g", T.IntegerType(), False),
        T.StructField("b", T.IntegerType(), False),
    ]
)


def decode_box_resize_pixels(
    media: DataFrame, out_w: int = 6, out_h: int = 8
) -> DataFrame:
    """REAL decode kernel behind the Arrow-batch plumbing: parse each
    payload (PPM or BMP by magic), box-filter downscale, emit one row
    per output pixel. CPU-bound per row with no shuffle — partition
    count should track cluster cores at scale.

    NULL payloads emit no pixel rows (the same skip-don't-crash
    contract as the stub kernels). Images whose dimensions are not
    integral multiples of ``out_w``/``out_h`` are center-cropped to
    the largest divisible size first — deterministic integer
    arithmetic end-to-end, so mixed-geometry corpora work while the
    box filter stays bit-reproducible."""
    xs, ys = np.meshgrid(np.arange(out_w), np.arange(out_h))
    flat_x, flat_y = xs.ravel().astype(np.int32), ys.ravel().astype(np.int32)
    n_px = out_w * out_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, rs, gs, bs = [], [], [], []
            n_imgs = 0
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                img = decode_image(bytes(p))
                h, w = img.shape[0], img.shape[1]
                if h < out_h or w < out_w:
                    continue  # too small to produce one block per cell
                ch, cw = h - h % out_h, w - w % out_w
                if (ch, cw) != (h, w):
                    y0, x0 = (h - ch) // 2, (w - cw) // 2
                    img = img[y0 : y0 + ch, x0 : x0 + cw]
                small = box_resize(img, out_w, out_h)
                n_imgs += 1
                mids.extend([m] * n_px)
                rs.append(small[..., 0].ravel())
                gs.append(small[..., 1].ravel())
                bs.append(small[..., 2].ravel())
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "px_x": np.tile(flat_x, n_imgs),
                    "px_y": np.tile(flat_y, n_imgs),
                    "r": np.concatenate(rs).astype(np.int32) if rs else [],
                    "g": np.concatenate(gs).astype(np.int32) if gs else [],
                    "b": np.concatenate(bs).astype(np.int32) if bs else [],
                }
            )

    return media.mapInPandas(run, schema=PIXEL_SCHEMA)


# ---------------------------------------------------------------------------
# real pure-Python audio codec: RIFF/WAVE PCM 16-bit
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Serialize int16 mono samples as a PCM WAV (RIFF) file."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a PCM WAV file -> (sample_rate, int16 mono samples).
    Walks the RIFF chunk list (tolerates extra chunks like LIST/fact);
    only uncompressed 16-bit mono is supported — compressed audio
    stays stubbed."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise ValueError("only 16-bit mono PCM WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2").copy()


# synthetic audio geometry: deterministic int16 samples the oracle can
# recompute — s(t) = ((media_id*7 + t*13) % 2001) - 1000, with a
# per-id sample count so durations differ
AUDIO_RATE = 8000


def _formula_samples(media_id: int) -> np.ndarray:
    n = 400 + (media_id % 5) * 100
    t = np.arange(n, dtype=np.int64)
    return ((media_id * 7 + t * 13) % 2001 - 1000).astype(np.int16)


def synthesize_audio(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One formula WAV per id, through the real encoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_ = pdf["media_id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids_,
                    "payload": [
                        encode_wav(_formula_samples(m), AUDIO_RATE)
                        for m in ids_
                    ],
                }
            )

    return ids.select(F.col(id_col).cast("long").alias("media_id")).mapInPandas(
        run, schema=IMAGE_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
    ]
)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode kernel: parse each WAV payload, compute
    duration / peak / RMS per clip. RMS sums squares in int64 (exact,
    order-independent) before one double sqrt, so the value is
    bit-reproducible in any engine."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "sample_rate", "n_samples", "duration_ms",
                "peak", "rms",
            )}
            for m, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue  # skip-don't-crash, like the stub kernels
                rate, s = decode_wav(bytes(p))
                s64 = s.astype(np.int64)
                n = len(s)
                rows["media_id"].append(m)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // rate)
                rows["peak"].append(int(np.abs(s64).max()) if n else 0)
                rows["rms"].append(
                    round(float(np.sqrt(float((s64 * s64).sum()) / n)), 6)
                    if n
                    else 0.0
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp.

    The decode itself is stubbed; the plan (explode over the sampling
    grid) is the real distributed part — this is what fans a 2-hour
    video into 7200 decode tasks at scale.
    """
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


def ahash_near_dup_pairs(
    media: DataFrame,
    out_w: int = 6,
    out_h: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """Perceptual near-duplicate IMAGE pairs via average hash: decode
    (real PPM/BMP parsers) -> box-resize to ``out_w x out_h`` -> one
    bit per cell (gray above the image mean, compared as integers:
    ``gray*n_px > sum(gray)`` — no float mean) -> pigeonhole-blocked
    Hamming join. Brightness/contrast-shifted copies of an image keep
    their bit pattern (a constant shift moves every cell AND the mean
    together), which is exactly why aHash catches re-encoded
    duplicates that byte-level dedup misses.

    Scale shape: the hash is ``max_hamming+1`` blocks; two hashes
    within the budget MUST agree on at least one block (pigeonhole),
    so candidates come from an equi-join on (block_idx, block_value)
    and only candidates pay the exact popcount — via the SAME
    ``blocked_hamming_pairs`` machinery simhash_near_dup_pairs uses.
    Decode cost is one ``mapInPandas`` pass; nothing downstream
    touches pixels again.

    Uniform (flat) images all hash to 0 — every cell sits at the mean
    — so, like SimHash's zero-hash exclusion, they are excluded from
    pairing: "flat ~ flat" pairs would conflate different solid
    colors AND pile every blank/padding frame into one bucket
    (quadratic candidate blow-up). When ``media`` carries a ``kind``
    column, only image rows are hashed (the other kinds' payloads are
    not image bytes).
    """
    n_px = out_w * out_h
    if n_px > 64:
        raise ValueError(
            f"ahash grid {out_w}x{out_h} needs {n_px} bits; the hash "
            "is packed into ONE 64-bit word (shiftleft wraps the "
            "shift count mod 64 past that, silently corrupting every "
            "hash) — use a grid of at most 64 cells"
        )
    n_blocks = max_hamming + 1
    block_bits = (n_px + n_blocks - 1) // n_blocks

    if "kind" in media.columns:
        media = media.filter(F.col("kind") == "image")
    px = decode_box_resize_pixels(media, out_w=out_w, out_h=out_h)
    gray = px.select(
        "media_id",
        (F.col("px_y") * out_w + F.col("px_x")).alias("pos"),
        (F.col("r") + F.col("g") + F.col("b")).cast("long").alias("gray"),
    )
    tot = gray.groupBy("media_id").agg(F.sum("gray").alias("total"))
    hashed = (
        gray.join(tot, "media_id")
        .groupBy("media_id")
        .agg(
            # shiftleft with a COLUMN bit count needs the SQL form (the
            # Python helper only accepts a literal numBits)
            F.sum(
                F.expr(
                    f"CASE WHEN gray * {n_px} > total THEN "
                    "shiftleft(CAST(1 AS BIGINT), CAST(pos AS INT)) "
                    "ELSE CAST(0 AS BIGINT) END"
                )
            ).alias("ah")
        )
    )
    from .dedup import blocked_hamming_pairs

    h = hashed.select(
        F.col("media_id").alias("id"), F.col("ah").alias("h")
    ).filter(F.col("h") != 0)
    return blocked_hamming_pairs(h, n_blocks, block_bits, max_hamming)
