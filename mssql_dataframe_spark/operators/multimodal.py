"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container ships no image/audio codecs, so the decode kernels are
STUBBED behind ``NotImplementedError`` with a deterministic fake used
by tests — but the Spark-side plumbing is real: schemas, Arrow batch
shape (``mapInPandas``), partition sizing, and UDF signatures are
exactly what a production decode would use (swap ``_decode_stub`` for
PIL/torchaudio and nothing else changes).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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


def extract_features(
    media: DataFrame, use_stub: bool = True, batch_hint: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over media rows.

    ``mapInPandas`` streams Arrow record batches through Python once per
    partition — the correct shape for decode workloads (CPU-bound per
    row, no shuffle). Partition count should track cluster cores; the
    payload column is only materialized inside the batch iterator.
    """
    if not use_stub and not REAL_DECODERS_AVAILABLE:
        raise NotImplementedError("no real decoders in this environment")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k)
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
