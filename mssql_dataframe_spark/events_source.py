"""Shared loader for the ``events`` table (batch and streaming).

The driver-generated ``events.parquet`` has shipped with two physical
``ts`` encodings over time: TIMESTAMP(NANOS) — which Spark's Parquet
reader only accepts as ``bigint`` via
``spark.sql.legacy.parquet.nanosAsLong`` — and plain ``timestamp[us]``
(TIMESTAMP_NTZ in Spark). Branching on the LOADED dtype instead of
assuming one encoding makes every consumer robust to either file
vintage; the nanos->us conversion is exact-bigint FLOOR division
because the ns epoch exceeds double mantissa precision (float division
would corrupt timestamps) and because DuckDB's ns->us cast floors —
plain ``div`` truncates toward zero and would disagree by 1 us on
every pre-epoch timestamp with sub-us residue.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Coerce the ``ts`` column to a microsecond timestamp.

    Branch on the loaded dtype: bigint means the file carried
    TIMESTAMP(NANOS) read via ``nanosAsLong`` — floor-divide to µs
    (yields TIMESTAMP). TIMESTAMP_NTZ is cast to TIMESTAMP — a
    value-preserving reinterpretation under the engine's fixed UTC
    session timezone (session.py), and required because streaming
    watermarks only accept TIMESTAMP event-time columns. Works on
    batch and streaming DataFrames alike (pure column expression).
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        # FLOOR division, in exact bigint arithmetic: `div` truncates
        # toward zero, so a pre-epoch -1500 ns would land on -1 us
        # while DuckDB's ns->us cast floors to -2 us; the % adjustment
        # (sign follows the dividend in Spark) restores floor. Double
        # floor(ts/1000.0) is NOT an option — current ns epochs
        # (~1.7e18) far exceed the 53-bit mantissa.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestamp_micros(ts div 1000"
                " - (case when ts % 1000 < 0 then 1 else 0 end))"
            ),
        )
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events.parquet`` with the file's own ``ts`` dtype (no
    normalization) — the schema source for streaming readers, which
    must declare the RAW schema and normalize per-row themselves."""
    path = os.path.join(sf_dir, "events.parquet")
    try:
        return spark.read.parquet(path)
    except Exception as exc:
        # TIMESTAMP(NANOS) vintage: schema inference rejects the file
        # ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,...))").
        # Only then enable nanosAsLong — and leave it set, because the
        # conf is consulted again when the lazy plan executes; µs-file
        # sessions never flip it, so an unrelated later read of genuine
        # nanos parquet still errors loudly instead of silently loading
        # bigints.
        if "NANOS" not in str(exc).upper():
            raise
        # Deliberately session-sticky, and LOUD about it: the conf is
        # consulted again when this lazy plan executes, so restoring it
        # here would break the returned frame. Blast radius in a
        # nanos-vintage session: any LATER read of a different
        # TIMESTAMP(NANOS) parquet loads ts as bigint instead of
        # erroring — normalize such frames through normalize_event_ts
        # (which branches on the loaded dtype) like every consumer in
        # this package does.
        import logging

        logging.getLogger("mssql_dataframe_spark").warning(
            "events.parquet is TIMESTAMP(NANOS)-vintage: enabling "
            "spark.sql.legacy.parquet.nanosAsLong for this session — "
            "later nanos-parquet reads will load as bigint; pass them "
            "through events_source.normalize_event_ts"
        )
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-load ``events.parquet`` with dtype-robust ``ts``."""
    return normalize_event_ts(load_events_raw(spark, sf_dir))
