"""datetimeoffset offset preservation (reference
mssql_dataframe/core/conversion.py:528-588 write, :685-837 read):
the original ±HH:MM survives the round trip via the engine-managed
companion ``__tz`` column, and ``render`` reconstructs the reference's
``YYYY-MM-DD HH:MM:SS.fffffff ±HH:MM`` string."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark.core import datetimeoffset as dto


def _make(engine):
    engine.create.table(
        "dbo.dto1", {"id": "bigint", "ts": "datetimeoffset"},
        primary_key_column="id",
    )


def test_string_offsets_roundtrip(engine, spark):
    _make(engine)
    src = spark.createDataFrame(
        [
            Row(id=1, ts="2021-06-01 12:30:45.123456+05:30"),
            Row(id=2, ts="2021-06-01 12:30:45-08:00"),
            Row(id=3, ts="2021-06-01 12:30:45"),          # naive -> UTC
            Row(id=4, ts="2021-06-01 12:30:45Z"),          # Z -> UTC
            Row(id=5, ts=None),
        ]
    )
    engine.write.insert("dbo.dto1", src)
    out = {
        r.id: r
        for r in engine.read.table(
            "dbo.dto1", include_tz_offsets=True
        ).collect()
    }
    assert out[1].ts__tz == 330 and out[2].ts__tz == -480
    assert out[3].ts__tz == 0 and out[4].ts__tz == 0
    assert out[5].ts__tz is None and out[5].ts is None
    # instants are absolute: +05:30 local 12:30 == 07:00 UTC
    assert out[1].ts == datetime.datetime(2021, 6, 1, 7, 0, 45, 123456)
    assert out[2].ts == datetime.datetime(2021, 6, 1, 20, 30, 45)

    rendered = {
        r.id: r.txt
        for r in engine.read.table("dbo.dto1", include_tz_offsets=True)
        .select("id", dto.render(F.col("ts"), F.col("ts__tz")).alias("txt"))
        .collect()
    }
    assert rendered[1] == "2021-06-01 12:30:45.1234560 +05:30"
    assert rendered[2] == "2021-06-01 12:30:45.0000000 -08:00"
    assert rendered[3] == "2021-06-01 12:30:45.0000000 +00:00"
    assert rendered[5] is None


def test_naive_timestamp_assumed_utc(engine, spark):
    _make(engine)
    src = spark.createDataFrame(
        [Row(id=1, ts=datetime.datetime(2021, 1, 2, 3, 4, 5))]
    )
    engine.write.insert("dbo.dto1", src)
    row = engine.read.table("dbo.dto1", include_tz_offsets=True).collect()[0]
    assert row.ts__tz == 0
    assert row.ts == datetime.datetime(2021, 1, 2, 3, 4, 5)


def test_companion_hidden_by_default(engine, spark):
    _make(engine)
    engine.write.insert(
        "dbo.dto1",
        spark.createDataFrame([Row(id=1, ts="2021-01-01 00:00:00+02:00")]),
    )
    assert engine.read.table("dbo.dto1").columns == ["id", "ts"]
    schema = engine.get_schema("dbo.dto1")
    assert list(schema.index) == ["id", "ts"]
    # explicit projection can still reach the companion
    got = engine.read.table("dbo.dto1", column_names=["ts__tz"]).collect()[0]
    assert got.ts__tz == 120


def test_explicit_companion_wins(engine, spark):
    """A caller-supplied offset column is passed through untouched."""
    _make(engine)
    src = spark.createDataFrame(
        [Row(id=1, ts=datetime.datetime(2021, 1, 1, 12, 0, 0), ts__tz=-300)]
    )
    engine.write.insert("dbo.dto1", src)
    row = engine.read.table("dbo.dto1", include_tz_offsets=True).collect()[0]
    assert row.ts__tz == -300


def test_update_merge_preserve_offsets(engine, spark):
    _make(engine)
    engine.write.insert(
        "dbo.dto1",
        spark.createDataFrame(
            [
                Row(id=1, ts="2021-01-01 10:00:00+01:00"),
                Row(id=2, ts="2021-01-01 10:00:00+02:00"),
            ]
        ),
    )
    # update id=1 with a new offset; merge-insert id=3
    engine.write.update(
        "dbo.dto1",
        spark.createDataFrame([Row(id=1, ts="2021-05-05 09:00:00-03:30")]),
    )
    engine.write.merge(
        "dbo.dto1",
        spark.createDataFrame([Row(id=3, ts="2021-07-07 01:00:00+10:00")]),
        match_columns=["id"],
        upsert=True,
    )
    out = {
        r.id: r.ts__tz
        for r in engine.read.table(
            "dbo.dto1", include_tz_offsets=True
        ).collect()
    }
    assert out == {1: -210, 3: 600, 2: 120}
