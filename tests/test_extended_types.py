"""Beyond-reference SQL Server types (real, money, smallmoney,
smalldatetime, uniqueidentifier): rounding grids, range enforcement,
GUID validation/normalization."""

from __future__ import annotations

import datetime
import decimal

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors


def _table(engine, cols):
    engine.create.table("dbo.xt", {"id": "bigint", **cols},
                        primary_key_column="id")


def test_money_rounds_to_four_places_with_warning(engine, spark, caplog):
    _table(engine, {"m": "money"})
    import logging

    with caplog.at_level(logging.WARNING, logger="mssql_dataframe_spark"):
        engine.write.insert(
            "dbo.xt",
            spark.createDataFrame([Row(id=1, m=decimal.Decimal("1.23456"))],
                                  "id long, m decimal(10,5)"),
        )
    assert any("rounded" in r.message for r in caplog.records)
    got = engine.read.table("dbo.xt").collect()[0]["m"]
    assert got == decimal.Decimal("1.2346")  # HALF_UP at scale 4


def test_smalldatetime_minute_rounding_contract(engine, spark):
    _table(engine, {"t": "smalldatetime"})
    engine.write.insert(
        "dbo.xt",
        spark.createDataFrame(
            [
                Row(id=1, t=datetime.datetime(2024, 5, 1, 10, 30, 29, 998000)),
                Row(id=2, t=datetime.datetime(2024, 5, 1, 10, 30, 29, 999000)),
                Row(id=3, t=datetime.datetime(2024, 5, 1, 10, 30, 30, 0)),
            ],
            "id long, t timestamp_ntz",
        ),
    )
    got = {r["id"]: r["t"] for r in engine.read.table("dbo.xt").collect()}
    assert got[1] == datetime.datetime(2024, 5, 1, 10, 30)   # .998 down
    assert got[2] == datetime.datetime(2024, 5, 1, 10, 31)   # .999 up
    assert got[3] == datetime.datetime(2024, 5, 1, 10, 31)


def test_smalldatetime_range_enforced(engine, spark):
    _table(engine, {"t": "smalldatetime"})
    with pytest.raises(errors.SQLInsufficientColumnSize):
        engine.write.insert(
            "dbo.xt",
            spark.createDataFrame(
                [Row(id=1, t=datetime.datetime(1899, 12, 31))],
                "id long, t timestamp_ntz",
            ),
        )


def test_uniqueidentifier_validates_and_normalizes(engine, spark):
    _table(engine, {"g": "uniqueidentifier"})
    engine.write.insert(
        "dbo.xt",
        spark.createDataFrame(
            [Row(id=1, g="a1b2c3d4-e5f6-7890-abcd-ef0123456789"),
             Row(id=2, g=None)],
            "id long, g string",
        ),
    )
    got = {r["id"]: r["g"] for r in engine.read.table("dbo.xt").collect()}
    assert got[1] == "A1B2C3D4-E5F6-7890-ABCD-EF0123456789"  # canonical upper
    assert got[2] is None
    with pytest.raises(errors.DataframeColumnInvalidValue):
        engine.write.insert(
            "dbo.xt",
            spark.createDataFrame([Row(id=3, g="not-a-guid")],
                                  "id long, g string"),
        )


def test_real_range_enforced(engine, spark):
    _table(engine, {"r": "real"})
    with pytest.raises(errors.SQLInsufficientColumnSize):
        engine.write.insert(
            "dbo.xt",
            spark.createDataFrame([Row(id=1, r=1e39)], "id long, r double"),
        )
