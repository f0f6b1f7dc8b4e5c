"""The all-types boundary matrix (reference: tests/test_suppoted_types.py
:36-129, extremes at 94-105): one table with every supported SQL type,
rows carrying each type's boundary min/max pulled from the rules table
itself plus an all-NULL row, round-tripped through insert -> read, then
update and merge on the same table. This is the reference's flagship
correctness artifact, reproduced on the Spark engine."""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark.conversion_rules import RULES

ALL_COLS = {
    "pk": "bigint",
    "c_bit": "bit",
    "c_tinyint": "tinyint",
    "c_smallint": "smallint",
    "c_int": "int",
    "c_bigint": "bigint",
    "c_float": "float",
    "c_numeric": "numeric(18,4)",
    "c_decimal": "decimal(10,2)",
    "c_time": "time",
    "c_date": "date",
    "c_datetime": "datetime",
    "c_datetime2": "datetime2",
    "c_datetimeoffset": "datetimeoffset",
    "c_char": "char(10)",
    "c_varchar": "varchar(100)",
    "c_nchar": "nchar(10)",
    "c_nvarchar": "nvarchar(100)",
    "c_binary": "binary(8)",
    "c_varbinary": "varbinary(16)",
    "c_real": "real",
    "c_money": "money",
    "c_smallmoney": "smallmoney",
    "c_smalldatetime": "smalldatetime",
    "c_uniqueidentifier": "uniqueidentifier",
}


def _boundary_rows():
    """min-boundary, max-boundary, and all-NULL rows.

    Date/time minimums are clipped to values Spark's Python<->Catalyst
    converters accept; the rule bounds themselves are asserted
    separately in the validation tests.
    """
    r = RULES
    min_row = dict(
        pk=1,
        c_bit=False,
        c_tinyint=int(r["tinyint"].min_value),
        c_smallint=int(r["smallint"].min_value),
        c_int=int(r["int"].min_value),
        c_bigint=int(r["bigint"].min_value),
        c_float=-1.79e308,
        c_numeric=decimal.Decimal("-99999999999999.9999"),
        c_decimal=decimal.Decimal("-99999999.99"),
        c_time=datetime.timedelta(0),
        c_date=datetime.date(1, 1, 2),
        c_datetime=datetime.datetime(1753, 1, 1),
        c_datetime2=datetime.datetime(1, 1, 1),
        c_datetimeoffset=datetime.datetime(
            1, 1, 2, tzinfo=datetime.timezone.utc
        ),
        c_char="a",
        c_varchar="",
        c_nchar="ñ",
        c_nvarchar="",
        # binary(8) zero-pads to declared size on write (reference:
        # conversion.py:611-620) — the round-tripped value is padded
        c_binary=b"\x00" * 8,
        c_varbinary=b"",
        c_real=-(2.0 ** 127),  # exactly representable in float32
        c_money=decimal.Decimal("-922337203685477.5808"),
        c_smallmoney=decimal.Decimal("-214748.3648"),
        c_smalldatetime=datetime.datetime(1900, 1, 1),
        c_uniqueidentifier="00000000-0000-0000-0000-000000000000",
    )
    max_row = dict(
        pk=2,
        c_bit=True,
        c_tinyint=int(r["tinyint"].max_value),
        c_smallint=int(r["smallint"].max_value),
        c_int=int(r["int"].max_value),
        c_bigint=int(r["bigint"].max_value),
        c_float=1.79e308,
        c_numeric=decimal.Decimal("99999999999999.9999"),
        c_decimal=decimal.Decimal("99999999.99"),
        c_time=datetime.timedelta(
            hours=23, minutes=59, seconds=59, microseconds=999999
        ),
        c_date=datetime.date(9999, 12, 31),
        # DATETIME max is .997 (the 3.33 ms grid's last slot; .999999
        # would round past the type's maximum, as on SQL Server)
        c_datetime=datetime.datetime(9999, 12, 31, 23, 59, 59, 997000),
        c_datetime2=datetime.datetime(9999, 12, 31, 23, 59, 59, 999999),
        c_datetimeoffset=datetime.datetime(
            9999, 12, 30, 23, 59, 59, 999999, tzinfo=datetime.timezone.utc
        ),
        c_char="0123456789",
        c_varchar="x" * 100,
        c_nchar="ünïcødé-ok",
        c_nvarchar="日本語テキスト",
        c_binary=b"\x01\x02\x03\x04\x05\x06\x07\x08",
        c_varbinary=b"\xff" * 16,
        c_real=2.0 ** 127,
        c_money=decimal.Decimal("922337203685477.5807"),
        c_smallmoney=decimal.Decimal("214748.3647"),
        # .997 grid slot analog: max minute slot the round can't exceed
        c_smalldatetime=datetime.datetime(2079, 6, 6, 23, 59),
        c_uniqueidentifier="FFFFFFFF-FFFF-FFFF-FFFF-FFFFFFFFFFFF",
    )
    null_row = {k: (3 if k == "pk" else None) for k in min_row}
    return [min_row, max_row, null_row]


def _make_df(spark):
    rows = _boundary_rows()
    from mssql_dataframe_spark.conversion_rules import parse_column_spec
    from pyspark.sql import types as T

    fields = [
        T.StructField(name, parse_column_spec(spec).spark_type, True)
        for name, spec in ALL_COLS.items()
    ]
    return spark.createDataFrame(
        [Row(**row) for row in rows], T.StructType(fields)
    )


def test_all_types_insert_read_roundtrip(engine, spark):
    engine.create.table("dbo.alltypes", ALL_COLS, primary_key_column="pk")
    df = _make_df(spark)
    engine.write.insert("dbo.alltypes", df)
    out = {r["pk"]: r.asDict() for r in engine.read.table("dbo.alltypes").collect()}
    want = {r["pk"]: r for r in _boundary_rows()}
    assert set(out) == {1, 2, 3}
    for pk in (1, 2, 3):
        for col, expected in want[pk].items():
            got = out[pk][col]
            if isinstance(expected, datetime.datetime) and expected.tzinfo:
                # collect() returns session-local (UTC) naive datetimes
                expected = expected.replace(tzinfo=None)
            assert got == expected, f"pk={pk} col={col}: got {got!r} want {expected!r}"


def test_all_types_update(engine, spark):
    engine.create.table("dbo.alltypes_u", ALL_COLS, primary_key_column="pk")
    engine.write.insert("dbo.alltypes_u", _make_df(spark))
    upd = spark.createDataFrame(
        [Row(pk=1, c_nvarchar="updated", c_int=42)],
        "pk bigint, c_nvarchar string, c_int int",
    )
    engine.write.update("dbo.alltypes_u", upd)
    out = {r["pk"]: r for r in engine.read.table("dbo.alltypes_u").collect()}
    assert out[1]["c_nvarchar"] == "updated" and out[1]["c_int"] == 42
    # untouched columns survive the rewrite (binary(8) stays padded)
    assert out[1]["c_binary"] == b"\x00" * 8
    assert out[2]["c_nvarchar"] == "日本語テキスト"


def test_all_types_merge(engine, spark):
    engine.create.table("dbo.alltypes_m", ALL_COLS, primary_key_column="pk")
    engine.write.insert("dbo.alltypes_m", _make_df(spark))
    rows = _boundary_rows()
    merged = dict(rows[1])  # pk=2 updated
    merged["c_varchar"] = "merged"
    new = dict(rows[0])  # new pk=9 inserted
    new["pk"] = 9
    src = _make_df(spark).sparkSession.createDataFrame(
        [Row(**merged), Row(**new)], _make_df(spark).schema
    )
    engine.write.merge("dbo.alltypes_m", src)  # delete-by-source on
    out = {r["pk"]: r for r in engine.read.table("dbo.alltypes_m").collect()}
    assert set(out) == {2, 9}  # pk 1 and 3 deleted (not in source)
    assert out[2]["c_varchar"] == "merged"
    assert out[9]["c_tinyint"] == 0
