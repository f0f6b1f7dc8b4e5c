"""distributed_window: the two-pass range-partitioned replacements for
unpartitioned global windows must be bit-identical to the global
window they replace, and finalize() must release every pinned cache
(the caches exist only to keep spark_partition_id stable between the
offsets job and the main job)."""

from __future__ import annotations

import decimal

from pyspark.sql import Row, functions as F
from pyspark.sql.window import Window

from mssql_dataframe_spark.operators import distributed_window as DW


def _frame(spark):
    rows = [Row(k=i, v=decimal.Decimal(str((i * 37) % 100)) / 4) for i in range(500)]
    return spark.createDataFrame(rows, "k int, v decimal(10,2)").repartition(8)


def test_global_row_number_matches_global_window(spark):
    df = _frame(spark)
    pins = []
    got, total = DW.global_row_number(
        df, [F.col("v").desc(), F.col("k")], out="rn", pins=pins
    )
    got = DW.finalize(got, pins)
    assert total == 500
    want = df.withColumn(
        "rn",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), F.col("k")))
        .cast("bigint"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_global_cumsum_matches_global_window_decimal_exact(spark):
    df = _frame(spark)
    pins = []
    got, grand = DW.global_cumsum(
        df, [F.col("v").desc(), F.col("k")], "v", out="cum", pins=pins
    )
    got = DW.finalize(got, pins)
    w = (
        Window.orderBy(F.col("v").desc(), F.col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert isinstance(grand, decimal.Decimal)
    assert grand == sum((r.v for r in df.collect()), decimal.Decimal(0))


def test_finalize_releases_all_pins(spark):
    df = _frame(spark)
    pins = []
    got, _ = DW.global_row_number(df, [F.col("k")], out="rn", pins=pins)
    got, _ = DW.global_row_number(got, [F.col("v"), F.col("k")], out="rn2", pins=pins)
    held = list(pins)
    assert len(held) == 2
    assert all(p.storageLevel.useMemory for p in held)  # pinned while building
    out = DW.finalize(got, pins)
    assert pins == []  # scoped list drained
    assert all(not p.storageLevel.useMemory for p in held)  # caches released
    assert out.count() == 500  # result survives the release


def test_release_all_drains_session_pins(spark):
    df = _frame(spark)
    got, _ = DW.global_row_number(df, [F.col("k")], out="rn")  # no pins arg
    assert got.count() == 500
    assert DW.release_all() >= 1
    assert DW.release_all() == 0
