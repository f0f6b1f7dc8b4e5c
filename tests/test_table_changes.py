"""CDC ``read.table_changes`` between retained snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark import errors

COLS = {"id": "bigint", "name": "nvarchar(50)", "val": "int"}


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, name=n, val=v) for i, n, v in rows],
        "id long, name string, val int",
    )


def _setup(engine, spark):
    engine.create.table("dbo.cdc", COLS, primary_key_column="id")
    engine.write.insert(
        "dbo.cdc", _df(spark, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    )
    # create=v0 (empty), insert=v1 — CDC baselines at the loaded state
    return engine.store.meta("dbo.cdc").version


def test_insert_update_delete_classified(engine, spark):
    v_ins = _setup(engine, spark)
    engine.write.merge(
        "dbo.cdc",
        _df(spark, [(1, "a", 99), (4, "d", 40)]),
        match_columns=["id"],
    )  # updates 1, inserts 4, deletes 2 and 3
    out = {
        r.id: r
        for r in engine.read.table_changes("dbo.cdc", from_version=v_ins).collect()
    }
    assert out[1].change_type == "update"
    assert (out[1].old_val, out[1].new_val) == (10, 99)
    assert out[4].change_type == "insert"
    assert out[4].old_name is None and out[4].new_name == "d"
    assert out[2].change_type == "delete"
    assert out[2].old_val == 20 and out[2].new_val is None
    assert out[3].change_type == "delete"


def test_unchanged_rows_omitted(engine, spark):
    v_ins = _setup(engine, spark)
    engine.write.update("dbo.cdc", _df(spark, [(1, "a", 99)]))
    out = engine.read.table_changes("dbo.cdc", from_version=v_ins).collect()
    assert {r.id for r in out} == {1}


def test_null_transition_is_update(engine, spark):
    v_ins = _setup(engine, spark)
    engine.write.update(
        "dbo.cdc",
        spark.createDataFrame(
            [Row(id=2, name="b", val=None)], "id long, name string, val int"
        ),
    )
    out = {r.id: r for r in engine.read.table_changes("dbo.cdc", v_ins).collect()}
    assert out[2].change_type == "update"
    assert out[2].old_val == 20 and out[2].new_val is None


def test_version_range_and_key_validation(engine, spark):
    v_ins = _setup(engine, spark)
    engine.write.update("dbo.cdc", _df(spark, [(1, "a", 11)]))
    engine.write.update("dbo.cdc", _df(spark, [(1, "a", 12)]))
    mid = engine.read.table_changes(
        "dbo.cdc", from_version=v_ins + 1, to_version=v_ins + 2
    )
    assert [(r.old_val, r.new_val) for r in mid.collect()] == [(11, 12)]
    with pytest.raises(errors.SQLColumnDoesNotExist):
        engine.read.table_changes("dbo.cdc", 0, match_columns=["nope"])
