"""Stored views (create.view / read.view — SQL Server CREATE VIEW
analog): metadata-only read specs, CREATE-time validation, mask
composition, caller narrowing on view columns only."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors


def _mk(engine, spark):
    engine.create.table(
        "dbo.base",
        {"id": "bigint", "seg": "varchar(10)", "bal": "float",
         "secret": "nvarchar(20)"},
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.base",
        spark.createDataFrame(
            [Row(id=1, seg="A", bal=10.0, secret="s1"),
             Row(id=2, seg="B", bal=20.0, secret="s2"),
             Row(id=3, seg="A", bal=30.0, secret="s3")],
            "id long, seg string, bal double, secret string",
        ),
    )


def test_view_filters_base_then_projects(engine, spark):
    _mk(engine, spark)
    # where references seg, which the view does NOT expose
    engine.create.view(
        "dbo.v_a", "dbo.base", column_names=["id", "bal"], where="seg = 'A'"
    )
    rows = sorted(map(tuple, engine.read.view("dbo.v_a").collect()))
    assert rows == [(1, 10.0), (3, 30.0)]
    assert engine.read.view("dbo.v_a").columns == ["id", "bal"]
    narrowed = engine.read.view("dbo.v_a", where="bal > 15").collect()
    assert [r["id"] for r in narrowed] == [3]


def test_view_composes_with_masking(engine, spark):
    _mk(engine, spark)
    engine.modify.masking_policy("dbo.base", "add", "secret", "default()")
    engine.create.view(
        "dbo.v_s", "dbo.base", column_names=["id", "secret"]
    )
    got = {r["id"]: r["secret"] for r in engine.read.view("dbo.v_s").collect()}
    assert got == {1: "xxxx", 2: "xxxx", 3: "xxxx"}
    raw = {r["id"]: r["secret"]
           for r in engine.read.view("dbo.v_s", unmask=True).collect()}
    assert raw[1] == "s1"


def test_create_time_validation_and_drop(engine, spark):
    _mk(engine, spark)
    with pytest.raises(errors.SQLTableDoesNotExist):
        engine.create.view("dbo.v_x", "dbo.ghost")
    with pytest.raises(errors.SQLColumnDoesNotExist):
        engine.create.view("dbo.v_x", "dbo.base", column_names=["nope"])
    with pytest.raises((errors.SQLInvalidSyntax, ValueError)):
        engine.create.view("dbo.v_x", "dbo.base", where="id LIKE 'x%'")
    engine.create.view("dbo.v_ok", "dbo.base")
    with pytest.raises(ValueError, match="already exists"):
        engine.create.view("dbo.v_ok", "dbo.base")
    with pytest.raises(ValueError, match="already exists as a table"):
        engine.create.view("dbo.base", "dbo.base")
    engine.create.drop_view("dbo.v_ok")
    with pytest.raises(errors.SQLTableDoesNotExist):
        engine.read.view("dbo.v_ok")
