"""Row-Level Security (modify.row_filter_policy — SQL Server security
policy FILTER PREDICATE analog): silent read-time filtering, policy
ANDing, bypass, composition with masking and views."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


def _mk(engine, spark):
    engine.create.table(
        "dbo.rls",
        {"id": "bigint", "region": "varchar(10)", "bal": "float"},
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.rls",
        spark.createDataFrame(
            [Row(id=1, region="EU", bal=10.0),
             Row(id=2, region="US", bal=20.0),
             Row(id=3, region="EU", bal=30.0)],
            "id long, region string, bal double",
        ),
    )


def test_filters_apply_silently_and_AND_together(engine, spark):
    _mk(engine, spark)
    engine.modify.row_filter_policy("dbo.rls", "add", "eu", "region = 'EU'")
    assert {r["id"] for r in engine.read.table("dbo.rls").collect()} == {1, 3}
    engine.modify.row_filter_policy("dbo.rls", "add", "rich", "bal > 15")
    assert {r["id"] for r in engine.read.table("dbo.rls").collect()} == {3}
    # caller where composes on top
    assert engine.read.table("dbo.rls", where="id < 3").count() == 0


def test_bypass_and_pre_projection_semantics(engine, spark):
    _mk(engine, spark)
    engine.modify.row_filter_policy("dbo.rls", "add", "eu", "region = 'EU'")
    assert engine.read.table("dbo.rls", bypass_row_filters=True).count() == 3
    # predicate references region even when the projection drops it
    out = engine.read.table("dbo.rls", column_names=["id", "bal"])
    assert {r["id"] for r in out.collect()} == {1, 3}
    assert "region" not in out.columns


def test_composes_with_masking_and_views(engine, spark):
    _mk(engine, spark)
    engine.modify.row_filter_policy("dbo.rls", "add", "eu", "region = 'EU'")
    engine.modify.masking_policy("dbo.rls", "add", "bal", "default()")
    rows = {r["id"]: r["bal"] for r in engine.read.table("dbo.rls").collect()}
    assert rows == {1: 0.0, 3: 0.0}  # filtered AND masked
    engine.create.view("dbo.v_rls", "dbo.rls", column_names=["id", "bal"])
    vrows = {r["id"]: r["bal"] for r in engine.read.view("dbo.v_rls").collect()}
    assert vrows == {1: 0.0, 3: 0.0}


def test_validation_and_drop(engine, spark):
    _mk(engine, spark)
    from mssql_dataframe_spark import errors

    with pytest.raises((errors.SQLInvalidSyntax, ValueError)):
        engine.modify.row_filter_policy(
            "dbo.rls", "add", "bad", "region LIKE 'E%'"
        )
    engine.modify.row_filter_policy("dbo.rls", "add", "eu", "region = 'EU'")
    with pytest.raises(ValueError, match="already exists"):
        engine.modify.row_filter_policy("dbo.rls", "add", "eu", "bal > 0")
    engine.modify.row_filter_policy("dbo.rls", "drop", "eu")
    assert engine.read.table("dbo.rls").count() == 3
