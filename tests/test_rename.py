"""sp_rename analogs: rename_column (COW rewrite with bookkeeping
follow + dependency blocking) and rename_table (metadata move,
blocked by FK/view references)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors


def _mk(engine, spark):
    engine.create.table(
        "dbo.rn", {"id": "bigint", "v": "int"}, primary_key_column="id"
    )
    engine.write.insert(
        "dbo.rn",
        spark.createDataFrame([Row(id=1, v=10), Row(id=2, v=20)],
                              "id long, v int"),
    )


def test_rename_column_rewrites_and_follows_pk(engine, spark):
    _mk(engine, spark)
    engine.modify.rename_column("dbo.rn", "id", "row_id")
    df = engine.read.table("dbo.rn")
    assert df.columns == ["row_id", "v"]
    assert {r["row_id"] for r in df.collect()} == {1, 2}
    meta = engine.store.meta("dbo.rn")
    assert meta.primary_key == ["row_id"]
    assert "row_id" in meta.column_types and "id" not in meta.column_types
    # pruned writes still work against the renamed key
    engine.write.update(
        "dbo.rn",
        spark.createDataFrame([Row(row_id=1, v=99)], "row_id long, v int"),
    )
    got = {r["row_id"]: r["v"] for r in engine.read.table("dbo.rn").collect()}
    assert got[1] == 99


def test_rename_column_blocked_by_dependents(engine, spark):
    _mk(engine, spark)
    engine.modify.check_constraint("dbo.rn", "add", "v_pos", "v > 0")
    with pytest.raises(ValueError, match="check constraint"):
        engine.modify.rename_column("dbo.rn", "v", "val")
    with pytest.raises(errors.SQLColumnDoesNotExist):
        engine.modify.rename_column("dbo.rn", "ghost", "g2")
    with pytest.raises(ValueError, match="already exists"):
        engine.modify.rename_column("dbo.rn", "v", "id")


def test_rename_table_moves_metadata_only(engine, spark):
    _mk(engine, spark)
    v = engine.store.meta("dbo.rn").version
    engine.modify.rename_table("dbo.rn", "dbo.rn2")
    assert engine.read.table("dbo.rn2").count() == 2
    assert engine.store.meta("dbo.rn2").version == v  # no data commit
    with pytest.raises(errors.SQLTableDoesNotExist):
        engine.read.table("dbo.rn")


def test_rename_table_blocked_by_references(engine, spark):
    _mk(engine, spark)
    engine.create.table(
        "dbo.child", {"cid": "bigint", "ref": "bigint"},
        primary_key_column="cid",
    )
    engine.modify.foreign_key(
        "dbo.child", "add", "fk_rn",
        columns="ref", ref_table="dbo.rn", ref_columns="id",
    )
    with pytest.raises(ValueError, match="foreign key"):
        engine.modify.rename_table("dbo.rn", "dbo.rnX")
    engine.modify.foreign_key("dbo.child", "drop", "fk_rn")
    engine.create.view("dbo.v_rn", "dbo.rn")
    with pytest.raises(ValueError, match="view"):
        engine.modify.rename_table("dbo.rn", "dbo.rnX")


def test_rename_column_keeps_pruning_stats_live(engine, spark):
    _mk(engine, spark)
    engine.modify.rename_column("dbo.rn", "id", "row_id")
    meta = engine.store.meta("dbo.rn")
    entries = engine.store.manifest("dbo.rn", meta.version)
    assert entries and all(e["stats_col"] == "row_id" for e in entries)
    assert all(e["min"] is not None for e in entries)


def test_rename_column_blocked_by_row_filters_and_views(engine, spark):
    _mk(engine, spark)
    engine.modify.row_filter_policy("dbo.rn", "add", "pos", "v > 0")
    with pytest.raises(ValueError, match="row filter"):
        engine.modify.rename_column("dbo.rn", "v", "val")
    engine.modify.row_filter_policy("dbo.rn", "drop", "pos")
    engine.create.view("dbo.v_dep", "dbo.rn", column_names=["id", "v"])
    with pytest.raises(ValueError, match="view"):
        engine.modify.rename_column("dbo.rn", "v", "val")
    engine.create.drop_view("dbo.v_dep")
    engine.modify.rename_column("dbo.rn", "v", "val")  # now clean
    assert "val" in engine.read.table("dbo.rn").columns


def test_column_drop_blocked_by_dependents_too(engine, spark):
    _mk(engine, spark)
    engine.modify.row_filter_policy("dbo.rn", "add", "pos", "v > 0")
    with pytest.raises(ValueError, match="row filter"):
        engine.modify.column("dbo.rn", "drop", "v")
    engine.modify.row_filter_policy("dbo.rn", "drop", "pos")
    engine.modify.column("dbo.rn", "drop", "v")
    assert engine.read.table("dbo.rn").columns == ["id"]
