"""Empty-table and degenerate-input edges for the session's verbs:
the paths a production engine hits on day one (empty snapshots,
no-op deletes, stats on empty tables, views over empty bases)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors


def _empty(engine):
    engine.create.table(
        "dbo.empty", {"id": "bigint", "v": "int"}, primary_key_column="id"
    )


def test_delete_where_on_empty_table(engine, spark):
    _empty(engine)
    assert engine.write.delete_where("dbo.empty", "v > 0") == 0
    assert engine.store.meta("dbo.empty").version == 0  # no commit


def test_table_stats_on_empty_table(engine, spark):
    _empty(engine)
    rows = engine.read.table_stats("dbo.empty", ["id"]).collect()
    assert rows[0]["n_rows"] == 0
    assert rows[0]["min"] is None and rows[0]["max"] is None


def test_view_over_empty_base(engine, spark):
    _empty(engine)
    engine.create.view("dbo.v_empty", "dbo.empty", where="v > 0")
    assert engine.read.view("dbo.v_empty").count() == 0


def test_masks_and_filters_on_empty_table(engine, spark):
    _empty(engine)
    engine.modify.masking_policy("dbo.empty", "add", "v", "default()")
    engine.modify.row_filter_policy("dbo.empty", "add", "pos", "v > 0")
    assert engine.read.table("dbo.empty").count() == 0


def test_computed_column_add_on_empty_then_insert(engine, spark):
    _empty(engine)
    engine.modify.computed_column("dbo.empty", "add", "v2", "v * 2", "int")
    engine.write.insert(
        "dbo.empty",
        spark.createDataFrame([Row(id=1, v=3)], "id long, v int"),
    )
    assert engine.read.table("dbo.empty").collect()[0]["v2"] == 6


def test_rename_empty_table_and_column(engine, spark):
    _empty(engine)
    engine.modify.rename_column("dbo.empty", "v", "val")
    engine.modify.rename_table("dbo.empty", "dbo.empty2")
    assert engine.read.table("dbo.empty2").columns == ["id", "val"]


def test_fk_add_on_empty_child(engine, spark):
    _empty(engine)
    engine.create.table(
        "dbo.par2", {"pk": "bigint"}, primary_key_column="pk"
    )
    engine.modify.foreign_key(
        "dbo.empty", "add", "fk0",
        columns="id", ref_table="dbo.par2", ref_columns="pk",
    )  # audit over zero rows passes


def test_export_import_empty_table(engine, spark, tmp_path):
    _empty(engine)
    out = str(tmp_path / "exp")
    assert engine.store.export_table("dbo.empty", out) == 0
    assert engine.store.import_table("dbo.empty_in", out) == 0
    assert engine.read.table("dbo.empty_in").count() == 0
