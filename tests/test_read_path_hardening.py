"""Read-path contract hardening (round-10 review findings on
core/read.py / core/schema.py / session.py): documented error classes
instead of raw KeyErrors, time-travel's current-schema projection,
CDC across schema evolution, live spark.sql views, and the
datetimeoffset companion projection."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors


def test_get_schema_unknown_dataframe_column_raises_documented(engine, spark):
    engine.create.table(
        "dbo.gs1", {"id": "bigint", "v": "int"}, primary_key_column="id"
    )
    bad = spark.createDataFrame(
        [Row(id=1, v=2, extra=3)], "id long, v int, extra int"
    )
    with pytest.raises(errors.DataframeColumnDoesNotExist):
        engine.get_schema("dbo.gs1", bad)


def test_information_schema_survives_dangling_view(engine, spark):
    engine.create.table(
        "dbo.src1", {"id": "bigint", "v": "int"}, primary_key_column="id"
    )
    engine.create.table(
        "dbo.keep", {"id": "bigint"}, primary_key_column="id"
    )
    engine.create.view("dbo.v_dangling", "dbo.src1", column_names=["v"])
    engine.store.drop("dbo.src1")  # drop does not cascade to views
    rows = engine.read.information_schema().collect()
    objs = {r.object_name for r in rows}
    assert "dbo.keep" in objs  # catalog listing still usable
    dangling = [r for r in rows if r.object_name == "dbo.v_dangling"]
    assert dangling and dangling[0].sql_type is None


def test_include_tz_offsets_survives_column_projection(engine, spark):
    engine.create.table(
        "dbo.dtop", {"id": "bigint", "ts": "datetimeoffset"},
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.dtop",
        spark.createDataFrame([Row(id=1, ts="2021-06-01 12:30:45+05:30")]),
    )
    out = engine.read.table(
        "dbo.dtop", column_names=["ts"], include_tz_offsets=True
    )
    assert "ts__tz" in out.columns
    assert out.collect()[0].ts__tz == 330


def test_view_limit_type_validated(engine, spark):
    engine.create.table(
        "dbo.vl", {"id": "bigint"}, primary_key_column="id"
    )
    engine.create.view("dbo.v_vl", "dbo.vl")
    with pytest.raises(ValueError, match="limit must be an integer"):
        engine.read.view("dbo.v_vl", limit="5")


def test_time_travel_projects_through_current_schema(engine, spark):
    engine.create.table(
        "dbo.tt_evo", {"id": "bigint", "a": "int"}, primary_key_column="id"
    )
    engine.write.insert(
        "dbo.tt_evo", spark.createDataFrame([Row(id=1, a=10)])
    )
    v_before = engine.store.meta("dbo.tt_evo").version
    engine.modify.column("dbo.tt_evo", "add", "b", "int")
    # column added since the snapshot reads as NULL — including when
    # explicitly requested — instead of SQLColumnDoesNotExist
    old = engine.read.table("dbo.tt_evo", version=v_before)
    assert "b" in old.columns
    assert old.collect()[0].b is None
    proj = engine.read.table(
        "dbo.tt_evo", version=v_before, column_names=["b"]
    )
    assert proj.collect()[0].b is None


def test_time_travel_with_current_row_filter_on_new_column(engine, spark):
    engine.create.table(
        "dbo.tt_rf", {"id": "bigint", "a": "int"}, primary_key_column="id"
    )
    engine.write.insert(
        "dbo.tt_rf", spark.createDataFrame([Row(id=1, a=10)])
    )
    v_before = engine.store.meta("dbo.tt_rf").version
    engine.modify.column("dbo.tt_rf", "add", "b", "int")
    engine.modify.row_filter_policy("dbo.tt_rf", "add", "p1", "b IS NULL")
    # a current policy on the since-added column must stay analyzable
    # against the old snapshot (b reads as NULL there)
    assert engine.read.table(
        "dbo.tt_rf", version=v_before
    ).count() == 1


def test_table_changes_sees_added_column(engine, spark):
    engine.create.table(
        "dbo.cdc_evo", {"id": "bigint", "a": "int"},
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.cdc_evo", spark.createDataFrame([Row(id=1, a=10)])
    )
    v_ins = engine.store.meta("dbo.cdc_evo").version
    engine.modify.column("dbo.cdc_evo", "add", "b", "int")
    engine.write.update(
        "dbo.cdc_evo",
        spark.createDataFrame([Row(id=1, b=7)], "id long, b int"),
    )
    out = engine.read.table_changes("dbo.cdc_evo", v_ins).collect()
    # the only difference is in the since-added column: it must be
    # CDC-visible (old_b NULL -> new_b 7), not silently invisible
    assert len(out) == 1
    r = out[0]
    assert r.change_type == "update"
    assert r.old_b is None and r.new_b == 7
    assert r.old_a == 10 and r.new_a == 10


def test_table_changes_hides_tz_companions(engine, spark):
    engine.create.table(
        "dbo.cdc_dto", {"id": "bigint", "ts": "datetimeoffset"},
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.cdc_dto",
        spark.createDataFrame([Row(id=1, ts="2021-06-01 12:00:00+02:00")]),
    )
    v_ins = engine.store.meta("dbo.cdc_dto").version
    engine.write.update(
        "dbo.cdc_dto",
        spark.createDataFrame([Row(id=1, ts="2021-06-02 12:00:00+02:00")]),
    )
    df = engine.read.table_changes("dbo.cdc_dto", v_ins)
    assert not [c for c in df.columns if c.endswith("__tz")]
    assert df.collect()[0].change_type == "update"


def test_registered_view_is_live_across_writes(engine, spark):
    engine.create.table(
        "dbo.lv", {"id": "bigint", "v": "int"}, primary_key_column="id"
    )
    engine.write.insert(
        "dbo.lv", spark.createDataFrame([Row(id=1, v=10)])
    )
    name = engine.register_view("dbo.lv", "lv_live")
    assert spark.sql(f"select count(*) n from {name}").collect()[0].n == 1
    engine.write.insert(
        "dbo.lv", spark.createDataFrame([Row(id=2, v=20)])
    )
    # the view tracks the table — no stale frozen-file-list snapshot
    assert spark.sql(f"select count(*) n from {name}").collect()[0].n == 2
    engine.store.drop("dbo.lv")
    assert not spark.catalog.tableExists(name)


def test_where_and_order_on_non_projected_columns(engine, spark):
    """T-SQL semantics (r14 read-path review): the reference compiles
    `SELECT {cols} FROM t WHERE {w} ORDER BY {o}` (reference
    read.py:137-146), so WHERE and ORDER BY may reference columns the
    projection drops. Projection applies LAST."""
    engine.create.table(
        "dbo.wnp",
        {"id": "bigint", "a": "int", "b": "int"},
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.wnp",
        spark.createDataFrame(
            [Row(id=1, a=10, b=3), Row(id=2, a=20, b=1),
             Row(id=3, a=30, b=2), Row(id=4, a=5, b=4)]
        ),
    )
    out = engine.read.table(
        "dbo.wnp",
        column_names=["a"],          # b NOT projected
        where="b > 1",               # filters on b
        order_column="b",            # orders on b
        order_direction="DESC",
        limit=2,
    )
    assert out.columns == ["id", "a"]
    rows = out.collect()
    # b DESC over b>1 -> b=4 (id 4), b=3 (id 1); TOP(2)
    assert [r.id for r in rows] == [4, 1]
    assert [r.a for r in rows] == [5, 10]


def test_column_names_accepts_bare_string(engine, spark):
    """Reference read.py:89-90: a bare string means one column."""
    engine.create.table(
        "dbo.cstr", {"id": "bigint", "name": "nvarchar(10)"},
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.cstr", spark.createDataFrame([Row(id=1, name="x")])
    )
    out = engine.read.table("dbo.cstr", column_names="name")
    assert out.columns == ["id", "name"]
    assert out.collect()[0].name == "x"
