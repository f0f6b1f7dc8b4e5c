"""FOREIGN KEY constraints (beyond-reference; warehouses usually
declare FKs NOT ENFORCED — this engine audits existing rows on ADD
with one keys-only anti join and enforces on every write). SQL MATCH
SIMPLE semantics: a row with any NULL FK column passes."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors


def _parent(spark):
    return spark.createDataFrame(
        [Row(pk=i, name=f"p{i}") for i in (1, 2, 3)], "pk long, name string"
    )


def _child(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, ref=r) for i, r in rows], "id long, ref long"
    )


def _mk(engine, spark, child_rows=((10, 1), (11, 2))):
    engine.create.table(
        "dbo.par", {"pk": "bigint", "name": "varchar(20)"},
        primary_key_column="pk",
    )
    engine.write.insert("dbo.par", _parent(spark))
    engine.create.table(
        "dbo.chi", {"id": "bigint", "ref": "bigint"}, primary_key_column="id"
    )
    engine.write.insert("dbo.chi", _child(spark, child_rows))


def test_add_audits_then_enforces_insert(engine, spark):
    _mk(engine, spark)
    engine.modify.foreign_key(
        "dbo.chi", "add", "fk_par",
        columns="ref", ref_table="dbo.par", ref_columns="pk",
    )
    engine.write.insert("dbo.chi", _child(spark, [(12, 3)]))  # valid
    with pytest.raises(errors.SQLForeignKeyViolation, match="fk_par"):
        engine.write.insert("dbo.chi", _child(spark, [(13, 99)]))
    # enforcement precedes the commit: the orphan batch left no trace
    assert engine.read.table("dbo.chi").count() == 3


def test_add_blocked_on_existing_orphans(engine, spark):
    _mk(engine, spark, child_rows=((10, 1), (11, 77)))  # 77 is an orphan
    with pytest.raises(errors.SQLForeignKeyViolation, match="fk_par"):
        engine.modify.foreign_key(
            "dbo.chi", "add", "fk_par",
            columns="ref", ref_table="dbo.par", ref_columns="pk",
        )


def test_null_fk_passes_match_simple(engine, spark):
    _mk(engine, spark)
    engine.modify.foreign_key(
        "dbo.chi", "add", "fk_par",
        columns="ref", ref_table="dbo.par", ref_columns="pk",
    )
    engine.write.insert("dbo.chi", _child(spark, [(14, None)]))
    assert engine.read.table("dbo.chi").count() == 3


def test_update_enforced_and_drop_releases(engine, spark):
    _mk(engine, spark)
    engine.modify.foreign_key(
        "dbo.chi", "add", "fk_par",
        columns="ref", ref_table="dbo.par", ref_columns="pk",
    )
    with pytest.raises(errors.SQLForeignKeyViolation):
        engine.write.update("dbo.chi", _child(spark, [(10, 55)]))
    engine.modify.foreign_key("dbo.chi", "drop", "fk_par")
    engine.write.update("dbo.chi", _child(spark, [(10, 55)]))
    vals = {
        r["ref"] for r in engine.read.table("dbo.chi").collect()
    }
    assert 55 in vals


def test_parent_delete_blocked_while_referenced(engine, spark):
    _mk(engine, spark)
    engine.modify.foreign_key(
        "dbo.chi", "add", "fk_par",
        columns="ref", ref_table="dbo.par", ref_columns="pk",
    )
    # pk=1 is referenced by child (10, 1): both delete verbs must block
    with pytest.raises(errors.SQLForeignKeyViolation, match="NO ACTION"):
        engine.write.delete(
            "dbo.par",
            spark.createDataFrame([Row(pk=1)], "pk long"),
        )
    with pytest.raises(errors.SQLForeignKeyViolation, match="NO ACTION"):
        engine.write.delete_where("dbo.par", "pk = 1")
    # pk=3 is unreferenced: delete proceeds
    assert engine.write.delete_where("dbo.par", "pk = 3") == 1
    # dropping the FK releases the parent
    engine.modify.foreign_key("dbo.chi", "drop", "fk_par")
    assert engine.write.delete_where("dbo.par", "pk = 1") == 1
