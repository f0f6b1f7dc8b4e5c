"""CHECK constraints (beyond-reference; Delta ADD CONSTRAINT analog):
restricted-grammar expressions enforced with one agg over the rows
each write produces; NULL passes (SQL semantics); a violating write
raises BEFORE the commit, leaving the table unchanged."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors

COLS = {"id": "bigint", "qty": "int", "price": "float"}


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, qty=q, price=p) for i, q, p in rows],
        "id long, qty int, price double",
    )


def _mk(engine, spark):
    engine.create.table("dbo.cc", COLS, primary_key_column="id")
    engine.write.insert("dbo.cc", _df(spark, [(1, 5, 10.0), (2, 7, 20.0)]))


def test_add_enforces_on_insert_and_preserves_state(engine, spark):
    _mk(engine, spark)
    engine.modify.check_constraint("dbo.cc", "add", "qty_pos", "qty > 0")
    engine.write.insert("dbo.cc", _df(spark, [(3, 1, 1.0)]))  # valid
    with pytest.raises(errors.SQLCheckConstraintViolation, match="qty_pos"):
        engine.write.insert("dbo.cc", _df(spark, [(4, -1, 1.0)]))
    # enforcement precedes the commit: the violating batch left no trace
    assert engine.read.table("dbo.cc").count() == 3


def test_null_passes_and_update_enforced(engine, spark):
    _mk(engine, spark)
    engine.modify.check_constraint("dbo.cc", "add", "qty_pos", "qty > 0")
    engine.write.insert(
        "dbo.cc",
        spark.createDataFrame(
            [Row(id=9, qty=None, price=1.0)], "id long, qty int, price double"
        ),
    )  # NULL passes (SQL CHECK semantics)
    with pytest.raises(errors.SQLCheckConstraintViolation):
        engine.write.update("dbo.cc", _df(spark, [(1, 0, 10.0)]))
    with pytest.raises(errors.SQLCheckConstraintViolation):
        engine.write.merge("dbo.cc", _df(spark, [(1, -5, 10.0)]), upsert=True)
    # valid mutation still flows
    engine.write.update("dbo.cc", _df(spark, [(1, 99, 10.0)]))
    assert engine.read.table("dbo.cc").filter("qty = 99").count() == 1


def test_add_audits_existing_data(engine, spark):
    _mk(engine, spark)
    engine.write.insert("dbo.cc", _df(spark, [(3, -2, 1.0)]))
    with pytest.raises(errors.SQLCheckConstraintViolation):
        engine.modify.check_constraint("dbo.cc", "add", "qty_pos", "qty > 0")
    # failed add leaves no constraint behind
    props = engine.store.meta("dbo.cc").properties
    assert "qty_pos" not in (props.get("check_constraints") or {})


def test_drop_and_grammar_validation(engine, spark):
    _mk(engine, spark)
    engine.modify.check_constraint("dbo.cc", "add", "qty_pos", "qty > 0")
    engine.modify.check_constraint("dbo.cc", "drop", "qty_pos")
    engine.write.insert("dbo.cc", _df(spark, [(5, -1, 1.0)]))  # no longer checked
    with pytest.raises(errors.SQLInvalidSyntax):
        engine.modify.check_constraint(
            "dbo.cc", "add", "nested", "((qty > 0))"
        )  # grammar allows one paren level (reference dynamic.py:95-97)
    with pytest.raises(ValueError, match="no check constraint"):
        engine.modify.check_constraint("dbo.cc", "drop", "nope")
