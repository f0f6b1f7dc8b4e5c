"""Computed columns (core/generated.py — SQL Server PERSISTED computed
column semantics): whitelist-validated expressions, engine-recomputed
on every write path, explicit writes rejected, COW backfill on add."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors


def _mk(engine, spark):
    engine.create.table(
        "dbo.gc", {"id": "bigint", "qty": "int", "price": "float"},
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.gc",
        spark.createDataFrame(
            [Row(id=1, qty=2, price=10.0), Row(id=2, qty=5, price=4.0)],
            "id long, qty int, price double",
        ),
    )


def test_add_backfills_and_insert_recomputes(engine, spark):
    _mk(engine, spark)
    engine.modify.computed_column(
        "dbo.gc", "add", "total", "qty * price", "float"
    )
    rows = {r["id"]: r["total"] for r in engine.read.table("dbo.gc").collect()}
    assert rows == {1: 20.0, 2: 20.0}  # backfilled
    engine.write.insert(
        "dbo.gc",
        spark.createDataFrame([Row(id=3, qty=3, price=3.0)],
                              "id long, qty int, price double"),
    )
    rows = {r["id"]: r["total"] for r in engine.read.table("dbo.gc").collect()}
    assert rows[3] == 9.0


def test_update_and_merge_recompute(engine, spark):
    _mk(engine, spark)
    engine.modify.computed_column(
        "dbo.gc", "add", "total", "qty * price", "float"
    )
    engine.write.update(
        "dbo.gc",
        spark.createDataFrame([Row(id=1, qty=7)], "id long, qty int"),
    )
    rows = {r["id"]: r["total"] for r in engine.read.table("dbo.gc").collect()}
    assert rows[1] == 70.0
    engine.write.merge(
        "dbo.gc",
        spark.createDataFrame([Row(id=9, qty=2, price=2.5)],
                              "id long, qty int, price double"),
        upsert=True,
    )
    rows = {r["id"]: r["total"] for r in engine.read.table("dbo.gc").collect()}
    assert rows[9] == 5.0


def test_explicit_write_rejected(engine, spark):
    _mk(engine, spark)
    engine.modify.computed_column(
        "dbo.gc", "add", "total", "qty * price", "float"
    )
    with pytest.raises(errors.DataframeColumnInvalidValue, match="computed"):
        engine.write.insert(
            "dbo.gc",
            spark.createDataFrame(
                [Row(id=4, qty=1, price=1.0, total=99.0)],
                "id long, qty int, price double, total double",
            ),
        )
    assert engine.read.table("dbo.gc").count() == 2  # nothing persisted


def test_expression_whitelist(engine, spark):
    _mk(engine, spark)
    for bad in (
        "qty * rand()",                  # nondeterministic
        "ghost_col + 1",                 # unknown column
        "qty; drop table x",             # smuggled SQL
        "(select 1)",                    # subquery keyword
    ):
        with pytest.raises(errors.SQLInvalidSyntax):
            engine.modify.computed_column(
                "dbo.gc", "add", "bad_col", bad, "bigint"
            )


def test_drop_removes_column_and_expression(engine, spark):
    _mk(engine, spark)
    engine.modify.computed_column(
        "dbo.gc", "add", "total", "qty * price", "float"
    )
    engine.modify.computed_column("dbo.gc", "drop", "total")
    assert "total" not in engine.read.table("dbo.gc").columns
    # writes no longer reject the name (it's a normal absent column now)
    engine.write.insert(
        "dbo.gc",
        spark.createDataFrame([Row(id=5, qty=1, price=1.0)],
                              "id long, qty int, price double"),
    )
    assert engine.read.table("dbo.gc").count() == 3


def test_computed_column_filters_push_to_scan(engine, spark):
    """The PERSISTED payoff: a where on a computed column is a plain
    stored-column predicate — it must reach the Parquet scan as a
    PushedFilter (a compute-on-read design would have to evaluate the
    expression over every row first)."""
    from pyspark.sql import Row

    _mk(engine, spark)
    engine.modify.computed_column(
        "dbo.gc", "add", "total", "qty * price", "float"
    )
    df = engine.read.table("dbo.gc", where="total > 15")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters: [" in plan and "total" in plan.split(
        "PushedFilters:"
    )[1].splitlines()[0]
    assert {r["id"] for r in df.collect()} == {1, 2}
