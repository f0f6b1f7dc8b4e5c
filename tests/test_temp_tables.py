"""SQL Server temp-name contract: #local is session-scoped (invisible
to other sessions, dropped on close), ##global is shared — the
reference's own examples create ##-named tables, so they must port
verbatim."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import SparkEngine, errors


def _rows(spark, n=3):
    return spark.createDataFrame(
        [Row(id=i, v=i * 10) for i in range(n)], "id long, v int"
    )


def test_local_temp_is_session_scoped_and_dropped_on_close(engine, spark):
    engine.create.table(
        "dbo.#stage", {"id": "bigint", "v": "int"}, primary_key_column="id"
    )
    engine.write.insert("dbo.#stage", _rows(spark))
    assert engine.read.table("dbo.#stage").count() == 3
    assert "dbo.#stage" not in engine.store.list_tables()  # hidden
    # another session on the SAME root cannot see the #local table
    other = SparkEngine(spark=spark, store_root=engine.store.root)
    with pytest.raises(errors.SQLTableDoesNotExist):
        other.read.table("dbo.#stage")
    engine.close()
    with pytest.raises(errors.SQLTableDoesNotExist):
        engine.read.table("dbo.#stage")


def test_global_temp_is_shared(engine, spark):
    engine.create.table(
        "dbo.##gstage", {"id": "bigint", "v": "int"}, primary_key_column="id"
    )
    engine.write.insert("dbo.##gstage", _rows(spark))
    other = SparkEngine(spark=spark, store_root=engine.store.root)
    assert other.read.table("dbo.##gstage").count() == 3
    # close() only drops #local tables; ## persists like tempdb's
    # global temps until explicitly dropped
    engine.close()
    assert other.read.table("dbo.##gstage").count() == 3


def test_context_manager_closes(engine, spark):
    with SparkEngine(spark=spark, store_root=engine.store.root) as eng:
        eng.create.table("dbo.#cm", {"id": "bigint"}, primary_key_column="id")
        eng.write.insert("dbo.#cm", spark.createDataFrame([Row(id=1)], "id long"))
        assert eng.read.table("dbo.#cm").count() == 1
    with pytest.raises(errors.SQLTableDoesNotExist):
        eng.read.table("dbo.#cm")
