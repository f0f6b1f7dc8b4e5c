"""Core verb round-trip tests (mirrors the reference's test layering —
SURVEY.md §5: round-trip oracle per operator, error paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark import errors


def _mini_df(spark):
    return spark.createDataFrame(
        [
            Row(id=1, name="alpha", amount=10.5),
            Row(id=2, name="beta", amount=20.0),
            Row(id=3, name="gamma", amount=None),
        ]
    )


COLS = {"id": "bigint", "name": "nvarchar(100)", "amount": "float"}


def test_create_insert_read_roundtrip(engine, spark):
    engine.create.table("dbo.t1", COLS, primary_key_column="id")
    engine.write.insert("dbo.t1", _mini_df(spark))
    out = engine.read.table("dbo.t1").orderBy("id").collect()
    assert [r.id for r in out] == [1, 2, 3]
    assert out[2].amount is None


def test_read_projection_pk_force_include(engine, spark):
    engine.create.table("dbo.t2", COLS, primary_key_column="id")
    engine.write.insert("dbo.t2", _mini_df(spark))
    out = engine.read.table("dbo.t2", column_names=["name"])
    # PK force-included (reference read.py:77-82)
    assert set(out.columns) == {"id", "name"}


def test_read_where_order_limit(engine, spark):
    engine.create.table("dbo.t3", COLS, primary_key_column="id")
    engine.write.insert("dbo.t3", _mini_df(spark))
    out = engine.read.table(
        "dbo.t3",
        where="amount >= 10 AND name <> 'beta'",
        order_column="id",
        order_direction="DESC",
        limit=1,
    ).collect()
    assert len(out) == 1 and out[0].id == 1


def test_read_errors(engine, spark):
    engine.create.table("dbo.t4", COLS, primary_key_column="id")
    with pytest.raises(errors.SQLColumnDoesNotExist):
        engine.read.table("dbo.t4", column_names=["nope"])
    with pytest.raises(ValueError):
        engine.read.table("dbo.t4", limit="ten")
    with pytest.raises(ValueError):
        engine.read.table("dbo.t4", order_column="id")
    with pytest.raises(errors.SQLTableDoesNotExist):
        engine.read.table("dbo.nope")


def test_update(engine, spark):
    engine.create.table("dbo.t5", COLS, primary_key_column="id")
    engine.write.insert("dbo.t5", _mini_df(spark))
    upd = spark.createDataFrame([Row(id=2, amount=99.0), Row(id=9, amount=1.0)])
    engine.write.update("dbo.t5", upd)
    out = {r.id: r.amount for r in engine.read.table("dbo.t5").collect()}
    assert out[2] == 99.0
    assert out[1] == 10.5
    assert 9 not in out  # unmatched source rows ignored


def test_update_requires_pk_or_match(engine, spark):
    engine.create.table("dbo.t6", COLS)
    engine.write.insert("dbo.t6", _mini_df(spark))
    upd = spark.createDataFrame([Row(id=2, amount=99.0)])
    with pytest.raises(errors.SQLUndefinedPrimaryKey):
        engine.write.update("dbo.t6", upd)
    engine.write.update("dbo.t6", upd, match_columns=["id"])
    out = {r.id: r.amount for r in engine.read.table("dbo.t6").collect()}
    assert out[2] == 99.0


def test_merge_full(engine, spark):
    engine.create.table("dbo.t7", COLS, primary_key_column="id")
    engine.write.insert("dbo.t7", _mini_df(spark))
    src = spark.createDataFrame(
        [Row(id=2, name="beta2", amount=2.0), Row(id=4, name="delta", amount=4.0)]
    )
    engine.write.merge("dbo.t7", src)
    out = {r.id: (r.name, r.amount) for r in engine.read.table("dbo.t7").collect()}
    # updated, inserted, others deleted (not matched by source)
    assert out == {2: ("beta2", 2.0), 4: ("delta", 4.0)}


def test_merge_upsert(engine, spark):
    engine.create.table("dbo.t8", COLS, primary_key_column="id")
    engine.write.insert("dbo.t8", _mini_df(spark))
    src = spark.createDataFrame(
        [Row(id=2, name="beta2", amount=2.0), Row(id=4, name="delta", amount=4.0)]
    )
    engine.write.merge("dbo.t8", src, upsert=True)
    out = {r.id for r in engine.read.table("dbo.t8").collect()}
    assert out == {1, 2, 3, 4}


def test_merge_delete_requires(engine, spark):
    cols = {"id": "bigint", "part": "nvarchar(10)", "v": "float"}
    engine.create.table("dbo.t9", cols, primary_key_column="id")
    engine.write.insert(
        "dbo.t9",
        spark.createDataFrame(
            [Row(id=1, part="a", v=1.0), Row(id=2, part="a", v=2.0),
             Row(id=3, part="b", v=3.0)]
        ),
    )
    # source only covers partition 'a': row 3 (partition b) must survive,
    # row 2 (partition a, not in source) must be deleted
    src = spark.createDataFrame([Row(id=1, part="a", v=10.0)])
    engine.write.merge("dbo.t9", src, delete_requires=["part"])
    out = {r.id: r.v for r in engine.read.table("dbo.t9").collect()}
    assert out == {1: 10.0, 3: 3.0}
    with pytest.raises(ValueError):
        engine.write.merge("dbo.t9", src, upsert=True, delete_requires=["part"])


def test_metadata_timestamps(engine_ts, spark):
    engine_ts.create.table("dbo.t10", COLS, primary_key_column="id")
    engine_ts.write.insert("dbo.t10", _mini_df(spark))
    df = engine_ts.read.table("dbo.t10")
    assert "_time_insert" in df.columns
    assert df.filter(F.col("_time_insert").isNull()).count() == 0
    upd = spark.createDataFrame([Row(id=1, amount=0.0)])
    engine_ts.write.update("dbo.t10", upd)
    df = engine_ts.read.table("dbo.t10")
    stamped = df.filter(F.col("_time_update").isNotNull()).collect()
    assert [r.id for r in stamped] == [1]


def test_identity_pk(engine, spark):
    engine.create.table(
        "dbo.t11", {"name": "nvarchar(20)"}, sql_primary_key=True
    )
    engine.write.insert(
        "dbo.t11", spark.createDataFrame([Row(name="x"), Row(name="y")])
    )
    engine.write.insert("dbo.t11", spark.createDataFrame([Row(name="z")]))
    out = sorted((r._pk, r.name) for r in engine.read.table("dbo.t11").collect())
    assert [p for p, _ in out] == [1, 2, 3]


def test_validation_range_and_size(engine, spark):
    engine.create.table(
        "dbo.t12", {"id": "tinyint", "s": "varchar(3)"}, primary_key_column="id"
    )
    with pytest.raises(errors.SQLInsufficientColumnSize):
        engine.write.insert(
            "dbo.t12", spark.createDataFrame([Row(id=300, s="ok")])
        )
    with pytest.raises(errors.SQLInsufficientColumnSize):
        engine.write.insert(
            "dbo.t12", spark.createDataFrame([Row(id=1, s="toolong")])
        )
    with pytest.raises(errors.SQLNonUnicodeTypeColumn):
        engine.write.insert(
            "dbo.t12", spark.createDataFrame([Row(id=1, s="é")])
        )
    engine.write.insert("dbo.t12", spark.createDataFrame([Row(id=255, s="ok")]))
    assert engine.read.table("dbo.t12").count() == 1


def test_modify_column(engine, spark):
    engine.create.table("dbo.t13", COLS, primary_key_column="id")
    engine.write.insert("dbo.t13", _mini_df(spark))
    engine.modify.column("dbo.t13", "add", "extra", "int")
    out = engine.read.table("dbo.t13")
    assert "extra" in out.columns
    assert out.filter(F.col("extra").isNotNull()).count() == 0
    engine.modify.column("dbo.t13", "alter", "extra", "bigint")
    assert dict(engine.get_schema("dbo.t13").sql_type)["extra"] == "bigint"
    with pytest.raises(errors.SQLRecastColumnUnchanged):
        engine.modify.column("dbo.t13", "alter", "extra", "bigint")
    engine.modify.column("dbo.t13", "drop", "extra")
    assert "extra" not in engine.read.table("dbo.t13").columns


def test_modify_primary_key(engine, spark):
    engine.create.table("dbo.t14", COLS)
    engine.write.insert("dbo.t14", _mini_df(spark))
    engine.modify.primary_key("dbo.t14", "add", ["id"], "pk_t14")
    schema = engine.get_schema("dbo.t14")
    assert schema.loc["id", "pk_seq"] == 1
    engine.modify.primary_key("dbo.t14", "drop")
    with pytest.raises(errors.SQLUndefinedPrimaryKey):
        engine.modify.primary_key("dbo.t14", "drop")


def test_decimal_rounding_warning(engine, spark, caplog):
    engine.create.table(
        "dbo.t15", {"id": "bigint", "d": "decimal(5,2)"}, primary_key_column="id"
    )
    import logging

    with caplog.at_level(logging.WARNING, logger="mssql_dataframe_spark"):
        engine.write.insert(
            "dbo.t15", spark.createDataFrame([Row(id=1, d=1.239)])
        )
    assert any("rounded" in r.message for r in caplog.records)
    val = engine.read.table("dbo.t15").collect()[0].d
    assert float(val) == 1.24


def test_create_from_dataframe(engine, spark):
    df = _mini_df(spark)
    engine.create.table_from_dataframe("dbo.t16", df, primary_key="id")
    engine.write.insert("dbo.t16", df)
    assert engine.read.table("dbo.t16").count() == 3


def test_modify_primary_key_add_drop(engine, spark):
    engine.create.table("dbo.pk1", COLS)
    engine.write.insert("dbo.pk1", _mini_df(spark))
    engine.modify.primary_key("dbo.pk1", "add", "id", primary_key_name="pk_id")
    schema = engine.get_schema("dbo.pk1")
    assert schema.loc["id", "pk_seq"] == 1
    assert schema.loc["id", "pk_name"] == "pk_id"
    engine.modify.primary_key("dbo.pk1", "drop")
    assert engine.get_schema("dbo.pk1")["pk_seq"].isna().all()


def test_modify_primary_key_uniqueness_audit(engine, spark):
    engine.create.table("dbo.pk2", COLS)
    df = _mini_df(spark).withColumn("id", F.lit(7).cast("bigint"))
    engine.write.insert("dbo.pk2", df)
    with pytest.raises(ValueError, match="duplicate key"):
        engine.modify.primary_key("dbo.pk2", "add", "id")


def test_modify_primary_key_errors(engine, spark):
    engine.create.table("dbo.pk3", COLS)
    with pytest.raises(errors.SQLColumnDoesNotExist):
        engine.modify.primary_key("dbo.pk3", "add", "nope")
    with pytest.raises(errors.SQLUndefinedPrimaryKey):
        engine.modify.primary_key("dbo.pk3", "drop")


def test_get_schema_report(engine, spark):
    engine.create.table(
        "dbo.gs1",
        {"id": "int", "name": "nvarchar(50)", "price": "decimal(10,2)"},
        primary_key_column="id",
        not_nullable=["id"],
    )
    rep = engine.get_schema("dbo.gs1")
    assert list(rep.index) == ["id", "name", "price"]
    assert rep.loc["id", "sql_type"] == "int"
    assert not rep.loc["id", "is_nullable"]
    assert rep.loc["name", "column_size"] == 50
    assert rep.loc["price", "decimal_digits"] == 2
    assert rep.loc["price", "spark_type"] == "decimal(10,2)"
    assert rep.loc["id", "pk_seq"] == 1


def test_register_view_sql_read(engine, spark):
    """The read_values analog (reference conversion.py:902-952):
    arbitrary SQL over a registered table view."""
    engine.create.table("dbo.rv1", COLS, primary_key_column="id")
    engine.write.insert("dbo.rv1", _mini_df(spark))
    view = engine.register_view("dbo.rv1", "rv1")
    out = spark.sql(
        f"SELECT count(*) AS n, sum(amount) AS s FROM {view} WHERE amount IS NOT NULL"
    ).collect()[0]
    assert out["n"] == 2 and abs(out["s"] - 30.5) < 1e-9
