"""Round-11 review pins for delete/scd2/ingest/datetimeoffset: the
self-referencing FK delete check, empty-table delete no-op, SCD2
offset preservation + unique enforcement + engine errors, hidden-dir
ingest pruning, and flexible offset-literal parsing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mssql_dataframe_spark.errors import (
    DataframeColumnDoesNotExist,
    SQLForeignKeyViolation,
    SQLUniqueConstraintViolation,
)


def _emp(engine, spark):
    df = spark.createDataFrame(
        [(1, None, "ceo"), (2, 1, "vp"), (3, 2, "ic")],
        "id long, manager_id long, role string",
    )
    engine.create.table_from_dataframe("dbo.emp", df, primary_key="id")
    engine.write.insert("dbo.emp", df)
    engine.modify.foreign_key(
        "dbo.emp", "add", "fk_mgr",
        columns="manager_id", ref_table="dbo.emp", ref_columns="id",
    )
    return df


def test_delete_checks_self_referencing_fk(engine, spark):
    _emp(engine, spark)
    with pytest.raises(SQLForeignKeyViolation, match="self-referencing"):
        engine.write.delete(
            "dbo.emp", spark.createDataFrame([(2,)], "id long")
        )
    # deleting leaf rows (nobody references them) still works
    engine.write.delete("dbo.emp", spark.createDataFrame([(3,)], "id long"))
    assert engine.read.table("dbo.emp").count() == 2
    # a row and its only referencer may go together (the referencing
    # row is itself deleted, so no SURVIVOR references a missing key)
    engine.write.delete(
        "dbo.emp", spark.createDataFrame([(1,), (2,)], "id long")
    )
    assert engine.read.table("dbo.emp").count() == 0


def test_self_fk_rejects_cascade_at_declaration(engine, spark):
    df = spark.createDataFrame([(1, None)], "id long, parent long")
    engine.create.table_from_dataframe("dbo.selfc", df, primary_key="id")
    with pytest.raises(ValueError, match="1785"):
        engine.modify.foreign_key(
            "dbo.selfc", "add", "fk_self",
            columns="parent", ref_table="dbo.selfc", ref_columns="id",
            on_delete="cascade",
        )


def test_delete_on_empty_table_commits_nothing(engine, spark):
    engine.create.table("dbo.devoid", {"id": "bigint"},
                        primary_key_column="id")
    v = engine.store.meta("dbo.devoid").version
    n = engine.write.delete(
        "dbo.devoid", spark.createDataFrame([(1,)], "id long")
    )
    assert n == 0
    assert engine.store.meta("dbo.devoid").version == v


def test_scd2_preserves_datetimeoffset_companion(engine, spark):
    engine.create.table(
        "dbo.sdto",
        {
            "k": "bigint", "seen": "datetimeoffset",
            "_valid_from": "datetime2", "_valid_to": "datetime2",
            "_is_current": "bit",
        },
        primary_key_column="k",
    )
    src = spark.createDataFrame(
        [(1, "2021-01-01 00:00:00 +05:30")], "k long, seen string"
    )
    engine.write.merge_scd2("dbo.sdto", src, match_columns=["k"])
    row = engine.read.table(
        "dbo.sdto", include_tz_offsets=True
    ).collect()[0]
    assert row["seen__tz"] == 330  # +05:30, not NULL/0


def test_scd2_unknown_column_raises_engine_error(engine, spark):
    engine.create.table(
        "dbo.sunk",
        {"k": "bigint", "v": "bigint", "_valid_from": "datetime2",
         "_valid_to": "datetime2", "_is_current": "bit"},
        primary_key_column="k",
    )
    with pytest.raises(DataframeColumnDoesNotExist, match="vv"):
        engine.write.merge_scd2(
            "dbo.sunk",
            spark.createDataFrame([(1, 2)], "k long, vv long"),
            match_columns=["k"],
        )


def test_scd2_enforces_recorded_unique_constraints(engine, spark):
    engine.create.table(
        "dbo.suq",
        {"k": "bigint", "u": "bigint", "x": "bigint",
         "_valid_from": "datetime2", "_valid_to": "datetime2",
         "_is_current": "bit"},
    )
    engine.modify.unique_constraint("dbo.suq", "add", "uq_u", columns="u")
    t1 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    t2 = F.lit("2024-06-01 00:00:00").cast("timestamp_ntz")
    engine.write.merge_scd2(
        "dbo.suq",
        spark.createDataFrame([(1, 100, 5)], "k long, u long, x long"),
        match_columns=["k"], as_of=t1,
    )
    # changing x while u stays: the closed row and the new current row
    # would BOTH hold u=100 — the physical UNIQUE constraint rejects
    with pytest.raises(SQLUniqueConstraintViolation):
        engine.write.merge_scd2(
            "dbo.suq",
            spark.createDataFrame([(1, 100, 6)], "k long, u long, x long"),
            match_columns=["k"], as_of=t2,
        )


def test_ingest_skips_hidden_and_temp_directories(engine, spark, tmp_path):
    land = tmp_path / "landing"
    (land / "_temporary" / "0").mkdir(parents=True)
    (land / ".staging").mkdir()
    good = spark.createDataFrame([(1, "a")], "id long, val string")
    good.coalesce(1).write.mode("overwrite").parquet(str(land / "batch1"))
    bad = spark.createDataFrame([(99, "z")], "id long, val string")
    bad.coalesce(1).write.mode("overwrite").parquet(
        str(land / "_temporary" / "0" / "task")
    )
    engine.create.table("dbo.land", {"id": "bigint", "val": "nvarchar(10)"},
                        primary_key_column="id")
    engine.write.ingest_directory("dbo.land", str(land), file_format="parquet")
    got = {r["id"] for r in engine.read.table("dbo.land").collect()}
    assert got == {1}


@pytest.mark.parametrize(
    "literal,want",
    [
        ("2021-01-01 00:00:00 +05:30", 330),
        ("2021-01-01 00:00:00+5:30", 330),
        ("2021-01-01 00:00:00 -0800", -480),
        ("2021-01-01 00:00:00-8", -480),
        ("2021-01-01 00:00:00Z", 0),
        ("2021-01-01 00:00:00", 0),
        ("2021-01-01 00:00:00 +05:30:00", 330),
    ],
)
def test_offset_literal_forms_roundtrip(spark, literal, want):
    """Every zone form Spark's cast honors must parse to the matching
    companion offset — a partial regex desynced instant and offset."""
    from mssql_dataframe_spark.core import datetimeoffset as dto

    got = (
        spark.createDataFrame([(literal,)], "s string")
        .select(dto.offset_minutes(F.col("s")).alias("m"))
        .collect()[0]["m"]
    )
    assert got == want
