"""Regression pins for the r9 validation-pipeline review findings:
string-source range/grid parity, ANSI-safe decimal probes, GUID
bounds canonicalization, and NULL-merge-key semantics."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark import errors


def test_string_source_range_check_enforced(engine, spark):
    """'10000' into tinyint must raise the range error — previously
    the lexicographic string min/max hit a swallowed TypeError and the
    out-of-range value was stored unchecked."""
    engine.create.table("dbo.vh1", {"pk": "bigint", "v": "tinyint"},
                        primary_key_column="pk")
    df = spark.createDataFrame([Row(pk=1, v="10000")],
                               "pk long, v string")
    with pytest.raises(errors.SQLInsufficientColumnSize, match="'v'"):
        engine.write.insert("dbo.vh1", df)
    # in-range strings still land, converted
    engine.write.insert(
        "dbo.vh1",
        spark.createDataFrame([Row(pk=1, v="255")], "pk long, v string"),
    )
    assert engine.read.table("dbo.vh1").collect()[0]["v"] == 255


def test_high_precision_decimal_is_writable(engine, spark):
    """10^21 is a legal NUMERIC(38,0) value; the old Decimal(38,18)
    widening overflowed it and aborted the validation job under ANSI."""
    from decimal import Decimal

    engine.create.table("dbo.vh2", {"pk": "bigint", "v": "numeric(38,0)"},
                        primary_key_column="pk")
    engine.write.insert(
        "dbo.vh2",
        spark.createDataFrame(
            [Row(pk=1, v=Decimal(10) ** 21)],
            "pk long, v decimal(38,0)",
        ),
    )
    assert engine.read.table("dbo.vh2").collect()[0]["v"] == Decimal(10) ** 21


def test_money_overflow_raises_engine_error(engine, spark):
    """A money value beyond Decimal(19,4) must surface as the engine's
    invalid-value error — not a raw Spark arithmetic crash from the
    rounding-warning probe's plain cast."""
    from decimal import Decimal

    engine.create.table("dbo.vh3", {"pk": "bigint", "v": "money"},
                        primary_key_column="pk")
    df = spark.createDataFrame(
        [Row(pk=1, v=Decimal(10) ** 16)], "pk long, v decimal(38,0)"
    )
    with pytest.raises(errors.DataframeColumnInvalidValue):
        engine.write.insert("dbo.vh3", df)


def test_merge_accepts_multiple_null_key_source_rows(engine, spark):
    """T-SQL MERGE matches nothing on NULL keys, so two NULL-keyed
    source rows are two inserts — not 'the same row updated twice'."""
    engine.create.table(
        "dbo.vh4", {"k": "bigint", "v": "nvarchar(10)"},
    )
    engine.write.insert(
        "dbo.vh4",
        spark.createDataFrame([Row(k=1, v="a")], "k long, v string"),
    )
    src = spark.createDataFrame(
        [Row(k=None, v="x"), Row(k=None, v="y"), Row(k=1, v="a2")],
        "k long, v string",
    )
    engine.write.merge("dbo.vh4", src, match_columns=["k"])
    got = [
        (r["k"], r["v"])
        for r in engine.read.table("dbo.vh4").collect()
        if r["v"] is not None
    ]
    assert (1, "a2") in got
    assert sum(1 for k, _ in got if k is None) == 2
    # duplicated NON-null keys still raise
    dup = spark.createDataFrame(
        [Row(k=2, v="p"), Row(k=2, v="q")], "k long, v string"
    )
    with pytest.raises(ValueError, match="duplicate match-key"):
        engine.write.merge("dbo.vh4", dup, match_columns=["k"])


def test_datetime_max_of_997_rejects_rounding_overflow(engine, spark):
    """Legacy DATETIME tops out at .997; a value that would round past
    year 9999 fails the range check instead of storing an
    unrepresentable timestamp."""
    engine.create.table("dbo.vh5", {"pk": "bigint", "t": "datetime"},
                        primary_key_column="pk")
    bad = spark.createDataFrame(
        [(1, datetime.datetime(9999, 12, 31, 23, 59, 59, 999500))],
        "pk long, t timestamp_ntz",
    )
    with pytest.raises(errors.SQLInsufficientColumnSize):
        engine.write.insert("dbo.vh5", bad)
    ok = spark.createDataFrame(
        [(1, datetime.datetime(9999, 12, 31, 23, 59, 59, 996500))],
        "pk long, t timestamp_ntz",
    )
    engine.write.insert("dbo.vh5", ok)
    got = engine.read.table("dbo.vh5").collect()[0]["t"]
    assert got == datetime.datetime(9999, 12, 31, 23, 59, 59, 997000)


def test_string_temporal_source_rounds_like_timestamp(engine, spark):
    """The same logical smalldatetime/datetime value stores
    identically whether supplied as a timestamp or a string."""
    engine.create.table(
        "dbo.vh6",
        {"pk": "bigint", "sd": "smalldatetime", "dt": "datetime"},
        primary_key_column="pk",
    )
    as_ts = spark.createDataFrame(
        [(1,
          datetime.datetime(2024, 5, 1, 10, 30, 29, 999000),
          datetime.datetime(2024, 5, 1, 10, 30, 29, 999000))],
        "pk long, sd timestamp_ntz, dt timestamp_ntz",
    )
    as_str = spark.createDataFrame(
        [(2, "2024-05-01 10:30:29.999", "2024-05-01 10:30:29.999")],
        "pk long, sd string, dt string",
    )
    engine.write.insert("dbo.vh6", as_ts)
    engine.write.insert("dbo.vh6", as_str)
    rows = {r["pk"]: r for r in engine.read.table("dbo.vh6").collect()}
    assert rows[1]["sd"] == rows[2]["sd"] == datetime.datetime(
        2024, 5, 1, 10, 31
    )
    # .999 has no grid slot: DATETIME rounds it up to the next second
    assert rows[1]["dt"] == rows[2]["dt"] == datetime.datetime(
        2024, 5, 1, 10, 30, 30
    )


def test_guid_key_bounds_match_stored_canonical_form(engine, spark):
    """Lowercase-GUID match keys must still find their uppercase
    stored rows — previously the pre-canonicalization bounds made
    stats pruning declare every file disjoint, silently skipping the
    update (and letting duplicate PKs through)."""
    g1 = "AAAAAAAA-0000-0000-0000-000000000001"
    g2 = "BBBBBBBB-0000-0000-0000-000000000002"
    engine.create.table(
        "dbo.vh7",
        {"gid": "uniqueidentifier", "v": "bigint"},
        primary_key_column="gid",
    )
    engine.write.insert(
        "dbo.vh7",
        spark.createDataFrame(
            [Row(gid=g1, v=1), Row(gid=g2, v=2)], "gid string, v long"
        ),
    )
    # update arrives with LOWERCASE keys
    engine.write.update(
        "dbo.vh7",
        spark.createDataFrame(
            [Row(gid=g1.lower(), v=10)], "gid string, v long"
        ),
    )
    got = {r["gid"]: r["v"] for r in engine.read.table("dbo.vh7").collect()}
    assert got == {g1: 10, g2: 2}
    # and a lowercase re-insert of an existing key is a PK collision
    with pytest.raises(Exception, match="(?i)primary|duplicate"):
        engine.write.insert(
            "dbo.vh7",
            spark.createDataFrame(
                [Row(gid=g2.lower(), v=9)], "gid string, v long"
            ),
        )


def test_merge_rejects_insert_with_missing_not_null_column(engine, spark):
    """A NOT NULL column absent from the merge source makes any
    inserted row a violation (SQL Server error 515 shape) — previously
    NULL was silently committed."""
    engine.create.table(
        "dbo.vh8",
        {"k": "bigint", "name": "nvarchar(20)", "v": "bigint"},
        primary_key_column="k",
        not_nullable=["name"],
    )
    engine.write.insert(
        "dbo.vh8",
        spark.createDataFrame(
            [Row(k=1, name="a", v=1)], "k long, name string, v long"
        ),
    )
    # update-only merge without 'name' is fine (no inserts happen)
    engine.write.merge(
        "dbo.vh8",
        spark.createDataFrame([Row(k=1, v=10)], "k long, v long"),
        upsert=True,
    )
    assert engine.read.table("dbo.vh8").collect()[0]["v"] == 10
    # a NEW key without 'name' must raise, not insert NULL
    with pytest.raises(errors.DataframeColumnInvalidValue, match="name"):
        engine.write.merge(
            "dbo.vh8",
            spark.createDataFrame([Row(k=2, v=2)], "k long, v long"),
            upsert=True,
        )
    assert engine.read.table("dbo.vh8").count() == 1


def test_merge_superset_match_enforces_pk(engine, spark):
    """match_columns strictly wider than the PK: a source row whose
    full match tuple is absent inserts — but a PK value that already
    exists must still raise, not silently duplicate."""
    engine.create.table(
        "dbo.vh9",
        {"k": "bigint", "part": "nvarchar(5)", "v": "bigint"},
        primary_key_column="k",
    )
    engine.write.insert(
        "dbo.vh9",
        spark.createDataFrame(
            [Row(k=1, part="A", v=1)], "k long, part string, v long"
        ),
    )
    with pytest.raises(errors.SQLUniqueConstraintViolation):
        engine.write.merge(
            "dbo.vh9",
            spark.createDataFrame(
                [Row(k=1, part="B", v=9)], "k long, part string, v long"
            ),
            match_columns=["k", "part"],
            upsert=True,
        )
    # disjoint PK values through the same shape still insert fine
    engine.write.merge(
        "dbo.vh9",
        spark.createDataFrame(
            [Row(k=2, part="B", v=2)], "k long, part string, v long"
        ),
        match_columns=["k", "part"],
        upsert=True,
    )
    assert engine.read.table("dbo.vh9").count() == 2


def test_merge_nmbs_set_cannot_duplicate_pk(engine, spark):
    """A WHEN NOT MATCHED BY SOURCE SET expression rewriting a non-
    match PK column must hit the PK uniqueness check."""
    engine.create.table(
        "dbo.vh10",
        {"k": "bigint", "tag": "nvarchar(5)", "v": "bigint"},
        primary_key_column="k",
    )
    engine.write.insert(
        "dbo.vh10",
        spark.createDataFrame(
            [Row(k=1, tag="x", v=1), Row(k=2, tag="y", v=2)],
            "k long, tag string, v long",
        ),
    )
    with pytest.raises(errors.SQLUniqueConstraintViolation):
        engine.write.merge(
            "dbo.vh10",
            spark.createDataFrame(
                [Row(k=1, tag="x", v=10)], "k long, tag string, v long"
            ),
            match_columns=["tag"],
            not_matched_by_source_set={"k": "1"},
        )


def test_merge_delete_requires_accepts_bare_string(engine, spark):
    """delete_requires='part' mirrors match_columns' string form
    instead of exploding into per-character column errors."""
    engine.create.table(
        "dbo.vh11",
        {"k": "bigint", "part": "bigint", "v": "bigint"},
        primary_key_column="k",
    )
    engine.write.insert(
        "dbo.vh11",
        spark.createDataFrame(
            [Row(k=1, part=0, v=1), Row(k=2, part=1, v=2)],
            "k long, part long, v long",
        ),
    )
    engine.write.merge(
        "dbo.vh11",
        spark.createDataFrame(
            [Row(k=3, part=0, v=3)], "k long, part long, v long"
        ),
        delete_requires="part",
    )
    got = {r["k"] for r in engine.read.table("dbo.vh11").collect()}
    assert got == {2, 3}  # k=1 (part 0, not in source) deleted
