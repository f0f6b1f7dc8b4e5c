"""SCD type-2 merge tests (``write.merge_scd2``).

Beyond the reference surface: the reference's MERGE
(mssql_dataframe/core/write/merge.py:14-248) overwrites matched rows,
losing history. SCD2 closes the changed current row and inserts a new
current version; these tests pin the full state machine:
initial load, change, no-op re-merge, re-change after close, and the
error paths (missing bookkeeping columns, bookkeeping column in the
source, no tracked attributes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark import errors

T1 = "2024-01-01 00:00:00"
T2 = "2024-06-01 00:00:00"
T3 = "2024-12-01 00:00:00"

SCD_COLS = {
    "id": "bigint",
    "name": "nvarchar(100)",
    "amount": "float",
    "_valid_from": "datetime2",
    "_valid_to": "datetime2",
    "_is_current": "bit",
}


def _ts(s):
    return F.lit(s).cast("timestamp_ntz")


def _src(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, name=n, amount=a) for i, n, a in rows]
    )


def _state(engine, table="dbo.scd"):
    out = (
        engine.read.table(table)
        .orderBy("id", "_valid_from")
        .collect()
    )
    return [
        (
            r.id,
            r.name,
            r.amount,
            str(r._valid_from)[:19],
            None if r._valid_to is None else str(r._valid_to)[:19],
            r._is_current,
        )
        for r in out
    ]


def _make(engine, spark, rows, as_of=T1):
    engine.create.table("dbo.scd", SCD_COLS, primary_key_column="id")
    engine.write.merge_scd2("dbo.scd", _src(spark, rows), as_of=_ts(as_of))


def test_initial_load_all_current(engine, spark):
    _make(engine, spark, [(1, "a", 1.0), (2, "b", 2.0)])
    assert _state(engine) == [
        (1, "a", 1.0, T1, None, True),
        (2, "b", 2.0, T1, None, True),
    ]


def test_change_closes_and_inserts(engine, spark):
    _make(engine, spark, [(1, "a", 1.0), (2, "b", 2.0)])
    engine.write.merge_scd2(
        "dbo.scd", _src(spark, [(1, "a", 9.0)]), as_of=_ts(T2)
    )
    assert _state(engine) == [
        (1, "a", 1.0, T1, T2, False),
        (1, "a", 9.0, T2, None, True),
        (2, "b", 2.0, T1, None, True),
    ]


def test_unchanged_row_is_noop(engine, spark):
    _make(engine, spark, [(1, "a", 1.0), (2, "b", 2.0)])
    engine.write.merge_scd2(
        "dbo.scd",
        _src(spark, [(1, "a", 1.0), (3, "c", 3.0)]),
        as_of=_ts(T2),
    )
    assert _state(engine) == [
        (1, "a", 1.0, T1, None, True),
        (2, "b", 2.0, T1, None, True),
        (3, "c", 3.0, T2, None, True),
    ]


def test_rechange_after_close_keeps_history(engine, spark):
    """Three versions of one key: history rows ride through untouched
    (they fail the is_current join condition, not get re-closed)."""
    _make(engine, spark, [(1, "a", 1.0)])
    engine.write.merge_scd2(
        "dbo.scd", _src(spark, [(1, "a", 2.0)]), as_of=_ts(T2)
    )
    engine.write.merge_scd2(
        "dbo.scd", _src(spark, [(1, "z", 2.0)]), as_of=_ts(T3)
    )
    assert _state(engine) == [
        (1, "a", 1.0, T1, T2, False),
        (1, "a", 2.0, T2, T3, False),
        (1, "z", 2.0, T3, None, True),
    ]


def test_null_transitions_tracked(engine, spark):
    """NULL -> value and value -> NULL are changes (eqNullSafe)."""
    _make(engine, spark, [(1, "a", None), (2, "b", 2.0)])
    engine.write.merge_scd2(
        "dbo.scd",
        _src(spark, [(1, "a", 1.0), (2, "b", None)]),
        as_of=_ts(T2),
    )
    assert _state(engine) == [
        (1, "a", None, T1, T2, False),
        (1, "a", 1.0, T2, None, True),
        (2, "b", 2.0, T1, T2, False),
        (2, "b", None, T2, None, True),
    ]


def test_absent_key_stays_open(engine, spark):
    """SCD2 merge is not a delete: keys missing from the source keep
    their open current row."""
    _make(engine, spark, [(1, "a", 1.0), (2, "b", 2.0)])
    engine.write.merge_scd2(
        "dbo.scd", _src(spark, [(1, "a", 9.0)]), as_of=_ts(T2)
    )
    rows = {(r[0], r[5]) for r in _state(engine)}
    assert (2, True) in rows


def test_missing_bookkeeping_column_raises(engine, spark):
    cols = {k: v for k, v in SCD_COLS.items() if k != "_is_current"}
    engine.create.table("dbo.scd_bad", cols, primary_key_column="id")
    with pytest.raises(errors.SQLColumnDoesNotExist):
        engine.write.merge_scd2(
            "dbo.scd_bad", _src(spark, [(1, "a", 1.0)])
        )


def test_bookkeeping_column_in_source_raises(engine, spark):
    engine.create.table("dbo.scd", SCD_COLS, primary_key_column="id")
    bad = _src(spark, [(1, "a", 1.0)]).withColumn(
        "_is_current", F.lit(True)
    )
    with pytest.raises(ValueError, match="table-managed"):
        engine.write.merge_scd2("dbo.scd", bad)


def test_duplicate_match_keys_raise(engine, spark):
    _make(engine, spark, [(1, "a", 1.0)])
    dup = _src(spark, [(1, "a", 2.0), (1, "a", 3.0)])
    with pytest.raises(Exception):
        engine.write.merge_scd2("dbo.scd", dup, as_of=_ts(T2))


def test_point_in_time_join_picks_version_at_fact_time(spark):
    """Facts see the version valid at THEIR timestamp: boundary hits
    the new version (valid_from inclusive, valid_to exclusive), open
    intervals match forever, and facts with NO valid version (unknown
    key, or before the key's first valid_from) carry NULL dimension
    values instead of silently vanishing (LEFT semantics)."""
    from mssql_dataframe_spark.operators.joins import point_in_time_join

    dim = spark.createDataFrame(
        [
            (1, "v1", "2024-01-01 00:00:00", "2024-06-01 00:00:00", False),
            (1, "v2", "2024-06-01 00:00:00", None, True),
            (2, "w1", "2024-01-01 00:00:00", None, True),
        ],
        "k long, name string, _valid_from string, _valid_to string, _is_current boolean",
    ).selectExpr(
        "k", "name",
        "CAST(_valid_from AS TIMESTAMP_NTZ) AS _valid_from",
        "CAST(_valid_to AS TIMESTAMP_NTZ) AS _valid_to",
        "_is_current",
    )
    facts = spark.createDataFrame(
        [
            (10, 1, "2024-03-15 00:00:00"),   # inside v1
            (11, 1, "2024-06-01 00:00:00"),   # boundary -> v2
            (12, 1, "2025-01-01 00:00:00"),   # open interval -> v2
            (13, 2, "2024-02-01 00:00:00"),   # w1
            (14, 3, "2024-02-01 00:00:00"),   # no dimension row
            (15, 1, "2023-12-31 00:00:00"),   # before any version
        ],
        "fid long, k long, ts string",
    ).selectExpr("fid", "k", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    out = {
        r["fid"]: r["name"]
        for r in point_in_time_join(
            facts, dim, on=["k"], fact_time="ts", dim_values=["name"]
        ).collect()
    }
    assert out == {10: "v1", 11: "v2", 12: "v2", 13: "w1",
                   14: None, 15: None}


def test_point_in_time_join_suffixes_colliding_columns(spark):
    from mssql_dataframe_spark.operators.joins import point_in_time_join

    dim = spark.createDataFrame(
        [(1, "dimname", "2024-01-01 00:00:00", None)],
        "k long, name string, _valid_from string, _valid_to string",
    ).selectExpr("k", "name",
                 "CAST(_valid_from AS TIMESTAMP_NTZ) AS _valid_from",
                 "CAST(_valid_to AS TIMESTAMP_NTZ) AS _valid_to")
    facts = spark.createDataFrame(
        [(1, "factname", "2024-02-01 00:00:00")], "k long, name string, ts string"
    ).selectExpr("k", "name", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    row = point_in_time_join(
        facts, dim, on=["k"], fact_time="ts", dim_values=["name"]
    ).collect()[0]
    assert row["name"] == "factname" and row["name_pit"] == "dimname"
