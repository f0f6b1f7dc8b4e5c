"""Incremental MV maintenance: delta-applied aggregate must equal a
full recompute, including group-key moves and emptied groups."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark.operators.incremental import (
    agg_delta,
    apply_agg_delta,
)

COLS = {"id": "bigint", "grp": "nvarchar(10)", "amt": "decimal(10,2)"}


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, grp=g, amt=Decimal(a)) for i, g, a in rows],
        "id long, grp string, amt decimal(10,2)",
    )


def _mv(df):
    return df.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("amt").alias("sum_amt"),
    )


def test_incremental_equals_recompute_with_group_moves(engine, spark):
    base = _df(
        spark,
        [(1, "a", "10.00"), (2, "a", "20.00"), (3, "b", "30.00"),
         (4, "c", "40.00")],
    )
    engine.create.table("dbo.f", COLS, primary_key_column="id")
    engine.write.insert("dbo.f", base)
    v_ins = engine.store.meta("dbo.f").version  # create=v0, insert=v1
    mv0 = _mv(engine.read.table("dbo.f", version=v_ins))
    # update 1 in place, MOVE 2 from group a to b, delete 3 (emptying
    # nothing), delete 4 (emptying group c), insert 5 into new group d
    final = _df(
        spark,
        [(1, "a", "11.00"), (2, "b", "20.00"), (5, "d", "50.00")],
    )
    engine.write.merge("dbo.f", final, match_columns=["id"])
    cdc = engine.read.table_changes("dbo.f", from_version=v_ins)
    delta = agg_delta(cdc, ["grp"], {"sum_amt": "amt"})
    mv = apply_agg_delta(mv0, delta, ["grp"], ["sum_amt"])
    got = sorted(
        (r.grp, r.n_rows, str(r.sum_amt)) for r in mv.collect()
    )
    want = sorted(
        (r.grp, r.n_rows, str(r.sum_amt))
        for r in _mv(engine.read.table("dbo.f")).collect()
    )
    assert got == want
    # group c emptied -> dropped; group d new -> present
    groups = {g for g, _, _ in got}
    assert "c" not in groups and "d" in groups


def test_noop_changes_produce_empty_delta(engine, spark):
    base = _df(spark, [(1, "a", "10.00")])
    engine.create.table("dbo.f2", COLS, primary_key_column="id")
    engine.write.insert("dbo.f2", base)
    v_ins = engine.store.meta("dbo.f2").version
    engine.write.update("dbo.f2", base)  # no values change
    cdc = engine.read.table_changes("dbo.f2", from_version=v_ins)
    delta = agg_delta(cdc, ["grp"], {"sum_amt": "amt"})
    assert delta.count() == 0
    mv0 = _mv(engine.read.table("dbo.f2", version=v_ins))
    mv = apply_agg_delta(mv0, delta, ["grp"], ["sum_amt"])
    assert [(r.grp, r.n_rows) for r in mv.collect()] == [("a", 1)]


def test_null_group_key_deltas_apply(engine, spark):
    """NULL group keys are real MV groups: a delete from the NULL
    group must decrement it (not be silently dropped by a non-null-
    safe join), and an insert into it must merge, not duplicate."""
    base = _df(
        spark,
        [(1, None, "10.00"), (2, None, "5.00"), (3, "a", "1.00")],
    )
    engine.create.table("dbo.f3", COLS, primary_key_column="id")
    engine.write.insert("dbo.f3", base)
    v_ins = engine.store.meta("dbo.f3").version
    engine.write.delete(
        "dbo.f3", spark.createDataFrame([Row(id=1)], "id long")
    )
    engine.write.insert("dbo.f3", _df(spark, [(4, None, "2.00")]))
    cdc = engine.read.table_changes("dbo.f3", from_version=v_ins)
    delta = agg_delta(cdc, ["grp"], {"sum_amt": "amt"})
    mv0 = _mv(engine.read.table("dbo.f3", version=v_ins))
    mv = apply_agg_delta(mv0, delta, ["grp"], ["sum_amt"])
    got = sorted(
        ((r.grp, r.n_rows, r.sum_amt) for r in mv.collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    want = sorted(
        ((r.grp, r.n_rows, r.sum_amt)
         for r in _mv(engine.read.table("dbo.f3")).collect()),
        key=lambda t: (t[0] is None, t[0]),
    )
    assert got == want
    # exactly ONE null-key group row, with the merged totals
    nulls = [t for t in got if t[0] is None]
    assert len(nulls) == 1
    assert nulls[0][1] == 2 and nulls[0][2] == Decimal("7.00")
