"""Round-11 hardening pins: time-travel retype projection, atomic
not_nullable bookkeeping (extra_meta), computed-column stats cleanup,
live views surviving a table rename, and the no-hardlink manifest
claim publishing complete content."""

from __future__ import annotations

import json
import os

import pytest

from mssql_dataframe_spark.errors import SQLConcurrentWriteConflict


def test_time_travel_retype_only_projects_current_type(engine, spark):
    """A version that differs from the current schema ONLY by a column
    retype (same names) must still reproject: the snapshot surfaces
    today's type, per the documented contract."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "id long, val bigint")
    engine.create.table_from_dataframe("dbo.rt", df, primary_key="id")
    engine.write.insert("dbo.rt", df)
    v_ins = engine.store.meta("dbo.rt").version
    engine.modify.column("dbo.rt", "alter", "val", "varchar(10)")
    snap = engine.read.table("dbo.rt", version=v_ins)
    assert dict(snap.dtypes)["val"] == "string"
    assert {r["id"]: r["val"] for r in snap.collect()} == {1: "10", 2: "20"}


def test_time_travel_retype_snapshot_honors_current_row_filter(engine, spark):
    """Row filters are declared against the CURRENT schema; a retyped
    snapshot must be readable under a predicate that assumes the new
    type."""
    df = spark.createDataFrame([(1, 5), (2, 500)], "id long, val bigint")
    engine.create.table_from_dataframe("dbo.rtf", df, primary_key="id")
    engine.write.insert("dbo.rtf", df)
    v_ins = engine.store.meta("dbo.rtf").version
    engine.modify.column("dbo.rtf", "alter", "val", "varchar(10)")
    engine.modify.row_filter_policy("dbo.rtf", "add", "short", "val < '50'")
    got = engine.read.table("dbo.rtf", version=v_ins).collect()
    assert [r["id"] for r in got] == [1]


def test_alter_nullability_publishes_with_the_commit(engine, spark, monkeypatch):
    """not_nullable bookkeeping rides the alter commit itself — no
    separate post-commit update_meta whose loss would desync
    write-path NOT NULL enforcement."""
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    engine.create.table_from_dataframe("dbo.nn", df, primary_key="id")
    engine.write.insert("dbo.nn", df)

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("not_nullable must ride the commit")

    monkeypatch.setattr(engine.store, "update_meta", boom)
    engine.modify.column("dbo.nn", "alter", "val", "varchar(10)",
                         is_nullable=False)
    assert "val" in engine.store.meta("dbo.nn").not_nullable
    engine.modify.column("dbo.nn", "alter", "val", "varchar(20)",
                         is_nullable=True)
    assert "val" not in engine.store.meta("dbo.nn").not_nullable


def test_drop_not_null_column_cleans_key_atomically(engine, spark, monkeypatch):
    """Dropping a NOT NULL column publishes the key cleanup in the
    same commit; a stale ghost entry would make the missing-NOT-NULL
    probes reject every subsequent write."""
    df = spark.createDataFrame([(1, "a", "b")],
                               "id long, val string, extra string")
    engine.create.table_from_dataframe("dbo.nnd", df, primary_key="id")
    engine.write.insert("dbo.nnd", df)
    engine.modify.column("dbo.nnd", "alter", "extra", "varchar(10)",
                         is_nullable=False)

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("not_nullable must ride the commit")

    monkeypatch.setattr(engine.store, "update_meta", boom)
    engine.modify.column("dbo.nnd", "drop", "extra")
    assert "extra" not in engine.store.meta("dbo.nnd").not_nullable
    monkeypatch.undo()
    # the write path accepts batches without the dropped column
    engine.write.insert(
        "dbo.nnd", spark.createDataFrame([(2, "c")], "id long, val string")
    )
    assert engine.read.table("dbo.nnd").count() == 2


def test_drop_computed_column_clears_stats_bookkeeping(engine, spark):
    """Dropping a persisted computed column that became a z-order
    stats column must also retire its stats entries — a ghost column
    must not keep driving file pruning or table_stats."""
    df = spark.createDataFrame([(i, i * 2) for i in range(10)],
                               "id long, x long")
    engine.create.table_from_dataframe("dbo.cc", df, primary_key="id")
    engine.write.insert("dbo.cc", df)
    engine.modify.computed_column("dbo.cc", "add", "x2", "x + 1", "bigint")
    engine.store.optimize_zorder("dbo.cc", ["x2", "x"])
    props = engine.store.meta("dbo.cc").properties
    assert "x2" in (props.get("stats_columns") or [])
    engine.modify.computed_column("dbo.cc", "drop", "x2")
    props = engine.store.meta("dbo.cc").properties
    assert "x2" not in (props.get("stats_columns") or [])
    assert props.get("stats_column") != "x2"
    assert "x2" not in engine.store.meta("dbo.cc").spark_schema.fieldNames()


def test_rename_table_migrates_live_views(engine, spark):
    """A live view registered on a table keeps refreshing after the
    table is renamed (it must not serve the pre-rename frozen file
    list)."""
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    engine.create.table_from_dataframe("dbo.rv", df, primary_key="id")
    engine.write.insert("dbo.rv", df)
    view = engine.register_view("dbo.rv", "rv_live_view")
    engine.modify.rename_table("dbo.rv", "dbo.rv2")
    engine.write.insert(
        "dbo.rv2", spark.createDataFrame([(2, "b")], "id long, val string")
    )
    got = spark.sql(f"SELECT count(*) AS c FROM {view}").collect()[0]["c"]
    assert got == 2
    assert engine.store._live_views.get("dbo.rv") is None
    spark.catalog.dropTempView(view)


def test_manifest_claim_publishes_complete_json_without_hardlinks(
    engine, spark, monkeypatch
):
    """On filesystems without os.link the claim falls back to
    O_CREAT|O_EXCL + rename: the published manifest is complete valid
    JSON (no short-write truncation) and commits still work
    end-to-end."""
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    engine.create.table_from_dataframe("dbo.nl", df, primary_key="id")

    def no_link(src, dst, *a, **k):
        raise OSError(95, "Operation not supported")

    monkeypatch.setattr(os, "link", no_link)
    engine.write.insert("dbo.nl", df)
    meta = engine.store.meta("dbo.nl")
    with open(engine.store._manifest_path("dbo.nl", meta.version)) as f:
        data = json.load(f)
    assert len(data["files"]) >= 1
    assert data["commit"]["op"] == "append"
    assert engine.read.table("dbo.nl").count() == 1


def test_manifest_claim_still_excludes_without_hardlinks(
    engine, spark, monkeypatch
):
    """The O_EXCL fallback is still a put-if-absent claim: a second
    writer of the same version fails cleanly."""
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    engine.create.table_from_dataframe("dbo.nl2", df, primary_key="id")

    def no_link(src, dst, *a, **k):
        raise OSError(95, "Operation not supported")

    monkeypatch.setattr(os, "link", no_link)
    s = engine.store
    v = s.meta("dbo.nl2").version + 1
    s._write_manifest("dbo.nl2", v, [], commit={"op": "t"}, exclusive=True)
    with pytest.raises(SQLConcurrentWriteConflict):
        s._write_manifest("dbo.nl2", v, [], commit={"op": "t"},
                          exclusive=True)
