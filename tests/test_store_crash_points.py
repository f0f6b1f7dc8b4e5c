"""Systematic crash-point sweep of the commit protocol.

The store documents a specific failure story for each step of
``stage -> validate -> claim -> publish -> meta swap``: readers always
see a complete old-or-new snapshot, losers discard their staging, and
a crash AFTER the claim leaves an orphan manifest whose removal is the
documented recovery. Each test injects a crash at one step and asserts
exactly that story — not just "no exception leaked"."""

from __future__ import annotations

import os

import pytest

from mssql_dataframe_spark.errors import SQLConcurrentWriteConflict


def _mk(engine, spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    engine.create.table(
        "dbo.cr", {"id": "bigint", "v": "nvarchar(10)"},
        primary_key_column="id",
    )
    engine.write.insert("dbo.cr", df)
    return df


def _stage_dirs(store):
    tdir = store._table_dir("dbo.cr")
    return [d for d in os.listdir(tdir) if d.startswith(".stage_")]


def _snapshot(engine):
    return sorted(
        map(tuple, engine.read.table("dbo.cr").select("id", "v").collect())
    )


def test_crash_before_claim_discards_staging(engine, spark, monkeypatch):
    _mk(engine, spark)
    before = _snapshot(engine)
    store = engine.store

    def boom(*a, **k):
        raise RuntimeError("injected: pre-claim crash")

    monkeypatch.setattr(store, "_check_no_concurrent_commit", boom)
    with pytest.raises(RuntimeError, match="pre-claim"):
        engine.write.insert(
            "dbo.cr",
            spark.createDataFrame([(3, "c")], "id long, v string"),
        )
    monkeypatch.undo()
    # staging discarded, table unchanged, next write clean
    assert not _stage_dirs(store)
    assert _snapshot(engine) == before
    engine.write.insert(
        "dbo.cr", spark.createDataFrame([(3, "c")], "id long, v string")
    )
    assert len(_snapshot(engine)) == 3


@pytest.mark.parametrize("step", ["publish", "meta"])
def test_crash_after_claim_leaves_recoverable_orphan(
    engine, spark, monkeypatch, step
):
    """A crash between the exclusive claim and the finished meta swap
    leaves the OLD snapshot fully readable and an orphan manifest at
    the claimed version; the next writer surfaces it with the
    documented actionable conflict, and removing the orphan
    recovers."""
    _mk(engine, spark)
    store = engine.store
    before = _snapshot(engine)
    v0 = store.meta("dbo.cr").version
    target = (
        store._publish_staged if step == "publish" else store._write_meta
    )

    calls = {"n": 0}
    orig = target

    def boom(*a, **k):
        if step == "meta":
            # the table was created through _write_meta too; only the
            # commit-time call (version advanced) must crash
            calls["n"] += 1
        raise RuntimeError(f"injected: {step} crash")

    if step == "publish":
        monkeypatch.setattr(store, "_publish_staged", boom)
    else:
        monkeypatch.setattr(store, "_write_meta", boom)
    with pytest.raises(RuntimeError, match=step):
        engine.write.insert(
            "dbo.cr",
            spark.createDataFrame([(3, "c")], "id long, v string"),
        )
    monkeypatch.undo()

    # readers still see the complete old snapshot
    assert store.meta("dbo.cr").version == v0
    assert _snapshot(engine) == before
    # the claimed manifest is an orphan; the next write names it
    orphan = store._manifest_path("dbo.cr", v0 + 1)
    assert os.path.exists(orphan)
    with pytest.raises(SQLConcurrentWriteConflict, match="orphan|concurrent"):
        engine.write.insert(
            "dbo.cr",
            spark.createDataFrame([(4, "d")], "id long, v string"),
        )
    # documented recovery: remove the orphan, retry succeeds
    os.remove(orphan)
    engine.write.insert(
        "dbo.cr", spark.createDataFrame([(4, "d")], "id long, v string")
    )
    got = _snapshot(engine)
    assert (4, "d") in got and before[0] in got


def test_vacuum_reaps_stale_staging_only(engine, spark):
    """A writer killed mid-staging leaves a .stage_* directory no
    guard can clean; vacuum reaps it once it is provably stale
    (age-gated), while a fresh directory — possibly a live writer's —
    is left alone."""
    import time

    _mk(engine, spark)
    store = engine.store
    tdir = store._table_dir("dbo.cr")
    stale = os.path.join(tdir, ".stage_deadbeef")
    fresh = os.path.join(tdir, ".stage_cafebabe")
    os.makedirs(stale)
    os.makedirs(fresh)
    old = time.time() - 48 * 3600
    os.utime(stale, (old, old))
    engine.vacuum("dbo.cr")
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)
    # the table itself is untouched
    assert engine.read.table("dbo.cr").count() == 2
