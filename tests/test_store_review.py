"""Round-11 store.py review pins: catalog-poisoning and collision
contracts the dedicated single-file review surfaced.

- ``update_meta`` with a typo'd field name must fail fast instead of
  json-dumping an unknown attribute into ``_meta.json`` (which would
  make every later ``meta()`` raise ``TypeError`` — a bricked table).
- ``clone`` / ``import_table`` must reject a destination that exists
  as a VIEW (same contract ``create`` already enforces) — otherwise
  the path becomes both view and table and reads resolve
  inconsistently.
- ``clone`` on a no-hardlink filesystem degrades to a byte copy
  instead of dying with a raw OSError.
"""

from __future__ import annotations

import os

import pytest


def _mk(engine, spark, name="dbo.src"):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string")
    engine.create.table_from_dataframe(name, df, primary_key="id")
    engine.write.insert(name, df)
    return df


def test_update_meta_unknown_key_fails_fast_and_table_survives(
    engine, spark
):
    _mk(engine, spark)
    with pytest.raises(AttributeError, match="not a TableMeta field"):
        engine.store.update_meta("dbo.src", identity_nxet=5)  # typo
    # the catalog must be untouched: meta() still parses and reads work
    assert engine.store.meta("dbo.src").identity_next == 1
    assert engine.read.table("dbo.src").count() == 2


def test_clone_rejects_view_name(engine, spark):
    _mk(engine, spark)
    engine.create.view("dbo.v_src", "dbo.src")
    with pytest.raises(ValueError, match="already exists"):
        engine.store.clone("dbo.src", "dbo.v_src")
    # the view is intact (no manifest/meta leaked into its directory)
    assert engine.store.is_view("dbo.v_src")
    assert not engine.store.exists("dbo.v_src")


def test_import_table_rejects_view_name(engine, spark, tmp_path):
    _mk(engine, spark)
    engine.create.view("dbo.v_src", "dbo.src")
    out = os.path.join(str(tmp_path), "export")
    engine.store.export_table("dbo.src", out)
    with pytest.raises(ValueError, match="already exists"):
        engine.store.import_table("dbo.v_src", out)
    assert engine.store.is_view("dbo.v_src")
    assert not engine.store.exists("dbo.v_src")


def test_clone_falls_back_to_copy_without_hardlinks(
    engine, spark, monkeypatch
):
    _mk(engine, spark)

    def no_link(src, dst, **kw):
        raise OSError(95, "Operation not supported")

    import mssql_dataframe_spark.store as store_mod

    monkeypatch.setattr(store_mod.os, "link", no_link)
    engine.store.clone("dbo.src", "dbo.dst")
    got = sorted(
        map(tuple, engine.read.table("dbo.dst").select("id", "val").collect())
    )
    assert got == [(1, "a"), (2, "b")]
    # the clone is independent: dropping the source leaves it readable
    engine.store.drop("dbo.src")
    assert engine.read.table("dbo.dst").count() == 2
