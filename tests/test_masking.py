"""Dynamic Data Masking (core/masking.py — SQL Server DDM analog):
metadata-only policies, read-time built-in-expression masks, UNMASK
bypass, NULL passthrough, predicate-on-real-values semantics."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from mssql_dataframe_spark import errors


def _mk(engine, spark):
    engine.create.table(
        "dbo.ddm",
        {
            "id": "bigint",
            "name": "nvarchar(40)",
            "bal": "float",
            "mail": "nvarchar(60)",
            "born": "date",
        },
        primary_key_column="id",
    )
    engine.write.insert(
        "dbo.ddm",
        spark.createDataFrame(
            [
                Row(id=1, name="Alexander", bal=123.5, mail="alex@x.io",
                    born=datetime.date(1991, 4, 2)),
                Row(id=2, name="Bo", bal=7.25, mail="bo@y.co",
                    born=datetime.date(1988, 9, 9)),
                Row(id=3, name=None, bal=None, mail=None, born=None),
            ],
            "id long, name string, bal double, mail string, born date",
        ),
    )


def _add_masks(engine):
    engine.modify.masking_policy("dbo.ddm", "add", "name", "partial(2,'...',3)")
    engine.modify.masking_policy("dbo.ddm", "add", "bal", "default()")
    engine.modify.masking_policy("dbo.ddm", "add", "mail", "email()")
    engine.modify.masking_policy("dbo.ddm", "add", "born", "default()")


def test_masks_apply_on_read(engine, spark):
    _mk(engine, spark)
    _add_masks(engine)
    rows = {r["id"]: r for r in engine.read.table("dbo.ddm").collect()}
    assert rows[1]["name"] == "Al...der"
    assert rows[2]["name"] == "..."  # too short to expose both ends
    assert rows[1]["bal"] == 0.0 and rows[2]["bal"] == 0.0
    assert rows[1]["mail"] == "aXXX@XXXX.com"
    assert rows[1]["born"] == datetime.date(1900, 1, 1)
    # NULLs stay NULL (SQL Server masks only non-NULL values)
    assert rows[3]["name"] is None and rows[3]["bal"] is None
    assert rows[3]["mail"] is None and rows[3]["born"] is None


def test_unmask_bypasses_and_storage_keeps_real_values(engine, spark):
    _mk(engine, spark)
    _add_masks(engine)
    rows = {r["id"]: r for r in
            engine.read.table("dbo.ddm", unmask=True).collect()}
    assert rows[1]["name"] == "Alexander" and rows[1]["bal"] == 123.5


def test_where_filters_on_real_values(engine, spark):
    _mk(engine, spark)
    _add_masks(engine)
    out = engine.read.table("dbo.ddm", where="bal > 100").collect()
    assert len(out) == 1 and out[0]["id"] == 1 and out[0]["bal"] == 0.0


def test_drop_and_validation(engine, spark):
    _mk(engine, spark)
    _add_masks(engine)
    engine.modify.masking_policy("dbo.ddm", "drop", "name")
    rows = {r["id"]: r for r in engine.read.table("dbo.ddm").collect()}
    assert rows[1]["name"] == "Alexander"  # unmasked again
    assert rows[1]["bal"] == 0.0  # other policies still active
    with pytest.raises(ValueError, match="unsupported mask function"):
        engine.modify.masking_policy("dbo.ddm", "add", "name", "random(1,9)")
    with pytest.raises(errors.SQLColumnDoesNotExist):
        engine.modify.masking_policy("dbo.ddm", "add", "ghost", "default()")
