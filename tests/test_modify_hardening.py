"""Schema-evolution DDL hardening (round-10 review findings on
core/modify.py): duplicate-add guard, NOT NULL add/alter audits and
bookkeeping sync, PK/identity drop guards, self-FK rename, cross-table
parent-column dependencies, FK audit-before-publish, child-scoped
implied uniques, and identifier-exact dependency matching."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mssql_dataframe_spark import errors


def _mk(engine, name="dbo.mh", extra=None, rows=((1, 10), (2, 20))):
    cols = {"id": "bigint", "v": "int", **(extra or {})}
    engine.create.table(name, cols, primary_key_column="id")
    if rows:
        engine.write.insert(
            name,
            engine.spark.createDataFrame(
                [Row(id=i, v=v) for i, v in rows], "id long, v int"
            ),
        )
    return name


def test_add_existing_column_raises(engine, spark):
    t = _mk(engine)
    with pytest.raises(ValueError, match="already exists"):
        engine.modify.column(t, "add", "v", "int")


def test_add_not_null_to_nonempty_refused_empty_ok(engine, spark):
    t = _mk(engine)
    with pytest.raises(ValueError, match="NOT NULL"):
        engine.modify.column(t, "add", "w", "int", is_nullable=False)
    e = "dbo.mh_empty"
    engine.create.table(e, {"id": "bigint"}, primary_key_column="id")
    engine.modify.column(e, "add", "w", "int", is_nullable=False)
    assert "w" in engine.store.meta(e).not_nullable
    # the write path now enforces it
    with pytest.raises(errors.DataframeColumnInvalidValue):
        engine.write.insert(
            e,
            spark.createDataFrame([Row(id=1, w=None)], "id long, w int"),
        )


def test_alter_to_not_null_audits_existing_nulls(engine, spark):
    t = _mk(engine, rows=())
    engine.write.insert(
        t, spark.createDataFrame([Row(id=1, v=None)], "id long, v int")
    )
    with pytest.raises(ValueError, match="existing rows hold NULL"):
        engine.modify.column(t, "alter", "v", "bigint", is_nullable=False)


def test_alter_nullability_syncs_write_enforcement(engine, spark):
    t = _mk(engine)
    engine.modify.column(t, "alter", "v", "bigint", is_nullable=False)
    assert "v" in engine.store.meta(t).not_nullable
    with pytest.raises(errors.DataframeColumnInvalidValue):
        engine.write.insert(
            t, spark.createDataFrame([Row(id=3, v=None)], "id long, v bigint")
        )
    # loosening releases the write-path enforcement too
    engine.modify.column(t, "alter", "v", "bigint", is_nullable=True)
    assert "v" not in engine.store.meta(t).not_nullable
    engine.write.insert(
        t, spark.createDataFrame([Row(id=4, v=None)], "id long, v bigint")
    )


def test_drop_primary_key_or_identity_column_refused(engine, spark):
    t = _mk(engine)
    with pytest.raises(ValueError, match="primary key"):
        engine.modify.column(t, "drop", "id")
    it = "dbo.mh_ident"
    engine.create.table(it, {"v": "int"}, sql_primary_key=True)
    ident = engine.store.meta(it).identity_column
    engine.modify.primary_key(it, "drop")
    with pytest.raises(ValueError, match="identity"):
        engine.modify.column(it, "drop", ident)


def test_drop_cleans_stats_and_not_nullable_bookkeeping(engine, spark):
    t = "dbo.mh_stats"
    engine.create.table(
        t, {"id": "bigint", "v": "int"}, primary_key_column="id",
        not_nullable=["v"],
    )
    engine.write.insert(
        t, engine.spark.createDataFrame([Row(id=1, v=5)], "id long, v int")
    )
    props = dict(engine.store.meta(t).properties)
    props["stats_columns"] = ["v"]
    engine.store.update_meta(t, properties=props)
    engine.modify.column(t, "drop", "v")
    meta = engine.store.meta(t)
    assert "v" not in meta.not_nullable
    assert "v" not in (meta.properties.get("stats_columns") or [])


def test_dependency_match_is_identifier_exact(engine, spark):
    t = "dbo.mh_sub"
    engine.create.table(
        t, {"id": "bigint", "order_id": "bigint", "v": "int"},
        primary_key_column="order_id",
    )
    engine.modify.check_constraint(t, "add", "ck1", "order_id > 0")
    # 'id' is a substring of 'order_id' but nothing references it
    engine.modify.column(t, "drop", "id")
    # the genuinely referenced column still blocks
    with pytest.raises(ValueError, match="check constraint"):
        engine.modify.rename_column(t, "order_id", "oid")


def test_rename_table_rewrites_self_fk(engine, spark):
    t = "dbo.emp"
    engine.create.table(
        t, {"id": "bigint", "mgr": "bigint"}, primary_key_column="id"
    )
    engine.write.insert(
        t,
        spark.createDataFrame(
            [Row(id=1, mgr=None), Row(id=2, mgr=1)], "id long, mgr long"
        ),
    )
    engine.modify.foreign_key(t, "add", "fk_self", ["mgr"], t, ["id"])
    engine.modify.rename_table(t, "dbo.staff")
    fks = engine.store.meta("dbo.staff").properties["foreign_keys"]
    assert fks["fk_self"]["ref_table"] == "dbo.staff"
    # the FK still enforces against the renamed parent
    with pytest.raises(errors.SQLForeignKeyViolation):
        engine.write.insert(
            "dbo.staff",
            spark.createDataFrame([Row(id=9, mgr=99)], "id long, mgr long"),
        )


def test_parent_pk_rename_blocked_by_child_fk(engine, spark):
    p, c = "dbo.mh_parent", "dbo.mh_child"
    engine.create.table(p, {"id": "bigint"}, primary_key_column="id")
    engine.write.insert(p, spark.createDataFrame([Row(id=1)], "id long"))
    engine.create.table(
        c, {"cid": "bigint", "pid": "bigint"}, primary_key_column="cid"
    )
    engine.modify.foreign_key(c, "add", "fk1", ["pid"], p, ["id"])
    with pytest.raises(ValueError, match="foreign key 'fk1' on dbo.mh_child"):
        engine.modify.rename_column(p, "id", "key")


def test_fk_audit_failure_leaves_no_implied_unique(engine, spark):
    p, c = "dbo.mh_p2", "dbo.mh_c2"
    engine.create.table(
        p, {"id": "bigint", "ux": "bigint"}, primary_key_column="id"
    )
    engine.write.insert(
        p, spark.createDataFrame([Row(id=1, ux=100)], "id long, ux long")
    )
    engine.create.table(
        c, {"cid": "bigint", "x": "bigint"}, primary_key_column="cid"
    )
    # orphan child row -> the FK add's audit must fail...
    engine.write.insert(
        c, spark.createDataFrame([Row(cid=1, x=999)], "cid long, x long")
    )
    with pytest.raises(errors.SQLForeignKeyViolation):
        engine.modify.foreign_key(c, "add", "fk1", ["x"], p, ["ux"])
    # ...WITHOUT leaving a permanent implied unique on the parent
    assert not engine.store.meta(p).properties.get("unique_constraints")


def test_same_named_fks_from_two_children_do_not_collide(engine, spark):
    p = "dbo.mh_p3"
    engine.create.table(
        p, {"id": "bigint", "ux": "bigint", "uy": "bigint"},
        primary_key_column="id",
    )
    engine.write.insert(
        p,
        spark.createDataFrame(
            [Row(id=1, ux=10, uy=20)], "id long, ux long, uy long"
        ),
    )
    for child, col, ref in (("dbo.mh_ca", "a", "ux"), ("dbo.mh_cb", "b", "uy")):
        engine.create.table(
            child, {"cid": "bigint", col: "bigint"}, primary_key_column="cid"
        )
        engine.modify.foreign_key(child, "add", "fk1", [col], p, [ref])
    uqs = engine.store.meta(p).properties["unique_constraints"]
    assert len(uqs) == 2 and {tuple(v) for v in uqs.values()} == {
        ("ux",), ("uy",)
    }
    # dropping one child's fk releases only ITS implied unique
    engine.modify.foreign_key("dbo.mh_ca", "drop", "fk1")
    uqs = engine.store.meta(p).properties["unique_constraints"]
    assert len(uqs) == 1 and list(uqs.values())[0] == ["uy"]


def test_computed_drop_blocked_keeps_column_managed(engine, spark):
    t = "dbo.mh_comp"
    engine.create.table(
        t, {"id": "bigint", "a": "int"}, primary_key_column="id"
    )
    engine.write.insert(
        t, spark.createDataFrame([Row(id=1, a=2)], "id long, a int")
    )
    engine.modify.computed_column(t, "add", "c1", "a + 1")
    engine.modify.computed_column(t, "add", "c2", "c1 + 1")
    with pytest.raises(ValueError, match="computed column 'c2'"):
        engine.modify.computed_column(t, "drop", "c1")
    # c1 must still be registered (writes keep recomputing it)
    assert "c1" in engine.store.meta(t).properties["computed_columns"]
    engine.modify.computed_column(t, "drop", "c2")
    engine.modify.computed_column(t, "drop", "c1")
    assert "c1" not in engine.store.meta(t).spark_schema.fieldNames()
