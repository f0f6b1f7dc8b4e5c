"""write.ingest_directory with engine-managed columns: computed and
identity columns must not be read from landed files — they are
recomputed/assigned by the insert path."""

from __future__ import annotations

import os

from pyspark.sql import Row


def test_ingest_with_computed_and_identity(engine, spark, tmp_path):
    engine.create.table(
        "dbo.ing",
        {"qty": "int", "price": "float"},
        sql_primary_key=True,  # adds the identity _pk, engine-assigned
    )
    engine.modify.computed_column(
        "dbo.ing", "add", "total", "qty * price", "float"
    )
    land = str(tmp_path / "land")
    spark.createDataFrame(
        [Row(qty=2, price=10.0), Row(qty=3, price=4.0)],
        "qty int, price double",
    ).coalesce(1).write.parquet(os.path.join(land, "w1"))
    assert engine.write.ingest_directory("dbo.ing", land) == 1
    rows = sorted(
        (r["qty"], r["price"], r["total"], r["_pk"])
        for r in engine.read.table("dbo.ing").collect()
    )
    assert [(q, p, t) for q, p, t, _ in rows] == [(2, 10.0, 20.0), (3, 4.0, 12.0)]
    assert sorted(pk for _, _, _, pk in rows) == [1, 2]  # identity assigned
    # second wave: identity continues, computed recomputes
    spark.createDataFrame([Row(qty=5, price=2.0)], "qty int, price double"
                          ).coalesce(1).write.parquet(os.path.join(land, "w2"))
    assert engine.write.ingest_directory("dbo.ing", land) == 1
    got = {r["_pk"]: r["total"] for r in engine.read.table("dbo.ing").collect()}
    assert got[3] == 10.0
