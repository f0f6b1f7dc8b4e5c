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


def _mv_minmax(df):
    return df.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("amt").alias("min_amt"),
        F.max("amt").alias("max_amt"),
    )


def test_minmax_partial_rescan_equals_recompute(engine, spark):
    """Deletes of the extremum (endangered keys -> rescan), deletes of
    non-extremum values (safe), inserts tightening min/max (safe),
    group moves, emptied groups, and fresh groups — all must equal the
    full recompute."""
    from mssql_dataframe_spark.operators.incremental import (
        apply_minmax_delta,
    )

    base = _df(
        spark,
        [
            (1, "a", "10.00"), (2, "a", "20.00"), (3, "a", "30.00"),
            (4, "b", "5.00"), (5, "b", "50.00"),
            (6, "c", "70.00"),
            (7, "e", "1.00"), (8, "e", "2.00"),
        ],
    )
    engine.create.table("dbo.fm", COLS, primary_key_column="id")
    engine.write.insert("dbo.fm", base)
    v_ins = engine.store.meta("dbo.fm").version
    mv0 = _mv_minmax(engine.read.table("dbo.fm", version=v_ins))
    # a: delete id=1 (the MIN -> endangered, rescan) keep 2,3
    # b: delete id=5 (the MAX -> endangered), insert id=9 40.00
    # c: delete id=6 (empties the group -> drops out)
    # d: fresh group via id=10
    # e: update id=7 1.00 -> 1.50 (old value WAS the min -> endangered),
    #    id=8 moves e -> a (endangers e's max, tightens a's... nothing)
    final = _df(
        spark,
        [
            (2, "a", "20.00"), (3, "a", "30.00"),
            (4, "b", "5.00"), (9, "b", "40.00"),
            (10, "d", "60.00"),
            (7, "e", "1.50"), (8, "a", "2.00"),
        ],
    )
    engine.write.merge("dbo.fm", final, match_columns=["id"])
    cdc = engine.read.table_changes("dbo.fm", from_version=v_ins)
    post = engine.read.table("dbo.fm")
    mv = apply_minmax_delta(
        mv0, cdc, post, ["grp"], "amt",
        min_col="min_amt", max_col="max_amt",
    )
    got = sorted(
        (r.grp, r.n_rows, str(r.min_amt), str(r.max_amt))
        for r in mv.collect()
    )
    want = sorted(
        (r.grp, r.n_rows, str(r.min_amt), str(r.max_amt))
        for r in _mv_minmax(post).collect()
    )
    assert got == want


def test_minmax_null_values_and_insert_only(engine, spark):
    """NULL fact values count toward n_rows but not min/max; an
    insert-only load never rescans (endangered requires a delete)."""
    from pyspark.sql import Row
    from decimal import Decimal

    from mssql_dataframe_spark.operators.incremental import (
        apply_minmax_delta,
    )

    def df_(rows):
        return spark.createDataFrame(
            [Row(id=i, grp=g, amt=None if a is None else Decimal(a))
             for i, g, a in rows],
            "id long, grp string, amt decimal(10,2)",
        )

    base = df_([(1, "a", None), (2, "a", "20.00")])
    engine.create.table("dbo.fn", COLS, primary_key_column="id")
    engine.write.insert("dbo.fn", base)
    v_ins = engine.store.meta("dbo.fn").version
    mv0 = _mv_minmax(engine.read.table("dbo.fn", version=v_ins))
    engine.write.insert("dbo.fn", df_([(3, "a", "5.00"), (4, "x", None)]))
    cdc = engine.read.table_changes("dbo.fn", from_version=v_ins)
    post = engine.read.table("dbo.fn")
    mv = apply_minmax_delta(
        mv0, cdc, post, ["grp"], "amt",
        min_col="min_amt", max_col="max_amt",
    )
    got = sorted(
        (r.grp, r.n_rows, str(r.min_amt), str(r.max_amt))
        for r in mv.collect()
    )
    want = sorted(
        (r.grp, r.n_rows, str(r.min_amt), str(r.max_amt))
        for r in _mv_minmax(post).collect()
    )
    assert got == want


def test_distinct_count_two_level_mv_equals_recompute(engine, spark):
    """COUNT(DISTINCT) maintenance via the aux occurrence table:
    deleting a duplicated value keeps the count, deleting the last
    occurrence drops it, NULL transitions follow SQL COUNT(DISTINCT)
    semantics, and untouched keys never recompute."""
    from pyspark.sql import Row
    from decimal import Decimal

    from mssql_dataframe_spark.operators.incremental import (
        apply_distinct_delta,
    )

    def df_(rows):
        return spark.createDataFrame(
            [Row(id=i, grp=g, amt=None if a is None else Decimal(a))
             for i, g, a in rows],
            "id long, grp string, amt decimal(10,2)",
        )

    # a: 10 appears twice + 20 once -> 2 distinct
    # b: 5, NULL -> 1 distinct ; c: 7 -> 1 ; u: untouched key
    base = df_([
        (1, "a", "10.00"), (2, "a", "10.00"), (3, "a", "20.00"),
        (4, "b", "5.00"), (5, "b", None),
        (6, "c", "7.00"),
        (7, "u", "9.00"),
    ])
    engine.create.table("dbo.fd", COLS, primary_key_column="id")
    engine.write.insert("dbo.fd", base)
    v_ins = engine.store.meta("dbo.fd").version
    snap = engine.read.table("dbo.fd", version=v_ins)
    aux0 = (
        snap.filter(F.col("amt").isNotNull())
        .groupBy("grp", "amt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vcnt"))
    )
    mv0 = (
        snap.filter(F.col("amt").isNotNull())
        .groupBy("grp")
        .agg(F.count_distinct("amt").cast("bigint").alias("n_distinct"))
    )
    # a: delete id=1 (dup of 10 -> count stays 2), update id=3 20->30
    # b: update id=4 5->NULL (loses last non-null -> key drops),
    #    update id=5 NULL->6 (gains one)
    # c: delete id=6 (key disappears entirely)
    # d: fresh key with two equal values -> 1 distinct
    final = df_([
        (2, "a", "10.00"), (3, "a", "30.00"),
        (4, "b", None), (5, "b", "6.00"),
        (7, "u", "9.00"),
        (8, "d", "1.00"), (9, "d", "1.00"),
    ])
    engine.write.merge("dbo.fd", final, match_columns=["id"])
    cdc = engine.read.table_changes("dbo.fd", from_version=v_ins)
    mv, aux = apply_distinct_delta(mv0, aux0, cdc, ["grp"], "amt")
    got = sorted((r.grp, r.n_distinct) for r in mv.collect())
    post = engine.read.table("dbo.fd")
    want = sorted(
        (r.grp, r.n)
        for r in post.filter(F.col("amt").isNotNull())
        .groupBy("grp")
        .agg(F.count_distinct("amt").cast("bigint").alias("n"))
        .collect()
    )
    assert got == want
    # the aux table equals a fresh occurrence count of the final state
    want_aux = sorted(
        (r.grp, str(r.amt), r.vcnt)
        for r in post.filter(F.col("amt").isNotNull())
        .groupBy("grp", "amt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vcnt"))
        .collect()
    )
    got_aux = sorted((r.grp, str(r.amt), r.vcnt) for r in aux.collect())
    assert got_aux == want_aux


def test_mv_maintenance_seeded_fuzz_equals_recompute(engine, spark):
    """Seeded randomized load: hundreds of rows mutated with random
    updates/deletes/inserts (value collisions and key churn included),
    then every maintained aggregate family — count/sum, min/max with
    partial rescans, distinct-count via the aux table — must equal a
    full recompute of the final state."""
    import random
    from decimal import Decimal
    from pyspark.sql import Row

    from mssql_dataframe_spark.operators.incremental import (
        agg_delta,
        apply_agg_delta,
        apply_distinct_delta,
        apply_minmax_delta,
    )

    rng = random.Random(0xC0FFEE)
    groups = [f"g{i}" for i in range(12)]
    base_rows = [
        (i, rng.choice(groups),
         None if rng.random() < 0.08 else f"{rng.randrange(1, 40)}.00")
        for i in range(400)
    ]

    def df_(rows):
        return spark.createDataFrame(
            [Row(id=i, grp=g, amt=None if a is None else Decimal(a))
             for i, g, a in rows],
            "id long, grp string, amt decimal(10,2)",
        )

    engine.create.table("dbo.fz", COLS, primary_key_column="id")
    engine.write.insert("dbo.fz", df_(base_rows))
    v_ins = engine.store.meta("dbo.fz").version
    snap = engine.read.table("dbo.fz", version=v_ins)
    mv_cs0 = snap.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("amt").alias("sum_amt"),
    )
    mv_mm0 = _mv_minmax(snap)
    nn0 = snap.filter(F.col("amt").isNotNull())
    aux0 = nn0.groupBy("grp", "amt").agg(
        F.count(F.lit(1)).cast("bigint").alias("vcnt")
    )
    mv_dc0 = nn0.groupBy("grp").agg(
        F.count_distinct("amt").cast("bigint").alias("n_distinct")
    )
    final_rows = []
    for i, g, a in base_rows:
        r = rng.random()
        if r < 0.3:
            continue  # delete
        if r < 0.6:  # update: value churn, occasional key move / NULL
            g2 = rng.choice(groups) if rng.random() < 0.2 else g
            a2 = (None if rng.random() < 0.1
                  else f"{rng.randrange(1, 40)}.00")
            final_rows.append((i, g2, a2))
        else:
            final_rows.append((i, g, a))
    final_rows += [
        (1000 + j, rng.choice(groups + ["h1", "h2"]),
         None if rng.random() < 0.08 else f"{rng.randrange(1, 40)}.00")
        for j in range(80)
    ]
    engine.write.merge("dbo.fz", df_(final_rows), match_columns=["id"])
    cdc = engine.read.table_changes("dbo.fz", from_version=v_ins)
    post = engine.read.table("dbo.fz")

    d = agg_delta(cdc, ["grp"], {"sum_amt": "amt"})
    mv_cs = apply_agg_delta(mv_cs0, d, ["grp"], ["sum_amt"])
    got = sorted((r.grp, r.n_rows, str(r.sum_amt)) for r in mv_cs.collect())
    want = sorted(
        (r.grp, r.n_rows, str(r.sum_amt))
        for r in post.groupBy("grp").agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("amt").alias("sum_amt"),
        ).collect()
    )
    assert got == want

    mv_mm = apply_minmax_delta(
        mv_mm0, cdc, post, ["grp"], "amt",
        min_col="min_amt", max_col="max_amt",
    )
    got = sorted(
        (r.grp, r.n_rows, str(r.min_amt), str(r.max_amt))
        for r in mv_mm.collect()
    )
    want = sorted(
        (r.grp, r.n_rows, str(r.min_amt), str(r.max_amt))
        for r in _mv_minmax(post).collect()
    )
    assert got == want

    mv_dc, aux = apply_distinct_delta(mv_dc0, aux0, cdc, ["grp"], "amt")
    got = sorted((r.grp, r.n_distinct) for r in mv_dc.collect())
    pnn = post.filter(F.col("amt").isNotNull())
    want = sorted(
        (r.grp, r.n)
        for r in pnn.groupBy("grp").agg(
            F.count_distinct("amt").cast("bigint").alias("n")
        ).collect()
    )
    assert got == want
    got_aux = sorted((r.grp, str(r.amt), r.vcnt) for r in aux.collect())
    want_aux = sorted(
        (r.grp, str(r.amt), r.vcnt)
        for r in pnn.groupBy("grp", "amt").agg(
            F.count(F.lit(1)).cast("bigint").alias("vcnt")
        ).collect()
    )
    assert got_aux == want_aux


def _topk(df, k=2):
    from pyspark.sql.window import Window

    w = Window.partitionBy("grp").orderBy(
        F.col("amt").desc(), F.col("id").desc()
    )
    return (
        df.filter(F.col("amt").isNotNull())
        .select("grp", "id", "amt")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def test_topk_mv_rescan_and_merge_branches(engine, spark):
    """Top-k maintenance: deleting a member rescans its key, inserting
    a promoting value merges in-frame, sub-boundary churn is ignored,
    untouched keys pass through, NULL transitions follow the
    non-ranking contract."""
    from mssql_dataframe_spark.operators.incremental import (
        apply_topk_delta,
    )

    base = _df(
        spark,
        [
            (1, "a", "10.00"), (2, "a", "20.00"), (3, "a", "30.00"),
            (4, "b", "5.00"), (5, "b", "50.00"), (6, "b", "60.00"),
            (7, "u", "9.00"),
            (8, "m", "10.00"), (9, "m", "20.00"), (10, "m", "1.00"),
        ],
    )
    engine.create.table("dbo.ft", COLS, primary_key_column="id")
    engine.write.insert("dbo.ft", base)
    v_ins = engine.store.meta("dbo.ft").version
    mv0 = _topk(engine.read.table("dbo.ft", version=v_ins))
    # a: delete id=3 (the TOP member -> rescan; new top-2 = 20, 10)
    # b: delete id=4 (below boundary 50 -> merge branch, members keep),
    #    insert id=11 70.00 (promotes over 60)
    # m: insert id=12 15.00 (between member 10 and 20 -> displaces 10)
    # u: untouched
    final = _df(
        spark,
        [
            (1, "a", "10.00"), (2, "a", "20.00"),
            (5, "b", "50.00"), (6, "b", "60.00"), (11, "b", "70.00"),
            (7, "u", "9.00"),
            (8, "m", "10.00"), (9, "m", "20.00"), (10, "m", "1.00"),
            (12, "m", "15.00"),
        ],
    )
    engine.write.merge("dbo.ft", final, match_columns=["id"])
    cdc = engine.read.table_changes("dbo.ft", from_version=v_ins)
    post = engine.read.table("dbo.ft")
    mv = apply_topk_delta(mv0, cdc, post, ["grp"], "id", "amt", 2)
    got = sorted((r.grp, r.id, str(r.amt)) for r in mv.collect())
    want = sorted((r.grp, r.id, str(r.amt)) for r in _topk(post).collect())
    assert got == want
    assert ("m", 12, "15.00") in got and ("m", 8, "10.00") not in got


def test_topk_mv_seeded_fuzz(engine, spark):
    import random
    from decimal import Decimal
    from pyspark.sql import Row

    from mssql_dataframe_spark.operators.incremental import (
        apply_topk_delta,
    )

    rng = random.Random(0xBEEF)
    groups = [f"g{i}" for i in range(10)]

    def df_(rows):
        return spark.createDataFrame(
            [Row(id=i, grp=g, amt=None if a is None else Decimal(a))
             for i, g, a in rows],
            "id long, grp string, amt decimal(10,2)",
        )

    base_rows = [
        (i, rng.choice(groups),
         None if rng.random() < 0.1 else f"{rng.randrange(1, 60)}.00")
        for i in range(300)
    ]
    engine.create.table("dbo.ftz", COLS, primary_key_column="id")
    engine.write.insert("dbo.ftz", df_(base_rows))
    v_ins = engine.store.meta("dbo.ftz").version
    mv0 = _topk(engine.read.table("dbo.ftz", version=v_ins), k=3)
    final_rows = []
    for i, g, a in base_rows:
        r = rng.random()
        if r < 0.25:
            continue
        if r < 0.55:
            g2 = rng.choice(groups) if rng.random() < 0.2 else g
            a2 = (None if rng.random() < 0.1
                  else f"{rng.randrange(1, 60)}.00")
            final_rows.append((i, g2, a2))
        else:
            final_rows.append((i, g, a))
    final_rows += [
        (1000 + j, rng.choice(groups + ["h"]),
         None if rng.random() < 0.1 else f"{rng.randrange(1, 60)}.00")
        for j in range(60)
    ]
    engine.write.merge("dbo.ftz", df_(final_rows), match_columns=["id"])
    cdc = engine.read.table_changes("dbo.ftz", from_version=v_ins)
    post = engine.read.table("dbo.ftz")
    mv = apply_topk_delta(mv0, cdc, post, ["grp"], "id", "amt", 3)
    got = sorted((r.grp, r.id, str(r.amt)) for r in mv.collect())
    want = sorted(
        (r.grp, r.id, str(r.amt)) for r in _topk(post, k=3).collect()
    )
    assert got == want


def test_apply_agg_delta_delta_pinned_flag_equivalent(engine, spark):
    """delta_pinned=True (caller already localCheckpoint-ed the delta,
    e.g. the streaming incremental-MV sink) must produce exactly the
    default path's rows — the flag only skips the operator's internal
    re-materialization job."""
    base = _df(
        spark,
        [(1, "a", "10.00"), (2, "a", "20.00"), (3, "b", "30.00")],
    )
    engine.create.table("dbo.fpin", COLS, primary_key_column="id")
    engine.write.insert("dbo.fpin", base)
    v_ins = engine.store.meta("dbo.fpin").version
    mv0 = _mv(engine.read.table("dbo.fpin", version=v_ins))
    final = _df(
        spark, [(1, "a", "15.00"), (3, "c", "30.00"), (4, "b", "40.00")]
    )
    engine.write.merge("dbo.fpin", final, match_columns=["id"])
    cdc = engine.read.table_changes("dbo.fpin", from_version=v_ins)
    delta = agg_delta(cdc, ["grp"], {"sum_amt": "amt"})
    want = sorted(
        (r.grp, r.n_rows, str(r.sum_amt))
        for r in apply_agg_delta(mv0, delta, ["grp"], ["sum_amt"]).collect()
    )
    pinned = delta.localCheckpoint(eager=True)
    got = sorted(
        (r.grp, r.n_rows, str(r.sum_amt))
        for r in apply_agg_delta(
            mv0, pinned, ["grp"], ["sum_amt"], delta_pinned=True
        ).collect()
    )
    assert got == want
    # and both equal the full recompute
    recomputed = sorted(
        (r.grp, r.n_rows, str(r.sum_amt))
        for r in _mv(engine.read.table("dbo.fpin")).collect()
    )
    assert got == recomputed
