"""SemDeDup-style semantic dedup (operators/similarity.semantic_dedup):
cluster to deterministic centroids, flag members cosine-similar to
their cluster representative. Integer-exact verdicts by construction.
"""

from __future__ import annotations

from mssql_dataframe_spark.operators.similarity import semantic_dedup


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_flags_near_identical_members(spark):
    # two tight groups along axes; k=2 centroids = min-id vectors
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # ~ duplicate of 0
        (3, [0.0, 0.98, 0.02, 0.0]),   # ~ duplicate of 1
        (4, [0.5, 0.0, 0.86, 0.0]),    # same cluster as 0, not a dup
    ]
    out = {
        r["vec_id"]: (r["cluster_id"], r["is_dup"])
        for r in semantic_dedup(_df(spark, rows), k=2, tau_sq_bp=8100).collect()
    }
    assert out[0] == (0, False)        # representative, never a dup
    assert out[1] == (1, False)
    assert out[2] == (0, True)
    assert out[3] == (1, True)
    assert out[4][0] == 0 and out[4][1] is False


def test_opposite_direction_is_not_dup(spark):
    # cos = -1: squared inequality alone would pass; the dot>0 guard
    # must reject anti-parallel vectors
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [-1.0, -0.001]),
    ]
    out = {
        r["vec_id"]: r["is_dup"]
        for r in semantic_dedup(_df(spark, rows), k=2, tau_sq_bp=8100).collect()
    }
    assert out[2] is False


def test_zero_vector_safe(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])]
    out = semantic_dedup(_df(spark, rows), k=2, tau_sq_bp=8100).collect()
    assert {r["vec_id"] for r in out} == {0, 1, 2}
    assert all(r["is_dup"] is False for r in out)


def test_survivor_count(spark):
    """Filtering is_dup leaves exactly one member of a tight group."""
    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(6)] + [
        (6, [0.0, 1.0])
    ]
    out = semantic_dedup(_df(spark, rows), k=2, tau_sq_bp=8100)
    survivors = sorted(
        r["vec_id"] for r in out.filter("NOT is_dup").collect()
    )
    assert survivors == [0, 6]
