"""Round-15 ADVICE hardening: the map-side argmin literal-size guard,
dim-consistent IVF-PQ coarse assignment for longer-than-dim
embeddings, and the once-per-row norm projection in PQ encode."""

from __future__ import annotations

import pytest

from mssql_dataframe_spark.operators import similarity as S


def _cents(k: int, dim: int) -> list:
    return [(i, [1] * dim) for i in range(k)]


def test_argmin_sql_boundary_guard():
    """At the documented cap the SQL builds; one centroid past it
    refuses with a pointer to the cap (ADVICE r14: a large-codebook
    caller must not silently build a multi-MB plan string)."""
    cap = S.ARGMIN_SQL_MAX_LITERALS
    dim = 1024
    k_at = cap // dim
    assert k_at * dim == cap
    sql = S._argmin_sql(_cents(k_at, dim))
    assert sql.startswith("array_min(")
    with pytest.raises(ValueError, match="ARGMIN_SQL_MAX_LITERALS"):
        S._argmin_sql(_cents(k_at + 1, dim))


def test_argmin_sql_small_codebooks_unaffected():
    sql = S._argmin_sql(_cents(4, 8))
    assert sql.count("named_struct('cid'") == 4


def test_ivfpq_topk_embedding_longer_than_dim(spark):
    """Coarse assignment builds V from the dim-truncated PQ slices;
    the centroid matrix must use the same truncation — with a longer
    embedding column this shape-errored before the fix (ADVICE r14)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=12)])  # 12 > dim=8
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.ivfpq_topk(
        df, query_ids=[1, 2], topk=3, m=2, k=2, iters=2,
        dim=8, centroid_mod=7, nprobe=2,
    ).collect()
    assert out  # completes without a numpy shape error
    assert {r["query_id"] for r in out} == {1, 2}
    assert all(1 <= r["rank"] <= 3 for r in out)
