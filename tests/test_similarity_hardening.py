"""Round-11 review pins for operators/similarity.py: NULL-embedding
tolerance in the numpy kernels, decimal-widened semantic_dedup for
non-unit-norm corpora, raw-cosine threshold semantics, half-away
rounding, bounded codebook collects, and the exact-top-k id contract."""

from __future__ import annotations

import decimal
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mssql_dataframe_spark.operators import similarity as S

DIM = 8


def _vecs(spark, rows, id_type="long"):
    return spark.createDataFrame(
        rows, f"vec_id {id_type}, embedding array<double>"
    )


def _unit(i):
    v = [math.sin(i * 13 + j) for j in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_numpy_kernels_tolerate_null_embeddings(spark):
    rows = [(i, _unit(i)) for i in range(20)] + [(99, None)]
    df = _vecs(spark, rows)
    q = _vecs(spark, [(0, _unit(0)), (98, None)])
    assert S.lsh_ann_topk(df, q, dim=DIM, k=3).count() > 0
    assert S.ivf_topk(df, q, k=3, dim=DIM, centroid_mod=7).count() > 0
    assert S.exact_topk_scalable(df, q, k=3, dim=DIM).count() > 0
    assert S.embedding_near_dup_pairs(
        df, dim=DIM, threshold=-1.0
    ).count() > 0


def test_semantic_dedup_exact_on_unnormalized_vectors(spark):
    """Norm ~8 vectors overflow the old int64 cross-multiplication
    (ANSI abort / silent wrap); the decimal38 form stays exact. The
    verdict is checked against arbitrary-precision Python."""
    quant, tau_sq_bp = 1024, 8100
    rows = [
        (i, [((i * 7 + j * 3) % 17 - 8) * 1.0 for j in range(DIM)])
        for i in range(6)
    ]
    # make two vectors colinear so at least one true dup exists
    rows.append((6, [x * 2.0 for x in rows[0][1]]))
    df = _vecs(spark, rows)
    out = {
        r["vec_id"]: (r["cluster_id"], r["is_dup"])
        for r in S.semantic_dedup(
            df, k=2, quant=quant, tau_sq_bp=tau_sq_bp
        ).collect()
    }
    # recompute with exact big-int arithmetic
    q = {
        i: [math.floor(x * quant + 0.5) for x in v] for i, v in rows
    }
    cents = {cid: q[i] for cid, i in enumerate(sorted(q)[:2])}

    def sq(v):
        return sum(x * x for x in v)

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    assign, reps = {}, {}
    for i, v in sorted(q.items()):
        d = {c: sq(v) + sq(cv) - 2 * dot(v, cv) for c, cv in cents.items()}
        cid = min(d, key=lambda c: (d[c], c))
        assign[i] = cid
        reps.setdefault(cid, i)
    for i, v in q.items():
        cid = assign[i]
        rep = reps[cid]
        rdot = dot(v, q[rep])
        want = (
            i != rep
            and rdot > 0
            and 10000 * rdot * rdot >= tau_sq_bp * sq(v) * sq(q[rep])
        )
        got_cid, got_dup = out[i]
        assert got_cid == cid and got_dup == want, (i, out[i], cid, want)
    assert out[6][1] is True  # the colinear pair really is a dup


def test_near_dup_threshold_is_raw_cosine(spark):
    # components sit on coordinates whose (seeded) plane weights are
    # both positive, so the two vectors share the single LSH bucket
    # and the pair's fate rests ONLY on the threshold comparison
    w = S.plane_matrix(1, DIM)[0]
    pos = [j for j in range(DIM) if w[j] > 0]
    assert len(pos) >= 2
    a, b = [0.0] * DIM, [0.0] * DIM
    a[pos[0]] = 1.0
    b[pos[0]], b[pos[1]] = 0.3, math.sqrt(1 - 0.09)
    df = _vecs(spark, [(1, a), (2, b)])
    # raw cosine computed with the same sequential fold
    nb = math.sqrt(sum(x * x for x in b))
    raw = sum(x * y for x, y in zip(a, b)) / (1.0 * nb)
    n_lo = S.embedding_near_dup_pairs(df, dim=DIM, threshold=raw,
                                      n_planes=1).count()
    n_hi = S.embedding_near_dup_pairs(df, dim=DIM, threshold=raw + 1e-12,
                                      n_planes=1).count()
    assert (n_lo, n_hi) == (1, 0)


def test_round8_away_matches_sql_round():
    x = np.array([2.5e-8, -2.5e-8, 1.23456785e-1])
    got = S._round8_away(x)
    assert got[0] == 3e-8 and got[1] == -3e-8
    # np.round half-even would give 2e-8 here
    assert np.round(x[0], 8) == 2e-8


def test_exact_topk_rejects_non_integral_ids(spark):
    df = spark.createDataFrame(
        [("a", _unit(1))], "vec_id string, embedding array<double>"
    )
    with pytest.raises(TypeError, match="integral"):
        S.exact_topk_scalable(df, df, k=1, dim=DIM)


def test_ivf_codebook_cap_uses_bounded_collect(spark):
    df = _vecs(spark, [(i, _unit(i)) for i in range(40)])
    with pytest.raises(ValueError, match="cap is"):
        S.ivf_topk(df, df.limit(1), k=1, dim=DIM, centroid_mod=2,
                   max_codebook=5)
