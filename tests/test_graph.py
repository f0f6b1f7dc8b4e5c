"""pagerank_quantized: integer-exact damped PageRank. Hand-computed
fixed points on tiny graphs pin the update rule; the cross-engine
bit-exactness is covered by the oracle-parity suite."""

from __future__ import annotations

from pyspark.sql import Row

from mssql_dataframe_spark.operators.graph import pagerank_quantized


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in pairs], "src long, dst long"
    )


def _ranks(df):
    return {r["node_id"]: r["rank_q"] for r in df.collect()}


def test_two_node_cycle_is_fixed_point(spark):
    # a<->b: each node keeps exactly unit rank every iteration:
    # 150000 + (85 * 1000000 div 1) div 100 = 1000000
    r = _ranks(pagerank_quantized(_edges(spark, [(1, 2), (2, 1)]), iters=4))
    assert r == {1: 1_000_000, 2: 1_000_000}


def test_dangling_node_decays_to_teleport_base(spark):
    # a->b, b dangling: a gets no in-mass (rank 150000 after iter 1);
    # b's rank after 2 iters = 150000 + (85*150000) div 100 = 277500
    r = _ranks(pagerank_quantized(_edges(spark, [(1, 2)]), iters=2))
    assert r == {1: 150_000, 2: 277_500}


def test_hub_outranks_leaves(spark):
    # star: leaves 2..5 all point at 1 and 1 points back at each
    pairs = [(i, 1) for i in (2, 3, 4, 5)] + [(1, i) for i in (2, 3, 4, 5)]
    r = _ranks(pagerank_quantized(_edges(spark, pairs), iters=5))
    assert all(r[1] > r[i] for i in (2, 3, 4, 5))
    assert len({r[i] for i in (2, 3, 4, 5)}) == 1  # symmetric leaves agree


def test_assume_distinct_contract(spark):
    """assume_distinct=True skips the defensive edge dedup (a full
    shuffle of the largest frame): on a unique edge list the results
    are identical; with parallel edges the default dedups them while
    the flag (per contract) counts them twice."""
    unique = _edges(spark, [(1, 2), (2, 1)])
    assert _ranks(pagerank_quantized(unique, iters=3)) == _ranks(
        pagerank_quantized(unique, iters=3, assume_distinct=True)
    )
    # asymmetric graph where a parallel edge does NOT cancel: with the
    # dup admitted, outdeg(1)=3 and node 2 receives a double share
    dup = _edges(spark, [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)])
    deduped = _ranks(pagerank_quantized(dup, iters=3))
    assert deduped == _ranks(
        pagerank_quantized(
            _edges(spark, [(1, 2), (1, 3), (2, 1), (3, 1)]), iters=3
        )
    )
    admitted = _ranks(pagerank_quantized(dup, iters=3, assume_distinct=True))
    assert admitted[2] > deduped[2]  # double edge -> double share
    assert admitted != deduped


def test_assume_all_nodes_have_in_edges_contract(spark):
    """assume_all_nodes_have_in_edges=True skips the per-iteration
    nodes LEFT JOIN (it only re-attaches nodes with no in-edges): on a
    symmetrized edge list — every node appears as a destination — the
    results are identical to the default path; on a graph WITH a pure
    source the flag (per its documented contract) drops that node from
    the output while the default path keeps it at the teleport base."""
    # symmetrized: asymmetric degrees (1 is a hub), every node a dst
    pairs = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2), (1, 4), (4, 1)]
    sym = _edges(spark, pairs)
    base = _ranks(pagerank_quantized(sym, iters=4))
    fast = _ranks(
        pagerank_quantized(
            sym, iters=4, assume_all_nodes_have_in_edges=True
        )
    )
    assert fast == base
    # pure source 9 (never a dst): default keeps it at the teleport
    # base; the flag's contract drops it (wrong promise -> it vanishes)
    with_src = _edges(spark, pairs + [(9, 1)])
    kept = _ranks(pagerank_quantized(with_src, iters=3))
    assert kept[9] == 150_000
    dropped = _ranks(
        pagerank_quantized(
            with_src, iters=3, assume_all_nodes_have_in_edges=True
        )
    )
    assert 9 not in dropped
    # and the damage propagates: once 9 vanishes from the rank frame
    # (after iter 1) its contribution to node 1 stops flowing, so the
    # hub is strictly poorer than under the default path — the flag is
    # a real correctness contract, not a cosmetic projection
    assert dropped[1] < kept[1]
