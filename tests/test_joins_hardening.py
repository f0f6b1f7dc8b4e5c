"""Round-11 review pins for operators/joins.py, graph.py,
profiling.py: as-of row-attach semantics (no cross-row splicing),
salted-join contract, banded range-join boundary exactness, left
point-in-time semantics, eager pagerank materialization, and
empty-input profiling."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mssql_dataframe_spark.operators import joins as J
from mssql_dataframe_spark.operators.graph import pagerank_quantized
from mssql_dataframe_spark.operators.profiling import column_profile


def test_asof_join_attaches_one_real_right_row(spark):
    """NULLs inside right values must NOT splice columns from older
    right rows: the attached (a, b) pair must be a row that exists in
    right, and a genuinely-NULL right value surfaces as NULL."""
    left = spark.createDataFrame([(1, 3)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 1, 5, 7), (1, 2, 9, None)],
        "k int, t int, a int, b int",
    )
    row = J.asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_values=["a", "b"], suffix="_m",
    ).collect()[0]
    assert row["a_m"] == 9
    assert row["b_m"] is None  # NOT 7 from the t=1 row


def test_asof_join_empty_right_values_returns_left(spark):
    left = spark.createDataFrame([(1, 3)], "k int, t int")
    right = spark.createDataFrame([(1, 1, 5)], "k int, t int, v int")
    out = J.asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_values=[],
    )
    assert out.columns == left.columns
    assert out.count() == 1


def test_asof_join_leading_gap_is_null(spark):
    left = spark.createDataFrame([(1, 0)], "k int, t int")
    right = spark.createDataFrame([(1, 5, 42)], "k int, t int, v int")
    row = J.asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_values=["v"], suffix="_m",
    ).collect()[0]
    assert row["v_m"] is None


def test_salted_join_rejects_small_side_preserving_types(spark):
    big = spark.createDataFrame([(1, "x")], "k int, v string")
    small = spark.createDataFrame([(1, "d")], "k int, d string")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="n_salts times"):
            J.salted_join(big, small, on="k", how=how)


def test_salted_join_matches_plain_join_with_duplicates(spark):
    """Duplicate big-side rows of a hot key (the skew case the salt
    must spread) still produce results identical to the plain join."""
    big = spark.createDataFrame(
        [(1, "a")] * 40 + [(2, "b"), (3, "c")], "k int, v string"
    )
    small = spark.createDataFrame([(1, "d1"), (2, "d2")], "k int, d string")
    for how in ("inner", "left"):
        got = (
            J.salted_join(big, small, on="k", n_salts=4, how=how)
            .groupBy("k", "v", "d").count().collect()
        )
        want = (
            big.join(small, "k", how)
            .groupBy("k", "v", "d").count().collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_range_join_banded_boundary_epsilon_exact(spark):
    """An interval whose hi sits a hair above a band boundary must
    still match values just below it (the old epsilon-before-floor
    dropped this pair silently)."""
    left = spark.createDataFrame([(1000.0,), (999.0,)], "x double")
    right = spark.createDataFrame(
        [("band", 0.0, 1000.0000000005)], "name string, lo double, hi double"
    )
    got = J.range_join_banded(left, right, "x", "lo", "hi", 500.0)
    assert got.count() == 2  # both 999 and 1000 are inside [0, hi)


def test_range_join_banded_suffixes_colliding_columns(spark):
    left = spark.createDataFrame([(10.0, "L")], "x double, tag string")
    right = spark.createDataFrame(
        [(0.0, 100.0, "R")], "lo double, hi double, tag string"
    )
    out = J.range_join_banded(left, right, "x", "lo", "hi", 50.0)
    assert "tag" in out.columns and "tag_r" in out.columns
    row = out.collect()[0]
    assert row["tag"] == "L" and row["tag_r"] == "R"


def test_point_in_time_join_keeps_unmatched_facts(spark):
    """A fact before the key's first version (or with an unknown key)
    carries NULL dimension values instead of vanishing."""
    t = datetime.datetime
    facts = spark.createDataFrame(
        [(1, t(2024, 3, 1)), (1, t(2023, 1, 1)), (99, t(2024, 3, 1))],
        "k int, ts timestamp_ntz",
    )
    dim = spark.createDataFrame(
        [(1, "v1", t(2024, 1, 1), None)],
        "k int, name string, _valid_from timestamp_ntz, _valid_to timestamp_ntz",
    )
    got = {
        (r["k"], r["ts"]): r["name"]
        for r in J.point_in_time_join(
            facts, dim, on=["k"], fact_time="ts"
        ).collect()
    }
    assert len(got) == 3
    assert got[(1, t(2024, 3, 1))] == "v1"
    assert got[(1, t(2023, 1, 1))] is None
    assert got[(99, t(2024, 3, 1))] is None


def test_pagerank_returns_materialized_snapshot(spark):
    """pagerank materializes its iteration chain ONCE (with the edge/
    degree caches live) and returns a plan-stable snapshot — repeated
    actions must not recompute the iterations."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    out = pagerank_quantized(edges, iters=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    r1 = {r["node_id"]: r["rank_q"] for r in out.collect()}
    r2 = {r["node_id"]: r["rank_q"] for r in out.collect()}
    assert r1 == r2 and set(r1) == {1, 2, 3}


def test_column_profile_empty_input_counts_zero(spark):
    df = spark.createDataFrame([], "a int, b string").filter(F.lit(False))
    out = {r["column_name"]: r for r in column_profile(df, ["a", "b"]).collect()}
    for c in ("a", "b"):
        assert out[c]["n_rows"] == 0
        assert out[c]["n_nulls"] == 0
        assert out[c]["n_distinct"] == 0


def test_asof_join_null_timed_right_row_never_matches(spark):
    # r13 review finding: a NULL-timed right row sorted FIRST under
    # the window order and became the fallback match for every left
    # row before the key's first real right row — SQL comparison
    # rules say right_time <= left_time is UNKNOWN for NULL, so it
    # must never match.
    left = spark.createDataFrame(
        [(1, 10), (1, 25)], "k long, lt long"
    )
    right = spark.createDataFrame(
        [(1, None, "null_time"), (1, 20, "real")],
        "k long, rt long, v string",
    )
    got = {
        (r["lt"], r["v_asof"])
        for r in J.asof_join(
            left, right, on="k", left_time="lt", right_time="rt"
        ).collect()
    }
    # lt=10: no right row at or before it -> NULL, NOT "null_time"
    assert got == {(10, None), (25, "real")}


def test_asof_join_null_keyed_rows_never_match_each_other(spark):
    # NULL = NULL is UNKNOWN: a NULL-keyed right row must not attach
    # to a NULL-keyed left row (window partitionBy would group them)
    left = spark.createDataFrame([(None, 10)], "k string, lt long")
    right = spark.createDataFrame(
        [(None, 5, "ghost")], "k string, rt long, v string"
    )
    rows = J.asof_join(
        left, right, on="k", left_time="lt", right_time="rt"
    ).collect()
    # LEFT semantics: the left row survives, with NULL attached
    assert len(rows) == 1 and rows[0]["v_asof"] is None
