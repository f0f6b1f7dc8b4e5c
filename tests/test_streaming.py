"""Streaming state-boundedness: the stream-stream interval join must
EVICT join state as the watermark advances — the property that makes
it runnable against an unbounded stream at scale (VERDICT.md r3 #8).

The events table is replayed as several time-ordered micro-batches
(``maxFilesPerTrigger=1`` over an hour-sorted staged copy) so the
watermark advances between batches and eviction is observable in the
query-progress ``stateOperators`` metrics, not just asserted by
docstring.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from mssql_dataframe_spark.events_source import load_events, normalize_event_ts
from mssql_dataframe_spark.streaming import events as STR

SCRATCH = os.path.join(os.path.dirname(__file__), "..", ".spark_tables", "pytest")


def _staged_source_factory(spark, sf_dir, n_batches=4):
    """Shared staged replay (promoted to the streaming module so the
    throughput report reuses the same eviction-observable setup)."""
    return STR.staged_event_source_factory(spark, sf_dir, n_batches)


def test_stream_stream_join_state_bounded_and_batch_equivalent(spark, sf_dir):
    factory, stage = _staged_source_factory(spark, sf_dir)
    try:
        progress: list = []
        out = STR.stream_stream_interval_join(
            spark, sf_dir, source_factory=factory, progress_out=progress
        ).toPandas()

        # 1) batch equivalence: fully-drained inner interval join equals
        #    the same join expressed in batch
        ev = load_events(spark, sf_dir)
        views = ev.filter(F.col("event_type") == "view").select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        expected = (
            views.join(
                clicks,
                F.expr(
                    "v_user = c_user AND click_ts >= view_ts "
                    "AND click_ts <= view_ts + INTERVAL 6 hours"
                ),
            )
            .count()
        )
        assert len(out) == expected
        assert expected > 0  # the assertion must exercise real pairs

        # 2) bounded state: eviction must actually happen as the
        #    watermark advances across micro-batches
        state_ops = [p for pr in progress for p in pr.get("stateOperators", [])]
        assert state_ops, "no state-operator metrics reported"
        removed = sum(op.get("numRowsRemoved", 0) for op in state_ops)
        assert removed > 0, (
            "watermark advanced across batches but no join state was "
            f"evicted (stateOperators={state_ops})"
        )
        # state high-water mark stays below total admitted rows: the
        # store never holds the whole stream at once
        max_state = max(op.get("numRowsTotal", 0) for op in state_ops)
        n_view_click = views.count() + clicks.count()
        assert 0 < max_state < n_view_click
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_stream_stream_left_join_emits_unmatched(spark):
    """Left-outer interval join: unmatched views null-extend once the
    watermark passes their window (the sentinel batches force full
    emission), matched pairs equal the batch join, and join state is
    evicted across the staged drain."""
    from mssql_dataframe_spark.events_source import load_events
    from mssql_dataframe_spark.streaming.events import (
        stream_stream_left_join,
    )

    prog = []
    out = stream_stream_left_join(
        spark, "/root/testdata/sf0.001", "6 hours", progress_out=prog
    ).collect()
    assert any(r["click_id"] is None for r in out)
    e = load_events(spark, "/root/testdata/sf0.001")
    v = e.filter("event_type='view'")
    n_views = v.count()
    # every view appears at least once (outer totality)
    assert len({r["view_id"] for r in out}) == n_views
    removed = sum(
        s.get("numRowsRemoved", 0)
        for p in prog for s in p.get("stateOperators", [])
    )
    assert removed > 0, "watermark must evict join state during the drain"


def test_foreach_batch_upsert_replay_is_idempotent(engine, spark, sf_dir):
    """foreachBatch is at-least-once: draining the SAME source again
    against the same table (batch ids restart at 0 <= the recorded
    ledger) must not double-accumulate the read-modify-write totals —
    the applied-batch-id ledger rides the merge commit."""
    from mssql_dataframe_spark.streaming import events as SE

    first = {
        (r["user_id"]): (r["n_events"], r["sum_value"])
        for r in SE.foreach_batch_upsert(spark, sf_dir, engine).collect()
    }
    assert first
    # simulate a replay from a fresh checkpoint: batch ids 0..n-1 are
    # all <= the recorded last_stream_batch_id, so every batch skips
    table = "dbo.user_totals_stream"
    props = engine.store.meta(table).properties
    assert props.get("last_stream_batch_id") is not None
    import mssql_dataframe_spark.streaming.events as se_mod

    orig_create = engine.create.table

    def reuse_table(*a, **k):
        return None  # table already exists from the first drain

    engine.create.table = reuse_table
    try:
        again = {
            (r["user_id"]): (r["n_events"], r["sum_value"])
            for r in SE.foreach_batch_upsert(
                spark, sf_dir, engine
            ).collect()
        }
    finally:
        engine.create.table = orig_create
    assert again == first


def test_incremental_mv_sink_replay_and_crash_window(engine, spark):
    """The stream->fact->CDC->MV sink converges under at-least-once
    replay: a clean re-delivery is a no-op, and a crash BETWEEN the
    fact insert and the MV merge recovers on replay from the recorded
    version window — no double counts, no lost deltas."""
    import pytest as _pytest
    from decimal import Decimal
    from pyspark.sql import Row

    from mssql_dataframe_spark.streaming.events import incremental_mv_sink

    fact, mvt = "dbo.f_repl", "dbo.mv_repl"
    engine.create.table(
        fact,
        {"event_id": "bigint", "user_id": "bigint",
         "value": "decimal(18,4)"},
        primary_key_column="event_id",
    )
    engine.create.table(
        mvt,
        {"user_id": "bigint", "n_rows": "bigint",
         "sum_value": "decimal(18,4)"},
        primary_key_column="user_id",
    )

    def mb(rows):
        return spark.createDataFrame(
            [Row(event_id=e, user_id=u, value=Decimal(v))
             for e, u, v in rows],
            "event_id long, user_id long, value decimal(18,4)",
        )

    b0 = mb([(1, 10, "1.00"), (2, 10, "2.00"), (3, 20, "5.00")])
    incremental_mv_sink(engine, fact, mvt, b0, 0)
    # clean replay of an applied batch: both ledgers current -> no-op
    incremental_mv_sink(engine, fact, mvt, b0, 0)
    got = {r.user_id: (r.n_rows, str(r.sum_value))
           for r in engine.read.table(mvt).collect()}
    assert got == {10: (2, "3.0000"), 20: (1, "5.0000")}

    # crash between the fact commit and the MV commit
    b1 = mb([(4, 10, "10.00"), (5, 30, "7.00")])
    with _pytest.raises(RuntimeError, match="injected crash"):
        incremental_mv_sink(
            engine, fact, mvt, b1, 1, fail_between_commits=True
        )
    # the fact has the rows, the MV does not — replay must apply the
    # MV delta WITHOUT re-inserting
    assert engine.read.table(fact).count() == 5
    assert engine.read.table(mvt).count() == 2
    incremental_mv_sink(engine, fact, mvt, b1, 1)
    assert engine.read.table(fact).count() == 5  # no duplicate insert
    got = {r.user_id: (r.n_rows, str(r.sum_value))
           for r in engine.read.table(mvt).collect()}
    assert got == {
        10: (3, "13.0000"), 20: (1, "5.0000"), 30: (1, "7.0000"),
    }
