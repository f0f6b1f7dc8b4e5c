"""Watermark eviction OBSERVED for the windowed streaming aggregations
(VERDICT.md r6 #3): the gate entries' default complete-mode drains hold
all window state by contract (complete output must re-emit every
window), so their stateOperators report evicted=0 even though the
watermark is configured. ``windowed_eviction_drain`` replays the same
aggregation against the 4-batch staged source + far-future sentinel in
APPEND mode — here the watermark advances mid-drain, finalized windows
emit, and their state rows are removed. These tests pin BOTH halves of
the bounded-state claim on one drain:

1. evicted > 0 (state does not grow with the stream), and
2. the append-mode output, sentinel rows stripped, equals the
   complete-mode (= batch = oracle) result — eviction did not change
   the answer.
"""

from __future__ import annotations

from mssql_dataframe_spark.streaming import events as STR


def _drain(spark, sf_dir, which):
    progress: list = []
    out = STR.windowed_eviction_drain(
        spark, sf_dir, which, progress_out=progress
    )
    rows = {tuple(r) for r in out.collect()}
    ops = [p for pr in progress for p in pr.get("stateOperators", [])]
    assert ops, "no state-operator metrics reported"
    evicted = sum(op.get("numRowsRemoved", 0) for op in ops)
    peak = max(op.get("numRowsTotal", 0) for op in ops)
    return rows, evicted, peak


def test_tumbling_append_evicts_and_matches_complete(spark, sf_dir):
    rows, evicted, peak = _drain(spark, sf_dir, "tumbling")
    assert evicted > 0, "watermark advanced but no window state evicted"
    complete = {
        tuple(r)
        for r in STR.tumbling_window_counts(spark, sf_dir).collect()
    }
    assert rows == complete
    # bounded: the store never held every window at once (the sentinel
    # windows are in flight at the end, so allow them in the peak)
    assert peak < len(complete) + 8


def test_sliding_append_evicts_and_matches_complete(spark, sf_dir):
    rows, evicted, peak = _drain(spark, sf_dir, "sliding")
    assert evicted > 0
    complete = {
        tuple(r)
        for r in STR.sliding_window_rates(spark, sf_dir).collect()
    }
    assert rows == complete
    assert peak < len(complete) + 8


def test_session_append_evicts_and_matches_complete(spark, sf_dir):
    rows, evicted, peak = _drain(spark, sf_dir, "session")
    assert evicted > 0
    complete = {
        tuple(r)
        for r in STR.session_window_stats(spark, sf_dir).collect()
    }
    assert rows == complete


def test_stateful_state_bounded_by_key_cardinality(spark, sf_dir):
    """stateful_user_stats has no watermark BY DESIGN — running per-user
    totals never expire. Its bound is key cardinality: across a 4-batch
    staged replay the state-store peak equals the number of distinct
    users, flat while input rows grow batch over batch."""
    import shutil

    from mssql_dataframe_spark.events_source import load_events

    factory, stage = STR.staged_event_source_factory(spark, sf_dir)
    try:
        progress: list = []
        out = STR.stateful_user_stats(
            spark, sf_dir, progress_out=progress, source_factory=factory
        )
        n_users_out = out.count()
        n_users = (
            load_events(spark, sf_dir).select("user_id").distinct().count()
        )
        assert n_users_out == n_users
        ops = [p for pr in progress for p in pr.get("stateOperators", [])]
        assert ops
        peak = max(op.get("numRowsTotal", 0) for op in ops)
        assert peak <= n_users, (
            f"state grew past key cardinality: peak={peak} users={n_users}"
        )
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_dedup_state_evicts_under_staged_replay(spark, sf_dir):
    """dropDuplicatesWithinWatermark's bounded-state claim, observed:
    replayed against the staged multi-batch source + sentinel, dedup
    state rows are removed mid-drain, and the surviving key set (minus
    sentinel-era rows) equals the single-batch result."""
    factory, stage = STR.staged_event_source_factory(spark, sf_dir)
    STR.add_sentinel_batch(spark, sf_dir, stage)
    import shutil

    progress: list = []
    try:
        staged = STR.streaming_dedup(
            spark, sf_dir, progress_out=progress, source_factory=factory
        )
        rows = {
            tuple(r) for r in staged.filter("user_id >= 0").collect()
        }
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    ops = [p for pr in progress for p in pr.get("stateOperators", [])]
    assert ops
    evicted = sum(op.get("numRowsRemoved", 0) for op in ops)
    peak = max(op.get("numRowsTotal", 0) for op in ops)
    assert evicted > 0, "no dedup state evicted under staged replay"
    single = {
        tuple(r) for r in STR.streaming_dedup(spark, sf_dir).collect()
    }
    assert rows == single
    assert peak < len(single), (
        "peak state should stay below the full key set once eviction "
        f"runs (peak={peak}, keys={len(single)})"
    )
