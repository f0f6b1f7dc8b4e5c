"""Leg-by-leg profiler for the store write path (round 14 opt pass 2).

Wraps the hot write-path functions with wall-clock + py4j round-trip
counters (py4j GatewayClient.send_command is THE driver<->JVM boundary;
every Column operator, conf read, and plan method crosses it once), then
runs a named registry entry once and prints a per-leg table. This
pinpoints whether a leg's cost is cluster work (jobs) or driver-side
plan construction (round trips), per guide §1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import py4j.java_gateway as jg  # noqa: E402

from mssql_dataframe_spark import connect  # noqa: E402
from mssql_dataframe_spark import queries as Q  # noqa: E402

RT = {"n": 0}
_orig_send = jg.GatewayClient.send_command


def _counting_send(self, *a, **kw):
    RT["n"] += 1
    return _orig_send(self, *a, **kw)


jg.GatewayClient.send_command = _counting_send

LEGS: list[tuple[str, int, float, int]] = []
_depth = {"d": 0}


def wrap(obj, attr, label=None):
    fn = getattr(obj, attr)
    lbl = label or f"{getattr(obj, '__name__', type(obj).__name__)}.{attr}"

    def inner(*a, **kw):
        d = _depth["d"]
        _depth["d"] += 1
        t0, r0 = time.perf_counter(), RT["n"]
        try:
            return fn(*a, **kw)
        finally:
            _depth["d"] -= 1
            LEGS.append((lbl, d, time.perf_counter() - t0, RT["n"] - r0))

    setattr(obj, attr, inner)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    import mssql_dataframe_spark.validation as V
    import mssql_dataframe_spark.core.write.insert as INS
    import mssql_dataframe_spark.core.write.merge as MRG
    import mssql_dataframe_spark.core.write.update as UPD
    import mssql_dataframe_spark.store as ST
    import mssql_dataframe_spark.operators.incremental as INC

    import mssql_dataframe_spark.core.create as CRT
    import mssql_dataframe_spark.core.write.scd2 as SCD
    import mssql_dataframe_spark.core.read as RD

    # precheck & friends are imported BY NAME into each write module —
    # wrap the module-local bindings, not validation's own
    for mod in (INS, MRG, UPD, SCD):
        for nm in (
            "precheck_dataframe",
            "enforce_check_constraints",
            "enforce_foreign_keys",
            "enforce_unique_constraints",
        ):
            if hasattr(mod, nm):
                wrap(mod, nm, f"{mod.__name__.split('.')[-1]}.{nm}")
    wrap(ST.TableStore, "_stage_in", "store._stage_in")
    wrap(ST.TableStore, "_commit", "store._commit")
    wrap(ST.TableStore, "read", "store.read")
    wrap(ST.TableStore, "read_files", "store.read_files")
    wrap(ST.TableStore, "append", "store.append")
    wrap(INC, "agg_delta")
    wrap(INC, "apply_agg_delta")
    wrap(INC, "apply_minmax_delta")
    wrap(INC, "apply_distinct_delta")
    wrap(INC, "apply_topk_delta")
    import mssql_dataframe_spark.core.write as W

    for mod, fname in (
        (INS, "insert_op"),
        (MRG, "merge_op"),
        (UPD, "update_op"),
        (INS, "assign_identity"),
        (W, "insert"),
        (W, "merge_op"),
        (W, "update_op"),
        (W, "merge_scd2"),
        (W, "delete_op"),
    ):
        if hasattr(mod, fname):
            wrap(mod, fname, f"{mod.__name__.split('.')[-1]}.{fname}")
    for meth in ("table_from_dataframe", "table"):
        if hasattr(CRT.create, meth):
            wrap(CRT.create, meth, f"create.{meth}")
    wrap(RD.read, "table", "read.table")
    if hasattr(RD.read, "table_changes"):
        wrap(RD.read, "table_changes", "read.table_changes")

    spark = connect(app_name="profile_write_path")
    spark.range(1000).selectExpr("id % 7 AS k").groupBy("k").count().collect()

    fn = Q.REGISTRY[args.name]["fn"]
    tracker = spark.sparkContext.statusTracker
    for i in range(args.runs):
        LEGS.clear()
        j0 = len(tracker().getJobIdsForGroup() or [])
        t0, r0 = time.perf_counter(), RT["n"]
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        jobs = len(tracker().getJobIdsForGroup() or []) - j0
        print(
            f"== {args.name} run{i}: {total:.3f}s  jobs={jobs}  "
            f"py4j_rt={RT['n'] - r0}"
        )
        agg: dict[tuple, list[float]] = {}
        for lbl, d, dt, rt in LEGS:
            key = (d, lbl)
            agg.setdefault(key, [0.0, 0, 0])
            agg[key][0] += dt
            agg[key][1] += rt
            agg[key][2] += 1
        for (d, lbl), (dt, rt, n) in sorted(
            agg.items(), key=lambda kv: -kv[1][0]
        ):
            print(
                f"   {'  ' * d}{lbl:45s} {dt:7.3f}s  rt={rt:6d}  calls={n}"
            )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
