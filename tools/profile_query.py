"""Per-query optimization profiler (round 14 optimization pass).

For each named registry entry: warm up the session, run the query
``--runs`` times through the noop sink (guide §1.4 — full-column
evaluation, no sink cost, no driver transfer), report per-run wall
clock, and optionally dump ``explain("formatted")`` to a file so plan
shape (Exchange count, join strategy, PushedFilters, Python eval
nodes) can be diffed before/after a change.

Usage:
    python tools/profile_query.py --names q1_pricing_summary[,...]
        [--sf DIR] [--runs 3] [--plans-dir plans/r14] [--suffix before]
        [--jobs]   # also print per-run Spark job count (scheduling
                   # overhead signal for iterative queries)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mssql_dataframe_spark import connect  # noqa: E402
from mssql_dataframe_spark import queries as Q  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--jobs", action="store_true")
    args = ap.parse_args()

    spark = connect(app_name="profile_query")
    spark.range(1000).selectExpr("id % 7 AS k", "id AS v").groupBy(
        "k"
    ).sum("v").collect()

    names = [n.strip() for n in args.names.split(",") if n.strip()]
    tracker = spark.sparkContext.statusTracker
    for name in names:
        fn = Q.REGISTRY[name]["fn"]
        samples = []
        jobs_per_run = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            j0 = len(tracker().getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            if args.jobs:
                jobs_per_run.append(
                    len(tracker().getJobIdsForGroup() or []) - j0
                )
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
        spread = ", ".join(f"{s:.3f}" for s in samples)
        extra = f" jobs={jobs_per_run}" if args.jobs else ""
        print(f"{name}: min {min(samples):.3f}s of [{spread}]{extra}")
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(
                args.plans_dir, f"{name}_{args.suffix}.txt"
            )
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"  plan -> {path}")
            spark.catalog.clearCache()


if __name__ == "__main__":
    main()
