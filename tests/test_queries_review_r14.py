"""r14 queries.py entry-body review pins (events analytics family).

The one real finding: window_sessionization's gap test compared
second-TRUNCATED epochs (ts.cast("long")) against the oracle's
full-precision interval comparison — a true gap of 1800.5 s truncates
to exactly 1800 and fails the strict > 1800 test the SQL side passes.
Every ts in the driver's events table carries sub-second parts, so the
entry was one boundary-straddling pair away from a silent wrong
session count. Pinned here end-to-end: the entry AND its DuckDB oracle
run on a crafted boundary-gap events file and must agree.
"""

from __future__ import annotations

import datetime as dt
import os

import duckdb
import pytest

import __spark_entry__ as entry


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )


@pytest.mark.parametrize(
    "gap_us,n_sessions",
    [
        (1_800_500_000, 2),  # 1800.5 s > 30 min -> new session
        (1_800_000_001, 2),  # 1 us over the boundary
        (1_800_000_000, 1),  # exactly 30 min: strict >, same session
        (1_799_500_000, 1),  # under
    ],
)
def test_sessionization_subsecond_boundary(spark, tmp_path, gap_us, n_sessions):
    base = dt.datetime(2024, 3, 1, 12, 0, 0, 250000)
    rows = [
        (1, base, 7, "view", 1.0, "{}"),
        (2, base + dt.timedelta(microseconds=gap_us), 7, "click", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)

    q = entry.queries()["window_sessionization"]
    got = {r["user_id"]: r["n_sessions"] for r in q(spark, str(tmp_path)).collect()}
    assert got == {7: n_sessions}

    con = duckdb.connect()
    con.execute(
        f"create view events as select * from "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    oracle = con.execute(entry.oracle_sql()["window_sessionization"]).fetchall()
    assert {(r[0], r[1]) for r in oracle} == {(7, n_sessions)}


def test_bigram_logprob_half_boundary_engine_exact(spark, tmp_path):
    """Pin the r14 sf0.1 sweep finding: the per-doc mean of quantized
    log terms is a LATTICE rational (micro-units over n_bigrams) whose
    6th decimal lands EXACTLY on .5 whenever qsum = n/2 (mod n) — and
    there Spark's and DuckDB's ROUND split on the same double. The
    floor-quantized form has no half boundary. This corpus is
    engineered onto the boundary: doc 1 ("x y z") has qterms
    -510826 and -693147 micro-units -> qsum=-1203973 (odd) over n=2
    -> mean -601986.5 exactly; both engines must now agree on
    floor = -0.601987."""
    rows = [
        (1, "x y z", "en", "t", 5),
        (2, "x y", "en", "t", 3),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    import duckdb

    import __spark_entry__ as entry

    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_logprob"])
        for r in entry.queries()["bigram_logprob_quality"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[1] == (2, -0.601987)  # floor of the exact -601986.5

    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            entry.oracle_sql()["bigram_logprob_quality"]
        ).fetchall()
    }
    assert oracle == got
