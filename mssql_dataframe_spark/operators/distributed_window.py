"""Distributed replacements for unpartitioned (global) windows.

``Window.orderBy(...)`` with no ``partitionBy`` forces every row
through a single WindowExec partition — correct on a laptop, a hard
scale-killer at 100 TB. The functions here compute the same answers
with the classic two-pass prefix-sum shape:

1. ``repartitionByRange`` on the total order (range partitions are
   globally ordered: every row in partition *i* sorts before every row
   in partition *i+1*);
2. a *partitioned* window per range-partition (``partitionBy`` on
   ``spark_partition_id()``) for the local rank / running sum;
3. a per-partition summary — at most ``num_partitions`` rows, bounded
   by cluster width, never by data volume — collected to the driver,
   turned into exclusive prefix offsets, and broadcast-joined back.

The orderings passed in must be total (callers tie-break on a unique
key), so results are deterministic and bit-identical to the global
window they replace. Decimal running sums stay exact: offsets are
accumulated as ``decimal.Decimal`` on the driver.
"""

from __future__ import annotations

import decimal

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_PID = "__dw_pid"
_LOCAL = "__dw_local"

# Frames pinned for pid stability when the caller did not thread its
# own ``pins`` list. Release with :func:`release_all` once downstream
# consumption is done (callers that want scoped cleanup should pass
# ``pins`` and call :func:`finalize` instead).
_SESSION_PINS: list[DataFrame] = []


def _range_partitioned(df: DataFrame, order_cols, pins=None) -> DataFrame:
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    out = (
        df.repartitionByRange(n_part, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
    )
    # Pin the partition assignment: the offsets job and the main plan
    # must see identical pids (range-boundary sampling must run once,
    # not once per job). The pin is recorded so finalize()/release_all()
    # can unpersist it once the result no longer depends on it.
    out = out.persist()
    (pins if pins is not None else _SESSION_PINS).append(out)
    return out


def finalize(df: DataFrame, pins: list) -> DataFrame:
    """Materialize *df* and release every pinned intermediate.

    ``localCheckpoint(eager=True)`` computes the result once into
    executor-local blocks, severing the plan's dependence on the
    pinned caches (safe to unpersist them immediately) — and unlike a
    plain ``persist``, checkpoint blocks are reference-tracked by the
    ContextCleaner, so they are freed automatically when the returned
    frame is garbage-collected on the driver. Net: zero cached frames
    outlive the computation.
    """
    out = df.localCheckpoint(eager=True)
    for p in pins:
        p.unpersist(blocking=False)
    pins.clear()
    return out


def release_all() -> int:
    """Unpersist every session-level pin; returns how many were held."""
    n = len(_SESSION_PINS)
    for p in _SESSION_PINS:
        p.unpersist(blocking=False)
    _SESSION_PINS.clear()
    return n


def global_row_number(
    df: DataFrame, order_cols, out: str = "rn", pins=None
) -> tuple[DataFrame, int]:
    """Exact global ``row_number`` over a total order, no global window.

    Returns ``(frame_with_<out>, total_row_count)``. Cost: one range
    shuffle of *df* plus a ≤``num_partitions``-row collect — the same
    answer as ``row_number().over(Window.orderBy(*order_cols))`` with
    no single-partition stage.
    """
    spark = df.sparkSession
    d = _range_partitioned(df, order_cols, pins)
    local = F.row_number().over(Window.partitionBy(_PID).orderBy(*order_cols))
    d = d.withColumn(_LOCAL, local.cast("bigint"))

    counts = {
        r[_PID]: r["cnt"]
        for r in d.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }
    total = int(sum(counts.values()))
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += int(counts[pid])
    off = spark.createDataFrame(offsets, schema=f"{_PID} int, __dw_off bigint")
    result = (
        d.join(F.broadcast(off), _PID)
        .withColumn(out, (F.col(_LOCAL) + F.col("__dw_off")).cast("bigint"))
        .drop(_PID, _LOCAL, "__dw_off")
    )
    return result, total


def ntile_from_rank(rn, total: int, buckets: int = 5):
    """NTILE(buckets) derived arithmetically from a global rank.

    Matches SQL NTILE exactly: the first ``total % buckets`` tiles get
    ``total // buckets + 1`` rows, the rest one fewer. Pure integer
    expression — composes with :func:`global_row_number` to give NTILE
    without any global window.
    """
    q, r = divmod(int(total), buckets)
    if q == 0:
        return rn.cast("int")
    big = r * (q + 1)
    head = F.floor((rn + q) / F.lit(q + 1))  # ceil(rn / (q+1))
    tail = r + F.floor((rn - big + q - 1) / F.lit(q))  # r + ceil((rn-big)/q)
    return F.when(rn <= big, head).otherwise(tail).cast("int")


def ntile_from_rank_col(rn, total, buckets: int = 5):
    """:func:`ntile_from_rank` with a per-row total COLUMN — NTILE
    within groups of differing sizes (e.g. per-language terciles) from
    a group-local rank, still with no per-group window: the group's
    row count rides a broadcast join and the tile is pure integer
    arithmetic. Matches ``NTILE(buckets) OVER (PARTITION BY g ...)``
    exactly for a 1-based in-group ``rn`` and ``total`` = group size.
    """
    q = F.floor(total / F.lit(buckets)).cast("bigint")
    r = (total % F.lit(buckets)).cast("bigint")
    big = r * (q + 1)
    head = F.floor((rn + q) / (q + 1))
    tail = r + F.floor((rn - big + q - 1) / q)
    return (
        F.when(q == 0, rn)
        .when(rn <= big, head)
        .otherwise(tail)
        .cast("int")
    )


def global_cumsum(
    df: DataFrame, order_cols, value_col: str, out: str = "cum", pins=None
):
    """Exact global running sum over a total order, no global window.

    Decimal-safe: per-partition totals are summed on the driver as
    ``decimal.Decimal`` so the broadcast offsets carry no float error.
    Returns ``(frame_with_<out>, grand_total)`` where *grand_total* is
    a Python number (``Decimal`` for decimal columns).
    """
    spark = df.sparkSession
    d = _range_partitioned(df, order_cols, pins)
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn(_LOCAL, F.sum(value_col).over(w_local))

    sums = {
        r[_PID]: r["s"]
        for r in d.groupBy(_PID).agg(F.sum(value_col).alias("s")).collect()
    }
    zero = decimal.Decimal(0) if any(
        isinstance(v, decimal.Decimal) for v in sums.values()
    ) else 0
    offsets, acc = [], zero
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc = acc + (sums[pid] if sums[pid] is not None else zero)
    local_type = dict(d.dtypes)[_LOCAL]
    off = spark.createDataFrame(
        [(int(p), str(v)) for p, v in offsets],
        schema=f"{_PID} int, __dw_off string",
    ).select(_PID, F.col("__dw_off").cast(local_type).alias("__dw_off"))
    result = (
        d.join(F.broadcast(off), _PID)
        .withColumn(out, F.col(_LOCAL) + F.col("__dw_off"))
        .drop(_PID, _LOCAL, "__dw_off")
    )
    return result, acc
