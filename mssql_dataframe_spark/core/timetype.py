"""``time`` render contract.

The reference renders TIME values as ``HH:MM:SS.fffffff`` (7 fractional
digits = SQL Server's 100 ns places) and rounds sub-100 ns input to the
grid with a warning (reference: mssql_dataframe/core/conversion.py:
399-445).

Spark realization + documented divergence: the engine stores ``time``
as ``DayTimeIntervalType(HOUR, SECOND)`` whose finest unit is the
microsecond (= 10 × 100 ns), so every storable value is already ON the
100 ns grid and the reference's rounding warning can never fire —
sub-microsecond input is truncated by Spark's own converters before the
engine sees it. ``render`` reproduces the reference's 7-digit string
(the 7th digit is always 0).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def render(c: F.Column) -> F.Column:
    """``HH:MM:SS.fffffff`` from a DayTimeIntervalType(HOUR, SECOND)
    column — integer µs arithmetic, built-ins only."""
    # interval -> total µs: add to the zero epoch (a bigint cast would
    # truncate to whole seconds)
    us = F.unix_micros(F.timestamp_micros(F.lit(0)) + c)
    hh = (us / 3_600_000_000).cast("long")
    mm = F.pmod((us / 60_000_000).cast("long"), 60)
    ss = F.pmod((us / 1_000_000).cast("long"), 60)
    frac = F.pmod(us, 1_000_000)
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            F.lpad(hh.cast("string"), 2, "0"), F.lit(":"),
            F.lpad(mm.cast("string"), 2, "0"), F.lit(":"),
            F.lpad(ss.cast("string"), 2, "0"), F.lit("."),
            F.lpad(frac.cast("string"), 6, "0"), F.lit("0"),
        )
    )
