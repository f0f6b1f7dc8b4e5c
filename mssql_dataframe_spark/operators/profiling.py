"""Dataset profiling: the per-column quality report (Deequ /
``DESCRIBE EXTENDED`` class of functionality) a pipeline runs before
trusting a new data drop.

One aggregation pass computes every column's metrics simultaneously
(map-side partial aggregation, one shuffle of one row per metric
group); the wide single-row result is then unpivoted driver-side into
the long (column, metric...) form — the profile is O(columns) scalars,
never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_value, max_value)
    for each requested column — exact counts (no sketches, so the
    result is engine-exact and oracle-checkable; swap count_distinct
    for approx_count_distinct at the 100 TB profile-everything scale).
    min/max render as strings so heterogeneous column types fit one
    report schema."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            # coalesce: sum over ZERO rows is NULL, and an empty data
            # drop must profile as n_nulls=0, not break `n_nulls == 0`
            # quality gates with a NULL
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"__nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = wide.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.col(f"__n_{c}").cast("bigint").alias("n_rows"),
                    F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
                    F.col(f"__dist_{c}").cast("bigint").alias("n_distinct"),
                    F.col(f"__min_{c}").alias("min_value"),
                    F.col(f"__max_{c}").alias("max_value"),
                )
                for c in cols
            ])
        ).alias("p")
    )
    return rows.select("p.*")
