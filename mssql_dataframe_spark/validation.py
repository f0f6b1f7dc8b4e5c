"""Pre-write validation & conversion pipeline.

Reimplements the reference's ``_precheck_dataframe`` pipeline
(reference: mssql_dataframe/core/conversion.py:165-211) over Spark
DataFrames:

1. restrict the target schema to columns present in the source,
2. upcast to the widest type of each SQL category before range checks
   (reference: conversion.py:214-253) so e.g. 10000 into a tinyint is
   caught instead of silently wrapped,
3. range / string-length / binary-length checks in ONE distributed
   aggregation pass (reference computes client-side min/max —
   conversion.py:256-326; here it is a single ``df.agg`` job, scale-safe),
4. ASCII check for non-unicode char/varchar columns (reference:
   conversion.py:329-354),
5. value preparation: decimal scale rounding with warning (reference:
   conversion.py:591-608), datetime rounding to SQL Server grids
   (conversion.py:448-525), binary(n) zero-padding (conversion.py:611-620),
6. cast to the rule types.

All checks are expressed with built-in functions (JVM-side, codegen) —
no Python UDFs in this path.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .conversion_rules import RULES, WIDEST_SPARK_TYPE, ColumnSpec, parse_column_spec
from .errors import (
    DataframeColumnDoesNotExist,
    SQLInsufficientColumnSize,
    SQLNonUnicodeTypeColumn,
)

logger = logging.getLogger("mssql_dataframe_spark")


def precheck_dataframe(
    df: DataFrame, column_types: dict[str, str]
) -> DataFrame:
    """Validate and convert ``df`` against the declared SQL types of the
    target table; returns the adjusted DataFrame (the reference returns
    the possibly precision-adjusted frame so callers can compare
    round-trip equality — conversion.py:898-899)."""
    specs: dict[str, ColumnSpec] = {}
    for col in df.columns:
        if col not in column_types:
            raise DataframeColumnDoesNotExist(
                f"dataframe column {col!r} is not a column of the target table"
            )
        specs[col] = parse_column_spec(column_types[col])

    df = _upcast_widest(df, specs)
    _check_column_size(df, specs)
    _check_unicode(df, specs)
    df = _prepare_values(df, specs)
    return _cast_to_rules(df, specs)


def _upcast_widest(df: DataFrame, specs: dict[str, ColumnSpec]) -> DataFrame:
    """Upcast numeric columns to their category's widest type before
    range checks (reference: conversion.py:214-253)."""
    out = df
    for col, spec in specs.items():
        widest = WIDEST_SPARK_TYPE.get(spec.rule.sql_category)
        if widest is not None and not isinstance(
            df.schema[col].dataType, (T.StringType,)
        ):
            out = out.withColumn(col, F.col(col).cast(widest))
    return out


def _check_column_size(df: DataFrame, specs: dict[str, ColumnSpec]) -> None:
    """One distributed agg pass computing per-column min/max (numerics,
    temporals) and max length (strings/binary), then compared to the
    rule bounds / declared sizes (reference: conversion.py:256-326)."""
    aggs = []
    checks = []  # (col, kind, bound_lo, bound_hi)
    for col, spec in specs.items():
        rule = spec.rule
        c = F.col(col)
        if rule.sql_category in (
            "boolean",
            "exact_whole_numeric",
            "approximate_decimal_numeric",
            "date_time",
        ) and rule.min_value is not None:
            aggs += [F.min(c).alias(f"{col}__min"), F.max(c).alias(f"{col}__max")]
            checks.append((col, "range", rule.min_value, rule.max_value))
        elif rule.sql_category == "character string" and spec.size:
            aggs.append(F.max(F.length(c)).alias(f"{col}__len"))
            checks.append((col, "length", None, spec.size))
        elif rule.sql_category == "binary" and spec.size:
            aggs.append(F.max(F.octet_length(c)).alias(f"{col}__len"))
            checks.append((col, "length", None, spec.size))
    if not aggs:
        return
    row = df.agg(*aggs).collect()[0].asDict()
    errors = []
    for col, kind, lo, hi in checks:
        if kind == "range":
            vmin, vmax = row[f"{col}__min"], row[f"{col}__max"]
            if vmin is None:
                continue
            try:
                too_small = lo is not None and vmin < lo
                too_big = hi is not None and vmax > hi
            except TypeError:
                continue  # incomparable (e.g. interval vs timedelta bound)
            if too_small or too_big:
                errors.append(
                    f"column {col!r}: allowed range [{lo}, {hi}], "
                    f"actual range [{vmin}, {vmax}]"
                )
        else:
            ln = row[f"{col}__len"]
            if ln is not None and ln > hi:
                errors.append(
                    f"column {col!r}: max allowed size {hi}, actual {ln}"
                )
    if errors:
        raise SQLInsufficientColumnSize("; ".join(errors))


def _check_unicode(df: DataFrame, specs: dict[str, ColumnSpec]) -> None:
    """Reject non-ASCII content in char/varchar columns (reference:
    conversion.py:329-354). nchar/nvarchar allow unicode."""
    cols = [
        c for c, s in specs.items() if s.sql_type in ("char", "varchar")
    ]
    if not cols:
        return
    conds = [
        F.max(
            (F.length(F.col(c)) != F.octet_length(F.col(c))).cast("int")
        ).alias(c)
        for c in cols
    ]
    row = df.agg(*conds).collect()[0].asDict()
    bad = [c for c, v in row.items() if v == 1]
    if bad:
        raise SQLNonUnicodeTypeColumn(
            f"non-ASCII content in non-unicode column(s): {bad} "
            f"(use nchar/nvarchar for unicode)"
        )


def _prepare_values(df: DataFrame, specs: dict[str, ColumnSpec]) -> DataFrame:
    """Precision adjustments with the reference's warning contract."""
    out = df
    for col, spec in specs.items():
        dt = df.schema[col].dataType
        if spec.sql_type in ("numeric", "decimal"):
            scale = spec.scale if spec.scale is not None else 0
            target = T.DecimalType(spec.size or 18, scale)
            rounded = F.col(col).cast(target)
            changed = out.filter(
                F.col(col).isNotNull()
                & (F.col(col).cast("double") != rounded.cast("double"))
            ).limit(1).count()
            if changed:
                # warning contract: reference conversion.py:591-608
                logger.warning(
                    "Column %r values rounded to precision and scale %s",
                    col, f"({spec.size or 18},{scale})",
                )
            out = out.withColumn(col, rounded)
        elif spec.sql_type == "datetime" and isinstance(
            dt, (T.TimestampType, T.TimestampNTZType)
        ):
            # round ms to SQL Server DATETIME's .000/.003/.007 grid
            # (reference: conversion.py:448-483, increments at 460-471)
            out = out.withColumn(col, _datetime_grid(F.col(col)))
        elif spec.sql_type == "binary" and spec.size:
            # right-pad binary(n) with 0x00 (reference: conversion.py:611-620)
            out = out.withColumn(
                col,
                F.when(
                    F.col(col).isNotNull(),
                    F.concat(
                        F.col(col),
                        F.expr(
                            f"repeat(X'00', {spec.size} - octet_length(`{col}`))"
                        ).cast("binary"),
                    ),
                ),
            )
    return out


def _datetime_grid(c: F.Column) -> F.Column:
    """Legacy DATETIME rounds milliseconds to the nearest of
    {.xx0, .xx3, .xx7} (reference: conversion.py:460-471).

    Exact integer arithmetic throughout: a double intermediate would
    lose precision above 2^53 µs (~year 2255), and Spark 4 refuses
    TIMESTAMP_NTZ -> DOUBLE casts outright. The NTZ wall clock is
    preserved because the session timezone is pinned to UTC."""
    micros = F.unix_micros(c.cast("timestamp"))
    r = F.pmod(micros, F.lit(1000))
    # (micros - r) is a multiple of 1000; the quotient < 2^53 so the
    # double division below is exact
    base = ((micros - r) / F.lit(1000)).cast("long")
    ms = base + F.when(r >= 500, F.lit(1)).otherwise(F.lit(0))
    last = F.pmod(ms, F.lit(10))
    snapped = (
        F.when(last <= 1, ms - last)
        .when(last <= 4, ms - last + 3)
        .when(last <= 8, ms - last + 7)
        .otherwise(ms - last + 10)
    )
    return F.timestamp_micros(snapped * F.lit(1000)).cast("timestamp_ntz")


def _cast_to_rules(df: DataFrame, specs: dict[str, ColumnSpec]) -> DataFrame:
    out = df
    for col, spec in specs.items():
        out = out.withColumn(col, F.col(col).cast(spec.spark_type))
    return out
