"""``datetimeoffset`` offset preservation.

The reference keeps the original UTC offset of a DATETIMEOFFSET value
end-to-end: naive inputs are assumed UTC, tz-aware inputs keep their
offset, and values render as ``YYYY-MM-DD HH:MM:SS.fffffff ±HH:MM``
(reference: mssql_dataframe/core/conversion.py:528-588 write path,
:685-837 read path).

Spark has no per-row time zone — ``TimestampType`` is an absolute
instant normalized to UTC. The Spark realization (SURVEY.md §2.4 #28
"optional offset column") is a **companion column**: every declared
``datetimeoffset`` column ``c`` stores

- ``c``        TimestampType — the absolute instant (UTC), so range
               filters, joins and comparisons work natively, and
- ``c__tz``    ShortType — the original offset in minutes (engine
               managed; derived from the trailing ``±HH:MM`` of string
               inputs, 0 for naive inputs, passed through when the
               source provides it explicitly).

``read.table`` hides companions by default (``include_tz_offsets=True``
exposes them) and ``render()`` reconstructs the reference's
local-time-plus-offset string from the pair. All expressions are
built-in (JVM codegen) — no Python in this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OFFSET_SUFFIX = "__tz"

#: trailing offset of a datetimeoffset literal. Groups: 1=Z, 2=sign,
#: 3=hours, 4=minutes. Accepts every zone form Spark's string->
#: timestamp cast honors — ±H, ±HH, ±H:MM, ±HH:MM, ±HHMM, ±HH:MM:SS
#: (offset seconds are parsed past but not stored: SQL Server's
#: datetimeoffset has minute granularity). Matching a SUBSET of what
#: the cast accepts would desync instant and recorded offset: the
#: cast would shift the instant while the companion recorded +00:00,
#: silently changing the rendered wall time for forms like '+5:30'.
_OFFSET_RE = r"(?:(Z)|([+-])(\d{1,2})(?::?(\d{2}))?(?::\d{2})?)\s*$"


def companions(meta) -> dict[str, str]:
    """{dto_column: companion_column} for one table's metadata."""
    out = {}
    fields = set(meta.spark_schema.fieldNames())
    for col, spec in meta.column_types.items():
        if spec.split("(")[0].strip().lower() == "datetimeoffset":
            comp = col + OFFSET_SUFFIX
            if comp in fields:
                out[col] = comp
    return out


def offset_minutes(c: F.Column) -> F.Column:
    """Offset minutes from a datetimeoffset string's trailing ``±HH:MM``
    (``Z`` and missing offset both mean UTC — the reference assumes UTC
    for naive values, conversion.py:536-538)."""
    sign = F.when(
        F.regexp_extract(c, _OFFSET_RE, 2) == "-", F.lit(-1)
    ).otherwise(F.lit(1))
    hh = F.regexp_extract(c, _OFFSET_RE, 3).try_cast("int")
    mm = F.regexp_extract(c, _OFFSET_RE, 4).try_cast("int")
    mins = sign * (F.coalesce(hh, F.lit(0)) * 60 + F.coalesce(mm, F.lit(0)))
    return F.when(c.isNull(), F.lit(None)).otherwise(mins).cast("smallint")


def derive(df: DataFrame, meta) -> DataFrame:
    """Populate missing companion columns before a write.

    - string source  -> offset parsed from the literal's trailing
      ``±HH:MM`` (the instant itself is produced by the normal cast,
      which honors the offset),
    - timestamp source -> offset 0 (naive values are assumed UTC,
      reference conversion.py:536-538),
    - companion already present in the source -> passed through
      untouched (caller-supplied offsets win).
    """
    comps = companions(meta)
    if not comps:
        return df
    out = df
    for col, comp in comps.items():
        if col not in df.columns or comp in df.columns:
            continue
        src = df.schema[col].dataType.simpleString()
        if src == "string":
            out = out.withColumn(comp, offset_minutes(F.col(col)))
        else:
            out = out.withColumn(
                comp,
                F.when(F.col(col).isNotNull(), F.lit(0)).cast("smallint"),
            )
    return out


def render(instant: F.Column, offset_min: F.Column) -> F.Column:
    """Reference-style render ``YYYY-MM-DD HH:MM:SS.fffffff ±HH:MM``:
    local wall time at the preserved offset, 7-digit fraction (SQL
    Server's 100 ns places; Spark stores µs, so the 7th digit is 0),
    then the signed offset. Built-ins only — integer µs arithmetic,
    no session-timezone dependence beyond the pinned-UTC render."""
    off = F.coalesce(offset_min.cast("long"), F.lit(0))
    local = F.timestamp_micros(F.unix_micros(instant) + off * 60_000_000)
    frac7 = F.concat(
        F.lpad(F.pmod(F.unix_micros(local), 1_000_000).cast("string"), 6, "0"),
        F.lit("0"),
    )
    sign = F.when(off < 0, F.lit("-")).otherwise(F.lit("+"))
    amin = F.abs(off)
    hhmm = F.concat(
        F.lpad((amin / 60).cast("long").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(F.pmod(amin, 60).cast("string"), 2, "0"),
    )
    return F.when(
        instant.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.date_format(local.cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss"),
            F.lit("."), frac7, F.lit(" "), sign, hhmm,
        )
    )
