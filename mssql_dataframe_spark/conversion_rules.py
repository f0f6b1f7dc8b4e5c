"""The SQL Server data model: SQL type string <-> Spark type <-> pandas dtype.

19 reference types (reference: mssql_dataframe/core/conversion_rules.py:7-166)
plus 5 beyond-reference SQL Server types (real, money, smallmoney,
smalldatetime, uniqueidentifier) so a wider slice of real SQL Server
schemas ports without edits.

Rules are keyed by the lowercase SQL type name. Each rule carries the value bounds the
reference enforces before every write (reference: conversion.py:256-326)
plus the Spark type constructor used by our engine.

Divergences (documented per SURVEY.md §7):
- ``tinyint`` is unsigned 0..255 in SQL Server; Spark has no unsigned
  1-byte integer, so we store it as ShortType and enforce the 0..255
  range at validation time.
- ``time`` has no native Spark type; we store it as
  DayTimeIntervalType (duration since midnight) and enforce the
  0..24h range.
- SQL Server's 100 ns datetime2 resolution exceeds Spark's 1 µs
  timestamps; rounding below 1 µs therefore truncates (warned).
- ``smalldatetime`` rounds to the MINUTE (SQL Server: second parts of
  29.998 s or less round down, 29.999 s or more round up).
- ``uniqueidentifier`` stores the canonical 36-char upper-case GUID
  rendering; malformed values are rejected at validation time.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import types as T

from .errors import UndefinedConversionRule


@dataclass(frozen=True)
class Rule:
    """One row of the conversion-rules table (reference:
    conversion_rules.py:7-166)."""

    sql_type: str
    sql_category: str
    min_value: object
    max_value: object
    pandas_type: str
    spark_type: Callable[[Optional[int], Optional[int]], T.DataType]
    # True when the declared size bounds string/binary length
    sized: bool = False


def _fixed(t: T.DataType) -> Callable:
    return lambda size=None, scale=None: t


def _decimal(size=None, scale=None) -> T.DataType:
    return T.DecimalType(size or 18, scale if scale is not None else 0)


_MIN_DATE = datetime.date(1, 1, 2)
_MAX_DATE = datetime.date(9999, 12, 31)
_MIN_DATETIME = datetime.datetime(1753, 1, 1)
_MAX_TS = datetime.datetime(9999, 12, 31, 23, 59, 59, 999999)
# legacy DATETIME tops out at .997 — its ms grid has no .998/.999
# slot, and admitting .9985+ would round past year 9999 (SQL Server
# raises a conversion overflow there; so do we, at the range check)
_MAX_DATETIME = datetime.datetime(9999, 12, 31, 23, 59, 59, 997000)
_MIN_TS = datetime.datetime(1, 1, 1)

RULES: dict[str, Rule] = {
    "bit": Rule("bit", "boolean", False, True, "boolean", _fixed(T.BooleanType())),
    "tinyint": Rule(
        "tinyint", "exact_whole_numeric", 0, 255, "UInt8", _fixed(T.ShortType())
    ),
    "smallint": Rule(
        "smallint", "exact_whole_numeric", -(2**15), 2**15 - 1, "Int16",
        _fixed(T.ShortType()),
    ),
    "int": Rule(
        "int", "exact_whole_numeric", -(2**31), 2**31 - 1, "Int32",
        _fixed(T.IntegerType()),
    ),
    "bigint": Rule(
        "bigint", "exact_whole_numeric", -(2**63), 2**63 - 1, "Int64",
        _fixed(T.LongType()),
    ),
    "float": Rule(
        "float", "approximate_decimal_numeric", -1.79e308, 1.79e308, "float64",
        _fixed(T.DoubleType()),
    ),
    "numeric": Rule(
        "numeric", "exact_decimal_numeric", None, None, "object", _decimal
    ),
    "decimal": Rule(
        "decimal", "exact_decimal_numeric", None, None, "object", _decimal
    ),
    "time": Rule(
        "time", "date_time", datetime.timedelta(0),
        datetime.timedelta(hours=23, minutes=59, seconds=59, microseconds=999999),
        "timedelta64[ns]",
        _fixed(T.DayTimeIntervalType(T.DayTimeIntervalType.HOUR,
                                     T.DayTimeIntervalType.SECOND)),
    ),
    "date": Rule("date", "date_time", _MIN_DATE, _MAX_DATE, "datetime64[ns]",
                 _fixed(T.DateType())),
    "datetime": Rule(
        "datetime", "date_time", _MIN_DATETIME, _MAX_DATETIME,
        "datetime64[ns]", _fixed(T.TimestampNTZType()),
    ),
    "datetime2": Rule(
        "datetime2", "date_time", _MIN_TS, _MAX_TS, "datetime64[ns]",
        _fixed(T.TimestampNTZType()),
    ),
    "datetimeoffset": Rule(
        "datetimeoffset", "date_time", _MIN_TS, _MAX_TS, "object",
        _fixed(T.TimestampType()),
    ),
    "char": Rule("char", "character string", None, None, "string",
                 _fixed(T.StringType()), sized=True),
    "varchar": Rule("varchar", "character string", None, None, "string",
                    _fixed(T.StringType()), sized=True),
    "nchar": Rule("nchar", "character string", None, None, "string",
                  _fixed(T.StringType()), sized=True),
    "nvarchar": Rule("nvarchar", "character string", None, None, "string",
                     _fixed(T.StringType()), sized=True),
    "binary": Rule("binary", "binary", None, None, "object",
                   _fixed(T.BinaryType()), sized=True),
    # -- beyond-reference SQL Server types --------------------------
    "real": Rule(
        "real", "approximate_decimal_numeric", -3.4e38, 3.4e38, "float32",
        _fixed(T.FloatType()),
    ),
    "money": Rule(
        "money", "exact_decimal_numeric", None, None, "object",
        _fixed(T.DecimalType(19, 4)),
    ),
    "smallmoney": Rule(
        "smallmoney", "exact_decimal_numeric", None, None, "object",
        _fixed(T.DecimalType(10, 4)),
    ),
    "smalldatetime": Rule(
        "smalldatetime", "date_time", datetime.datetime(1900, 1, 1),
        datetime.datetime(2079, 6, 6, 23, 59), "datetime64[ns]",
        _fixed(T.TimestampNTZType()),
    ),
    "uniqueidentifier": Rule(
        "uniqueidentifier", "character string", None, None, "string",
        _fixed(T.StringType()),
    ),
    "varbinary": Rule("varbinary", "binary", None, None, "object",
                      _fixed(T.BinaryType()), sized=True),
}

# widest type per category, used for the pre-validation upcast
# (reference: conversion.py:214-253 convert_largest_sql_category)
WIDEST_SPARK_TYPE = {
    "exact_whole_numeric": T.LongType(),
    "approximate_decimal_numeric": T.DoubleType(),
    "exact_decimal_numeric": T.DecimalType(38, 18),
}

_SPEC_RE = re.compile(
    r"^\s*(?P<type>[A-Za-z][A-Za-z0-9_]*)\s*"
    r"(?:\(\s*(?P<size>MAX|max|\d+)\s*(?:,\s*(?P<scale>\d+)\s*)?\))?\s*$"
)


@dataclass(frozen=True)
class ColumnSpec:
    """Parsed SQL type declaration, e.g. ``DECIMAL(5,2)`` or
    ``VARCHAR(MAX)`` (reference: dynamic.py:140-166 column_spec)."""

    sql_type: str          # normalized lowercase base type
    size: Optional[int]    # None for unsized; None for (MAX)
    scale: Optional[int]
    is_max: bool

    @property
    def rule(self) -> Rule:
        return RULES[self.sql_type]

    @property
    def spark_type(self) -> T.DataType:
        return self.rule.spark_type(self.size, self.scale)

    def render(self) -> str:
        """Canonical SQL type string (for get_schema output)."""
        if self.is_max:
            return f"{self.sql_type}(MAX)"
        if self.size is not None and self.scale is not None:
            return f"{self.sql_type}({self.size},{self.scale})"
        if self.size is not None:
            return f"{self.sql_type}({self.size})"
        return self.sql_type


def parse_column_spec(spec: str) -> ColumnSpec:
    """Parse a SQL type string into (type, size, scale).

    Mirrors the reference's ``dynamic.column_spec`` regex split
    (reference: dynamic.py:140-166) and its rules-lookup normalization
    of ``int identity`` -> ``int`` (reference: conversion.py:141-146).

    >>> parse_column_spec("DECIMAL(5,2)").render()
    'decimal(5,2)'
    >>> parse_column_spec("varchar(MAX)").is_max
    True
    >>> parse_column_spec("bigint identity(1,1)").sql_type
    'bigint'
    >>> parse_column_spec("nvarchar(100)").spark_type
    StringType()
    >>> parse_column_spec("flux")  # doctest: +IGNORE_EXCEPTION_DETAIL
    Traceback (most recent call last):
        ...
    UndefinedConversionRule: cannot parse SQL type spec
    """
    cleaned = re.sub(r"\s+identity.*$", "", spec.strip(), flags=re.IGNORECASE)
    m = _SPEC_RE.match(cleaned)
    if not m:
        raise UndefinedConversionRule(f"cannot parse SQL type spec: {spec!r}")
    base = m.group("type").lower()
    if base not in RULES:
        raise UndefinedConversionRule(
            f"SQL type {base!r} has no conversion rule (reference "
            f"conversion.py:151-156 raises the same error)"
        )
    size_raw = m.group("size")
    is_max = size_raw is not None and size_raw.lower() == "max"
    size = int(size_raw) if size_raw and not is_max else None
    scale = int(m.group("scale")) if m.group("scale") else None
    return ColumnSpec(base, size, scale, is_max)


def spark_type_to_spec(dt: T.DataType) -> ColumnSpec:
    """Best-effort inverse mapping for df-schema-derived table creation
    (the convenience path Spark gives us for free — SURVEY.md §1.2)."""
    if isinstance(dt, T.BooleanType):
        return ColumnSpec("bit", None, None, False)
    if isinstance(dt, T.ByteType):
        return ColumnSpec("tinyint", None, None, False)
    if isinstance(dt, T.ShortType):
        return ColumnSpec("smallint", None, None, False)
    if isinstance(dt, T.IntegerType):
        return ColumnSpec("int", None, None, False)
    if isinstance(dt, T.LongType):
        return ColumnSpec("bigint", None, None, False)
    if isinstance(dt, T.FloatType):
        return ColumnSpec("real", None, None, False)
    if isinstance(dt, T.DoubleType):
        return ColumnSpec("float", None, None, False)
    if isinstance(dt, T.DecimalType):
        return ColumnSpec("decimal", dt.precision, dt.scale, False)
    if isinstance(dt, T.DateType):
        return ColumnSpec("date", None, None, False)
    if isinstance(dt, (T.TimestampNTZType,)):
        return ColumnSpec("datetime2", None, None, False)
    if isinstance(dt, T.TimestampType):
        return ColumnSpec("datetimeoffset", None, None, False)
    if isinstance(dt, T.DayTimeIntervalType):
        return ColumnSpec("time", None, None, False)
    if isinstance(dt, T.BinaryType):
        return ColumnSpec("varbinary", None, None, True)
    if isinstance(dt, T.StringType):
        return ColumnSpec("nvarchar", None, None, True)
    raise UndefinedConversionRule(f"no SQL type rule for Spark type {dt}")
