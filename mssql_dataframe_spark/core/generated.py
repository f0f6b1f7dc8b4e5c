"""Computed columns (SQL Server ``ADD <col> AS (<expr>) PERSISTED``
analog; Delta calls them generated columns).

Semantics follow SQL Server, the reference's own universe:
- a computed column is declared from a restricted scalar expression
  over the row's other columns,
- explicit writes into it are REJECTED (SQL Server error 271), so no
  equality-audit job is ever needed,
- the ENGINE computes the value on every write path (insert, update,
  merge, SCD2) — the PERSISTED variant: values are materialized into
  storage and pruning/stats work on them like any column.

The expression language is whitelist-validated (column refs, numeric /
string literals, arithmetic and ``||``, and a fixed set of
deterministic built-ins) so declared DDL cannot smuggle arbitrary SQL
— the same posture as the where-grammar (identifiers.compile_where).
Everything compiles to built-in column expressions: zero UDFs, full
codegen, no extra Spark jobs on any write.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import SQLInvalidSyntax

#: deterministic, engine-portable built-ins only (no rand/uuid/now)
_FUNC_WHITELIST = {
    "year", "month", "day", "hour", "minute", "second", "quarter",
    "date_trunc", "datediff", "concat", "upper", "lower", "substring",
    "length", "trim", "ltrim", "rtrim", "replace", "coalesce",
    "round", "floor", "ceil", "ceiling", "abs", "sign", "greatest",
    "least", "cast", "nullif", "left", "right", "lpad", "rpad",
}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^']|'')*')
      | (?P<number>\d+\.?\d*|\.\d+)
      | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<op>\|\||[+\-*/%(),])
    )""",
    re.VERBOSE,
)

#: bare keywords allowed outside the function whitelist (cast syntax)
_KEYWORDS = {"as", "int", "bigint", "double", "float", "string", "date",
             "timestamp", "decimal", "smallint", "tinyint", "boolean",
             "interval", "day", "month", "year"}


def validate_computed_expr(expression: str, columns: list[str]) -> str:
    """Validate ``expression`` against the whitelist grammar; returns
    the expression unchanged if every token is a known column, literal,
    whitelisted function, cast keyword, or operator."""
    if not expression or not expression.strip():
        raise SQLInvalidSyntax("empty computed-column expression")
    colset = {c.lower() for c in columns}
    pos = 0
    s = expression
    while pos < len(s):
        if s[pos].isspace():
            pos += 1
            continue
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise SQLInvalidSyntax(
                f"computed-column expression: unexpected character "
                f"{s[pos]!r} at offset {pos}"
            )
        name = m.group("name")
        if name is not None:
            low = name.lower()
            if (
                low not in colset
                and low not in _FUNC_WHITELIST
                and low not in _KEYWORDS
            ):
                raise SQLInvalidSyntax(
                    f"computed-column expression: {name!r} is not a "
                    "column of the table or a whitelisted function"
                )
        pos = m.end()
    return expression.strip()


def reject_explicit_writes(df_columns, computed: dict) -> None:
    """SQL Server error 271 analog: the column cannot be modified."""
    hit = [c for c in computed if c in df_columns]
    if hit:
        from ..errors import DataframeColumnInvalidValue

        raise DataframeColumnInvalidValue(
            f"column(s) {hit} are computed and cannot be written "
            "explicitly (SQL Server computed-column semantics)"
        )


def materialize(df: DataFrame, meta) -> DataFrame:
    """Compute every declared computed column on the outgoing frame,
    cast to its declared type, preserving schema column order."""
    computed = meta.properties.get("computed_columns") or {}
    if not computed:
        return df
    out = df
    for c, expr in computed.items():
        dtype = meta.spark_schema[c].dataType
        out = out.withColumn(c, F.expr(expr).cast(dtype))
    return out.select(*meta.spark_schema.fieldNames())
