"""Dynamic Data Masking (SQL Server DDM analog).

The reference targets SQL Server, whose tables can declare
``MASKED WITH (FUNCTION = '...')`` on sensitive columns; unprivileged
reads see masked values while predicates still evaluate on real data.
This module reimplements the three deterministic DDM functions over
Spark columns (SQL Server's ``random()`` mask is intentionally
omitted — a nondeterministic read would break the engine's
cross-engine reproducibility contract; use ``partial``/``default``):

- ``default()``  — type-driven sentinel: strings -> 'xxxx', numerics
  -> 0, dates/timestamps -> 1900-01-01, booleans -> false,
  binary -> 0x00.
- ``email()``    — first character + 'XXX@XXXX.com'.
- ``partial(prefix, 'pad', suffix)`` — first ``prefix`` and last
  ``suffix`` characters with the literal ``pad`` between; values too
  short to expose both ends collapse to the pad alone.

Masks are metadata (table properties) applied at READ time in
``read.table`` — storage keeps real values, so adding/dropping a mask
is O(1) metadata, never a rewrite. Like SQL Server, ``where``
predicates run BEFORE masking (the documented DDM inference caveat).
All masks are built-in column expressions: zero UDFs, fully codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_RE = re.compile(
    r"^partial\(\s*(\d+)\s*,\s*'([^']*)'\s*,\s*(\d+)\s*\)$"
)


def validate_mask_function(function: str) -> None:
    f = function.strip()
    if f in ("default()", "email()") or _PARTIAL_RE.match(f):
        return
    raise ValueError(
        f"unsupported mask function {function!r}: use default(), email() "
        "or partial(prefix,'pad',suffix)"
    )


def mask_expr(col: Column, dtype: T.DataType, function: str) -> Column:
    """The masked replacement for ``col`` of Spark type ``dtype``."""
    f = function.strip()
    if f == "default()":
        if isinstance(dtype, T.StringType):
            return F.lit("xxxx")
        if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            return F.lit("1900-01-01 00:00:00").cast(dtype)
        if isinstance(dtype, T.BooleanType):
            return F.lit(False)
        if isinstance(dtype, T.BinaryType):
            return F.lit(bytearray(b"\x00")).cast("binary")
        return F.lit(0).cast(dtype)
    if f == "email()":
        return F.concat(F.substring(col.cast("string"), 1, 1), F.lit("XXX@XXXX.com"))
    m = _PARTIAL_RE.match(f)
    assert m, f"unvalidated mask function {function!r}"
    prefix, pad, suffix = int(m.group(1)), m.group(2), int(m.group(3))
    s = col.cast("string")
    full = F.concat(
        F.substring(s, 1, prefix),
        F.lit(pad),
        F.when(F.lit(suffix) > 0, s.substr(F.length(s) - suffix + 1, F.lit(suffix)))
        .otherwise(F.lit("")),
    )
    return F.when(F.length(s) <= prefix + suffix, F.lit(pad)).otherwise(full)


def apply_masks(df, schema: T.StructType, policies: dict):
    """Replace each policy column with its mask expression; NULLs stay
    NULL (SQL Server masks only non-NULL values)."""
    if not policies:
        return df
    out = df
    for c in schema.fieldNames():
        if c in policies and c in df.columns:
            masked = mask_expr(F.col(c), schema[c].dataType, policies[c])
            out = out.withColumn(
                c, F.when(F.col(c).isNull(), F.lit(None)).otherwise(masked)
            )
    return out
