"""Equality checks with failure reasons for DataFrames.

Reference parity: ``mssql_dataframe/__equality__.py:compare_dfs`` raises
a descriptive assertion naming the first unequal column. The Spark
version compares as UNORDERED multisets (a Spark DataFrame is a
relation without row order — the documented divergence from the
pandas/index-ordered reference; order-sensitive callers should sort and
zip with row_number first).

Scale shape: the equality itself is ONE ``exceptAll`` anti-join after
a row-count check — with equal cardinalities, ``df1 \\ df2`` empty
already implies multiset equality (each row's multiplicity in df1 is
<= its multiplicity in df2, and the totals match, which forces them
equal), so the second anti-join would only double the success-path
shuffle cost. The per-column blame scan only runs on the failure
path.

Contract checks raise explicitly (never bare ``assert``) so the
column/dtype/count guarantees survive ``python -O``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def compare_dfs(df1: DataFrame, df2: DataFrame) -> bool:
    """Raise a descriptive ``AssertionError`` if the frames differ;
    return True when equal (reference __equality__.py:4-14)."""
    if list(df1.columns) != list(df2.columns):
        raise AssertionError(
            f"columns differ: {list(df1.columns)} vs {list(df2.columns)}"
        )
    t1 = {f.name: f.dataType for f in df1.schema.fields}
    t2 = {f.name: f.dataType for f in df2.schema.fields}
    mismatched = [c for c in t1 if t1[c] != t2[c]]
    if mismatched:
        raise AssertionError(
            f"column dtypes differ: "
            f"{[(c, t1[c].simpleString(), t2[c].simpleString()) for c in mismatched]}"
        )
    n1, n2 = df1.count(), df2.count()
    if n1 != n2:
        raise AssertionError(f"row counts differ: {n1} vs {n2}")
    if df1.exceptAll(df2).isEmpty():
        return True
    # failure path: name the column(s) whose value multisets differ so
    # the error is actionable, same spirit as the reference's
    # per-column "Column {col} is not equal."
    unequal = []
    for col in df1.columns:
        a, b = df1.select(col), df2.select(col)
        if not a.exceptAll(b).isEmpty() or not b.exceptAll(a).isEmpty():
            unequal.append(col)
    raise AssertionError(
        f"Column(s) {unequal or df1.columns} are not equal."
    )
