"""Schema introspection: ``get_schema``.

Reference (mssql_dataframe/core/conversion.py:38-162): read the column
catalog + primary-key info, join the conversion rules, flag identity
columns, error on unknown types; optionally (``dataframe=`` param at
conversion.py:41, used at :96-162) validate a candidate dataframe
against the schema and return it converted to the rule types. Output
shape mirrors the reference's schema DataFrame: one row per column with
``column_name / sql_type / column_size / decimal_digits / is_nullable /
 is_identity / pk_seq / pandas_type / spark_type``.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame

from ..conversion_rules import parse_column_spec
from ..store import TableStore
from ..validation import precheck_dataframe
from . import datetimeoffset as dto


def get_schema(
    store: TableStore,
    table_name: str,
    dataframe: Optional[DataFrame] = None,
):
    """Introspect ``table_name``; with ``dataframe=`` also validate the
    candidate frame against the schema and return it converted
    (reference conversion.py:38-162: returns ``(schema, dataframe)``
    when a dataframe is supplied, else just the schema)."""
    schema_df = _schema_frame(store, table_name)
    if dataframe is None:
        return schema_df
    meta = store.meta(table_name)
    unknown = [
        c for c in dataframe.columns if c not in meta.column_types
    ]
    if unknown:
        # surface the documented error class instead of the raw
        # KeyError the dict comprehension below would raise
        from ..errors import DataframeColumnDoesNotExist

        raise DataframeColumnDoesNotExist(
            f"columns {unknown} do not exist in table {table_name!r}"
        )
    converted = precheck_dataframe(
        dataframe,
        {c: meta.column_types[c] for c in dataframe.columns},
        not_nullable=[
            c for c in (*meta.not_nullable, *meta.primary_key)
            if c != meta.identity_column and c in dataframe.columns
        ],
    )
    return schema_df, converted


def _schema_frame(store: TableStore, table_name: str) -> pd.DataFrame:
    meta = store.meta(table_name)
    # engine-internal datetimeoffset companion columns are not part of
    # the user-declared schema (core/datetimeoffset.py)
    hidden = set(dto.companions(meta).values())
    rows = []
    pk_seq = {c: i + 1 for i, c in enumerate(meta.primary_key)}
    for f in meta.spark_schema.fields:
        if f.name in hidden:
            continue
        spec = parse_column_spec(meta.column_types[f.name])
        rows.append(
            {
                "column_name": f.name,
                "sql_type": spec.sql_type,
                "column_size": spec.size,
                "decimal_digits": spec.scale,
                "is_nullable": f.nullable,
                "is_identity": f.name == meta.identity_column,
                "pk_seq": pk_seq.get(f.name),
                "pk_name": meta.properties.get("primary_key_name"),
                "pandas_type": spec.rule.pandas_type,
                "spark_type": spec.spark_type.simpleString(),
            }
        )
    return pd.DataFrame(rows).set_index("column_name")
