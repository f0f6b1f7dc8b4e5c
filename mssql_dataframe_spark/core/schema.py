"""Schema introspection: ``get_schema``.

Reference (mssql_dataframe/core/conversion.py:38-162): read the column
catalog + primary-key info, join the conversion rules, flag identity
columns, error on unknown types. Output shape mirrors the reference's
schema DataFrame: one row per column with
``column_name / sql_type / column_size / decimal_digits / is_nullable /
 is_identity / pk_seq / pandas_type / spark_type``.
"""

from __future__ import annotations

import pandas as pd

from ..conversion_rules import parse_column_spec
from ..store import TableStore


def get_schema(store: TableStore, table_name: str) -> pd.DataFrame:
    meta = store.meta(table_name)
    rows = []
    pk_seq = {c: i + 1 for i, c in enumerate(meta.primary_key)}
    for f in meta.spark_schema.fields:
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
