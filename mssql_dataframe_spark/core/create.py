"""``create`` verb: table DDL.

Reference: mssql_dataframe/core/create.py:29-221 — CREATE TABLE from a
``{column: sql_type_string}`` dict, NOT NULL list, user primary key
(single or composite) or an auto ``_pk INT IDENTITY(1,1) PRIMARY KEY``
(reference: create.py:144-145).

Spark realization: register the table in the copy-on-write store with a
Spark schema derived from the conversion rules; the PK is recorded as
table metadata (the Delta ``TBLPROPERTIES`` analog — SURVEY.md §1.1)
and becomes the default match-column set for update/merge.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..conversion_rules import parse_column_spec, spark_type_to_spec
from ..errors import SQLColumnDoesNotExist
from ..identifiers import escape_table
from ..store import TableStore
from . import datetimeoffset as dto


class create:
    """Namespace object mirroring the reference's ``SQLServer.create``."""

    def __init__(self, store: TableStore):
        self._store = store

    def table(
        self,
        table_name: str,
        columns: dict[str, str],
        not_nullable: Optional[list[str]] = None,
        primary_key_column: Optional[str | list[str]] = None,
        sql_primary_key: bool = False,
        properties: Optional[dict] = None,
    ) -> None:
        """Create a table (reference: create.py:29-221).

        columns: {column_name: SQL type string, e.g. 'varchar(100)'}
        primary_key_column: single name or list (composite PK)
        sql_primary_key: auto ``_pk`` bigint identity primary key
        properties: table properties (e.g. ``stats_column`` — the
        column whose min/max the store manifests track for file-pruned
        merges; defaults to a single-column PK, see store.py)
        """
        escape_table(table_name)  # validates identifier lengths
        not_nullable = list(not_nullable or [])
        if not columns and not sql_primary_key:
            raise ValueError(
                "a table needs at least one column (SQL Server cannot "
                "create a column-less table either)"
            )
        unknown_nn = [c for c in not_nullable if c not in columns]
        if unknown_nn:
            # a typo here would otherwise be recorded silently and make
            # the table permanently unwritable (every insert rejected
            # for a column that can never be supplied)
            raise SQLColumnDoesNotExist(
                f"not_nullable column(s) {unknown_nn} not in columns"
            )
        if sql_primary_key and primary_key_column is not None:
            raise ValueError(
                "either sql_primary_key or primary_key_column, not both "
                "(reference create.py:96-100)"
            )

        column_types: dict[str, str] = {}
        fields: list[T.StructField] = []
        identity_col = None
        pk: list[str] = []

        if sql_primary_key:
            identity_col = "_pk"
            pk = ["_pk"]
            column_types["_pk"] = "int identity"
            fields.append(T.StructField("_pk", T.IntegerType(), False))

        for col, spec_str in columns.items():
            spec = parse_column_spec(spec_str)
            column_types[col] = spec_str
            nullable = col not in not_nullable
            fields.append(T.StructField(col, spec.spark_type, nullable))
            if "identity" in spec_str.lower() and identity_col is None:
                identity_col = col
            if spec.sql_type == "datetimeoffset":
                # companion offset column preserving the original
                # ±HH:MM (engine-managed; see core/datetimeoffset.py —
                # Spark's TimestampType is a UTC instant with no
                # per-row zone, reference conversion.py:528-588)
                comp = col + dto.OFFSET_SUFFIX
                column_types[comp] = "smallint"
                fields.append(T.StructField(comp, T.ShortType(), True))

        if primary_key_column is not None:
            pk = (
                [primary_key_column]
                if isinstance(primary_key_column, str)
                else list(primary_key_column)
            )
            for p in pk:
                if p not in column_types:
                    raise SQLColumnDoesNotExist(
                        f"primary key column {p!r} not in columns"
                    )
            # PK columns are implicitly NOT NULL
            fields = [
                T.StructField(f.name, f.dataType, f.nullable and f.name not in pk)
                for f in fields
            ]

        self._store.create(
            table_name,
            T.StructType(fields),
            column_types,
            primary_key=pk,
            identity_column=identity_col,
            not_nullable=not_nullable,
            properties=properties,
        )

    def view(
        self,
        view_name: str,
        source_table: str,
        column_names=None,
        where=None,
        order_column=None,
        order_direction=None,
        limit=None,
    ) -> None:
        """CREATE VIEW (SQL Server analog, beyond the reference's verb
        surface): a stored READ SPEC over one base table — exactly the
        restricted ``read.table`` parameter set (projection /
        where-grammar filter / order / limit), never arbitrary SQL, so
        the view catalog adds zero injection surface. Metadata-only.
        Reads compose with the base table's masking policies like SQL
        Server views do (masks apply unless the reader may UNMASK)."""
        from ..identifiers import compile_where

        if where is not None:
            compile_where(where)  # validate at CREATE time, fail fast
        meta = self._store.meta(source_table)  # raises if absent
        for c in column_names or ():
            if c not in meta.spark_schema.fieldNames():
                raise SQLColumnDoesNotExist(c)
        # the stored spec is exactly read.table's parameter set, so the
        # REST of its validations fail fast here too — not on first read
        if (order_column is None) != (order_direction is None):
            raise ValueError(
                "order_column and order_direction must be supplied together"
            )
        if order_direction is not None and str(
            order_direction
        ).upper() not in ("ASC", "DESC"):
            raise ValueError("order_direction must be ASC or DESC")
        if order_column is not None and (
            order_column not in meta.spark_schema.fieldNames()
        ):
            raise SQLColumnDoesNotExist(order_column)
        if limit is not None and not isinstance(limit, int):
            raise ValueError("limit must be an integer")
        self._store.create_view(
            view_name,
            {
                "source": source_table,
                "column_names": list(column_names) if column_names else None,
                "where": where,
                "order_column": order_column,
                "order_direction": order_direction,
                "limit": limit,
            },
        )

    def drop_view(self, view_name: str) -> None:
        self._store.drop_view(view_name)

    def table_from_dataframe(
        self,
        table_name: str,
        dataframe: DataFrame,
        primary_key: Optional[str | list[str]] = None,
        sql_primary_key: bool = False,
    ) -> None:
        """Schema-derived creation — the convenience path Spark gives us
        for free (SURVEY.md §1.2; the reference docstring mentions it at
        create.py:24 but ships no implementation). ``sql_primary_key``
        adds the auto ``_pk INT IDENTITY(1,1)`` column (reference:
        create.py:144-145), mutually exclusive with ``primary_key``.
        """
        if sql_primary_key and primary_key:
            raise ValueError(
                "sql_primary_key and primary_key are mutually exclusive"
            )
        columns = {
            f.name: spark_type_to_spec(f.dataType).render()
            for f in dataframe.schema.fields
        }
        pk_cols = (
            [primary_key] if isinstance(primary_key, str) else list(primary_key or [])
        )
        self.table(
            table_name,
            columns,
            primary_key_column=pk_cols or None,
            sql_primary_key=sql_primary_key,
        )
