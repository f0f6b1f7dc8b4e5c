"""Versioned copy-on-write Parquet table store.

The reference's mutable-table semantics (T-SQL ``INSERT`` / ``UPDATE`` /
``MERGE`` — reference: mssql_dataframe/core/write/*.py) need a
transactional, mutable table abstraction on top of Spark. The idiomatic
production answer is Delta Lake / Iceberg; this container ships neither,
so the engine implements the same copy-on-write transaction design those
formats use, scoped to what the verbs need:

- a table is a directory holding immutable data snapshots
  ``data_v{N}/`` (plain Parquet, so every Catalyst scan optimization —
  predicate pushdown, column pruning, file skipping — applies),
- table metadata (``_meta.json``) records the current version, the
  declared SQL-type schema, primary-key columns, and properties —
  the analog of the Delta log + ``TBLPROPERTIES`` (SURVEY.md §1.1),
- writers prepare the next snapshot fully, then commit by atomically
  replacing ``_meta.json`` (``os.replace``) — readers always see a
  complete version; a failed writer leaves the table unchanged.

Scale notes (100 TB design):
- ``append`` adds new Parquet files into the current snapshot directory
  (like Delta AddFile) — no rewrite, O(new data) regardless of table
  size.
- ``update``/``merge`` rewrite via a distributed join; at production
  scale the same code runs against Delta ``MERGE INTO`` which rewrites
  only matched files. The copy-on-write structure here is
  deliberately the same shape so the swap is a storage-layer change,
  not an engine change.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .errors import SQLTableDoesNotExist

_META = "_meta.json"


@dataclass
class TableMeta:
    """Catalog entry for one table (analog of the ODBC catalog the
    reference reads on every op — reference: conversion.py:66-138)."""

    name: str
    version: int
    # ordered {column_name: canonical sql type string, e.g. "varchar(100)"}
    column_types: dict[str, str]
    spark_schema_json: dict
    primary_key: list[str] = field(default_factory=list)
    identity_column: Optional[str] = None
    identity_next: int = 1
    not_nullable: list[str] = field(default_factory=list)
    properties: dict = field(default_factory=dict)
    created_at: float = 0.0

    @property
    def spark_schema(self) -> T.StructType:
        return T.StructType.fromJson(self.spark_schema_json)


class TableStore:
    """Directory-backed table catalog with snapshot-isolated writes."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    # -- catalog ------------------------------------------------------
    def _table_dir(self, name: str) -> str:
        # schema.table -> schema/table on disk; default schema dbo
        # (reference: conversion.py:24-35 _get_schema_name)
        parts = str(name).split(".")
        if len(parts) == 1:
            parts = ["dbo", parts[0]]
        safe = [p.replace("/", "_") for p in parts]
        return os.path.join(self.root, *safe)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._table_dir(name), _META))

    def meta(self, name: str) -> TableMeta:
        path = os.path.join(self._table_dir(name), _META)
        try:
            with open(path) as f:
                raw = json.load(f)
        except FileNotFoundError:
            raise SQLTableDoesNotExist(
                f"table {name!r} does not exist in store {self.root}"
            ) from None
        return TableMeta(**raw)

    def _write_meta(self, name: str, meta: TableMeta) -> None:
        tdir = self._table_dir(name)
        os.makedirs(tdir, exist_ok=True)
        tmp = os.path.join(tdir, f".{_META}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(meta.__dict__, f, indent=1, default=str)
        os.replace(tmp, os.path.join(tdir, _META))  # atomic commit point

    def drop(self, name: str) -> None:
        tdir = self._table_dir(name)
        if os.path.exists(tdir):
            shutil.rmtree(tdir)

    def list_tables(self) -> list[str]:
        out = []
        for schema in sorted(os.listdir(self.root)):
            sdir = os.path.join(self.root, schema)
            if not os.path.isdir(sdir):
                continue
            for t in sorted(os.listdir(sdir)):
                if os.path.exists(os.path.join(sdir, t, _META)):
                    out.append(f"{schema}.{t}")
        return out

    # -- data ---------------------------------------------------------
    def _data_dir(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"data_v{version}")

    def create(
        self,
        name: str,
        schema: T.StructType,
        column_types: dict[str, str],
        primary_key: Optional[list[str]] = None,
        identity_column: Optional[str] = None,
        not_nullable: Optional[list[str]] = None,
        properties: Optional[dict] = None,
    ) -> TableMeta:
        meta = TableMeta(
            name=str(name),
            version=0,
            column_types=dict(column_types),
            spark_schema_json=schema.jsonValue(),
            primary_key=list(primary_key or []),
            identity_column=identity_column,
            identity_next=1,
            not_nullable=list(not_nullable or []),
            properties=dict(properties or {}),
            created_at=time.time(),
        )
        os.makedirs(self._data_dir(name, 0), exist_ok=True)
        self._write_meta(name, meta)
        return meta

    def read(self, name: str, version: Optional[int] = None) -> DataFrame:
        """Snapshot as a DataFrame — current by default, or a retained
        prior version (time travel, the Delta ``versionAsOf`` analog).

        Always reads with the declared schema so an empty snapshot
        yields a correctly-typed empty DataFrame and schema drift in
        stray files cannot leak through.
        """
        meta = self.meta(name)
        v = meta.version if version is None else int(version)
        if version is not None:
            if v > meta.version or not os.path.isdir(self._data_dir(name, v)):
                raise ValueError(
                    f"version {v} of table {name!r} is not available "
                    f"(current {meta.version}, retention keeps "
                    f"{self.keep_versions} prior snapshots)"
                )
        ddir = self._data_dir(name, v)
        schema = meta.spark_schema
        has_files = any(
            f.endswith(".parquet") for f in _walk_files(ddir)
        )
        if not has_files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(ddir)

    def append(self, name: str, df: DataFrame) -> None:
        """Add files to the current snapshot (Delta AddFile analog) —
        O(new data), never rewrites existing files."""
        meta = self.meta(name)
        ddir = self._data_dir(name, meta.version)
        df.select(*meta.spark_schema.fieldNames()).write.mode("append").parquet(ddir)

    #: snapshots retained behind the current version; lazy DataFrames
    #: handed out by ``read()`` stay valid across this many subsequent
    #: commits (Delta's retention-window analog) instead of hitting
    #: FileNotFoundException on the first mutation after them.
    keep_versions: int = 2

    def overwrite(self, name: str, df: DataFrame,
                  new_schema: Optional[T.StructType] = None,
                  new_column_types: Optional[dict[str, str]] = None) -> None:
        """Materialize ``df`` as the next snapshot, then atomically move
        the table pointer. Readers of the old version are unaffected —
        old snapshots are vacuumed only once they fall
        ``keep_versions`` commits behind, so a lazy plan bound to a
        recent snapshot can still be consumed after later writes. A
        crash before the meta replace leaves the table unchanged."""
        meta = self.meta(name)
        next_v = meta.version + 1
        ddir = self._data_dir(name, next_v)
        schema = new_schema or meta.spark_schema
        df.select(*schema.fieldNames()).write.mode("overwrite").parquet(ddir)
        meta.version = next_v
        if new_schema is not None:
            meta.spark_schema_json = new_schema.jsonValue()
        if new_column_types is not None:
            meta.column_types = dict(new_column_types)
        self._write_meta(name, meta)
        self._vacuum(name, keep_before=next_v - self.keep_versions)

    def _vacuum(self, name: str, keep_before: int) -> None:
        """Delete snapshot directories older than ``keep_before``."""
        tdir = self._table_dir(name)
        for entry in os.listdir(tdir):
            if not entry.startswith("data_v"):
                continue
            try:
                v = int(entry[len("data_v"):])
            except ValueError:
                continue
            if v < keep_before:
                shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)

    def update_meta(self, name: str, **changes) -> TableMeta:
        meta = self.meta(name)
        for k, v in changes.items():
            setattr(meta, k, v)
        self._write_meta(name, meta)
        return meta


def _walk_files(d: str):
    if not os.path.isdir(d):
        return
    for root, _dirs, files in os.walk(d):
        for f in files:
            yield os.path.join(root, f)
