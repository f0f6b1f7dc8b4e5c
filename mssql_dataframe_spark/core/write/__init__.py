"""``write`` verb namespace: insert / update / merge.

Reference: mssql_dataframe/core/write/{insert,update,merge}.py.
"""

from __future__ import annotations

from .delete import delete_op, delete_where_op, truncate_op  # noqa: F401
from .ingest import ingest_directory  # noqa: F401
from .insert import insert  # noqa: F401
from .merge import merge_op  # noqa: F401
from .scd2 import merge_scd2  # noqa: F401
from .update import update_op  # noqa: F401


class write:
    """Facade mirroring the reference's ``SQLServer.write`` composition
    (reference: mssql_dataframe/core/write/__init__.py)."""

    def __init__(self, store, include_metadata_timestamps: bool = False):
        self._store = store
        self.include_metadata_timestamps = include_metadata_timestamps

    def insert(self, table_name, dataframe, include_metadata_timestamps=None,
               extra_properties=None, expected_version=None):
        # per-call override of the engine-level default (reference:
        # insert/update/merge accept include_metadata_timestamps
        # per call — tests/test_core/test_write/*_override_timestamps).
        # extra_properties ride the append commit atomically (the
        # idempotent-sink ledger shape merge already exposes);
        # expected_version pins the commit's landing version for
        # callers that record it before committing.
        return insert(
            self._store, table_name, dataframe,
            self._imt(include_metadata_timestamps),
            extra_properties=extra_properties,
            expected_version=expected_version,
        )

    def _imt(self, override):
        return (
            self.include_metadata_timestamps if override is None
            else bool(override)
        )

    def delete(self, table_name, dataframe, match_columns=None):
        return delete_op(self._store, table_name, dataframe, match_columns)

    def delete_where(self, table_name, where):
        return delete_where_op(self._store, table_name, where)

    def truncate(self, table_name):
        return truncate_op(self._store, table_name)

    def ingest_directory(self, table_name, path, file_format="parquet"):
        return ingest_directory(
            self._store, table_name, path, file_format,
            self.include_metadata_timestamps,
        )

    def update(self, table_name, dataframe, match_columns=None,
               include_metadata_timestamps=None):
        return update_op(
            self._store,
            table_name,
            dataframe,
            match_columns,
            self._imt(include_metadata_timestamps),
        )

    def merge(
        self,
        table_name,
        dataframe,
        match_columns=None,
        upsert=False,
        delete_requires=None,
        auto_evolve=False,
        not_matched_by_source_set=None,
        include_metadata_timestamps=None,
        extra_properties=None,
    ):
        return merge_op(
            self._store,
            table_name,
            dataframe,
            match_columns,
            upsert,
            delete_requires,
            self._imt(include_metadata_timestamps),
            auto_evolve,
            not_matched_by_source_set,
            extra_properties,
        )

    def merge_scd2(
        self,
        table_name,
        dataframe,
        match_columns=None,
        valid_from_col="_valid_from",
        valid_to_col="_valid_to",
        current_col="_is_current",
        as_of=None,
    ):
        return merge_scd2(
            self._store,
            table_name,
            dataframe,
            match_columns,
            valid_from_col,
            valid_to_col,
            current_col,
            as_of,
        )
