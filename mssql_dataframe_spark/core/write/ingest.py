"""``write.ingest_directory``: incremental file-discovery ingestion —
the Auto Loader / COPY INTO pattern. Each call ingests exactly the
files that have APPEARED in a landing directory since the last call;
already-ingested files are remembered in table properties and never
re-read or double-counted, so repeated invocation is idempotent over
a growing directory (the landing-zone contract: files are immutable
once written; appends arrive as new files).

Scale shape: discovery is one driver-side listing (object-store
LIST on a cluster — at very large file counts a real Auto Loader
switches to notification queues; the ledger here is the file-names
list, O(files) metadata). The read that follows passes ONLY the new
files to the scan, so ingest cost is ∝ new data. The append itself
rides the standard insert path (validation, constraints, identity,
computed columns all apply).
"""

from __future__ import annotations

import os

from ...store import TableStore
from .insert import insert


def _list_data_files(path: str, suffix: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix) and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return sorted(out)


def ingest_directory(
    store: TableStore,
    table_name: str,
    path: str,
    file_format: str = "parquet",
    include_metadata_timestamps: bool = False,
) -> int:
    """Ingest files not seen before; returns how many files were read.
    A call that discovers nothing new writes nothing (no commit)."""
    meta = store.meta(table_name)
    suffix = "." + file_format
    listed = _list_data_files(path, suffix)
    seen = set(meta.properties.get("ingested_files") or [])
    new_files = [f for f in listed if os.path.relpath(f, path) not in seen]
    if not new_files:
        return 0
    # engine-managed columns never come from landed files: computed
    # columns are engine-recomputed (explicit writes are rejected),
    # the identity column is engine-assigned, and _time_* metadata is
    # stamped by the insert — reading them as declared-schema NULLs
    # would trip exactly those contracts.
    managed = set(meta.properties.get("computed_columns") or {})
    if meta.identity_column:
        managed.add(meta.identity_column)
    managed.update(c for c in meta.spark_schema.fieldNames()
                   if c.startswith("_time_"))
    from pyspark.sql import types as T

    read_schema = T.StructType(
        [f for f in meta.spark_schema.fields if f.name not in managed]
    )
    reader = store.spark.read.schema(read_schema)
    if file_format == "parquet":
        df = reader.parquet(*new_files)
    elif file_format == "json":
        df = reader.json(new_files)
    elif file_format == "csv":
        # CSV + explicit schema maps columns BY POSITION (the header
        # row is skipped, not matched), so a landed file with a
        # different column order would silently scramble values. Read
        # header-named strings first, validate the header against the
        # declared columns, then cast into the schema BY NAME.
        raw = store.spark.read.option("header", True).csv(new_files)
        by_lower = {c.lower(): c for c in raw.columns}
        missing = [
            f.name for f in read_schema.fields
            if f.name.lower() not in by_lower
        ]
        if missing:
            raise ValueError(
                f"CSV header in {path!r} is missing declared column(s) "
                f"{missing}; found {raw.columns}"
            )
        from pyspark.sql import functions as F

        df = raw.select(
            *[
                F.col(by_lower[f.name.lower()]).cast(f.dataType).alias(f.name)
                for f in read_schema.fields
            ]
        )
    else:
        raise ValueError(f"unsupported ingest format {file_format!r}")
    ledger = sorted(seen | {os.path.relpath(f, path) for f in new_files})
    # the ledger rides the SAME meta write as the data commit — a crash
    # cannot land rows without their files being remembered, so re-
    # invocation never double-loads (the idempotency contract above)
    insert(
        store, table_name, df, include_metadata_timestamps,
        extra_properties={"ingested_files": ledger},
    )
    return len(new_files)
