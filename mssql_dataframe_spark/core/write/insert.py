"""``write.insert``: validated append.

Reference pipeline (mssql_dataframe/core/write/insert.py:38-85):
schema fetch -> validate/convert -> value prep -> bulk INSERT; plus the
whitelisted schema-evolution retry that auto-adds ``_time_insert`` /
``_time_update`` datetime2 columns with a warning
(insert.py:87-138, _exceptions.py:15-50).

Spark realization: the validated DataFrame is appended to the current
snapshot as new Parquet files (Delta AddFile analog) — O(new data), no
rewrite, no shuffle. Identity values are assigned with a distributed
two-pass sequence (per-partition counts -> offsets), not a
single-partition window, so the append scales.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ...errors import DataframeColumnInvalidValue, SQLUniqueConstraintViolation
from ...store import TableStore
from .. import generated
from ...validation import (
    enforce_check_constraints,
    enforce_foreign_keys,
    enforce_unique_constraints,
    precheck_dataframe_deferred,
)
from .. import datetimeoffset as dto

logger = logging.getLogger("mssql_dataframe_spark")

_TIME_COLUMNS = {"_time_insert": "datetime2", "_time_update": "datetime2"}


def ensure_time_columns(store: TableStore, table_name: str, needed: list[str]):
    """Auto-add metadata-timestamp columns (ONLY these — the reference
    whitelists exactly ``_time_insert``/``_time_update`` and re-raises
    for any other missing column; insert.py:117-133)."""
    meta = store.meta(table_name)
    schema = meta.spark_schema
    changed = False
    types = dict(meta.column_types)
    for col in needed:
        if col not in schema.fieldNames():
            logger.warning(
                "Creating column %s in table %s with data type DATETIME2.",
                col, table_name,
            )
            schema = schema.add(col, T.TimestampNTZType(), True)
            types[col] = _TIME_COLUMNS[col]
            changed = True
    if changed:
        store.update_meta(
            table_name,
            spark_schema_json=schema.jsonValue(),
            column_types=types,
        )
    return store.meta(table_name)


def assign_identity(df: DataFrame, col: str, start: int,
                    dtype: T.DataType) -> tuple[DataFrame, int]:
    """Assign dense sequential identity values ``start, start+1, ...``.

    Scale note: uses per-partition counts to compute offsets (two light
    jobs) instead of a global single-partition window — the same
    technique as RDD ``zipWithIndex``, expressed over DataFrames.
    """
    with_pid = df.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    if not counts:
        # empty frame: a zero-arg create_map types as map<void,void>
        # and fails analysis when indexed — and there is nothing to
        # number anyway. next == start doubles as the emptiness signal.
        return df.withColumn(col, F.lit(None).cast(dtype)), start
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    out = (
        with_pid.withColumn(
            col,
            (offset_map[F.col("__pid")] + F.row_number().over(w) - 1).cast(dtype),
        )
        .drop("__pid")
    )
    return out, acc


def insert(
    store: TableStore,
    table_name: str,
    dataframe: DataFrame,
    include_metadata_timestamps: bool = False,
    extra_properties: dict | None = None,
    expected_version: int | None = None,
) -> DataFrame:
    """``expected_version`` pins the commit to land at exactly that
    version + 1 (store.append OCC) — callers that RECORD the commit's
    version window before committing (the stream->MV sink's ledger)
    pass the version they read, so a foreign writer racing in between
    fails this insert cleanly instead of letting the recorded window
    point at the foreign commit."""
    meta = store.meta(table_name)
    if expected_version is not None and meta.version != int(
        expected_version
    ):
        from ...errors import SQLConcurrentWriteConflict

        raise SQLConcurrentWriteConflict(
            f"table {table_name!r} is at version {meta.version}, not "
            f"the expected {expected_version} — another writer "
            "committed since the caller planned this insert"
        )
    if include_metadata_timestamps:
        meta = ensure_time_columns(store, table_name, ["_time_insert"])
    generated.reject_explicit_writes(
        dataframe.columns, meta.properties.get("computed_columns") or {}
    )

    # NOT NULL enforcement: declared not-null columns plus primary-key
    # columns (the reference surfaces SQL Server's NOT NULL violation);
    # the identity column is excluded — it is assigned below.
    required = [
        c for c in (*meta.not_nullable, *meta.primary_key)
        if c != meta.identity_column
    ]
    absent = [c for c in dict.fromkeys(required) if c not in dataframe.columns]
    if absent:
        raise DataframeColumnInvalidValue(
            f"NOT NULL column(s) {absent} missing from the insert dataframe"
        )
    if meta.identity_column and meta.identity_column in dataframe.columns:
        # SQL Server error 544: explicit identity values need
        # IDENTITY_INSERT ON, which this engine does not model —
        # accepting them silently would also desync identity_next and
        # let a later auto-assigned batch mint duplicate primary keys
        # (the auto path skips the PK collision checks precisely
        # because engine-assigned ids are unique by construction).
        raise DataframeColumnInvalidValue(
            f"Cannot insert explicit value for identity column "
            f"{meta.identity_column!r} in table {table_name!r} — drop "
            "the column and let the engine assign it (re-seed via "
            "modify.identity_reseed for migration loads)"
        )
    dataframe = dto.derive(dataframe, meta)
    # Validation is DEFERRED onto the staging write (guide §2.4): the
    # fused agg's expressions ride the write as ``observe()`` metrics
    # and are applied in ``store.append``'s pre-commit hook, so an
    # insert executes the source plan ONCE (the eager path paid a
    # second full pass — and for a source that is itself an expensive
    # pipeline, a second full recompute). PRIMARY KEY enforcement (SQL
    # Server raises "Violation of PRIMARY KEY constraint" on every
    # INSERT; the reference surfaces that server error — create.py:148)
    # moves post-stage with it: batch-internal duplicates and the
    # standing-snapshot collision are ONE keys-only job over the
    # STAGED files (columnar read of just the PK columns — never a
    # source re-execution), stats+bloom-pruned by the observed
    # per-PK-column bounds exactly as before. An engine-assigned
    # identity PK is unique by construction (atomic counter, reseed
    # refuses collisions) and skips the checks; tables preferring
    # Delta/Synapse-style informational PRIMARY KEY NOT ENFORCED
    # semantics opt out with ``pk_not_enforced`` and pay nothing.
    pk = [c for c in meta.primary_key if c in dataframe.columns]
    if meta.properties.get("pk_not_enforced"):
        pk = []
    df, finish_validation = precheck_dataframe_deferred(
        dataframe,
        {c: meta.column_types[c] for c in dataframe.columns},
        not_nullable=required,
        bounds_col=pk or None,
    )

    if include_metadata_timestamps:
        df = df.withColumn("_time_insert", F.current_timestamp().cast("timestamp_ntz"))

    identity = meta.identity_column
    identity_meta = None
    if identity and identity not in df.columns:
        dtype = meta.spark_schema[identity].dataType
        df, next_id = assign_identity(df, identity, meta.identity_next, dtype)
        if next_id != meta.identity_next:
            # published with the commit (extra_meta), not before it: a
            # pre-commit update_meta is last-writer-wins, so an OCC
            # loser could roll the winner's advanced counter back and
            # later inserts would mint duplicate identity PKs
            identity_meta = {"identity_next": next_id}

    # fill columns absent from the input with NULLs
    for f in meta.spark_schema.fields:
        if f.name not in df.columns:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))

    out = df.select(*meta.spark_schema.fieldNames())
    out = generated.materialize(out, meta)
    checks = meta.properties.get("check_constraints") or {}
    fks = meta.properties.get("foreign_keys") or {}
    uniques = meta.properties.get("unique_constraints") or {}

    def _pre_commit(stage_entries, stage_dir):
        # Runs inside store.append's discard guard, after the staging
        # write and before the version claim: a raise here aborts the
        # commit and drops the staged files — the same "nothing
        # visible on failure" contract the eager checks gave. EVERY
        # data-dependent probe runs here over the STAGED files (a
        # columnar read of the new files only), so the SOURCE plan
        # executes exactly once per insert regardless of which
        # constraints the table declares — the eager shape re-executed
        # it once per probe family (validation, CHECK, FK bounds +
        # per-FK anti joins, UNIQUE, PK), which for a source that is
        # an expensive pipeline meant up to five recomputes.
        #
        # 1) Deferred validation: the staging write already computed
        #    the fused agg as observe() metrics; apply them (raises
        #    the eager path's exact errors) and take the per-PK-column
        #    pruning bounds from the same metrics.
        pk_bounds = finish_validation()
        paths = [os.path.join(stage_dir, e["path"]) for e in stage_entries]
        if not paths:
            # empty batch: nothing can violate or collide (and with
            # no rows published, no FK parent pin is needed either)
            return None
        spark = out.sparkSession
        staged = None
        if checks or fks or uniques:
            staged = spark.read.schema(meta.spark_schema).parquet(*paths)
        # 2) CHECK constraints — same single agg job, over the staged
        #    files instead of a source re-execution.
        enforce_check_constraints(staged, checks)
        # 3) FOREIGN KEYs — keys-only bounds + per-FK anti-join probes
        #    over the staged files; the returned parent-version pins
        #    become cross-table OCC preconditions via the hook's
        #    return value (checked by store.append immediately after
        #    this hook, so the probe-to-commit window is minimal and
        #    still OCC-covered).
        fk_deps = enforce_foreign_keys(
            store, staged, fks, table_name=table_name,
        ) if fks else None
        # 4) UNIQUE constraints — batch-dup + pruned-snapshot probes,
        #    keys read from the staged files.
        if uniques:
            def _existing_for(cols, bounds):
                centries = store.manifest(table_name, meta.version)
                if not centries:
                    return None
                touched, _ = store.split_by_key_ranges(
                    table_name, bounds, version=meta.version
                )
                if not touched:
                    return None
                # batch-key bloom narrowing, same shape as the PK
                # probe: a file whose sidecar excludes every batch
                # value of some constraint column cannot collide
                from .update import bloom_narrow_entries

                tset = set(touched)
                cand = [e for e in centries if e["path"] in tset]
                surv = bloom_narrow_entries(
                    store, table_name, cand, staged.select(*cols),
                    list(cols), meta=meta,
                )
                if surv is not None:
                    touched = [e["path"] for e in surv]
                if not touched:
                    return None
                return store.read_files(table_name, touched)

            enforce_unique_constraints(
                staged, uniques, existing_for=_existing_for
            )
        if not pk:
            return fk_deps
        # 2) PK enforcement, one keys-only job over the STAGED files.
        #    Collision discovery vs the standing snapshot is
        #    stats-PRUNED to just the files whose key range intersects
        #    the batch. Single AND composite PKs prune: every PK
        #    column's per-file min/max is in the manifest
        #    (store._stats_cols), and a file is skipped when ANY key
        #    column's range excludes every batch value
        #    (split_by_key_ranges). An append beyond the current range
        #    (the identity/ordered-ingest shape) reads ZERO existing
        #    files; an empty table skips the probe entirely. Files
        #    written before composite stats were recorded lack the
        #    per-column entries and count as touched (safe fallback,
        #    self-heals as they are rewritten).
        kschema = T.StructType([meta.spark_schema[c] for c in pk])
        staged_keys = (
            spark.read.schema(kschema).parquet(*paths).select(*pk)
        )
        entries = store.manifest(table_name, meta.version)
        existing_keys = None
        usable = {
            c: b
            for c, b in (pk_bounds or {}).items()
            if b[0] is not None and b[1] is not None
        }
        if entries and usable:
            touched, _ = store.split_by_key_ranges(
                table_name, usable, version=meta.version
            )
            if touched:
                # batch-key bloom narrowing on top of the stats
                # verdict: random/high-entropy keys (UUIDs, hashes)
                # overlap every file's min/max, but the batch's keys
                # probing each candidate's sidecar still prove files
                # collision-free — an all-fresh append then reads ZERO
                # existing files (the only added cost is the helper's
                # bounded distinct-collect of the batch keys — now
                # read from the staged files, not a source
                # re-execution — and only on tables that bloom-index
                # their PK)
                from .update import bloom_narrow_entries

                tset = set(touched)
                cand = [e for e in entries if e["path"] in tset]
                surv = bloom_narrow_entries(
                    store, table_name, cand, staged_keys, pk,
                    meta=meta,
                )
                if surv is not None:
                    touched = [e["path"] for e in surv]
                if touched:
                    # pin the scan to the snapshot the candidate list
                    # came from: a concurrent MODIFY COLUMN would
                    # otherwise mistype the PK columns and a false
                    # no-duplicate verdict lands duplicate keys
                    # (ADVICE r13 class)
                    existing_keys = store.read_files(
                        table_name, touched, version=meta.version
                    ).select(*pk)
        if existing_keys is None:
            # batch-internal duplicates only (no standing key overlaps)
            dup = (
                staged_keys.groupBy(*pk).count()
                .where(F.col("count") > 1).limit(1).count()
            )
            if dup:
                raise SQLUniqueConstraintViolation(
                    f"Violation of PRIMARY KEY constraint on {pk}: the "
                    "insert batch contains duplicate key values"
                )
        else:
            # batch duplicates AND snapshot collisions in the SAME job:
            # union the staged keys (tagged new) with the pruned
            # existing keys, one hash aggregate per key
            merged = staged_keys.select(
                *pk, F.lit(1).alias("__new")
            ).unionByName(
                existing_keys.select(*pk, F.lit(0).alias("__new"))
            )
            flags = (
                merged.groupBy(*pk)
                .agg(
                    F.sum("__new").alias("__n_new"),
                    F.count("*").alias("__n_all"),
                )
                .agg(
                    F.max(
                        F.when(F.col("__n_new") > 1, 1).otherwise(0)
                    ).alias("dup"),
                    F.max(
                        F.when(
                            (F.col("__n_new") >= 1)
                            & (F.col("__n_all") > F.col("__n_new")),
                            1,
                        ).otherwise(0)
                    ).alias("hit"),
                )
                .first()
            )
            if flags["dup"]:
                raise SQLUniqueConstraintViolation(
                    f"Violation of PRIMARY KEY constraint on {pk}: the "
                    "insert batch contains duplicate key values"
                )
            if flags["hit"]:
                raise SQLUniqueConstraintViolation(
                    f"Violation of PRIMARY KEY constraint on {pk}: the "
                    "insert batch repeats key values already in "
                    f"{table_name!r}"
                )
        return fk_deps

    # cross-table OCC: the FK probe inside _pre_commit returns its
    # parent-version pins through the hook, and store.append checks
    # them immediately after — the commit fails cleanly if a probed
    # parent changed between the probe and this publish
    store.append(
        table_name, out, extra_properties=extra_properties,
        expected_version=meta.version,
        extra_meta=identity_meta, pre_commit_check=_pre_commit,
    )
    return df
