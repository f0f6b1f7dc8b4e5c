"""Optional JDBC SQL Server adapter: the same verb surface, executed
against a LIVE SQL Server through Spark's JDBC connector instead of
the embedded columnar store.

This honors the reference's deployment story verbatim — the reference
talks to SQL Server over ODBC (reference: connect.py:55-90); at Spark
scale the equivalent transport is the JDBC DataSource
(``spark.read.format("jdbc")`` / ``DataFrameWriter.jdbc``) plus
generated T-SQL for the statements Spark's connector cannot express
(DDL, MERGE). The division of labor:

- **Bulk data movement** (read/insert) goes through the JDBC
  DataSource: predicate pushdown, column pruning, and parallel
  partitioned reads are handled by Spark's connector; inserts use the
  connector's batched writer across executors.
- **Set-based mutations** (update/merge) follow the reference's own
  design: stage the source frame into a staging table with the
  batched writer, then run ONE server-side T-SQL ``MERGE``/``UPDATE``
  joining staging to target (reference: write/merge.py:110-131
  builds exactly this MERGE; write/update.py the UPDATE). The data
  crosses the wire once; the join runs where the indexes are.
- **DDL** (create table) renders the reference's ``CREATE TABLE``
  shape from the same conversion-rules table the embedded engine uses
  (reference: create.py:60-90).

Statement GENERATION is pure and fully tested offline. EXECUTION
needs the Microsoft JDBC driver on the Spark classpath and a
reachable server — absent in this environment — so ``execute()``
raises ``EnvironmentJDBCDriverNotFound`` when the driver class is
missing, mirroring the reference's ``EnvironmentODBCDriverNotFound``
(reference: connect.py:21-27, errors surfaced at connect time).

Identifier safety matches the engine's posture everywhere else: every
dynamic name passes through :func:`quotename` (T-SQL ``QUOTENAME``
semantics — the reference routes all dynamic SQL through QUOTENAME,
dynamic.py:11-58), and the restricted where-grammar compiles through
``identifiers.compile_where`` before reaching a pushdown predicate.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .conversion_rules import parse_column_spec
from .errors import SQLInvalidLengthObjectName
from .identifiers import _MAX_NAME_LEN


class EnvironmentJDBCDriverNotFound(Exception):
    """The Microsoft JDBC driver jar is not on the Spark classpath
    (the JDBC analog of the reference's EnvironmentODBCDriverNotFound,
    reference: connect.py:21-27)."""


JDBC_DRIVER = "com.microsoft.sqlserver.jdbc.SQLServerDriver"


def quotename(name: str) -> str:
    """T-SQL ``QUOTENAME``: bracket-quote one identifier, doubling
    embedded ``]`` and enforcing the SYSNAME length bound — the same
    contract the reference applies to every dynamic name
    (reference: dynamic.py:11-58).

    >>> quotename("orders")
    '[orders]'
    >>> quotename("odd]name")
    '[odd]]name]'
    """
    if name is None or len(str(name)) == 0 or len(str(name)) > _MAX_NAME_LEN:
        raise SQLInvalidLengthObjectName(
            f"object name must be 1..{_MAX_NAME_LEN} chars: {name!r}"
        )
    return "[" + str(name).replace("]", "]]") + "]"


def quotename_table(table_name: str) -> str:
    """Bracket-quote a possibly dotted ``schema.table`` part-by-part.

    >>> quotename_table("dbo.orders")
    '[dbo].[orders]'
    """
    return ".".join(quotename(p) for p in str(table_name).split("."))


@dataclasses.dataclass(frozen=True)
class JdbcTarget:
    """Connection descriptor for one SQL Server database. Credentials
    ride the options dict Spark passes to the driver — never
    interpolated into SQL."""

    host: str
    database: str
    port: int = 1433
    user: Optional[str] = None
    password: Optional[str] = None
    encrypt: bool = True
    trust_server_certificate: bool = False

    def __post_init__(self):
        # the URL is assembled by interpolation, so a host/database
        # carrying JDBC property metacharacters (';' starts a new
        # key=value pair, '{}' are escape braces) could smuggle
        # properties like authentication overrides into the URL —
        # reject them here, the same never-interpolate posture the
        # docstring promises for credentials
        for field in ("host", "database"):
            v = str(getattr(self, field))
            if any(ch in v for ch in ";={}"):
                raise ValueError(
                    f"invalid character in JDBC target {field}: {v!r} "
                    "(';', '=', '{', '}' would inject URL properties)"
                )

    @property
    def url(self) -> str:
        return (
            f"jdbc:sqlserver://{self.host}:{self.port};"
            f"databaseName={self.database};"
            f"encrypt={'true' if self.encrypt else 'false'};"
            "trustServerCertificate="
            f"{'true' if self.trust_server_certificate else 'false'}"
        )

    def options(self) -> dict[str, str]:
        out = {"url": self.url, "driver": JDBC_DRIVER}
        if self.user is not None:
            out["user"] = self.user
        if self.password is not None:
            out["password"] = self.password
        else:
            # no password -> integrated security rides the URL flag
            out["url"] = out["url"] + ";integratedSecurity=true"
        return out


def create_table_statement(
    table_name: str,
    columns: dict[str, str],
    primary_key_column: str | list[str] | None = None,
    not_nullable: list[str] | None = None,
) -> str:
    """Render the reference's CREATE TABLE shape (reference:
    create.py:60-90) from SQL type strings. Types parse through the
    same conversion-rules table as the embedded engine, so an invalid
    declaration fails HERE, not server-side mid-deploy."""
    nn = set(not_nullable or [])
    pk = (
        [primary_key_column]
        if isinstance(primary_key_column, str)
        else list(primary_key_column or [])
    )
    nn.update(pk)
    parts = []
    for col, spec in columns.items():
        rendered = parse_column_spec(spec).render()
        null_sql = " NOT NULL" if col in nn else " NULL"
        parts.append(f"{quotename(col)} {rendered}{null_sql}")
    if pk:
        parts.append(
            "PRIMARY KEY (" + ", ".join(quotename(c) for c in pk) + ")"
        )
    return (
        f"CREATE TABLE {quotename_table(table_name)} ("
        + ", ".join(parts)
        + ")"
    )


def merge_statement(
    table_name: str,
    staging_table: str,
    match_columns: list[str],
    update_columns: list[str],
    insert_columns: list[str],
    delete_unmatched: bool = False,
    delete_requires: list[str] | None = None,
) -> str:
    """Render the server-side T-SQL MERGE joining staging to target —
    the reference's merge statement shape verbatim (reference:
    write/merge.py:110-131: target/source aliases, matched UPDATE,
    not-matched INSERT, optional NOT MATCHED BY SOURCE DELETE gated on
    delete_requires' per-column IN-lists against staging)."""
    on = " AND ".join(
        f"_target.{quotename(c)} = _source.{quotename(c)}"
        for c in match_columns
    )
    sql = (
        f"MERGE {quotename_table(table_name)} AS _target "
        f"USING {quotename_table(staging_table)} AS _source ON ({on})"
    )
    if update_columns:
        sets = ", ".join(
            f"_target.{quotename(c)} = _source.{quotename(c)}"
            for c in update_columns
        )
        sql += f" WHEN MATCHED THEN UPDATE SET {sets}"
    cols = ", ".join(quotename(c) for c in insert_columns)
    vals = ", ".join(f"_source.{quotename(c)}" for c in insert_columns)
    sql += f" WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    if delete_unmatched:
        guard = ""
        if delete_requires:
            guard = " AND " + " AND ".join(
                f"_target.{quotename(c)} IN "
                f"(SELECT {quotename(c)} FROM "
                f"{quotename_table(staging_table)})"
                for c in delete_requires
            )
        sql += f" WHEN NOT MATCHED BY SOURCE{guard} THEN DELETE"
    return sql + ";"


def update_statement(
    table_name: str,
    staging_table: str,
    match_columns: list[str],
    update_columns: list[str],
) -> str:
    """Server-side UPDATE-from-staging (reference: write/update.py's
    UPDATE ... FROM target JOIN staging shape)."""
    on = " AND ".join(
        f"_target.{quotename(c)} = _source.{quotename(c)}"
        for c in match_columns
    )
    sets = ", ".join(
        f"_target.{quotename(c)} = _source.{quotename(c)}"
        for c in update_columns
    )
    return (
        f"UPDATE _target SET {sets} "
        f"FROM {quotename_table(table_name)} AS _target "
        f"JOIN {quotename_table(staging_table)} AS _source ON ({on});"
    )


class JdbcEngine:
    """``mode="jdbc"`` face of the verb API: same method shapes as
    ``SparkEngine``'s verbs, executed against a live SQL Server.

    Reads return DataFrames whose scans run through Spark's JDBC
    DataSource — ``column_names`` prunes at the server, ``where``
    (the restricted grammar) pushes down as a predicate, and
    ``partition_column`` bounds fan the scan across ``num_partitions``
    executor connections (the 100-TB-ingest shape: each executor
    reads one key range)."""

    STAGING_PREFIX = "staging_mssql_dataframe_spark_"

    def __init__(self, spark: SparkSession, target: JdbcTarget):
        self.spark = spark
        self.target = target

    @classmethod
    def _staging_name(cls, table_name: str) -> str:
        """Per-call staging table name: random-suffixed (two
        concurrent merges must not overwrite each other's staged
        rows — and same-named tables in different schemas share the
        dbo staging namespace), base-truncated so the result always
        fits SYSNAME."""
        import uuid as _uuid

        suffix = "_" + _uuid.uuid4().hex[:12]
        base = cls.STAGING_PREFIX + table_name.split(".")[-1]
        return base[: _MAX_NAME_LEN - len(suffix)] + suffix

    # -- plumbing ------------------------------------------------------
    def _driver_connection(self):
        """A driver-side java.sql connection for the statements the
        DataSource cannot express (DDL / MERGE). Raises the documented
        environment error when the driver jar is absent."""
        jvm = self.spark._jvm
        try:
            jvm.java.lang.Class.forName(JDBC_DRIVER)
        except Exception as exc:
            raise EnvironmentJDBCDriverNotFound(
                f"JDBC driver {JDBC_DRIVER!r} is not on the Spark "
                "classpath — add the mssql-jdbc jar via spark.jars "
                "(reference: connect.py raises "
                "EnvironmentODBCDriverNotFound the same way)"
            ) from exc
        props = jvm.java.util.Properties()
        for k, v in self.target.options().items():
            if k not in ("url", "driver"):
                props.setProperty(k, v)
        return jvm.java.sql.DriverManager.getConnection(
            self.target.url, props
        )

    def execute(self, statement: str) -> None:
        """Run one generated T-SQL statement server-side."""
        conn = self._driver_connection()
        try:
            stmt = conn.createStatement()
            try:
                stmt.execute(statement)
            finally:
                stmt.close()
        finally:
            conn.close()

    # -- verbs ---------------------------------------------------------
    def create_table(
        self,
        table_name: str,
        columns: dict[str, str],
        primary_key_column: str | list[str] | None = None,
        not_nullable: list[str] | None = None,
    ) -> str:
        sql = create_table_statement(
            table_name, columns, primary_key_column, not_nullable
        )
        self.execute(sql)
        return sql

    def read_table(
        self,
        table_name: str,
        column_names: list[str] | None = None,
        where: str | None = None,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int | None = None,
    ) -> DataFrame:
        reader = self.spark.read.format("jdbc").options(
            **self.reader_options(
                table_name, column_names, where,
                partition_column, lower_bound, upper_bound, num_partitions,
            )
        )
        return reader.load()

    def reader_options(
        self,
        table_name: str,
        column_names: list[str] | None = None,
        where: str | None = None,
        partition_column: str | None = None,
        lower_bound: int | None = None,
        upper_bound: int | None = None,
        num_partitions: int | None = None,
    ) -> dict[str, str]:
        """The options dict the read verb hands Spark's JDBC source
        (exposed for testing without a live server). Projection and
        predicate travel INSIDE the pushed-down dbtable subquery, so
        the server sends only requested columns and matching rows."""
        from .identifiers import compile_where

        cols = (
            ", ".join(quotename(c) for c in column_names)
            if column_names
            else "*"
        )
        sub = f"SELECT {cols} FROM {quotename_table(table_name)}"
        if where is not None:
            # validate via the engine grammar, then re-render with
            # T-SQL bracket quoting for the server
            compile_where(where)
            sub += f" WHERE {_tsql_where(where)}"
        opts = dict(self.target.options())
        opts["dbtable"] = f"({sub}) AS _pushdown"
        if partition_column is not None:
            # Spark interpolates partitionColumn RAW into its
            # generated per-partition predicates ("col >= lo AND col
            # < hi") — an unvalidated name would be an injection
            # point, so it gets the same QUOTENAME treatment as every
            # other dynamic identifier. Bounds are mandatory with a
            # partition column: str(None) would ship the literal
            # "None" to the connector and fail server-side mid-scan.
            if lower_bound is None or upper_bound is None:
                raise ValueError(
                    "partition_column requires lower_bound and "
                    "upper_bound (the JDBC source cannot derive them)"
                )
            opts.update(
                partitionColumn=quotename(partition_column),
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(num_partitions or 8),
            )
        return opts

    def insert(self, table_name: str, df: DataFrame,
               batch_size: int = 10_000) -> None:
        """Append through the connector's batched executor-parallel
        writer (each partition opens one connection; rows flow in
        ``batchsize`` batches — the executemany analog, reference
        write/insert.py)."""
        (
            df.write.format("jdbc")
            .options(**self.target.options())
            .option("dbtable", quotename_table(table_name))
            .option("batchsize", str(batch_size))
            .mode("append")
            .save()
        )

    def merge(
        self,
        table_name: str,
        df: DataFrame,
        match_columns: list[str],
        delete_unmatched: bool = False,
        delete_requires: list[str] | None = None,
    ) -> str:
        """Reference-shape MERGE: stage ``df`` server-side via the
        batched writer, run ONE T-SQL MERGE joining staging to target,
        drop staging (reference: write/merge.py:23-131 +
        _source_table staging). Returns the executed MERGE text.

        The staging name carries a per-call random suffix: a fixed
        name collides under two concurrent merges into the same table
        (each mode="overwrite" staging write drops the other's rows
        mid-flight) and across same-named tables in different
        schemas; the base is truncated so the result always fits
        SYSNAME."""
        missing = [c for c in match_columns if c not in df.columns]
        if missing:
            raise ValueError(
                f"match columns {missing} not in dataframe — the MERGE "
                "ON clause would fail server-side AFTER staging"
            )
        if delete_requires:
            if not delete_unmatched:
                raise ValueError(
                    "delete_requires only applies with "
                    "delete_unmatched=True (reference merge.py:85-86 "
                    "rejects the combination the same way)"
                )
            bad = [c for c in delete_requires if c not in df.columns]
            if bad:
                raise ValueError(
                    f"delete_requires columns {bad} not in dataframe — "
                    "the IN-list guards select them FROM staging"
                )
        staging_full = f"dbo.{self._staging_name(table_name)}"
        (
            df.write.format("jdbc")
            .options(**self.target.options())
            .option("dbtable", quotename_table(staging_full))
            .mode("overwrite")
            .save()
        )
        update_columns = [c for c in df.columns if c not in match_columns]
        sql = merge_statement(
            table_name, staging_full, match_columns,
            update_columns, list(df.columns),
            delete_unmatched=delete_unmatched,
            delete_requires=delete_requires,
        )
        try:
            self.execute(sql)
        finally:
            self.execute(
                f"DROP TABLE IF EXISTS {quotename_table(staging_full)};"
            )
        return sql


def _tsql_where(where: str) -> str:
    """Re-render the validated where-grammar string with T-SQL
    spelling: backtick identifiers become QUOTENAME brackets (doubled
    backticks inside an identifier are the escaped literal form and
    must NOT close the bracket — mistranslating them would eject
    attacker-controlled identifier text into raw SQL), ``]`` inside an
    identifier doubles per QUOTENAME, and bare TRUE/FALSE literals
    (which T-SQL lacks) become 1/0 — only OUTSIDE quotes/brackets."""
    from .identifiers import compile_where

    compiled = compile_where(where)
    out: list[str] = []
    i, in_id, in_str = 0, False, False
    while i < len(compiled):
        ch = compiled[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                # either the closing quote or the first of an escaped
                # pair — emit both and stay inside for a pair
                if i + 1 < len(compiled) and compiled[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if in_id:
            if ch == "`":
                if i + 1 < len(compiled) and compiled[i + 1] == "`":
                    out.append("`")  # escaped literal backtick
                    i += 2
                    continue
                out.append("]")
                in_id = False
            elif ch == "]":
                out.append("]]")  # QUOTENAME escaping
            else:
                out.append(ch)
            i += 1
            continue
        if ch == "`":
            out.append("[")
            in_id = True
        elif ch == "'":
            out.append("'")
            in_str = True
        elif compiled.startswith("TRUE", i) and _standalone(compiled, i, 4):
            out.append("1")
            i += 4
            continue
        elif compiled.startswith("FALSE", i) and _standalone(compiled, i, 5):
            out.append("0")
            i += 5
            continue
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _standalone(s: str, i: int, n: int) -> bool:
    before = s[i - 1] if i > 0 else " "
    after = s[i + n] if i + n < len(s) else " "
    return not (before.isalnum() or before == "_") and not (
        after.isalnum() or after == "_"
    )
