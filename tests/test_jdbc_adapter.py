"""JDBC SQL Server adapter: statement/options generation is pure and
tested offline; execution paths raise the documented environment
error when the driver jar is absent (it is, in this container)."""

from __future__ import annotations

import pytest

from mssql_dataframe_spark import jdbc as JD
from mssql_dataframe_spark.errors import (
    SQLInvalidLengthObjectName,
    SQLInvalidSyntax,
    UndefinedConversionRule,
)


def test_quotename_escapes_and_bounds():
    assert JD.quotename("orders") == "[orders]"
    assert JD.quotename("odd]name") == "[odd]]name]"
    assert JD.quotename_table("dbo.orders") == "[dbo].[orders]"
    with pytest.raises(SQLInvalidLengthObjectName):
        JD.quotename("x" * 129)
    with pytest.raises(SQLInvalidLengthObjectName):
        JD.quotename("")


def test_target_url_and_options():
    t = JD.JdbcTarget("db.example.internal", "sales", user="u", password="p")
    assert t.url.startswith("jdbc:sqlserver://db.example.internal:1433;")
    assert "databaseName=sales" in t.url
    opts = t.options()
    assert opts["driver"] == JD.JDBC_DRIVER
    assert opts["user"] == "u" and opts["password"] == "p"
    # no password -> integrated security flag, no credential keys
    t2 = JD.JdbcTarget("h", "d")
    o2 = t2.options()
    assert "integratedSecurity=true" in o2["url"]
    assert "password" not in o2


def test_create_table_statement_shape():
    sql = JD.create_table_statement(
        "dbo.sample",
        {"id": "bigint", "name": "nvarchar(100)", "amt": "decimal(18,4)"},
        primary_key_column="id",
        not_nullable=["name"],
    )
    assert sql == (
        "CREATE TABLE [dbo].[sample] ([id] bigint NOT NULL, "
        "[name] nvarchar(100) NOT NULL, [amt] decimal(18,4) NULL, "
        "PRIMARY KEY ([id]))"
    )
    with pytest.raises(UndefinedConversionRule):
        JD.create_table_statement("dbo.t", {"x": "flux(9)"})


def test_merge_statement_shape():
    sql = JD.merge_statement(
        "dbo.target", "dbo.stage",
        match_columns=["id"],
        update_columns=["v"],
        insert_columns=["id", "v"],
        delete_unmatched=True,
        delete_requires=["id"],
    )
    assert "MERGE [dbo].[target] AS _target" in sql
    assert "USING [dbo].[stage] AS _source" in sql
    assert "ON (_target.[id] = _source.[id])" in sql
    assert "WHEN MATCHED THEN UPDATE SET _target.[v] = _source.[v]" in sql
    assert "WHEN NOT MATCHED THEN INSERT ([id], [v]) " in sql
    assert "VALUES (_source.[id], _source.[v])" in sql
    assert (
        "WHEN NOT MATCHED BY SOURCE AND _target.[id] IN "
        "(SELECT [id] FROM [dbo].[stage]) THEN DELETE" in sql
    )
    # upsert-only form has no BY SOURCE clause
    up = JD.merge_statement(
        "dbo.t", "dbo.s", ["id"], ["v"], ["id", "v"]
    )
    assert "BY SOURCE" not in up


def test_update_statement_shape():
    sql = JD.update_statement("dbo.t", "dbo.s", ["id"], ["a", "b"])
    assert sql == (
        "UPDATE _target SET _target.[a] = _source.[a], "
        "_target.[b] = _source.[b] "
        "FROM [dbo].[t] AS _target JOIN [dbo].[s] AS _source "
        "ON (_target.[id] = _source.[id]);"
    )


def test_tsql_where_translation():
    assert JD._tsql_where("ColumnA > 5 and ColumnB is not null") == (
        "[ColumnA] > 5 AND [ColumnB] IS NOT NULL"
    )
    # string literals keep single-quote escaping untouched
    assert JD._tsql_where("name = O'Brien") == "[name] = 'O''Brien'"
    # booleans become 1/0 (T-SQL has no TRUE/FALSE literals)...
    assert JD._tsql_where("flag = true") == "[flag] = 1"
    # ...but not inside string literals
    assert JD._tsql_where("s = 'A TRUE STORY'") == "[s] = 'A TRUE STORY'"
    # escaped backticks in identifiers stay INSIDE the bracket —
    # mistranslating them would eject text into raw SQL
    assert JD._tsql_where("a`b > 1") == "[a`b] > 1"
    # ] inside an identifier doubles per QUOTENAME
    assert JD._tsql_where("a]b > 1") == "[a]]b] > 1"
    with pytest.raises(SQLInvalidSyntax):
        JD._tsql_where("'; select true; --")


def test_reader_options_pushdown(spark):
    eng = JD.JdbcEngine(spark, JD.JdbcTarget("h", "d", user="u", password="p"))
    opts = eng.reader_options(
        "dbo.orders",
        column_names=["o_orderkey", "o_totalprice"],
        where="o_totalprice > 100",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=16,
    )
    assert opts["dbtable"] == (
        "(SELECT [o_orderkey], [o_totalprice] FROM [dbo].[orders] "
        "WHERE [o_totalprice] > 100) AS _pushdown"
    )
    # the partition column is QUOTENAME'd: Spark interpolates it RAW
    # into its generated per-partition range predicates
    assert opts["partitionColumn"] == "[o_orderkey]"
    assert opts["numPartitions"] == "16"
    # invalid grammar never reaches the server
    with pytest.raises(SQLInvalidSyntax):
        eng.reader_options("dbo.orders", where="1; DROP TABLE x")


def test_reader_options_partition_bounds_required(spark):
    eng = JD.JdbcEngine(spark, JD.JdbcTarget("h", "d", user="u", password="p"))
    # str(None) would ship the literal "None" to the connector
    with pytest.raises(ValueError, match="lower_bound"):
        eng.reader_options("dbo.orders", partition_column="o_orderkey")


def test_target_rejects_url_property_injection():
    # ';' starts a new key=value JDBC property — a database name
    # carrying one could smuggle e.g. authentication overrides
    with pytest.raises(ValueError, match="inject"):
        JD.JdbcTarget("h", "d;integratedSecurity=true")
    with pytest.raises(ValueError, match="inject"):
        JD.JdbcTarget("h;foo=bar", "d")


def test_merge_validates_columns_before_staging(spark):
    eng = JD.JdbcEngine(spark, JD.JdbcTarget("h", "d", user="u", password="p"))
    df = spark.createDataFrame([(1, "x")], "id long, v string")
    with pytest.raises(ValueError, match="match columns"):
        eng.merge("dbo.t", df, match_columns=["nope"])
    with pytest.raises(ValueError, match="delete_unmatched"):
        eng.merge(
            "dbo.t", df, match_columns=["id"], delete_requires=["id"]
        )
    with pytest.raises(ValueError, match="delete_requires columns"):
        eng.merge(
            "dbo.t", df, match_columns=["id"],
            delete_unmatched=True, delete_requires=["nope"],
        )


def test_merge_staging_name_is_unique_and_sysname_bounded():
    # the staging suffix prevents two concurrent merges into the same
    # table from overwriting each other's staged rows; a long target
    # name truncates so QUOTENAME's length bound never trips
    a = JD.JdbcEngine._staging_name("dbo.orders")
    b = JD.JdbcEngine._staging_name("dbo.orders")
    assert a != b and a.startswith(JD.JdbcEngine.STAGING_PREFIX)
    long_staging = JD.JdbcEngine._staging_name("dbo." + "t" * 120)
    assert len(long_staging) <= 128
    JD.quotename(long_staging)  # SYSNAME bound holds


def test_execute_without_driver_raises_documented_error(spark):
    eng = JD.JdbcEngine(spark, JD.JdbcTarget("h", "d", user="u", password="p"))
    with pytest.raises(JD.EnvironmentJDBCDriverNotFound, match="classpath"):
        eng.execute("SELECT 1")
