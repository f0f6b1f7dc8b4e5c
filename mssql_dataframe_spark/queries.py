"""Query registry: every operator exposed as a (spark, sf_dir) callable
plus a DuckDB-oracle SQL twin for the correctness gate.

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL. Float determinism: aggregates over
doubles are summed as DECIMAL(18,4) and cast back to DOUBLE in BOTH
engines so accumulation order cannot change the result bits
(SURVEY.md §6 — the duckdb-oracle hash-match is the gate).
"""

from __future__ import annotations

import os
import uuid

import pandas as pd  # module-global so pandas_udf type hints resolve

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .core import datetimeoffset as DTO
from .core import timetype as TT
from .operators import dedup as D
from .operators import joins as J
from .operators import multimodal as M
from .operators import similarity as S
from .operators import curation as C
from .operators import text as X
from .operators import training as TR
from .session import SparkEngine

_SCRATCH = os.path.join(os.path.dirname(__file__), "..", ".spark_tables", "queries")

REGISTRY: dict[str, dict] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        REGISTRY[name] = {"fn": fn, "sql": sql}
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dtype-robust events loader (see events_source.load_events)."""
    from .events_source import load_events as _load

    return _load(spark, sf_dir)


def _dsum(col, alias, scale=4):
    """Order-insensitive double sum: decimal accumulate, double out."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def _exact_rev(prefix="l_"):
    """Exact-decimal revenue factor: the source prices/discounts carry
    two decimals, so casting the FACTORS to decimal before multiplying
    keeps the arithmetic exact — no double->decimal tie-rounding, which
    Spark (HALF_UP) and other engines (half-even) resolve differently."""
    return (
        F.col(f"{prefix}extendedprice").cast("decimal(12,2)")
        * (1 - F.col(f"{prefix}discount")).cast("decimal(4,2)")
    )


# ---------------------------------------------------------------------------
# TPC-H-ish read path
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2)) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    disc_price = _exact_rev()
    charge = disc_price * (1 + F.col("l_tax")).cast("decimal(4,2)")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity"), "sum_qty"),
        _dsum(F.col("l_extendedprice"), "sum_base_price"),
        _dsum(disc_price, "sum_disc_price"),
        F.sum(charge.cast("decimal(24,6)")).cast("double").alias("sum_charge"),
        (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("avg_qty"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("avg_price"),
        (
            F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    sql="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3(spark, sf_dir):
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_dsum(_exact_rev(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    sql="""
    SELECT n.n_name,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_dsum(_exact_rev(), "revenue"))
    )


@register(
    "q6_forecast_revenue",
    sql="""
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast("decimal(4,2)"), "revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q10_returned_items",
    sql="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(_exact_rev(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q2_min_price_parts",
    sql="""
    SELECT p.p_brand, p.p_partkey, p.p_name, p.p_retailprice
    FROM part p
    JOIN (SELECT p_brand, MIN(p_retailprice) AS min_price
          FROM part GROUP BY p_brand) m
      ON p.p_brand = m.p_brand AND p.p_retailprice = m.min_price
    """,
)
def q2(spark, sf_dir):
    """Cheapest part(s) per brand — the reference pattern is TPC-H Q2's
    correlated-min subquery; expressed as a min-aggregate self-join so
    Catalyst plans one shuffle + broadcast of the tiny min table."""
    p = _t(spark, sf_dir, "part")
    m = (
        p.groupBy("p_brand")
        .agg(F.min("p_retailprice").alias("min_price"))
        .withColumnRenamed("p_brand", "__brand")
    )
    return (
        p.join(
            F.broadcast(m),
            (F.col("p_brand") == F.col("__brand"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@register(
    "q4_order_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    l = _t(spark, sf_dir, "lineitem")
    shipped_late = l.join(
        o, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi"
    ).select("l_orderkey").distinct()
    return (
        o.join(shipped_late, o.o_orderkey == shipped_late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q7_volume_shipping",
    sql="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY cn.n_name, sn.n_name, l_year
    """,
)
def q7(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp_ntz"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .filter(
            ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
        )
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(_dsum(_exact_rev(), "revenue"))
    )


@register(
    "q8_market_share",
    sql="""
    WITH all_sales AS (
      SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 8) AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
)
def q8(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = _exact_rev()
    sales = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.cast("decimal(18,4)").alias("volume"),
            "supp_nation",
        )
    )
    return sales.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            8,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    sql="""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(
             CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2))
             - CAST(0.5 AS DECIMAL(3,1)) * CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(l.l_quantity AS DECIMAL(4,0))
           AS DECIMAL(24,4))) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY nation, o_year
    """,
)
def q9(spark, sf_dir):
    """TPC-H Q9 (product-type profit) adapted to the available columns:
    no partsupp table, so supply cost is modeled as half the part's
    retail price. All arithmetic stays in decimal until the final cast
    so accumulation order cannot change the bits. The part filter is
    broadcast; lineitem shuffles once on the orders join key."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    cost = (
        F.lit(0.5).cast("decimal(3,1)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(4,0)")
    )
    amount = (_exact_rev() - cost).cast("decimal(24,4)")
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_parts",
    sql="""
    WITH val AS MATERIALIZED (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS part_value
      FROM lineitem
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM val
    WHERE part_value > (
      SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      FROM val
    ) * 1.5
    """,
)
def q11(spark, sf_dir):
    """TPC-H Q11 (important stock) adapted: per-part revenue against a
    scalar subquery threshold of 1.5x the average part value (share
    thresholds like the original's 0.0001 are not scale-invariant —
    the average is, so the query returns rows at every SF). The
    per-part aggregate is consumed twice (rows + scalar total);
    column pruning makes the two subtrees differ, defeating
    ReuseExchange, so it is persisted eagerly — one lineitem
    scan/shuffle, then two passes over the small aggregate. Totals are
    decimal-accumulated for order-insensitive bits; the /count and
    *1.5 double ops are IEEE-deterministic in both engines."""
    l = _t(spark, sf_dir, "lineitem")
    val = l.groupBy("l_partkey").agg(_dsum(_exact_rev(), "part_value")).persist()
    val.count()  # persist() is lazy; materialize before the two consumers race
    total = val.agg(
        (
            F.sum(F.col("part_value").cast("decimal(18,4)")).cast("double")
            / F.count("*")
        ).alias("__avg")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__avg") * 1.5)
        .select("l_partkey", "part_value")
    )


@register(
    "q12_late_shipments",
    sql="""
    SELECT o.o_orderpriority,
           CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           COUNT(*) AS line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def q12(spark, sf_dir):
    """TPC-H Q12's shipmode CASE-aggregation pattern adapted to the
    available columns: lines shipped >90 days after order date, counted
    per priority."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    o = _t(spark, sf_dir, "orders")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        1,
    ).otherwise(0)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).alias("late_count"),
            F.count("*").alias("line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13(spark, sf_dir):
    """TPC-H Q13: LEFT OUTER join (customers with zero orders count 0)
    then a histogram over the per-customer counts — two aggregations,
    the second over the first's output."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue",
    sql="""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE), 8)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def q14(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    rev = (_exact_rev()).cast("decimal(18,4)")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                8,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    sql="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4)))
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15(spark, sf_dir):
    """Top supplier by quarterly revenue: the scalar max-subquery plans
    as an aggregate broadcast-joined back to the revenue relation."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(_exact_rev(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    sql="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_limit
          FROM lineitem GROUP BY l_partkey) t
      ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND l.l_quantity < t.qty_limit
    """,
)
def q17(spark, sf_dir):
    """Small-quantity-order revenue: TPC-H Q17's correlated AVG
    subquery decorrelated into a per-part aggregate join — one shuffle
    on partkey instead of a per-row subquery."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    limits = l.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_limit")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(limits, l.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q16_supplier_count",
    sql="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (5, 10, 15, 20, 25, 30)
    GROUP BY p.p_brand, p.p_size
    """,
)
def q16(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_orders",
    sql="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q18(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(_dsum(F.col("l_quantity"), "sum_qty"))
    )


@register(
    "q19_disjunctive_filter",
    sql="""
    SELECT CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .filter(cond)
        .agg(
            _dsum(_exact_rev(), "revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q20_bulk_suppliers",
    sql="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(l.l_quantity) > 50
    )
    AND s.s_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_0', 'NATION_1')
    )
    """,
)
def q20(spark, sf_dir):
    """TPC-H Q20 (potential part promotion) adapted: no partsupp
    availqty, so a supplier qualifies by having shipped >50 units of
    any 'small%' part in 1997. Both IN-subqueries lower to semi-joins:
    the part and nation filters broadcast, the supplier qualification
    aggregates on (suppkey, partkey) — one lineitem shuffle."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    n = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_0", "NATION_1")
    ).select(F.col("n_nationkey").alias("s_nationkey"))
    qualified = (
        l.join(F.broadcast(p), "l_partkey", "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(qualified, "s_suppkey", "left_semi")
        .join(F.broadcast(n), "s_nationkey", "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q21_waiting_suppliers",
    sql="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
)
def q21(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting) adapted: lineitem
    has no commit/receipt dates, so 'late' means shipped >60 days after
    the order date. The EXISTS / NOT EXISTS pair is decorrelated into
    one pass: aggregate late-line counts per (order, supplier), then
    per order count suppliers and late suppliers. A late line
    qualifies iff its order has >1 supplier (EXISTS another supplier)
    and exactly 1 late supplier (NOT EXISTS another LATE supplier —
    necessarily this line's own). One lineitem scan + one shuffle
    join with orders, vs three lineitem scans for the naive
    semi/anti-join lowering; the shared per-(order,supplier) relation
    is small and persisted eagerly."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_os = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(F.when(late, 1).otherwise(0)).alias("__late_lines"))
        .persist()
    )
    per_os.count()  # persist() is lazy; materialize before the two consumers race
    per_order = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count("*").alias("__n_supp"),
            F.sum((F.col("__late_lines") > 0).cast("int")).alias("__n_late"),
        )
        .filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
        .select("l_orderkey")
    )
    return (
        per_os.filter(F.col("__late_lines") > 0)
        .join(per_order, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("__late_lines").cast("bigint").alias("numwait"))
    )


@register(
    "q22_idle_customers",
    sql="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def q22(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal"), "totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# window / rollup / cube / distinct / set ops / pivot
# ---------------------------------------------------------------------------

@register(
    "window_top3_orders_per_customer",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_user_value",
    sql="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_value,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC) AS INT) AS seq
    FROM events
    """,
)
def window_running(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
        F.row_number().over(w2).alias("seq"),
    )


@register(
    "window_sessionization",
    sql="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
)
def window_sessionization(spark, sf_dir):
    """30-minute-gap sessionization. The gap test compares FULL
    microsecond epochs (unix_micros), not second-truncated casts:
    ``ts.cast("long")`` floors each timestamp to whole seconds, so a
    true gap of 1800.5 s could truncate to exactly 1800 and FAIL the
    strict > test the SQL interval comparison passes — every ts in the
    events table carries sub-second parts, so the truncated form was
    one boundary-straddling pair away from a wrong session count
    (r14 queries.py entry-body review)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev)
           > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "rollup_lineitem_status",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), _dsum(F.col("l_quantity"), "sum_qty")
    )


@register(
    "cube_orders_status_priority",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), _dsum(F.col("o_totalprice"), "sum_price")
    )


@register(
    "distinct_aggregates",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_aggs(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "approx_count_distinct",
    sql="""
    SELECT TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
    """,
)
def approx_cd(spark, sf_dir):
    """HLL sketch values differ per implementation, so the gradable
    contract is the sketch's accuracy bound: relative error vs the
    exact COUNT(DISTINCT) <= 5% (HLL rsd default 0.05). The query
    returns the pass/fail booleans, which the oracle CAN check."""
    l = _t(spark, sf_dir, "lineitem")
    agg = l.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("ap"),
        F.count_distinct("l_partkey").alias("ep"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("ao"),
        F.count_distinct("l_orderkey").alias("eo"),
    )
    return agg.select(
        (
            F.abs(F.col("ap") - F.col("ep")) / F.col("ep") <= 0.05
        ).alias("parts_within_5pct"),
        (
            F.abs(F.col("ao") - F.col("eo")) / F.col("eo") <= 0.05
        ).alias("orders_within_5pct"),
    )


@register(
    "set_ops_customers",
    sql="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < -500
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    open_cust = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    poor = c.filter(F.col("c_acctbal") < -500).select("c_custkey")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    # SQL set-op precedence: INTERSECT binds tighter; UNION/EXCEPT left-to-right
    return (
        rich.intersect(open_cust).union(poor).distinct().exceptAll(f_cust.distinct())
    )


@register(
    "pivot_returnflag_linestatus",
    sql="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_rf(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "window_lead_lag_monthly",
    sql="""
    WITH monthly AS (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS y,
             CAST(MONTH(o_orderdate) AS INT) AS m,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT y, m, revenue,
           LAG(revenue) OVER (ORDER BY y, m) AS prev_revenue,
           LEAD(revenue) OVER (ORDER BY y, m) AS next_revenue,
           ROUND(CASE WHEN LAG(revenue) OVER (ORDER BY y, m) IS NOT NULL
                      AND LAG(revenue) OVER (ORDER BY y, m) <> 0
                 THEN (revenue - LAG(revenue) OVER (ORDER BY y, m))
                      / LAG(revenue) OVER (ORDER BY y, m)
                 END, 8) AS mom_change
    FROM monthly
    """,
)
def window_lead_lag(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
    ).agg(_dsum(F.col("o_totalprice"), "revenue"))
    w = Window.orderBy("y", "m")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "y",
        "m",
        "revenue",
        prev.alias("prev_revenue"),
        F.lead("revenue").over(w).alias("next_revenue"),
        F.round(
            F.when(
                prev.isNotNull() & (prev != 0), (F.col("revenue") - prev) / prev
            ),
            8,
        ).alias("mom_change"),
    )


@register(
    "window_moving_avg_frames",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3,
           ROUND(MIN(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 6)
             AS prior_min
    FROM orders
    """,
)
def window_moving_avg(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    order = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w3 = Window.partitionBy("o_custkey").orderBy(*order).rowsBetween(-2, 0)
    wp = (
        Window.partitionBy("o_custkey")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.avg("o_totalprice").over(w3), 6).alias("ma3"),
        F.round(F.min("o_totalprice").over(wp), 6).alias("prior_min"),
    )


@register(
    "events_mad_outliers",
    sql="""
    WITH stats AS (
      SELECT event_type,
             MEDIAN(value) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.event_id, e.value, s.med,
             ABS(e.value - s.med) AS adev
      FROM events e JOIN stats s ON e.event_type = s.event_type
    ), mad AS (
      SELECT event_type, MEDIAN(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type,
           ROUND(d.value, 2) AS value,
           ROUND((d.value - d.med) / (1.4826 * m.mad), 4) AS robust_z
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    WHERE m.mad > 0
      AND ABS((d.value - d.med) / (1.4826 * m.mad)) > 3.0
    """,
)
def events_mad_outliers(spark, sf_dir):
    """Robust outlier detection: median/MAD z-scores per event type —
    the monitoring gate that survives heavy tails where mean/stddev
    z-scores get dragged by the outliers they're hunting. Two exact
    medians (percentile — interpolation identical to DuckDB's MEDIAN)
    and two broadcast joins of the per-type scalar frames; the event
    scan never shuffles. 1.4826 is the standard normal-consistency
    constant; the identical IEEE expression on both sides keeps the
    threshold decision bit-agreed."""
    e = load_events(spark, sf_dir)
    stats = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(stats), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    z = (F.col("value") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(z) > 3.0))
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value"), 2).alias("value"),
            F.round(z, 4).alias("robust_z"),
        )
    )


@register(
    "timeseries_ewma_quantized",
    sql="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(list_reduce(
                  list(CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ORDER BY ts, event_id),
                  (acc, x) -> (13 * x + 87 * acc) // 100
                ) AS BIGINT) AS ewma_cents
    FROM events
    GROUP BY user_id
    """,
)
def timeseries_ewma_quantized(spark, sf_dir):
    """Exponentially-weighted moving average per user — the recursive
    time-series smoother no window frame can express (each state
    depends on the previous state, not a fixed frame). Values quantize
    to integer cents and the recurrence is pure int64
    ((13x + 87e) div 100, operands nonnegative so floor == truncate),
    so Spark's higher-order `aggregate` fold and DuckDB's list_reduce
    produce bit-identical states. Per-user sequences are bounded by
    user activity (collect_list stays small per group); a stateful
    streaming variant would use applyInPandasWithState — this is the
    batch backfill shape."""
    e = load_events(spark, sf_dir)
    q = F.floor(F.col("value") * 100 + 0.5).cast("long")
    seq = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), q.alias("q")))
    )
    per_user = e.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"), seq.alias("seq")
    )
    # per-step floor((13x+87e)/100): operands stay exact integers in
    # double (< 2^53) and floor(n/100.0) == n // 100 there, so the
    # fold state is int64-exact at every step, matching DuckDB's `//`
    ewma = F.aggregate(
        F.slice(F.col("seq"), 2, F.size("seq") - 1),
        F.element_at(F.col("seq"), 1)["q"],
        lambda acc, x: F.floor(
            (F.lit(13) * x["q"] + F.lit(87) * acc) / F.lit(100)
        ).cast("long"),
    )
    return per_user.select(
        "user_id",
        "n_events",
        ewma.cast("bigint").alias("ewma_cents"),
    )


@register(
    "global_topn_orders",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def global_topn_orders(spark, sf_dir):
    """Global ORDER BY + LIMIT: Spark plans TakeOrderedAndProject —
    each partition keeps a local top-100 heap and only those rows
    reach the driver-side merge, NEVER a full-table sort shuffle
    (tests/test_plans.py pins the plan). The difference between a
    bounded-memory top-N and a total sort is the whole game for
    leaderboard queries on a 100 TB fact table. Deterministic
    tie-break on the key."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "window_time_range_frames",
    sql="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS trailing_7d_value,
           CAST(COUNT(*) OVER w AS BIGINT) AS trailing_7d_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_time_range_frames(spark, sf_dir):
    """Time-based RANGE window frame: 7-day trailing sum/count per
    user — the sliding-metric shape behind feature stores and rate
    monitors. The frame bound is VALUE-based (epoch microseconds, so
    both engines cut the window at the identical microsecond — a
    seconds-granular bound would disagree on sub-second neighbors),
    unlike the ROWS frames above. One shuffle on user_id; the sum is
    exact DECIMAL inside the frame, so no accumulation-order noise."""
    e = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-604_800_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_value"),
        F.count("*").over(w).cast("bigint").alias("trailing_7d_n"),
    )


@register(
    "window_rank_ntile",
    sql="""
    SELECT c_custkey, c_mktsegment,
           CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT)
             AS bal_rank,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey ASC) AS INT)
             AS bal_quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey ASC), 8)
             AS bal_pct_rank
    FROM customer
    """,
)
def window_rank_ntile(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).cast("bigint").alias("bal_rank"),
        F.ntile(4).over(w).cast("int").alias("bal_quartile"),
        F.round(F.percent_rank().over(w), 8).alias("bal_pct_rank"),
    )


@register(
    "grouping_sets_revenue",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets(spark, sf_dir):
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_price
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# file-format connectors (CSV / JSON round trips through the scratch dir)
# ---------------------------------------------------------------------------

@register(
    "source_csv_roundtrip",
    sql="""
    SELECT n.n_regionkey, COUNT(*) AS n_nations,
           CAST(SUM(LENGTH(n.n_name)) AS BIGINT) AS name_chars
    FROM nation n GROUP BY n.n_regionkey
    """,
)
def source_csv_roundtrip(spark, sf_dir):
    """CSV sink+source: write nation to scratch CSV with a header, read
    it back with an explicit schema (no inference job at scale), then
    aggregate. Oracle computes the same from the parquet directly —
    proving the CSV round trip is lossless."""
    n = _t(spark, sf_dir, "nation")
    path = os.path.join(_SCRATCH, f"csv_{uuid.uuid4().hex}")
    n.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(n.schema).option("header", True).csv(path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.sum(F.length("n_name")).cast("bigint").alias("name_chars"),
    )


@register(
    "source_json_roundtrip",
    sql="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events WHERE user_id % 7 = 0 GROUP BY event_type
    """,
)
def source_json_roundtrip(spark, sf_dir):
    """JSON-lines sink+source round trip on an events slice; timestamps
    written as ISO strings and read back with an explicit schema."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    path = os.path.join(_SCRATCH, f"json_{uuid.uuid4().hex}")
    e.write.mode("overwrite").json(path)
    back = spark.read.schema(e.schema).json(path)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        _dsum(F.col("value"), "sum_value"),
    )


_AGG_PUSHDOWN_CONFS = {
    # v2 parquet scan + footer-statistics aggregate pushdown
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.sources.useV1SourceList": "",
}


@register(
    "source_parquet_agg_pushdown",
    sql="""
    SELECT MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders
    """,
)
def source_parquet_agg_pushdown(spark, sf_dir):
    """Parquet footer-statistics aggregate pushdown (v2 scan):
    MIN/MAX/COUNT are answered from row-group metadata — the scan
    reads FOOTERS, not data pages (plan shows PushedAggregation;
    tests/test_plans.py pins it). The native-Spark complement of
    read.table_stats' manifest-based answer: same O(files) economics,
    here for raw parquet directories outside the managed store.
    Session confs are saved/restored around an in-entry
    materialization (results are conf-independent)."""
    old = {}
    for k in _AGG_PUSHDOWN_CONFS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    for k, v in _AGG_PUSHDOWN_CONFS.items():
        spark.conf.set(k, v)
    try:
        o = _t(spark, sf_dir, "orders")
        df = o.agg(
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.count("*").cast("bigint").alias("n_rows"),
        )
        rows = df.collect()
        schema = df.schema
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(rows, schema)


@register(
    "source_nested_struct_pruning",
    sql="""
    SELECT c_custkey % 10 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
    FROM customer GROUP BY 1
    """,
)
def source_nested_struct_pruning(spark, sf_dir):
    """Nested-struct sink + schema-pruned source: customers written as
    two structs (profile, geo), then an aggregate touching ONE nested
    leaf. Catalyst's nested-schema pruning narrows the Parquet
    ReadSchema to struct<profile:struct<c_acctbal>> — the other leaves
    never leave the footer (tests/test_plans.py pins this). At 100 TB
    of event-style nested records, leaf-level pruning is the
    difference between scanning one column chunk and inflating whole
    structs."""
    c = _t(spark, sf_dir, "customer")
    nested = c.select(
        "c_custkey",
        F.struct("c_name", "c_acctbal").alias("profile"),
        F.struct("c_nationkey", "c_mktsegment").alias("geo"),
    )
    path = os.path.join(_SCRATCH, f"nested_{uuid.uuid4().hex}")
    nested.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.select(
            (F.col("c_custkey") % 10).alias("bucket"),
            F.col("profile.c_acctbal").alias("bal"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            _dsum(F.col("bal"), "sum_bal"),
        )
    )


@register(
    "bucketed_join_no_shuffle",
    sql="""
    SELECT o.o_orderpriority,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l.l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join_no_shuffle(spark, sf_dir):
    """Co-located join via bucketing: both fact tables are written
    CLUSTERED BY the join key into the same bucket count, so the join
    reads bucket-aligned files and runs with NO Exchange on either
    side (tests/test_plans.py pins this). This is the 100 TB strategy
    for repeated fact-fact joins: pay the shuffle once at write time,
    then every downstream join on the key is shuffle-free. The sortBy
    makes it a zero-sort merge join as well."""
    suffix = uuid.uuid4().hex
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp_ntz")
    )
    o = _t(spark, sf_dir, "orders")
    lt, ot = f"bkt_lineitem_{suffix}", f"bkt_orders_{suffix}"
    for df, name, key in ((l, lt, "l_orderkey"), (o, ot, "o_orderkey")):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(_SCRATCH, name))
            .saveAsTable(name)
        )
    lb, ob = spark.table(lt), spark.table(ot)
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            _dsum(_exact_rev(), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "percentile_functions",
    sql="""
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_functions(spark, sf_dir):
    """Exact continuous-interpolation percentiles (Spark `percentile` ==
    DuckDB `quantile_cont`); the approx_percentile sketch path is
    exercised rows-only elsewhere since sketches differ by engine."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99"),
    )


@register(
    "stats_aggregates",
    sql="""
    SELECT l_returnflag,
           ROUND(STDDEV_POP(l_quantity), 6) AS qty_stddev,
           ROUND(VAR_POP(l_discount), 8) AS disc_var,
           ROUND(CORR(l_quantity, l_extendedprice), 8) AS qty_price_corr,
           ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_aggregates(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_pop("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_pop("l_discount"), 8).alias("disc_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 8).alias("qty_price_corr"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
    )


@register(
    "unpivot_lineitem_measures",
    sql="""
    SELECT measure, COUNT(*) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM (
      SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
    )
    GROUP BY measure
    """,
)
def unpivot_lineitem_measures(spark, sf_dir):
    """Wide-to-long UNPIVOT/melt: Spark plans one Expand over a single
    scan (each input row fans out to three), where the SQL oracle's
    UNION ALL formulation scans three times — the melt shape is the
    scale-correct one for per-measure pipelines."""
    l = _t(spark, sf_dir, "lineitem")
    melted = l.unpivot(
        [], ["l_quantity", "l_extendedprice", "l_discount"], "measure", "val"
    )
    return melted.groupBy("measure").agg(
        F.count("*").alias("n"),
        _dsum(F.col("val"), "total"),
    )


@register(
    "regr_bool_aggregates",
    sql="""
    SELECT l_linestatus,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS price_per_qty,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS price_at_zero,
           CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT)
             AS n_pairs,
           BOOL_AND(l_quantity > 0) AS all_positive_qty,
           BOOL_OR(l_discount > 0.09) AS any_big_discount
    FROM lineitem GROUP BY l_linestatus
    """,
)
def regr_bool_aggregates(spark, sf_dir):
    """Linear-regression and boolean aggregates (SQL:2016 surface);
    slope/intercept rounded in both engines so double accumulation
    order cannot leak into the hash."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "price_per_qty"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6).alias(
            "price_at_zero"
        ),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_big_discount"),
    )


@register(
    "string_split_rows",
    sql="""
    SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
    FROM part WHERE p_partkey <= 1500
    """,
)
def string_split_rows(spark, sf_dir):
    """STRING_SPLIT table function (SQL Server 2016+): one row per
    delimited element — the set-based string shredder. Spark's
    explode(split(...)) is the same narrow fan-out (no shuffle; the
    Generate sits inside the scan stage)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1500)
    return p.select(
        "p_partkey",
        F.explode(F.split(F.col("p_type"), " ")).alias("word"),
    )


@register(
    "date_spine_calendar",
    sql="""
    SELECT CAST(d AS TIMESTAMP) AS cal_date,
           CAST(EXTRACT(ISODOW FROM d) AS INT) AS iso_weekday,
           EXTRACT(ISODOW FROM d) <= 5 AS is_weekday,
           CAST(EXTRACT(WEEK FROM d) AS INT) AS iso_week
    FROM generate_series(DATE '1997-01-01', DATE '1997-12-31',
                         INTERVAL 1 DAY) AS t(d)
    """,
)
def date_spine_calendar(spark, sf_dir):
    """Calendar date-spine generation (the dimension every gap-fill,
    cohort, and as-of pipeline joins against): one year of dates with
    ISO weekday/week attributes, generated relationally
    (sequence+explode — narrow, no source table, no shuffle). ISO
    semantics on both engines: weekday 1=Mon..7=Sun, ISO week
    numbers."""
    return spark.sql(
        """
        SELECT CAST(cal_date AS TIMESTAMP) AS cal_date,
               CAST(extract(DAYOFWEEK_ISO FROM cal_date) AS INT)
                 AS iso_weekday,
               extract(DAYOFWEEK_ISO FROM cal_date) <= 5 AS is_weekday,
               CAST(extract(WEEK FROM cal_date) AS INT) AS iso_week
        FROM (
          SELECT explode(sequence(DATE '1997-01-01', DATE '1997-12-31',
                                  INTERVAL 1 DAY)) AS cal_date
        )
        """
    )


@register(
    "argmax_aggregates",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           arg_max(o_custkey, o_totalprice * 1e9 + o_orderkey)
             AS top_spender_cust,
           arg_min(o_orderkey, o_totalprice * 1e9 + o_orderkey)
             AS cheapest_orderkey,
           ROUND(MEDIAN(o_totalprice), 6) AS median_price,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big
    FROM orders GROUP BY o_orderpriority
    """,
)
def argmax_aggregates(spark, sf_dir):
    """argmax/argmin aggregates (Spark `max_by`/`min_by` == DuckDB
    `arg_max`/`arg_min`) plus `median` and `count_if`. The ordering
    value is made UNIQUE per row (price*1e9 + orderkey: price deltas
    quantize to >=1e7, orderkeys stay below that) because max_by ties
    are engine-nondeterministic; identical IEEE arithmetic on both
    sides keeps the winner bit-agreed. The argmax shape replaces the
    self-join-on-max anti-pattern — one map-side-combinable agg pass
    instead of scan+join, which is the difference that matters on a
    100 TB fact table."""
    o = _t(spark, sf_dir, "orders")
    v = F.col("o_totalprice") * F.lit(1e9) + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.max_by("o_custkey", v).alias("top_spender_cust"),
        F.min_by("o_orderkey", v).alias("cheapest_orderkey"),
        F.round(F.median("o_totalprice"), 6).alias("median_price"),
        F.count_if(F.col("o_totalprice") > 200000)
        .cast("bigint")
        .alias("n_big"),
    )


@register(
    "histogram_equi_width",
    sql="""
    SELECT CAST(FLOOR((o_totalprice - 0.0) / ((600000.0 - 0.0) / 24))
                AS BIGINT) + 1 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(o_totalprice), 2) AS lo,
           ROUND(MAX(o_totalprice), 2) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def histogram_equi_width(spark, sf_dir):
    """Equi-width histogram via the SQL:2016 `width_bucket` builtin —
    the profiling primitive behind optimizer statistics and data-drift
    monitors. The DuckDB twin inlines width_bucket's exact definition
    (floor((x-lo)/((hi-lo)/nb))+1, the same IEEE operation order Spark's
    WidthBucket codegen uses), so boundary values land in the same
    bucket in both engines. One map-side-combinable agg, no shuffle
    beyond the 26-key exchange."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket",
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(24)
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "lateral_topk_per_nation",
    sql="""
    SELECT n.n_name, l.c_name, l.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 3
    ) l
    """,
)
def lateral_topk_per_nation(spark, sf_dir):
    """Correlated LATERAL subquery (SQL:1999 lateral derived table,
    new in Spark 4): top-3 customers by balance per nation, written as
    a per-row subquery instead of window+filter. Catalyst decorrelates
    it into a ranked join (DomainJoin -> window under the hood), so
    the executed plan is the same shuffle-once shape as the explicit
    window formulation — the feature is the SURFACE, the plan stays
    scale-sane."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat_v")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    return spark.sql(
        """
        SELECT n.n_name, l.c_name, l.c_acctbal
        FROM nation_lat_v n, LATERAL (
          SELECT c_name, c_acctbal FROM customer_lat_v c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 3
        ) l
        """
    )


@register(
    "recursive_cte_supplier_tree",
    sql="""
    WITH RECURSIVE tree(suppkey, depth) AS (
      SELECT s_suppkey, 0 FROM supplier WHERE s_suppkey = 1
      UNION ALL
      SELECT s.s_suppkey, t.depth + 1
      FROM supplier s JOIN tree t ON s.s_suppkey // 2 = t.suppkey
    )
    SELECT t.depth, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS sum_acctbal
    FROM tree t JOIN supplier s ON s.s_suppkey = t.suppkey
    GROUP BY t.depth
    """,
)
def recursive_cte_supplier_tree(spark, sf_dir):
    """WITH RECURSIVE (new in Spark 4): walk the implicit binary tree
    parent(k) = k DIV 2 from supplier 1, reporting per-depth counts and
    balance totals. Each recursion level is one join of the frontier
    against the (pruned, pushed-down) supplier scan — at 100 TB the
    frontier stays small relative to the table and the loop depth is
    log2(N), the same iterative-join shape as the dedup connected-
    components operator but expressed declaratively."""
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_rec_v")
    return spark.sql(
        """
        WITH RECURSIVE tree(suppkey, depth) AS (
          SELECT s_suppkey, 0 FROM supplier_rec_v WHERE s_suppkey = 1
          UNION ALL
          SELECT s.s_suppkey, t.depth + 1
          FROM supplier_rec_v s JOIN tree t ON s.s_suppkey DIV 2 = t.suppkey
        )
        SELECT t.depth, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               ROUND(CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4)
                 AS sum_acctbal
        FROM tree t JOIN supplier_rec_v s ON s.s_suppkey = t.suppkey
        GROUP BY t.depth
        """
    )


@register(
    "source_partitioned_pruning",
    sql="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM orders WHERE YEAR(o_orderdate) = 1997
    GROUP BY o_orderstatus
    """,
)
def source_partitioned_pruning(spark, sf_dir):
    """Hive-style partitioned sink + partition-pruned source: orders
    written partitionBy(year); the filtered read-back plans
    PartitionFilters (only the 1997 directory is scanned) — the layout
    that makes a 100 TB time-series table cheap to slice."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    path = os.path.join(_SCRATCH, f"part_{uuid.uuid4().hex}")
    o.write.mode("overwrite").partitionBy("o_year").parquet(path)
    back = spark.read.parquet(path).filter(F.col("o_year") == 1997)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), _dsum(F.col("o_totalprice"), "sum_price")
    )


# ---------------------------------------------------------------------------
# Python UDF surface: pandas_udf / applyInPandas / mapInPandas
# ---------------------------------------------------------------------------

@register(
    "pandas_udf_embedding_norm",
    sql="""
    SELECT vec_id,
           ROUND(sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])), 6) AS l2_norm
    FROM embeddings
    """,
)
def pandas_udf_norm(spark, sf_dir):
    """Vectorized scalar Pandas UDF (Arrow batches): L2 norm of the
    embedding column. The hot path at scale stays Arrow-batched numpy —
    no per-row Python. Oracle: sqrt(list_dot_product(v, v))."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2_norm(v: pd.Series) -> pd.Series:
        return v.map(lambda arr: float(np.sqrt(np.dot(arr, arr))))

    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(l2_norm(F.col("embedding").cast("array<double>")), 6).alias("l2_norm"),
    )


@register(
    "apply_in_pandas_zscore",
    sql="""
    SELECT o_orderkey, o_custkey,
           ROUND(CASE WHEN STDDEV_POP(o_totalprice)
                           OVER (PARTITION BY o_custkey) > 0
                 THEN (o_totalprice - AVG(o_totalprice)
                                      OVER (PARTITION BY o_custkey))
                      / STDDEV_POP(o_totalprice) OVER (PARTITION BY o_custkey)
                 ELSE 0.0 END, 6) AS price_z
    FROM orders
    """,
)
def apply_in_pandas_zscore(spark, sf_dir):
    """Grouped-map applyInPandas: per-customer z-score of order price.
    Arrow-batched per group; partitioning is the groupBy key, so the
    shuffle is the same as any keyed agg. Oracle: window mean/stddev."""
    import pandas as pd

    def zscore(pdf):
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=0)
        z = (pdf["o_totalprice"] - mu) / sd if sd > 0 else 0.0 * pdf["o_totalprice"]
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_custkey": pdf["o_custkey"],
                "price_z": z.round(6),
            }
        )

    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").applyInPandas(
        zscore, "o_orderkey bigint, o_custkey bigint, price_z double"
    )


@register(
    "map_in_pandas_tokens",
    sql=r"""
    SELECT doc_id,
           CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT)
             AS n_tokens,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, 'e', '')) AS BIGINT)
             AS n_letter_e
    FROM documents
    """,
)
def map_in_pandas_tokens(spark, sf_dir):
    """mapInPandas over Arrow record batches: per-document token and
    letter counts computed in pandas. The iterator-of-batches shape is
    the same plumbing a real multimodal decode would use."""
    import pandas as pd

    def count_batches(batches):
        for pdf in batches:
            text = pdf["text"].fillna("")
            stripped = text.str.strip()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": stripped.map(
                        lambda s: len(s.split()) if s else 0
                    ).astype("int64"),
                    "n_letter_e": text.str.count("e").astype("int64"),
                }
            )

    d = _t(spark, sf_dir, "documents")
    return d.mapInPandas(
        count_batches, "doc_id bigint, n_tokens bigint, n_letter_e bigint"
    )


@register(
    "posexplode_tokens",
    sql=r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(TRIM(text), '\s+') END AS toks
      FROM documents WHERE doc_id % 50 = 0
    )
    SELECT doc_id,
           CAST(unnest(range(0, len(toks))) AS INT) AS pos,
           unnest(toks) AS tok
    FROM t
    """,
)
def posexplode_tokens(spark, sf_dir):
    """Lateral/table-function surface: posexplode of the token array
    (the built-in equivalent of a UDTF emitting N rows per input)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    return d.select(
        "doc_id", F.posexplode(X.tokens("text")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "tok")


# ---------------------------------------------------------------------------
# joins: semi / anti / broadcast / as-of / range
# ---------------------------------------------------------------------------

@register(
    "semi_anti_join",
    sql="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
)
def semi_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    p_orders = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("c_custkey")
    )
    f_orders = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(p_orders, "c_custkey", "left_semi")
        .join(f_orders, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "broadcast_join_brand_volume",
    sql="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 20
    GROUP BY p.p_brand
    """,
)
def broadcast_brand(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(_dsum(F.col("l_quantity"), "sum_qty"), F.count("*").alias("n"))
    )


@register(
    "asof_join_events_orders",
    sql="""
    WITH daily AS (
      SELECT o_custkey, o_orderdate,
             CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS day_max_price
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, d.o_orderdate AS last_order_date,
           d.day_max_price AS last_order_price
    FROM events e
    ASOF LEFT JOIN daily d
      ON e.user_id = d.o_custkey AND d.o_orderdate <= e.ts
    """,
)
def asof_events_orders(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_custkey", "o_orderdate").agg(
        F.max(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("day_max_price")
    )
    joined = J.asof_join(
        e.select("event_id", "user_id", "ts"),
        daily.select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate"),
            F.col("day_max_price"),
        ),
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderdate", "day_max_price"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderdate").alias("last_order_date"),
        F.col("day_max_price").alias("last_order_price"),
    )


@register(
    "salted_join_user_events",
    sql="""
    SELECT c.c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def salted_join_user_events(spark, sf_dir):
    """Skew-safe salted equi-join (events fact x customer dim): the
    oracle is the PLAIN join — salting must not change results."""
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = J.salted_join(e, c, on="user_id", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"), _dsum(F.col("value"), "sum_value")
    )


@register(
    "approx_percentile_sketch",
    sql="""
    SELECT o_orderpriority, TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_percentile_sketch(spark, sf_dir):
    """approx_percentile (GK sketch): mergeable, one pass, bounded
    memory — the 100 TB path when exact percentile's full sort per
    group is too expensive. The sketch values are engine-specific, so
    the gradable contract is the accuracy guarantee: with accuracy
    10000 the rank error is <= N/10000, so each approximate value must
    lie within the exact quantile envelope [p-0.005, p+0.005]."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("ap"),
        F.expr(
            "percentile(o_totalprice, array(0.495, 0.505, 0.895, 0.905, "
            "0.985, 0.995))"
        ).alias("ex"),
    )
    def ok(i, lo, hi):
        a = F.col("ap")[i]
        return (a >= F.col("ex")[lo]) & (a <= F.col("ex")[hi])
    return agg.select(
        "o_orderpriority",
        ok(0, 0, 1).alias("p50_ok"),
        ok(1, 2, 3).alias("p90_ok"),
        ok(2, 4, 5).alias("p99_ok"),
    )


@register(
    "range_join_price_bands",
    sql="""
    WITH bands(band_name, lo, hi) AS (
      VALUES ('budget', 0.0, 500.0), ('mid', 500.0, 1200.0),
             ('premium', 1200.0, 1800.0), ('luxury', 1800.0, 100000.0)
    )
    SELECT b.band_name, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price
    FROM part p JOIN bands b
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_name
    """,
)
def range_join_bands(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [
            ("budget", 0.0, 500.0),
            ("mid", 500.0, 1200.0),
            ("premium", 1200.0, 1800.0),
            ("luxury", 1800.0, 100000.0),
        ],
        ["band_name", "lo", "hi"],
    )
    joined = J.range_join_banded(p, bands, "p_retailprice", "lo", "hi", 500.0)
    return joined.groupBy("band_name").agg(
        F.count("*").alias("n_parts"), _dsum(F.col("p_retailprice"), "sum_price")
    )


_BLOOM_CONFS = {
    # runtime bloom filters are sized for clusters: the application
    # side must look >10GB before Spark bothers. Locally we force the
    # injection (threshold 0) and forbid broadcast so the join keeps
    # the shuffle shape the filter exists to protect.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@register(
    "bloom_filter_join_prune",
    sql="""
    SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#13'
    GROUP BY l.l_returnflag
    """,
)
def bloom_filter_join_prune(spark, sf_dir):
    """Runtime bloom-filter join pruning (Catalyst InjectRuntimeFilter):
    the selective dim-side filter (one brand of part) builds a bloom
    filter at runtime that is pushed into the FACT-side scan as
    might_contain(xxhash64(l_partkey)) — ~96% of lineitem rows die at
    the scan, BEFORE the join shuffle. This is the 100 TB lever when
    the dim side is too big to broadcast but still selective: shuffle
    volume drops by the filter's selectivity for the cost of one tiny
    bloom build. tests/test_plans.py pins might_contain into the
    lineitem scan filter. The entry materializes under the forced
    confs, then restores session state (results are conf-independent —
    a bloom filter only removes rows the join would drop anyway)."""
    old = {}
    for k in _BLOOM_CONFS:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None  # no value and no default -> unset to restore
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        l = _t(spark, sf_dir, "lineitem")
        p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
        df = (
            l.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("l_returnflag")
            .agg(
                F.count("*").cast("bigint").alias("n_lines"),
                _dsum(F.col("l_extendedprice"), "revenue"),
            )
        )
        rows = df.collect()
        schema = df.schema
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.createDataFrame(rows, schema)


@register(
    "interval_overlap_join",
    sql="""
    WITH iv AS (
      SELECT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
             MIN(ts) AS start_ts, MAX(ts) AS end_ts
      FROM events GROUP BY 1, 2
    )
    SELECT a.day, a.user_id AS user1, b.user_id AS user2,
           epoch_us(least(a.end_ts, b.end_ts))
             - epoch_us(greatest(a.start_ts, b.start_ts)) AS overlap_us
    FROM iv a JOIN iv b
      ON a.day = b.day AND a.user_id < b.user_id
     AND a.start_ts <= b.end_ts AND b.start_ts <= a.end_ts
    WHERE epoch_us(least(a.end_ts, b.end_ts))
            - epoch_us(greatest(a.start_ts, b.start_ts)) >= 72000000000
    """,
)
def interval_overlap_entry(spark, sf_dir):
    """Interval-overlap join (operators/joins.py interval_overlap_join):
    per-user daily activity intervals, paired where the spans
    intersect for >= 20h. Banded by day so the plan is a hash
    equi-join with post-filters — cost is per-band pair counts, never
    the |intervals|^2 theta product. Overlap is exact integer
    microseconds (epoch differences cancel any timezone epoch offset),
    so both engines agree bit-for-bit."""
    e = load_events(spark, sf_dir)
    iv = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    pairs = J.interval_overlap_join(
        iv, iv, band_col="day", start_col="start_ts", end_col="end_ts",
        min_overlap_us=72_000_000_000,  # 20 hours
    ).filter(F.col("user_id") < F.col("user_id_r"))
    return pairs.select(
        "day",
        F.col("user_id").alias("user1"),
        F.col("user_id_r").alias("user2"),
        "overlap_us",
    )


# ---------------------------------------------------------------------------
# scalar function passthrough
# ---------------------------------------------------------------------------

@register(
    "string_functions",
    sql="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 5) AS name_prefix,
           LENGTH(p_name) AS name_len,
           REPLACE(p_type, ' ', '_') AS type_snake,
           CONCAT(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
           TRIM(p_name) AS name_trim
    FROM part
    """,
)
def string_funcs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat(
            F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")
        ).alias("brand_size"),
        F.trim(F.col("p_name")).alias("name_trim"),
    )


@register(
    "date_functions",
    sql="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
           DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
             AS days_since_95
    FROM orders
    """,
)
def date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_95"),
    )


@register(
    "json_object_extraction",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS prop_missing
    FROM events
    """,
)
def json_object_extraction(spark, sf_dir):
    """Real JSON parsing (not regex): get_json_object on the props
    column; missing path -> NULL in both engines."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("prop_missing"),
    )


@register(
    "variant_json_extraction",
    sql="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS prop_missing,
           'OBJECT<k: BIGINT>' AS vschema
    FROM events
    """,
)
def variant_json_extraction(spark, sf_dir):
    """Spark 4 VARIANT type: ``parse_json`` shreds the JSON once into
    the binary VARIANT encoding, then ``variant_get`` extracts typed
    paths WITHOUT re-parsing the string per path (get_json_object
    re-parses on every call — at 100 TB with many extracted paths the
    parse-once encoding is the scan-dominating difference).
    ``schema_of_variant`` recovers the per-row shredded schema;
    missing paths are NULL. The oracle pins the same values via JSON
    extraction and the expected constant schema."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias(
            "prop_k"
        ),
        F.expr(
            "variant_get(parse_json(props), '$.missing', 'bigint')"
        ).alias("prop_missing"),
        F.expr("schema_of_variant(parse_json(props))").alias("vschema"),
    )


@register(
    "pandas_udaf_median",
    sql="""
    SELECT o_orderpriority,
           MEDIAN(o_totalprice) AS median_price,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def pandas_udaf_median(spark, sf_dir):
    """Grouped-aggregate pandas UDF (vectorized UDAF): exact median per
    group — an aggregate Spark's built-ins only approximate
    (percentile_approx). Arrow-batched per group."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    o = _t(spark, sf_dir, "orders")
    med = o.groupBy("o_orderpriority").agg(
        median_udaf("o_totalprice").alias("median_price")
    )
    # Spark cannot mix a grouped-agg pandas UDF with builtin aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT) — join the count side
    cnt = o.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
    return med.join(F.broadcast(cnt), "o_orderpriority")


@register(
    "text_bpe_token_count",
    sql=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS n_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-ish subword-proxy token count: word / number / punctuation
    chunks via one regex scan (JVM-side)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.bpe_ish_token_count("text").alias("n_bpe_tokens"))


@register(
    "json_extraction",
    sql="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS prop_k
    FROM events
    """,
)
def json_funcs(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_extract(F.col("props"), r'"k": (-?[0-9]+)', 1)
        .cast("bigint")
        .alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# text analysis (documents table)
# ---------------------------------------------------------------------------

@register(
    "text_token_counts",
    sql=r"""
    SELECT doc_id,
           CAST(CASE WHEN text IS NULL OR LENGTH(TRIM(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END AS BIGINT)
             AS n_tokens,
           LENGTH(text) AS n_chars_calc
    FROM documents
    """,
)
def text_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.token_count("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_calc"),
    )


def _sw_sql_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in X.STOPWORDS[lang])


@register(
    "text_quality_features",
    sql=rf"""
    WITH t AS (
      SELECT doc_id, text,
             CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(TRIM(text), '\s+') END AS toks,
             LENGTH(text) AS n_chars
      FROM documents
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars_calc,
           CAST(len(toks) AS BIGINT) AS n_words,
           ROUND(CASE WHEN len(toks) > 0
                 THEN CAST(LENGTH(TRIM(text)) - (len(toks) - 1) AS DOUBLE)
                      / len(toks)
                 ELSE 0.0 END, 6) AS avg_word_len,
           ROUND(CAST(LENGTH(regexp_replace(text, '[^\.,;:!\?]', '', 'g')) AS DOUBLE)
                 / GREATEST(n_chars, 1), 6) AS punct_ratio,
           ROUND(CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 / GREATEST(n_chars, 1), 6) AS digit_ratio,
           ROUND(CASE WHEN len(toks) > 0
                 THEN CAST(len(list_filter(toks, t -> lower(t) IN ({_sw_sql_list('en')}))) AS DOUBLE)
                      / len(toks) ELSE 0.0 END, 6) AS stopword_ratio_en,
           (len(toks) >= 5
            AND (CASE WHEN len(toks) > 0
                 THEN CAST(LENGTH(TRIM(text)) - (len(toks) - 1) AS DOUBLE)
                      / len(toks)
                 ELSE 0.0 END) BETWEEN 2 AND 12
            AND CAST(LENGTH(regexp_replace(text, '[^\.,;:!\?]', '', 'g')) AS DOUBLE)
                / GREATEST(n_chars, 1) <= 0.2) AS quality_flag
    FROM t
    """,
)
def text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return X.quality_features(d)


def _langid_sql() -> str:
    cases = []
    for lang in sorted(X.STOPWORDS):
        cases.append(
            f"len(list_filter(toks, t -> lower(t) IN ({_sw_sql_list(lang)}))) "
            f"AS score_{lang}"
        )
    score_cols = ", ".join(cases)
    langs = sorted(X.STOPWORDS)
    greatest = "GREATEST(" + ", ".join(f"score_{m}" for m in langs) + ")"
    # smallest lang name among max scores (same tie-break as the Spark op)
    pick = "CASE " + " ".join(
        f"WHEN score_{m} = {greatest} THEN '{m}'" for m in langs
    ) + " END"
    return rf"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(TRIM(text), '\s+') END AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, {score_cols} FROM t
    )
    SELECT doc_id,
           CASE WHEN {greatest} > 0 THEN {pick} ELSE 'und' END AS lang_pred,
           CAST(COALESCE({greatest}, 0) AS BIGINT) AS stopword_hits
    FROM s
    """


@register("text_lang_id", sql=_langid_sql())
def text_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return X.lang_id(d)


@register(
    "lang_id_confusion",
    sql="""
    WITH pred AS ({lang_sql})
    SELECT d.lang AS actual_lang, p.lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM pred p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.lang, p.lang_pred
    """.format(lang_sql=REGISTRY["text_lang_id"]["sql"]),
)
def lang_id_confusion(spark, sf_dir):
    """Classifier EVALUATION as a first-class pipeline op: the
    stopword language-ID's confusion matrix against the corpus's
    ground-truth lang labels — the report a curation team reads
    before trusting a filter. Predictions reuse the registered
    operator (and the oracle reuses its registered SQL), so the
    evaluation stays consistent with the graded classifier."""
    d = _t(spark, sf_dir, "documents")
    pred = X.lang_id(d).select("doc_id", "lang_pred")
    return (
        pred.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang").alias("actual_lang"), "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@register(
    "doc_fingerprint",
    sql=r"""
    SELECT doc_id,
           md5(lower(regexp_replace(TRIM(text), '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", X.fingerprint("text").alias("fp"))


@register(
    "doc_rolling_hash",
    sql=r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(TRIM(text), '\s+') END AS toks
      FROM documents
    )
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               [(('0x' || substring(md5(tok), 1, 10))::BIGINT) FOR tok IN toks]),
             (acc, h) -> (acc * 1000003 + h) % 1099511627776
           ) AS rolling_hash
    FROM t
    """,
)
def doc_rolling_hash(spark, sf_dir):
    """Order-sensitive document fingerprint: polynomial rolling hash
    over token hashes, (acc*B + h) mod 2^40 with B=1000003 — overflow-
    safe 64-bit arithmetic shared with the ANSI-SQL oracle. Unlike the
    md5 fingerprint this is incrementally updatable and detects token
    reordering."""
    d = _t(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    hashes = F.transform(toks, lambda t: F.conv(
        F.substring(F.md5(t), 1, 10), 16, 10).cast("long"))
    rolling = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(1000003) + h) % F.lit(1 << 40),
    )
    return d.select("doc_id", rolling.alias("rolling_hash"))


# ---------------------------------------------------------------------------
# dedup (documents table)
# ---------------------------------------------------------------------------

@register(
    "dedup_exact_text",
    sql="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY text
    """,
)
def dedup_exact_text(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return D.exact_dedup(d, ["text"], "doc_id")


@register(
    "dedup_exact_prefix",
    sql="""
    SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
    FROM documents GROUP BY lower(substring(text, 1, 16))
    """,
)
def dedup_exact_prefix(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").withColumn(
        "__key", F.lower(F.substring("text", 1, 16))
    )
    return D.exact_dedup(d, ["__key"], "doc_id")


_MH_BANDS = 8
_MH_R = 2  # min-hashes per band: collide only if all agree
_MH_K = 8


def _mh_shingle_cte() -> str:
    """(doc_id, sh) exploded distinct-shingle rows, MATERIALIZED so the
    md5 pass runs once (DuckDB inlines plain CTEs per reference)."""
    n_hashes = _MH_BANDS * _MH_R
    band_sigs = ", ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"mh_{b * _MH_R + r}" for r in range(_MH_R))
        + f")) AS sig_{b}"
        for b in range(_MH_BANDS)
    )
    min_exprs = ", ".join(
        f"MIN(({D._mh_a(i)} * h + {D._mh_b(i)}) % {1 << 40}) AS mh_{i}"
        for i in range(n_hashes)
    )
    return f"""
    sh_rows AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct(
               CASE WHEN LENGTH(text) < {_MH_K} THEN []::VARCHAR[]
                    ELSE [substring(text, i, {_MH_K})
                          FOR i IN range(1, LENGTH(text) - {_MH_K} + 2)] END
             )) AS sh
      FROM documents
    ), mins AS MATERIALIZED (
      SELECT doc_id, {min_exprs}
      FROM (SELECT doc_id,
                   ('0x' || substring(md5(sh), 1, 10))::BIGINT AS h
            FROM sh_rows)
      GROUP BY doc_id
    ), sigs AS MATERIALIZED (
      SELECT doc_id, {band_sigs} FROM mins
    )"""


def _minhash_sig_sql() -> str:
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, sig_{b} AS signature FROM sigs "
        f"WHERE sig_{b} IS NOT NULL"
        for b in range(_MH_BANDS)
    )
    return f"""
    WITH {_mh_shingle_cte()}
    {unions}
    """


@register("minhash_signatures", sql=_minhash_sig_sql())
def minhash_signatures(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return D.minhash_signatures(
        d, "doc_id", "text", _MH_BANDS, _MH_K, rows_per_band=_MH_R
    )


def _minhash_pairs_cte(threshold: float = 0.5) -> str:
    """Full CTE chain ending in ``pairs(id1, id2, jaccard)`` — reused by
    the pairs query and the connected-components survivorship oracle."""
    n_hashes = _MH_BANDS * _MH_R
    agree = " + ".join(
        f"(CASE WHEN m1.mh_{i} = m2.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(n_hashes)
    )
    return f"""{_mh_shingle_cte()},
    stacked AS MATERIALIZED (
      {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, sig_{b} AS signature FROM sigs WHERE sig_{b} IS NOT NULL" for b in range(_MH_BANDS))}
    ), raw_cands AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.signature = b.signature
       AND a.doc_id < b.doc_id
    ), cands AS MATERIALIZED (
      SELECT c.id1, c.id2
      FROM raw_cands c
      JOIN mins m1 ON m1.doc_id = c.id1
      JOIN mins m2 ON m2.doc_id = c.id2
      WHERE ({agree}) / {float(n_hashes)} >= {threshold} - 0.2
    ), sizes AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n FROM sh_rows GROUP BY doc_id
    ), inter AS MATERIALIZED (
      SELECT c.id1, c.id2, COUNT(*) AS n_inter
      FROM cands c
      JOIN sh_rows r1 ON r1.doc_id = c.id1
      JOIN sh_rows r2 ON r2.doc_id = c.id2 AND r2.sh = r1.sh
      GROUP BY c.id1, c.id2
    ), pairs AS MATERIALIZED (
      SELECT i.id1, i.id2,
             ROUND(CAST(i.n_inter AS DOUBLE)
                   / (s1.n + s2.n - i.n_inter), 6) AS jaccard
      FROM inter i
      JOIN sizes s1 ON s1.doc_id = i.id1
      JOIN sizes s2 ON s2.doc_id = i.id2
      WHERE ROUND(CAST(i.n_inter AS DOUBLE)
                  / (s1.n + s2.n - i.n_inter), 6) >= {threshold}
    )"""


def _minhash_pairs_sql(threshold: float = 0.5) -> str:
    return f"""
    WITH {_minhash_pairs_cte(threshold)}
    SELECT id1, id2, jaccard FROM pairs
    """


def _survivors_sql(threshold: float = 0.5) -> str:
    """Connected components over the near-dup pair graph via a
    recursive label-propagation CTE, min id per component, survivors."""
    return f"""
    WITH RECURSIVE {_minhash_pairs_cte(threshold)},
    edges AS MATERIALIZED (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION ALL
      SELECT id2 AS a, id1 AS b FROM pairs
    ),
    cc(node, label) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, cc.label FROM cc JOIN edges e ON e.a = cc.node
    ),
    comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
    csizes AS (SELECT component, COUNT(*) AS cluster_size
               FROM comp GROUP BY component)
    SELECT comp.node AS doc_id, comp.component,
           comp.node = comp.component AS is_survivor,
           csizes.cluster_size
    FROM comp JOIN csizes ON comp.component = csizes.component
    WHERE csizes.cluster_size >= 2
    """


def _minhash_two_set_cte(
    threshold: float, new_pred: str, corpus_pred: str
) -> str:
    """Shared CTE chain for new-vs-corpus LSH joins (incremental
    ingest dedup AND fuzzy decontamination): signatures over all
    documents, band join restricted to new x corpus, estimate-prune,
    exact-Jaccard verify. Ends with a ``two_set_pairs`` CTE of
    (new_id, corpus_id, jaccard >= threshold)."""
    n_hashes = _MH_BANDS * _MH_R
    agree = " + ".join(
        f"(CASE WHEN m1.mh_{i} = m2.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(n_hashes)
    )
    stacked = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, sig_{b} AS signature FROM sigs "
        f"WHERE sig_{b} IS NOT NULL"
        for b in range(_MH_BANDS)
    )
    return f"""{_mh_shingle_cte()},
    stacked AS MATERIALIZED ({stacked}),
    raw_cands AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
      FROM stacked a JOIN stacked b
        ON a.band = b.band AND a.signature = b.signature
      WHERE (a.{new_pred}) AND (b.{corpus_pred})
    ), cands AS MATERIALIZED (
      SELECT c.new_id, c.corpus_id
      FROM raw_cands c
      JOIN mins m1 ON m1.doc_id = c.new_id
      JOIN mins m2 ON m2.doc_id = c.corpus_id
      WHERE ({agree}) / {float(n_hashes)} >= {threshold} - 0.2
    ), sizes AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n FROM sh_rows GROUP BY doc_id
    ), inter AS MATERIALIZED (
      SELECT c.new_id, c.corpus_id, COUNT(*) AS n_inter
      FROM cands c
      JOIN sh_rows r1 ON r1.doc_id = c.new_id
      JOIN sh_rows r2 ON r2.doc_id = c.corpus_id AND r2.sh = r1.sh
      GROUP BY c.new_id, c.corpus_id
    ), two_set_pairs AS MATERIALIZED (
      SELECT i.new_id, i.corpus_id,
             ROUND(CAST(i.n_inter AS DOUBLE)
                   / (s1.n + s2.n - i.n_inter), 6) AS jaccard
      FROM inter i
      JOIN sizes s1 ON s1.doc_id = i.new_id
      JOIN sizes s2 ON s2.doc_id = i.corpus_id
      WHERE ROUND(CAST(i.n_inter AS DOUBLE)
                  / (s1.n + s2.n - i.n_inter), 6) >= {threshold}
    )"""


def _minhash_incremental_sql(threshold: float = 0.5) -> str:
    return f"""
    WITH {_minhash_two_set_cte(threshold, "doc_id % 7 = 3", "doc_id % 7 <> 3")}
    SELECT new_id, corpus_id, jaccard FROM two_set_pairs
    """


def _fuzzy_decontam_sql(threshold: float = 0.5) -> str:
    """Per-train-doc contamination verdict: train docs (% 11 <> 5)
    LSH-checked against the benchmark split (% 11 = 5)."""
    cte = _minhash_two_set_cte(
        threshold, "doc_id % 11 <> 5", "doc_id % 11 = 5"
    )
    return f"""
    WITH {cte}
    SELECT d.doc_id,
           (v.worst_jaccard IS NOT NULL) AS contaminated,
           v.worst_jaccard,
           COALESCE(v.n_bench_hits, 0) AS n_bench_hits
    FROM (SELECT doc_id FROM documents WHERE doc_id % 11 <> 5) d
    LEFT JOIN (
      SELECT new_id, MAX(jaccard) AS worst_jaccard,
             CAST(COUNT(*) AS BIGINT) AS n_bench_hits
      FROM two_set_pairs GROUP BY new_id
    ) v ON v.new_id = d.doc_id
    """


@register("decontamination_fuzzy", sql=_fuzzy_decontam_sql(0.5))
def decontamination_fuzzy(spark, sf_dir):
    """Fuzzy train/eval decontamination (operators/curation.py
    fuzzy_decontaminate): paraphrased benchmark leakage that exact
    n-gram overlap (decontamination_overlap) misses is caught by
    LSH-bucketed shingle-Jaccard — the GPT-3-style dedup check. One
    verdict row per train doc (the curation-gate shape); cost ∝ train
    x bucket collisions, benchmark signatures broadcast-small."""
    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    return C.fuzzy_decontaminate(
        d.filter(k % 11 != 5), d.filter(k % 11 == 5),
        "doc_id", "text", threshold=0.5,
        n_bands=_MH_BANDS, k=_MH_K, rows_per_band=_MH_R,
    )


@register("minhash_dedup_incremental", sql=_minhash_incremental_sql(0.5))
def minhash_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup (operators/dedup.py
    minhash_dedup_incremental): the incoming batch (doc_id % 7 = 3)
    is LSH-joined against the corpus side ONLY — per-ingest cost
    ∝ batch x collisions, independent of corpus growth. Same
    estimate-prune + exact-Jaccard verification as the full pairs
    entry."""
    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    return D.minhash_dedup_incremental(
        d.filter(k % 7 == 3), d.filter(k % 7 != 3),
        "doc_id", "text", _MH_BANDS, _MH_K, 0.5, rows_per_band=_MH_R,
    )


@register("minhash_dedup_pairs", sql=_minhash_pairs_sql(0.5))
def minhash_dedup_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(
        d, "doc_id", "text", _MH_BANDS, _MH_K, 0.5, rows_per_band=_MH_R
    )


@register("dedup_cluster_survivors", sql=_survivors_sql(0.5))
def dedup_cluster_survivors(spark, sf_dir):
    """Near-dup survivorship: MinHash pairs -> iterative min-label
    connected components -> lowest-id document survives per cluster.
    The oracle computes the same fixpoint with a recursive CTE."""
    d = _t(spark, sf_dir, "documents")
    return D.dedup_cluster_survivors(
        d, "doc_id", "text", _MH_BANDS, _MH_K, 0.5, rows_per_band=_MH_R
    )


@register(
    "text_tfidf_top_terms",
    sql=r"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, lower(unnest(
               CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(TRIM(text), '\s+') END)) AS term
      FROM documents
    ),
    tf AS MATERIALIZED (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    idf AS MATERIALIZED (
      SELECT term, LN((n.n_docs + 1.0) / (COUNT(DISTINCT tf.doc_id) + 1.0))
               AS idf
      FROM tf, n GROUP BY term, n.n_docs
    ),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             ROUND(tf.tf * idf.idf, 8) AS tfidf
      FROM tf JOIN idf ON tf.term = idf.term
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, tfidf,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return X.tfidf_top_terms(d, "doc_id", "text", top_k=3)


@register(
    "unigram_logprob_quality",
    sql=r"""
    WITH toks AS (
      SELECT doc_id, lower(tok) AS tok FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(TRIM(text), '\s+')) AS tok
        FROM documents
        WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
      )
    ), freq AS (
      SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok
    ), tot AS (
      SELECT SUM(tf)::DOUBLE AS corpus_n FROM freq
    ), perdoc AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             SUM(CAST(ROUND(LN(f.tf::DOUBLE) * 1e6) AS BIGINT)) AS qsum
      FROM toks t JOIN freq f USING (tok)
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_tokens,
           (FLOOR(CAST(qsum AS DOUBLE) / n_tokens)
            - CAST(ROUND(LN(corpus_n) * 1e6) AS BIGINT)) / 1e6
             AS mean_logprob
    FROM perdoc, tot
    """,
)
def unigram_logprob_quality(spark, sf_dir):
    """Corpus-self-trained unigram LM score per document (the CCNet/
    RedPajama perplexity-proxy quality filter; operators/text.py
    unigram_logprob). Per-token ln(tf) quantized to 1e-6 and summed as
    BIGINT keeps the aggregate order-independent and engine-exact."""
    d = _t(spark, sf_dir, "documents")
    return X.unigram_logprob(d)


@register(
    "heavy_hitters_tokens",
    sql=r"""
    WITH toks AS (
      SELECT lower(unnest(regexp_split_to_array(TRIM(text), '\s+'))) AS v
      FROM documents WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
    )
    SELECT v AS value, COUNT(*) AS cnt
    FROM toks GROUP BY v
    ORDER BY cnt DESC, value LIMIT 20
    """,
)
def heavy_hitters_tokens(spark, sf_dir):
    """Exact top-20 corpus tokens via distributed Misra-Gries +
    verify (operators/text.py:heavy_hitters): the sketch pass emits
    only per-partition surviving counters (no shuffle of the token
    stream), and exact counting keys on the tiny candidate union
    instead of the full vocabulary — at 100 TB that is the difference
    between a 20-key and a billions-of-keys aggregation hash table.
    The oracle is the brute-force GROUP BY; candidates are provably a
    superset of every value with count > N/(k+1), so the exact top-20
    match regardless of partitioning."""
    d = _t(spark, sf_dir, "documents")
    toks = d.filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    ).select(F.explode(X.tokens(F.col("text"))).alias("t")).select(
        F.lower("t").alias("v")
    )
    return X.heavy_hitters(toks, col="v", k_track=64, top_n=20)


@register(
    "basket_brand_lift",
    sql="""
    WITH ob AS (
      SELECT DISTINCT l.l_orderkey, p.p_brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM ob
    ), brand_n AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_b FROM ob
      GROUP BY p_brand
    ), pair_n AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM ob a JOIN ob b
        ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      GROUP BY a.p_brand, b.p_brand
    )
    SELECT p.brand_a, p.brand_b, p.n_ab,
           ROUND(CAST(p.n_ab AS DOUBLE) * t.n
                 / (ba.n_b * bb.n_b), 6) AS lift
    FROM pair_n p
    JOIN brand_n ba ON ba.p_brand = p.brand_a
    JOIN brand_n bb ON bb.p_brand = p.brand_b
    CROSS JOIN n_orders t
    WHERE p.n_ab >= 5
    """,
)
def basket_brand_lift(spark, sf_dir):
    """Market-basket association mining: brand co-occurrence lift
    within orders (lift = P(A,B)/(P(A)P(B)) — the recommender /
    assortment-planning primitive). The basket self-join runs on the
    SLIM distinct (order, brand) frame — |brands| per order, never
    line items — so candidate pairs cost sum of per-order
    basket-size^2, and the support floor prunes the output. The
    brand-count joins broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    ob = (
        l.join(p, l.l_partkey == p.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .persist()
    )
    n_orders = ob.select(
        F.count_distinct("l_orderkey").cast("bigint").alias("n")
    )
    brand_n = ob.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_b")
    )
    a = ob.select(
        F.col("l_orderkey"), F.col("p_brand").alias("brand_a")
    )
    b = ob.select(
        F.col("l_orderkey"), F.col("p_brand").alias("brand_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    return (
        pairs.join(
            F.broadcast(brand_n.withColumnRenamed("p_brand", "brand_a")
                        .withColumnRenamed("n_b", "n_a_tot")),
            "brand_a",
        )
        .join(
            F.broadcast(brand_n.withColumnRenamed("p_brand", "brand_b")
                        .withColumnRenamed("n_b", "n_b_tot")),
            "brand_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a", "brand_b", "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.col("n")
                / (F.col("n_a_tot") * F.col("n_b_tot")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "events_time_to_convert",
    sql="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    ), conv AS (
      SELECT user_id,
             epoch_us(first_purchase) - epoch_us(first_view) AS latency_us
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converters,
           CAST(MIN(latency_us) AS BIGINT) AS min_latency_us,
           CAST(MEDIAN(latency_us) AS DOUBLE) AS median_latency_us,
           CAST(MAX(latency_us) AS BIGINT) AS max_latency_us
    FROM conv
    """,
)
def events_time_to_convert(spark, sf_dir):
    """Time-to-convert: per-user latency from first view to first
    purchase, aggregated to the conversion-latency distribution — the
    companion metric to the funnel's reach counts. Conditional MINs
    fold both firsts into ONE agg pass (no self-join); latency is
    exact integer microseconds."""
    e = load_events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            F.unix_micros(F.col("first_purchase"))
            - F.unix_micros(F.col("first_view"))
        ).alias("latency_us")
    )
    return conv.agg(
        F.count("*").cast("bigint").alias("n_converters"),
        F.min("latency_us").cast("bigint").alias("min_latency_us"),
        F.median("latency_us").cast("double").alias("median_latency_us"),
        F.max("latency_us").cast("bigint").alias("max_latency_us"),
    )


@register(
    "trigram_search_parts",
    sql="""
    WITH q AS (
      SELECT DISTINCT unnest(
        [substring('smal ringg', i, 3)
         FOR i IN range(1, LENGTH('smal ringg') - 1)]) AS g
    ), pt AS (
      SELECT p_partkey, p_name,
             unnest(list_distinct(
               [substring(lower(p_name), i, 3)
                FOR i IN range(1, LENGTH(p_name) - 1)])) AS g
      FROM part
    ), hits AS (
      SELECT p_partkey, p_name, CAST(COUNT(*) AS BIGINT) AS shared
      FROM pt JOIN q USING (g)
      GROUP BY p_partkey, p_name
    )
    SELECT p_partkey, p_name, shared
    FROM hits WHERE shared >= 5
    """,
)
def trigram_search_parts(spark, sf_dir):
    """Trigram fuzzy search — the pg_trgm-style index pattern behind
    typo-tolerant lookup: the query fragment's trigram set (tiny,
    broadcast) probes the corpus's exploded trigram postings; score =
    shared trigrams, thresholded. At 100 TB the postings frame is the
    materialized search index (write it bucketed by trigram); the
    probe is a broadcast join + one agg — no scan of the name column
    at query time."""
    needle = "smal ringg"  # a typo of the corpus's "small ring"
    p = _t(spark, sf_dir, "part")

    # trigram arrays via sequence+transform (substring by position),
    # identical semantics to the oracle's list comprehension
    def grams(col):
        return F.transform(
            F.sequence(F.lit(1), F.length(col) - 2),
            lambda i: col.substr(i, F.lit(3)),
        )

    q_grams = (
        spark.createDataFrame([(needle,)], "s string")
        .select(F.explode(F.array_distinct(grams(F.col("s")))).alias("g"))
    )
    postings = p.select(
        "p_partkey", "p_name",
        F.explode(F.array_distinct(grams(F.lower(F.col("p_name"))))).alias("g"),
    )
    return (
        postings.join(F.broadcast(q_grams), "g")
        .groupBy("p_partkey", "p_name")
        .agg(F.count("*").cast("bigint").alias("shared"))
        .filter(F.col("shared") >= 5)
    )


@register(
    "embedding_health_check",
    sql=f"""
    WITH n AS (
      SELECT vec_id, label,
             sqrt(list_dot_product(embedding::DOUBLE[],
                                   embedding::DOUBLE[])) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(count_if(nrm = 0) AS BIGINT) AS n_zero,
           ROUND(MIN(nrm), 6) AS min_norm,
           ROUND(quantile_cont(nrm, 0.5), 6) AS p50_norm,
           ROUND(quantile_cont(nrm, 0.99), 6) AS p99_norm,
           ROUND(MAX(nrm), 6) AS max_norm
    FROM n GROUP BY label
    """,
)
def embedding_health_check(spark, sf_dir):
    """Embedding-pipeline QA: per-label norm distribution and
    degenerate-vector counts — the health report that catches a
    broken encoder (all-zero outputs, exploding norms, label-specific
    drift) before embeddings feed dedup or retrieval. The norm uses
    the module's sequential-fold dot (same accumulation order as the
    oracle) and exact interpolated percentiles; one agg over the
    per-vector norms."""
    e = _t(spark, sf_dir, "embeddings")
    n = e.select(
        "label", S.norm(F.col("embedding").cast("array<double>")).alias("nrm")
    )
    return n.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.count_if(F.col("nrm") == 0).cast("bigint").alias("n_zero"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.expr("percentile(nrm, 0.5)"), 6).alias("p50_norm"),
        F.round(F.expr("percentile(nrm, 0.99)"), 6).alias("p99_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"),
    )


@register(
    "doc_ngram_novelty",
    sql=r"""
    WITH g AS (
      SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
                    ELSE [array_to_string(toks[i:i+2], ' ')
                          FOR i IN range(1, len(toks) - 1)] END)) AS gram
      FROM (
        SELECT doc_id,
               regexp_split_to_array(TRIM(lower(text)), '\s+') AS toks
        FROM documents
        WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
      )
    ), owners AS (
      SELECT gram, MIN(doc_id) AS first_owner FROM g GROUP BY gram
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(count_if(o.first_owner = g.doc_id) AS BIGINT) AS n_novel,
           ROUND(CAST(count_if(o.first_owner = g.doc_id) AS DOUBLE)
                 / COUNT(*), 6) AS novelty_rate
    FROM g JOIN owners o ON g.gram = o.gram
    GROUP BY g.doc_id
    """,
)
def doc_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the share of a doc's trigrams
    that no earlier document (lower doc_id) contains — the diversity
    score behind novelty-weighted sampling and the dual of n-gram
    dedup (a near-duplicate scores ~0, fresh content ~1). One
    first-owner agg over the exploded distinct-gram frame, then a
    per-doc conditional count; both shuffles ride the slim
    (doc, gram) projection."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim(F.col("text"))) > 0)
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams_arr = F.array_distinct(
        F.when(
            F.size(toks) < 3, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i + 1, 3)
                ),
            )
        )
    )
    g = d.select("doc_id", F.explode(grams_arr).alias("gram"))
    owners = g.groupBy("gram").agg(F.min("doc_id").alias("first_owner"))
    novel = F.count_if(F.col("first_owner") == F.col("doc_id"))
    return (
        g.join(owners, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            novel.cast("bigint").alias("n_novel"),
            F.round(novel.cast("double") / F.count("*"), 6).alias(
                "novelty_rate"
            ),
        )
    )


@register(
    "source_token_drift",
    sql=r"""
    WITH toks AS (
      SELECT source,
             unnest(regexp_split_to_array(TRIM(lower(text)), '\s+')) AS tok
      FROM documents
      WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
    ), st AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM toks GROUP BY source, tok
    ), s_tot AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM st GROUP BY source
    ), t_tot AS (
      SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok
    ), grand AS (
      SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM st
    ), terms AS (
      SELECT st.source,
             ABS(CAST(st.c_st AS DOUBLE) / s.n_s
                 - CAST(t.c_t AS DOUBLE) / g.n) AS d,
             CAST(t.c_t AS DOUBLE) / g.n AS p_corpus
      FROM st
      JOIN s_tot s ON s.source = st.source
      JOIN t_tot t ON t.tok = st.tok
      CROSS JOIN grand g
    ), absent AS (
      -- tokens a source never emits still contribute p_corpus to TVD
      SELECT s.source,
             SUM(CAST(t.c_t AS DOUBLE) / g.n) AS miss
      FROM s_tot s
      CROSS JOIN t_tot t
      CROSS JOIN grand g
      LEFT JOIN st ON st.source = s.source AND st.tok = t.tok
      WHERE st.tok IS NULL
      GROUP BY s.source
    )
    SELECT tr.source,
           ROUND(0.5 * (SUM(tr.d) + COALESCE(MAX(a.miss), 0)), 6)
             AS tvd_vs_corpus
    FROM terms tr LEFT JOIN absent a ON a.source = tr.source
    GROUP BY tr.source
    """,
)
def source_token_drift(spark, sf_dir):
    """Corpus drift monitor: per-source total-variation distance
    between the source's token distribution and the corpus-wide one —
    the report that catches one feed going off-distribution (spam
    influx, scraper breakage) before it poisons a training mix. The
    TVD needs the miss-mass of tokens a source never emits; that term
    comes from one slim (source x token-present) anti-join, never a
    dense |sources| x |vocab| matrix of data rows."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim(F.col("text"))) > 0)
    )
    toks = d.select(
        "source",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("tok"),
    )
    st = toks.groupBy("source", "tok").agg(
        F.count("*").cast("bigint").alias("c_st")
    ).persist()
    s_tot = st.groupBy("source").agg(
        F.sum("c_st").cast("bigint").alias("n_s")
    )
    t_tot = st.groupBy("tok").agg(
        F.sum("c_st").cast("bigint").alias("c_t")
    )
    grand = st.agg(F.sum("c_st").cast("bigint").alias("n"))
    terms = (
        st.join(F.broadcast(s_tot), "source")
        .join(t_tot, "tok")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            F.abs(
                F.col("c_st").cast("double") / F.col("n_s")
                - F.col("c_t").cast("double") / F.col("n")
            ).alias("d"),
        )
        .groupBy("source")
        .agg(F.sum("d").alias("present_sum"))
    )
    absent = (
        s_tot.crossJoin(t_tot)
        .crossJoin(F.broadcast(grand))
        .join(
            st.select("source", "tok", F.lit(True).alias("__has")),
            ["source", "tok"],
            "left",
        )
        .filter(F.col("__has").isNull())
        .groupBy("source")
        .agg(F.sum(F.col("c_t").cast("double") / F.col("n")).alias("miss"))
    )
    return (
        terms.join(absent, "source", "left")
        .select(
            "source",
            F.round(
                0.5 * (F.col("present_sum") + F.coalesce("miss", F.lit(0.0))),
                6,
            ).alias("tvd_vs_corpus"),
        )
    )


@register(
    "orders_cohort_ltv",
    sql="""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(DATE_TRUNC('month', MIN(o_orderdate)) AS TIMESTAMP)
               AS cohort_month
      FROM orders GROUP BY o_custkey
    ), facts AS (
      SELECT f.cohort_month,
             CAST(
               (EXTRACT(YEAR FROM o.o_orderdate)
                - EXTRACT(YEAR FROM f.cohort_month)) * 12
               + (EXTRACT(MONTH FROM o.o_orderdate)
                  - EXTRACT(MONTH FROM f.cohort_month)) AS INT
             ) AS month_offset,
             o.o_custkey, o.o_totalprice
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT cohort_month, month_offset,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS active_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM facts
    WHERE month_offset < 12
    GROUP BY cohort_month, month_offset
    """,
)
def orders_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix: customers grouped by first-order
    month, revenue and active counts tracked by month offset — the
    retention-x-revenue report subscription businesses live on.
    The per-customer cohort frame is tiny and broadcast back onto
    orders; month arithmetic is integer (year*12+month deltas), so no
    calendar-library divergence between engines."""
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    facts = o.join(F.broadcast(firsts), "o_custkey").select(
        "cohort_month",
        (
            (F.year("o_orderdate") - F.year("cohort_month")) * 12
            + (F.month("o_orderdate") - F.month("cohort_month"))
        ).cast("int").alias("month_offset"),
        "o_custkey",
        "o_totalprice",
    )
    return (
        facts.filter(F.col("month_offset") < 12)
        .groupBy("cohort_month", "month_offset")
        .agg(
            F.count_distinct("o_custkey").cast("bigint").alias(
                "active_customers"
            ),
            _dsum(F.col("o_totalprice"), "revenue"),
        )
    )


@register(
    "customer_rfm_segments",
    sql="""
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, frequency, monetary,
             CAST(NTILE(5) OVER (ORDER BY last_order DESC, o_custkey)
                  AS INT) AS r_score,
             CAST(NTILE(5) OVER (ORDER BY frequency DESC, o_custkey)
                  AS INT) AS f_score,
             CAST(NTILE(5) OVER (ORDER BY monetary DESC, o_custkey)
                  AS INT) AS m_score
      FROM base
    )
    SELECT o_custkey, frequency, monetary, r_score, f_score, m_score,
           CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
                WHEN r_score <= 2 THEN 'recent'
                WHEN f_score <= 2 THEN 'loyal'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
)
def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation — the classic warehouse customer-scoring
    pattern: recency/frequency/monetary quintiles (NTILE, ties broken
    on the key for determinism) folded into named segments. One agg
    over orders, then three global windows on the tiny per-customer
    frame — the expensive scan happens once; the window input is
    |customers|, not |orders|."""
    from .operators import distributed_window as DW

    o = _t(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("bigint").alias("frequency"),
        _dsum(F.col("o_totalprice"), "monetary"),
    )
    # Three exact NTILEs without a single global window: each quintile
    # dimension gets a range-partitioned two-pass rank (distributed_
    # window.global_row_number), then NTILE is derived arithmetically
    # from (rank, N). Bit-identical to NTILE(5) OVER (ORDER BY ...)
    # with the key tie-break, but every WindowExec stays partitioned.
    pins = []
    d, n = DW.global_row_number(
        base, [F.col("last_order").desc(), F.col("o_custkey")],
        out="__rn_r", pins=pins,
    )
    d, _ = DW.global_row_number(
        d, [F.col("frequency").desc(), F.col("o_custkey")],
        out="__rn_f", pins=pins,
    )
    d, _ = DW.global_row_number(
        d, [F.col("monetary").desc(), F.col("o_custkey")],
        out="__rn_m", pins=pins,
    )
    scored = d.select(
        "o_custkey", "frequency", "monetary",
        DW.ntile_from_rank(F.col("__rn_r"), n).alias("r_score"),
        DW.ntile_from_rank(F.col("__rn_f"), n).alias("f_score"),
        DW.ntile_from_rank(F.col("__rn_m"), n).alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk")
        .otherwise("regular")
    )
    # finalize() materializes the (small, per-customer) result and
    # releases the three nested range-partition caches — no pinned
    # frame outlives the query.
    return DW.finalize(scored.withColumn("segment", seg), pins)


@register(
    "parts_abc_pareto",
    sql="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(1 - l_discount AS DECIMAL(4,2))
                           AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue
      FROM lineitem GROUP BY l_partkey
    ), ranked AS (
      SELECT l_partkey, revenue,
             SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_rev,
             SUM(revenue) OVER () AS total_rev
      FROM rev
    )
    SELECT l_partkey, CAST(revenue AS DOUBLE) AS revenue,
           CASE WHEN cum_rev <= total_rev * 0.5 THEN 'A'
                WHEN cum_rev <= total_rev * 0.8 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def parts_abc_pareto(spark, sf_dir):
    """ABC / Pareto classification: parts ranked by revenue, classed by
    cumulative-share thresholds (top-50% of revenue = A, next 30% = B)
    — the inventory-analysis staple. The cumulative window runs in
    EXACT DECIMAL (a double running sum would make the class boundary
    accumulation-order-dependent); threshold compares are
    decimal-vs-decimal. One scan + one agg shuffle; the windows see
    the per-part frame only."""
    l = _t(spark, sf_dir, "lineitem")
    rev = l.groupBy("l_partkey").agg(
        F.sum(
            (
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
            ).cast("decimal(18,4)")
        ).cast("decimal(18,4)").alias("revenue")
    )
    from .operators import distributed_window as DW

    # Two-pass range-partitioned prefix sum instead of a global
    # cumulative window: per-partition DECIMAL cumsum + exact Decimal
    # offsets broadcast back (distributed_window.global_cumsum). The
    # grand total comes out of the same pass as a driver scalar, so
    # SUM() OVER () disappears too — zero unpartitioned WindowExec.
    pins = []
    ranked, total_rev = DW.global_cumsum(
        rev,
        [F.col("revenue").desc(), F.col("l_partkey")],
        "revenue",
        out="cum_rev",
        pins=pins,
    )
    # total_rev is a driver-side decimal.Decimal, so the class
    # thresholds are computed EXACTLY on the driver and land in the
    # plan as decimal literals — the boundary compare is
    # decimal-vs-decimal end to end, matching the oracle's
    # decimal arithmetic bit-for-bit.
    import decimal as _dec

    t_a = F.lit(total_rev * _dec.Decimal("0.5"))
    t_b = F.lit(total_rev * _dec.Decimal("0.8"))
    cls = (
        F.when(F.col("cum_rev") <= t_a, "A")
        .when(F.col("cum_rev") <= t_b, "B")
        .otherwise("C")
    )
    out = ranked.select(
        "l_partkey",
        F.col("revenue").cast("double").alias("revenue"),
        cls.alias("abc_class"),
    )
    return DW.finalize(out, pins)


@register(
    "events_error_budget",
    sql="""
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(count_if(event_type = 'error') AS BIGINT) AS n_errors,
           ROUND(CAST(count_if(event_type = 'error') AS DOUBLE)
                 / COUNT(*), 6) AS error_rate,
           (CAST(count_if(event_type = 'error') AS DOUBLE) / COUNT(*)
            > 0.2) AS budget_burned
    FROM events
    GROUP BY 1
    """,
)
def events_error_budget(spark, sf_dir):
    """SRE error-budget monitor: daily error share with a burn flag —
    one conditional-count agg, the alerting query that runs on every
    event stream. The threshold compare is the same IEEE expression on
    both engines, so the boolean verdict can't split."""
    e = load_events(spark, sf_dir)
    err = F.count_if(F.col("event_type") == "error")
    rate = err.cast("double") / F.count("*")
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        err.cast("bigint").alias("n_errors"),
        F.round(rate, 6).alias("error_rate"),
        (rate > 0.2).alias("budget_burned"),
    )


@register(
    "orders_priority_mix_shift",
    sql="""
    WITH m AS (
      SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
             o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT month, CAST(SUM(n) AS BIGINT) AS n_month FROM m GROUP BY month
    ), shares AS (
      SELECT m.month, m.o_orderpriority,
             ROUND(CAST(m.n AS DOUBLE) / t.n_month, 6) AS share
      FROM m JOIN tot t ON m.month = t.month
    )
    SELECT month, o_orderpriority, share,
           ROUND(share - LAG(share) OVER (PARTITION BY o_orderpriority
                                          ORDER BY month), 6) AS share_delta
    FROM shares
    """,
)
def orders_priority_mix_shift(spark, sf_dir):
    """Mix-shift monitor: each priority class's monthly share and its
    month-over-month delta (LAG window) — the composition-drift report
    that separates volume changes from mix changes. Slim per-month
    frame; the window runs over |months| x |priorities| rows."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month"),
        "o_orderpriority",
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = m.groupBy("month").agg(F.sum("n").cast("bigint").alias("n_month"))
    shares = m.join(tot, "month").select(
        "month", "o_orderpriority",
        F.round(F.col("n").cast("double") / F.col("n_month"), 6).alias(
            "share"
        ),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    return shares.select(
        "month", "o_orderpriority", "share",
        F.round(F.col("share") - F.lag("share").over(w), 6).alias(
            "share_delta"
        ),
    )


@register(
    "supplier_otif_rate",
    sql="""
    SELECT l.l_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(MEDIAN(DATE_DIFF('day', o.o_orderdate, l.l_shipdate)), 1)
             AS median_lag_days,
           CAST(count_if(DATE_DIFF('day', o.o_orderdate, l.l_shipdate) > 90)
                AS BIGINT) AS n_late,
           ROUND(CAST(count_if(
                   DATE_DIFF('day', o.o_orderdate, l.l_shipdate) > 90)
                 AS DOUBLE) / COUNT(*), 6) AS late_rate
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_suppkey
    HAVING COUNT(*) >= 20
    """,
)
def supplier_otif_rate(spark, sf_dir):
    """Supplier ship-lag scorecard: order-to-ship latency median and
    90-day-late rate per supplier, volume-floored so thin suppliers
    don't swing the ranking — the supply-chain KPI behind q21's
    waiting-supplier hunt, as a continuous metric. One join + one
    conditional-count agg pass."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    late = F.count_if(lag > 90)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_suppkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.round(F.median(lag), 1).alias("median_lag_days"),
            late.cast("bigint").alias("n_late"),
            F.round(late.cast("double") / F.count("*"), 6).alias(
                "late_rate"
            ),
        )
        .filter(F.col("n_lines") >= 20)
    )


@register(
    "customer_order_gaps",
    sql="""
    WITH seq AS (
      SELECT o_custkey, o_orderdate,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
               AS prev_date
      FROM orders
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(DATE_DIFF('day', prev_date, o_orderdate)) AS BIGINT)
             AS max_gap_days
    FROM seq
    GROUP BY o_custkey
    HAVING MAX(DATE_DIFF('day', prev_date, o_orderdate)) >= 365
    """,
)
def customer_order_gaps(spark, sf_dir):
    """Churn-signal mining: each customer's largest gap between
    consecutive orders (LAG + datediff), surfacing year-plus dormancy.
    One shuffle for the per-customer ordering window over the slim
    (custkey, date) projection."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey", "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
    )
    return (
        seq.groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.max(
                F.datediff(F.col("o_orderdate"), F.col("prev_date"))
            ).cast("bigint").alias("max_gap_days"),
        )
        .filter(F.col("max_gap_days") >= 365)
    )


@register(
    "events_hourly_seasonality",
    sql="""
    SELECT CAST(EXTRACT(ISODOW FROM ts) AS INT) AS iso_weekday,
           CAST(EXTRACT(HOUR FROM ts) AS INT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_seasonality(spark, sf_dir):
    """Hour-of-week seasonality heatmap (weekday x hour activity) —
    the load-shape report behind capacity planning and anomaly
    baselines. One map-side-combinable agg into a 7x24 grid; ISO
    weekday semantics match across engines."""
    e = load_events(spark, sf_dir)
    return e.groupBy(
        F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("int").alias(
            "iso_weekday"
        ),
        F.hour("ts").cast("int").alias("hour_of_day"),
    ).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        _dsum(F.col("value"), "sum_value"),
    )


@register(
    "events_dau_wau_stickiness",
    sql="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS d
      FROM events
    ), days AS (SELECT DISTINCT d FROM ud),
    dau AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
    ), wau AS (
      SELECT days.d, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
      FROM days JOIN ud
        ON ud.d <= days.d AND ud.d > days.d - INTERVAL 7 DAY
      GROUP BY days.d
    )
    SELECT dau.d AS day, dau.dau, wau.wau,
           ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def events_dau_wau_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per day — the engagement ratio product
    teams track. Trailing-7-day distinct users cannot ride a window
    frame (COUNT DISTINCT over RANGE isn't supported anywhere), so
    the scalable shape is the slim (user, day) dedup frame range-
    joined against the day spine — |days| x |active users/day| pairs,
    never raw events."""
    e = load_events(spark, sf_dir)
    ud = e.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct().persist()
    days = ud.select("d").distinct()
    dau = ud.groupBy("d").agg(F.count("*").cast("bigint").alias("dau"))
    wau = (
        days.alias("a")
        .join(
            ud.alias("u"),
            (F.col("u.d") <= F.col("a.d"))
            & (F.col("u.d") > F.col("a.d") - F.expr("INTERVAL 7 DAY")),
        )
        .groupBy(F.col("a.d").alias("d"))
        .agg(F.count_distinct("u.user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"), "dau", "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
    )


@register(
    "events_markov_transitions",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    ), totals AS (
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_total
      FROM pairs GROUP BY event_type
    )
    SELECT p.event_type AS from_type, p.next_type AS to_type, p.n,
           ROUND(CAST(p.n AS DOUBLE) / t.n_total, 6) AS prob
    FROM pairs p JOIN totals t ON p.event_type = t.event_type
    """,
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (LEAD window + two aggs) — the behavioral-model fit
    behind next-action prediction and anomaly scoring. One shuffle on
    user_id for the ordering window; the transition counts are
    |types|^2, map-side combinable."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_total")
    )
    return (
        pairs.join(totals, "event_type")
        .select(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
            "n",
            F.round(F.col("n").cast("double") / F.col("n_total"), 6)
            .alias("prob"),
        )
    )


@register(
    "events_retention_cohorts",
    sql="""
    WITH firsts AS (
      SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             DATEDIFF('day', f.cohort,
                      CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort AS VARCHAR) AS cohort,
           CAST(day_offset AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity GROUP BY cohort, day_offset
    """,
)
def events_retention_cohorts(spark, sf_dir):
    """Retention cohort matrix: users grouped by first-seen day, then
    distinct active users per (cohort, day-offset) — the table behind
    every retention curve. One agg for cohorts (broadcast back: one
    row per user is still keyed on user_id, so the join is
    co-partitioned), one distinct + count; day offsets are integer
    datediffs, cohort dates render as ISO strings for engine-exact
    output."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts")
    day = F.to_date(F.date_trunc("DAY", "ts"))
    firsts = e.groupBy("user_id").agg(F.min(day).alias("cohort"))
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id", "cohort",
            F.datediff(day, F.col("cohort")).alias("day_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort", "day_offset").agg(
        F.count("*").alias("active_users")
    ).select(
        F.col("cohort").cast("string").alias("cohort"),
        F.col("day_offset").cast("int").alias("day_offset"),
        "active_users",
    )


@register(
    "events_funnel_conversion",
    sql="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT s1.user_id,
           (s2.user_id IS NOT NULL) AS reached_click,
           (s3.user_id IS NOT NULL) AS reached_purchase
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def events_funnel_conversion(spark, sf_dir):
    """Ordered funnel (view -> click AFTER the first view -> purchase
    AFTER that click): per-user stage reach flags, the product-
    analytics conversion query. Each stage is one filtered min-ts
    aggregation joined forward — stage k scans only stage-(k-1)
    survivors' events; all joins key on user_id, so on a cluster the
    whole funnel is co-partitioned with zero extra shuffles after the
    first."""
    e = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            F.col("t2").isNotNull().alias("reached_click"),
            F.col("t3").isNotNull().alias("reached_purchase"),
        )
    )


@register(
    "events_activity_streaks",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS anchor
      FROM days
    )
    SELECT user_id, CAST(MIN(d) AS VARCHAR) AS streak_start,
           CAST(MAX(d) AS VARCHAR) AS streak_end,
           CAST(COUNT(*) AS INT) AS streak_days
    FROM grp GROUP BY user_id, anchor
    """,
)
def events_activity_streaks(spark, sf_dir):
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE
    active days, via the classic date-minus-row_number anchor (equal
    within a run, shifts at every gap). Per-user window partitions +
    one aggregation — both distributed on user_id; no self-join, no
    recursion."""
    e = _t(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("DAY", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub("d", F.row_number().over(w))
    )
    return grp.groupBy("user_id", "anchor").agg(
        F.min("d").cast("string").alias("streak_start"),
        F.max("d").cast("string").alias("streak_end"),
        F.count("*").cast("int").alias("streak_days"),
    ).drop("anchor")


@register(
    "try_cast_tolerant_ingest",
    sql="""
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN CAST(n_chars AS VARCHAR)
                  WHEN doc_id % 3 = 1 THEN 'n/a'
                  ELSE '' END AS raw_num,
             CASE WHEN doc_id % 2 = 0
                  THEN '2024-0' || ((doc_id % 9) + 1) || '-15'
                  ELSE 'not-a-date' END AS raw_date
      FROM documents
    )
    SELECT doc_id,
           TRY_CAST(raw_num AS BIGINT) AS parsed_num,
           CAST(TRY_CAST(raw_date AS DATE) AS VARCHAR) AS parsed_date,
           (TRY_CAST(raw_num AS BIGINT) IS NULL) AS num_failed
    FROM raw
    """,
)
def try_cast_tolerant_ingest(spark, sf_dir):
    """Error-tolerant ingestion casts (``try_cast``): malformed values
    become NULL instead of failing the job — the ELT semantics for
    dirty feeds, where ANSI mode's strict CAST would kill a 100-TB
    load over one bad row. The oracle mirrors with DuckDB TRY_CAST;
    dates render as ISO strings for dtype parity."""
    d = _t(spark, sf_dir, "documents")
    raw = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("n_chars").cast("string"))
        .when(F.col("doc_id") % 3 == 1, F.lit("n/a"))
        .otherwise(F.lit(""))
        .alias("raw_num"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("2024-0"),
                ((F.col("doc_id") % 9) + 1).cast("string"),
                F.lit("-15"),
            ),
        ).otherwise(F.lit("not-a-date")).alias("raw_date"),
    )
    return raw.select(
        "doc_id",
        F.expr("try_cast(raw_num AS BIGINT)").alias("parsed_num"),
        F.expr("CAST(try_cast(raw_date AS DATE) AS STRING)")
        .alias("parsed_date"),
        F.expr("try_cast(raw_num AS BIGINT) IS NULL").alias("num_failed"),
    )


@register(
    "null_safe_join_semantics",
    sql="""
    WITH k AS (
      SELECT n_nationkey, NULLIF(n_regionkey, 2) AS rk FROM nation
    )
    SELECT a.n_nationkey AS n1, b.n_nationkey AS n2,
           (a.rk IS NULL) AS joined_on_null
    FROM k a JOIN k b
      ON a.rk IS NOT DISTINCT FROM b.rk
     AND a.n_nationkey < b.n_nationkey
    """,
)
def null_safe_join_semantics(spark, sf_dir):
    """Null-safe equality join (Spark ``<=>`` / ANSI ``IS NOT DISTINCT
    FROM``): NULL keys MATCH each other instead of silently dropping —
    the semantics entity-resolution pipelines need when the join key
    is legitimately absent. The NULLIF-derived key makes one region's
    nations all-NULL; the gate proves they pair with each other while
    plain ``=`` would discard them."""
    n = _t(spark, sf_dir, "nation").select(
        "n_nationkey",
        F.nullif(F.col("n_regionkey"), F.lit(2)).alias("rk"),
    )
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            F.col("a.rk").eqNullSafe(F.col("b.rk"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_nationkey").alias("n1"),
            F.col("b.n_nationkey").alias("n2"),
            F.col("a.rk").isNull().alias("joined_on_null"),
        )
    )


@register(
    "timeseries_gap_fill",
    sql="""
    WITH e AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events GROUP BY user_id, ts
    ),
    span AS (
      SELECT user_id, date_trunc('day', MIN(ts)) AS d0,
             date_trunc('day', MAX(ts)) AS d1
      FROM e GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS grid_ts
      FROM span
    )
    SELECT g.user_id, g.grid_ts, e.value AS value_filled
    FROM grid g ASOF LEFT JOIN e
      ON g.user_id = e.user_id AND e.ts <= g.grid_ts
    """,
)
def timeseries_gap_fill(spark, sf_dir):
    """Daily resample + forward fill (operators/joins.py:
    resample_forward_fill) — the time-series gap-fill operator Spark
    lacks natively, rebuilt on the single-window-pass as-of join: each
    user's own day span becomes a grid carrying the latest value at or
    before each day start. The oracle uses DuckDB's native ASOF LEFT
    JOIN, checking our union+window construction against a real asof
    implementation."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    return J.resample_forward_fill(
        e, key_col="user_id", time_col="ts", value_col="value"
    )


def _bpe_train_oracle_sql(rounds: int = 5) -> str:
    """The SAME iterative merge training unrolled into one
    count/argmax/replace CTE triple per round."""
    parts = [r"""WITH s0 AS MATERIALIZED (
      SELECT array_to_string(list_transform(
               regexp_split_to_array(TRIM(text), '\s+'),
               t -> lower(t)), ' ') AS seg
      FROM documents
      WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
    )"""]
    for k in range(rounds):
        parts.append(f""", p{k} AS MATERIALIZED (
      SELECT unnest(CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
                    ELSE [toks[i] || ' ' || toks[i + 1]
                          FOR i IN range(1, len(toks))] END) AS pair
      FROM (SELECT str_split(seg, ' ') AS toks FROM s{k})
    ), w{k} AS MATERIALIZED (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM p{k} GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 1
    ), s{k + 1} AS MATERIALIZED (
      -- boundary-anchored fuse (matches the engine's _pad_stream /
      -- _unpad_stream): whole-token matches only
      SELECT TRIM(replace(
               replace(' ' || replace(seg, ' ', '  ') || ' ',
                       (SELECT ' ' || replace(pair, ' ', '  ') || ' '
                        FROM w{k}),
                       (SELECT ' ' || replace(pair, ' ', '+') || ' '
                        FROM w{k})),
               '  ', ' ')) AS seg
      FROM s{k}
    )""")
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS merge_rank, split_part(pair, ' ', 1) AS left_sym,"
        f" split_part(pair, ' ', 2) AS right_sym, cnt AS pair_count"
        f" FROM w{k}"
        for k in range(rounds)
    )
    parts.append("\n    " + sel)
    return "".join(parts)


@register("tokenizer_learn_merges", sql=_bpe_train_oracle_sql(5))
def tokenizer_learn_merges(spark, sf_dir):
    """Tokenizer merge TRAINING (operators/text.py learn_token_merges):
    classic iterative BPE at token granularity — count adjacent pairs,
    fuse the corpus-wide winner, RE-SEGMENT, repeat, so earlier merges
    participate in later pairs (the property one-shot bigram mining
    lacks). One map-side-combined shuffle per round; the driver holds
    one scalar winner per round, never a vocabulary. The oracle
    unrolls the identical count/argmax/replace loop into SQL CTEs, so
    the learned table (and by extension every segmentation it
    produces through tokenizer_apply_merges) is engine-exact."""
    d = _t(spark, sf_dir, "documents")
    rows = X.learn_token_merges(d, rounds=5)
    return spark.createDataFrame(
        rows,
        "merge_rank int, left_sym string, right_sym string, "
        "pair_count bigint",
    )


@register(
    "tokenizer_apply_merges",
    sql=r"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR LENGTH(TRIM(text)) = 0 THEN ''
                  ELSE array_to_string(list_transform(
                         regexp_split_to_array(TRIM(text), '\s+'),
                         t -> lower(t)), ' ') END AS s,
             CASE WHEN text IS NULL OR LENGTH(TRIM(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+'))
                  END AS n_before
      FROM documents
    ),
    m AS (
      -- boundary-anchored merges: sentinel-pad + double separators so
      -- each rule matches whole tokens only (" a  b "), then collapse
      SELECT doc_id, n_before,
             TRIM(replace(
               replace(replace(replace(replace(
                 ' ' || replace(s, ' ', '  ') || ' ',
                 ' table  hash ', ' table+hash '),
                 ' part  filter ', ' part+filter '),
                 ' customer  join ', ' customer+join '),
                 ' merge  group ', ' merge+group '),
               '  ', ' ')) AS tokenized
      FROM d
    )
    SELECT doc_id,
           CAST(n_before AS BIGINT) AS n_tokens_before,
           CAST(CASE WHEN LENGTH(tokenized) = 0 THEN 0
                ELSE LENGTH(tokenized)
                     - LENGTH(replace(tokenized, ' ', '')) + 1 END
                AS BIGINT) AS n_tokens_after,
           tokenized
    FROM m
    """,
)
def tokenizer_apply_merges(spark, sf_dir):
    """Tokenizer merge APPLICATION (operators/text.py:
    apply_token_merges): fuse the corpus's top adjacent pairs (mined
    by bigram_pmi) into single symbols, rule by rule, with
    plain-string replace semantics identical across engines — the
    BPE/WordPiece apply step, proven against an oracle that performs
    the same ordered replaces in SQL. Per-document token counts
    before/after quantify the compression the merge table buys."""
    d = _t(spark, sf_dir, "documents")
    return X.apply_token_merges(
        d,
        merges=[("table", "hash"), ("part", "filter"),
                ("customer", "join"), ("merge", "group")],
    )


@register(
    "bigram_logprob_quality",
    sql=r"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                  ELSE list_transform(
                         regexp_split_to_array(TRIM(text), '\s+'),
                         t -> lower(t)) END AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    pairs AS (
      SELECT doc_id, tk[CAST(i AS INT)] AS t1,
             tk[CAST(i AS INT) + 1] AS t2
      FROM (SELECT doc_id, tk,
                   unnest(range(1, GREATEST(len(tk), 1))) AS i FROM d)
    ),
    big AS (SELECT t1, t2, COUNT(*) AS c2 FROM pairs GROUP BY t1, t2),
    ctx AS (SELECT t1, SUM(c2) AS c1 FROM big GROUP BY t1),
    vocab AS (
      SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT unnest(tk) AS tok FROM d)
    ),
    scored AS (
      SELECT p.doc_id,
             CAST(ROUND(LN((b.c2 + 1)::DOUBLE) * 1e6) AS BIGINT)
             - CAST(ROUND(LN((x.c1 + vocab.v)::DOUBLE) * 1e6) AS BIGINT)
               AS qterm
      FROM pairs p JOIN big b ON p.t1 = b.t1 AND p.t2 = b.t2
                   JOIN ctx x ON p.t1 = x.t1, vocab
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           FLOOR(CAST(SUM(qterm) AS DOUBLE) / COUNT(*)) / 1e6
             AS mean_logprob
    FROM scored GROUP BY doc_id
    """,
)
def bigram_logprob_quality(spark, sf_dir):
    """Bigram-LM quality score (operators/text.py:bigram_logprob) —
    the sharper CCNet-style perplexity proxy: mean smoothed
    ln P(w|prev) under the corpus's own transition counts, catching
    common-words-in-improbable-order documents the unigram score
    cannot. Both log terms are quantized ln-of-integers summed as
    int64, so the score is engine-exact."""
    d = _t(spark, sf_dir, "documents")
    return X.bigram_logprob(d)


@register(
    "bigram_pmi_collocations",
    sql=r"""
    WITH d AS (
      SELECT CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                  ELSE list_transform(
                         regexp_split_to_array(TRIM(text), '\s+'),
                         t -> lower(t)) END AS tk
      FROM documents WHERE text IS NOT NULL
    ),
    pairs AS (
      SELECT tk[CAST(i AS INT)] AS t1, tk[CAST(i AS INT) + 1] AS t2
      FROM (SELECT tk, unnest(range(1, GREATEST(len(tk), 1))) AS i FROM d)
    ),
    uni AS (
      SELECT tok, COUNT(*) AS c
      FROM (SELECT unnest(tk) AS tok FROM d) GROUP BY tok
    ),
    big AS (SELECT t1, t2, COUNT(*) AS c_xy FROM pairs GROUP BY t1, t2),
    tot AS (SELECT (SELECT SUM(c) FROM uni) AS u,
                   (SELECT SUM(c_xy) FROM big) AS b),
    scored AS (
      SELECT t1, t2, c_xy AS pair_count,
             CAST(ROUND(LN(c_xy::DOUBLE) * 1e6) AS BIGINT)
             + 2 * CAST(ROUND(LN(u::DOUBLE) * 1e6) AS BIGINT)
             - CAST(ROUND(LN(b::DOUBLE) * 1e6) AS BIGINT)
             - CAST(ROUND(LN(x.c::DOUBLE) * 1e6) AS BIGINT)
             - CAST(ROUND(LN(y.c::DOUBLE) * 1e6) AS BIGINT) AS pmi_q
      FROM big JOIN uni x ON big.t1 = x.tok
               JOIN uni y ON big.t2 = y.tok, tot
      WHERE c_xy >= 5
    )
    SELECT t1, t2, pair_count, pmi_q
    FROM scored ORDER BY pmi_q DESC, t1, t2 LIMIT 50
    """,
)
def bigram_pmi_collocations(spark, sf_dir):
    """Top-50 collocations by PMI (operators/text.py:bigram_pmi) —
    multi-word-expression mining for tokenizer merge candidates.
    ln-of-count terms quantized to int64 at 1e-6 (the unigram_logprob
    trick) make the score and therefore the top-N cut engine-exact;
    the (pmi, t1, t2) sort key is unique so LIMIT is deterministic."""
    d = _t(spark, sf_dir, "documents")
    return X.bigram_pmi(d, min_count=5, top_n=50)


@register(
    "simhash_near_dup_pairs",
    sql=r"""
    -- full SimHash replica: md5-60-bit token hash, per-bit +-1 sums,
    -- bit-pack, 4x15-bit pigeonhole blocks, exact popcount verify
    WITH toks AS MATERIALIZED (
      SELECT doc_id,
             unnest(regexp_split_to_array(TRIM(text), '\s+')) AS tok
      FROM documents WHERE LENGTH(TRIM(text)) > 0
    ), th AS MATERIALIZED (
      SELECT doc_id, ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
      FROM toks
    ), sums AS MATERIALIZED (
      SELECT doc_id, r.j,
             SUM(CASE WHEN (h >> r.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM th, range(60) r(j)
      GROUP BY doc_id, r.j
    ), packed AS MATERIALIZED (
      SELECT doc_id,
             SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS h
      FROM sums GROUP BY doc_id
    ), nz AS MATERIALIZED (
      SELECT doc_id, h FROM packed WHERE h <> 0
    ), blocks AS MATERIALIZED (
      SELECT doc_id, h, r.i AS blk, (h >> (r.i * 15)) & 32767 AS blk_val
      FROM nz, range(4) r(i)
    ), cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
                      a.h AS h1, b.h AS h2
      FROM blocks a JOIN blocks b
        ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
    )
    SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(h1, h2)) <= 8
    """,
)
def simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs. The gate entry uses the ``md5_60`` token
    hash (first 15 md5 hex chars as a 60-bit long) so DuckDB can
    replicate the entire pipeline bit-for-bit; production keeps the
    default xxhash64 (same operator, ``token_hash='xxhash64'``).
    max_hamming=8 over 4 blocks is deliberately PARTIAL-recall LSH
    blocking (full recall holds only <= n_blocks-1 = 3; the operator
    logs the gap) — the oracle replicates the same 4x15-bit blocking,
    so the contract graded here is the blocking itself."""
    d = _t(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(
        d, "doc_id", "text", max_hamming=8, token_hash="md5_60"
    )


@register(
    "exact_substring_dup_pairs",
    sql="""
    WITH pos AS (
      SELECT doc_id, text,
             unnest(range(1, GREATEST(LENGTH(text) - 48 + 1, 0) + 1)) AS p
      FROM documents
    ),
    anchored AS (
      SELECT doc_id, substring(text, CAST(p AS INT), 48) AS w
      FROM pos
      WHERE (('0x' || substring(md5(substring(text, CAST(p AS INT), 8)),
                                1, 10))::BIGINT) % 16 = 0
    )
    SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
    FROM anchored a JOIN anchored b
      ON a.w = b.w AND a.doc_id < b.doc_id
    """,
)
def exact_substring_dup_pairs(spark, sf_dir):
    """Exact-substring near-dup pairs (operators/dedup.py:
    exact_substring_pairs): documents sharing a verbatim 48-char span,
    found via content-defined md5 anchors (offset-independent, so
    shared spans align without O(N^2) offset comparison) and an
    equi-join on the anchored window text — the relational form of
    suffix-array exact-substring dedup."""
    d = _t(spark, sf_dir, "documents")
    return D.exact_substring_pairs(
        d, id_col="doc_id", text_col="text", window=48, kgram=8, mod=16
    )


@register(
    "fuzzy_join_names",
    sql="""
    SELECT a.c_custkey AS id1, b.c_custkey AS id2
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def fuzzy_join_names(spark, sf_dir):
    """Exact edit-distance-1 fuzzy self-join (operators/dedup.py:
    fuzzy_join_dist1) — FastSS deletion-neighborhood blocking: the
    equi-join on single-deletion variants provably misses no true
    pair, and integer levenshtein verifies survivors. The oracle is
    the brute-force O(n^2) join, so the gate proves the blocked plan
    returns EXACTLY the quadratic answer at linear-ish cost."""
    c = _t(spark, sf_dir, "customer")
    return D.fuzzy_join_dist1(c, id_col="c_custkey", str_col="c_name")


@register(
    "ngram_jaccard_pairs",
    sql=r"""
    WITH t AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(TRIM(text), '\s+') END AS toks,
             CAST(FLOOR(LENGTH(text) / 32.0) AS BIGINT) AS lb,
             lower(substring(text, 1, 16)) AS pfx
      FROM documents
    ), ng AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct(
               CASE WHEN len(toks) < 3 THEN []::VARCHAR[]
                    ELSE [array_to_string(toks[i:i+2], ' ')
                          FOR i IN range(1, len(toks) - 1)] END)) AS g
      FROM t
    ), bsz AS MATERIALIZED (
      SELECT lb, pfx, COUNT(*) AS bn FROM t GROUP BY lb, pfx
    ), ts AS MATERIALIZED (
      SELECT t.doc_id, t.lb, t.pfx,
             t.doc_id % CAST(CEIL(b.bn / 64.0) AS BIGINT) AS salt
      FROM t JOIN bsz b ON t.lb = b.lb AND t.pfx = b.pfx
    ), cands AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM ts a JOIN ts b
        ON a.lb = b.lb AND a.pfx = b.pfx AND a.salt = b.salt
       AND a.doc_id < b.doc_id
    ), sizes AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS ng FROM ng GROUP BY doc_id
    ), inter AS MATERIALIZED (
      SELECT c.id1, c.id2, COUNT(*) AS n_inter
      FROM cands c
      JOIN ng r1 ON r1.doc_id = c.id1
      JOIN ng r2 ON r2.doc_id = c.id2 AND r2.g = r1.g
      GROUP BY c.id1, c.id2
    )
    SELECT i.id1, i.id2,
           ROUND(CAST(i.n_inter AS DOUBLE)
                 / (s1.ng + s2.ng - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes s1 ON s1.doc_id = i.id1
    JOIN sizes s2 ON s2.doc_id = i.id2
    WHERE ROUND(CAST(i.n_inter AS DOUBLE)
                / (s1.ng + s2.ng - i.n_inter), 6) >= 0.3
    """,
)
def ngram_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.3)


# ---------------------------------------------------------------------------
# similarity search (embeddings table)
# ---------------------------------------------------------------------------

_DIM = 64


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


@register(
    "embedding_cosine_topk",
    sql=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id, v FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             ROUND({_cosine_sql('q.v', 'e.v')}, 8) AS cosine_sim
      FROM q JOIN e ON q.vec_id <> e.vec_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC)
                AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def embedding_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = S.brute_force_topk_oracle(e, q, k=10)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


_LSH_TABLES, _LSH_PLANES = 4, 6
# the Spark side hashes with operators.similarity.table_buckets_udf;
# these literals come from the SAME plane_matrix / quantizer, and the
# arithmetic is integer so the signs agree bit-for-bit
_LSH_BUCKET_COLS = ",\n             ".join(
    f"{S.duckdb_bucket_sql('qv', _DIM, _LSH_PLANES, t * _LSH_PLANES)} AS b{t}"
    for t in range(_LSH_TABLES)
)
_LSH_COLLIDES = " OR ".join(f"q.b{t} = e.b{t}" for t in range(_LSH_TABLES))


@register(
    "ann_lsh_topk",
    sql=f"""
    WITH e0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {S.duckdb_quantize_sql('embedding::DOUBLE[]')} AS qv
      FROM embeddings
    ), e AS MATERIALIZED (
      SELECT vec_id, v,
             {_LSH_BUCKET_COLS}
      FROM e0
    ), q AS (SELECT * FROM e WHERE vec_id < 10),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             q.v AS qv, e.v AS cv
      FROM q JOIN e ON ({_LSH_COLLIDES}) AND q.vec_id <> e.vec_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             ROUND({_cosine_sql('qv', 'cv')}, 8) AS cosine_sim
      FROM cand
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC)
                AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """Multi-table LSH ANN (L=4 tables x P=6 planes; the union-of-tables
    candidate set re-ranked exactly — see operators/similarity.py
    lsh_ann_topk for the 100-TB shape and n_planes_for scaling rule)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = S.lsh_ann_topk(
        e, q, dim=_DIM, k=10, n_planes=_LSH_PLANES, n_tables=_LSH_TABLES
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register(
    "ann_ivf_topk",
    sql=f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cents AS MATERIALIZED (
      SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id % 53 = 1
    ), assigned AS MATERIALIZED (
      SELECT neighbor_id, v, cid FROM (
        SELECT e.vec_id AS neighbor_id, e.v, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND({_cosine_sql('e.v', 'c.cvec')}, 8) DESC,
                          c.cid ASC) AS r
        FROM e CROSS JOIN cents c
      ) WHERE r = 1
    ), probes AS MATERIALIZED (
      SELECT query_id, qv, cid FROM (
        SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY ROUND({_cosine_sql('e.v', 'c.cvec')}, 8) DESC,
                          c.cid ASC) AS r
        FROM e CROSS JOIN cents c WHERE e.vec_id < 10
      ) WHERE r <= 2
    ), scored AS (
      SELECT p.query_id, a.neighbor_id,
             ROUND({_cosine_sql('p.qv', 'a.v')}, 8) AS cosine_sim
      FROM probes p JOIN assigned a ON p.cid = a.cid
      WHERE p.query_id <> a.neighbor_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine_sim DESC, neighbor_id ASC)
                AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine_sim, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def ann_ivf_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    out = S.ivf_topk(e, q, k=10, centroid_mod=53, nprobe=2)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


_IVF_RECALL_NPROBE = 12


@register(
    "ann_recall_at10",
    sql=f"""
    WITH brute AS ({REGISTRY['embedding_cosine_topk']['sql']}),
    lsh AS ({REGISTRY['ann_lsh_topk']['sql']}),
    e2 AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cents2 AS MATERIALIZED (
      SELECT vec_id AS cid, v AS cvec FROM e2 WHERE vec_id % 53 = 1
    ), assigned2 AS MATERIALIZED (
      SELECT neighbor_id, v, cid FROM (
        SELECT e2.vec_id AS neighbor_id, e2.v, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e2.vec_id
                 ORDER BY ROUND({_cosine_sql('e2.v', 'c.cvec')}, 8) DESC,
                          c.cid ASC) AS r
        FROM e2 CROSS JOIN cents2 c
      ) WHERE r = 1
    ), probes2 AS MATERIALIZED (
      SELECT query_id, qv, cid FROM (
        SELECT e2.vec_id AS query_id, e2.v AS qv, c.cid,
               ROW_NUMBER() OVER (
                 PARTITION BY e2.vec_id
                 ORDER BY ROUND({_cosine_sql('e2.v', 'c.cvec')}, 8) DESC,
                          c.cid ASC) AS r
        FROM e2 CROSS JOIN cents2 c WHERE e2.vec_id < 10
      ) WHERE r <= {_IVF_RECALL_NPROBE}
    ), ivf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.query_id, a.neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY p.query_id
                 ORDER BY ROUND({_cosine_sql('p.qv', 'a.v')}, 8) DESC,
                          a.neighbor_id ASC) AS rank
        FROM probes2 p JOIN assigned2 a ON p.cid = a.cid
        WHERE p.query_id <> a.neighbor_id
      ) WHERE rank <= 10
    ), hits AS (
      SELECT 'ivf_nprobe{_IVF_RECALL_NPROBE}' AS method, b.query_id,
             COUNT(i.neighbor_id) AS n_hit
      FROM brute b LEFT JOIN ivf i
        ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
      GROUP BY 1, 2
      UNION ALL
      SELECT 'lsh_4x6', b.query_id, COUNT(l.neighbor_id)
      FROM brute b LEFT JOIN lsh l
        ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      GROUP BY 1, 2
    )
    SELECT method,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(SUM(n_hit) / (COUNT(*) * 10.0), 4) AS recall_at_10,
           CASE method WHEN 'ivf_nprobe{_IVF_RECALL_NPROBE}'
                THEN SUM(n_hit) >= 9 * COUNT(*)
                ELSE 2 * SUM(n_hit) >= 3 * COUNT(*) END AS meets_target
    FROM hits GROUP BY method
    """,
)
def ann_recall_at10(spark, sf_dir):
    """Recall@10 of the ANN indexes vs the exact brute-force baseline,
    as a driver-graded row per method — so retrieval QUALITY (not just
    plan validity) is tracked every round. IVF runs at its quality
    operating point (nprobe={12}) with a >=0.9 target; LSH is reported
    against a 0.15 smoke floor because sign-LSH on the weak-signal
    embeddings table cannot prune and recall at once — its >=0.9
    regime is planted near-duplicates, pinned by
    tests/test_ann_recall.py. Integer-exact target compares (no float
    threshold ties between engines)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    brute = S.brute_force_topk_oracle(e, q, k=10).select("query_id", "neighbor_id")
    lsh = S.lsh_ann_topk(
        e, q, dim=_DIM, k=10, n_planes=_LSH_PLANES, n_tables=_LSH_TABLES
    ).select("query_id", "neighbor_id")
    ivf = S.ivf_topk(
        e, q, k=10, centroid_mod=53, nprobe=_IVF_RECALL_NPROBE
    ).select("query_id", "neighbor_id")

    def hits(approx, method):
        a = approx.withColumn("__hit", F.lit(1))
        return (
            brute.join(a, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"))
            .select(F.lit(method).alias("method"), "query_id", "n_hit")
        )

    h = hits(ivf, f"ivf_nprobe{_IVF_RECALL_NPROBE}").unionByName(
        hits(lsh, "lsh_4x6")
    )
    return h.groupBy("method").agg(
        F.count("*").cast("bigint").alias("n_queries"),
        F.round(F.sum("n_hit") / (F.count("*") * F.lit(10.0)), 4).alias(
            "recall_at_10"
        ),
        F.when(
            F.col("method") == f"ivf_nprobe{_IVF_RECALL_NPROBE}",
            F.sum("n_hit") >= 9 * F.count("*"),
        )
        .otherwise(2 * F.sum("n_hit") >= 3 * F.count("*"))
        .alias("meets_target"),
    )


@register(
    "embedding_topk_exact_scalable",
    sql=f"""
    WITH e AS MATERIALIZED (
      SELECT vec_id, {S.duckdb_quantize_sql('embedding::DOUBLE[]')} AS qv
      FROM embeddings
    ), q AS (SELECT vec_id, qv FROM e WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.qv, e.qv)
             / (sqrt(list_dot_product(q.qv, q.qv))
                * sqrt(list_dot_product(e.qv, e.qv))) AS score
      FROM q JOIN e ON q.vec_id <> e.vec_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, neighbor_id ASC)
                AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(score, 8) AS cosine_sim,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def embedding_topk_exact_scal(spark, sf_dir):
    """Exact top-k WITHOUT the crossJoin: the linear-scan production
    path (operators/similarity.py exact_topk_scalable — broadcast
    query matrix, per-partition int64-matmul running top-k, only
    partitions x Q x k rows ever shuffle). The quantized-cosine order
    is the module's engine-exact contract; the DuckDB twin ranks by
    the same integer dots. brute_force_topk_oracle stays registered as the
    float recall oracle; this entry is the one you run at 100 TB."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return S.exact_topk_scalable(e, q, dim=_DIM, k=10)


@register(
    "embedding_near_dup_pairs",
    sql=f"""
    WITH e0 AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             {S.duckdb_quantize_sql('embedding::DOUBLE[]')} AS qv
      FROM embeddings
    ), e AS (
      SELECT vec_id, v,
             {S.duckdb_bucket_sql('qv', _DIM, 6)} AS bucket
      FROM e0
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND({_cosine_sql('a.v', 'b.v')}, 8) AS cosine_sim
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_cosine_sql('a.v', 'b.v')} >= 0.3
    """,
)
def embedding_near_dup(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(e, dim=_DIM, threshold=0.3, n_planes=6)


# ---------------------------------------------------------------------------
# multimodal plumbing (stubbed decode, real Spark plumbing)
# ---------------------------------------------------------------------------

@register(
    "multimodal_features",
    sql="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image'
                WHEN doc_id % 3 = 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    media = M.synthesize_media_from_documents(d)
    feats = M.extract_features(media, use_stub=True)
    return feats.select("media_id", "kind", "n_bytes", "content_hash")


@register(
    "multimodal_resize",
    sql="""
    WITH img AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 0
    ),
    grid AS (
      SELECT gx.X AS X, gy.Y AS Y, gdx.dx AS dx, gdy.dy AS dy
      FROM generate_series(0, 5) gx(X), generate_series(0, 7) gy(Y),
           generate_series(0, 4) gdx(dx), generate_series(0, 3) gdy(dy)
    )
    SELECT media_id, CAST(X AS INT) AS px_x, CAST(Y AS INT) AS px_y,
           CAST(SUM((media_id*31 + (4*Y+dy)*7 + (5*X+dx)*3     ) % 256)
                // 20 AS INT) AS r,
           CAST(SUM((media_id*31 + (4*Y+dy)*7 + (5*X+dx)*3 + 11) % 256)
                // 20 AS INT) AS g,
           CAST(SUM((media_id*31 + (4*Y+dy)*7 + (5*X+dx)*3 + 22) % 256)
                // 20 AS INT) AS b
    FROM img, grid
    GROUP BY media_id, X, Y
    """,
)
def multimodal_resize(spark, sf_dir):
    """REAL image decode + resize kernel (not a stub): encode a
    deterministic 30x32 RGB image per image-doc (even ids as binary
    PPM P6, odd as uncompressed 24-bit BMP — two real in-repo
    parsers), decode the bytes back, box-filter downscale to 6x8,
    and emit one row per output pixel. The oracle recomputes every
    pixel's integer block mean from the generating formula, so the
    whole parse -> resample path is verified per pixel."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    media = M.synthesize_images(d)
    return M.decode_box_resize_pixels(media, out_w=6, out_h=8)


@register(
    "multimodal_ahash_dedup_pairs",
    sql="""
    WITH img AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 0
    ),
    grid AS (
      SELECT gx.X AS X, gy.Y AS Y, gdx.dx AS dx, gdy.dy AS dy
      FROM generate_series(0, 5) gx(X), generate_series(0, 7) gy(Y),
           generate_series(0, 4) gdx(dx), generate_series(0, 3) gdy(dy)
    ),
    px AS (
      SELECT media_id, X, Y,
             CAST(SUM((media_id*31 + (4*Y+dy)*7 + (5*X+dx)*3     ) % 256)
                  // 20 AS INT) AS r,
             CAST(SUM((media_id*31 + (4*Y+dy)*7 + (5*X+dx)*3 + 11) % 256)
                  // 20 AS INT) AS g,
             CAST(SUM((media_id*31 + (4*Y+dy)*7 + (5*X+dx)*3 + 22) % 256)
                  // 20 AS INT) AS b
      FROM img, grid GROUP BY media_id, X, Y
    ),
    g2 AS (SELECT media_id, X, Y, (r+g+b) AS gray FROM px),
    tot AS (SELECT media_id, CAST(SUM(gray) AS BIGINT) AS total
            FROM g2 GROUP BY media_id),
    h AS (
      SELECT g2.media_id,
             CAST(SUM(CASE WHEN g2.gray*48 > t.total
                           THEN (1::BIGINT << CAST(g2.Y*6+g2.X AS INT))
                           ELSE 0 END) AS BIGINT) AS ah
      FROM g2 JOIN tot t ON g2.media_id = t.media_id
      GROUP BY g2.media_id
    )
    SELECT a.media_id AS id1, b.media_id AS id2,
           CAST(bit_count(xor(a.ah, b.ah)) AS INT) AS hamming
    FROM h a JOIN h b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.ah, b.ah)) <= 3
    """,
)
def multimodal_ahash_dedup_pairs(spark, sf_dir):
    """Perceptual image dedup (operators/multimodal.py:
    ahash_near_dup_pairs): REAL PPM/BMP decode -> box resize ->
    integer average-hash bits -> pigeonhole-blocked Hamming join. The
    oracle recomputes every pixel from the image-generating formula
    and does the brute-force O(n^2) Hamming join, so the blocked plan
    is checked to return exactly the quadratic answer through the
    actual byte-decode path."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    media = M.synthesize_images(d)
    return M.ahash_near_dup_pairs(media, out_w=6, out_h=8, max_hamming=3)


@register(
    "multimodal_resize_stub_contract",
    sql="""
    WITH media AS (
      SELECT doc_id AS media_id, encode(text) AS payload
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT media_id, 'image' AS kind,
           CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           CAST(CASE WHEN octet_length(payload) >= 4096 THEN 4096
                     WHEN octet_length(payload) = 0 THEN 0
                     ELSE 4096 END AS BIGINT) AS n_bytes,
           md5(substring(CASE WHEN octet_length(payload) >= 4096
                              THEN hex(payload)
                              ELSE hex(repeat(payload,
                                     CAST(ceil(4096.0 / octet_length(payload))
                                          AS INT))) END,
                         1, 8192)) AS payload_hash
    FROM media
    """,
)
def multimodal_resize_stub_contract(spark, sf_dir):
    """Arrow-batched resize plumbing for formats whose codecs are NOT
    in this container (stub kernel: deterministic truncate/cycle to
    64x64 bytes); the oracle reproduces the stub's byte transform,
    proving batch shape + payload handling byte-exact."""
    d = _t(spark, sf_dir, "documents")
    media = M.synthesize_media_from_documents(d)
    out = M.resize_stub(media, 64, 64)
    return out.select(
        "media_id",
        "kind",
        "width",
        "height",
        "n_bytes",
        # both engines' hex() emit uppercase
        F.md5(F.hex("payload")).alias("payload_hash"),
    )


@register(
    "verb_identity_pk",
    sql="""
    SELECT n_nationkey, n_name, n_regionkey, TRUE AS pk_dense
    FROM nation
    """,
)
def verb_identity_pk(spark, sf_dir):
    """Auto-identity `_pk INT IDENTITY(1,1)` (reference create.py:144-145):
    the concrete values depend on partition layout, so the gradable
    contract is the identity INVARIANT — the assigned set is exactly
    the dense sequence {1..n} (distinct == n, min == 1, max == n) —
    attached as a constant boolean to every business row."""
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation")
    eng.create.table_from_dataframe("dbo.nation_id", nation, sql_primary_key=True)
    eng.write.insert("dbo.nation_id", nation)
    out = eng.read.table("dbo.nation_id")
    stats = out.agg(
        F.count("*").alias("n"),
        F.count_distinct("_pk").alias("d"),
        F.min("_pk").alias("mn"),
        F.max("_pk").alias("mx"),
    ).select(
        (
            (F.col("d") == F.col("n"))
            & (F.col("mn") == 1)
            & (F.col("mx") == F.col("n"))
        ).alias("pk_dense")
    )
    return out.drop("_pk").crossJoin(F.broadcast(stats))


@register(
    "multimodal_frame_sample",
    sql="""
    WITH media AS (
      SELECT doc_id AS media_id, ((doc_id % 10) + 1) * 1000 AS duration_ms
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT media_id, CAST(unnest(range(0, duration_ms + 1, 500)) AS BIGINT)
             AS frame_ts_ms
    FROM media
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling fan-out: one row per planned frame — the
    distributed half of a frame-decode pipeline (decode itself stubbed,
    see operators.multimodal)."""
    d = _t(spark, sf_dir, "documents")
    media = M.synthesize_media_from_documents(d).withColumn(
        "duration_ms", ((F.col("media_id") % 10) + 1).cast("long") * 1000
    )
    out = M.frame_sample_plan(media, every_ms=500)
    return out.select("media_id", F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms"))


@register(
    "math_conditional_functions",
    sql="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_discount - 0.05), 6) AS disc_dev,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
           ROUND(POW(1 + l_tax, 2), 6) AS tax_sq,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_bucket,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate,
           COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag_or_none,
           CASE WHEN l_quantity > 40 THEN 'bulk'
                WHEN l_quantity > 20 THEN 'mid' ELSE 'small' END AS qty_class
    FROM lineitem WHERE l_orderkey % 100 = 0
    """,
)
def math_conditional(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_bucket"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("NONE")).alias(
            "flag_or_none"
        ),
        F.when(F.col("l_quantity") > 40, "bulk")
        .when(F.col("l_quantity") > 20, "mid")
        .otherwise("small")
        .alias("qty_class"),
    )


@register(
    "array_agg_functions",
    sql="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
             AS statuses,
           CAST(len(list_sort(list(DISTINCT o_orderstatus))) AS INT)
             AS n_statuses,
           list_contains(list(DISTINCT o_orderstatus), 'P') AS has_pending
    FROM orders GROUP BY o_orderpriority
    """,
)
def array_agg(spark, sf_dir):
    """collect_set / sort_array / array_contains; the array renders as
    a joined string so the gate's value-hash sees a scalar column
    (array cells hash engine-specifically)."""
    o = _t(spark, sf_dir, "orders")
    statuses = F.sort_array(F.collect_set("o_orderstatus"))
    return o.groupBy("o_orderpriority").agg(
        F.array_join(statuses, ",").alias("statuses"),
        F.size(statuses).cast("int").alias("n_statuses"),
        F.array_contains(F.collect_set("o_orderstatus"), "P").alias("has_pending"),
    )


# ---------------------------------------------------------------------------
# streaming (events table, availableNow replay -> memory sink)
# ---------------------------------------------------------------------------

@register(
    "streaming_tumbling_counts",
    sql="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_epoch,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling(spark, sf_dir):
    from .streaming import events as STR

    out = STR.tumbling_window_counts(spark, sf_dir, "1 hour")
    return out.select(
        F.unix_timestamp("window_start").cast("bigint").alias("window_epoch"),
        "event_type",
        "n_events",
        "sum_value",
    )


@register(
    "streaming_sliding_counts",
    sql="""
    WITH h AS (SELECT date_trunc('hour', ts) AS h0 FROM events),
    w AS (
      SELECT h0 AS wstart FROM h
      UNION ALL
      SELECT h0 - INTERVAL 1 HOUR FROM h
    )
    SELECT CAST(epoch(wstart) AS BIGINT) AS window_epoch,
           COUNT(*) AS n_events
    FROM w GROUP BY 1
    """,
)
def streaming_sliding(spark, sf_dir):
    """Sliding windows (2h window / 1h slide): every event lands in two
    windows. Oracle mirrors the assignment arithmetic directly."""
    from .streaming import events as STR

    out = STR.sliding_window_rates(spark, sf_dir, "2 hours", "1 hour")
    return out.select(
        F.unix_timestamp("window_start").cast("bigint").alias("window_epoch"),
        "n_events",
    )


@register(
    "streaming_append_out_of_order",
    sql="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS w FROM events),
    c AS (
      SELECT date_trunc('hour', ts) AS ws, COUNT(*) AS n_events
      FROM events GROUP BY 1
    )
    SELECT CAST(epoch(ws) AS BIGINT) AS window_epoch, n_events
    FROM c, wm WHERE ws + INTERVAL 1 HOUR <= wm.w
    """,
)
def streaming_append_out_of_order(spark, sf_dir):
    """Out-of-order two-batch replay through append-mode watermarked
    windows; emitted = exactly the windows finalized by the terminal
    watermark (see streaming.events.append_mode_out_of_order_replay)."""
    from .streaming import events as STR

    out = STR.append_mode_out_of_order_replay(spark, sf_dir)
    return out.select(
        F.unix_timestamp("window_start").cast("bigint").alias("window_epoch"),
        "n_events",
    )


@register(
    "streaming_foreach_batch_upsert",
    sql="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def streaming_foreach_batch_upsert(spark, sf_dir):
    """Micro-batch replay merged into a COW store table via
    foreachBatch + the merge verb; the final table state equals the
    batch GROUP BY regardless of batch boundaries (decimal
    accumulation)."""
    from .streaming import events as STR

    out = STR.foreach_batch_upsert(spark, sf_dir, _scratch_engine(spark))
    return out.select(
        "user_id",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@register(
    "streaming_stateful_ewma",
    sql="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(list_reduce(
                  list(CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ORDER BY ts, event_id),
                  (acc, x) -> (13 * x + 87 * acc) // 100
                ) AS BIGINT) AS ewma_cents
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_ewma(spark, sf_dir):
    """Streaming EWMA (streaming/events.py stateful_ewma): the same
    int64 recurrence as the batch fold, carried as explicit per-user
    state across time-ordered micro-batches — the drained final state
    is BIT-IDENTICAL to the batch answer, so one oracle grades both
    the batch and streaming forms. This is the backfill/live pairing a
    feature store needs: identical numbers whichever path computed
    them."""
    from .streaming import events as STR

    return STR.stateful_ewma(spark, sf_dir)


@register(
    "streaming_ingest_dedup_store",
    sql="""
    WITH off AS (
      -- mirror offset: past the real id range (collision-proof at any
      -- corpus size), bumped off multiples of 3 so the copy lands in a
      -- different batch class — same arithmetic as the engine
      SELECT CASE WHEN (MAX(doc_id) + 1) % 3 = 0 THEN MAX(doc_id) + 2
             ELSE MAX(doc_id) + 1 END AS o
      FROM documents WHERE text IS NOT NULL
    ), raw AS (
      SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      UNION ALL
      SELECT doc_id + (SELECT o FROM off), text
      FROM documents WHERE text IS NOT NULL
    ), d AS (
      SELECT doc_id, text, md5(text) AS fp, doc_id % 3 AS b FROM raw
    ), firstb AS (
      SELECT fp, MIN(b) AS mb FROM d GROUP BY fp
    ), surv AS (
      SELECT d.fp, MIN(d.doc_id) AS doc_id
      FROM d JOIN firstb f ON d.fp = f.fp AND d.b = f.mb
      GROUP BY d.fp
    )
    SELECT s.doc_id, s.fp AS fingerprint,
           CAST(LENGTH(dd.text) AS BIGINT) AS n_chars
    FROM surv s JOIN d dd ON dd.doc_id = s.doc_id
    """,
)
def streaming_ingest_dedup_store(spark, sf_dir):
    """Streaming corpus ingestion with exact dedup against the
    accumulated store (streaming/events.py
    streaming_corpus_ingest_dedup): per micro-batch, one winner per
    content fingerprint, keys-only anti join against the store's
    fingerprints, insert of only the novel documents. The oracle
    states the deterministic replay's survivors exactly: the first
    batch containing a fingerprint wins, min doc_id within it — the
    cross-batch dependence is the part plain batch dedup entries
    don't exercise."""
    from .streaming import events as STR

    return STR.streaming_corpus_ingest_dedup(
        spark, sf_dir, _scratch_engine(spark)
    )


@register(
    "streaming_dedup_exact",
    sql="""
    SELECT event_type, COUNT(*) AS n_unique
    FROM (
      SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
      FROM events
    )
    GROUP BY event_type
    """,
)
def streaming_dedup_exact(spark, sf_dir):
    """Streaming dedup via dropDuplicatesWithinWatermark (bounded
    state), counted per event_type batch-side; the oracle is a global
    DISTINCT, which the within-watermark semantics equal here because
    same-hour duplicates are necessarily <1 h apart."""
    from .streaming import events as STR

    out = STR.streaming_dedup(spark, sf_dir)
    return out.groupBy("event_type").agg(F.count("*").alias("n_unique"))


@register(
    "streaming_session_windows",
    sql="""
    -- batch gaps-and-islands equivalent of gap-based session windows:
    -- a session breaks where the gap to the previous event is >= 30min
    -- (session_window's end bound last_ts + gap is exclusive).
    -- ts is truncated to microseconds first, matching the engine's
    -- nanos->micros floor conversion.
    WITH e AS (
        SELECT user_id, make_timestamp(epoch_us(ts)) AS ts FROM events
    ),
    ordered AS (
        SELECT user_id, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM ordered
    )
    SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_epoch_us,
           user_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def streaming_sessions(spark, sf_dir):
    """Gap-based session windows (built-in session_window, stateful
    streaming agg). The batch oracle is the classic gaps-and-islands
    rewrite — a new session starts where the gap >= 30 minutes."""
    from .streaming import events as STR

    out = STR.session_window_stats(spark, sf_dir, "30 minutes")
    return out.select(
        F.unix_micros(F.col("session_start")).alias("session_epoch_us"),
        "user_id",
        "n_events",
    )


@register(
    "streaming_stream_stream_join",
    sql="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               make_timestamp(epoch_us(ts)) AS ts
        FROM events
    )
    SELECT v.user_id,
           v.event_id AS view_id, c.event_id AS click_id,
           CAST(epoch_us(v.ts) AS BIGINT) AS view_epoch_us,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_epoch_us
    FROM e v JOIN e c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
    """,
)
def streaming_stream_stream_join(spark, sf_dir):
    """Stream-stream inner interval join with watermarks on both sides
    (streaming/events.py:stream_stream_interval_join): the attribution
    shape — each view joined to same-user clicks within 6 h after it.
    The two-sided time bound lets Spark evict join state past the
    watermark (bounded state at 100 TB); inner joins are
    batch-equivalent once drained, which is what the oracle replays."""
    from .streaming import events as STR

    out = STR.stream_stream_interval_join(spark, sf_dir, "6 hours")
    return out.select(
        "user_id",
        "view_id",
        "click_id",
        F.unix_micros(F.col("view_ts")).alias("view_epoch_us"),
        F.unix_micros(F.col("click_ts")).alias("click_epoch_us"),
    )


@register(
    "streaming_stream_stream_left_join",
    sql="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               make_timestamp(epoch_us(ts)) AS ts
        FROM events
    ),
    v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
          FROM e WHERE event_type = 'view'),
    c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
          FROM e WHERE event_type = 'click')
    SELECT v.user_id, v.view_id, c.click_id,
           CAST(epoch_us(v.view_ts) AS BIGINT) AS view_epoch_us,
           CAST(epoch_us(c.click_ts) AS BIGINT) AS click_epoch_us
    FROM v LEFT JOIN c
      ON v.user_id = c.user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts <= v.view_ts + INTERVAL 6 HOUR
    """,
)
def streaming_stream_stream_left_join(spark, sf_dir):
    """Watermarked stream-stream LEFT OUTER interval join (streaming/
    events.py:stream_stream_left_join): unmatched views null-extend
    only once the watermark proves their join window closed — a
    far-future sentinel batch in the staged replay sweeps the
    watermark past every real row, so the drained stream equals the
    batch left join the oracle runs. This is the semantics the inner
    join cannot show: the watermark is load-bearing for emission, not
    just for eviction."""
    from .streaming import events as STR

    out = STR.stream_stream_left_join(spark, sf_dir, "6 hours")
    return out.select(
        "user_id", "view_id", "click_id",
        F.unix_micros(F.col("view_ts")).alias("view_epoch_us"),
        F.unix_micros(F.col("click_ts")).alias("click_epoch_us"),
    )


@register(
    "streaming_stateful_user_stats",
    sql="""
    SELECT user_id, COUNT(*) AS n_events,
           MAX(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def streaming_stateful(spark, sf_dir):
    """applyInPandasWithState custom stateful operator; its final state
    must equal the batch groupBy — which is exactly the oracle."""
    from .streaming import events as STR

    return STR.stateful_user_stats(spark, sf_dir)


# ---------------------------------------------------------------------------
# engine verb pipelines (create/insert/read/update/merge on the COW store)
# ---------------------------------------------------------------------------

def _scratch_engine(spark) -> SparkEngine:
    root = os.path.join(_SCRATCH, uuid.uuid4().hex)
    return SparkEngine(spark=spark, store_root=root)


@register(
    "verb_insert_read",
    sql="""
    SELECT * FROM part
    WHERE p_size >= 25 AND p_retailprice < 1500
    ORDER BY p_partkey ASC
    LIMIT 100
    """,
)
def verb_insert_read(spark, sf_dir):
    eng = _scratch_engine(spark)
    part = _t(spark, sf_dir, "part")
    eng.create.table_from_dataframe("dbo.part_copy", part, primary_key="p_partkey")
    eng.write.insert("dbo.part_copy", part)
    return eng.read.table(
        "dbo.part_copy",
        where="p_size >= 25 AND p_retailprice < 1500",
        order_column="p_partkey",
        order_direction="ASC",
        limit=100,
    )


@register(
    "verb_update",
    sql="""
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000.0
                ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_custkey % 10 = 0 THEN 'UPDATED'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    """,
)
def verb_update(spark, sf_dir):
    eng = _scratch_engine(spark)
    cust = _t(spark, sf_dir, "customer")
    eng.create.table_from_dataframe("dbo.cust_copy", cust, primary_key="c_custkey")
    eng.write.insert("dbo.cust_copy", cust)
    updates = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    eng.write.update("dbo.cust_copy", updates)
    return eng.read.table("dbo.cust_copy").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@register(
    "verb_merge_upsert",
    sql="""
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 2 = 0 THEN 'M' ELSE o_orderstatus END
             AS o_orderstatus,
           CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1.0
                ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 4 != 0
    UNION ALL
    SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
           o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 2 = 0
    """,
)
def verb_merge_upsert(spark, sf_dir):
    eng = _scratch_engine(spark)
    orders = _t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 4 != 0)
    eng.create.table_from_dataframe("dbo.orders_m", target, primary_key="o_orderkey")
    eng.write.insert("dbo.orders_m", target)
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("M").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    eng.write.merge("dbo.orders_m", source, upsert=True)
    return eng.read.table("dbo.orders_m")


@register(
    "verb_merge_delete",
    sql="""
    SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
           o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 0
    """,
)
def verb_merge_delete(spark, sf_dir):
    eng = _scratch_engine(spark)
    orders = _t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 4 != 0)
    eng.create.table_from_dataframe("dbo.orders_d", target, primary_key="o_orderkey")
    eng.write.insert("dbo.orders_d", target)
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("M").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    eng.write.merge("dbo.orders_d", source)
    return eng.read.table("dbo.orders_d")


@register(
    "verb_merge_delete_requires",
    sql="""
    -- matched + inserted: every source row (urgent/high, even keys)
    SELECT o_orderkey, o_custkey, 'M' AS o_orderstatus,
           o_totalprice + 1.0 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey % 2 = 0 AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    UNION ALL
    -- kept target rows: priorities outside the source's partitions
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           o_orderpriority
    FROM orders
    WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      AND NOT (o_orderkey % 2 = 0 AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
    """,
)
def verb_merge_delete_requires(spark, sf_dir):
    eng = _scratch_engine(spark)
    orders = _t(spark, sf_dir, "orders")
    eng.create.table_from_dataframe("dbo.orders_dr", orders, primary_key="o_orderkey")
    eng.write.insert("dbo.orders_dr", orders)
    source = (
        orders.filter(
            (F.col("o_orderkey") % 2 == 0)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.lit("M").alias("o_orderstatus"),
            (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
            "o_orderdate",
            "o_orderpriority",
        )
    )
    eng.write.merge("dbo.orders_dr", source, delete_requires=["o_orderpriority"])
    return eng.read.table("dbo.orders_dr")


@register(
    "verb_modify_schema",
    sql="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(NULL AS BIGINT) AS extra
    FROM nation
    """,
)
def verb_modify_schema(spark, sf_dir):
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation")
    eng.create.table_from_dataframe("dbo.nation_copy", nation, primary_key="n_nationkey")
    eng.write.insert("dbo.nation_copy", nation)
    eng.modify.column("dbo.nation_copy", "add", "extra", "int")
    eng.modify.column("dbo.nation_copy", "alter", "extra", "bigint")
    eng.modify.column("dbo.nation_copy", "add", "extra2", "varchar(10)")
    eng.modify.column("dbo.nation_copy", "drop", "extra2")
    return eng.read.table("dbo.nation_copy")


@register(
    "verb_primary_key_audit",
    sql="""
    SELECT n_nationkey, n_name,
           TRUE AS pk_added, TRUE AS dup_add_rejected, TRUE AS pk_dropped
    FROM nation
    """,
)
def verb_primary_key_audit(spark, sf_dir):
    """`modify.primary_key` add/drop with the uniqueness audit
    (reference modify.py:141-228): adding a PK on a unique column
    succeeds, adding one on a column with duplicate values must be
    rejected by the single-pass distributed audit, and drop clears the
    metadata. The oracle row carries the three observed outcomes as
    boolean columns so the behavioral contract itself is hash-checked.
    """
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation")
    eng.create.table_from_dataframe("dbo.nation_pk", nation)
    eng.write.insert("dbo.nation_pk", nation)
    eng.modify.primary_key(
        "dbo.nation_pk", "add", "n_nationkey", primary_key_name="pk_nation"
    )
    pk_added = eng.store.meta("dbo.nation_pk").primary_key == ["n_nationkey"]
    # n_regionkey has 5 nations per region: the audit must reject it
    dup_rejected = False
    eng.modify.primary_key("dbo.nation_pk", "drop")
    try:
        eng.modify.primary_key("dbo.nation_pk", "add", "n_regionkey")
    except ValueError:
        dup_rejected = True
    pk_dropped = eng.store.meta("dbo.nation_pk").primary_key == []
    return eng.read.table("dbo.nation_pk").select(
        "n_nationkey",
        "n_name",
        F.lit(bool(pk_added)).alias("pk_added"),
        F.lit(bool(dup_rejected)).alias("dup_add_rejected"),
        F.lit(bool(pk_dropped)).alias("pk_dropped"),
    )


@register(
    "verb_optimize_compact",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           TRUE AS compacted, TRUE AS key_clustered
    FROM orders WHERE o_orderkey <= 5000
    """,
)
def verb_optimize_compact(spark, sf_dir):
    """Small-file compaction (Delta OPTIMIZE analog): many tiny appends
    -> one optimize() -> fewer, PK-range-clustered files with content
    bit-identical (the oracle checks the content; the booleans pin the
    observed file-count drop and the per-file disjoint-range property
    that makes later pruned merges skip precisely)."""
    eng = _scratch_engine(spark)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 5000
    ).select("o_orderkey", "o_custkey", "o_totalprice")
    eng.create.table(
        "dbo.orders_opt",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "o_totalprice": "float"},
        primary_key_column="o_orderkey",
    )
    # 5 separate appends -> >= 5 small files
    for i in range(5):
        eng.write.insert(
            "dbo.orders_opt", orders.filter(F.col("o_orderkey") % 5 == i)
        )
    before, after = eng.optimize("dbo.orders_opt")
    meta = eng.store.meta("dbo.orders_opt")
    ents = eng.store.manifest("dbo.orders_opt", meta.version)
    spans = sorted((e["min"], e["max"]) for e in ents if e["min"] is not None)
    disjoint = all(
        spans[i][1] < spans[i + 1][0] for i in range(len(spans) - 1)
    )
    return eng.read.table("dbo.orders_opt").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lit(bool(after < before)).alias("compacted"),
        F.lit(bool(disjoint and len(spans) == len(ents))).alias("key_clustered"),
    )


@register(
    "verb_read_values_sql",
    sql="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def verb_read_values_sql(spark, sf_dir):
    """`read_values` arbitrary-SQL path (reference conversion.py:902-952
    — execute a statement, get a typed frame back): the store table is
    exposed as a temp view via ``register_view`` and queried with
    ``spark.sql`` — the Spark realization of running arbitrary SQL
    against engine-managed tables.
    """
    eng = _scratch_engine(spark)
    orders = _t(spark, sf_dir, "orders")
    eng.create.table_from_dataframe(
        "dbo.orders_rv", orders, primary_key="o_orderkey"
    )
    eng.write.insert("dbo.orders_rv", orders)
    view = eng.register_view("dbo.orders_rv", f"orders_rv_{uuid.uuid4().hex[:8]}")
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_price
        FROM {view}
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        """
    )


@register(
    "verb_merge_identity",
    sql="""
    -- matched rows updated in place; new rows (key+100) inserted
    SELECT n_nationkey,
           CASE WHEN n_nationkey % 2 = 0 THEN 'MERGED' ELSE n_name END
             AS n_name,
           n_regionkey
    FROM nation
    UNION ALL
    SELECT n_nationkey + 100 AS n_nationkey, 'NEW' AS n_name, n_regionkey
    FROM nation WHERE n_nationkey < 5
    """,
)
def verb_merge_identity(spark, sf_dir):
    """Merge into an identity-PK table (`_pk INT IDENTITY`, reference
    create.py:144-145 + merge.py): matched source rows must UPDATE the
    existing target rows (keeping their _pk) and only genuinely-new
    match keys INSERT with fresh identities. Identity values are
    partition-order-dependent, so the oracle checks the business
    columns; the _pk set property is pinned in tests/test_core_verbs.py.
    """
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation")
    eng.create.table_from_dataframe(
        "dbo.nation_mi", nation, sql_primary_key=True
    )
    eng.write.insert("dbo.nation_mi", nation)
    updates = nation.filter(F.col("n_nationkey") % 2 == 0).select(
        "n_nationkey", F.lit("MERGED").alias("n_name"), "n_regionkey"
    )
    inserts = nation.filter(F.col("n_nationkey") < 5).select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.lit("NEW").alias("n_name"), "n_regionkey",
    )
    eng.write.merge(
        "dbo.nation_mi",
        updates.unionByName(inserts),
        match_columns=["n_nationkey"],
        upsert=True,
    )
    return eng.read.table("dbo.nation_mi").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


@register(
    "verb_schema_validate_convert",
    sql="""
    SELECT p_partkey,
           CAST(p_name AS VARCHAR) AS p_name,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE)
             AS p_retailprice,
           CAST(p_size AS SMALLINT) AS p_size
    FROM part WHERE p_partkey % 7 = 0
    """,
)
def verb_schema_validate_convert(spark, sf_dir):
    """`get_schema(dataframe=...)` validate+convert path (reference
    conversion.py:38-162, `dataframe` param at :41): the candidate
    frame is checked against the table's declared SQL types and
    returned converted — here doubles land as DECIMAL(12,2) and ints
    as SMALLINT exactly as the declared schema dictates."""
    eng = _scratch_engine(spark)
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0)
    eng.create.table(
        "dbo.part_typed",
        {
            "p_partkey": "bigint",
            "p_name": "nvarchar(100)",
            "p_retailprice": "decimal(12,2)",
            "p_size": "smallint",
        },
        primary_key_column="p_partkey",
    )
    candidate = part.select("p_partkey", "p_name", "p_retailprice", "p_size")
    _schema, converted = eng.get_schema("dbo.part_typed", dataframe=candidate)
    # decimal -> double for the hash compare only (pandas Decimal repr
    # vs DuckDB float would hash-mismatch); the decimal conversion
    # itself is pinned in tests/test_core_verbs.py
    return converted.withColumn(
        "p_retailprice", F.col("p_retailprice").cast("double")
    )


@register(
    "verb_datetimeoffset_roundtrip",
    sql="""
    WITH src AS (
        SELECT o_orderkey AS id,
               strftime(o_orderdate, '%Y-%m-%d') || ' '
                 || lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0')
                 || ':15:30' AS local_str,
               CASE o_orderkey % 4
                    WHEN 0 THEN '+05:30' WHEN 1 THEN '-08:00'
                    WHEN 2 THEN ''       ELSE '+09:45' END AS off
        FROM orders WHERE o_orderkey % 50 = 0
    )
    SELECT id,
           epoch_us(CAST(
               local_str || (CASE WHEN off = '' THEN '+00:00' ELSE off END)
               AS TIMESTAMPTZ)) AS epoch_us,
           CAST(CASE WHEN off = '' THEN 0
                ELSE (CASE WHEN substr(off,1,1)='-' THEN -1 ELSE 1 END)
                     * (CAST(substr(off,2,2) AS INT)*60
                        + CAST(substr(off,5,2) AS INT)) END
                AS SMALLINT) AS tz_minutes,
           local_str || '.0000000 '
             || (CASE WHEN off = '' THEN '+00:00' ELSE off END) AS rendered
    FROM src
    """,
)
def verb_datetimeoffset_roundtrip(spark, sf_dir):
    """datetimeoffset through the full verb pipeline: string literals
    with mixed UTC offsets are inserted into a declared datetimeoffset
    column; the engine stores the absolute instant (TimestampType, so
    filters/joins compare correctly) plus the original offset in the
    managed ``__tz`` companion (reference conversion.py:528-588
    preserves the offset end-to-end; SURVEY §2.4 #28 "optional offset
    column"). The oracle recomputes instant/offset/render from the same
    literals with DuckDB string+TIMESTAMPTZ arithmetic — the parse is
    offset-explicit, so it is session-timezone independent."""
    eng = _scratch_engine(spark)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    off = (
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("+05:30"))
        .when(F.col("o_orderkey") % 4 == 1, F.lit("-08:00"))
        .when(F.col("o_orderkey") % 4 == 2, F.lit(""))
        .otherwise(F.lit("+09:45"))
    )
    src = orders.select(
        F.col("o_orderkey").alias("id"),
        F.concat(
            F.date_format("o_orderdate", "yyyy-MM-dd"), F.lit(" "),
            F.lpad((F.col("o_orderkey") % 24).cast("string"), 2, "0"),
            F.lit(":15:30"), off,
        ).alias("ts"),
    )
    eng.create.table(
        "dbo.dto_rt", {"id": "bigint", "ts": "datetimeoffset"},
        primary_key_column="id",
    )
    eng.write.insert("dbo.dto_rt", src)
    stored = eng.read.table("dbo.dto_rt", include_tz_offsets=True)
    return stored.select(
        "id",
        F.unix_micros(F.col("ts")).alias("epoch_us"),
        F.col("ts__tz").alias("tz_minutes"),
        DTO.render(F.col("ts"), F.col("ts__tz")).alias("rendered"),
    )


@register(
    "time_render_contract",
    sql="""
    SELECT l_orderkey, l_linenumber,
           lpad(CAST(us // 3600000000 AS VARCHAR), 2, '0') || ':'
           || lpad(CAST((us // 60000000) % 60 AS VARCHAR), 2, '0') || ':'
           || lpad(CAST((us // 1000000) % 60 AS VARCHAR), 2, '0') || '.'
           || lpad(CAST(us % 1000000 AS VARCHAR), 6, '0') || '0'
             AS time_str
    FROM (
        SELECT l_orderkey, l_linenumber,
               (l_orderkey % 86400) * 1000000 + (l_partkey % 1000000) AS us
        FROM lineitem WHERE l_orderkey % 100 = 0
    )
    """,
)
def time_render_contract(spark, sf_dir):
    """TIME render contract (reference conversion.py:399-445): 7-digit
    fraction ``HH:MM:SS.fffffff``. The engine's time type is
    DayTimeIntervalType(HOUR, SECOND) — µs precision, so every value
    sits on SQL Server's 100 ns grid and the 7th digit renders 0
    (documented divergence: core/timetype.py). The oracle rebuilds the
    same string from integer µs."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    us = (
        (F.col("l_orderkey") % 86400) * F.lit(1_000_000)
        + F.col("l_partkey") % 1_000_000
    )
    interval = (
        F.timestamp_micros(us) - F.timestamp_micros(F.lit(0))
    ).cast(
        T.DayTimeIntervalType(
            T.DayTimeIntervalType.HOUR, T.DayTimeIntervalType.SECOND
        )
    )
    return l.select(
        "l_orderkey", "l_linenumber",
        TT.render(interval).alias("time_str"),
    )


@register(
    "verb_read_where_grammar",
    sql="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM customer
    WHERE (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY')
      AND c_acctbal > 1000 AND c_name IS NOT NULL
    """,
)
def verb_read_where_grammar(spark, sf_dir):
    eng = _scratch_engine(spark)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    eng.create.table_from_dataframe("dbo.cust_w", cust, primary_key="c_custkey")
    eng.write.insert("dbo.cust_w", cust)
    return eng.read.table(
        "dbo.cust_w",
        where="(c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY') "
        "AND c_acctbal > 1000 AND c_name IS NOT NULL",
    )


# ---------------------------------------------------------------------------
# training-dataset assembly (sequence packing, splits) + real audio kernel
# ---------------------------------------------------------------------------

@register(
    "multimodal_audio_features",
    sql="""
    WITH aud AS (
      SELECT doc_id AS media_id, 400 + (doc_id % 5) * 100 AS n
      FROM documents WHERE doc_id % 3 = 1
    ), samp AS (
      SELECT media_id, n,
             ((media_id * 7 + unnest(range(0, n)) * 13) % 2001) - 1000 AS s
      FROM aud
    )
    SELECT media_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
           CAST(MAX(ABS(s)) AS INT) AS peak,
           ROUND(SQRT(CAST(SUM(s * s) AS DOUBLE) / n), 6) AS rms
    FROM samp GROUP BY media_id, n
    """,
)
def multimodal_audio_features(spark, sf_dir):
    """REAL audio decode kernel: every audio-doc gets a deterministic
    PCM WAV through the real RIFF encoder, the real parser walks the
    chunk list back to samples, and duration/peak/RMS come out of the
    sample array. RMS sums squares in int64 (exact, any order) before
    one double sqrt, so the oracle reproduces it bit-for-bit from the
    generating formula."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    return M.decode_audio_features(M.synthesize_audio(d))


@register(
    "pack_sequences_budget",
    sql=r"""
    WITH toks AS (
      SELECT doc_id,
             CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+'))
                  END AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM toks
    )
    SELECT doc_id, n_tokens,
           CAST(before // 256 AS BIGINT) AS bin_id,
           CAST(before - (before // 256) * 256 + n_tokens AS BIGINT)
             AS bin_fill
    FROM c
    """,
)
def pack_sequences_budget(spark, sf_dir):
    """Contiguous sequence packing into 256-token bins (window cumsum,
    no iteration — see operators/training.py for the per-shard 100-TB
    form where the window partitions by shard key)."""
    d = _t(spark, sf_dir, "documents")
    return TR.pack_sequences(d, budget=256)


@register(
    "curriculum_stages_per_lang",
    sql="""
    SELECT doc_id, lang,
           CAST(NTILE(10) OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS INT) AS stage
    FROM documents
    """,
)
def curriculum_stages_per_lang(spark, sf_dir):
    """Curriculum staging: decile buckets short-to-long WITHIN each
    language — the easy-first ordering a curriculum-trained run feeds
    shard by shard. Per-language window partitions keep the sort
    distributed (no global single-reducer NTILE; the same per-shard
    shape as pack_sequences_per_lang), and the (n_chars, doc_id) key
    is all-integer so the stage assignment is engine-exact."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id", "lang",
        F.ntile(10).over(w).cast("int").alias("stage"),
    )


@register(
    "pack_sequences_per_lang",
    sql=r"""
    WITH toks AS (
      SELECT lang, doc_id,
             CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+'))
                  END AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT lang, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM toks
    )
    SELECT lang, doc_id, n_tokens,
           CAST(before // 256 AS BIGINT) AS bin_id,
           CAST(before - (before // 256) * 256 + n_tokens AS BIGINT)
             AS bin_fill
    FROM c
    """,
)
def pack_sequences_per_lang(spark, sf_dir):
    """Per-shard sequence packing — the 100-TB form: the window
    partitions by the shard key (language here), so each shard packs
    independently in parallel with NO single-partition global
    WindowExec (operators/training.py pack_sequences partition_col).
    Bins are per-language; the (lang, bin_id) pair is the global bin
    key."""
    d = _t(spark, sf_dir, "documents")
    return TR.pack_sequences(d, budget=256, partition_col="lang")


@register(
    "dataset_split_hash",
    sql="""
    WITH keyed AS (
      SELECT doc_id,
             ('0x' || substring(md5(doc_id::VARCHAR || ':' || text), 1, 15))
               ::BIGINT % 100 AS split_bucket
      FROM documents
    )
    SELECT doc_id, CAST(split_bucket AS BIGINT) AS split_bucket,
           CASE WHEN split_bucket < 80 THEN 'train'
                WHEN split_bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM keyed
    """,
)
def dataset_split_hash(spark, sf_dir):
    """Deterministic content-keyed train/val/test split: md5 of
    (id, text) -> 60-bit int mod 100 — stable across engines, runs,
    and partitionings, and exact duplicates land in the same split
    (no leakage through missed dup pairs)."""
    d = _t(spark, sf_dir, "documents")
    return TR.split_hash(d, train_pct=80, val_pct=10)


@register(
    "corpus_shuffle_shards",
    sql="""
    WITH keyed AS (
      SELECT doc_id,
             ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS k
      FROM documents
    )
    SELECT doc_id,
           CAST(k % 64 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY k % 64 ORDER BY k, doc_id) AS BIGINT) AS pos
    FROM keyed
    """,
)
def corpus_shuffle_shards(spark, sf_dir):
    """Deterministic corpus shuffle (training.shuffle_deterministic):
    md5-keyed (shard, pos) coordinates replay one fixed pseudo-random
    permutation on any engine or cluster size — per-shard window
    ranks, no rand(), no global single-reducer sort."""
    d = _t(spark, sf_dir, "documents")
    return TR.shuffle_deterministic(d, n_shards=64)


@register(
    "temperature_resample_lang",
    sql="""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang
    ), w AS (
      SELECT lang, n, CAST(FLOOR(SQRT(n)) AS BIGINT) AS wl FROM counts
    ), tot AS (
      SELECT CAST(SUM(wl) AS BIGINT) AS W, CAST(SUM(n) AS BIGINT) AS N
      FROM w
    ), rates AS (
      SELECT w.lang,
             CAST((10000 * w.wl * (t.N // 2)) // (t.W * w.n) AS BIGINT)
               AS rate_bp
      FROM w, tot t
    ), keyed AS (
      SELECT doc_id, lang,
             ('0x' || substring(md5(doc_id::VARCHAR || ':' || text), 1, 15))
               ::BIGINT % 10000 AS bp
      FROM documents
    )
    SELECT k.doc_id, k.lang, r.rate_bp
    FROM keyed k JOIN rates r ON k.lang = r.lang
    WHERE k.bp < r.rate_bp
    """,
)
def temperature_resample_lang(spark, sf_dir):
    """Temperature-based multilingual resampling (operators/training.py
    temperature_resample): per-language rates DERIVED from the data
    (share^0.5, the multilingual-pretraining standard) in pure integer
    arithmetic — floor(sqrt(n)) weights, basis-point rates, content-
    keyed md5 keep decisions — so both engines land on the identical
    keep set. One tiny count agg + broadcast rates + map-side filter;
    the corpus never shuffles. Complements stratified_sample_lang's
    FIXED per-stratum percentages with the data-adaptive form."""
    d = _t(spark, sf_dir, "documents")
    return TR.temperature_resample(d, "lang")


@register(
    "stratified_sample_lang",
    sql="""
    WITH keyed AS (
      SELECT doc_id, lang, source, n_chars,
             ('0x' || substring(md5(doc_id::VARCHAR || ':' || text), 1, 15))
               ::BIGINT % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars
    FROM keyed
    WHERE bucket < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50
                             WHEN 'fr' THEN 25 WHEN 'es' THEN 10
                             ELSE 0 END
    """,
)
def stratified_sample_lang(spark, sf_dir):
    """Deterministic per-stratum downsampling (corpus rebalancing: keep
    all English, 50% German, 25% French, 10% Spanish, drop the rest).
    Content-keyed md5 bucket as in dataset_split_hash — stable across
    engines/partitionings, and a doc's keep/drop decision never changes
    as the corpus grows (pure map-side filter, no shuffle at any scale).
    """
    d = _t(spark, sf_dir, "documents")
    return TR.stratified_sample_hash(
        d, strata_col="lang", pct_by_stratum={"en": 100, "de": 50, "fr": 25, "es": 10}
    ).select("doc_id", "lang", "source", "n_chars")


@register(
    "array_higher_order_functions",
    sql=f"""
    SELECT vec_id,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INT)
             AS n_pos,
           CAST(list_sum({S.duckdb_quantize_sql('embedding::DOUBLE[]')})
             AS BIGINT) AS qsum,
           ROUND((embedding::DOUBLE[])[1] * 2, 6) AS first_doubled
    FROM embeddings
    """,
)
def array_higher_order_functions(spark, sf_dir):
    """Higher-order array functions (filter/transform/aggregate) over
    the embedding column; the aggregate sums QUANTIZED int64 elements
    so the value is order-independent and engine-exact."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr(
            "CAST(size(filter(CAST(embedding AS array<double>), x -> x > 0D)) AS INT)"
        ).alias("n_pos"),
        F.expr(
            "aggregate(transform(CAST(embedding AS array<double>), "
            "x -> CAST(floor(x * 64.0 + 0.5) AS BIGINT)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("qsum"),
        F.round(
            F.element_at(F.col("embedding").cast("array<double>"), 1) * 2, 6
        ).alias("first_doubled"),
    )


@register(
    "verb_time_travel",
    sql="""
    SELECT n_nationkey, n_name AS old_name,
           n_name || '_X' AS new_name
    FROM nation
    """,
)
def verb_time_travel(spark, sf_dir):
    """Time travel on the COW store (beyond-reference; Delta
    ``versionAsOf`` analog): update bumps the snapshot version, the
    retention window keeps the prior snapshot readable, and reading
    the post-insert version returns the pre-update rows — joined
    here against the current snapshot to prove BOTH states at once."""
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation")
    eng.create.table_from_dataframe("dbo.nation_tt", nation, primary_key="n_nationkey")
    eng.write.insert("dbo.nation_tt", nation)
    v_ins = eng.store.meta("dbo.nation_tt").version  # create=v0, insert=v1
    eng.write.update(
        "dbo.nation_tt",
        nation.select(
            "n_nationkey", F.concat("n_name", F.lit("_X")).alias("n_name")
        ),
    )
    old = eng.read.table("dbo.nation_tt", version=v_ins).select(
        "n_nationkey", F.col("n_name").alias("old_name")
    )
    cur = eng.read.table("dbo.nation_tt").select(
        "n_nationkey", F.col("n_name").alias("new_name")
    )
    return old.join(cur, "n_nationkey").select(
        "n_nationkey", "old_name", "new_name"
    )


@register(
    "verb_timestamp_as_of",
    sql="""
    SELECT n_nationkey, n_name AS name_as_of,
           n_name || '_X' AS name_now
    FROM nation
    """,
)
def verb_timestamp_as_of(spark, sf_dir):
    """TIMESTAMP AS OF time travel (Delta ``timestampAsOf`` analog),
    made deterministic by the store's injectable commit clock
    (store.commit_time_provider): commits are stamped 1000/2000/3000…,
    so "as of insert-time + 500" resolves to the pre-update snapshot
    on every engine and every run. Resolution is a history() scan —
    O(retained versions) metadata, zero data reads — then the chosen
    manifest's files, identical cost to VERSION AS OF."""
    eng = _scratch_engine(spark)
    state = {"t": 0.0}

    def _tick():
        state["t"] += 1000.0
        return state["t"]

    eng.store.commit_time_provider = _tick
    nation = _t(spark, sf_dir, "nation")
    eng.create.table_from_dataframe(
        "dbo.nation_tsa", nation, primary_key="n_nationkey"
    )
    eng.write.insert("dbo.nation_tsa", nation)
    v_ins = eng.store.meta("dbo.nation_tsa").version
    ts_ins = eng.store.commit_info("dbo.nation_tsa", v_ins)["ts"]
    eng.write.update(
        "dbo.nation_tsa",
        nation.select(
            "n_nationkey", F.concat("n_name", F.lit("_X")).alias("n_name")
        ),
    )
    asof = eng.read.table(
        "dbo.nation_tsa", timestamp_as_of=ts_ins + 500.0
    ).select("n_nationkey", F.col("n_name").alias("name_as_of"))
    cur = eng.read.table("dbo.nation_tsa").select(
        "n_nationkey", F.col("n_name").alias("name_now")
    )
    return asof.join(cur, "n_nationkey").select(
        "n_nationkey", "name_as_of", "name_now"
    )


@register(
    "verb_restore",
    sql="""
    SELECT n_nationkey, n_name, 'restore(v1)' AS last_op
    FROM nation
    """,
)
def verb_restore(spark, sf_dir):
    """RESTORE TABLE ... TO VERSION AS OF analog (beyond-reference):
    a bad write is rolled back by committing the target version's
    manifest as the next version — entries carried by reference,
    manifest-only cost, zero data movement at 100 TB exactly as at
    sf0.01. The rollback is itself a labeled commit (auditable in
    ``history()``), and the gate reads the CURRENT snapshot after the
    restore, proving the pre-update rows came back."""
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    eng.create.table_from_dataframe(
        "dbo.nation_rs", nation, primary_key="n_nationkey"
    )
    eng.write.insert("dbo.nation_rs", nation)  # create=v0, insert=v1
    v_ins = eng.store.meta("dbo.nation_rs").version
    eng.write.update(  # v2: the "bad write" to roll back
        "dbo.nation_rs",
        nation.select(
            "n_nationkey", F.concat("n_name", F.lit("_X")).alias("n_name")
        ),
    )
    v_new = eng.restore("dbo.nation_rs", v_ins)  # v3 == v1 data
    op = eng.store.commit_info("dbo.nation_rs", v_new).get("op")
    return eng.read.table("dbo.nation_rs").select(
        "n_nationkey", "n_name", F.lit(op).alias("last_op")
    )


@register(
    "verb_clone_diverge",
    sql="""
    SELECT n_nationkey,
           n_name AS src_name,
           n_name || '_C' AS clone_name
    FROM nation
    """,
)
def verb_clone_diverge(spark, sf_dir):
    """SHALLOW CLONE analog (store.py:clone): the clone shares the
    source's immutable files by reference (hard links locally,
    absolute URIs on object storage) at O(files) metadata cost, then
    diverges independently — the gate updates ONLY the clone and
    proves the source still reads its original rows while the clone
    reads the updated ones."""
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    eng.create.table_from_dataframe(
        "dbo.nation_src", nation, primary_key="n_nationkey"
    )
    eng.write.insert("dbo.nation_src", nation)
    eng.clone("dbo.nation_src", "dbo.nation_clone")
    eng.write.update(
        "dbo.nation_clone",
        nation.select(
            "n_nationkey", F.concat("n_name", F.lit("_C")).alias("n_name")
        ),
    )
    src = eng.read.table("dbo.nation_src").select(
        "n_nationkey", F.col("n_name").alias("src_name")
    )
    cln = eng.read.table("dbo.nation_clone").select(
        "n_nationkey", F.col("n_name").alias("clone_name")
    )
    return src.join(cln, "n_nationkey")


@register(
    "scd2_point_in_time_join",
    sql="""
    WITH base AS (
      SELECT c_custkey, c_name, c_acctbal
      FROM customer WHERE c_custkey <= 150
    ),
    hist AS (
      SELECT c_custkey, c_name, c_acctbal,
             TIMESTAMP '2024-01-01 00:00:00' AS vf,
             CASE WHEN c_custkey % 3 = 0
                  THEN TIMESTAMP '2024-06-01 00:00:00' END AS vt
      FROM base
      UNION ALL
      SELECT c_custkey, 'V2', c_acctbal + 50.0,
             TIMESTAMP '2024-06-01 00:00:00', NULL
      FROM base WHERE c_custkey % 3 = 0
    ),
    facts AS (
      SELECT o_orderkey, o_custkey AS c_custkey,
             CASE WHEN o_orderkey % 2 = 0
                  THEN TIMESTAMP '2024-03-01 00:00:00'
                  ELSE TIMESTAMP '2024-08-01 00:00:00' END AS fact_ts
      FROM orders WHERE o_custkey <= 150
    )
    SELECT f.o_orderkey, f.c_custkey, f.fact_ts, h.c_name, h.c_acctbal
    FROM facts f JOIN hist h ON f.c_custkey = h.c_custkey
     AND h.vf <= f.fact_ts AND (h.vt IS NULL OR f.fact_ts < h.vt)
    """,
)
def scd2_point_in_time_join(spark, sf_dir):
    """Point-in-time join (operators/joins.py:point_in_time_join)
    against a type-2 dimension BUILT BY the engine's own merge_scd2
    verbs: March facts see every customer's v1, August facts see the
    re-versioned rows — the leakage-free as-reported view a backtest
    or training-data build needs. One equi-join shuffle; the interval
    filter keeps exactly one version per fact."""
    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 150)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    eng.create.table(
        "dbo.cust_pit",
        {
            "c_custkey": "bigint",
            "c_name": "nvarchar(200)",
            "c_acctbal": "float",
            "_valid_from": "datetime2",
            "_valid_to": "datetime2",
            "_is_current": "bit",
        },
    )
    t1 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    t2 = F.lit("2024-06-01 00:00:00").cast("timestamp_ntz")
    eng.write.merge_scd2(
        "dbo.cust_pit", base, match_columns=["c_custkey"], as_of=t1
    )
    changed = base.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("V2").alias("c_name"),
        (F.col("c_acctbal") + F.lit(50.0)).alias("c_acctbal"),
    )
    eng.write.merge_scd2(
        "dbo.cust_pit", changed, match_columns=["c_custkey"], as_of=t2
    )
    facts = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 150)
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("c_custkey"),
            F.when(
                F.col("o_orderkey") % 2 == 0,
                F.lit("2024-03-01 00:00:00"),
            ).otherwise(F.lit("2024-08-01 00:00:00"))
            .cast("timestamp_ntz").alias("fact_ts"),
        )
    )
    dim = eng.read.table("dbo.cust_pit")
    return J.point_in_time_join(
        facts, dim, on=["c_custkey"], fact_time="fact_ts",
        dim_values=["c_name", "c_acctbal"],
    ).select("o_orderkey", "c_custkey", "fact_ts", "c_name", "c_acctbal")


@register(
    "pit_left_unmatched_facts",
    sql="""
    WITH hist AS (
      SELECT c_custkey, c_name,
             TIMESTAMP '2024-01-01 00:00:00' AS vf,
             CAST(NULL AS TIMESTAMP) AS vt
      FROM customer WHERE c_custkey % 2 = 0 AND c_custkey <= 300
    ),
    facts AS (
      SELECT o_orderkey, o_custkey AS c_custkey,
             CASE WHEN o_orderkey % 3 = 0
                  THEN TIMESTAMP '2023-06-01 00:00:00'
                  ELSE TIMESTAMP '2024-08-01 00:00:00' END AS fact_ts
      FROM orders WHERE o_custkey <= 300
    )
    SELECT f.o_orderkey, f.c_custkey, f.fact_ts, h.c_name
    FROM facts f LEFT JOIN hist h ON f.c_custkey = h.c_custkey
     AND h.vf <= f.fact_ts AND (h.vt IS NULL OR f.fact_ts < h.vt)
    """,
)
def pit_left_unmatched_facts(spark, sf_dir):
    """Point-in-time LEFT semantics (operators/joins.py
    point_in_time_join): facts with NO valid dimension version — an
    odd customer key absent from the type-2 history, or a timestamp
    before the key's first valid_from — carry NULL dimension values
    instead of silently vanishing from the training set. The oracle
    is the plain interval LEFT JOIN. Same scale shape as the inner
    form: one equi-join shuffle on the business key, interval
    containment as a post-join filter."""
    cust = _t(spark, sf_dir, "customer").filter(
        (F.col("c_custkey") % 2 == 0) & (F.col("c_custkey") <= 300)
    )
    dim = cust.select(
        "c_custkey", "c_name",
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
        .alias("_valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("_valid_to"),
    )
    facts = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 300)
        .select(
            "o_orderkey",
            F.col("o_custkey").alias("c_custkey"),
            F.when(
                F.col("o_orderkey") % 3 == 0,
                F.lit("2023-06-01 00:00:00"),
            ).otherwise(F.lit("2024-08-01 00:00:00"))
            .cast("timestamp_ntz").alias("fact_ts"),
        )
    )
    return J.point_in_time_join(
        facts, dim, on=["c_custkey"], fact_time="fact_ts",
        dim_values=["c_name"],
    ).select("o_orderkey", "c_custkey", "fact_ts", "c_name")


@register(
    "data_profile_orders",
    sql="""
    SELECT 'o_orderkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    """,
)
def data_profile_orders(spark, sf_dir):
    """Per-column data-quality profile (operators/profiling.py:
    column_profile — the Deequ report shape): row/null/distinct counts
    and min/max per column, ALL columns in ONE aggregation pass with
    map-side combine. The oracle computes each column's metrics
    independently; matching proves the fused single-pass plan."""
    from .operators.profiling import column_profile

    o = _t(spark, sf_dir, "orders")
    return column_profile(
        o, ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_custkey"]
    )


@register(
    "verb_vacuum_retention",
    sql="""
    SELECT n_nationkey, n_name || '_X' AS n_name,
           1 AS readable_versions
    FROM nation
    """,
)
def verb_vacuum_retention(spark, sf_dir):
    """Explicit VACUUM (store.py:vacuum — Delta VACUUM analog): after
    dropping history to keep_versions=0, exactly one snapshot stays
    readable and the current data is untouched; unreferenced pool
    files unlink without any rewrite. The gate returns the surviving
    snapshot plus the readable-version count."""
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    eng.create.table_from_dataframe(
        "dbo.nation_vac", nation, primary_key="n_nationkey"
    )
    eng.write.insert("dbo.nation_vac", nation)
    eng.write.update(
        "dbo.nation_vac",
        nation.select(
            "n_nationkey", F.concat("n_name", F.lit("_X")).alias("n_name")
        ),
    )
    readable = eng.vacuum("dbo.nation_vac", keep_versions=0)
    return eng.read.table("dbo.nation_vac").select(
        "n_nationkey", "n_name",
        F.lit(readable).cast("int").alias("readable_versions"),
    )


@register(
    "verb_optimize_zorder",
    sql="""
    SELECT o_orderkey, o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           'zorder(o_orderkey,o_custkey)' AS last_op
    FROM orders WHERE o_orderkey <= 4000
    """,
)
def verb_optimize_zorder(spark, sf_dir):
    """OPTIMIZE ZORDER BY analog (store.py:optimize_zorder): rewrite
    along a Morton curve over (o_orderkey, o_custkey) so every file is
    tight in BOTH keys and the column-labeled stats prune mutations or
    scans on either — 1-D clustering would scramble the second key.
    The gate proves the rewrite is lossless and the commit labeled;
    pruning-on-both-keys is pinned by test_store_pruned_merge."""
    eng = _scratch_engine(spark)
    src = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_custkey",
                F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )
    eng.create.table(
        "dbo.orders_z",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "o_totalprice": "float"},
        primary_key_column="o_orderkey",
    )
    eng.write.insert("dbo.orders_z", src)
    eng.store.optimize_zorder(
        "dbo.orders_z", ["o_orderkey", "o_custkey"], n_files=4
    )
    v = eng.store.meta("dbo.orders_z").version
    op = eng.store.commit_info("dbo.orders_z", v).get("op")
    return eng.read.table("dbo.orders_z").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.lit(op).alias("last_op"),
    )


@register(
    "verb_delete_keys",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey <= 3000
      AND NOT (o_orderkey % 5 = 2)
    """,
)
def verb_delete_keys(spark, sf_dir):
    """Keys-based DELETE (write.delete, core/write/delete.py — beyond
    the reference, whose deletes ride MERGE's not-matched-by-source
    clause): the GDPR erase shape. Files whose key range misses the
    keys carry over by manifest reference; the survivors come from one
    left-anti join over the touched files only."""
    eng = _scratch_engine(spark)
    src = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 3000)
        .select("o_orderkey", "o_custkey",
                F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )
    eng.create.table(
        "dbo.orders_del",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "o_totalprice": "float"},
        primary_key_column="o_orderkey",
    )
    eng.write.insert("dbo.orders_del", src)
    eng.write.delete(
        "dbo.orders_del",
        src.filter(F.col("o_orderkey") % 5 == 2).select("o_orderkey"),
    )
    return eng.read.table("dbo.orders_del")


@register(
    "pipeline_dedup_sweep",
    sql="""
    WITH corpus AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 100000, text, 'xx', 'mirror', n_chars
      FROM documents WHERE doc_id % 4 = 0
    ),
    survivors AS (
      SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text
    )
    SELECT c.doc_id, c.lang, c.source, c.n_chars
    FROM corpus c JOIN survivors s ON c.doc_id = s.doc_id
    """,
)
def pipeline_dedup_sweep(spark, sf_dir):
    """End-to-end dedup sweep ON THE STORE: ingest the corpus into a
    managed table, find exact-duplicate losers with the dedup
    operator, erase them with the keys-based DELETE verb (pruned,
    versioned commit), and read the surviving snapshot back — the
    operator suite and the warehouse verbs composing as one pipeline,
    which is how a production corpus refresh actually runs. The
    pre-delete snapshot stays time-travel readable."""
    eng = _scratch_engine(spark)
    base = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    # a mirrored slice makes the duplicates real: every 4th document
    # re-ingested under a new id (the re-crawl shape); min-id
    # survivorship must keep the originals and erase the mirrors
    docs = base.unionByName(
        base.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text",
            F.lit("xx").alias("lang"), F.lit("mirror").alias("source"),
            "n_chars",
        )
    )
    eng.create.table(
        "dbo.corpus",
        {"doc_id": "bigint", "text": "nvarchar(max)",
         "lang": "nvarchar(8)", "source": "nvarchar(64)",
         "n_chars": "bigint"},
        primary_key_column="doc_id",
    )
    eng.write.insert("dbo.corpus", docs)
    tbl = eng.read.table("dbo.corpus")
    survivors = D.exact_dedup(tbl, ["text"], "doc_id").select("doc_id")
    losers = tbl.select("doc_id").join(survivors, "doc_id", "left_anti")
    eng.write.delete("dbo.corpus", losers)
    return eng.read.table("dbo.corpus").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "verb_check_constraints",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey <= 2000 AND o_totalprice > 0
    """,
)
def verb_check_constraints(spark, sf_dir):
    """CHECK constraints (modify.check_constraint — Delta ADD
    CONSTRAINT analog, beyond the reference): the add audits existing
    data with one agg, then every write enforces the restricted-
    grammar expression on the rows it produces (one agg over written
    rows; NULL passes per SQL semantics). This entry proves the full
    path: constrained create -> audited add -> enforced insert ->
    read-back."""
    eng = _scratch_engine(spark)
    src = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_custkey",
                F.col("o_totalprice").cast("double").alias("o_totalprice"))
    )
    eng.create.table(
        "dbo.orders_cc",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "o_totalprice": "float"},
        primary_key_column="o_orderkey",
    )
    eng.write.insert("dbo.orders_cc", src.limit(1))
    eng.modify.check_constraint(
        "dbo.orders_cc", "add", "price_pos", "o_totalprice > 0"
    )
    eng.write.insert(
        "dbo.orders_cc",
        src.join(eng.read.table("dbo.orders_cc").select("o_orderkey"),
                 "o_orderkey", "left_anti"),
    )
    return eng.read.table("dbo.orders_cc")


@register(
    "verb_foreign_key_audit",
    sql="""
    SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM lineitem WHERE l_orderkey <= 1000
    GROUP BY l_orderkey
    """,
)
def verb_foreign_key_audit(spark, sf_dir):
    """FOREIGN KEY constraints (modify.foreign_key — beyond-reference;
    warehouses usually declare FKs NOT ENFORCED, this engine audits on
    ADD and enforces on every write via one keys-only anti join,
    validation.enforce_foreign_keys). The entry proves the full path:
    parent + child store tables, audited FK add over clean data, an
    orphan insert REJECTED with SQLForeignKeyViolation (and not
    persisted — enforcement runs before the commit), and the surviving
    child content matching the oracle exactly."""
    from mssql_dataframe_spark.errors import SQLForeignKeyViolation

    eng = _scratch_engine(spark)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    lines = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )
    eng.create.table_from_dataframe(
        "dbo.orders_fkp", orders, primary_key="o_orderkey"
    )
    eng.write.insert("dbo.orders_fkp", orders)
    # the synthetic lineitem repeats (orderkey, linenumber) pairs, so
    # the fact rows get the auto identity _pk (PK uniqueness is
    # enforced on every insert, as SQL Server does); the FK on
    # l_orderkey is what this entry exercises
    eng.create.table_from_dataframe(
        "dbo.lines_fkc", lines, sql_primary_key=True
    )
    eng.write.insert("dbo.lines_fkc", lines)
    eng.modify.foreign_key(
        "dbo.lines_fkc", "add", "fk_order",
        columns="l_orderkey",
        ref_table="dbo.orders_fkp", ref_columns="o_orderkey",
    )
    orphans = lines.limit(5).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(10_000_000)
    )
    try:
        eng.write.insert("dbo.lines_fkc", orphans)
        raise AssertionError("orphan insert must raise SQLForeignKeyViolation")
    except SQLForeignKeyViolation:
        pass
    return (
        eng.read.table("dbo.lines_fkc")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            _dsum(F.col("l_extendedprice"), "total_price"),
        )
    )


@register(
    "verb_fk_delete_cascade",
    sql="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(SUM(l_quantity) AS DOUBLE) AS l_quantity
    FROM lineitem
    WHERE l_orderkey <= 1000 AND l_orderkey > 100
    GROUP BY 1, 2
    """,
)
def verb_fk_delete_cascade(spark, sf_dir):
    """ON DELETE CASCADE (modify.foreign_key on_delete='cascade' —
    SQL Server referential-action parity): deleting parent orders
    removes their lineitems too, child commit first so the FK
    invariant holds at every version boundary. Scale shape: the
    cascade is one keys-only semi-join hit test plus a keys-pruned
    child DELETE (the same file-pruned copy-on-write as a direct
    delete) — cost ∝ referenced child files, not table size. The
    oracle is the surviving child relation."""
    eng = _scratch_engine(spark)
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(F.col("o_orderkey").cast("long").alias("o_orderkey"),
                "o_orderstatus")
    )
    lines = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        # the synthetic lineitem repeats (orderkey, linenumber) pairs;
        # aggregate to a PK-clean child relation (the engine enforces
        # PK uniqueness on insert, as SQL Server does)
        .groupBy(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("l_quantity"))
    )
    eng.create.table_from_dataframe(
        "dbo.orders_cas", orders, primary_key="o_orderkey"
    )
    eng.write.insert("dbo.orders_cas", orders)
    eng.create.table_from_dataframe(
        "dbo.lines_cas", lines, primary_key=["l_orderkey", "l_linenumber"]
    )
    eng.write.insert("dbo.lines_cas", lines)
    eng.modify.foreign_key(
        "dbo.lines_cas", "add", "fk_cas",
        columns="l_orderkey",
        ref_table="dbo.orders_cas", ref_columns="o_orderkey",
        on_delete="cascade",
    )
    eng.write.delete(
        "dbo.orders_cas",
        orders.filter(F.col("o_orderkey") <= 100).select("o_orderkey"),
    )
    return eng.read.table("dbo.lines_cas").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "verb_fk_delete_set_null",
    sql="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_orderkey <= 100 THEN NULL
                ELSE l_orderkey END AS order_ref
    FROM (
      SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             CAST(l_linenumber AS BIGINT) AS l_linenumber
      FROM lineitem WHERE l_orderkey <= 1000
    )
    """,
)
def verb_fk_delete_set_null(spark, sf_dir):
    """ON DELETE SET NULL (modify.foreign_key on_delete='set_null'):
    deleting parent orders nulls the children's FK column instead of
    deleting them. Scale shape: the child rewrite is FILE-PRUNED via
    one slim scan (FK columns + _metadata.file_path) — untouched
    child files carry by manifest reference, cost ∝ referencing
    files. The child keeps its own (l_orderkey, l_linenumber) PK;
    a SEPARATE nullable order_ref column carries the FK (SET NULL
    requires nullable FK columns, checked at declaration). The oracle
    is the child relation with refs <= 100 nulled."""
    eng = _scratch_engine(spark)
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(F.col("o_orderkey").cast("long").alias("o_orderkey"))
    )
    lines = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 1000)
        .groupBy(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
        )
        .agg(F.first(F.col("l_orderkey").cast("long")).alias("order_ref"))
    )
    eng.create.table_from_dataframe(
        "dbo.orders_sn", orders, primary_key="o_orderkey"
    )
    eng.write.insert("dbo.orders_sn", orders)
    eng.create.table_from_dataframe(
        "dbo.lines_sn", lines, primary_key=["l_orderkey", "l_linenumber"]
    )
    eng.write.insert("dbo.lines_sn", lines)
    eng.modify.foreign_key(
        "dbo.lines_sn", "add", "fk_sn",
        columns="order_ref",
        ref_table="dbo.orders_sn", ref_columns="o_orderkey",
        on_delete="set_null",
    )
    eng.write.delete(
        "dbo.orders_sn",
        orders.filter(F.col("o_orderkey") <= 100).select("o_orderkey"),
    )
    return eng.read.table("dbo.lines_sn").select(
        "l_orderkey", "l_linenumber", "order_ref"
    )


@register(
    "verb_pk_informational",
    sql="""
    SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(2 AS BIGINT) AS n
    FROM orders WHERE o_orderkey <= 500
    """,
)
def verb_pk_informational(spark, sf_dir):
    """PRIMARY KEY NOT ENFORCED (the ``pk_not_enforced`` table
    property — Delta/Synapse-style informational PKs): the engine
    enforces PK uniqueness on every write by default, but bulk-append
    pipelines can opt out and pay zero check cost. The entry inserts
    the same keys TWICE into an opted-out table; the oracle asserts
    every key landed with multiplicity 2 — impossible under the
    default enforcement (tests/test_primary_key_enforcement.py pins
    the enforced side)."""
    eng = _scratch_engine(spark)
    src = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(F.col("o_orderkey").cast("long").alias("k"))
    )
    eng.create.table(
        "dbo.pk_info", {"k": "bigint"}, primary_key_column="k",
        properties={"pk_not_enforced": True},
    )
    eng.write.insert("dbo.pk_info", src)
    eng.write.insert("dbo.pk_info", src)
    return (
        eng.read.table("dbo.pk_info")
        .groupBy("k")
        .agg(F.count("*").cast("long").alias("n"))
    )


@register(
    "verb_merge_composite_key",
    sql="""
    WITH base AS (
      SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
             CAST(l_linenumber AS BIGINT) AS l_linenumber,
             CAST(SUM(l_quantity) AS DOUBLE) AS qty
      FROM lineitem WHERE l_orderkey <= 2000
      GROUP BY 1, 2
    )
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_orderkey <= 100 THEN qty + 1 ELSE qty END AS qty
    FROM base
    UNION ALL
    SELECT 999991, 1, 5.0
    """,
)
def verb_merge_composite_key(spark, sf_dir):
    """Upsert MERGE on a COMPOSITE primary key (l_orderkey,
    l_linenumber) — the reference supports composite PKs
    (create.py:120-141) but its merge always stages to a temp table;
    here the composite key exercises the CONTENT-pruning fallback
    (core/write/merge.py): no single stats column can split the
    manifest, so one slim scan of the match columns +
    _metadata.file_path discovers the touched files and the rest of
    the table carries by reference — upsert cost ∝ touched files at
    any scale. The oracle is the post-merge table: low keys updated
    (+1 qty), one brand-new composite key inserted, everything else
    byte-identical."""
    eng = _scratch_engine(spark)
    lines = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        # PK-clean composite-key relation (see verb_fk_delete_cascade)
        .groupBy(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("qty"))
    )
    eng.create.table_from_dataframe(
        "dbo.lines_ck", lines, primary_key=["l_orderkey", "l_linenumber"]
    )
    eng.write.insert("dbo.lines_ck", lines)
    source = (
        lines.filter(F.col("l_orderkey") <= 100)
        .withColumn("qty", F.col("qty") + F.lit(1.0))
        .unionByName(
            spark.createDataFrame(
                [(999991, 1, 5.0)],
                "l_orderkey long, l_linenumber long, qty double",
            )
        )
    )
    eng.write.merge("dbo.lines_ck", source, upsert=True)
    return eng.read.table("dbo.lines_ck").select(
        "l_orderkey", "l_linenumber", "qty"
    )


@register(
    "verb_composite_pk_pruned_ingest",
    sql="""
    SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
           CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(SUM(l_quantity) AS DOUBLE) AS qty
    FROM lineitem WHERE l_orderkey <= 3000
    GROUP BY 1, 2
    """,
)
def verb_composite_pk_pruned_ingest(spark, sf_dir):
    """Ordered ingest into a COMPOSITE primary key in disjoint
    key-range batches — the shape the stats-pruned collision check
    optimizes (core/write/insert.py + store.split_by_key_ranges):
    every PK column's per-file min/max is footer-harvested, so each
    append beyond the standing key ranges proves itself collision-free
    from the manifest alone and reads ZERO existing files
    (tests/test_stats_pruning_composite.py pins the zero-read
    property; this entry pins end-to-end correctness). A re-insert of
    an already-loaded key range must still raise — the reference
    surfaces SQL Server's PK violation on INSERT (create.py:148).
    The oracle is the fully-loaded table."""
    from mssql_dataframe_spark.errors import SQLUniqueConstraintViolation

    eng = _scratch_engine(spark)
    lines = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 3000)
        .groupBy(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
        )
        .agg(F.sum("l_quantity").cast("double").alias("qty"))
    )
    eng.create.table_from_dataframe(
        "dbo.lines_cpi", lines, primary_key=["l_orderkey", "l_linenumber"]
    )
    k = F.col("l_orderkey")
    # the synthetic lineitem's orderkeys start at 0 — the first band
    # is inclusive below so every key <= 3000 loads
    for lo, hi in ((-1, 1000), (1000, 2000), (2000, 3000)):
        eng.write.insert(
            "dbo.lines_cpi", lines.filter((k > lo) & (k <= hi))
        )
    try:
        eng.write.insert(
            "dbo.lines_cpi",
            lines.orderBy("l_orderkey", "l_linenumber").limit(1),
        )
        raise AssertionError(
            "re-inserting a loaded composite key must raise"
        )
    except SQLUniqueConstraintViolation:
        pass
    return eng.read.table("dbo.lines_cpi").select(
        "l_orderkey", "l_linenumber", "qty"
    )


@register(
    "verb_merge_partition_reload",
    sql="""
    WITH base AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k,
             CAST(o_orderkey % 4 AS BIGINT) AS part,
             CAST(o_totalprice AS DOUBLE) AS v
      FROM orders WHERE o_orderkey <= 8000
    )
    SELECT k, part, v FROM base WHERE part <> 2
    UNION ALL
    SELECT k, part, v + 1.0 FROM base
    WHERE part = 2 AND k % 10 <> 3
    """,
)
def verb_merge_partition_reload(spark, sf_dir):
    """Partition-scoped incremental reload via ``delete_requires``
    (the reference's merge.py:180-197 ``AND target.c IN (SELECT c
    FROM source)`` delete guard): re-sending one partition updates
    its surviving rows, deletes the rows it omits, and CANNOT touch
    other partitions — and the engine content-prunes the rewrite to
    the reloaded partition's files (core/write/merge.py: files with
    no source match and no full delete_requires membership carry by
    reference; THROUGHPUT.md shows the fixed reload flat across
    table-size doublings). Oracle: partitions 0/1/3 untouched,
    partition 2 reloaded with +1.0 values minus every k%10==3 row."""
    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 8000)
        .select(
            F.col("o_orderkey").cast("long").alias("k"),
            (F.col("o_orderkey") % 4).cast("long").alias("part"),
            F.col("o_totalprice").cast("double").alias("v"),
        )
    )
    eng.create.table_from_dataframe("dbo.part_rl", base, primary_key="k")
    eng.write.insert("dbo.part_rl", base)
    reload2 = (
        base.filter((F.col("part") == 2) & (F.col("k") % 10 != 3))
        .withColumn("v", F.col("v") + F.lit(1.0))
    )
    eng.write.merge("dbo.part_rl", reload2, delete_requires=["part"])
    return eng.read.table("dbo.part_rl").select("k", "part", "v")


@register(
    "verb_scd2_composite_key",
    sql="""
    WITH base AS (
      SELECT CAST(c_custkey % 50 AS BIGINT) AS k1,
             CAST(c_custkey // 50 AS BIGINT) AS k2,
             c_acctbal
      FROM customer WHERE c_custkey <= 300
    )
    SELECT k1, k2, c_acctbal,
           TIMESTAMP '2024-01-01 00:00:00' AS _valid_from,
           CASE WHEN (k1 + k2) % 3 = 0
                THEN TIMESTAMP '2024-06-01 00:00:00' END AS _valid_to,
           ((k1 + k2) % 3 <> 0) AS _is_current
    FROM base
    UNION ALL
    SELECT k1, k2, c_acctbal + 50.0,
           TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
    FROM base WHERE (k1 + k2) % 3 = 0
    UNION ALL
    SELECT k1 + 1000, k2, 0.0,
           TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
    FROM base WHERE k2 = 0 AND k1 <= 20
    """,
)
def verb_scd2_composite_key(spark, sf_dir):
    """SCD2 merge on a COMPOSITE business key (k1, k2) — the history
    table's file pruning now intersects per-column bounds
    (core/write/scd2.py + store.split_by_key_ranges), so
    multi-column-keyed dimensions get the same touched-files-only
    rewrite single keys always had. Load 1 at T1 versions everything;
    load 2 at T2 mixes changed rows (closed + re-versioned), no-op
    rows, and brand-new composite keys. The oracle reconstructs the
    exact history in pure SQL."""
    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select(
            (F.col("c_custkey") % 50).cast("long").alias("k1"),
            F.floor(F.col("c_custkey") / 50).cast("long").alias("k2"),
            "c_acctbal",
        )
    )
    eng.create.table(
        "dbo.dim_ck",
        {
            "k1": "bigint",
            "k2": "bigint",
            "c_acctbal": "float",
            "_valid_from": "datetime2",
            "_valid_to": "datetime2",
            "_is_current": "bit",
        },
    )
    t1 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    t2 = F.lit("2024-06-01 00:00:00").cast("timestamp_ntz")
    eng.write.merge_scd2(
        "dbo.dim_ck", base, match_columns=["k1", "k2"], as_of=t1
    )
    ksum = F.col("k1") + F.col("k2")
    changed = base.filter(ksum % 3 == 0).select(
        "k1", "k2", (F.col("c_acctbal") + F.lit(50.0)).alias("c_acctbal")
    )
    noop = base.filter((ksum % 3 != 0) & (F.col("k1") % 5 == 1))
    fresh = base.filter((F.col("k2") == 0) & (F.col("k1") <= 20)).select(
        (F.col("k1") + 1000).alias("k1"), "k2",
        F.lit(0.0).alias("c_acctbal"),
    )
    eng.write.merge_scd2(
        "dbo.dim_ck",
        changed.unionByName(noop).unionByName(fresh),
        match_columns=["k1", "k2"],
        as_of=t2,
    )
    return eng.read.table("dbo.dim_ck").select(
        "k1", "k2", "c_acctbal", "_valid_from", "_valid_to", "_is_current"
    )


@register(
    "verb_unique_constraint",
    sql="""
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name
    FROM supplier WHERE s_suppkey <= 200
    UNION ALL
    SELECT 990001, 'Supplier#990001'
    """,
)
def verb_unique_constraint(spark, sf_dir):
    """User-declared UNIQUE constraint (modify.unique_constraint —
    the ALTER TABLE ADD CONSTRAINT ... UNIQUE analog, completing the
    PK/FK/CHECK constraint family): ``add`` audits existing rows with
    one keys-only dup agg, then every write enforces it — dup agg
    within the batch plus a keys-only semi join against the standing
    snapshot, so enforcement cost is ∝ touched rows even at 100 TB.
    The oracle is the surviving table: original suppliers plus the one
    admissible insert; the duplicate-name insert was refused."""
    from mssql_dataframe_spark.errors import SQLUniqueConstraintViolation

    eng = _scratch_engine(spark)
    sup = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 200)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name")
    )
    eng.create.table_from_dataframe("dbo.sup_uq", sup, primary_key="s_suppkey")
    eng.write.insert("dbo.sup_uq", sup)
    eng.modify.unique_constraint("dbo.sup_uq", "add", "uq_sname", "s_name")
    taken = sup.orderBy("s_suppkey").limit(1).collect()[0]["s_name"]
    dup = spark.createDataFrame(
        [(990000, taken)], "s_suppkey long, s_name string"
    )
    try:
        eng.write.insert("dbo.sup_uq", dup)
        raise AssertionError(
            "duplicate-name insert must raise SQLUniqueConstraintViolation"
        )
    except SQLUniqueConstraintViolation:
        pass
    eng.write.insert(
        "dbo.sup_uq",
        spark.createDataFrame(
            [(990001, "Supplier#990001")], "s_suppkey long, s_name string"
        ),
    )
    return eng.read.table("dbo.sup_uq").select("s_suppkey", "s_name")


@register(
    "verb_information_schema",
    sql="""
    SELECT * FROM (VALUES
      ('dbo.inv_items', 'BASE TABLE', 'item_id', 1, 'bigint', true),
      ('dbo.inv_items', 'BASE TABLE', 'sku',     2, 'nvarchar(40)', false),
      ('dbo.inv_items', 'BASE TABLE', 'qty',     3, 'int', false),
      ('dbo.inv_moves', 'BASE TABLE', 'move_id', 1, 'bigint', true),
      ('dbo.inv_moves', 'BASE TABLE', 'item_id', 2, 'bigint', false),
      ('dbo.v_item_skus', 'VIEW',     'item_id', 1, 'bigint', false),
      ('dbo.v_item_skus', 'VIEW',     'sku',     2, 'nvarchar(40)', false)
    ) AS t(object_name, object_type, column_name, ordinal, sql_type,
           in_primary_key)
    """,
)
def verb_information_schema(spark, sf_dir):
    """Catalog introspection (read.information_schema —
    INFORMATION_SCHEMA.COLUMNS analog): one row per column of every
    table and stored view, with declared SQL types and PK membership,
    served from metadata alone. The oracle is the exact expected
    catalog for a two-table + one-view schema; temp objects stay
    hidden like tempdb's."""
    eng = _scratch_engine(spark)
    eng.create.table(
        "dbo.inv_items",
        {"item_id": "bigint", "sku": "nvarchar(40)", "qty": "int"},
        primary_key_column="item_id",
    )
    eng.create.table(
        "dbo.inv_moves",
        {"move_id": "bigint", "item_id": "bigint"},
        primary_key_column="move_id",
    )
    eng.create.view(
        "dbo.v_item_skus", "dbo.inv_items", column_names=["item_id", "sku"]
    )
    eng.create.table(  # must NOT appear in the catalog
        "dbo.#scratch_tmp", {"x": "bigint"}, primary_key_column="x"
    )
    return eng.read.information_schema()


@register(
    "verb_export_import",
    sql="""
    SELECT p_partkey, p_name,
           CASE WHEN p_retailprice IS NULL THEN NULL
                ELSE CAST(0 AS DOUBLE) END AS p_retailprice
    FROM part WHERE p_partkey <= 800
    """,
)
def verb_export_import(spark, sf_dir):
    """Cross-environment table movement (store.export_table /
    import_table — the BACKUP/RESTORE DATABASE analog): the snapshot's
    immutable files plus ALL declared metadata travel as one
    self-contained directory, and the import lands as a fresh v0
    table in a DIFFERENT store root. The masking policy declared
    before export still applies after import — proving artifacts
    (PK, constraints, masks, computed columns) move with the data,
    not just the rows. O(files) copy; no scan or rewrite."""
    eng_a = _scratch_engine(spark)
    eng_b = _scratch_engine(spark)  # a different store root
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 800)
        .select("p_partkey", "p_name", "p_retailprice")
    )
    eng_a.create.table_from_dataframe("dbo.part_x", p, primary_key="p_partkey")
    eng_a.write.insert("dbo.part_x", p)
    eng_a.modify.masking_policy("dbo.part_x", "add", "p_retailprice", "default()")
    out_dir = os.path.join(_SCRATCH, f"export_{uuid.uuid4().hex}")
    n_files = eng_a.store.export_table("dbo.part_x", out_dir)
    assert n_files > 0
    n_rows = eng_b.store.import_table("dbo.part_imported", out_dir)
    assert n_rows == p.count()
    return eng_b.read.table("dbo.part_imported").withColumn(
        "p_retailprice", F.col("p_retailprice").cast("double")
    )


@register(
    "arrow_python_udf_reverse",
    sql="""
    SELECT p_partkey, reverse(p_name) AS name_rev,
           CAST(LENGTH(p_name) AS BIGINT) AS name_len
    FROM part WHERE p_partkey <= 1000
    """,
)
def arrow_python_udf_reverse(spark, sf_dir):
    """Arrow-optimized Python scalar UDF (Spark 4 ``useArrow=True``):
    the modern row-UDF path — Arrow batches instead of pickled rows,
    ~2-5x less serialization than the legacy Python UDF while keeping
    the plain-function authoring model (pandas_udf entries cover the
    vectorized path). The oracle runs the equivalent builtin, proving
    the UDF's semantics; the plan shows ArrowEvalPython, not
    BatchEvalPython."""
    rev = F.udf(
        lambda s: None if s is None else s[::-1], "string", useArrow=True
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 1000)
    return p.select(
        "p_partkey",
        rev(F.col("p_name")).alias("name_rev"),
        F.length("p_name").cast("bigint").alias("name_len"),
    )


@register(
    "verb_incremental_ingest",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def verb_incremental_ingest(spark, sf_dir):
    """Incremental file-discovery ingestion (write.ingest_directory —
    the Auto Loader / COPY INTO pattern): two waves of files land in a
    directory; the first ingest reads wave 1, the second reads ONLY
    wave 2 (the ingested-files ledger skips seen files), and a third
    call ingests nothing and commits nothing. Row counts prove no
    file was double-read — a re-read would double wave 1 through the
    append path. Ingest cost ∝ new files; the scan receives only the
    new paths."""
    eng = _scratch_engine(spark)
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    land = os.path.join(_SCRATCH, f"landing_{uuid.uuid4().hex}")
    o.filter(F.col("o_orderkey") <= 1000).write.mode("overwrite").parquet(
        os.path.join(land, "wave1")
    )
    eng.create.table(
        "dbo.ord_inc",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "o_totalprice": "float"},
        primary_key_column="o_orderkey",
    )
    n1 = eng.write.ingest_directory("dbo.ord_inc", land)
    assert n1 > 0
    o.filter(
        (F.col("o_orderkey") > 1000) & (F.col("o_orderkey") <= 2000)
    ).write.mode("overwrite").parquet(os.path.join(land, "wave2"))
    n2 = eng.write.ingest_directory("dbo.ord_inc", land)
    assert n2 > 0
    v = eng.store.meta("dbo.ord_inc").version
    assert eng.write.ingest_directory("dbo.ord_inc", land) == 0
    assert eng.store.meta("dbo.ord_inc").version == v  # no empty commit
    return eng.read.table("dbo.ord_inc")


@register(
    "verb_sequence_numbering",
    sql="""
    SELECT 'nation' AS entity, CAST(n_nationkey AS BIGINT) AS entity_key,
           CAST(9 + ROW_NUMBER() OVER (ORDER BY n_nationkey) * 10
                AS BIGINT) AS seq_no
    FROM nation
    UNION ALL
    SELECT 'region', CAST(r_regionkey AS BIGINT),
           CAST((SELECT 9 + COUNT(*) * 10 FROM nation)
                + ROW_NUMBER() OVER (ORDER BY r_regionkey) * 10 AS BIGINT)
    FROM region
    """,
)
def verb_sequence_numbering(spark, sf_dir):
    """SEQUENCE objects (store.create_sequence /
    next_sequence_values — SQL Server CREATE SEQUENCE +
    sp_sequence_get_range analog): a named generator independent of
    any table, reserving ranges atomically under a lock (concurrent
    reservations never overlap — tests/test_sequences.py). Two draws
    number two DIFFERENT tables from one sequence — the cross-table
    use identity columns can't serve; the second draw continuing
    where the first stopped is what the oracle's offset arithmetic
    checks."""
    eng = _scratch_engine(spark)
    eng.store.create_sequence("seq.entity", start=19, increment=10)
    n = _t(spark, sf_dir, "nation").select("n_nationkey").orderBy("n_nationkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey").orderBy("r_regionkey")
    n_keys = [row[0] for row in n.collect()]
    r_keys = [row[0] for row in r.collect()]
    n_vals = eng.store.next_sequence_values("seq.entity", len(n_keys))
    r_vals = eng.store.next_sequence_values("seq.entity", len(r_keys))
    rows = [("nation", k, v) for k, v in zip(n_keys, n_vals)] + [
        ("region", k, v) for k, v in zip(r_keys, r_vals)
    ]
    return spark.createDataFrame(
        rows, "entity string, entity_key bigint, seq_no bigint"
    )


@register(
    "verb_rename_roundtrip",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice AS price
    FROM orders WHERE o_orderkey <= 2000
    """,
)
def verb_rename_roundtrip(spark, sf_dir):
    """sp_rename analogs (modify.rename_column / rename_table): the
    column rename is ONE COW rewrite with all key bookkeeping carried
    (pruning stats relabel to the new name in the same commit); the
    table rename is a pure metadata move. Reading the renamed table
    through the renamed column proves both paths end-to-end."""
    eng = _scratch_engine(spark)
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    eng.create.table_from_dataframe("dbo.ord_rn", o, primary_key="o_orderkey")
    eng.write.insert("dbo.ord_rn", o)
    eng.modify.rename_column("dbo.ord_rn", "o_totalprice", "price")
    eng.modify.rename_table("dbo.ord_rn", "dbo.orders_renamed")
    return eng.read.table("dbo.orders_renamed")


@register(
    "verb_temp_table_staging",
    sql="""
    SELECT n_nationkey, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_nationkey, n_name
    """,
)
def verb_temp_table_staging(spark, sf_dir):
    """Temp-table staging flow, using the reference's own ##-name
    convention (its QUICKSTART creates ##-named tables — reference
    create.py:54-62 doctests): stage customers into a ##global temp,
    join against nation, aggregate. #local names are session-scoped
    (hidden from list_tables, invisible to other sessions on the same
    root, dropped by close()); ##global is shared — tempdb semantics,
    pinned by tests/test_temp_tables.py."""
    eng = _scratch_engine(spark)
    cust = _t(spark, sf_dir, "customer")
    eng.create.table_from_dataframe(
        "dbo.##cust_stage", cust, primary_key="c_custkey"
    )
    eng.write.insert("dbo.##cust_stage", cust)
    staged = eng.read.table("dbo.##cust_stage")
    n = _t(spark, sf_dir, "nation")
    return (
        staged.join(F.broadcast(n), staged.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            _dsum(F.col("c_acctbal"), "sum_bal"),
        )
    )


@register(
    "verb_extended_types_roundtrip",
    sql="""
    WITH src AS (
      SELECT o_orderkey,
             o_totalprice,
             o_orderdate
               + (o_orderkey % 86400) * INTERVAL 1 SECOND AS ts,
             md5(CAST(o_orderkey AS VARCHAR)) AS h
      FROM orders WHERE o_orderkey <= 3000
    )
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice / 7, 4) AS DOUBLE) AS price_money,
           CAST(o_totalprice AS FLOAT4) AS price_real,
           make_timestamp(
             epoch_us(ts) - (epoch_us(ts) % 60000000)
             + CASE WHEN (epoch_us(ts) % 60000000) >= 29998500
                    THEN 60000000 ELSE 0 END) AS ts_smalldatetime,
           upper(substring(h,1,8) || '-' || substring(h,9,4) || '-'
                 || substring(h,13,4) || '-' || substring(h,17,4) || '-'
                 || substring(h,21,12)) AS row_guid
    FROM src
    """,
)
def verb_extended_types_roundtrip(spark, sf_dir):
    """The five beyond-reference SQL Server types through the full
    write pipeline: money (DECIMAL(19,4) scale rounding), real
    (float32), smalldatetime (MINUTE rounding — 29.998 s down,
    29.999 s up), uniqueidentifier (GUID validation + canonical
    upper-case rendering). The engine performs the rounding/
    normalization at write time (validation.py); the oracle reproduces
    each grid explicitly, so a green row proves the type contracts,
    not just the cast."""
    eng = _scratch_engine(spark)
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    h = F.md5(F.col("o_orderkey").cast("string"))
    src = o.select(
        "o_orderkey",
        # >4 decimal places: the engine's money rule must round (scale
        # 4, HALF_UP) — proven because the oracle rounds explicitly
        (F.col("o_totalprice") / 7).alias("price_money"),
        F.col("o_totalprice").alias("price_real"),
        (
            F.col("o_orderdate").cast("timestamp_ntz")
            + F.make_dt_interval(
                secs=(F.col("o_orderkey") % 86400).cast("double")
            )
        ).alias("ts_smalldatetime"),
        F.concat_ws(
            "-",
            F.substring(h, 1, 8), F.substring(h, 9, 4),
            F.substring(h, 13, 4), F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        ).alias("row_guid"),
    )
    eng.create.table(
        "dbo.xtypes",
        {
            "o_orderkey": "bigint",
            "price_money": "money",
            "price_real": "real",
            "ts_smalldatetime": "smalldatetime",
            "row_guid": "uniqueidentifier",
        },
        primary_key_column="o_orderkey",
    )
    eng.write.insert("dbo.xtypes", src)
    # money renders as float64 from DuckDB; compare in DOUBLE
    return eng.read.table("dbo.xtypes").withColumn(
        "price_money", F.col("price_money").cast("double")
    )


@register(
    "verb_views",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > 5000 AND c_mktsegment = 'BUILDING'
      AND c_custkey <= 1400
    """,
)
def verb_views(spark, sf_dir):
    """Stored views (create.view / read.view — SQL Server CREATE VIEW
    analog): a view is a metadata-only READ SPEC over one base table
    (projection + where-grammar filter + order/limit — never arbitrary
    SQL, zero injection surface), validated at CREATE time. Reads go
    through read.table, so pushdown, pruning, and masking policies
    compose; the caller's extra where ANDs on top, exactly like
    filtering a SQL Server view."""
    eng = _scratch_engine(spark)
    cust = _t(spark, sf_dir, "customer")
    eng.create.table_from_dataframe(
        "dbo.cust_v", cust, primary_key="c_custkey"
    )
    eng.write.insert("dbo.cust_v", cust)
    eng.create.view(
        "dbo.v_building_rich",
        "dbo.cust_v",
        column_names=["c_custkey", "c_name", "c_acctbal"],
        where="c_acctbal > 5000 AND c_mktsegment = 'BUILDING'",
    )
    return eng.read.view("dbo.v_building_rich", where="c_custkey <= 1400")


@register(
    "verb_merge_auto_evolve",
    sql="""
    WITH base AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_custkey <= 1200
    ), src AS (
      SELECT c_custkey, c_name, c_custkey % 3 AS loyalty_tier
      FROM customer WHERE c_custkey % 2 = 0 AND c_custkey <= 1500
    )
    SELECT COALESCE(b.c_custkey, s.c_custkey) AS c_custkey,
           COALESCE(s.c_name, b.c_name) AS c_name,
           b.c_acctbal,
           s.loyalty_tier
    FROM base b FULL JOIN src s ON b.c_custkey = s.c_custkey
    """,
)
def verb_merge_auto_evolve(spark, sf_dir):
    """Merge with schema auto-evolution (write.merge(auto_evolve=True)
    — the Delta autoMerge analog): the source's new ``loyalty_tier``
    column becomes a nullable target column via a METADATA-ONLY schema
    add (existing files read NULL through the declared schema; no
    rewrite), then the merge proceeds — matched rows keep unprovided
    columns (c_acctbal), unmatched-source rows insert with NULLs. The
    oracle's FULL JOIN reproduces all three row classes."""
    eng = _scratch_engine(spark)
    cust = _t(spark, sf_dir, "customer")
    base = cust.filter(F.col("c_custkey") <= 1200).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    eng.create.table_from_dataframe(
        "dbo.cust_ae", base, primary_key="c_custkey"
    )
    eng.write.insert("dbo.cust_ae", base)
    src = (
        cust.filter((F.col("c_custkey") % 2 == 0) & (F.col("c_custkey") <= 1500))
        .select(
            "c_custkey", "c_name",
            (F.col("c_custkey") % 3).alias("loyalty_tier"),
        )
    )
    eng.write.merge("dbo.cust_ae", src, upsert=True, auto_evolve=True)
    return eng.read.table("dbo.cust_ae")


@register(
    "verb_delete_where",
    sql="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_orderkey <= 8000
      AND NOT (l_quantity >= 45 AND l_discount > 0.05)
    """,
)
def verb_delete_where(spark, sf_dir):
    """Predicate DELETE (write.delete_where — Delta ``DELETE WHERE``
    analog; core/write/delete.py:delete_where_op). One slim scan
    (predicate columns + _metadata.file_path) finds the files holding
    matches; untouched files carry by manifest reference and only
    touched files rewrite with the negated predicate — cost ∝ matching
    files. tests/test_delete_where.py pins by-reference carry, NULL
    row retention, and the commit-nothing no-match path."""
    eng = _scratch_engine(spark)
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 8000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    )
    # auto identity _pk: the synthetic lineitem repeats (orderkey,
    # linenumber) pairs and insert enforces PK uniqueness
    eng.create.table_from_dataframe("dbo.li_dw", li, sql_primary_key=True)
    eng.write.insert("dbo.li_dw", li)
    n = eng.write.delete_where(
        "dbo.li_dw", "l_quantity >= 45 AND l_discount > 0.05"
    )
    assert n > 0, "the predicate matches rows at every sf"
    return eng.read.table("dbo.li_dw").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )


@register(
    "verb_stats_metadata_read",
    sql="""
    SELECT 'o_custkey' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(o_custkey) AS VARCHAR) AS "min",
           CAST(MAX(o_custkey) AS VARCHAR) AS "max"
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', CAST(COUNT(*) AS BIGINT),
           CAST(MIN(o_orderkey) AS VARCHAR),
           CAST(MAX(o_orderkey) AS VARCHAR)
    FROM orders
    """,
)
def verb_stats_metadata_read(spark, sf_dir):
    """Metadata-only statistics (read.table_stats): COUNT/MIN/MAX
    answered purely from the manifest's per-file footer stats — zero
    data scan, the Delta count-from-log optimization generalized to
    MIN/MAX of stats-tracked columns. The oracle computes the same
    numbers by scanning the actual data, so a green row PROVES the
    manifest stats are exact, not estimates. o_custkey is tracked via
    the stats_columns property (the multi-column stats machinery
    behind Z-ORDER pruning); o_orderkey rides the primary-key stats."""
    eng = _scratch_engine(spark)
    orders = _t(spark, sf_dir, "orders")
    eng.create.table_from_dataframe(
        "dbo.orders_ms", orders, primary_key="o_orderkey"
    )
    eng.store.update_meta(
        "dbo.orders_ms", properties={"stats_columns": ["o_custkey"]}
    )
    eng.write.insert("dbo.orders_ms", orders)
    return eng.read.table_stats(
        "dbo.orders_ms", ["o_custkey", "o_orderkey"]
    )


@register(
    "verb_computed_columns",
    sql="""
    WITH src AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders WHERE o_orderkey <= 4000
    ), upd AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 50000.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderdate
      FROM src
    )
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
           CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
           CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS price_band
    FROM upd
    """,
)
def verb_computed_columns(spark, sf_dir):
    """Computed columns (modify.computed_column — SQL Server ``ADD col
    AS (expr) PERSISTED`` analog, core/generated.py): whitelist-
    validated expression, backfilled once, RECOMPUTED by the engine on
    every write (the update below shifts o_totalprice and price_band
    follows), explicit writes rejected like SQL Server error 271.
    Zero extra Spark jobs — materialization is a column expression on
    the frames the writes already produce."""
    from mssql_dataframe_spark.errors import DataframeColumnInvalidValue

    eng = _scratch_engine(spark)
    src = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 4000)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )
    eng.create.table_from_dataframe(
        "dbo.orders_gc", src, primary_key="o_orderkey"
    )
    eng.write.insert("dbo.orders_gc", src)
    eng.modify.computed_column(
        "dbo.orders_gc", "add", "o_year", "year(o_orderdate)", "bigint"
    )
    eng.modify.computed_column(
        "dbo.orders_gc", "add", "price_band",
        "floor(o_totalprice / 50000)", "bigint",
    )
    upd = src.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 50000.0).alias("o_totalprice"),
    )
    eng.write.update("dbo.orders_gc", upd)
    bad = src.limit(1).withColumn("o_year", F.lit(1999).cast("bigint"))
    try:
        eng.write.insert("dbo.orders_gc", bad)
        raise AssertionError("explicit computed-column write must fail")
    except DataframeColumnInvalidValue:
        pass
    return eng.read.table("dbo.orders_gc")


@register(
    "verb_row_level_security",
    sql="""
    SELECT c_custkey, c_name,
           CASE WHEN c_acctbal IS NULL THEN NULL
                ELSE CAST(0 AS DOUBLE) END AS c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0
      AND c_custkey <= 1400
    """,
)
def verb_row_level_security(spark, sf_dir):
    """Row-Level Security (modify.row_filter_policy — SQL Server
    security-policy FILTER PREDICATE analog): declared predicates
    apply silently on every read, AND-ed together, BEFORE projection
    (the policy here references c_mktsegment, which the returned
    projection drops — exactly how RLS hides the filtering column),
    composing with Dynamic Data Masking on c_acctbal. The predicates
    push into the scan like any filter; bypass_row_filters is the
    admin escape hatch (tests/test_row_filters.py)."""
    eng = _scratch_engine(spark)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1400)
    eng.create.table_from_dataframe(
        "dbo.cust_rls", cust, primary_key="c_custkey"
    )
    eng.write.insert("dbo.cust_rls", cust)
    eng.modify.row_filter_policy(
        "dbo.cust_rls", "add", "building_only", "c_mktsegment = 'BUILDING'"
    )
    eng.modify.row_filter_policy(
        "dbo.cust_rls", "add", "positive_bal", "c_acctbal > 0"
    )
    eng.modify.masking_policy("dbo.cust_rls", "add", "c_acctbal", "default()")
    return eng.read.table(
        "dbo.cust_rls", column_names=["c_custkey", "c_name", "c_acctbal"]
    ).select("c_custkey", "c_name", F.col("c_acctbal").cast("double"))


@register(
    "verb_masked_reads",
    sql="""
    WITH src AS (
      SELECT c_custkey, c_name, c_acctbal,
             'u' || CAST(c_custkey AS VARCHAR) || '@corp.example' AS email
      FROM customer WHERE c_custkey <= 1500
    )
    SELECT c_custkey,
           CASE WHEN c_name IS NULL THEN NULL
                WHEN LENGTH(c_name) <= 5 THEN '...'
                ELSE substring(c_name, 1, 2) || '...'
                     || substring(c_name, LENGTH(c_name) - 2, 3) END AS c_name,
           CASE WHEN c_acctbal IS NULL THEN NULL
                ELSE CAST(0 AS DOUBLE) END AS c_acctbal,
           CASE WHEN email IS NULL THEN NULL
                ELSE substring(email, 1, 1) || 'XXX@XXXX.com' END AS email
    FROM src WHERE c_acctbal > 5000
    """,
)
def verb_masked_reads(spark, sf_dir):
    """Dynamic Data Masking (modify.masking_policy + read-time
    application, core/masking.py — the SQL Server ``MASKED WITH``
    analog; the reference targets SQL Server, whose DDM this mirrors).
    Policies are metadata (add/drop never rewrites data); reads apply
    partial()/default()/email() masks as built-in column expressions
    LAST, so the ``where`` predicate here filters on REAL acctbal
    values while the output shows masked ones — exactly DDM's
    documented behavior. ``unmask=True`` (the UNMASK permission) is
    pinned by tests/test_masking.py."""
    eng = _scratch_engine(spark)
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 1500)
        .select(
            "c_custkey", "c_name", "c_acctbal",
            F.concat(
                F.lit("u"), F.col("c_custkey").cast("string"),
                F.lit("@corp.example"),
            ).alias("email"),
        )
    )
    eng.create.table_from_dataframe(
        "dbo.cust_ddm", cust, primary_key="c_custkey"
    )
    eng.write.insert("dbo.cust_ddm", cust)
    eng.modify.masking_policy(
        "dbo.cust_ddm", "add", "c_name", "partial(2,'...',3)"
    )
    eng.modify.masking_policy("dbo.cust_ddm", "add", "c_acctbal", "default()")
    eng.modify.masking_policy("dbo.cust_ddm", "add", "email", "email()")
    return eng.read.table("dbo.cust_ddm", where="c_acctbal > 5000")


@register(
    "verb_history",
    sql="""
    SELECT * FROM (VALUES
      (3, 'update', CAST(30 AS BIGINT)),
      (2, 'merge',  CAST(30 AS BIGINT)),
      (1, 'append', CAST(25 AS BIGINT)),
      (0, 'create', CAST(0  AS BIGINT))
    ) AS t(version, operation, n_rows)
    """,
)
def verb_history(spark, sf_dir):
    """Commit history (read.table_history — the DESCRIBE HISTORY
    analog; beyond the reference, which keeps no history): every write
    commits a labeled version, so the audit trail of create -> insert
    -> merge -> update is reconstructable from retained manifests. The
    oracle is the exact expected ledger; n_rows proves each snapshot's
    row total, and the projection excludes file counts (partitioning-
    dependent) and timestamps (non-deterministic)."""
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation")
    eng.create.table_from_dataframe(
        "dbo.nation_hist", nation, primary_key="n_nationkey"
    )
    eng.write.insert("dbo.nation_hist", nation)
    k = F.col("n_nationkey")
    extra = nation.filter(k < 5).select(
        (k + 100).alias("n_nationkey"), "n_name", "n_regionkey"
    )
    eng.write.merge(
        "dbo.nation_hist", nation.unionByName(extra), upsert=True
    )
    eng.write.update(
        "dbo.nation_hist",
        nation.select("n_nationkey", F.lit("X").alias("n_name")),
    )
    return eng.read.table_history("dbo.nation_hist").select(
        "version", "operation", "n_rows"
    )


@register(
    "verb_truncate_reload",
    sql="""
    SELECT r_regionkey, r_name FROM region
    """,
)
def verb_truncate_reload(spark, sf_dir):
    """TRUNCATE TABLE (write.truncate): every row removed as ONE
    metadata commit — empty manifest, no scan or rewrite, O(1) at any
    table size (DELETE without WHERE pays the content-discovery scan).
    Prior versions still serve time travel; FK-referenced tables
    refuse to truncate like SQL Server's. The truncate-and-reload
    below is the classic full-refresh staging flow."""
    eng = _scratch_engine(spark)
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    eng.create.table_from_dataframe(
        "dbo.region_tr", r, primary_key="r_regionkey"
    )
    eng.write.insert("dbo.region_tr", r)
    n = eng.write.truncate("dbo.region_tr")
    assert n == r.count()
    assert eng.read.table("dbo.region_tr").count() == 0
    eng.write.insert("dbo.region_tr", r)  # reload
    return eng.read.table("dbo.region_tr")


@register(
    "verb_merge_stale_flagging",
    sql="""
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment
                ELSE 'STALE' END AS c_mktsegment
    FROM customer WHERE c_custkey <= 900
    """,
)
def verb_merge_stale_flagging(spark, sf_dir):
    """T-SQL MERGE's third clause — WHEN NOT MATCHED BY SOURCE THEN
    UPDATE SET (write.merge(not_matched_by_source_set=...)): rows the
    source no longer carries are FLAGGED in place instead of deleted,
    the standard soft-delete/stale-marking feed shape. SET expressions
    use the computed-column whitelist grammar over target columns and
    see pre-update values, per SQL semantics. The keep rule follows
    T-SQL: an UPDATE clause for not-matched-by-source retains the
    row."""
    eng = _scratch_engine(spark)
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 900)
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    eng.create.table_from_dataframe(
        "dbo.cust_stale", cust, primary_key="c_custkey"
    )
    eng.write.insert("dbo.cust_stale", cust)
    still_active = cust.filter(F.col("c_custkey") % 3 == 0)
    eng.write.merge(
        "dbo.cust_stale",
        still_active,
        not_matched_by_source_set={"c_mktsegment": "'STALE'"},
    )
    return eng.read.table("dbo.cust_stale")


@register(
    "pipeline_cdc_to_scd2",
    sql="""
    WITH base AS (
      SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 400
    )
    SELECT c_custkey, c_mktsegment,
           TIMESTAMP '2024-01-01 00:00:00' AS _valid_from,
           CASE WHEN c_custkey % 4 = 0
                THEN TIMESTAMP '2024-02-01 00:00:00' END AS _valid_to,
           (c_custkey % 4 <> 0) AS _is_current
    FROM base
    UNION ALL
    SELECT c_custkey, 'MOVED', TIMESTAMP '2024-02-01 00:00:00', NULL, TRUE
    FROM base WHERE c_custkey % 4 = 0
    """,
)
def pipeline_cdc_to_scd2(spark, sf_dir):
    """CDC-driven dimension maintenance — the composed warehouse
    pipeline: a source table's mutation is captured with
    ``table_changes`` (manifest-diff CDC, cost ∝ touched files) and
    ONLY the changed keys merge into the type-2 dimension
    (merge_scd2). The dimension never re-reads the full source after
    initialization; unchanged keys never enter the merge. The oracle
    states the exact expected history: originals closed at T2 where
    the source changed, re-versioned rows current, everything else
    untouched."""
    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 400)
        .select("c_custkey", "c_mktsegment")
    )
    eng.create.table_from_dataframe(
        "dbo.cust_src_cdc", base, primary_key="c_custkey"
    )
    eng.write.insert("dbo.cust_src_cdc", base)
    v1 = eng.store.meta("dbo.cust_src_cdc").version

    eng.create.table(
        "dbo.cust_dim_scd2",
        {
            "c_custkey": "bigint",
            "c_mktsegment": "nvarchar(40)",
            "_valid_from": "datetime2",
            "_valid_to": "datetime2",
            "_is_current": "bit",
        },
    )
    t1 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    t2 = F.lit("2024-02-01 00:00:00").cast("timestamp_ntz")
    eng.write.merge_scd2(
        "dbo.cust_dim_scd2", base, match_columns=["c_custkey"], as_of=t1
    )

    upd = base.filter(F.col("c_custkey") % 4 == 0).select(
        "c_custkey", F.lit("MOVED").alias("c_mktsegment")
    )
    eng.write.update("dbo.cust_src_cdc", upd)
    v2 = eng.store.meta("dbo.cust_src_cdc").version

    changes = eng.read.table_changes("dbo.cust_src_cdc", v1, v2)
    delta = changes.filter(
        F.col("change_type").isin("insert", "update")
    ).select(
        "c_custkey", F.col("new_c_mktsegment").alias("c_mktsegment")
    )
    eng.write.merge_scd2(
        "dbo.cust_dim_scd2", delta, match_columns=["c_custkey"], as_of=t2
    )
    return eng.read.table("dbo.cust_dim_scd2")


@register(
    "verb_merge_scd2",
    sql="""
    WITH base AS (
      SELECT c_custkey, c_name, c_acctbal
      FROM customer WHERE c_custkey <= 300
    )
    SELECT c_custkey, c_name, c_acctbal,
           TIMESTAMP '2024-01-01 00:00:00' AS _valid_from,
           CASE WHEN c_custkey % 3 = 0
                THEN TIMESTAMP '2024-06-01 00:00:00' END AS _valid_to,
           (c_custkey % 3 <> 0) AS _is_current
    FROM base
    UNION ALL
    SELECT c_custkey, 'V2', c_acctbal + 50.0,
           TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
    FROM base WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT c_custkey + 1000, 'NEW', 0.0,
           TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
    FROM base WHERE c_custkey <= 20
    """,
)
def verb_merge_scd2(spark, sf_dir):
    """Slowly-changing-dimension type-2 merge (write.merge_scd2,
    core/write/scd2.py — beyond the reference, whose MERGE at
    merge.py:14-248 overwrites history): load 1 at T1 makes every row
    current; load 2 at T2 mixes changed rows (closed + re-versioned),
    no-op rows (pass through untouched), and brand-new keys. The
    oracle reconstructs the exact history table in pure SQL."""
    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    eng.create.table(
        "dbo.cust_scd2",
        {
            "c_custkey": "bigint",
            "c_name": "nvarchar(200)",
            "c_acctbal": "float",
            "_valid_from": "datetime2",
            "_valid_to": "datetime2",
            "_is_current": "bit",
        },
    )
    t1 = F.lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    t2 = F.lit("2024-06-01 00:00:00").cast("timestamp_ntz")
    eng.write.merge_scd2(
        "dbo.cust_scd2", base, match_columns=["c_custkey"], as_of=t1
    )
    k = F.col("c_custkey")
    changed = base.filter(k % 3 == 0).select(
        "c_custkey",
        F.lit("V2").alias("c_name"),
        (F.col("c_acctbal") + F.lit(50.0)).alias("c_acctbal"),
    )
    noop = base.filter((k % 5 == 1) & (k % 3 != 0))
    fresh = base.filter(k <= 20).select(
        (k + 1000).alias("c_custkey"),
        F.lit("NEW").alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    eng.write.merge_scd2(
        "dbo.cust_scd2",
        changed.unionByName(noop).unionByName(fresh),
        match_columns=["c_custkey"],
        as_of=t2,
    )
    return eng.read.table("dbo.cust_scd2").select(
        "c_custkey", "c_name", "c_acctbal",
        "_valid_from", "_valid_to", "_is_current",
    )


@register(
    "mv_incremental_update",
    sql="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,4)) AS price
      FROM orders WHERE o_custkey < 300
    ),
    final AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey % 2 = 0
                  THEN price + CAST(10 AS DECIMAL(18,4))
                  ELSE price END AS price
      FROM base WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey + 1000, price
      FROM base WHERE o_orderkey % 11 = 0
    )
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(price) AS DOUBLE) AS sum_price
    FROM final GROUP BY o_custkey
    """,
)
def mv_incremental_update(spark, sf_dir):
    """Incremental materialized-view maintenance (operators/
    incremental.py): the v0 aggregate is updated from the load's
    change feed (read.table_changes -> agg_delta -> apply_agg_delta)
    instead of rescanned — cost proportional to changed keys. DECIMAL
    fact values make delta arithmetic exact, so the maintained MV is
    bit-identical to the oracle's full recompute of the final state
    (inserts, updates, and deletes all present in one merge)."""
    from .operators.incremental import agg_delta, apply_agg_delta

    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        )
    )
    eng.create.table(
        "dbo.fact_mv",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "price": "decimal(18,4)"},
        primary_key_column="o_orderkey",
    )
    eng.write.insert("dbo.fact_mv", base)
    v_ins = eng.store.meta("dbo.fact_mv").version  # create=v0, insert=v1
    mv0 = (
        eng.read.table("dbo.fact_mv", version=v_ins)
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("price").alias("sum_price"),
        )
    )
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    survivors = base.filter(ok % 7 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(ck % 2 == 0, F.col("price") + F.lit(10).cast("decimal(18,4)"))
        .otherwise(F.col("price"))
        .cast("decimal(18,4)")
        .alias("price"),
    )
    inserts = base.filter(ok % 11 == 0).select(
        (ok + 10000000).alias("o_orderkey"),
        (ck + 1000).alias("o_custkey"),
        "price",
    )
    eng.write.merge(
        "dbo.fact_mv",
        survivors.unionByName(inserts),
        match_columns=["o_orderkey"],
    )
    cdc = eng.read.table_changes("dbo.fact_mv", from_version=v_ins)
    delta = agg_delta(cdc, ["o_custkey"], {"sum_price": "price"})
    mv = apply_agg_delta(mv0, delta, ["o_custkey"], ["sum_price"])
    return mv.select(
        "o_custkey", "n_rows",
        F.col("sum_price").cast("double").alias("sum_price"),
    )


@register(
    "embedding_semantic_dedup",
    sql="""
    WITH qe AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * 1024 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    qn AS (
      SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nv
      FROM qe
    ),
    cent AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             q AS cq, nv AS nc
      FROM (SELECT vec_id, q, nv FROM qn ORDER BY vec_id LIMIT 8)
    ),
    dots AS (
      SELECT e.vec_id, e.q, e.nv, c.cid, c.nc,
             CAST(list_sum(list_transform(list_zip(e.q, c.cq),
                                          p -> p[1] * p[2]))
                  AS BIGINT) AS cdot
      FROM qn e CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, cid, q, nv FROM (
        SELECT vec_id, cid, q, nv,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id
                 ORDER BY nv + nc - 2 * cdot, cid) AS rn
        FROM dots) WHERE rn = 1
    ),
    rep AS (
      SELECT cid, min(vec_id) AS rep_id FROM assign GROUP BY cid
    ),
    scored AS (
      SELECT a.vec_id, a.cid, a.nv, r.rep_id, b.nv AS nr,
             CAST(list_sum(list_transform(list_zip(a.q, b.q),
                                          p -> p[1] * p[2]))
                  AS BIGINT) AS rdot
      FROM assign a
      JOIN rep r ON a.cid = r.cid
      JOIN assign b ON b.vec_id = r.rep_id
    )
    SELECT vec_id, cid AS cluster_id,
           (vec_id <> rep_id AND rdot > 0
            AND 10000 * rdot * rdot >= 1200 * nv * nr) AS is_dup
    FROM scored
    """,
)
def embedding_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (operators/similarity.py:
    semantic_dedup): cluster to k deterministic centroids, flag
    members cosine-similar to their cluster representative. The
    keep/drop verdict is computed entirely in int64 (power-of-two
    quantization + squared-cosine inequality), so engine and oracle
    agree exactly — no float threshold straddling. The gate threshold
    (cos^2 >= 0.12) is data-scaled: the synthetic embeddings are
    near-orthogonal (max within-cluster cos^2 ~= 0.24), so a
    production 0.9 cutoff would never fire and leave the dup branch
    unexercised; the default stays 0.9 for real corpora."""
    from .operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, k=8, tau_sq_bp=1200, quant=1024)


def _kmeans_oracle_sql(k: int = 8, iters: int = 3,
                       quant: int = 1024, dim: int = 64) -> str:
    """Unrolled-CTE DuckDB twin of kmeans_quantized: because every
    Lloyd step is integer-exact on the 1/quant grid, the iterative
    algorithm is expressible as a FLAT chain of ``iters`` assignment +
    mean CTEs that reproduces Spark's result bit-for-bit."""
    zipdot = ("CAST(list_sum(list_transform(list_zip(e.q, c.cq), "
              "p -> p[1] * p[2])) AS BIGINT)")
    dist = f"e.nv + c.nc - 2 * {zipdot}"
    parts = [f"""
    qn AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * {quant} + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    qe AS (
      SELECT vec_id, q,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nv
      FROM qn
    ),
    c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             q AS cq,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nc
      FROM (SELECT vec_id, q FROM qe ORDER BY vec_id LIMIT {k})
    )"""]
    for i in range(iters):
        parts.append(f""",
    a{i} AS (
      SELECT vec_id, q, cid, dist FROM (
        SELECT e.vec_id, e.q, c.cid, {dist} AS dist,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM qe e CROSS JOIN c{i} c) WHERE rn = 1
    )""")
        if i < iters - 1:
            parts.append(f""",
    m{i} AS (
      SELECT cid, i AS pos,
             CAST(SUM(q[CAST(i AS INT)]) AS BIGINT) AS s,
             COUNT(*) AS n
      FROM a{i}, range(1, {dim} + 1) r(i)
      GROUP BY cid, i
    ),
    cm{i} AS (
      SELECT cid,
             list(CAST(FLOOR((2 * s + n) / (2.0 * n)) AS BIGINT)
                  ORDER BY pos) AS cq
      FROM m{i} GROUP BY cid
    ),
    c{i + 1} AS (
      SELECT p.cid, COALESCE(m.cq, p.cq) AS cq,
             CAST(list_sum(list_transform(COALESCE(m.cq, p.cq),
                                          x -> x * x)) AS BIGINT) AS nc
      FROM c{i} p LEFT JOIN cm{i} m ON p.cid = m.cid
    )""")
    parts.append(f"""
    SELECT cid, COUNT(*) AS n_members, CAST(SUM(dist) AS BIGINT) AS inertia_q
    FROM a{iters - 1} GROUP BY cid
    """)
    return "WITH" + "".join(parts[:-1])[1:] + parts[-1]


def _pagerank_oracle_sql(iters: int = 5) -> str:
    """The SAME integer PageRank (operators/graph.py) unrolled into a
    flat CTE chain — one CTE per iteration, like the k-means oracle.
    CASTs guard DuckDB's SUM->HUGEINT widening."""
    parts = ["""WITH bp AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey * 2 AS c_node, 2 * l.l_suppkey + 1 AS s_node
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), edges AS MATERIALIZED (
      SELECT c_node AS src, s_node AS dst FROM bp
      UNION ALL
      SELECT s_node, c_node FROM bp
    ), outdeg AS MATERIALIZED (
      SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT node_id FROM (
        SELECT src AS node_id FROM edges
        UNION ALL SELECT dst FROM edges)
    ), r0 AS MATERIALIZED (
      SELECT node_id, CAST(1000000 AS BIGINT) AS rank_q FROM nodes
    )"""]
    for k in range(1, iters + 1):
        parts.append(f""", r{k} AS MATERIALIZED (
      SELECT n.node_id,
             CAST(150000 + (85 * COALESCE(s.in_sum, 0)) // 100 AS BIGINT)
               AS rank_q
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node_id,
               CAST(SUM(r.rank_q // d.outdeg) AS BIGINT) AS in_sum
        FROM edges e
        JOIN r{k - 1} r ON r.node_id = e.src
        JOIN outdeg d ON d.src = e.src
        GROUP BY e.dst) s ON s.node_id = n.node_id
    )""")
    parts.append(f"\n    SELECT node_id, rank_q FROM r{iters}")
    return "".join(parts)


@register("pagerank_customer_supplier", sql=_pagerank_oracle_sql())
def pagerank_customer_supplier(spark, sf_dir):
    """Damped PageRank (operators/graph.py pagerank_quantized) over the
    bipartite customer<->supplier purchase graph (edge when a customer
    bought from a supplier; both directions so the walk mixes). All
    arithmetic is int64 micro-units with integer floor division, so 5
    iterations reproduce bit-for-bit on any engine; the oracle unrolls
    the identical update rule into one CTE per iteration. One shuffle
    per iteration (contribution agg by dst) — the irreducible
    PageRank cost; lineage is checkpoint-truncated per iteration.
    The edge list is distinct by construction (``bp`` is a distinct
    projection and the two union branches have disjoint node parity),
    so the operator's defensive edge dedup — a full shuffle of the
    largest frame — is skipped via ``assume_distinct=True``; and the
    symmetrizing union guarantees every node appears as a destination
    (each bp pair emits both directions), so the per-iteration
    no-in-edge left join is skipped via
    ``assume_all_nodes_have_in_edges=True``."""
    from mssql_dataframe_spark.operators import graph as G

    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    bp = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
        # both union branches below carry this join+distinct; pin it
        # so the symmetrizing union is two projections of a leaf, not
        # two executions of the lineitem join (the operator pins the
        # UNIONED edge list again, but that materialization would
        # otherwise run this DAG twice inside one job)
        .localCheckpoint(eager=True)
    )
    edges = bp.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionAll(
        bp.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    )
    return G.pagerank_quantized(
        edges,
        iters=5,
        assume_distinct=True,
        assume_all_nodes_have_in_edges=True,
    )


@register("kmeans_codebook_train", sql=_kmeans_oracle_sql())
def kmeans_codebook_train(spark, sf_dir):
    """Integer-exact Lloyd k-means (operators/similarity.py:
    kmeans_quantized): the codebook trainer behind IVF/SemDeDup. All
    arithmetic lives on the 1/1024 grid in int64 — assignment,
    round-half-up centroid means, inertia — so 3 Lloyd iterations
    reproduce bit-for-bit on any engine, and the oracle is the SAME
    algorithm unrolled into flat SQL CTEs. Per-cluster sizes and
    exact integer inertia are the graded output."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.kmeans_quantized(emb, k=8, iters=3, quant=1024)


def _pq_chain_parts(m: int, k: int, iters: int,
                    quant: int, dim: int) -> list:
    """Shared unrolled per-subspace Lloyd CTE chains for the PQ
    oracles (the _kmeans_oracle_sql shape applied to a ``q[lo:hi]``
    slice per subspace)."""
    sub = dim // m
    parts = [f"""
    qn AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * {quant} + 0.5) AS BIGINT)) AS q
      FROM embeddings
    )"""]
    zipdot = ("CAST(list_sum(list_transform(list_zip(e.q, c.cq), "
              "p -> p[1] * p[2])) AS BIGINT)")
    dist = f"e.nv + c.nc - 2 * {zipdot}"
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(f""",
    e{s} AS (
      SELECT vec_id, q[{lo}:{hi}] AS q,
             CAST(list_sum(list_transform(q[{lo}:{hi}], x -> x * x))
                  AS BIGINT) AS nv
      FROM qn
    ),
    c{s}x0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             q AS cq,
             CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS nc
      FROM (SELECT vec_id, q FROM e{s} ORDER BY vec_id LIMIT {k})
    )""")
        for i in range(iters):
            parts.append(f""",
    a{s}x{i} AS (
      SELECT vec_id, q, cid, dist FROM (
        SELECT e.vec_id, e.q, c.cid, {dist} AS dist,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM e{s} e CROSS JOIN c{s}x{i} c) WHERE rn = 1
    )""")
            if i < iters - 1:
                parts.append(f""",
    m{s}x{i} AS (
      SELECT cid, i AS pos,
             CAST(SUM(q[CAST(i AS INT)]) AS BIGINT) AS s,
             COUNT(*) AS n
      FROM a{s}x{i}, range(1, {sub} + 1) r(i)
      GROUP BY cid, i
    ),
    cm{s}x{i} AS (
      SELECT cid,
             list(CAST(FLOOR((2 * s + n) / (2.0 * n)) AS BIGINT)
                  ORDER BY pos) AS cq
      FROM m{s}x{i} GROUP BY cid
    ),
    c{s}x{i + 1} AS (
      SELECT p.cid, COALESCE(mm.cq, p.cq) AS cq,
             CAST(list_sum(list_transform(COALESCE(mm.cq, p.cq),
                                          x -> x * x)) AS BIGINT) AS nc
      FROM c{s}x{i} p LEFT JOIN cm{s}x{i} mm ON p.cid = mm.cid
    )""")
    return parts


def _pq_oracle_sql(m: int = 2, k: int = 4, iters: int = 2,
                   quant: int = 1024, dim: int = 64) -> str:
    """Unrolled-CTE DuckDB twin of pq_train_encode: the per-subspace
    Lloyd chains, then the m final assignments join on the vector id
    for codes + exact reconstruction error."""
    parts = _pq_chain_parts(m, k, iters, quant, dim)
    joins = " ".join(
        f"JOIN a{s}x{iters - 1} s{s} USING (vec_id)" for s in range(1, m)
    )
    codes = ", ".join(
        [f"s0.cid AS code_0"]
        + [f"s{s}.cid AS code_{s}" for s in range(1, m)]
    )
    errs = " + ".join(
        ["s0.dist"] + [f"s{s}.dist" for s in range(1, m)]
    )
    parts.append(f"""
    SELECT vec_id, {codes}, CAST({errs} AS BIGINT) AS recon_err_q
    FROM a0x{iters - 1} s0 {joins}
    """)
    return "WITH" + "".join(parts[:-1])[1:] + parts[-1]


def _pq_adc_oracle_sql(query_ids: tuple = (0, 1, 2), topk: int = 5,
                       m: int = 2, k: int = 4, iters: int = 2,
                       quant: int = 1024, dim: int = 64,
                       ivf: tuple | None = None) -> str:
    """Unrolled-CTE DuckDB twin of pq_adc_topk: the shared per-
    subspace Lloyd chains, per-(query, centroid) exact distance
    tables, code-joined ADC scores, ROW_NUMBER top-k. With
    ``ivf=(centroid_mod, nprobe)`` it becomes the ivfpq_topk twin:
    a coarse codebook (ids ≡ 1 mod centroid_mod on the full
    quantized grid), exact-int argmin list assignment, and a
    per-query nprobe probe filter joined into the scored set."""
    sub = dim // m
    parts = _pq_chain_parts(m, k, iters, quant, dim)
    ids = ", ".join(str(i) for i in query_ids)
    last = iters - 1
    ivf_joins = ""
    if ivf is not None:
        centroid_mod, nprobe = ivf
        zipd = ("CAST(list_sum(list_transform(list_zip(f.q, c.cq), "
                "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)")
        parts.append(f""",
    cc AS (
      SELECT vec_id AS ccid, q AS cq FROM qn
      WHERE vec_id % {centroid_mod} = 1
    ),
    asg AS (
      SELECT vec_id, ccid FROM (
        SELECT f.vec_id, c.ccid,
               ROW_NUMBER() OVER (PARTITION BY f.vec_id
                                  ORDER BY {zipd}, c.ccid) AS rn
        FROM qn f CROSS JOIN cc c) WHERE rn = 1
    ),
    probe AS (
      SELECT query_id, ccid FROM (
        SELECT f.vec_id AS query_id, c.ccid,
               ROW_NUMBER() OVER (PARTITION BY f.vec_id
                                  ORDER BY {zipd}, c.ccid) AS rn
        FROM qn f CROSS JOIN cc c
        WHERE f.vec_id IN ({ids})) WHERE rn <= {nprobe}
    )""")
        ivf_joins = (
            " JOIN asg ON asg.vec_id = s0.vec_id"
            " JOIN probe pr ON pr.query_id = q0.query_id"
            " AND pr.ccid = asg.ccid"
        )
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(f""",
    qs{s} AS (
      SELECT vec_id AS query_id, q[{lo}:{hi}] AS u
      FROM qn WHERE vec_id IN ({ids})
    ),
    qd{s} AS (
      SELECT u.query_id, c.cid,
             CAST(list_sum(list_transform(list_zip(u.u, c.cq),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS d
      FROM qs{s} u CROSS JOIN c{s}x{last} c
    )""")
    joins = " ".join(
        f"JOIN a{s}x{last} s{s} USING (vec_id)" for s in range(1, m)
    )
    qjoins = " ".join(
        [f"JOIN qd0 q0 ON q0.cid = s0.cid"]
        + [
            f"JOIN qd{s} q{s} ON q{s}.cid = s{s}.cid "
            f"AND q{s}.query_id = q0.query_id"
            for s in range(1, m)
        ]
    )
    score = " + ".join(f"q{s}.d" for s in range(m))
    parts.append(f""",
    sc AS (
      SELECT q0.query_id, s0.vec_id,
             CAST({score} AS BIGINT) AS adc_score_q
      FROM a0x{last} s0 {joins} {qjoins}{ivf_joins}
    )
    SELECT query_id, CAST(rn AS INT) AS rank, vec_id, adc_score_q
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_score_q, vec_id) AS rn
      FROM sc) WHERE rn <= {topk}
    """)
    return "WITH" + "".join(parts[:-1])[1:] + parts[-1]


@register("pq_adc_search", sql=_pq_adc_oracle_sql())
def pq_adc_search(spark, sf_dir):
    """Asymmetric-distance PQ search (operators/similarity.py
    pq_adc_topk): after per-subspace codebook training + encoding,
    each query is answered with m table lookups per corpus vector —
    the IVF-PQ scan stage, touching only the m code columns, never
    the original vectors. Per-query distance tables are m*k exact
    ints broadcast onto the encoded corpus; top-5 per query with
    (score, vec_id) tie-breaks. The oracle replays training, the
    tables, the code-joined scores, and the ranking in flat SQL."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.pq_adc_topk(
        emb, query_ids=[0, 1, 2], topk=5, m=2, k=4, iters=2,
        quant=1024, dim=64,
    )


@register("pq_codebook_encode", sql=_pq_oracle_sql())
def pq_codebook_encode(spark, sf_dir):
    """Product quantization (operators/similarity.py pq_train_encode):
    the IVF-PQ compression standard — per-subspace integer-exact
    Lloyd codebooks, each vector encoded as m code ids with an exact
    int64 squared reconstruction error. Training reuses the
    kmeans_quantized arithmetic so the whole train+encode pipeline is
    bit-reproducible, and the oracle is the SAME per-subspace Lloyd
    unrolled into flat SQL CTEs joined on the vector id. Per-vector
    codes + reconstruction error are the graded output — the exact
    quantities a PQ index stores and minimizes."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.pq_train_encode(emb, m=2, k=4, iters=2, quant=1024, dim=64)


@register(
    "embedding_int8_quantize",
    sql="""
    WITH s AS (
      SELECT vec_id, embedding,
             CAST(list_max(list_transform(embedding, x -> abs(x)))
                  AS DOUBLE) / CAST(127 AS DOUBLE) AS scale
      FROM embeddings
    ),
    pos AS (
      SELECT vec_id, embedding, scale,
             unnest(range(1, len(embedding) + 1)) AS i
      FROM s
    )
    SELECT vec_id, CAST(i - 1 AS INT) AS pos,
           CAST(CASE WHEN scale = 0 THEN 0
                     ELSE ROUND(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                                / scale) END
                AS INT) AS qval,
           CAST(ROUND(scale * 1e9) AS BIGINT) AS scale_ppb
    FROM pos
    """,
)
def embedding_int8_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization (operators/
    similarity.py:int8_quantize): 4x embedding compression for
    corpus-scale storage. Pure narrow transform + posexplode — no
    shuffle; double-precision IEEE arithmetic matches the oracle
    bit-for-bit."""
    from .operators.similarity import int8_quantize

    emb = _t(spark, sf_dir, "embeddings")
    q = int8_quantize(emb)
    # integer parts-per-billion scale: cross-engine comparable without
    # double-formatting pitfalls (round(double, n) differs subtly)
    return q.select(
        "vec_id", "pos", "qval",
        F.round(F.col("scale") * 1e9).cast("bigint").alias("scale_ppb"),
    )


@register(
    "window_value_functions",
    sql="""
    SELECT event_id, user_id,
           FIRST_VALUE(value) OVER w AS first_val,
           LAST_VALUE(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS last_val,
           NTH_VALUE(value, 3) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING) AS third_val,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume
    FROM (SELECT event_id, user_id, value,
                 make_timestamp(epoch_us(ts)) AS ts
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_value_functions(spark, sf_dir):
    """Window value-function surface (SURVEY §2.5): first/last/nth
    value with explicit ROWS frames plus percent_rank and cume_dist,
    per user ordered by (ts, event_id) — the unique tiebreak makes the
    result engine-portable. One window shuffle on user_id."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = base.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(full).alias("last_val"),
        F.nth_value("value", 3).over(full).alias("third_val"),
        F.round(F.percent_rank().over(base), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(base), 9).alias("cume"),
    )


@register(
    "verb_table_changes",
    sql="""
    SELECT n_nationkey, 'update' AS change_type,
           n_name AS old_n_name, n_regionkey AS old_n_regionkey,
           'UPD' AS new_n_name, n_regionkey AS new_n_regionkey
    FROM nation WHERE n_nationkey < 10
    UNION ALL
    SELECT n_nationkey, 'delete', n_name, n_regionkey, NULL, NULL
    FROM nation WHERE n_nationkey >= 10
    UNION ALL
    SELECT n_nationkey + 100, 'insert', NULL, NULL, 'NEW', n_regionkey
    FROM nation WHERE n_nationkey < 5
    """,
)
def verb_table_changes(spark, sf_dir):
    """Change-data-feed between snapshots (read.table_changes,
    core/read.py — Delta CDF analog, beyond the reference which keeps
    no history): one merge produces all three change types at once
    (updates for keys<10, inserts for keys+100, deletes for the
    unmatched rest since upsert=False), then the post-insert-version vs
    current diff classifies every changed key with old/new value pairs."""
    eng = _scratch_engine(spark)
    nation = _t(spark, sf_dir, "nation")
    eng.create.table_from_dataframe(
        "dbo.nation_cdc", nation, primary_key="n_nationkey"
    )
    eng.write.insert("dbo.nation_cdc", nation)
    v_ins = eng.store.meta("dbo.nation_cdc").version
    k = F.col("n_nationkey")
    updates = nation.filter(k < 10).select(
        "n_nationkey", F.lit("UPD").alias("n_name"), "n_regionkey"
    )
    inserts = nation.filter(k < 5).select(
        (k + 100).alias("n_nationkey"),
        F.lit("NEW").alias("n_name"),
        "n_regionkey",
    )
    eng.write.merge(
        "dbo.nation_cdc",
        updates.unionByName(inserts),
        match_columns=["n_nationkey"],
    )
    return eng.read.table_changes("dbo.nation_cdc", from_version=v_ins)


@register(
    "doc_chunking",
    sql="""
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           substring(text, CAST(i * 80 + 1 AS INT), 120) AS chunk_text,
           CAST(length(substring(text, CAST(i * 80 + 1 AS INT), 120))
                AS BIGINT) AS chunk_len
    FROM (SELECT doc_id, text,
                 unnest(range(0, ((length(text) - 1) // 80) + 1)) AS i
          FROM documents WHERE length(text) > 0)
    """,
)
def doc_chunking(spark, sf_dir):
    """Fixed-window document chunking with overlap (operators/
    text.py:chunk_documents): context-window packing precursor. Pure
    sequence+explode fan-out — a narrow transformation, zero shuffle."""
    from .operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=120, overlap=40)


@register(
    "char_entropy_quality",
    sql="""
    WITH counts AS (
      SELECT doc_id, ch, COUNT(*) AS cnt
      FROM (SELECT doc_id,
                   substring(text, CAST(i AS INT), 1) AS ch
            FROM (SELECT doc_id, text,
                         unnest(range(1, length(text) + 1)) AS i
                  FROM documents WHERE length(text) > 0))
      GROUP BY doc_id, ch
    )
    SELECT doc_id,
           ROUND(log2(SUM(cnt)) - SUM(cnt * log2(cnt)) / SUM(cnt), 6)
             AS char_entropy,
           CAST(COUNT(*) AS BIGINT) AS distinct_chars
    FROM counts GROUP BY doc_id
    """,
)
def char_entropy_quality(spark, sf_dir):
    """Per-document character Shannon entropy (operators/
    text.py:char_entropy): degenerate-text / binary-noise quality
    signal. Two hash aggregates on naturally high-cardinality keys,
    all JVM-side; the log2(N)-sum(c*log2 c)/N identity avoids a
    window pass."""
    from .operators.text import char_entropy

    docs = _t(spark, sf_dir, "documents")
    return char_entropy(docs)


@register(
    "per_source_cap",
    sql="""
    SELECT doc_id, text, lang, source, n_chars FROM (
      SELECT *, row_number() OVER
               (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents) t
    WHERE rn <= 10
    """,
)
def per_source_cap(spark, sf_dir):
    """Per-domain document cap (operators/curation.py:per_source_cap):
    the CommonCrawl curation rule that stops one domain from dominating
    the mixture. One row_number window shuffle on the domain key."""
    from .operators.curation import per_source_cap as cap_op

    docs = _t(spark, sf_dir, "documents")
    return cap_op(docs, cap=10, by="source", order_col="doc_id").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@register(
    "python_udtf_char_ngrams",
    sql="""
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           substring(n_name, CAST(i AS INT), 3) AS gram,
           CAST(i - 1 AS INT) AS pos
    FROM (SELECT n_nationkey, n_name,
                 unnest(range(1, len(n_name) - 1)) AS i
          FROM nation)
    """,
)
def python_udtf_char_ngrams(spark, sf_dir):
    """Real Python UDTF (Spark 4 table function, SURVEY §2.5 UDTF
    slot): one input row fans out to one row per character trigram via
    LATERAL. Row-at-a-time by design — the vectorized fan-out twin is
    posexplode_tokens; this pins the UDTF API surface itself."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="n_nationkey bigint, gram string, pos int")
    class NGrams:
        def eval(self, key: int, name: str):
            if name is not None:
                for i in range(len(name) - 2):
                    yield key, name[i : i + 3], i

    spark.udtf.register("ngrams3", NGrams)
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_udtf_v")
    return spark.sql(
        "SELECT t.n_nationkey, t.gram, t.pos "
        "FROM nation_udtf_v, LATERAL ngrams3(n_nationkey, n_name) t"
    )


@register(
    "map_functions",
    sql="""
    SELECT n_nationkey,
           map(['name', 'region'],
               [n_name, n_regionkey::VARCHAR])['name'][1] AS name_v,
           CAST(cardinality(map(['name', 'region'],
               [n_name, n_regionkey::VARCHAR])) AS INT) AS n_keys,
           array_to_string(map_keys(map(['name', 'region'],
               [n_name, n_regionkey::VARCHAR])), ',') AS keys_csv
    FROM nation
    """,
)
def map_functions(spark, sf_dir):
    """Map column functions (create/extract/keys) — map cells never
    reach the gate output; extraction renders scalars."""
    n = _t(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        "n_nationkey",
        F.element_at(m, "name").alias("name_v"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


# ---------------------------------------------------------------------------
# data curation (repetition filters, decontamination, PII, mixture audit)
# ---------------------------------------------------------------------------

_TOKS_SQL = r"""CASE WHEN LENGTH(TRIM(text)) = 0 THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(TRIM(text), '\s+') END"""


@register(
    "text_repetition_features",
    sql=rf"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, LENGTH(text) AS n_chars, {_TOKS_SQL} AS toks
      FROM documents
    ),
    g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
                    i -> array_to_string(toks[i:i+1], ' '))) AS gram
      FROM t
    ),
    a2 AS (
      SELECT doc_id,
             MAX(CASE WHEN cnt >= 2 THEN cnt * LENGTH(gram) ELSE 0 END)
               AS top_bigram_chars
      FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2)
      GROUP BY 1
    ),
    g3 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS gram
      FROM t
    ),
    a3 AS (
      SELECT doc_id,
             SUM(CASE WHEN cnt >= 2 THEN cnt * LENGTH(gram) ELSE 0 END)
               AS dup_trigram_chars
      FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2)
      GROUP BY 1
    ),
    m AS (
      SELECT t.doc_id,
             ROUND(CASE WHEN len(toks) > 0
                   THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
                              / len(toks)
                   ELSE 0.0 END, 6) AS dup_word_frac,
             ROUND(CAST(COALESCE(top_bigram_chars, 0) AS DOUBLE)
                   / GREATEST(n_chars, 1), 6) AS top_bigram_char_frac,
             ROUND(CAST(COALESCE(dup_trigram_chars, 0) AS DOUBLE)
                   / GREATEST(n_chars, 1), 6) AS dup_trigram_char_frac
      FROM t LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)
    )
    SELECT doc_id, dup_word_frac, top_bigram_char_frac,
           dup_trigram_char_frac,
           (dup_word_frac > 0.9 OR top_bigram_char_frac > 0.2
            OR dup_trigram_char_frac > 0.6) AS repetition_flag
    FROM m
    """,
)
def text_repetition_features(spark, sf_dir):
    """Gopher-style word-n-gram repetition metrics per document."""
    return C.repetition_features(_t(spark, sf_dir, "documents"))


# the composed curation gate reuses the two verified oracle bodies as
# CTEs, so the composite stays hash-checkable without duplicating SQL
@register(
    "corpus_quality_filter",
    sql=f"""
    WITH q AS ({REGISTRY["text_quality_features"]["sql"]}),
         r AS ({REGISTRY["text_repetition_features"]["sql"]})
    SELECT q.doc_id, q.n_words, q.quality_flag, r.repetition_flag,
           (q.quality_flag AND NOT r.repetition_flag) AS keep
    FROM q JOIN r ON q.doc_id = r.doc_id
    """,
)
def corpus_quality_filter(spark, sf_dir):
    """Composed C4/Gopher-style curation gate: quality heuristics AND
    NOT repetition -> per-document keep verdict (the manifest a
    training run filters on)."""
    return C.quality_filter(_t(spark, sf_dir, "documents"))


@register(
    "quality_weighted_mixture",
    sql=f"""
    WITH flags AS ({{0}}),
    j AS (
      SELECT d.doc_id, d.text, d.source, f.keep
      FROM documents d JOIN flags f ON d.doc_id = f.doc_id
    ),
    rates AS (
      SELECT source,
             GREATEST(1000, CAST(FLOOR(
               (2 * 10000 * SUM(CASE WHEN keep THEN 1 ELSE 0 END)
                + COUNT(*)) / (2.0 * COUNT(*))) AS INT)) AS keep_bp
      FROM j GROUP BY source
    )
    SELECT j.doc_id, j.source, CAST(r.keep_bp AS INT) AS keep_bp
    FROM j JOIN rates r USING (source)
    WHERE (('0x' || substring(md5(j.doc_id::VARCHAR || ':' || j.text),
                              1, 15))::BIGINT) % 10000 < r.keep_bp
    """.format(REGISTRY["corpus_quality_filter"]["sql"]),
)
def quality_weighted_mixture(spark, sf_dir):
    """Quality-proportional source downsampling (operators/curation.py
    quality_weighted_sample): mixture weights DERIVED from each
    source's quality-gate pass rate instead of hand-tuned config — a
    low-quality domain contributes proportionally less of ALL its
    pages. Pass rates become basis points via the integer round-half-
    up formula (no ROUND-mode divergence) and gate the content-keyed
    md5 bucket, so verdicts are engine-exact and stable as the corpus
    grows."""
    return C.quality_weighted_sample(_t(spark, sf_dir, "documents"))


@register(
    "decontamination_overlap",
    sql=rf"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ),
    g AS MATERIALIZED (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' '))) AS gram
      FROM t
    ),
    bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
    tg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 97 <> 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlapping_grams
    FROM tg JOIN bg USING (gram)
    GROUP BY doc_id
    """,
)
def decontamination_overlap(spark, sf_dir):
    """GPT-3-style benchmark decontamination: training docs sharing a
    word n-gram with the (deterministic doc_id%97==0) eval split.
    Production uses n=13; n=3 here because synthetic docs are short.
    The eval gram set is broadcast — the 100 TB side never shuffles
    before the probe."""
    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0)
    train = d.where(F.col("doc_id") % 97 != 0)
    return C.decontaminate(train, bench, n=3)


def _training_mixture_sql() -> str:
    qual = REGISTRY["corpus_quality_filter"]["sql"]
    decon = REGISTRY["decontamination_overlap"]["sql"]
    return f"""
    WITH qual AS ({qual}),
    decon AS ({decon}),
    base AS (
      SELECT doc_id, text, source FROM documents
      WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
        AND doc_id % 97 <> 0
    ),
    s1 AS (
      SELECT b.* FROM base b JOIN qual q ON b.doc_id = q.doc_id AND q.keep
    ),
    s2 AS (
      SELECT b.* FROM s1 b
      JOIN (SELECT md5(text) AS fp, MIN(doc_id) AS k FROM s1 GROUP BY 1) m
        ON b.doc_id = m.k
    ),
    s3 AS (
      SELECT s2.* FROM s2 LEFT JOIN decon d ON s2.doc_id = d.doc_id
      WHERE d.doc_id IS NULL
    ),
    s4 AS (
      SELECT * FROM (
        SELECT s3.*, ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY doc_id) AS rn
        FROM s3) t
      WHERE rn <= 15
    )
    SELECT 'p0_ingested' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM base
    UNION ALL SELECT 'p1_quality', CAST(COUNT(*) AS BIGINT) FROM s1
    UNION ALL SELECT 'p2_exact_dedup', CAST(COUNT(*) AS BIGINT) FROM s2
    UNION ALL SELECT 'p3_decontaminated', CAST(COUNT(*) AS BIGINT) FROM s3
    UNION ALL SELECT 'p4_source_capped', CAST(COUNT(*) AS BIGINT) FROM s4
    """


@register("pipeline_training_mixture", sql=_training_mixture_sql())
def pipeline_training_mixture(spark, sf_dir):
    """The full curation funnel as ONE auditable report — what a
    training-data team reviews before a run: ingest (eval split held
    out) -> C4/Gopher quality gate -> exact dedup (min-id survivor
    per content hash) -> benchmark decontamination -> per-source cap.
    Every stage reuses the corresponding registered operator, and the
    oracle composes the SAME registered SQL twins, so the funnel
    counts are consistent with each individually-graded entry. The
    per-stage count drop-off is the number that gets debated in data
    meetings; here both engines must agree on it exactly."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    # every text-dependent value the funnel needs downstream (the
    # dedup fingerprint) is computed in THIS one scan; the funnel then
    # runs over slim (doc_id, source, fp) rows — the corpus text never
    # shuffles (at 100 TB: KBs/row becomes ~50 B/row)
    base = d.filter(
        F.col("text").isNotNull()
        & (F.length(F.trim(F.col("text"))) > 0)
        & (F.col("doc_id") % 97 != 0)
    ).select(
        "doc_id", "source",
        F.md5(F.col("text").cast("binary")).alias("fp"),
    )
    # persist the slim verdict frame: the cache boundary stops
    # Catalyst from inlining the gate's expression trees (tokenize +
    # n-gram metrics) into the consumer — measured 1.3x slower here
    # without it (6x in the old filter-pushdown shape) at sf0.1.
    qual = C.quality_filter(d).persist().select("doc_id", "keep")
    contaminated = C.decontaminate(
        d.filter(F.col("doc_id") % 97 != 0), bench, n=3
    ).select("doc_id", F.lit(True).alias("__contam"))
    # ONE-PASS funnel (r14 optimization): the five stages are
    # progressive subsets of base, so compute them as FLAGS on one
    # frame instead of five persisted stage frames — the old shape's
    # four persist barriers, the exact-dedup winners join, and five
    # separate aggregate branches collapse into two analytic windows
    # plus one conditional aggregate (29 -> 15 Spark jobs, 7.7 ->
    # 5.6 s at sf0.1; one corpus pass fewer at scale). Semantics are
    # unchanged and oracle-checked:
    #   __q  = survives the quality gate            (old s1)
    #   __w  = __q and lowest-doc_id per fp among __q rows  (old s2:
    #          groupBy(fp).min(doc_id) + join, now a window min)
    #   __f3 = __w and not contaminated             (old s3 anti join)
    #   __f4 = __f3 and running __f3-count per source <= 15 (old s4:
    #          row_number over the filtered frame == cumulative sum
    #          of the flag over the same (source, doc_id) order)
    flagged = (
        base.join(qual, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id", "source", "fp",
            F.coalesce("keep", F.lit(False)).alias("__q"),
            F.col("__contam").isNotNull().alias("__c"),
        )
    )
    w_fp = Window.partitionBy("fp")
    w_src = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = (
        flagged.withColumn(
            "__w",
            F.col("__q")
            & (
                F.min(F.when(F.col("__q"), F.col("doc_id"))).over(w_fp)
                == F.col("doc_id")
            ),
        )
        .withColumn("__f3", F.col("__w") & ~F.col("__c"))
        .withColumn("__rn", F.sum(F.col("__f3").cast("int")).over(w_src))
        .withColumn("__f4", F.col("__f3") & (F.col("__rn") <= 15))
    )
    one = flagged.agg(
        F.count("*").cast("bigint").alias("p0_ingested"),
        F.sum(F.col("__q").cast("int")).cast("bigint").alias("p1_quality"),
        F.sum(F.col("__w").cast("int")).cast("bigint").alias(
            "p2_exact_dedup"
        ),
        F.sum(F.col("__f3").cast("int")).cast("bigint").alias(
            "p3_decontaminated"
        ),
        F.sum(F.col("__f4").cast("int")).cast("bigint").alias(
            "p4_source_capped"
        ),
    )
    stages = [
        "p0_ingested", "p1_quality", "p2_exact_dedup",
        "p3_decontaminated", "p4_source_capped",
    ]
    return one.selectExpr(
        "stack(5, "
        + ", ".join(f"'{s}', {s}" for s in stages)
        + ") AS (stage, n_docs)"
    )


@register(
    "pii_redaction",
    sql=rf"""
    WITH t AS (
      SELECT doc_id,
             text || ' contact user' || doc_id
                  || '@mail.example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || '-9999 from 10.0.' || (doc_id % 256) || '.7'
               AS enriched
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(enriched, '{C.EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(enriched, '{C.PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(enriched, '{C.IPV4_RE}')) AS BIGINT)
             AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(enriched, '{C.EMAIL_RE}', '<EMAIL>', 'g'),
               '{C.PHONE_RE}', '<PHONE>', 'g'),
             '{C.IPV4_RE}', '<IP>', 'g') AS redacted
    FROM t
    """,
)
def pii_redaction(spark, sf_dir):
    """PII redaction (emails/phones/IPv4) over documents enriched with
    deterministic synthetic PII (the corpus itself carries none — the
    suffix is derived from doc_id so both engines build the same
    input). Pure regexp expressions, codegen'd."""
    d = _t(spark, sf_dir, "documents")
    enriched = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("-9999 from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ).alias("enriched"),
    )
    r = C.redact_pii("enriched")
    return enriched.select(
        "doc_id",
        r["n_emails"].alias("n_emails"),
        r["n_phones"].alias("n_phones"),
        r["n_ips"].alias("n_ips"),
        r["redacted"].alias("redacted"),
    )


@register(
    "corpus_mixture_audit",
    sql=rf"""
    WITH t AS (
      SELECT source, lang, LENGTH(text) AS n_chars,
             CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                  ELSE len(regexp_split_to_array(TRIM(text), '\s+')) END
               AS n_toks
      FROM documents
    ),
    a AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             ROUND(AVG(n_chars), 6) AS avg_chars
      FROM t GROUP BY 1, 2
    )
    SELECT source, lang, n_docs, total_tokens, total_chars, avg_chars,
           ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 6)
             AS doc_share
    FROM a
    """,
)
def corpus_mixture_audit(spark, sf_dir):
    """Training-mixture "data card": per (source, lang) doc counts,
    token/char totals, and corpus share."""
    return C.corpus_mixture(_t(spark, sf_dir, "documents"))


@register(
    "source_xml_roundtrip",
    sql="""
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
           CAST(SUM(LENGTH(s_name)) AS BIGINT) AS name_chars
    FROM supplier GROUP BY s_nationkey
    """,
)
def source_xml_roundtrip(spark, sf_dir):
    """XML sink+source (Spark 4's built-in xml data source, the
    spark-xml merge): write supplier rows as <row> elements, read them
    back with an explicit schema (no inference pass at scale), and
    aggregate — the oracle computes the same from parquet, proving the
    XML round trip lossless for the projected columns."""
    s = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    path = os.path.join(_SCRATCH, f"xml_{uuid.uuid4().hex}")
    s.write.mode("overwrite").option("rowTag", "row").format("xml").save(path)
    back = spark.read.schema(s.schema).option("rowTag", "row").format(
        "xml"
    ).load(path)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("s_suppkey").cast("bigint").alias("key_sum"),
        F.sum(F.length("s_name")).cast("bigint").alias("name_chars"),
    )


@register(
    "source_schema_evolution_merge",
    sql="""
    SELECT r_regionkey, r_name,
           CASE WHEN r_regionkey >= 3 THEN 'batch2' END AS batch_tag
    FROM region
    """,
)
def source_schema_evolution_merge(spark, sf_dir):
    """Schema-drift read (``mergeSchema``): batch 1 lands without the
    ``batch_tag`` column, batch 2 adds it — the merged scan unions the
    footers' schemas and back-fills NULL for files written before the
    column existed, the standard lake pattern for additive evolution
    (same semantics the store's versioned manifests give MODIFY ADD).
    """
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = os.path.join(_SCRATCH, f"evo_{uuid.uuid4().hex}")
    r.filter(F.col("r_regionkey") < 3).write.mode("overwrite").parquet(
        os.path.join(path, "b=1")
    )
    r.filter(F.col("r_regionkey") >= 3).withColumn(
        "batch_tag", F.lit("batch2")
    ).write.mode("overwrite").parquet(os.path.join(path, "b=2"))
    back = spark.read.option("mergeSchema", True).parquet(
        os.path.join(path, "b=1"), os.path.join(path, "b=2")
    )
    return back.select("r_regionkey", "r_name", "batch_tag")


@register(
    "source_orc_roundtrip",
    sql="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag
    """,
)
def source_orc_roundtrip(spark, sf_dir):
    """ORC source/sink coverage (SURVEY §2.5 file scans): write the
    filtered projection as ORC (columnar roundtrip through a second
    on-disk format), read it back, aggregate. The oracle aggregates
    the original parquet — value equality proves the ORC write/read
    preserved the data."""
    import tempfile

    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp_ntz")
    ).select("l_returnflag", "l_quantity")
    path = os.path.join(
        tempfile.gettempdir(), "mssql_dataframe_spark_orc_roundtrip"
    )
    l.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        _dsum(F.col("l_quantity"), "sum_qty"),
    )


_ML_LINES_SQL = """
    d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    ml AS (
      SELECT doc_id, list_filter([
        array_to_string(list_slice(w, 1, 8), ' '),
        array_to_string(list_slice(w, 9, 16), ' '),
        array_to_string(list_slice(w, 17, 24), ' ')
      ], x -> x <> '') AS chunks
      FROM d
    )
"""


@register(
    "doc_line_dedup",
    sql=f"""
    WITH {_ML_LINES_SQL},
    docs AS (
      SELECT doc_id,
             list_concat(chunks, [chunks[1], chunks[2]]) AS lines
      FROM ml WHERE len(chunks) >= 2
    ),
    dd AS (
      SELECT doc_id, lines,
             list_filter(lines, (x, i) -> list_position(lines, x) = i)
               AS uniq
      FROM docs
    )
    SELECT doc_id,
           array_to_string(uniq, chr(10)) AS text_clean,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(uniq) AS BIGINT) AS n_removed
    FROM dd
    """,
)
def doc_line_dedup(spark, sf_dir):
    """WITHIN-document duplicated-line removal (C4/Gopher repeated-
    span cleaning; operators/curation.py dedup_lines): lines are
    8-word chunks of the document with the first and second chunk
    re-appended (deterministic duplication so the rule provably
    fires), and the operator keeps each line's first occurrence in
    order. Pure expression — split -> aggregate fold -> array_join —
    NO shuffle, no UDF: a map-only pass at 100 TB. The oracle
    replays the same fold with DuckDB's indexed list_filter."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunks = F.filter(
        F.array(
            F.array_join(F.slice(w, 1, 8), " "),
            F.array_join(F.slice(w, 9, 8), " "),
            F.array_join(F.slice(w, 17, 8), " "),
        ),
        lambda x: x != F.lit(""),
    )
    docs = (
        d.select("doc_id", chunks.alias("chunks"))
        .filter(F.size("chunks") >= 2)
        .select(
            "doc_id",
            F.concat(
                F.col("chunks"),
                F.array(F.col("chunks")[0], F.col("chunks")[1]),
            ).alias("lines"),
        )
        .withColumn("text_ml", F.array_join(F.col("lines"), "\n"))
    )
    out = docs.select(
        "doc_id",
        C.dedup_lines("text_ml").alias("text_clean"),
        F.size("lines").cast("bigint").alias("n_lines"),
    )
    return out.withColumn(
        "n_removed",
        (
            F.col("n_lines")
            - F.size(F.split(F.col("text_clean"), "\n"))
        ).cast("bigint"),
    )


@register(
    "corpus_boilerplate_line_removal",
    sql=f"""
    WITH {_ML_LINES_SQL},
    ex AS (
      SELECT doc_id, unnest(list_distinct(chunks)) AS ln FROM ml
    ),
    freq AS (
      SELECT ln FROM ex GROUP BY ln HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    lined AS (
      SELECT doc_id, unnest(chunks) AS ln,
             unnest(generate_series(1, len(chunks))) AS ord
      FROM ml
    ),
    kept AS (
      SELECT doc_id, ln, ord FROM lined
      WHERE ln NOT IN (SELECT ln FROM freq)
    )
    SELECT m.doc_id,
           COALESCE(k.text_clean, '') AS text_clean,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(m.chunks) - COALESCE(k.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM ml m LEFT JOIN (
      SELECT doc_id,
             string_agg(ln, chr(10) ORDER BY ord) AS text_clean,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ) k ON m.doc_id = k.doc_id
    """,
)
def corpus_boilerplate_line_removal(spark, sf_dir):
    """CORPUS-level duplicated-line removal (the RefinedWeb line-dedup
    rule; operators/curation.py remove_frequent_lines): an 8-word
    chunk appearing in >= 2 distinct documents is boilerplate and is
    removed from every document. Pass 1 counts distinct docs per line
    (map-side partial agg, ONE shuffle on the line value); the small
    heavy-hitter set is inlined into a pass-2 expression filter, so
    the corpus never shuffles in pass 2. The oracle recomputes the
    frequency threshold and rebuild in SQL."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunks = F.filter(
        F.array(
            F.array_join(F.slice(w, 1, 8), " "),
            F.array_join(F.slice(w, 9, 8), " "),
            F.array_join(F.slice(w, 17, 8), " "),
        ),
        lambda x: x != F.lit(""),
    )
    ml = d.select(
        "doc_id",
        chunks.alias("chunks"),
        F.array_join(chunks, "\n").alias("text"),
    )
    cleaned, _freq = C.remove_frequent_lines(
        ml.select("doc_id", "text"), text_col="text", min_docs=2
    )
    out = ml.select("doc_id", F.size("chunks").alias("__n")).join(
        cleaned.select(
            "doc_id",
            F.col("text").alias("text_clean"),
            F.when(F.col("text") == "", F.lit(0))
            .otherwise(F.size(F.split(F.col("text"), "\n")))
            .cast("bigint")
            .alias("n_kept"),
        ),
        "doc_id",
    )
    return out.select(
        "doc_id",
        "text_clean",
        "n_kept",
        (F.col("__n") - F.col("n_kept")).cast("bigint").alias("n_removed"),
    )


@register(
    "doc_line_dedup_windowed",
    sql=f"""
    WITH {_ML_LINES_SQL},
    docs AS (
      SELECT doc_id,
             list_concat(chunks, [chunks[1], chunks[2]]) AS lines
      FROM ml WHERE len(chunks) >= 2
    ),
    dd AS (
      SELECT doc_id, lines,
             list_filter(lines, (x, i) -> list_position(lines, x) = i)
               AS uniq
      FROM docs
    )
    SELECT doc_id,
           array_to_string(uniq, chr(10)) AS text_clean,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(uniq) AS BIGINT) AS n_removed
    FROM dd
    """,
)
def doc_line_dedup_windowed(spark, sf_dir):
    """doc_line_dedup's giant-document path, driver-verified against
    the SAME oracle (operators/curation.py dedup_lines_df): every
    document is forced through the posexplode -> first-occurrence
    window -> ordered rebuild fallback (giant_line_threshold=0)
    instead of the codegen fold. This is the shape that bounds a
    100k-line pathological document to one shuffle rather than an
    O(lines^2) hot task; grading it against doc_line_dedup's oracle
    pins fold/window output equality at corpus scale."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunks = F.filter(
        F.array(
            F.array_join(F.slice(w, 1, 8), " "),
            F.array_join(F.slice(w, 9, 8), " "),
            F.array_join(F.slice(w, 17, 8), " "),
        ),
        lambda x: x != F.lit(""),
    )
    docs = (
        d.select("doc_id", chunks.alias("chunks"))
        .filter(F.size("chunks") >= 2)
        .select(
            "doc_id",
            F.concat(
                F.col("chunks"),
                F.array(F.col("chunks")[0], F.col("chunks")[1]),
            ).alias("lines"),
        )
        .withColumn("text_ml", F.array_join(F.col("lines"), "\n"))
    )
    deduped = C.dedup_lines_df(
        docs, text_col="text_ml", giant_line_threshold=0, id_col="doc_id"
    )
    out = deduped.select(
        "doc_id",
        F.col("text_ml").alias("text_clean"),
        F.size("lines").cast("bigint").alias("n_lines"),
    )
    return out.withColumn(
        "n_removed",
        (
            F.col("n_lines")
            - F.size(F.split(F.col("text_clean"), "\n"))
        ).cast("bigint"),
    )


@register(
    "corpus_line_dedup_global",
    sql=f"""
    WITH {_ML_LINES_SQL},
    nz AS (
      SELECT doc_id, chunks FROM ml WHERE len(chunks) >= 1
    ),
    lined AS (
      SELECT doc_id, unnest(chunks) AS ln,
             unnest(generate_series(1, len(chunks))) AS ord
      FROM nz
    ),
    firsts AS (
      SELECT ln, MIN(doc_id * 1000000 + ord) AS fkey
      FROM lined GROUP BY ln
    ),
    kept AS (
      SELECT l.doc_id, l.ln, l.ord
      FROM lined l JOIN firsts f USING (ln)
      WHERE l.doc_id * 1000000 + l.ord = f.fkey
    )
    SELECT m.doc_id,
           COALESCE(k.text_clean, '') AS text_clean,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(m.chunks) - COALESCE(k.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM nz m LEFT JOIN (
      SELECT doc_id,
             string_agg(ln, chr(10) ORDER BY ord) AS text_clean,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ) k ON m.doc_id = k.doc_id
    """,
)
def corpus_line_dedup_global(spark, sf_dir):
    """CORPUS-GLOBAL first-occurrence line dedup (C4's "remove
    duplicate spans across the corpus" rule at line granularity;
    operators/curation.py dedup_lines_global — distinct from the
    within-document doc_line_dedup and from the document-frequency-
    thresholded corpus_boilerplate_line_removal): every occurrence of
    an 8-word chunk after its first (ordered by doc_id, position) is
    removed; the first survives in place. Scale shape: posexplode ->
    ONE partial-aggregated min-occurrence per line (map-side combine
    absorbs hot boilerplate lines) -> exchange-reusing join back ->
    one rebuild shuffle — no window over the line value, so a
    million-copy line never pins a sort to one task. The oracle
    replays first-occurrence survivorship with an encoded min key."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunks = F.filter(
        F.array(
            F.array_join(F.slice(w, 1, 8), " "),
            F.array_join(F.slice(w, 9, 8), " "),
            F.array_join(F.slice(w, 17, 8), " "),
        ),
        lambda x: x != F.lit(""),
    )
    ml = d.select(
        "doc_id",
        chunks.alias("chunks"),
        F.array_join(chunks, "\n").alias("text"),
    ).filter(F.size("chunks") >= 1)
    cleaned = C.dedup_lines_global(
        ml.select("doc_id", "text"), id_col="doc_id", text_col="text"
    )
    out = ml.select("doc_id", F.size("chunks").alias("__n")).join(
        cleaned.select(
            "doc_id",
            F.col("text").alias("text_clean"),
            F.when(F.col("text") == "", F.lit(0))
            .otherwise(F.size(F.split(F.col("text"), "\n")))
            .cast("bigint")
            .alias("n_kept"),
        ),
        "doc_id",
    )
    return out.select(
        "doc_id",
        "text_clean",
        "n_kept",
        (F.col("__n") - F.col("n_kept")).cast("bigint").alias("n_removed"),
    )


@register(
    "corpus_boilerplate_antijoin",
    sql=f"""
    WITH {_ML_LINES_SQL},
    ex AS (
      SELECT doc_id, unnest(list_distinct(chunks)) AS ln FROM ml
    ),
    freq AS (
      SELECT ln FROM ex GROUP BY ln HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    lined AS (
      SELECT doc_id, unnest(chunks) AS ln,
             unnest(generate_series(1, len(chunks))) AS ord
      FROM ml
    ),
    kept AS (
      SELECT doc_id, ln, ord FROM lined
      WHERE ln NOT IN (SELECT ln FROM freq)
    )
    SELECT m.doc_id,
           COALESCE(k.text_clean, '') AS text_clean,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(m.chunks) - COALESCE(k.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM ml m LEFT JOIN (
      SELECT doc_id,
             string_agg(ln, chr(10) ORDER BY ord) AS text_clean,
             COUNT(*) AS n_kept
      FROM kept GROUP BY doc_id
    ) k ON m.doc_id = k.doc_id
    """,
)
def corpus_boilerplate_antijoin(spark, sf_dir):
    """corpus_boilerplate_line_removal's large-set pass 2,
    driver-verified against the SAME oracle (operators/curation.py
    remove_frequent_lines, inline_threshold=0): the frequent set goes
    through posexplode -> broadcast ANTI-join -> ordered rebuild
    instead of literal-array inlining, the shape that holds when the
    boilerplate set is too large for a Catalyst expression tree
    (literal inlining degrades well below 10^4 nodes). One broadcast
    of the >= min_docs heavy-hitter set, one bounded line-granularity
    shuffle for the rebuild — no literal blowup at any set size."""
    d = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    chunks = F.filter(
        F.array(
            F.array_join(F.slice(w, 1, 8), " "),
            F.array_join(F.slice(w, 9, 8), " "),
            F.array_join(F.slice(w, 17, 8), " "),
        ),
        lambda x: x != F.lit(""),
    )
    ml = d.select(
        "doc_id",
        chunks.alias("chunks"),
        F.array_join(chunks, "\n").alias("text"),
    )
    cleaned, _freq = C.remove_frequent_lines(
        ml.select("doc_id", "text"), text_col="text", min_docs=2,
        inline_threshold=0, id_col="doc_id",
    )
    out = ml.select("doc_id", F.size("chunks").alias("__n")).join(
        cleaned.select(
            "doc_id",
            F.col("text").alias("text_clean"),
            F.when(F.col("text") == "", F.lit(0))
            .otherwise(F.size(F.split(F.col("text"), "\n")))
            .cast("bigint")
            .alias("n_kept"),
        ),
        "doc_id",
    )
    return out.select(
        "doc_id",
        "text_clean",
        "n_kept",
        (F.col("__n") - F.col("n_kept")).cast("bigint").alias("n_removed"),
    )


@register(
    "ivfpq_adc_search",
    sql=_pq_adc_oracle_sql(ivf=(53, 2)),
)
def ivfpq_adc_search(spark, sf_dir):
    """IVF-PQ search (operators/similarity.py ivfpq_topk — FAISS
    ``IVF,PQ`` with by_residual=False): a deterministic coarse
    inverted-file quantizer (ids ≡ 1 mod 53, exact int64 L2 on the
    quantized grid, lowest-centroid ties) prunes the corpus to each
    query's 2 nearest lists; PQ asymmetric distance then scores only
    those candidates from their m code bytes. The build-time id join
    materializes the (list, codes) index — at 100 TB it is written
    bucketed by list id so the probe equi-join is shuffle-free and
    search touches nprobe/C of the codes, never the vectors. The
    oracle replays codebook, assignment, probes, ADC tables, and
    ranking in flat SQL."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.ivfpq_topk(
        emb, query_ids=[0, 1, 2], topk=5, m=2, k=4, iters=2,
        quant=1024, dim=64, centroid_mod=53, nprobe=2,
    )


@register(
    "corpus_perplexity_buckets",
    sql="""
    WITH scores AS ({uni}),
    scored AS (
      SELECT s.doc_id, d.lang, s.n_tokens, s.mean_logprob
      FROM scores s JOIN documents d USING (doc_id)
    ), tiled AS (
      SELECT doc_id, lang, n_tokens, mean_logprob,
             CAST(NTILE(3) OVER (
               PARTITION BY lang
               ORDER BY mean_logprob DESC, doc_id) AS INT) AS ppl_bucket
      FROM scored
    )
    SELECT doc_id, lang, n_tokens, mean_logprob, ppl_bucket,
           CASE WHEN ppl_bucket = 1 THEN 'head'
                WHEN ppl_bucket = 3 THEN 'tail'
                ELSE 'middle' END AS bucket_label
    FROM tiled
    """.format(uni=REGISTRY["unigram_logprob_quality"]["sql"]),
)
def corpus_perplexity_buckets(spark, sf_dir):
    """CCNet-style per-language perplexity bucketing (operators/
    curation.py perplexity_buckets): unigram-LM fluency scores split
    into head/middle/tail terciles PER LANGUAGE — the CCNet rule that
    keeps head, mixes middle, drops tail. Scale shape: no per-language
    window (a language can span terabytes — one task per lang);
    instead ONE range-partitioned global rank over
    (lang, score desc, id) with broadcast per-language offsets and
    arithmetic NTILE (distributed_window.ntile_from_rank_col). The
    oracle is the windowed NTILE over the same scores."""
    from .operators import distributed_window as DW

    d = _t(spark, sf_dir, "documents")
    pins = []
    out = C.perplexity_buckets(
        d, id_col="doc_id", text_col="text", lang_col="lang",
        buckets=3, pins=pins,
    )
    return DW.finalize(out, pins)


@register(
    "mv_minmax_partial_rescan",
    sql="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,4)) AS price
      FROM orders WHERE o_custkey < 300
    ),
    final AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey % 2 = 0
                  THEN price + CAST(10 AS DECIMAL(18,4))
                  ELSE price END AS price
      FROM base WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey + 1000, price
      FROM base WHERE o_orderkey % 11 = 0
    )
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(price) AS DOUBLE) AS min_price,
           CAST(MAX(price) AS DOUBLE) AS max_price
    FROM final GROUP BY o_custkey
    """,
)
def mv_minmax_partial_rescan(spark, sf_dir):
    """MIN/MAX materialized-view maintenance with PARTIAL rescans
    (operators/incremental.py apply_minmax_delta): min/max are not
    delta-maintainable under deletes, so the operator splits keys into
    fresh (built from inserts), safe (inserts only tighten the stored
    extremum), and endangered (a deleted value tied the extremum) —
    only the endangered keys' rows are re-read, via a key-semi-join
    against the post-load snapshot. The same load as
    mv_incremental_update (updates, deletes, key moves, fresh keys)
    exercises every branch; the oracle is the full recompute of the
    final state."""
    from .operators.incremental import apply_minmax_delta

    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        )
    )
    eng.create.table(
        "dbo.fact_mm",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "price": "decimal(18,4)"},
        primary_key_column="o_orderkey",
    )
    eng.write.insert("dbo.fact_mm", base)
    v_ins = eng.store.meta("dbo.fact_mm").version  # create=v0, insert=v1
    mv0 = (
        eng.read.table("dbo.fact_mm", version=v_ins)
        .groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
        )
    )
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    survivors = base.filter(ok % 7 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(ck % 2 == 0, F.col("price") + F.lit(10).cast("decimal(18,4)"))
        .otherwise(F.col("price"))
        .cast("decimal(18,4)")
        .alias("price"),
    )
    inserts = base.filter(ok % 11 == 0).select(
        (ok + 10000000).alias("o_orderkey"),
        (ck + 1000).alias("o_custkey"),
        "price",
    )
    eng.write.merge(
        "dbo.fact_mm",
        survivors.unionByName(inserts),
        match_columns=["o_orderkey"],
    )
    cdc = eng.read.table_changes("dbo.fact_mm", from_version=v_ins)
    post = eng.read.table("dbo.fact_mm")
    mv = apply_minmax_delta(
        mv0, cdc, post, ["o_custkey"], "price",
        min_col="min_price", max_col="max_price",
    )
    return mv.select(
        "o_custkey", "n_rows",
        F.col("min_price").cast("double").alias("min_price"),
        F.col("max_price").cast("double").alias("max_price"),
    )


@register(
    "mv_distinct_count_two_level",
    sql="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,4)) AS price
      FROM orders WHERE o_custkey < 300
    ),
    final AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey % 2 = 0
                  THEN price + CAST(10 AS DECIMAL(18,4))
                  ELSE price END AS price
      FROM base WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey + 1000, price
      FROM base WHERE o_orderkey % 11 = 0
    )
    SELECT o_custkey,
           CAST(COUNT(DISTINCT price) AS BIGINT) AS n_distinct
    FROM final GROUP BY o_custkey
    """,
)
def mv_distinct_count_two_level(spark, sf_dir):
    """COUNT(DISTINCT) materialized-view maintenance via the TWO-LEVEL
    design (operators/incremental.py apply_distinct_delta): the
    auxiliary per-(key, value) occurrence table is exactly
    delta-maintainable, and the distinct count re-derives for the
    changed keys only — one semi-join + count over their aux rows,
    never the corpus. Same load as mv_incremental_update; oracle is
    the full recompute of the final state."""
    from .operators.incremental import apply_distinct_delta

    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        )
    )
    eng.create.table(
        "dbo.fact_dc",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "price": "decimal(18,4)"},
        primary_key_column="o_orderkey",
    )
    eng.write.insert("dbo.fact_dc", base)
    v_ins = eng.store.meta("dbo.fact_dc").version  # create=v0, insert=v1
    snap = eng.read.table("dbo.fact_dc", version=v_ins)
    aux0 = (
        snap.filter(F.col("price").isNotNull())
        .groupBy("o_custkey", "price")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vcnt"))
    )
    mv0 = (
        snap.filter(F.col("price").isNotNull())
        .groupBy("o_custkey")
        .agg(F.count_distinct("price").cast("bigint").alias("n_distinct"))
    )
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    survivors = base.filter(ok % 7 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(ck % 2 == 0, F.col("price") + F.lit(10).cast("decimal(18,4)"))
        .otherwise(F.col("price"))
        .cast("decimal(18,4)")
        .alias("price"),
    )
    inserts = base.filter(ok % 11 == 0).select(
        (ok + 10000000).alias("o_orderkey"),
        (ck + 1000).alias("o_custkey"),
        "price",
    )
    eng.write.merge(
        "dbo.fact_dc",
        survivors.unionByName(inserts),
        match_columns=["o_orderkey"],
    )
    cdc = eng.read.table_changes("dbo.fact_dc", from_version=v_ins)
    mv, _aux = apply_distinct_delta(
        mv0, aux0, cdc, ["o_custkey"], "price"
    )
    return mv.select("o_custkey", "n_distinct")


@register(
    "mv_topk_maintenance",
    sql="""
    WITH base AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(18,4)) AS price
      FROM orders WHERE o_custkey < 300
    ),
    final AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_custkey % 2 = 0
                  THEN price + CAST(10 AS DECIMAL(18,4))
                  ELSE price END AS price
      FROM base WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey + 1000, price
      FROM base WHERE o_orderkey % 11 = 0
    )
    SELECT o_custkey, o_orderkey, CAST(price AS DOUBLE) AS price
    FROM (
      SELECT o_custkey, o_orderkey, price,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY price DESC, o_orderkey DESC
             ) AS rn
      FROM final
    ) WHERE rn <= 3
    """,
)
def mv_topk_maintenance(spark, sf_dir):
    """Per-key TOP-K view maintenance (operators/incremental.py
    apply_topk_delta): deletes of a stored member rescan only that key
    (key-semi-join against the post-load snapshot); promoting inserts
    merge in-frame against the stored members; sub-boundary churn and
    untouched keys cost nothing. Deterministic (value DESC, id DESC)
    order keeps the set engine-reproducible; oracle is the windowed
    full recompute of the final state."""
    from .operators.incremental import apply_topk_delta

    eng = _scratch_engine(spark)
    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 300)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        )
    )
    eng.create.table(
        "dbo.fact_tk",
        {"o_orderkey": "bigint", "o_custkey": "bigint",
         "price": "decimal(18,4)"},
        primary_key_column="o_orderkey",
    )
    eng.write.insert("dbo.fact_tk", base)
    v_ins = eng.store.meta("dbo.fact_tk").version  # create=v0, insert=v1
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price").desc(), F.col("o_orderkey").desc()
    )
    mv0 = (
        eng.read.table("dbo.fact_tk", version=v_ins)
        .filter(F.col("price").isNotNull())
        .select("o_custkey", "o_orderkey", "price")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .drop("__rn")
    )
    ok, ck = F.col("o_orderkey"), F.col("o_custkey")
    survivors = base.filter(ok % 7 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(ck % 2 == 0, F.col("price") + F.lit(10).cast("decimal(18,4)"))
        .otherwise(F.col("price"))
        .cast("decimal(18,4)")
        .alias("price"),
    )
    inserts = base.filter(ok % 11 == 0).select(
        (ok + 10000000).alias("o_orderkey"),
        (ck + 1000).alias("o_custkey"),
        "price",
    )
    eng.write.merge(
        "dbo.fact_tk",
        survivors.unionByName(inserts),
        match_columns=["o_orderkey"],
    )
    cdc = eng.read.table_changes("dbo.fact_tk", from_version=v_ins)
    post = eng.read.table("dbo.fact_tk")
    mv = apply_topk_delta(
        mv0, cdc, post, ["o_custkey"], "o_orderkey", "price", 3
    )
    return mv.select(
        "o_custkey", "o_orderkey",
        F.col("price").cast("double").alias("price"),
    )


@register(
    "streaming_incremental_mv",
    sql="""
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id
    """,
)
def streaming_incremental_mv(spark, sf_dir):
    """Stream -> fact table -> manifest CDC -> incremental MV, in one
    exactly-once foreachBatch loop (streaming/events.py
    foreach_batch_incremental_mv): each micro-batch appends raw rows,
    reads its own change feed from the store's version window, and
    merges per-user aggregate deltas for the changed keys only — the
    ledger of each table rides its own commit, so replays converge.
    The final MV must equal the plain batch GROUP BY regardless of
    micro-batch boundaries (decimal accumulation)."""
    from .streaming import events as STR

    out = STR.foreach_batch_incremental_mv(
        spark, sf_dir, _scratch_engine(spark)
    )
    return out.select(
        "user_id",
        "n_rows",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@register(
    "verb_bloom_index_read",
    sql="""
    SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand,
           CAST(p_size AS BIGINT) AS p_size
    FROM part
    WHERE p_brand = 'Brand#23' AND p_size = 7
    """,
)
def verb_bloom_index_read(spark, sf_dir):
    """Bloom-filter file index (store.py bloom_prune; the Delta
    BLOOMFILTER INDEX analog): tables declaring
    ``bloom_filter_columns`` get per-file bloom sidecars at commit
    time, and an equality read prunes provably-absent files BEFORE the
    scan — the point-lookup complement to range-stats pruning, which
    only engages on clustered keys. The verb read must return exactly
    the oracle's rows through the pruned scan."""
    eng = _scratch_engine(spark)
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("bigint").alias("p_partkey"),
        "p_brand",
        F.col("p_size").cast("bigint").alias("p_size"),
    )
    eng.create.table(
        "dbo.part_bloom",
        {"p_partkey": "bigint", "p_brand": "varchar(20)",
         "p_size": "bigint"},
        primary_key_column="p_partkey",
        properties={"bloom_filter_columns": ["p_brand", "p_size"]},
    )
    eng.write.insert("dbo.part_bloom", part)
    return eng.read.table(
        "dbo.part_bloom",
        column_names=["p_partkey", "p_brand", "p_size"],
        where="p_brand = 'Brand#23' AND p_size = 7",
    )


@register(
    "verb_bloom_date_read",
    sql="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS o_od,
           CAST(o_custkey AS BIGINT) AS o_custkey
    FROM orders
    WHERE CAST(o_orderdate AS DATE) = DATE '1995-06-15'
    """,
)
def verb_bloom_date_read(spark, sf_dir):
    """DATE bloom point lookup (r12; store._bloom_value_bytes date
    canonicalization): a date-keyed table declaring
    ``bloom_filter_columns`` on its DATE column prunes
    provably-absent files for a strict-ISO equality literal — the
    partition-date point-lookup shape. The sidecar hashes Arrow's
    date32->string ISO text; the probe hashes date.fromisoformat of
    the literal; both must agree or rows vanish (pinned no-false-
    negative property in tests/test_bloom_fpp.py). The surfaced
    column casts DATE->TIMESTAMP on both engines (dtype-compare
    contract); the WHERE runs against the DATE column, so the bloom
    path is what's graded."""
    eng = _scratch_engine(spark)
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.to_date("o_orderdate").alias("o_od"),
        F.col("o_custkey").cast("bigint").alias("o_custkey"),
    )
    eng.create.table(
        "dbo.orders_dtbloom",
        {"o_orderkey": "bigint", "o_od": "date", "o_custkey": "bigint"},
        primary_key_column="o_orderkey",
        properties={"bloom_filter_columns": ["o_od"]},
    )
    eng.write.insert("dbo.orders_dtbloom", o)
    return eng.read.table(
        "dbo.orders_dtbloom", where="o_od = 1995-06-15"
    ).select(
        "o_orderkey",
        F.col("o_od").cast("timestamp").alias("o_od"),
        "o_custkey",
    )


@register(
    "stats_skew_kurtosis",
    sql="""
    SELECT l_returnflag,
           ROUND(SKEWNESS(l_extendedprice) * (COUNT(*) - 2)
                 / SQRT(COUNT(*) * (COUNT(*) - 1.0)), 6) AS price_skew,
           ROUND(KURTOSIS_POP(l_extendedprice), 6) AS price_kurt
    FROM lineitem GROUP BY l_returnflag
    """,
)
def stats_skew_kurtosis(spark, sf_dir):
    """Third/fourth-moment aggregates. Spark's skewness/kurtosis are
    the POPULATION statistics (g1 = m3/m2^1.5, g2 = m4/m2^2 - 3,
    single-pass central-moment updates inside a regular hash agg —
    the scale path); DuckDB's skewness is the SAMPLE-corrected G1, so
    the oracle de-biases it analytically (g1 = G1*(n-2)/sqrt(n(n-1)))
    and uses kurtosis_pop directly — the conversion is exact algebra,
    verified against hand-computed moments, so the two engines agree
    to rounding."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_extendedprice"), 6).alias("price_skew"),
        F.round(F.kurtosis("l_extendedprice"), 6).alias("price_kurt"),
    )


@register(
    "bitmap_exact_distinct",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custkeys
    FROM orders GROUP BY o_orderpriority
    """,
)
def bitmap_exact_distinct(spark, sf_dir):
    """EXACT distinct counting through Spark 3.5+ bitmap aggregation —
    the scale path for high-cardinality COUNT(DISTINCT): keys map to
    (bucket, bit) via bitmap_bucket_number/bitmap_bit_position, each
    (group, bucket) folds to a fixed 4KB bitmap with map-side partial
    aggregation (bitmap_construct_agg), and the final count is a SUM
    of per-bucket popcounts. State per group is bounded by
    ceil(key_domain / 32768) bitmaps instead of one hash set holding
    every distinct key — a count-distinct expand never materializes,
    and the two-level shape parallelizes the count across buckets."""
    o = _t(spark, sf_dir, "orders")
    sub = o.select(
        "o_orderpriority",
        F.col("o_custkey").cast("bigint").alias("ck"),
    ).select(
        "o_orderpriority",
        F.expr("bitmap_bucket_number(ck)").alias("bkt"),
        F.expr("bitmap_bit_position(ck)").alias("pos"),
    )
    per_bucket = sub.groupBy("o_orderpriority", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("bigint").alias("n_custkeys")
    )


@register(
    "hll_distinct_bounded",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def hll_distinct_bounded(spark, sf_dir):
    """Apache DataSketches HLL distinct estimation (Spark 3.5+
    hll_sketch_agg / hll_sketch_estimate — the MERGEABLE sketch-OBJECT
    family, distinct from approx_count_distinct's scalar HLL++: these
    sketches can be stored, unioned across days/partitions with
    hll_union_agg, and re-estimated, which scalar approx counts
    cannot) graded the recall-gate way
    (ann_recall_at10's pattern): the entry computes BOTH the sketch
    estimate and the exact count, surfaces the exact count plus an
    error-bound verdict, and the oracle expects the verdict TRUE —
    if the estimate ever drifted past 5% (~3 sigma at the default
    lgConfigK=12) the hash would go red. Sketches are deterministic
    for fixed input, and MERGEABLE: at 100 TB the per-partition
    sketches combine without a key shuffle, which is why this is the
    distinct path when exactness can be traded for state."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.expr(
            "hll_sketch_estimate(hll_sketch_agg(CAST(o_custkey AS BIGINT)))"
        ).alias("est"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_exact"),
    )
    return agg.select(
        "o_orderpriority",
        "n_exact",
        (
            F.abs(F.col("est") / F.col("n_exact") - F.lit(1.0)) <= 0.05
        ).alias("within_5pct"),
    )


@register(
    "hll_sketch_union_rollup",
    sql="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS within_5pct
    FROM orders GROUP BY o_orderpriority
    """,
)
def hll_sketch_union_rollup(spark, sf_dir):
    """Two-level mergeable-sketch rollup (hll_sketch_agg per fine
    grain, hll_union_agg to coarse) — THE incremental-distinct pattern
    at 100 TB: per-(group, month) partial sketches are tiny, persist
    in a summary table, and roll up to any coarser grain WITHOUT
    re-reading the fact data, because HLL union in sketch space is
    lossless (union of sketches == sketch of the union at equal lgK).
    Graded recall-gate style like hll_distinct_bounded: the rolled-up
    estimate must sit within 5% of the exact count per group, and the
    surfaced columns are the exact count + the verdict the oracle can
    check."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
            "month"
        ),
        F.col("o_custkey").cast("bigint").alias("ck"),
    )
    partial = base.groupBy("o_orderpriority", "month").agg(
        F.expr("hll_sketch_agg(ck)").alias("sk")
    )
    rolled = partial.groupBy("o_orderpriority").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = base.groupBy("o_orderpriority").agg(
        F.countDistinct("ck").cast("bigint").alias("n_exact")
    )
    return rolled.join(exact, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        (
            F.abs(F.col("est") / F.col("n_exact") - F.lit(1.0)) <= 0.05
        ).alias("within_5pct"),
    )


@register(
    "ansi_safe_arithmetic",
    sql="""
    SELECT l_linestatus,
           CAST(SUM(CAST(l_extendedprice / NULLIF(l_quantity - 25, 0)
                         AS DECIMAL(28,10))) AS DOUBLE) AS sum_rate,
           CAST(COUNT(*) FILTER (WHERE l_quantity = 25) AS BIGINT)
             AS n_div0,
           CAST(COUNT(l_extendedprice / NULLIF(l_quantity - 25, 0))
                AS BIGINT) AS n_rated
    FROM lineitem GROUP BY l_linestatus
    """,
)
def ansi_safe_arithmetic(spark, sf_dir):
    """ANSI-safe arithmetic (`try_divide`): Spark 4 defaults
    spark.sql.ansi.enabled=true, where a plain division raises
    DIVIDE_BY_ZERO and kills the job — at 100 TB one dirty row must
    not fail a stage, so the try_* family (NULL on error) is the
    production arithmetic path, mirrored by DuckDB's native
    NULL-on-zero division in the oracle. The engineered denominator
    (l_quantity - 25) hits zero on real rows; NULL rates drop out of
    COUNT/SUM identically in both engines. Terms are decimal-cast
    before summing so the aggregate is order-insensitive (the _dsum
    idiom)."""
    l = _t(spark, sf_dir, "lineitem")
    rate = F.expr("try_divide(l_extendedprice, l_quantity - 25)")
    return l.groupBy("l_linestatus").agg(
        F.sum(rate.cast("decimal(28,10)"))
        .cast("double")
        .alias("sum_rate"),
        F.count_if(F.col("l_quantity") == 25)
        .cast("bigint")
        .alias("n_div0"),
        F.count(rate).cast("bigint").alias("n_rated"),
    )


@register(
    "string_agg_listagg",
    sql="""
    SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def string_agg_listagg(spark, sf_dir):
    """Ordered string aggregation (Spark 4 ``listagg ... WITHIN GROUP
    (ORDER BY ...)`` — the T-SQL STRING_AGG analog the reference's
    users reach for in reporting queries; DuckDB mirrors it as
    string_agg with ORDER BY). The WITHIN GROUP order makes the
    result deterministic at any partitioning — an unordered listagg
    concatenates in arrival order, which differs run to run on a
    cluster, so ordered is the only form a distributed engine should
    expose for comparable output. One hash-agg shuffle on the group
    key; the per-group sort is local to the finalizer."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy(
        F.col("n_regionkey").cast("bigint").alias("regionkey")
    ).agg(
        F.expr(
            "listagg(n_name, ',') within group (order by n_name)"
        ).alias("names")
    )


@register(
    "mode_median_functions",
    sql="""
    SELECT l_linestatus,
           CAST(mode(CAST(least(l_quantity, 10) AS BIGINT)) AS BIGINT)
             AS mode_qty,
           CAST(median(l_quantity) AS DOUBLE) AS median_qty
    FROM lineitem GROUP BY l_linestatus
    """,
)
def mode_median_functions(spark, sf_dir):
    """Spark 3.4+ ``mode()`` / ``median()`` builtin aggregates (the
    direct SQL forms of the most-frequent-value and exact-median
    asks; pandas_udaf_median pins the UDAF route, this pins the
    JVM-native one — zero Python, whole-stage codegen). Mode ties are
    engine-arbitrary in BOTH Spark and DuckDB, so the probed column
    is engineered unimodal: least(l_quantity, 10) folds the 10..50
    range onto 10, making 10 the unique mode per group (~80% mass) —
    the entry grades determinism-safe mode semantics, not tie luck.
    l_quantity is integral-valued, so the DuckDB BIGINT cast (rounds)
    and Spark's (truncates) agree, and medians land on .0/.5 values
    that are exact in binary floating point."""
    l = _t(spark, sf_dir, "lineitem")
    capped = F.least(F.col("l_quantity"), F.lit(10)).cast("bigint")
    return l.groupBy("l_linestatus").agg(
        F.mode(capped).cast("bigint").alias("mode_qty"),
        F.median(F.col("l_quantity")).cast("double").alias("median_qty"),
    )


@register(
    "histogram_width_bucket",
    sql="""
    SELECT CASE WHEN FLOOR(l_extendedprice) >= 120000
                THEN CAST(13 AS BIGINT)
                ELSE CAST(FLOOR(FLOOR(l_extendedprice) / 10000) + 1
                          AS BIGINT) END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE)
             AS sum_price
    FROM lineitem GROUP BY 1
    """,
)
def histogram_width_bucket(spark, sf_dir):
    """Single-pass fixed-width histogram via ``width_bucket`` (SQL
    2023; the profiling primitive for choosing range-partition bounds
    and spotting skew before a big job). One scan, one hash-agg on
    ~nb+2 groups — at 100 TB this is the cheap way to see a column's
    distribution, vs an ORDER BY-based quantile pass. Bucketing is
    floored to integral dollars first so the bucket arithmetic is
    exact integer-in-double on both engines (DuckDB has no
    width_bucket; the oracle mirrors the SQL-standard definition
    arithmetically: values >= hi land in bucket nb+1). Sum uses the
    decimal-cast _dsum idiom for order-insensitive totals."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.expr(
            "width_bucket(floor(l_extendedprice), 0, 120000, 12)"
        ).cast("bigint").alias("bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,10)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "approx_topk_priorities",
    sql="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS approx_hit
    FROM orders GROUP BY o_orderpriority
    ORDER BY n DESC, o_orderpriority LIMIT 3
    """,
)
def approx_topk_priorities(spark, sf_dir):
    """Sketch-based frequent-items top-k (Spark 4.1 ``approx_top_k``)
    graded the recall-gate way: the entry surfaces the EXACT top-3
    (count + key tiebreak, both engines) plus a verdict that the
    sketch's top-3 item SET matches it — at 100 TB the sketch is the
    production path (bounded state, merges without a key shuffle,
    like the HLL/bitmap family) and the exact groupBy is the oracle.
    The probed column's rank-3/4 counts are distinct at every test
    SF, so the top-3 SET is well-defined even where ranks 2/3 tie
    (sketch-internal tie order never leaks into the output)."""
    o = _t(spark, sf_dir, "orders")
    approx = o.agg(
        F.expr("approx_top_k(o_orderpriority, 3)").alias("tk")
    ).select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("item")
    )
    exact = (
        o.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("o_orderpriority"))
        .limit(3)
    )
    # verdict via left join against the sketch's item set: every exact
    # top-3 row must appear in the approx set (both are 3-item sets,
    # so containment == equality)
    return exact.join(
        approx.withColumn("approx_hit", F.lit(True)),
        exact["o_orderpriority"] == approx["item"],
        "left",
    ).select(
        "o_orderpriority", "n",
        F.coalesce(F.col("approx_hit"), F.lit(False)).alias("approx_hit"),
    )


@register(
    "events_acf_daily",
    sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT d, n,
             LAG(n, 1) OVER (ORDER BY d) AS l1,
             LAG(n, 2) OVER (ORDER BY d) AS l2,
             LAG(n, 3) OVER (ORDER BY d) AS l3,
             LAG(n, 7) OVER (ORDER BY d) AS l7
      FROM daily
    )
    SELECT CAST(1 AS INT) AS lag, ROUND(corr(n, l1), 6) AS acf FROM lagged
    UNION ALL
    SELECT CAST(2 AS INT), ROUND(corr(n, l2), 6) FROM lagged
    UNION ALL
    SELECT CAST(3 AS INT), ROUND(corr(n, l3), 6) FROM lagged
    UNION ALL
    SELECT CAST(7 AS INT), ROUND(corr(n, l7), 6) FROM lagged
    """,
)
def events_acf_daily(spark, sf_dir):
    """Autocorrelation of daily event volume at lags 1/2/3/7 — the
    seasonality probe behind capacity forecasts (a strong lag-7 says
    week-shaped load). The raw scan reduces to ONE tiny daily series
    (O(days) rows) before any window touches it, so the global
    ORDER BY d window is a deliberate single-partition pass over an
    already-aggregated frame — the same slim-series shape as the
    mix-shift monitor, never a sort of raw events. Lags are
    SEQUENCE lags over observed days (both engines window the same
    ordered rows); Pearson corr is scale-invariant so sample/
    population variants agree, and ROUND(6) absorbs accumulation-
    order ulps."""
    e = load_events(spark, sf_dir)
    daily = e.groupBy(
        F.to_date(F.date_trunc("DAY", "ts")).alias("d")
    ).agg(F.count("*").cast("double").alias("n"))
    w = Window.orderBy("d")
    lagged = daily.select(
        "n",
        F.lag("n", 1).over(w).alias("l1"),
        F.lag("n", 2).over(w).alias("l2"),
        F.lag("n", 3).over(w).alias("l3"),
        F.lag("n", 7).over(w).alias("l7"),
    )
    agg = lagged.agg(
        *[
            F.round(F.corr("n", f"l{k}"), 6).alias(f"a{k}")
            for k in (1, 2, 3, 7)
        ]
    )
    return agg.select(
        F.expr(
            "stack(4, 1, a1, 2, a2, 3, a3, 7, a7) as (lag, acf)"
        )
    ).select(F.col("lag").cast("int").alias("lag"), "acf")


@register(
    "benford_first_digit",
    sql="""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    ), counts AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts)
    SELECT c.digit, c.n,
           ROUND(CAST(c.n AS DOUBLE) / t.n_total, 6) AS observed_share,
           ROUND(LN(1.0 + 1.0 / c.digit) / LN(10.0), 6) AS benford_share,
           ROUND(CAST(c.n AS DOUBLE) / t.n_total
                 - LN(1.0 + 1.0 / c.digit) / LN(10.0), 6) AS excess
    FROM counts c, tot t
    """,
)
def benford_first_digit(spark, sf_dir):
    """Benford's-law first-digit audit of order totals — the
    data-quality / fraud screen that flags fabricated or truncated
    numeric feeds (synthetic uniform prices diverge from Benford
    loudly, which is itself the signal here). Digit extraction is
    engine-exact: FLOOR to whole dollars (exact in double, prices
    >= 1), cast to BIGINT, take the first character of the INTEGER
    rendering — never a double's string form, which engines format
    differently. One scan into a 9-group agg; the share divides by a
    window total over the 9-row aggregated frame, so nothing about
    this query grows with the table. ROUND(6) absorbs libm log ulps.
    """
    o = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = o.groupBy(digit.alias("digit")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    total = F.sum("n").over(Window.partitionBy())
    benford = F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(
        F.lit(10.0)
    )
    return counts.select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / total, 6).alias(
            "observed_share"
        ),
        F.round(benford, 6).alias("benford_share"),
        F.round(
            F.col("n").cast("double") / total - benford, 6
        ).alias("excess"),
    )


@register(
    "attribution_last_touch",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq
    WHERE event_type = 'purchase' AND prev_type IS NOT NULL
    GROUP BY prev_type
    """,
)
def attribution_last_touch(spark, sf_dir):
    """Last-touch conversion attribution: for every purchase, credit
    the event type IMMEDIATELY preceding it in the user's timeline
    (LAG over ts,event_id — deterministic tiebreak) — the marketing
    report behind channel budgets. Distinct from the Markov entry:
    that counts ALL transitions; this conditions on conversions only.
    One user_id shuffle for the window, then a |types|-group agg —
    map-side combinable, no self-join."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "purchase")
            & F.col("prev_type").isNotNull()
        )
        .groupBy(F.col("prev_type").alias("channel"))
        .agg(
            F.count("*").cast("bigint").alias("n_conversions"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )


@register(
    "events_seasonal_anomaly",
    sql="""
    WITH hourly AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), baseline AS (
      SELECT CAST(EXTRACT(ISODOW FROM h) AS INT) AS dow,
             CAST(EXTRACT(HOUR FROM h) AS INT) AS hod,
             MEDIAN(n) AS med
      FROM hourly GROUP BY 1, 2
    )
    SELECT hourly.h AS hour_ts, hourly.n,
           CAST(b.med AS DOUBLE) AS baseline,
           (hourly.n > 2.0 * b.med) AS is_anomaly
    FROM hourly JOIN baseline b
      ON CAST(EXTRACT(ISODOW FROM hourly.h) AS INT) = b.dow
     AND CAST(EXTRACT(HOUR FROM hourly.h) AS INT) = b.hod
    """,
)
def events_seasonal_anomaly(spark, sf_dir):
    """Seasonal-baseline anomaly detection: each hour's event count
    vs the MEDIAN count of its (ISO weekday, hour-of-day) slot, with
    a 2x-median burn flag — the load-anomaly monitor that doesn't
    false-alarm on ordinary weekly shape the way a global mean
    threshold does. The raw scan reduces to one hourly frame
    (O(hours) rows); the per-slot median runs over at most 7x24
    groups and broadcasts back. The median of integer counts is x.0
    or x.5 exactly, so 2.0*med is exact in double and the STRICT >
    verdict cannot split on rounding (the sessionization lesson,
    applied at design time)."""
    e = load_events(spark, sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("bigint").alias("n"))
    dow = F.expr("extract(DAYOFWEEK_ISO FROM h)").cast("int")
    hod = F.hour("h").cast("int")
    baseline = hourly.groupBy(
        dow.alias("dow"), hod.alias("hod")
    ).agg(F.median("n").alias("med"))
    return (
        hourly.select("h", "n", dow.alias("dow"), hod.alias("hod"))
        .join(F.broadcast(baseline), ["dow", "hod"])
        .select(
            F.col("h").alias("hour_ts"),
            "n",
            F.col("med").cast("double").alias("baseline"),
            (F.col("n") > F.lit(2.0) * F.col("med")).alias("is_anomaly"),
        )
    )


@register(
    "events_adoption_curve",
    sql="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS first_day
      FROM events GROUP BY user_id
    ), adds AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (
             ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM adds
    """,
)
def events_adoption_curve(spark, sf_dir):
    """Cumulative-adoption curve: distinct users ever seen, by day —
    the growth chart. This is the SCALABLE translation of the naive
    'COUNT(DISTINCT user) OVER (ORDER BY day)' (which no engine
    supports and whose semi-naive forms re-scan history per day):
    each user reduces to ONE first-seen row, those fold to a per-day
    new-user count, and the cumsum runs over the tiny O(days) series
    — raw events are scanned exactly once, and the only window input
    is the aggregated frame (the ACF/mix-shift slim-series shape)."""
    e = load_events(spark, sf_dir)
    firsts = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("first_day")
    )
    adds = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").cast("bigint").alias("new_users")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return adds.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias(
            "cumulative_users"
        ),
    )


@register(
    "events_peak_hours",
    sql="""
    WITH hourly AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), neigh AS (
      SELECT h, n, LAG(n) OVER (ORDER BY h) AS p,
             LEAD(n) OVER (ORDER BY h) AS nx
      FROM hourly
    )
    SELECT h AS hour_ts, n
    FROM neigh
    WHERE p IS NOT NULL AND nx IS NOT NULL AND n > p AND n > nx
    """,
)
def events_peak_hours(spark, sf_dir):
    """Local-extrema detection: hours whose event count strictly
    exceeds BOTH sequence neighbors (LAG/LEAD over the hourly series)
    — the peak finder behind alerting and capacity reports. Neighbors
    are sequence neighbors over OBSERVED hours (a gap-filled calendar
    variant would first join the date spine); strict > on exact
    integer counts means the verdict cannot split on ties or
    rounding. The raw scan reduces to the O(hours) frame before any
    window touches it."""
    e = load_events(spark, sf_dir)
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("bigint").alias("n"))
    w = Window.orderBy("h")
    neigh = hourly.select(
        "h",
        "n",
        F.lag("n").over(w).alias("p"),
        F.lead("n").over(w).alias("nx"),
    )
    return neigh.filter(
        F.col("p").isNotNull()
        & F.col("nx").isNotNull()
        & (F.col("n") > F.col("p"))
        & (F.col("n") > F.col("nx"))
    ).select(F.col("h").alias("hour_ts"), "n")


@register(
    "customer_revenue_gini",
    sql="""
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rn
      FROM rev
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_revenue,
           ROUND(2.0 * CAST(SUM(rn * cents) AS DOUBLE)
                 / (COUNT(*) * CAST(SUM(cents) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
    FROM ranked
    """,
)
def customer_revenue_gini(spark, sf_dir):
    """Gini coefficient of customer lifetime revenue — the
    concentration metric behind whale-risk reports ("do 1% of
    customers carry half the revenue?"). Revenue goes to exact
    integer cents (prices are 2-decimal, so cents are exact in both
    engines); the ascending rank comes from distributed_window.
    global_row_number (range-partitioned two-pass — NO global
    single-partition window, the same machinery as the RFM quintiles)
    with a (cents, custkey) tiebreak; rank x cents accumulates in
    DECIMAL(38,0) on the Spark side mirroring DuckDB's HUGEINT, so
    both engines convert the SAME exact integers to double for the
    final Gini ratio. At far larger row counts than the test SFs the
    int64 oracle form would need the same widening."""
    from .operators import distributed_window as DW

    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("bigint")
        ).alias("cents")
    )
    pins = []
    ranked, n = DW.global_row_number(
        rev, [F.col("cents").asc(), F.col("o_custkey").asc()],
        out="rn", pins=pins,
    )
    out = ranked.agg(
        F.count("*").cast("bigint").alias("n_customers"),
        (F.sum("cents").cast("double") / F.lit(100.0)).alias(
            "total_revenue"
        ),
        F.round(
            F.lit(2.0)
            * F.sum(
                (F.col("rn") * F.col("cents")).cast("decimal(38,0)")
            ).cast("double")
            / (F.count("*") * F.sum("cents").cast("double"))
            - (F.count("*") + F.lit(1.0)) / F.count("*"),
            6,
        ).alias("gini"),
    )
    return DW.finalize(out, pins)


# ---------------------------------------------------------------------------
# entry-point helpers used by __spark_entry__.py
# ---------------------------------------------------------------------------

# The correctness driver grades entries in the order this dict yields
# them and stops after a cap (round 1: exactly the first 50 of 96).
# The driver grades a 50-entry window per round. Front-load the
# highest-information set: entries with NO driver CORRECTNESS row yet,
# then fixes awaiting re-verification, then a regression slice of
# already-green entries. Rotated each round as evidence lands
# (VERDICT.md round 3, "Next round: do this" #3).
_GRADE_FIRST = [
    # r14 rotation (VERDICT r13 "Next round: do this" #1): (a) the 5
    # entries added during r13 that have no driver CORRECTNESS row
    # anywhere (queries.py HLL/bitmap/stats/ANSI block; all
    # judge-verified gate_sim-green in the r13 verdict); (b) the 45
    # earliest-positioned rows whose latest driver evidence is r09
    # (TPC-H tail, streaming suite, store verbs, curation slice), in
    # registry order. After this window lands green all 251 entries
    # are driver-evidenced and only one row
    # (corpus_boilerplate_line_removal) remains at r09 vintage.
    # COVERAGE.md "Grading manifest" documents the cycle.
    # -- (a) never-graded (added r13) --
    "stats_skew_kurtosis",
    "bitmap_exact_distinct",
    "hll_distinct_bounded",
    "hll_sketch_union_rollup",
    "ansi_safe_arithmetic",
    # -- (b) the 45 earliest r09-vintage rows (registry order) --
    "q9_product_profit",
    "q12_late_shipments",
    "q18_large_orders",
    "q21_waiting_suppliers",
    "window_top3_orders_per_customer",
    "approx_count_distinct",
    "source_csv_roundtrip",
    "source_json_roundtrip",
    "broadcast_join_brand_volume",
    "salted_join_user_events",
    "json_object_extraction",
    "json_extraction",
    "multimodal_resize",
    "multimodal_resize_stub_contract",
    "streaming_sliding_counts",
    "streaming_append_out_of_order",
    "streaming_dedup_exact",
    "streaming_session_windows",
    "streaming_stream_stream_join",
    "streaming_stateful_user_stats",
    "verb_modify_schema",
    "verb_primary_key_audit",
    "verb_read_values_sql",
    "verb_merge_identity",
    "verb_schema_validate_convert",
    "verb_read_where_grammar",
    "multimodal_audio_features",
    "pack_sequences_budget",
    "verb_composite_pk_pruned_ingest",
    "verb_merge_partition_reload",
    "verb_scd2_composite_key",
    "embedding_int8_quantize",
    "window_value_functions",
    "doc_chunking",
    "char_entropy_quality",
    "per_source_cap",
    "python_udtf_char_ngrams",
    "map_functions",
    "text_repetition_features",
    "corpus_quality_filter",
    "decontamination_overlap",
    "pii_redaction",
    "corpus_mixture_audit",
    "source_orc_roundtrip",
    "doc_line_dedup",
]


def _ordered_registry():
    seen = [n for n in _GRADE_FIRST if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in _GRADE_FIRST]
    return seen + rest


def all_queries():
    return {name: REGISTRY[name]["fn"] for name in _ordered_registry()}


def all_oracles():
    return {
        name: REGISTRY[name]["sql"]
        for name in _ordered_registry()
        if REGISTRY[name]["sql"]
    }
