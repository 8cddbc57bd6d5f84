"""Relational operator layer — scans, filters, joins, aggregates, windows,
set ops, scalar functions, subqueries.

The reference implements none of these (SURVEY.md §2.4: its only dataflow is
scan→coalesce→count→write, `DefragmentAvroFolder.scala:267-298`); here each
is expressed declaratively with the DataFrame API so Catalyst supplies
pushdown, pruning, join selection and whole-stage codegen, and AQE re-plans
shuffles at runtime. Every query has a DuckDB oracle twin.

Scale notes baked into each builder:
- dimension joins (region/nation/supplier at TPC-H ratios) are explicitly
  `broadcast()` — no shuffle of the fact table for them at any scale;
- fact-fact joins (orders⋈lineitem) are left to sort-merge/shuffled-hash with
  AQE skew splitting — the right default at 100 TB;
- aggregates use exact decimal sums (functions/numeric.py) which are also
  partial-aggregation friendly (map-side combine);
- every top-k is `ORDER BY … LIMIT k` with a full tiebreak so results are
  deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .. import catalog
from ..functions.numeric import (  # noqa: F401
    DEC,
    davg,
    dsum,
    dsum_expr,
    qrem_round6_duck,
    qrem_round6_spark,
    rat_round6_duck,
    rat_round6_signed_duck,
    rat_round6_signed_spark,
    rat_round6_spark,
    sql_davg,
    sql_dsum,
)
from ..registry import QuerySpec

REVENUE = "l_extendedprice * (1 - l_discount)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.load(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → agg → sort)
# --------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_par: the 7 decimal partial aggregates are the expensive map work;
    # on a sub-split input the whole stage would run as ONE task (single row
    # group). See catalog.load_par — no-op at real scale.
    li = catalog.load_par(spark, sf_dir, "lineitem", "l_orderkey")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(REVENUE, "sum_disc_price"),
            dsum_expr(f"{REVENUE} * (1 + l_tax)", "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q01 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum(REVENUE)} AS sum_disc_price,
       {sql_dsum(f'{REVENUE} * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Scan / filter / projection (predicate + column pushdown reach the scan)
# --------------------------------------------------------------------------

def q02_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 10)
        )
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("lno"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("disc"),
        )
    )


ORACLE_Q02 = """
SELECT l_orderkey AS okey, l_linenumber AS lno,
       l_extendedprice AS price, l_discount AS disc
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_discount >= 0.05 AND l_quantity < 10
"""


# --------------------------------------------------------------------------
# TPC-H Q3-shaped: fact⋈fact join + agg + deterministic top-k
# --------------------------------------------------------------------------

def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(REVENUE, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q03 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum(REVENUE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# TPC-H Q4-shaped: EXISTS (semi-join) with non-equi correlation
# --------------------------------------------------------------------------

def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q04 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# TPC-H Q5-shaped: 6-way join, dims broadcast, same-nation constraint
# --------------------------------------------------------------------------

def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey)
                    & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_expr(REVENUE, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


ORACLE_Q05 = f"""
SELECT n_name, {sql_dsum(REVENUE)} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------------
# TPC-H Q10-shaped: returned-item reporting, deterministic top-20
# --------------------------------------------------------------------------

def q10_returned_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_expr(REVENUE, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {sql_dsum(REVENUE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: pure scan+filter+agg — every predicate must reach
    the parquet scan (PushedFilters), no join, no shuffle beyond the
    single-row final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum_expr("l_extendedprice * l_discount", "revenue"))


ORACLE_Q06 = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: supplier-nation × customer-nation trade volumes per
    ship year. Both nation dims broadcast; the fact-fact orders⋈lineitem
    join stays sort-merge under AQE."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum_expr(REVENUE, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_Q07 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       {sql_dsum(REVENUE)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: conditional aggregation ratio over a broadcast
    part join, one month of shipments."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    part = _t(spark, sf_dir, "part")
    rev = f"cast({REVENUE} as decimal(25,6))"
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.sum(
                    F.expr(
                        f"case when p_type like 'PROMO%' then {rev} "
                        f"else cast(0.0 as decimal(25,6)) end"
                    )
                ).cast("double")
                * 100.0
                / F.sum(F.expr(rev)).cast("double")
            ).alias("promo_pct")
        )
    )


ORACLE_Q14 = f"""
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST({REVENUE} AS DECIMAL(25,6))
                     ELSE CAST(0.0 AS DECIMAL(25,6)) END) AS DOUBLE)
       * 100.0
       / CAST(SUM(CAST({REVENUE} AS DECIMAL(25,6))) AS DOUBLE) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


# --------------------------------------------------------------------------
# Join family: outer / semi / anti / broadcast / non-equi range
# --------------------------------------------------------------------------

def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum_expr("coalesce(o_totalprice, 0.0)", "total_spend"),
        )
        .filter(F.col("n_orders") <= 2)
        .orderBy("c_custkey")
    )


ORACLE_JOIN_LEFT = f"""
SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
       {sql_dsum('coalesce(o_totalprice, 0.0)')} AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
HAVING COUNT(o_orderkey) <= 2
ORDER BY c_custkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-nation customer count FULL OUTER per-nation supplier count
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


ORACLE_JOIN_FULL = """
WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
           WHERE s_acctbal > 5000 GROUP BY 1)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
ORDER BY nationkey
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


ORACLE_JOIN_SEMI = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


ORACLE_JOIN_ANTI = """
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Explicit broadcast of the part dim: at fixture scale part ≪ lineitem;
    # at 100 TB you'd bound this with spark.sql.autoBroadcastJoinThreshold
    # and let AQE fall back to shuffled hash — the hint is advisory.
    li = catalog.load_par(spark, sf_dir, "lineitem", "l_orderkey")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dsum_expr(REVENUE, "revenue"),
        )
        .orderBy("p_brand")
    )


ORACLE_JOIN_BCAST = f"""
SELECT p_brand, COUNT(*) AS n_items, {sql_dsum(REVENUE)} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Non-equi (theta) join against a tiny in-memory band dim → Catalyst
    # plans BroadcastNestedLoopJoin, the right shape for band lookups.
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 900.0, 935.0), ("mid", 935.0, 970.0), ("premium", 970.0, 1000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(F.count("*").alias("n_parts"), davg("p_retailprice", "avg_price"))
        .orderBy("band")
    )


ORACLE_JOIN_RANGE = f"""
SELECT band, COUNT(*) AS n_parts, {sql_davg('p_retailprice')} AS avg_price
FROM part
JOIN (VALUES ('budget', 900.0, 935.0), ('mid', 935.0, 970.0),
             ('premium', 970.0, 1000.0)) AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band ORDER BY band
"""


# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------

def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT load_par: the cost here is the distinct-agg Expand+exchange
    # machinery (already parallel), not the single-task scan — an insurance
    # repartition was A/B-measured at +0.28s (r14 optimization round).
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_AGG_DISTINCT = """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            davg("l_quantity", "avg_qty"),
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
            F.count("*").alias("n"),
        )
        .orderBy("l_linestatus")
    )


ORACLE_AGG_STATS = f"""
SELECT l_linestatus, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       {sql_davg('l_quantity')} AS avg_qty,
       MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship,
       COUNT(*) AS n
FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ORACLE_AGG_ROLLUP = f"""
SELECT l_returnflag, l_linestatus, {sql_dsum('l_quantity')} AS sum_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/grouping-level indicators on a rollup — how reports
    distinguish a real NULL group key from a subtotal row (the rollup's
    generated NULLs are otherwise ambiguous). Same single-pass expanded
    aggregate as any rollup; the indicators are free metadata from the
    grouping-set id, no extra shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
        )
        .withColumn(
            "level",
            F.when((F.col("g_flag") == 0) & (F.col("g_status") == 0), "detail")
            .when((F.col("g_flag") == 0) & (F.col("g_status") == 1), "subtotal")
            .otherwise("grand_total"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


ORACLE_GROUPING_ID = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       COUNT(*) AS n,
       CASE WHEN GROUPING(l_returnflag) = 0 AND GROUPING(l_linestatus) = 0
              THEN 'detail'
            WHEN GROUPING(l_returnflag) = 0 AND GROUPING(l_linestatus) = 1
              THEN 'subtotal'
            ELSE 'grand_total' END AS level
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "sum_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORACLE_AGG_CUBE = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {sql_dsum('o_totalprice')} AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame-template SQL (no temp view): concurrent builders on one
    # session must not race on global view names (ADVICE r1).
    orders = catalog.load(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               {sql_dsum('o_totalprice')} AS sum_price
        FROM {{orders}}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """,
        orders=orders,
    )


ORACLE_AGG_GSETS = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {sql_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.count("*").alias("n_items"), dsum_expr(REVENUE, "revenue"))
        .filter(F.col("n_items") > 550)
        .orderBy("l_suppkey")
    )


ORACLE_AGG_HAVING = f"""
SELECT l_suppkey, COUNT(*) AS n_items, {sql_dsum(REVENUE)} AS revenue
FROM lineitem GROUP BY l_suppkey HAVING COUNT(*) > 550 ORDER BY l_suppkey
"""


HLL_RSD = 0.02  # approx_count_distinct relative standard deviation
HLL_BAND = 0.10  # certificate band: 5·rsd


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct-count sketch with a deterministic error-band
    certificate (retires the r13 VERDICT "no oracle" row via the
    sketch_grid_quantile_error / decontaminate_bloom precedent).

    The raw estimate can never carry a cross-engine value hash — DuckDB's
    approx_count_distinct is a different HLL implementation — but it IS
    deterministic GIVEN the data: Spark's HyperLogLogPlusPlus buffer is a
    dense register array merged by elementwise MAX (commutative,
    idempotent), so the estimate is partition- and merge-order
    independent. The op therefore emits the exact count next to a
    certificate that the live sketch lands within ±HLL_BAND (5·rsd) of
    exact, and the oracle emits the verdict the sketch contract promises.
    Epistemics: unlike the GK rank certificate this is a measured bound,
    not a theorem (HLL's ±2σ is probabilistic) — it is verified at all
    three fixture SFs and additionally pinned by
    test_approx_distinct_close_to_exact.

    Scale: one groupBy carrying both the mergeable sketch and the exact
    distinct (the expensive exact side exists only to AUDIT the sketch;
    a production read keeps the sketch alone)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", HLL_RSD).alias("est"),
            F.countDistinct("l_orderkey").cast("long").alias("n_exact"),
        )
        .select(
            "l_returnflag",
            "n_exact",
            (
                F.abs(F.col("est") - F.col("n_exact"))
                <= F.lit(HLL_BAND) * F.col("n_exact")
            ).alias("hll_band_ok"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_APPROX_DISTINCT = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
       TRUE AS hll_band_ok
FROM lineitem GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# Window family
# --------------------------------------------------------------------------

def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-3 parts per brand by retail price — row_number + filter, the
    # standard Spark top-k-per-group shape (shuffles once on the partition
    # key; at scale prefer this over any groupBy+collect_list approach).
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "rnk", "p_partkey", "p_retailprice")
        .orderBy("p_brand", "rnk")
    )


ORACLE_WIN_TOPK = """
SELECT p_brand, rnk, p_partkey, p_retailprice FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rnk
  FROM part) t
WHERE rnk <= 3 ORDER BY p_brand, rnk
"""


def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group WITH TIES — the RANK() semantics ANSI's ``FETCH
    FIRST k ROWS WITH TIES`` promises, vs ``window_topk_per_group``'s
    ROW_NUMBER cut which silently drops tied peers (a correctness bug
    when the cut is a leaderboard or quota): every customer whose
    $1000-band account balance ties into a nation's top 3 bands stays.
    Banding to BIGINT thousand-cents guarantees the tie class is
    actually exercised (exact integer comparison, no double-equality
    hazard). Same one-shuffle posture as the row_number form."""
    cust = _t(spark, sf_dir, "customer")
    banded = cust.select(
        "c_nationkey",
        "c_custkey",
        F.expr(
            "cast(floor(c_acctbal * 100 + 0.5) as bigint) div 100000"
        ).alias("bal_band"),
    )
    w = W.partitionBy("c_nationkey").orderBy(F.desc("bal_band"))
    return (
        banded.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "rnk", "bal_band", "c_custkey")
        .orderBy("c_nationkey", "rnk", "c_custkey")
    )


ORACLE_WIN_TOPK_TIES = """
SELECT c_nationkey, rnk, bal_band, c_custkey FROM (
  SELECT c_nationkey, c_custkey, bal_band,
         RANK() OVER (PARTITION BY c_nationkey
                      ORDER BY bal_band DESC) AS rnk
  FROM (SELECT c_nationkey, c_custkey,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) // 100000
                 AS bal_band
        FROM customer)) t
WHERE rnk <= 3 ORDER BY c_nationkey, rnk, c_custkey
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast(DEC)).over(w).cast("double").alias("running_qty"),
    )


ORACLE_WIN_RUNNING = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6)))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_qty
FROM lineitem WHERE l_suppkey < 5
"""


def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        (F.col("o_totalprice") - F.lag("o_totalprice", 1).over(w)).alias("delta"),
    )


ORACLE_WIN_LAGLEAD = """
SELECT o_custkey, o_orderkey,
       LAG(o_totalprice, 1) OVER w AS prev_price,
       LEAD(o_totalprice, 1) OVER w AS next_price,
       o_totalprice - LAG(o_totalprice, 1) OVER w AS delta
FROM orders WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("moving_avg"),
    )


ORACLE_WIN_MAVG = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg
FROM orders WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def window_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    ).filter(F.col("rnk") <= 25)


ORACLE_WIN_RANKDIST = """
SELECT * FROM (
  SELECT c_mktsegment, c_custkey,
         RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
         NTILE(4) OVER w AS quartile, PERCENT_RANK() OVER w AS pct_rank,
         CUME_DIST() OVER w AS cdist
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
WHERE rnk <= 25
"""


def window_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional value window functions over explicit frames: first/last/
    nth value on the full-partition frame and min/max over a ±1-row
    sliding frame. One shuffle on the partition key, per-partition sort —
    the standard windowed-analytics plan at any scale."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 53 == 0)
    order_cols = [F.desc("o_totalprice"), F.asc("o_orderkey")]
    full = (
        W.partitionBy("o_orderpriority")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    near = (
        W.partitionBy("o_orderpriority")
        .orderBy(*order_cols)
        .rowsBetween(-1, 1)
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.first_value("o_orderkey").over(full).alias("top_key"),
        F.last_value("o_orderkey").over(full).alias("bottom_key"),
        F.nth_value("o_orderkey", 2).over(full).alias("second_key"),
        F.min("o_totalprice").over(near).alias("near_min"),
        F.max("o_totalprice").over(near).alias("near_max"),
    ).orderBy("o_orderpriority", "o_orderkey")


ORACLE_WIN_VALUE_FRAMES = """
SELECT o_orderpriority, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER wf AS top_key,
       LAST_VALUE(o_orderkey) OVER wf AS bottom_key,
       NTH_VALUE(o_orderkey, 2) OVER wf AS second_key,
       MIN(o_totalprice) OVER wn AS near_min,
       MAX(o_totalprice) OVER wn AS near_max
FROM orders WHERE o_orderkey % 53 = 0
WINDOW
  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
  wn AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
         ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
ORDER BY o_orderpriority, o_orderkey
"""


# --------------------------------------------------------------------------
# Sort / limit, set operations
# --------------------------------------------------------------------------

def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(15)
    )


ORACLE_TOPK = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15
"""


def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct().orderBy("custkey")


ORACLE_SET_UNION = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
ORDER BY custkey
"""


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    b = orders.filter(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b).orderBy("custkey")


ORACLE_SET_INTERSECT = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
ORDER BY custkey
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    a = cust.select(F.col("c_custkey").alias("custkey"))
    b = orders.select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b.distinct()).orderBy("custkey")


ORACLE_SET_EXCEPT = """
SELECT c_custkey AS custkey FROM customer
EXCEPT ALL
SELECT DISTINCT o_custkey FROM orders
ORDER BY custkey
"""


# --------------------------------------------------------------------------
# Scalar function coverage (string / date / math / conditional / JSON)
# --------------------------------------------------------------------------

def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 37 == 0)
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 1, 4).alias("sub4"),
        F.concat_ws("|", "p_brand", "p_type").alias("cat"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("novowel"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("lastword"),
        F.lpad("p_brand", 12, "0").alias("padded"),
        F.reverse("p_brand").alias("rev"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.split(F.col("p_name"), " ").getItem(0).alias("word0"),
    )


ORACLE_SCALAR_STRING = """
SELECT p_partkey,
       UPPER(p_name) AS up, LOWER(p_type) AS lo, LENGTH(p_name) AS len,
       SUBSTRING(p_name, 1, 4) AS sub4,
       CONCAT_WS('|', p_brand, p_type) AS cat,
       REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS novowel,
       COALESCE(REGEXP_EXTRACT(p_name, '([a-z]+)$', 1), '') AS lastword,
       LPAD(p_brand, 12, '0') AS padded,
       REVERSE(p_brand) AS rev,
       TRIM('  x  ') AS trimmed,
       string_split(p_name, ' ')[1] AS word0
FROM part WHERE p_partkey % 37 = 0
"""


def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.trunc("o_orderdate", "month").alias("mon_start"),
        F.last_day("o_orderdate").alias("mon_end"),
        F.datediff(
            F.to_date(F.col("o_orderdate")), F.lit("1995-01-01").cast("date")
        ).alias("days_since"),
        F.date_add(F.to_date(F.col("o_orderdate")), 30).alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


ORACLE_SCALAR_DATE = """
SELECT o_orderkey,
       YEAR(o_orderdate) AS yr, QUARTER(o_orderdate) AS qtr,
       MONTH(o_orderdate) AS mon, DAYOFMONTH(o_orderdate) AS dom,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mon_start,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS mon_end,
       DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         AS days_since,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       STRFTIME(o_orderdate, '%Y-%m') AS ym
FROM orders WHERE o_orderkey % 97 = 0
"""


def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 13 == 0)
    return cust.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abs_bal"),
        F.ceil("c_acctbal").alias("ceil_bal"),
        F.floor("c_acctbal").alias("floor_bal"),
        F.round("c_acctbal", 1).alias("round_bal"),
        F.round(F.sqrt(F.abs("c_acctbal")), 6).alias("sqrt_bal"),
        F.round(F.log1p(F.abs("c_acctbal")), 6).alias("ln1p_bal"),
        F.signum("c_acctbal").alias("sign_bal"),
        (F.col("c_custkey") % 7).alias("mod7"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("pos_part"),
        F.least("c_acctbal", F.lit(0.0)).alias("neg_part"),
        (F.col("c_acctbal") * F.col("c_acctbal")).alias("sq"),
    )


ORACLE_SCALAR_MATH = """
SELECT c_custkey,
       ABS(c_acctbal) AS abs_bal,
       CAST(CEIL(c_acctbal) AS BIGINT) AS ceil_bal,
       CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
       ROUND(c_acctbal, 1) AS round_bal,
       ROUND(SQRT(ABS(c_acctbal)), 6) AS sqrt_bal,
       ROUND(LN(1 + ABS(c_acctbal)), 6) AS ln1p_bal,
       CAST(SIGN(c_acctbal) AS DOUBLE) AS sign_bal,
       c_custkey % 7 AS mod7,
       GREATEST(c_acctbal, 0.0) AS pos_part,
       LEAST(c_acctbal, 0.0) AS neg_part,
       c_acctbal * c_acctbal AS sq
FROM customer WHERE c_custkey % 13 = 0
"""


def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return (
        orders.select(
            tier.alias("tier"),
            F.coalesce(
                F.nullif("o_orderstatus", F.lit("P")), F.lit("pending")
            ).alias("status_or_pending"),
        )
        .groupBy("tier", "status_or_pending")
        .agg(F.count("*").alias("n"))
        .orderBy("tier", "status_or_pending")
    )


ORACLE_SCALAR_COND = """
SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid' ELSE 'low' END AS tier,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_pending,
       COUNT(*) AS n
FROM orders GROUP BY 1, 2 ORDER BY 1, 2
"""


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_par: per-row JSON parsing is the map cost — parallelize it when
    # the input is below one scan split (no-op at real scale).
    ev = catalog.load_par(spark, sf_dir, "events", "event_id")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


ORACLE_JSON = """
SELECT event_type, COUNT(*) AS n,
       -- BIGINT cast: DuckDB SUM(INTEGER) yields HUGEINT (int128), which
       -- degrades to float64 through arrow and breaks the driver's value
       -- hash against Spark's bigint (VERDICT r1 item 1).
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big_parts = _t(spark, sf_dir, "part").filter(F.col("p_size") > 45)
    return (
        li.join(
            F.broadcast(big_parts.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), dsum_expr(REVENUE, "revenue"))
        .orderBy("l_returnflag")
    )


ORACLE_IN_SUBQ = f"""
SELECT l_returnflag, COUNT(*) AS n, {sql_dsum(REVENUE)} AS revenue
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DataFrame-template SQL (no temp view) — see agg_grouping_sets.
    supplier = catalog.load(spark, sf_dir, "supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, s_nationkey FROM {sup} s1
        WHERE s_acctbal > (SELECT AVG(s_acctbal) FROM {sup} s2
                           WHERE s2.s_nationkey = s1.s_nationkey)
        ORDER BY s_suppkey
        """,
        sup=supplier,
    )


ORACLE_CORR_SUBQ = """
SELECT s_suppkey, s_name, s_nationkey FROM supplier s1
WHERE s_acctbal > (SELECT AVG(s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = s1.s_nationkey)
ORDER BY s_suppkey
"""


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .orderBy("l_returnflag")
    )


ORACLE_PIVOT = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS DOUBLE) AS "O",
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(25,6)) END) AS DOUBLE) AS "F"
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/quartiles) per group. Both engines use
    linear interpolation at rank p*(n-1); results are rounded to 4 dp in
    BOTH queries so a last-ulp interpolation difference cannot flake the
    value hash. Spark's exact `percentile` is a full-sort-per-group
    aggregate — fine per group; `approx_percentile` is the sketch
    alternative at extreme cardinalities."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("qty_median"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_PERCENTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median,
       ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS qty_median
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral expansion with ordinality (posexplode) — the UDTF-shaped
    surface; map-only, no shuffle until the final presentation sort."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).orderBy("doc_id", "pos")


ORACLE_LATERAL = """
SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, ws[i] AS word
FROM (SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE doc_id < 50),
     LATERAL unnest(generate_series(1, len(ws))) AS u(i)
ORDER BY doc_id, pos
"""


def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family: extract / replace-all / match-filter."""
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").rlike("[aeiou]{2}"))
        .select(
            "p_partkey",
            F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        )
        .orderBy("p_partkey")
    )


ORACLE_REGEXP = """
SELECT p_partkey,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part WHERE regexp_matches(p_name, '[aeiou]{2}')
ORDER BY p_partkey
"""


def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar family over real data: split, sort, distinct, slice,
    element_at, contains — all codegen'd JVM expressions."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        docs.withColumn("ws", F.split("text", " "))
        .select(
            "doc_id",
            F.size("ws").alias("n"),
            F.element_at(F.array_sort("ws"), 1).alias("first_sorted"),
            F.size(F.array_distinct("ws")).alias("n_uniq"),
            F.concat_ws("|", F.slice("ws", 1, 3)).alias("head3"),
            F.array_contains("ws", "the").cast("int").alias("has_the"),
        )
        .orderBy("doc_id")
    )


ORACLE_ARRAY_OPS = """
SELECT doc_id,
       len(ws) AS n,
       list_sort(ws)[1] AS first_sorted,
       len(list_distinct(ws)) AS n_uniq,
       array_to_string(ws[1:3], '|') AS head3,
       CAST(list_contains(ws, 'the') AS INTEGER) AS has_the
FROM (SELECT doc_id, string_split(text, ' ') AS ws
      FROM documents WHERE doc_id < 100)
ORDER BY doc_id
"""


def set_ops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (ALL variants): duplicates preserved/counted,
    unlike the distinct set ops registered separately."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select("l_orderkey", "l_returnflag")
    b = li.filter(F.col("l_discount") >= 0.05).select("l_orderkey", "l_returnflag")
    return (
        a.unionAll(b)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_union_all"))
        .join(
            a.exceptAll(b)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n_except_all")),
            "l_returnflag",
            "left",
        )
        .join(
            a.intersectAll(b)
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n_intersect_all")),
            "l_returnflag",
            "left",
        )
        .orderBy("l_returnflag")
    )


ORACLE_SET_BAG = """
WITH a AS (SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity >= 25),
     b AS (SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_discount >= 0.05),
     u AS (SELECT l_returnflag, COUNT(*) AS n_union_all
           FROM (SELECT * FROM a UNION ALL SELECT * FROM b) GROUP BY 1),
     e AS (SELECT l_returnflag, COUNT(*) AS n_except_all
           FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1),
     i AS (SELECT l_returnflag, COUNT(*) AS n_intersect_all
           FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1)
SELECT u.l_returnflag, u.n_union_all, e.n_except_all, i.n_intersect_all
FROM u LEFT JOIN e USING (l_returnflag) LEFT JOIN i USING (l_returnflag)
ORDER BY l_returnflag
"""


def agg_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: Pearson correlation, sample covariance and
    stddev. Rounded to 6 dp in both engines — one-pass vs two-pass moment
    formulas differ in the last ulps."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
                "covar_qp"
            ),
            F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_CORR = """
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
       ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qp,
       ROUND(stddev_samp(l_discount), 6) AS sd_disc
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product — only ever legitimate between two
    bounded dimension tables (here region × nation grid with a count of
    suppliers per cell)."""
    region = _t(spark, sf_dir, "region").select("r_name")
    nation = _t(spark, sf_dir, "nation").select("n_name", "n_nationkey")
    sup = _t(spark, sf_dir, "supplier")
    grid = region.crossJoin(nation)
    counts = sup.groupBy("s_nationkey").agg(F.count("*").alias("n_sup"))
    return (
        grid.join(counts, grid.n_nationkey == counts.s_nationkey, "left")
        .select(
            "r_name",
            "n_name",
            F.coalesce("n_sup", F.lit(0)).alias("n_sup"),
        )
        .orderBy("r_name", "n_name")
    )


ORACLE_CROSS = """
SELECT r_name, n_name, COALESCE(c.n_sup, 0) AS n_sup
FROM region CROSS JOIN nation
LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n_sup
           FROM supplier GROUP BY 1) c
  ON nation.n_nationkey = c.s_nationkey
ORDER BY r_name, n_name
"""


# --------------------------------------------------------------------------
# EXISTS / NOT EXISTS correlated subqueries + outer-join-count
# (TPC-H q21/q22/q13 shapes — the subquery class real users hit right
# after IN-subqueries; reference has no SQL at all, SURVEY §2.4)
# --------------------------------------------------------------------------

def exists_sole_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: for finished orders, the supplier whose lineitem
    was returned where EXISTS another supplier's lineitem in the same
    order but NOT EXISTS another *returned* lineitem from a different
    supplier — i.e. the sole supplier at fault. Catalyst plans both
    correlated subqueries as semi/anti hash joins on l_orderkey (shuffle
    on the fact key; supplier dim broadcast) — no nested loops, scales."""
    supplier = catalog.load(spark, sf_dir, "supplier")
    lineitem = catalog.load(spark, sf_dir, "lineitem")
    orders = catalog.load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT s_name, COUNT(*) AS numwait
        FROM {sup} s, {li} l1, {ord} o
        WHERE s.s_suppkey = l1.l_suppkey
          AND o.o_orderkey = l1.l_orderkey
          AND o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM {li} l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM {li} l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        """,
        sup=supplier,
        li=lineitem,
        ord=orders,
    )


ORACLE_EXISTS_SOLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier s, lineitem l1, orders o
WHERE s.s_suppkey = l1.l_suppkey
  AND o.o_orderkey = l1.l_orderkey
  AND o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


def not_exists_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: positive-balance customers in selected "country
    code" buckets (substring of c_name — the fixture has no c_phone) whose
    balance beats the population average and who have no URGENT orders
    (every fixture customer has >=1 order, so the anti-join predicate is
    on priority; NOT EXISTS → left-anti join). The scalar-avg subquery is a broadcast
    single-row cross; the anti join shuffles on o_custkey — scales. The
    average threshold is exact-decimal SUM / COUNT (this file's dsum
    convention) so float summation order can't flip a customer whose
    balance sits within rounding distance of the mean on either engine."""
    customer = catalog.load(spark, sf_dir, "customer")
    orders = catalog.load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 AS totacctbal
        FROM (
          SELECT SUBSTRING(c.c_name, LENGTH(c.c_name), 1) AS cntrycode,
                 c.c_acctbal
          FROM {cust} c
          WHERE SUBSTRING(c.c_name, LENGTH(c.c_name), 1) IN
                  ('1', '3', '5', '7')
            AND c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                                    AS DOUBLE) / COUNT(*)
                               FROM {cust} c2 WHERE c2.c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM {ord} o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '1-URGENT')
        )
        GROUP BY cntrycode
        ORDER BY cntrycode
        """,
        cust=customer,
        ord=orders,
    )


ORACLE_NOT_EXISTS_IDLE = """
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (
  SELECT SUBSTRING(c.c_name, LENGTH(c.c_name), 1) AS cntrycode,
         c.c_acctbal
  FROM customer c
  WHERE SUBSTRING(c.c_name, LENGTH(c.c_name), 1) IN ('1', '3', '5', '7')
    AND c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                            AS DOUBLE) / COUNT(*)
                       FROM customer c2 WHERE c2.c_acctbal > 0.0)
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
)
GROUP BY cntrycode
ORDER BY cntrycode
"""


def outer_join_count_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: distribution of per-customer order counts via a
    LEFT OUTER join (customers with zero orders stay, count 0). The right
    side is pre-filtered (predicate on orders only — equivalent to putting
    it in the outer-join condition), so the filter pushes to the scan; the
    join and first agg share one shuffle on the customer key — scales."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(
            orders, customer.c_custkey == orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_OUTER_COUNT_DIST = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: average yearly revenue lost if small-quantity
    lineitems (below 40% of their part's average quantity) moved to bulk.
    The correlated per-part scalar average becomes one hash agg + a join
    back on l_partkey — at scale both sides shuffle on the same key (one
    exchange each), and the brand filter on part is broadcast. Crucially
    the per-part average is computed only over lineitems of the ~1/|brands|
    surviving parts: lineitem is semi-joined to the broadcast filtered part
    keys BEFORE the groupBy, so no full-fact-table exchange feeds the
    threshold agg (threshold rows of non-matching parts are never read, so
    the answer is unchanged). No row ever meets the threshold subquery more
    than once."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    brand_keys = part.select("p_partkey")
    li_brand = li.join(
        F.broadcast(brand_keys),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    part_avg = (
        li_brand.groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.4).alias("qty_threshold"))
    )
    return (
        li.join(F.broadcast(brand_keys),
                li.l_partkey == F.col("p_partkey"))
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0)
            .alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


ORACLE_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
JOIN (SELECT l_partkey, 0.4 * AVG(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey) t
  ON t.l_partkey = l.l_partkey
WHERE l.l_quantity < t.qty_threshold
"""


Q18_MIN_QTY = 300


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: customers with orders whose total quantity
    exceeds Q18_MIN_QTY. The HAVING-filtered per-order agg is tiny; it
    drives a semi-join back into orders/customer. One shuffle on
    l_orderkey for the agg; the survivor set is small enough to broadcast
    into the fact joins at any scale (high-quantity orders are rare)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
    )


ORACLE_Q18 = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > {Q18_MIN_QTY}) b
  ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: revenue from an OR of three conjunctive
    brand/size/quantity band predicates. One broadcast join on p_partkey;
    the disjunction stays a single JVM predicate evaluated post-join (the
    join key is shared by all three branches, so no union-of-joins)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 21))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 45))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return joined.filter(band).agg(
        dsum_expr(REVENUE, "revenue"), F.count("*").alias("n_items")
    )


ORACLE_Q19 = f"""
SELECT {sql_dsum(REVENUE)} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45
       AND l_quantity BETWEEN 20 AND 40)
"""


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: one nation's share of ECONOMY-part revenue in the
    AMERICA region per order year. All four dims (part, supplier, nation,
    region) broadcast; the only big shuffles are the lineitem⋈orders and
    ⋈customer fact joins on their natural keys. The share is a ratio of
    two exact decimal sums (order-independent), divided once in double."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n_cust = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum_expr(
                f"CASE WHEN supp_nation = 'NATION_6' THEN {REVENUE}"
                " ELSE 0.0 END",
                "nation_volume",
            ),
            dsum_expr(REVENUE, "total_volume"),
        )
        .withColumn(
            "mkt_share", F.col("nation_volume") / F.col("total_volume")
        )
        .orderBy("o_year")
    )


ORACLE_Q08 = f"""
SELECT o_year, nation_volume, total_volume,
       nation_volume / total_volume AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         {sql_dsum(f"CASE WHEN n2.n_name = 'NATION_6' THEN {REVENUE} ELSE 0.0 END")}
           AS nation_volume,
         {sql_dsum(REVENUE)} AS total_volume
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY 1)
ORDER BY o_year
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) with the maximum quarterly revenue.
    The revenue "view" is one hash agg on l_suppkey; its max is a
    single-row broadcast joined back (scalar-subquery shape with no second
    scan of lineitem thanks to decimal-exact equality). Supplier dim
    broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    supp = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(dsum_expr(REVENUE, "total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey, {sql_dsum(REVENUE)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped (partsupp absent from the fixture set — the
    observed supplier⋈part relation is distinct (l_partkey, l_suppkey)
    pairs from lineitem). Counts distinct suppliers per (brand, type,
    size) excluding one brand and suppliers in arrears (NOT IN shape →
    broadcast anti join). The pair-distinct is one shuffle; the count-
    distinct agg reshuffles on the narrow grouping key."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_size") <= 20)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad_supp),
            pairs.l_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON ps.l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_size <= 20
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped (fixtures carry no shipmode/commitdate, so the
    late-line criterion is shipped >90 days after order date): per order
    priority, counts of late vs on-time lineitems via conditional sums.
    One fact-fact join on the order key, then a 5-group agg — the
    case-sum keeps it a single pass."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_count"),
            F.sum(F.when(late, 0).otherwise(1)).alias("ontime_count"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_Q12 = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
       CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                THEN 0 ELSE 1 END) AS BIGINT) AS ontime_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# Supply-cost proxy for the q09 profit expression: the fixture set has no
# partsupp table (same adaptation as q16), so cost rides on the part dim.
Q09_COST = "0.6 * p_retailprice * l_quantity"
Q09_PROFIT = f"{REVENUE} - {Q09_COST}"


def q09_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: profit on '%red%' parts per supplier nation and
    order year (supply cost proxied from the part dim — no partsupp in
    the fixtures). Part/supplier/nation dims broadcast; the only big
    shuffle is the lineitem⋈orders fact join on the order key. The
    grouping key is an EXPRESSION (year(o_orderdate)) — computed map-side
    before the partial agg, so the shuffle carries (nation, year) pairs,
    never dates. Profit is summed in exact decimal (order-independent)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum_expr(Q09_PROFIT, "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE_Q09 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {sql_dsum(Q09_PROFIT)} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


Q11_NATIONS = ("NATION_3", "NATION_15", "NATION_19")


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: parts representing an outsized share of the
    revenue flowing through a nation group's suppliers — HAVING against a
    scalar subquery of the SAME aggregate (no partsupp in the fixtures:
    "stock value" is lineitem revenue through those suppliers).

    The per-part agg is one hash shuffle on l_partkey (supplier filter is
    a broadcast semi-join before it). The scalar total re-aggregates the
    per-part RESULT (parts-sized, not fact-sized — no second scan) into
    one row that broadcasts into the HAVING filter. The share threshold
    compares exact decimals with integer multipliers (value*n*5 >
    total*6 ⇔ value > 1.2·mean) so no float rounding can flip a part
    near the cut on either engine."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(*Q11_NATIONS)
    )
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    per_part = (
        li.join(
            F.broadcast(nat_supp),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(REVENUE).cast(DEC)).alias("val_dec"))
    )
    totals = per_part.agg(
        F.sum("val_dec").alias("tot_dec"), F.count("*").alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(
            F.col("val_dec") * F.col("n_parts") * 5 > F.col("tot_dec") * 6
        )
        .select(
            "l_partkey", F.col("val_dec").cast("double").alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


ORACLE_Q11 = f"""
WITH v AS (
  SELECT l_partkey, SUM(CAST({REVENUE} AS DECIMAL(25,6))) AS val_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN {Q11_NATIONS!r})
  GROUP BY l_partkey),
t AS (SELECT SUM(val_dec) AS tot_dec, COUNT(*) AS n_parts FROM v)
SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM v, t
WHERE val_dec * n_parts * 5 > tot_dec * 6
ORDER BY part_value DESC, l_partkey
"""


Q20_MIN_QTY = 40


def q20_qualified_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped chained semi-joins: suppliers (in a nation group)
    who shipped more than Q20_MIN_QTY units of any 'red%' part during
    1997. Three links, each a semi-join so no payload widens the fact
    scan: lineitem SEMI part-keys (broadcast) → per-(part, supplier)
    decimal-sum HAVING → distinct supplier keys (tiny, broadcast) SEMI
    supplier ⋈ broadcast nation filter. The only fact-sized shuffle is
    the (l_partkey, l_suppkey) agg."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_8", "NATION_9", "NATION_15")
    )
    qual_supp = (
        li.join(
            F.broadcast(red_parts),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > Q20_MIN_QTY)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(
            F.broadcast(qual_supp),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_waiting_supplier_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), ADAPTED: the
    fixture lineitem carries no l_commitdate/l_receiptdate (TESTDATA),
    so "the late supplier" becomes "the SOLE LATEST shipper" — in a
    finished multi-supplier order, the one supplier whose line carries
    the order's max shipdate while no other supplier ships that day
    (everyone else finished earlier → this supplier gated the order).
    Preserves Q21's full relational shape: fact self-join, EXISTS
    (another supplier in the order), NOT EXISTS (no co-latest
    supplier), dimension join, top-20 by (numwait DESC, s_name).

    Plan: the per-order max/supplier-count reduce once on orderkey;
    the latest-line join re-uses that shuffle key; the status filter
    semi-joins orders; the supplier dimension broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = _t(spark, sf_dir, "supplier")
    m = (
        li.groupBy("l_orderkey")
        .agg(
            F.max("l_shipdate").alias("mx"),
            F.count_distinct("l_suppkey").alias("ns"),
        )
        .filter(F.col("ns") >= 2)
    )
    latest = (
        li.join(m, "l_orderkey")
        .filter(F.col("l_shipdate") == F.col("mx"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        latest.groupBy("l_orderkey")
        .agg(F.count("*").alias("nl"))
        .filter(F.col("nl") == 1)
        .select("l_orderkey")
    )
    waiting = (
        latest.join(sole, "l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_semi",
        )
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("numwait"))
        .join(
            F.broadcast(
                supp.select(F.col("s_suppkey").alias("l_suppkey"), "s_name")
            ),
            "l_suppkey",
        )
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


ORACLE_Q21_ADAPTED = """
WITH m AS (
  SELECT l_orderkey, MAX(l_shipdate) AS mx,
         COUNT(DISTINCT l_suppkey) AS ns
  FROM lineitem GROUP BY 1),
latest AS (
  SELECT DISTINCT li.l_orderkey, li.l_suppkey
  FROM lineitem li JOIN m ON li.l_orderkey = m.l_orderkey
  WHERE li.l_shipdate = m.mx AND m.ns >= 2),
sole AS (
  SELECT l_orderkey FROM latest GROUP BY 1 HAVING COUNT(*) = 1),
waiting AS (
  SELECT latest.l_orderkey, latest.l_suppkey
  FROM latest JOIN sole USING (l_orderkey)
  WHERE EXISTS (SELECT 1 FROM orders o
                WHERE o.o_orderkey = latest.l_orderkey
                  AND o.o_orderstatus = 'F'))
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM waiting JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 20
"""


def q22_dormant_value_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), ADAPTED: the fixture
    customer has no c_phone, so the country-code grouping becomes the
    NATION key — find customers whose account balance beats the
    average positive balance but who placed no order since 2000-01-01
    (dormant high-value accounts), rolled up per nation. Preserves
    Q22's shape: scalar-subquery threshold + anti-join + dimension
    rollup.

    EXACT threshold: "cents > avg(positive cents)" cross-multiplies to
    cents·n_pos > total_pos_cents — no float average, so a borderline
    account cannot flip between engines."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").alias(
            "cents"
        ),
    )
    nation = _t(spark, sf_dir, "nation")
    pos = cust.filter(F.col("cents") > 0).agg(
        F.sum("cents").cast("long").alias("tot_pos"),
        F.count("*").cast("long").alias("n_pos"),
    )
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate")
            >= F.lit("2000-01-01").cast("timestamp_ntz")
        )
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    sel = (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("cents") * F.col("n_pos") > F.col("tot_pos"))
        .join(recent, "c_custkey", "left_anti")
    )
    return (
        sel.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum("cents").cast("long").alias("totacctbal_cents"),
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("c_nationkey"), "n_name"
                )
            ),
            "c_nationkey",
        )
        .select("n_name", "numcust", "totacctbal_cents")
        .orderBy("n_name")
    )


ORACLE_Q22_ADAPTED = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer),
pos AS (
  SELECT CAST(SUM(cents) AS BIGINT) AS tot_pos,
         CAST(COUNT(*) AS BIGINT) AS n_pos
  FROM c WHERE cents > 0),
sel AS (
  SELECT c.c_nationkey, c.cents
  FROM c, pos
  WHERE c.cents * pos.n_pos > pos.tot_pos
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'))
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(cents) AS BIGINT) AS totacctbal_cents
FROM sel JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name ORDER BY n_name
"""


ORACLE_Q20 = f"""
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_9', 'NATION_15')
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > {Q20_MIN_QTY})
ORDER BY s_suppkey
"""


SKETCH_TOP_K = 10


CMS_D = 4  # count-min depth (hash rows)
CMS_W = 256  # count-min width (buckets per row)
CMS_TOP = 20  # keys probed against the sketch


def sketch_count_min_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch over l_partkey frequencies — with a FULL
    value-hash oracle, unlike the engine-native sketch family: because
    the {CMS_D}x{CMS_W} counter matrix uses FIXED md5-derived bucket
    functions, every counter and every estimate is a pure function of
    the input multiset, so DuckDB reproduces the sketch exactly (the
    same md5-parity idiom as stats_ab_test / dataset_split_hash). The
    probe reports, for the top-{CMS_TOP} true-heaviest keys, the true
    count, the CMS estimate min_j(counter[j][h_j(k)]), and the
    collision overestimate (>= 0 by the CMS guarantee — pytest-pinned).

    Scale: TWO corpus passes in the two-pass posture (counters:
    key-grain agg -> {CMS_D}x fan-out -> {CMS_D}*{CMS_W}-row bounded
    counter table; probe: the same key-grain agg -> top-K selection),
    then a broadcast join of the bounded counter table onto the
    {CMS_TOP}-row probe set. At stream scale the counter build is the
    mergeable-sketch map side; the bounded matrix is the whole state."""

    def bucket(key_col: str, j_col: str) -> str:
        return (
            f"cast(conv(substring(md5(concat(cast({key_col} as string), "
            f"':cms:', cast({j_col} as string))), 1, 7), 16, 10) as bigint) "
            f"% {CMS_W}"
        )

    keys = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").cast("long").alias("true_n"))
    )
    counters = (
        keys.select(
            "l_partkey",
            "true_n",
            F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("j"),
        )
        .withColumn("bkt", F.expr(bucket("l_partkey", "j")))
        .groupBy("j", "bkt")
        .agg(F.sum("true_n").cast("long").alias("cnt"))
    )
    probe = (
        keys.orderBy(F.desc("true_n"), F.asc("l_partkey"))
        .limit(CMS_TOP)
        .select(
            "l_partkey",
            "true_n",
            F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("j"),
        )
        .withColumn("bkt", F.expr(bucket("l_partkey", "j")))
    )
    return (
        probe.join(F.broadcast(counters), ["j", "bkt"])
        .groupBy("l_partkey", "true_n")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
        .select(
            "l_partkey",
            "true_n",
            "cms_est",
            (F.col("cms_est") - F.col("true_n")).cast("long").alias("over_n"),
        )
        .orderBy("l_partkey")
    )


ORACLE_COUNT_MIN = f"""
WITH keys AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM lineitem GROUP BY 1),
js AS (SELECT unnest(range({CMS_D})) AS j),
counters AS (
  SELECT j,
         CAST(('0x' || SUBSTRING(md5(CAST(l_partkey AS VARCHAR) || ':cms:'
                  || CAST(j AS VARCHAR)), 1, 7)) AS BIGINT) % {CMS_W} AS bkt,
         CAST(SUM(true_n) AS BIGINT) AS cnt
  FROM keys CROSS JOIN js GROUP BY 1, 2),
probe AS (
  SELECT l_partkey, true_n FROM keys
  ORDER BY true_n DESC, l_partkey LIMIT {CMS_TOP}),
pj AS (
  SELECT p.l_partkey, p.true_n, j.j,
         CAST(('0x' || SUBSTRING(md5(CAST(p.l_partkey AS VARCHAR) || ':cms:'
                  || CAST(j.j AS VARCHAR)), 1, 7)) AS BIGINT) % {CMS_W} AS bkt
  FROM probe p CROSS JOIN js j)
SELECT pj.l_partkey, pj.true_n,
       CAST(MIN(c.cnt) AS BIGINT) AS cms_est,
       CAST(MIN(c.cnt) - pj.true_n AS BIGINT) AS over_n
FROM pj JOIN counters c ON pj.j = c.j AND pj.bkt = c.bkt
GROUP BY 1, 2 ORDER BY 1
"""


HH_D = 4  # heavy-hitter CMS depth (hash rows)
HH_W = 8192  # heavy-hitter CMS width — sized so that even the sf0.1 key
# domain (~1000 suppliers) collides in all HH_D lanes with probability
# ~(1000/8192)^4 ≈ 2e-4 per key: the 2%-of-exact tolerance pytest holds
# at every fixture SF while the counter matrix stays a bounded
# HH_D×HH_W = 32k-row broadcast table.


def sketch_top_k_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters AS REPORTED BY a fixed-hash Count-Min sketch:
    every distinct supplier key is ranked by its CMS estimate
    min_j(counter[j][h_j(k)]) and the top-{SKETCH_TOP_K} are emitted —
    the mergeable-sketch answer to "which suppliers dominate line
    items" when exact per-key counts would shuffle the world
    (upgraded from the approx_top_k engine sketch, whose state depends
    on partition merge order, to the deterministic-mirror pattern of
    sketch_hll_reaggregate / sketch_count_min_deterministic — VERDICT
    r11 #4): the {HH_D}×{HH_W} counter matrix uses FIXED md5-derived
    bucket functions, so every counter, every estimate, and the whole
    ranking is a pure function of the input multiset and DuckDB
    reproduces it exactly — a full value-hash oracle. est_count >= the
    exact count by the CMS guarantee (pytest-gated within 2%).

    Scale: TWO corpus passes in the two-pass posture (counters:
    key-grain agg -> {HH_D}x fan-out -> bounded counter table; probe:
    the same key-grain agg keyed back through the broadcast counter
    table). At stream scale the counter build is the mergeable-sketch
    map side; the bounded matrix is the whole state. The candidate
    ranking enumerates the DISTINCT key domain (dimension-sized: the
    supplier dictionary), never the fact table."""

    def bucket(key_col: str, j_col: str) -> str:
        return (
            f"cast(conv(substring(md5(concat(cast({key_col} as string), "
            f"':hh:', cast({j_col} as string))), 1, 7), 16, 10) as bigint) "
            f"% {HH_W}"
        )

    keys = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=True)  # key-grain agg feeds counters+probe
    )
    fan = keys.select(
        "l_suppkey",
        "n",
        F.explode(F.expr(f"sequence(0, {HH_D - 1})")).alias("j"),
    ).withColumn("bkt", F.expr(bucket("l_suppkey", "j")))
    counters = fan.groupBy("j", "bkt").agg(
        F.sum("n").cast("long").alias("cnt")
    )
    est = (
        fan.select("l_suppkey", "j", "bkt")
        .join(F.broadcast(counters), ["j", "bkt"])
        .groupBy("l_suppkey")
        .agg(F.min("cnt").cast("long").alias("est_count"))
    )
    w = W.orderBy(F.desc("est_count"), F.asc("l_suppkey"))
    return (
        est.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SKETCH_TOP_K)
        .select("rank", "l_suppkey", "est_count")
        .orderBy("rank")
    )


ORACLE_TOP_K_HEAVY = f"""
WITH keys AS (
  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1),
js AS (SELECT unnest(range({HH_D})) AS j),
fan AS MATERIALIZED (
  SELECT l_suppkey, n, j,
         CAST(('0x' || SUBSTRING(md5(CAST(l_suppkey AS VARCHAR) || ':hh:'
                  || CAST(j AS VARCHAR)), 1, 7)) AS BIGINT) % {HH_W} AS bkt
  FROM keys CROSS JOIN js),
counters AS (
  SELECT j, bkt, CAST(SUM(n) AS BIGINT) AS cnt FROM fan GROUP BY 1, 2),
est AS (
  SELECT f.l_suppkey, CAST(MIN(c.cnt) AS BIGINT) AS est_count
  FROM fan f JOIN counters c ON f.j = c.j AND f.bkt = c.bkt
  GROUP BY 1)
SELECT rank, l_suppkey, est_count FROM (
  SELECT l_suppkey, est_count,
         ROW_NUMBER() OVER (ORDER BY est_count DESC, l_suppkey) AS rank
  FROM est)
WHERE rank <= {SKETCH_TOP_K}
ORDER BY rank
"""


APPROX_PCT_ACCURACY = 10_000


def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles per group via percentile_approx (Greenwald-
    Khanna sketch) with a THEOREM-BACKED rank certificate (retires the
    r13 VERDICT "no oracle" row). GK summaries are partition-merge-order
    dependent, so the raw estimates can never carry a cross-engine value
    hash — but the GK CONTRACT is deterministic: the returned value is an
    actual data element whose rank sits within ±n/accuracy of the target
    q·n. The op runs the live sketch, counts the returned value's exact
    rank interval [count(<v)+1, count(<=v)] against the padded target
    window [q·n − n/acc − 1, q·n + n/acc + 1] (the ±1 absorbs the
    engine's rank-rounding convention), and emits the per-quantile
    certificate booleans; the oracle emits the constants the theorem
    promises (the decontaminate_bloom 'by theorem' pattern). Estimate
    closeness itself stays gated by
    test_approx_percentiles_close_to_exact.

    Scale: the sketch agg is one mergeable groupBy; the audit pass is a
    second groupBy over the fact stream joined to the broadcast 3-row
    sketch output (the exact side exists only to AUDIT the sketch — a
    production read keeps the sketch alone)."""
    li = _t(spark, sf_dir, "lineitem")
    approx = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", [0.5, 0.9, 0.99], APPROX_PCT_ACCURACY
            ).alias("p")
        )
        .select(
            "l_returnflag",
            F.col("p").getItem(0).alias("v50"),
            F.col("p").getItem(1).alias("v90"),
            F.col("p").getItem(2).alias("v99"),
        )
    )
    audited = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n"),
            *[
                agg
                for q in (50, 90, 99)
                for agg in (
                    F.sum(
                        (F.col("l_extendedprice") < F.col(f"v{q}"))
                        .cast("long")
                    ).alias(f"lt{q}"),
                    F.sum(
                        (F.col("l_extendedprice") <= F.col(f"v{q}"))
                        .cast("long")
                    ).alias(f"le{q}"),
                )
            ],
        )
    )
    certs = [
        F.expr(
            f"lt{q} + 1 <= ({q} * n + 99) div 100"
            f" + n div {APPROX_PCT_ACCURACY} + 1"
            f" and le{q} >= ({q} * n) div 100"
            f" - n div {APPROX_PCT_ACCURACY} - 1"
        ).alias(f"p{q}_rank_ok")
        for q in (50, 90, 99)
    ]
    return audited.select("l_returnflag", "n", *certs).orderBy(
        "l_returnflag"
    )


ORACLE_APPROX_PERCENTILES = """
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
       TRUE AS p50_rank_ok, TRUE AS p90_rank_ok, TRUE AS p99_rank_ok
FROM lineitem GROUP BY 1 ORDER BY 1
"""


FUZZY_MAX_DIST = 4


def fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching: near-identical part names by edit distance
    within a blocking key — the entity-resolution join. The quadratic
    levenshtein verify runs ONLY (a) on the DISTINCT-name dictionary
    (names repeat across the catalog; dedupe first, like any
    entity-resolution pipeline) and (b) inside first-token blocks, so
    candidate pairs are O(Σ block²) over dictionary-sized blocks — never
    a fact-table cross join. One shuffle for the dictionary distinct, one
    block-keyed shuffle for the self-join."""
    part = _t(spark, sf_dir, "part")
    names = part.select("p_name").distinct().select(
        "p_name", F.split("p_name", " ").getItem(0).alias("blk")
    )
    a = names.select(F.col("p_name").alias("name_a"), "blk")
    b = names.select(F.col("p_name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    )


ORACLE_FUZZY = f"""
WITH names AS (
  SELECT DISTINCT p_name, string_split(p_name, ' ')[1] AS blk FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked-levenshtein match pairs
    (fuzzy_match_blocked) → connected components → one CANONICAL entity
    per cluster (lexicographic-min name) with variant and catalog-row
    counts. This is the full ER pipeline a master-data system runs —
    pairwise matching alone leaves A≈B≈C unlinked when A≉C; the
    transitive closure is what makes them one entity.

    cc_components is node-type-generic (greatest/least/min/xxhash64 all
    order strings), so the name strings are the graph nodes and the
    component label IS the canonical name — no id indirection. Every
    post-match stage keys on the bounded distinct-name dictionary, not
    the catalog fact stream."""
    from .dedup import cc_components

    pairs = fuzzy_match_blocked(spark, sf_dir).select(
        F.col("name_a").alias("doc_a"), F.col("name_b").alias("doc_b")
    )
    labels = cc_components(pairs).select(
        F.col("doc_id").alias("p_name"), F.col("comp").alias("entity")
    )
    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    lab = names.join(labels, "p_name", "left").select(
        "p_name", F.coalesce("entity", F.col("p_name")).alias("entity")
    )
    rows = (
        _t(spark, sf_dir, "part")
        .select("p_name")
        .join(F.broadcast(lab), "p_name")
        .groupBy("entity")
        .agg(F.count("*").alias("n_parts"))
    )
    variants = lab.groupBy("entity").agg(F.count("*").alias("n_variants"))
    return (
        variants.join(rows, "entity")
        .select(
            "entity",
            F.col("n_variants").cast("long").alias("n_variants"),
            F.col("n_parts").cast("long").alias("n_parts"),
        )
        .orderBy("entity")
    )


ORACLE_ER_CLUSTERS = f"""
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name, string_split(p_name, ' ')[1] AS blk FROM part),
fuzzy AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}),
edges AS (SELECT name_a AS src, name_b AS dst FROM fuzzy
          UNION SELECT name_b, name_a FROM fuzzy),
reach AS (
  SELECT src, src AS dst FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
comp AS (SELECT src AS p_name, MIN(dst) AS entity FROM reach GROUP BY src),
lab AS (
  SELECT n.p_name, COALESCE(c.entity, n.p_name) AS entity
  FROM (SELECT DISTINCT p_name FROM part) n
  LEFT JOIN comp c USING (p_name)),
rows_per AS (
  SELECT l.entity, COUNT(*) AS n_parts
  FROM part p JOIN lab l USING (p_name) GROUP BY 1),
vars_per AS (SELECT entity, COUNT(*) AS n_variants FROM lab GROUP BY 1)
SELECT v.entity, CAST(v.n_variants AS BIGINT) AS n_variants,
       CAST(r.n_parts AS BIGINT) AS n_parts
FROM vars_per v JOIN rows_per r USING (entity)
ORDER BY v.entity
"""


MERGE_SNAPSHOT_MOD = 5  # base snapshot is missing custkey % 5 == 0 rows
MERGE_MIN_ORDERS = 2
MERGE_SINCE = "1997-01-01"


def merge_into_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE INTO applied as a batch plan — the upsert statement
    (WHEN MATCHED AND cond THEN UPDATE / WHEN MATCHED THEN DELETE / WHEN
    NOT MATCHED THEN INSERT) Spark only offers on v2 tables, expressed as
    a FULL OUTER join + conditional projection over parquet. The base is
    a stale account snapshot (customers with custkey % {MERGE_SNAPSHOT_MOD}
    != 0); the change-set is per-customer order activity since
    {MERGE_SINCE}:

    - matched, ≥{MERGE_MIN_ORDERS} orders → UPDATE balance += 0.1% of
      revenue
    - matched, <{MERGE_MIN_ORDERS} orders → DELETE (churned)
    - not matched (an account the stale snapshot lacks) → INSERT
    - base rows without change rows carry over untouched.

    One shuffle per side on the merge key; the conditional projection is
    pure codegen. Output = the post-merge snapshot with the action that
    produced each row (deletes absent, as in a real MERGE).

    DECIMAL-FREE money math (r8, after two driver-red rounds): every
    prior variant cast the double fixture columns to DECIMAL(18,2) and
    the driver's DuckDB build converted at least one value on a
    different path than both Spark and local DuckDB 1.0.0 (TIES.md
    Class C — engine-native double→decimal conversion is version- and
    path-dependent). This version touches NO engine decimal conversion
    at all: doubles are quantized with floor(x*100 + 0.5) — multiply,
    add, floor are IEEE-754 operations with one correct answer on any
    engine — all money math is BIGINT cents, and the output column IS
    `balance_cents BIGINT`. The 0.1% delta is (revenue_cents + 500) div
    1000: branch-free half-up on the non-negative order-revenue domain,
    truncating division identical across engines for non-negatives.
    The three merge_diag_* twins bisect this pair construct-by-construct
    at the driver (VERDICT r7 #1b)."""
    cents = lambda c: F.expr(f"cast(floor({c} * 100 + 0.5) as bigint)")
    base = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % MERGE_SNAPSHOT_MOD != 0)
        .select(
            "c_custkey",
            "c_mktsegment",
            cents("c_acctbal").alias("balance_cents"),
        )
    )
    changes = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit(MERGE_SINCE).cast("timestamp_ntz")
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"), "n_orders", "revenue_cents"
        )
    )
    j = base.join(changes, "c_custkey", "full_outer")
    matched = (
        F.col("balance_cents").isNotNull() & F.col("n_orders").isNotNull()
    )
    upd = matched & (F.col("n_orders") >= MERGE_MIN_ORDERS)
    dele = matched & (F.col("n_orders") < MERGE_MIN_ORDERS)
    ins = F.col("balance_cents").isNull()
    delta = F.expr("(revenue_cents + 500) div 1000")
    return (
        j.filter(~dele)
        .select(
            "c_custkey",
            F.coalesce("c_mktsegment", F.lit("NEW")).alias("segment"),
            F.when(upd, F.col("balance_cents") + delta)
            .when(ins, delta)
            .otherwise(F.col("balance_cents"))
            .cast("bigint")
            .alias("balance_cents"),
            F.when(upd, F.lit("update"))
            .when(ins, F.lit("insert"))
            .otherwise(F.lit("carry"))
            .alias("action"),
        )
        .orderBy("c_custkey")
    )


ORACLE_MERGE = f"""
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS balance_cents
  FROM customer WHERE c_custkey % {MERGE_SNAPSHOT_MOD} <> 0),
changes AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS revenue_cents
  FROM orders WHERE o_orderdate >= TIMESTAMP '{MERGE_SINCE} 00:00:00'
  GROUP BY 1),
j AS (
  SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
         b.c_mktsegment, b.balance_cents, c.n_orders, c.revenue_cents
  FROM base b FULL OUTER JOIN changes c USING (c_custkey))
SELECT c_custkey,
       COALESCE(c_mktsegment, 'NEW') AS segment,
       CAST(CASE
         WHEN balance_cents IS NOT NULL AND n_orders >= {MERGE_MIN_ORDERS}
           THEN balance_cents + (revenue_cents + 500) // 1000
         WHEN balance_cents IS NULL
           THEN (revenue_cents + 500) // 1000
         ELSE balance_cents
       END AS BIGINT) AS balance_cents,
       CASE
         WHEN balance_cents IS NOT NULL AND n_orders >= {MERGE_MIN_ORDERS}
           THEN 'update'
         WHEN balance_cents IS NULL THEN 'insert'
         ELSE 'carry'
       END AS action
FROM j
WHERE NOT (balance_cents IS NOT NULL AND n_orders IS NOT NULL
           AND n_orders < {MERGE_MIN_ORDERS})
ORDER BY c_custkey
"""


def merge_diag_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-side bisection twin 1/3 for merge_into_semantics (VERDICT
    r7 #1b): the MERGE classification alone — full-outer join + action
    CASE + churn filter — with ZERO money math (custkey, action,
    n_orders only; counts are exact integers on any engine). A red row
    here localizes the divergence to the join/filter/classification
    shape; a green row eliminates it."""
    base = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % MERGE_SNAPSHOT_MOD != 0)
        .select("c_custkey", F.lit(True).alias("in_base"))
    )
    changes = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit(MERGE_SINCE).cast("timestamp_ntz")
        )
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .select(F.col("o_custkey").alias("c_custkey"), "n_orders")
    )
    j = base.join(changes, "c_custkey", "full_outer")
    matched = F.col("in_base").isNotNull() & F.col("n_orders").isNotNull()
    upd = matched & (F.col("n_orders") >= MERGE_MIN_ORDERS)
    dele = matched & (F.col("n_orders") < MERGE_MIN_ORDERS)
    ins = F.col("in_base").isNull()
    return (
        j.filter(~dele)
        .select(
            "c_custkey",
            F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
            F.when(upd, F.lit("update"))
            .when(ins, F.lit("insert"))
            .otherwise(F.lit("carry"))
            .alias("action"),
        )
        .orderBy("c_custkey")
    )


ORACLE_MERGE_DIAG_ACTIONS = f"""
WITH base AS (
  SELECT c_custkey, TRUE AS in_base
  FROM customer WHERE c_custkey % {MERGE_SNAPSHOT_MOD} <> 0),
changes AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders
  FROM orders WHERE o_orderdate >= TIMESTAMP '{MERGE_SINCE} 00:00:00'
  GROUP BY 1),
j AS (
  SELECT COALESCE(b.c_custkey, c.c_custkey) AS c_custkey,
         b.in_base, c.n_orders
  FROM base b FULL OUTER JOIN changes c USING (c_custkey))
SELECT c_custkey,
       CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
       CASE
         WHEN in_base IS NOT NULL AND n_orders >= {MERGE_MIN_ORDERS}
           THEN 'update'
         WHEN in_base IS NULL THEN 'insert'
         ELSE 'carry'
       END AS action
FROM j
WHERE NOT (in_base IS NOT NULL AND n_orders IS NOT NULL
           AND n_orders < {MERGE_MIN_ORDERS})
ORDER BY c_custkey
"""


def merge_diag_revenue_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bisection twin 2/3: the o_totalprice quantization + integer-sum
    construct alone — floor(x*100 + 0.5) per order row (pure IEEE-754
    double ops, bit-identical on any engine), summed as BIGINT cents per
    customer, plus the half-up 0.1% delta. A red row here pins the
    divergence to the double quantization of o_totalprice; green
    eliminates that entire construct from suspicion."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit(MERGE_SINCE).cast("timestamp_ntz")
        )
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).alias("revenue_cents"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "n_orders",
            "revenue_cents",
            F.expr("(revenue_cents + 500) div 1000").alias("delta_cents"),
        )
        .orderBy("c_custkey")
    )


ORACLE_MERGE_DIAG_REVENUE = f"""
WITH changes AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS revenue_cents
  FROM orders WHERE o_orderdate >= TIMESTAMP '{MERGE_SINCE} 00:00:00'
  GROUP BY 1)
SELECT c_custkey, n_orders,
       CAST(revenue_cents AS BIGINT) AS revenue_cents,
       CAST((revenue_cents + 500) // 1000 AS BIGINT) AS delta_cents
FROM changes
ORDER BY c_custkey
"""


def merge_diag_acctbal_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bisection twin 3/3: the c_acctbal quantization construct alone —
    the stale-snapshot projection with balance_cents = floor(c_acctbal *
    100 + 0.5) as BIGINT. c_acctbal is the one signed money column
    (TPC-H acctbal spans negatives); floor half-up rounds toward +inf on
    the negative side identically in any IEEE engine. A red row here
    pins the divergence to the signed-double quantization; green
    eliminates it."""
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % MERGE_SNAPSHOT_MOD != 0)
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").alias(
                "balance_cents"
            ),
        )
        .orderBy("c_custkey")
    )


ORACLE_MERGE_DIAG_ACCTBAL = f"""
SELECT c_custkey, c_mktsegment AS segment,
       CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS balance_cents
FROM customer WHERE c_custkey % {MERGE_SNAPSHOT_MOD} <> 0
ORDER BY c_custkey
"""


def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate a dense monthly
    calendar spine from the orders date range and left-join monthly
    revenue onto it — the gap-filling date-spine pattern reports need
    (months with no orders still appear, at 0.0).

    Scale posture: the recursion generates ONLY the spine — and at the
    COARSE unit (years), because every Spark recursion step is a
    scheduled job: recurse on years (handfuls of iterations), fan the 12
    months out map-side with sequence() (an 80-iteration month recursion
    measured 27 s of pure job-scheduling overhead; this shape runs in
    ~2 s). The revenue side is one hash agg on the month key; the spine
    is calendar-sized and broadcasts. Recursion never touches fact-sized
    data."""
    orders = _t(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE bounds AS (
          SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
                 date_trunc('month', MAX(o_orderdate)) AS hi
          FROM {ord}),
        years(y) AS (
          SELECT date_trunc('year', lo) FROM bounds
          UNION ALL
          SELECT y + INTERVAL 1 YEAR FROM years, bounds
          WHERE y < date_trunc('year', hi)),
        spine AS (
          SELECT y + make_interval(0, k) AS m
          FROM years CROSS JOIN bounds
          LATERAL VIEW explode(sequence(0, 11)) t AS k
          WHERE y + make_interval(0, k) >= lo
            AND y + make_interval(0, k) <= hi),
        rev AS (
          SELECT date_trunc('month', o_orderdate) AS m,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
                   AS revenue
          FROM {ord} GROUP BY 1)
        SELECT CAST(spine.m AS DATE) AS month,
               COALESCE(rev.revenue, 0.0) AS revenue
        FROM spine LEFT JOIN rev ON rev.m = spine.m
        ORDER BY month
        """,
        ord=orders,
    )


ORACLE_RECURSIVE_SPINE = """
WITH RECURSIVE bounds AS (
  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
         date_trunc('month', MAX(o_orderdate)) AS hi
  FROM orders),
years(y) AS (
  SELECT date_trunc('year', lo) FROM bounds
  UNION ALL
  SELECT y + INTERVAL 1 YEAR FROM years, bounds
  WHERE y < date_trunc('year', hi)),
spine AS (
  SELECT y + to_months(CAST(k AS INTEGER)) AS m
  FROM years, generate_series(0, 11) AS t(k), bounds
  WHERE y + to_months(CAST(k AS INTEGER)) >= lo
    AND y + to_months(CAST(k AS INTEGER)) <= hi),
rev AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1)
SELECT CAST(spine.m AS DATE) AS month, COALESCE(rev.revenue, 0.0) AS revenue
FROM spine LEFT JOIN rev ON rev.m = spine.m
ORDER BY month
"""


def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured access (Spark 4 parse_json /
    variant_get): parse the event props once into a variant and extract a
    typed path — the open-schema ingestion pattern (shredded columnar
    variant beats per-access string re-parsing, and type errors surface
    at extraction). Aggregates stay integer-exact on both engines."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_big"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


ORACLE_VARIANT = """
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       COUNT(CASE WHEN k > 50 THEN 1 END) AS n_big,
       COUNT(DISTINCT k) AS n_distinct_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type
"""


def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface: per return-flag, BIT_AND /
    BIT_OR / BIT_XOR of an 8-bit order-key bucket, popcount totals, and a
    shifted/masked derived key — flag-register analytics (feature
    bitmasks, bloom-filter words). All-integer, order-independent
    aggregates (XOR/AND/OR are commutative+associative → map-side
    partial agg), one narrow-key shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    k = F.expr("l_orderkey % 256")
    k2 = F.expr("shiftleft(l_orderkey % 256 & 15, 3) | shiftright(l_orderkey % 256, 5)")
    return (
        li.select("l_returnflag", k.alias("k"), k2.alias("k2"))
        .groupBy("l_returnflag")
        .agg(
            F.bit_and("k").alias("band"),
            F.bit_or("k").alias("bor"),
            F.bit_xor("k").alias("bxor"),
            F.bit_xor("k2").alias("bxor_shifted"),
            F.sum(F.bit_count("k")).alias("total_bits"),
            F.count(F.when(F.expr("k & 1 = 1"), 1)).alias("n_odd"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_BITWISE = """
SELECT l_returnflag,
       BIT_AND(k) AS band, BIT_OR(k) AS bor, BIT_XOR(k) AS bxor,
       BIT_XOR(k2) AS bxor_shifted,
       CAST(SUM(bit_count(k)) AS BIGINT) AS total_bits,
       COUNT(CASE WHEN (k & 1) = 1 THEN 1 END) AS n_odd
FROM (SELECT l_returnflag, l_orderkey % 256 AS k,
             (((l_orderkey % 256) & 15) << 3) | ((l_orderkey % 256) >> 5) AS k2
      FROM lineitem)
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide lineitem measure columns → long (metric,
    value) rows, then one agg per metric. ``DataFrame.unpivot`` expands
    map-side (no shuffle, no join) — the long projection feeds a 3-group
    hash agg. The narrow ReadSchema shows only the 4 needed columns reach
    the scan."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return (
        long.groupBy("metric")
        .agg(dsum("val", "total"), F.count("*").alias("n"))
        .orderBy("metric")
    )


ORACLE_UNPIVOT = f"""
SELECT metric, {sql_dsum('val')} AS total, COUNT(*) AS n
FROM (
  SELECT l_orderkey, 'l_quantity' AS metric, l_quantity AS val
  FROM lineitem WHERE l_orderkey % 97 = 0
  UNION ALL
  SELECT l_orderkey, 'l_extendedprice', l_extendedprice
  FROM lineitem WHERE l_orderkey % 97 = 0
  UNION ALL
  SELECT l_orderkey, 'l_discount', l_discount
  FROM lineitem WHERE l_orderkey % 97 = 0)
GROUP BY metric ORDER BY metric
"""


def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): per-nation roster
    of high-balance customers. ``collect_list`` gathers per group (order
    within a group is partition-arrival-dependent in a distributed agg,
    so ``array_sort`` makes the result deterministic — the same reason
    STRING_AGG needs WITHIN GROUP (ORDER BY) on any parallel engine)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500)
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.concat_ws("|", F.array_sort(F.collect_list("c_name")))
            .alias("roster"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_nationkey")
    )


ORACLE_STRING_CONCAT = """
SELECT c_nationkey,
       COALESCE(string_agg(c_name, '|' ORDER BY c_name), '') AS roster,
       COUNT(*) AS n_customers
FROM customer WHERE c_acctbal > 9500
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def window_range_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a NUMERIC ordering (vs the time-based
    window_range_1h): for each order, how many orders of the same priority
    fall within ±1000 of its total price. One shuffle on the partition
    key; the range frame is evaluated by a sliding scan over the sorted
    partition, not a self-join."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 31 == 0)
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count("*").over(w).alias("n_near_price"),
        F.min("o_totalprice").over(w).alias("lo_near"),
        F.max("o_totalprice").over(w).alias("hi_near"),
    ).orderBy("o_orderkey")


ORACLE_WIN_RANGE_VALUE = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       COUNT(*) OVER w AS n_near_price,
       MIN(o_totalprice) OVER w AS lo_near,
       MAX(o_totalprice) OVER w AS hi_near
FROM orders WHERE o_orderkey % 31 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
             RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
ORDER BY o_orderkey
"""


def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed function surface: per part type, build a brand→count MAP
    (``map_from_entries`` over the sorted entry list), then probe it with
    ``element_at`` / ``map_values`` / ``size``. The map stays an
    intermediate (output columns are scalars) so results hash identically
    on any engine — map column ordering is engine-defined, values aren't."""
    part = _t(spark, sf_dir, "part")
    counts = part.groupBy("p_type", "p_brand").agg(F.count("*").alias("cnt"))
    return (
        counts.groupBy("p_type")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("p_brand", "cnt")))
            ).alias("m")
        )
        .select(
            "p_type",
            F.size("m").alias("n_brands"),
            # try_element_at: a p_type group with no Brand#1 yields NULL
            # (matching the oracle's MAX(CASE...)) instead of ANSI-mode
            # MAP_KEY_DOES_NOT_EXIST.
            F.try_element_at("m", F.lit("Brand#1")).alias("brand1_cnt"),
            F.array_max(F.map_values("m")).alias("max_brand_cnt"),
        )
        .orderBy("p_type")
    )


ORACLE_MAP_OPS = """
WITH counts AS (
  SELECT p_type, p_brand, COUNT(*) AS cnt FROM part GROUP BY 1, 2)
SELECT p_type, COUNT(*) AS n_brands,
       MAX(CASE WHEN p_brand = 'Brand#1' THEN cnt END) AS brand1_cnt,
       MAX(cnt) AS max_brand_cnt
FROM counts GROUP BY p_type ORDER BY p_type
"""


def agg_bool_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates per return flag: COUNT_IF, ANY/EVERY
    (bool_or/bool_and). One pass, one shuffle — these all fold into the
    same partial hash agg as plain counts."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("count_if(l_discount > 0.05)").alias("n_discounted"),
            F.expr("every(l_quantity > 0)").alias("all_positive_qty"),
            F.expr("any(l_tax > 0.07)").alias("some_high_tax"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_BOOL_AGG = """
SELECT l_returnflag,
       CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
       bool_and(l_quantity > 0) AS all_positive_qty,
       bool_or(l_tax > 0.07) AS some_high_tax,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def agg_mode_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: most frequent order priority per order status,
    ties broken by priority string (built-in ``mode()`` leaves ties
    engine-defined, so a portable pipeline ranks (count DESC, value ASC)
    explicitly). Two keyed shuffles: the (status, priority) count and the
    per-status top-1 window."""
    orders = _t(spark, sf_dir, "orders")
    counts = (
        orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("cnt"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            "cnt",
        )
        .orderBy("o_orderstatus")
    )


ORACLE_MODE = """
SELECT o_orderstatus, mode_priority, cnt FROM (
  SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY cnt DESC, o_orderpriority) AS rn
  FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2))
WHERE rn = 1 ORDER BY o_orderstatus
"""


def window_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: orders are split into price deciles within each
    priority class, then each decile reports its row count and price
    span — the classic equal-frequency binning report (quantile tables,
    score calibration). One window shuffle on the priority key; the
    decile agg reuses the same partitioning. NTILE's fill rule (earlier
    tiles get the extra row) is ANSI-fixed, and the ORDER BY carries a
    full tiebreak (o_totalprice, o_orderkey) so tile membership is
    deterministic on any engine."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.select(
            "o_orderpriority",
            "o_totalprice",
            F.ntile(10).over(w).alias("decile"),
        )
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("o_orderpriority", "decile")
    )


ORACLE_NTILE = """
SELECT o_orderpriority, decile, COUNT(*) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo, ROUND(MAX(o_totalprice), 2) AS hi
FROM (
  SELECT o_orderpriority, o_totalprice,
         NTILE(10) OVER (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders)
GROUP BY 1, 2 ORDER BY o_orderpriority, decile
"""


def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): both
    sides derive a nullable match key (customers' segment only when the
    balance is positive, orders' priority class only for open orders) and
    the join must pair NULL with NULL — a plain ``=`` silently drops
    every null-keyed row, the classic supression bug in backfill joins.
    Spark plans ``<=>`` as a normal hash join (null-safe keys hash like
    values), so this shuffles once on the key like any equi-join."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    c = customer.select(
        F.when(F.col("c_acctbal") > 0, F.col("c_mktsegment")).alias("seg_key"),
        "c_custkey",
    )
    o = orders.select(
        F.when(
            F.col("o_orderstatus") == "O",
            F.when(F.col("o_orderpriority") < "3", "BUILDING").otherwise(
                "MACHINERY"
            ),
        ).alias("seg_key"),
        "o_orderkey",
    )
    return (
        c.join(o, c["seg_key"].eqNullSafe(o["seg_key"]))
        .groupBy(c["seg_key"].alias("seg_key"))
        .agg(
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.asc_nulls_first("seg_key"))
    )


ORACLE_NULL_SAFE_JOIN = """
SELECT c.seg_key AS seg_key,
       COUNT(DISTINCT c_custkey) AS n_cust,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM (SELECT CASE WHEN c_acctbal > 0 THEN c_mktsegment END AS seg_key,
             c_custkey FROM customer) c
JOIN (SELECT CASE WHEN o_orderstatus = 'O' THEN
               CASE WHEN o_orderpriority < '3' THEN 'BUILDING'
                    ELSE 'MACHINERY' END END AS seg_key,
             o_orderkey FROM orders) o
  ON c.seg_key IS NOT DISTINCT FROM o.seg_key
GROUP BY c.seg_key ORDER BY c.seg_key NULLS FIRST
"""


HIST_BINS = 10
HIST_LO, HIST_HI = 0.0, 500000.0


def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via ``width_bucket``: order totals into
    HIST_BINS equal bins over [HIST_LO, HIST_HI), out-of-range values in
    the ANSI under/overflow buckets 0 and BINS+1. One groupBy on a
    derived int — the map-side partial agg means each task emits at most
    BINS+2 rows regardless of input size; the canonical distributed
    histogram at any scale."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.width_bucket(
                "o_totalprice", F.lit(HIST_LO), F.lit(HIST_HI), F.lit(HIST_BINS)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# DuckDB has no width_bucket; the emulation mirrors Spark's WidthBucket
# arithmetic exactly (bucket width computed FIRST, then one division —
# same float operation order, so edge values land identically).
ORACLE_HISTOGRAM = f"""
SELECT CASE WHEN o_totalprice < {HIST_LO} THEN 0
            WHEN o_totalprice >= {HIST_HI} THEN {HIST_BINS} + 1
            ELSE 1 + CAST(FLOOR((o_totalprice - {HIST_LO})
                     / (({HIST_HI} - {HIST_LO}) / {HIST_BINS})) AS BIGINT)
       END AS bucket,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY bucket
"""


HLL_M = 64  # registers (2^6 buckets; 6 low bits of the hash)
HLL_WBITS = 54  # rank bits: 60-bit md5-derived hash minus 6 bucket bits
HLL_RCAP = 31  # harmonic-sum readout grid: term = 2^(RCAP - min(reg, RCAP))
# alpha_64 * m^2, scaled to micro units on the 2^RCAP grid:
# est_micro = floor(10^6 * (709/1000) * 64^2 * 2^RCAP / S)
#           = (709 * 4096 * 1000 * 2^RCAP) div S   — fits BIGINT (6.24e18)
HLL_EST_NUM = 709 * 4096 * 1000 * (1 << HLL_RCAP)


def sketch_hll_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup, fully oracle-checkable (VERDICT r10 #4 —
    the ``sketch_hll_registers`` precedent): DETERMINISTIC-register HLL
    sketches built once at the finest grain (source × lang), then
    RE-AGGREGATED without touching raw data — per-bucket MAX merges to
    per-source and to the global sketch, the property exact
    COUNT(DISTINCT) fundamentally lacks. At 100 TB each sketch is
    {HLL_M} registers (~KB), so every rollup exchange is constant-size.

    Every construct is exact on both engines: hash = first 15 md5 hex
    chars (60-bit int), bucket = 6 low bits, rank rho = {HLL_WBITS + 1}
    − bit_length(remaining bits) via the bin() idiom. The readout is
    the raw Flajolet estimator alpha_64·m²/Z (alpha_64 = 0.709, the
    published m=64 constant) carried in INTEGERS: harmonic_sum
    S = Σ 2^({HLL_RCAP} − min(reg, {HLL_RCAP})) over all {HLL_M}
    buckets (empty bucket = 2^{HLL_RCAP}; Z = S·2^−{HLL_RCAP} exactly —
    the min() clamp only binds for registers > {HLL_RCAP}, i.e. ~2^31
    distinct per bucket, unreachable below ~10^11 distinct items), and
    est_micro = HLL_EST_NUM div S — truncation, identical on both
    engines. n_empty is emitted so a consumer (and the pytest gate) can
    apply the standard small-range linear-counting correction
    m·ln(m/V). The engine-native DataSketches path (hll_sketch_agg /
    hll_union_agg) stays pinned in tests/test_llm_ops.py; this surface
    is the portable, hash-checkable twin.

    Scale: register MAX is idempotent over duplicate texts, so no
    pre-dedup pass; one map-side hash + three sketch-sized groupBys
    (≤ sources×langs×{HLL_M} rows after the first)."""
    docs = catalog.load(spark, sf_dir, "documents")
    rho = docs.select(
        "source",
        "lang",
        F.expr(
            "cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)"
        ).alias("h"),
    ).select(
        "source",
        "lang",
        (F.col("h") % HLL_M).cast("int").alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("w"),
    ).select(
        "source",
        "lang",
        "bucket",
        F.when(F.col("w") == 0, F.lit(HLL_WBITS + 1))
        .otherwise(F.lit(HLL_WBITS + 1) - F.length(F.expr("bin(w)")))
        .cast("int")
        .alias("rho"),
    )
    # finest-grain sketch — bounded (sources × langs × HLL_M rows) and
    # feeding three rollup branches: checkpoint so documents scans once
    sl = (
        rho.groupBy("source", "lang", "bucket")
        .agg(F.max("rho").alias("reg"))
        .localCheckpoint(eager=True)
    )
    fine = sl.select(
        F.lit("source_lang").alias("grain"),
        F.concat_ws("|", "source", "lang").alias("grp_key"),
        "bucket",
        "reg",
    )
    by_src = sl.groupBy("source", "bucket").agg(
        F.max("reg").alias("reg")
    ).select(
        F.lit("source").alias("grain"),
        F.col("source").alias("grp_key"),
        "bucket",
        "reg",
    )
    glob = sl.groupBy("bucket").agg(F.max("reg").alias("reg")).select(
        F.lit("__ALL__").alias("grain"),
        F.lit("__ALL__").alias("grp_key"),
        "bucket",
        "reg",
    )
    lvl = fine.unionByName(by_src).unionByName(glob)
    term = f"shiftleft(cast(1 as bigint), {HLL_RCAP} - least(reg, {HLL_RCAP}))"
    return (
        lvl.groupBy("grain", "grp_key")
        .agg(
            F.count("*").alias("n_present"),
            F.expr(f"sum({term})").alias("sum_term"),
        )
        .select(
            "grain",
            "grp_key",
            (F.lit(HLL_M) - F.col("n_present"))
            .cast("long")
            .alias("n_empty"),
            (
                F.col("sum_term")
                + (F.lit(HLL_M) - F.col("n_present"))
                * F.lit(1 << HLL_RCAP)
            )
            .cast("long")
            .alias("harmonic_sum"),
            F.expr(
                f"cast({HLL_EST_NUM} div (sum_term + "
                f"({HLL_M} - n_present) * cast({1 << HLL_RCAP} as bigint))"
                " as bigint)"
            ).alias("est_micro"),
        )
        .orderBy("grain", "grp_key")
    )


ORACLE_HLL_REAGG = f"""
WITH h AS (
  SELECT source, lang,
         CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
  FROM documents),
r AS (
  SELECT source, lang, CAST(h % {HLL_M} AS INT) AS bucket,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_WBITS + 1}
              ELSE {HLL_WBITS + 1} - LENGTH(bin(h // {HLL_M}))
         END AS rho
  FROM h),
sl AS MATERIALIZED (
  SELECT source, lang, bucket, MAX(rho) AS reg FROM r GROUP BY 1, 2, 3),
lvl AS (
  SELECT 'source_lang' AS grain, source || '|' || lang AS grp_key,
         bucket, reg
  FROM sl
  UNION ALL
  SELECT 'source', source, bucket, MAX(reg)
  FROM sl GROUP BY 2, 3
  UNION ALL
  SELECT '__ALL__', '__ALL__', bucket, MAX(reg)
  FROM sl GROUP BY 3),
agg AS (
  SELECT grain, grp_key, COUNT(*) AS n_present,
         CAST(SUM(CAST(1 AS BIGINT)
              << ({HLL_RCAP} - least(reg, {HLL_RCAP}))) AS BIGINT)
           AS sum_term
  FROM lvl GROUP BY 1, 2)
SELECT grain, grp_key,
       CAST({HLL_M} - n_present AS BIGINT) AS n_empty,
       CAST(sum_term + ({HLL_M} - n_present)
            * (CAST(1 AS BIGINT) << {HLL_RCAP}) AS BIGINT)
         AS harmonic_sum,
       CAST({HLL_EST_NUM} // (sum_term + ({HLL_M} - n_present)
            * (CAST(1 AS BIGINT) << {HLL_RCAP})) AS BIGINT) AS est_micro
FROM agg
ORDER BY grain, grp_key
"""


def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC-register HyperLogLog over distinct document
    contents — the fully-oracle-checkable twin of
    ``sketch_hll_reaggregate`` (whose DataSketches estimates are
    engine-specific, hence rows-only). Every construct here is exact on
    both engines: the hash is the first 15 hex chars of md5(text)
    (a 60-bit integer), the register index is its 6 low bits, and the
    register value is the HLL rank rho = leading-zero count of the
    remaining {HLL_WBITS} bits + 1, computed as {HLL_WBITS + 1} −
    bit_length(w) via the bin()-string idiom (float log2 is wrong
    exactly at the power-of-two boundaries). Registers are emitted
    DENSELY (every source × all {HLL_M} buckets, empty = 0) together
    with the exact harmonic term 2^({HLL_WBITS + 1} − register); the
    float estimate alpha·m²/Σ is one driver-side multiply away and is
    gated against exact distincts in pytest. The '__ALL__' rows prove
    the MERGE property: union-of-sketches = per-bucket MAX of
    registers — the re-aggregatable architecture at constant exchange
    size.

    Scale: register max is idempotent over duplicate texts, so no
    pre-dedup pass is needed; the whole op is one map-side hash + one
    (source × {HLL_M})-key groupBy — sketch-sized exchanges no matter
    the corpus."""
    docs = catalog.load(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        F.expr(
            "cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)"
        ).alias("h"),
    ).select(
        "source",
        (F.col("h") % HLL_M).cast("int").alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("w"),
    ).select(
        "source",
        "bucket",
        F.when(F.col("w") == 0, F.lit(HLL_WBITS + 1))
        .otherwise(F.lit(HLL_WBITS + 1) - F.length(F.expr("bin(w)")))
        .cast("int")
        .alias("rho"),
    )
    # the sketch frame (≤ sources × HLL_M rows) fans out into the spine,
    # dense, and merged branches — checkpoint it so documents is scanned
    # ONCE (PLANS r8 lesson 1); every source has ≥1 doc, so the source
    # spine derives from the sketch itself, no corpus re-scan
    per_src = (
        h.groupBy("source", "bucket")
        .agg(F.max("rho").alias("reg"))
        .localCheckpoint(eager=True)
    )
    spine = (
        per_src.select("source")
        .distinct()
        .crossJoin(
            spark.range(HLL_M).select(F.col("id").cast("int").alias("bucket"))
        )
    )
    dense = (
        spine.join(per_src, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            F.coalesce("reg", F.lit(0)).cast("int").alias("register"),
        )
    )
    merged = (
        dense.groupBy("bucket")
        .agg(F.max("register").cast("int").alias("register"))
        .select(F.lit("__ALL__").alias("source"), "bucket", "register")
    )
    return (
        dense.unionByName(merged)
        .select(
            "source",
            "bucket",
            "register",
            F.expr(
                f"shiftleft(cast(1 as bigint), {HLL_WBITS + 1} - register)"
            ).alias("harmonic_term"),
        )
        .orderBy("source", "bucket")
    )


ORACLE_HLL_REGISTERS = f"""
WITH h AS (
  SELECT source,
         CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS h
  FROM documents),
r AS (
  SELECT source, CAST(h % {HLL_M} AS INT) AS bucket,
         CASE WHEN h // {HLL_M} = 0 THEN {HLL_WBITS + 1}
              ELSE {HLL_WBITS + 1} - LENGTH(bin(h // {HLL_M}))
         END AS rho
  FROM h),
per_src AS (
  SELECT source, bucket, MAX(rho) AS reg FROM r GROUP BY 1, 2),
spine AS (
  SELECT DISTINCT d.source, CAST(b.b AS INT) AS bucket
  FROM documents d, (SELECT unnest(range({HLL_M})) AS b) b),
dense AS (
  SELECT spine.source, spine.bucket,
         CAST(COALESCE(reg, 0) AS INT) AS register
  FROM spine LEFT JOIN per_src
    ON spine.source = per_src.source AND spine.bucket = per_src.bucket),
merged AS (
  SELECT '__ALL__' AS source, bucket,
         CAST(MAX(register) AS INT) AS register
  FROM dense GROUP BY bucket),
allrows AS (SELECT * FROM dense UNION ALL SELECT * FROM merged)
SELECT source, bucket, register,
       CAST(1 AS BIGINT) << ({HLL_WBITS + 1} - register) AS harmonic_term
FROM allrows
ORDER BY source, bucket
"""


def agg_median_abs_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per group: median absolute deviation of order
    totals — the outlier-resistant spread metric (stddev is dominated by
    a single fat-finger row; MAD isn't), standard in anomaly thresholds.
    Two exact-percentile grouped aggregations chained through a broadcast
    of the per-group medians (group count is bounded — priorities — so
    the intermediate is always broadcastable); each percentile is a
    per-group sort, the same contract as agg_percentiles."""
    orders = _t(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    return (
        orders.join(F.broadcast(med), "o_orderpriority")
        .withColumn("adev", F.abs(F.col("o_totalprice") - F.col("med")))
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.max("med"), 4).alias("median_price"),
            F.round(F.expr("percentile(adev, 0.5)"), 4).alias("mad"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("stddev"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_MAD = """
WITH med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY 1)
SELECT o_orderpriority,
       ROUND(MAX(med), 4) AS median_price,
       ROUND(quantile_cont(abs(o_totalprice - med), 0.5), 4) AS mad,
       ROUND(STDDEV_SAMP(o_totalprice), 4) AS stddev
FROM orders JOIN med USING (o_orderpriority)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


TRY_ADD_C = 9223372036854775000  # within bigint range; overflows for keys > 807


def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic surface (``try_divide`` / ``try_cast`` /
    ``try_add``): malformed casts, zero divisors and bigint overflow
    yield NULL instead of killing the job — the ANSI-mode-compatible
    posture a long-running pipeline needs (one poison row must not fail
    a 100 TB pass). All map-side, whole-stage codegen; the oracle spells
    the same semantics with guard CASEs since DuckDB's operators raise."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.try_divide(
                F.col("o_orderkey").cast("bigint"),
                F.col("o_orderkey") % 3,
            ).alias("div3"),
            F.col("o_orderpriority").try_cast("int").alias("prio_int"),
            F.substring("o_orderpriority", 1, 1).try_cast("int").alias(
                "prio_digit"
            ),
            F.try_add(F.col("o_orderkey"), F.lit(TRY_ADD_C)).alias("near_max"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


ORACLE_TRY_ARITH = f"""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_orderkey * 1.0 / (o_orderkey % 3) END AS div3,
       TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
       TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_digit,
       CASE WHEN o_orderkey > 9223372036854775807 - {TRY_ADD_C} THEN NULL
            ELSE o_orderkey + {TRY_ADD_C} END AS near_max
FROM orders ORDER BY o_orderkey LIMIT 1000
"""


# --------------------------------------------------------------------------
# Table profiling (the DBA audit: one pass, column-per-row report)
# --------------------------------------------------------------------------

_PROFILE_COLS = ("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")
_PROFILE_NUMERIC = {"p_retailprice"}  # doubles render via a fixed decimal


def _profile_str(c: str) -> F.Column:
    """Cross-engine-stable string rendering for min/max: doubles go
    through ROUND→DECIMAL(30,6) (Spark prints large doubles as '1.0E7',
    DuckDB as '10000000.0' — decimal prints identically on both); ints
    and strings cast directly."""
    if c in _PROFILE_NUMERIC:
        return F.round(F.col(c), 4).cast("decimal(30,6)").cast("string")
    return F.col(c).cast("string")


def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``part`` — row count, null count, distinct
    count, min/max — unpivoted to one row per column: the first query a
    DBA (or a data-quality gate) runs against a new table.

    ONE scan, one reduce: every per-column aggregate is computed in a
    single global agg (partial aggregation map-side, 64 counters per
    task), then the 1-row result is unpivoted driver-free with
    explode(array(struct...)). COUNT(DISTINCT) over multiple columns in
    one agg expands via Spark's Expand operator — n_cols× the scan rows
    map-side but still a single shuffle; at extreme widths split the
    profile into column groups or switch to approx_count_distinct."""
    part = _t(spark, sf_dir, "part")
    aggs = [F.count("*").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(_profile_str(c)).alias(f"mn_{c}"),
            F.max(_profile_str(c)).alias(f"mx_{c}"),
        ]
    row = part.agg(*aggs)
    packed = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("n_rows").cast("long").alias("n_rows"),
                        (F.col("n_rows") - F.col(f"nn_{c}"))
                        .cast("long")
                        .alias("n_nulls"),
                        F.col(f"nd_{c}").cast("long").alias("n_distinct"),
                        F.col(f"mn_{c}").alias("min_val"),
                        F.col(f"mx_{c}").alias("max_val"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    )
    return packed.select("p.*").orderBy("col_name")


def _profile_oracle_one(c: str) -> str:
    render = (
        f"CAST(CAST(ROUND({c}, 4) AS DECIMAL(30,6)) AS VARCHAR)"
        if c in _PROFILE_NUMERIC
        else f"CAST({c} AS VARCHAR)"
    )
    return f"""
  SELECT '{c}' AS col_name,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
         CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
         MIN({render}) AS min_val,
         MAX({render}) AS max_val
  FROM part"""


ORACLE_PROFILE = (
    "\nUNION ALL".join(_profile_oracle_one(c) for c in _PROFILE_COLS)
    + "\nORDER BY col_name"
)


# --------------------------------------------------------------------------
# Winsorized mean (robust location: clamp tails at exact percentiles)
# --------------------------------------------------------------------------

def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of l_extendedprice per return flag: clamp values
    below the exact 5th / above the exact 95th percentile to those
    boundaries, then average — the robust-location estimate that keeps
    sample size (unlike trimming) while bounding outlier influence.

    Two aggregations over one key: exact per-group percentiles (full
    sort per group — the same cost class as agg_percentiles), broadcast
    back onto the fact stream (group count is tiny), clamp in codegen,
    re-aggregate. Clamping is continuous at the boundary, so engine
    agreement on the exact percentile value (established by the
    agg_percentiles precedent) transfers to the clamped mean."""
    li = _t(spark, sf_dir, "lineitem")
    bounds = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.05D)").alias("lo"),
        F.expr("percentile(l_extendedprice, 0.95D)").alias("hi"),
    )
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.round(
                F.avg(F.least(F.greatest("l_extendedprice", F.col("lo")), F.col("hi"))), 4
            ).alias("wins_mean"),
            F.round(F.avg("l_extendedprice"), 4).alias("raw_mean"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_WINSORIZED = """
WITH b AS (
  SELECT l_returnflag,
         quantile_cont(l_extendedprice, 0.05) AS lo,
         quantile_cont(l_extendedprice, 0.95) AS hi
  FROM lineitem GROUP BY 1)
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(AVG(LEAST(GREATEST(l_extendedprice, b.lo), b.hi)), 4)
         AS wins_mean,
       ROUND(AVG(l_extendedprice), 4) AS raw_mean
FROM lineitem l JOIN b USING (l_returnflag)
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


# --------------------------------------------------------------------------
# unionByName (schema-evolution append)
# --------------------------------------------------------------------------

def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append two account ledgers whose projections list the same columns
    in DIFFERENT orders (the schema-evolution situation: an upstream
    producer reordered its schema) via ``unionByName`` — positional UNION
    would silently pair id with balance; by-name resolution is the safe
    append. Map-only on both branches; no shuffle until the final sort."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("acct_id"),
        F.col("c_name").alias("acct_name"),
        F.round(F.col("c_acctbal"), 2).alias("balance"),
        F.lit("customer").alias("side"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"),
        F.round(F.col("s_acctbal"), 2).alias("balance"),
        F.col("s_suppkey").alias("acct_id"),
        F.col("s_name").alias("acct_name"),
    )
    return cust.unionByName(supp).orderBy("side", "acct_id")


ORACLE_UNION_BY_NAME = """
SELECT c_custkey AS acct_id, c_name AS acct_name,
       ROUND(c_acctbal, 2) AS balance, 'customer' AS side
FROM customer
UNION ALL BY NAME
SELECT 'supplier' AS side, ROUND(s_acctbal, 2) AS balance,
       s_suppkey AS acct_id, s_name AS acct_name
FROM supplier
ORDER BY side, acct_id
"""


# --------------------------------------------------------------------------
# DBA audits: referential integrity + primary-key uniqueness
# --------------------------------------------------------------------------

_RI_CHECKS = (
    # (fact table, fk col, dim table, pk col)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the whole star schema — for every
    FK relationship: fact rows total, orphaned rows (FK value absent from
    the dimension), and distinct orphaned key values. The standard
    constraint check a lakehouse has to run as a query, since parquet
    enforces nothing.

    Each relationship is one LEFT ANTI join. Dimensions reduce to their
    DISTINCT key column before joining — nation/part/customer-sized sides
    broadcast; the lineitem→orders check is the one genuine fact-to-fact
    shuffle and keys on the (high-cardinality, skew-free) order key. The
    six checks share no state and union into a single report; a scheduler
    can run them as one job with each branch independently planned."""
    out = None
    for fact, fk, dim, pk in _RI_CHECKS:
        f = _t(spark, sf_dir, fact).select(F.col(fk).alias("fk"))
        d = _t(spark, sf_dir, dim).select(F.col(pk).alias("fk"))
        branch = _ri_branch(f, d, f"{fact}.{fk} -> {dim}.{pk}")
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("relationship")


def _ri_branch(fact_keys: DataFrame, dim_keys: DataFrame, label: str) -> DataFrame:
    """One FK relationship check → a 1-row verdict. NULL FKs count as
    orphans (a null can't reference anything); the anti-join semantics
    drop nulls from the match side, which is exactly that."""
    orphans = fact_keys.join(dim_keys.distinct(), "fk", "left_anti")
    return orphans.agg(
        F.count("*").cast("long").alias("n_orphan_rows"),
        F.countDistinct("fk").cast("long").alias("n_orphan_keys"),
    ).crossJoin(
        fact_keys.agg(F.count("*").cast("long").alias("n_fact_rows"))
    ).select(
        F.lit(label).alias("relationship"),
        "n_fact_rows",
        "n_orphan_rows",
        "n_orphan_keys",
    )


def _ri_oracle_one(fact: str, fk: str, dim: str, pk: str) -> str:
    return f"""
  SELECT '{fact}.{fk} -> {dim}.{pk}' AS relationship,
         CAST((SELECT COUNT(*) FROM {fact}) AS BIGINT) AS n_fact_rows,
         CAST(COUNT(*) AS BIGINT) AS n_orphan_rows,
         CAST(COUNT(DISTINCT {fk}) AS BIGINT) AS n_orphan_keys
  FROM {fact} WHERE {fk} NOT IN (SELECT {pk} FROM {dim} WHERE {pk} IS NOT NULL)
        OR {fk} IS NULL"""


ORACLE_RI = (
    "\nUNION ALL".join(_ri_oracle_one(*c) for c in _RI_CHECKS)
    + "\nORDER BY relationship"
)


_PK_CHECKS = (
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("nation", "n_nationkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
)


def audit_primary_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: per declared key — row count,
    distinct keys, null keys, and rows participating in a duplicated key
    value. One groupBy per table on its key (map-side partial agg), the
    per-table verdicts reduced to single rows and unioned. At 100 TB
    each branch is one shuffle on the table's own key — embarrassingly
    parallel across tables."""
    out = None
    for tbl, pk in _PK_CHECKS:
        t = _t(spark, sf_dir, tbl).select(F.col(pk).alias("pk"))
        per_key = t.groupBy("pk").agg(F.count("*").alias("c"))
        branch = per_key.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_distinct_keys"),
            F.coalesce(
                F.sum(F.when(F.col("pk").isNull(), F.col("c"))), F.lit(0)
            ).cast("long").alias("n_null_rows"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).cast("long").alias("n_dup_rows"),
        ).select(
            F.lit(f"{tbl}.{pk}").alias("key"),
            "n_rows",
            "n_distinct_keys",
            "n_null_rows",
            "n_dup_rows",
        )
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("key")


def _pk_oracle_one(tbl: str, pk: str) -> str:
    return f"""
  SELECT '{tbl}.{pk}' AS key,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_keys,
         CAST(COALESCE(SUM(CASE WHEN pk IS NULL THEN c END), 0) AS BIGINT)
           AS n_null_rows,
         CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
           AS n_dup_rows
  FROM (SELECT {pk} AS pk, COUNT(*) AS c FROM {tbl} GROUP BY 1)"""


ORACLE_PK = (
    "\nUNION ALL".join(_pk_oracle_one(*c) for c in _PK_CHECKS)
    + "\nORDER BY key"
)


# --------------------------------------------------------------------------
# Inter-order arrival gaps (sequential self-pairing per customer)
# --------------------------------------------------------------------------

def orders_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between a customer's consecutive orders, summarized per market
    segment — the purchase-cadence profile behind churn models. The
    consecutive pairing is LAG over (customer, order date, order key):
    one shuffle on o_custkey; the gap axis is epoch-microsecond
    difference floored to whole days, which is timezone-free (no
    calendar-date cast — a session-tz cast would shift day boundaries
    between engines)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_micros(cast(o_orderdate as timestamp))").alias("um"),
    )
    w = W.partitionBy("o_custkey").orderBy("um", "o_orderkey")
    gaps = (
        o.withColumn("prev_um", F.lag("um").over(w))
        .filter(F.col("prev_um").isNotNull())
        .select(
            "o_custkey",
            F.floor((F.col("um") - F.col("prev_um")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("gap_days"),
        )
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        gaps.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.round(F.avg("gap_days"), 4).alias("avg_gap_days"),
            F.round(F.expr("percentile(gap_days, 0.5D)"), 4).alias("median_gap_days"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE_INTERARRIVAL = """
WITH seq AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) AS um,
         LAG(epoch_us(o_orderdate)) OVER
           (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate), o_orderkey)
           AS prev_um
  FROM orders),
gaps AS (
  SELECT o_custkey,
         CAST(floor((um - prev_um) / 86400000000) AS BIGINT) AS gap_days
  FROM seq WHERE prev_um IS NOT NULL)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(AVG(gap_days), 4) AS avg_gap_days,
       ROUND(quantile_cont(gap_days, 0.5), 4) AS median_gap_days,
       CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


# --------------------------------------------------------------------------
# Deterministic global exact-K sample
# --------------------------------------------------------------------------

SAMPLE_K = 100


def sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-K global sample of documents by deterministic hash rank —
    the fixed-size eval-subset draw (TABLESAMPLE gives a BERNOULLI
    fraction, not an exact count; rand() isn't reproducible across
    retries). Ranking key = md5 of the doc id: uniform, stable, and
    engine-portable. The global top-K by hash runs as
    TakeOrderedAndProject — per-partition heaps of K, single K-row merge
    at the driver, NO global sort shuffle; at 100 TB that is the only
    correct shape for a small-K global selection."""
    docs = catalog.load(spark, sf_dir, "documents")
    key = F.md5(F.col("doc_id").cast("string"))
    return (
        docs.select("doc_id", "source", "lang", key.alias("rk"))
        .orderBy("rk")
        .limit(SAMPLE_K)
        .orderBy("doc_id")
        .select("doc_id", "source", "lang")
    )


ORACLE_SAMPLE_K = f"""
SELECT doc_id, source, lang FROM (
  SELECT doc_id, source, lang, md5(CAST(doc_id AS VARCHAR)) AS rk
  FROM documents ORDER BY rk LIMIT {SAMPLE_K})
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Chi-square independence (lang × source contingency)
# --------------------------------------------------------------------------

def stats_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of the language × source contingency
    table — does language mix differ by source? (A pipeline uses this to
    decide whether per-source language filters are needed, or whether a
    source's crawl is language-skewed.) Emits the full contingency table
    with observed, expected-under-independence, and per-cell chi-square
    contribution; the statistic is the contributions' sum.

    One fact-stream shuffle on (lang, source); the margins are
    re-aggregations of the CONTINGENCY TABLE (|langs|·|sources| rows),
    not the corpus, broadcast back onto it — every post-fact stage is
    bounded by category cardinality."""
    docs = catalog.load(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count("*").alias("n_obs"))
    row_m = obs.groupBy("lang").agg(F.sum("n_obs").alias("n_lang"))
    col_m = obs.groupBy("source").agg(F.sum("n_obs").alias("n_source"))
    tot = obs.agg(F.sum("n_obs").cast("double").alias("n_total"))
    # COMPLETE table: unobserved (lang, source) cells are real zero cells
    # — they contribute (0−E)²/E = E to the statistic and make the
    # expected margins reproduce the observed ones exactly. The cross is
    # |langs|×|sources| of two broadcast margins, never the fact stream.
    grid = F.broadcast(row_m).crossJoin(F.broadcast(col_m))
    exp = F.col("n_lang") * F.col("n_source") / F.col("n_total")
    n_obs = F.coalesce("n_obs", F.lit(0))
    return (
        grid.join(obs, ["lang", "source"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            n_obs.cast("long").alias("n_obs"),
            # pure count rational -> exact half-up; envelope: the
            # margin product x 2e6 must stay under 2^63 -> margins up
            # to ~2e6 rows each (ANSI overflows loudly past that; the
            # widening fix is DECIMAL(38,0) numerators). The chi² cell
            # keeps its float form but quantizes by TRUNCATION of the
            # identical double (no round-half tie, TIES.md B') — and
            # squares via d*d, NOT pow(): +,-,*,/ are IEEE correctly
            # rounded in both engines, Math.pow/std::pow are not
            # guaranteed bit-identical.
            F.expr(
                rat_round6_spark(
                    "n_lang * n_source", "cast(n_total as bigint)"
                )
            ).alias("n_exp"),
            (
                F.floor(
                    ((n_obs - exp) * (n_obs - exp) / exp)
                    * F.lit(1000000.0)
                )
                .cast("double")
                / F.lit(1000000.0)
            ).alias("chi2_part"),
        )
        .orderBy("lang", "source")
    )


ORACLE_CHI2 = """
WITH obs AS (
  SELECT lang, source, COUNT(*) AS n_obs FROM documents GROUP BY 1, 2),
rm AS (SELECT lang, SUM(n_obs) AS n_lang FROM obs GROUP BY 1),
cm AS (SELECT source, SUM(n_obs) AS n_source FROM obs GROUP BY 1),
tot AS (SELECT CAST(SUM(n_obs) AS DOUBLE) AS n_total FROM obs),
grid AS (SELECT rm.lang, rm.n_lang, cm.source, cm.n_source FROM rm, cm)
SELECT g.lang, g.source,
       CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
       CAST(((g.n_lang * g.n_source) * 2000000 + (CAST(t.n_total AS BIGINT))) // (2 * (CAST(t.n_total AS BIGINT))) AS DOUBLE) / 1000000.0 AS n_exp,
       FLOOR((COALESCE(o.n_obs, 0) - g.n_lang * g.n_source / t.n_total)
             * (COALESCE(o.n_obs, 0) - g.n_lang * g.n_source / t.n_total)
             / (g.n_lang * g.n_source / t.n_total) * 1000000.0)
         / 1000000.0 AS chi2_part
FROM grid g LEFT JOIN obs o USING (lang, source) CROSS JOIN tot t
ORDER BY g.lang, g.source
"""


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------

def audit_benford_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law — the classic fabricated-data screen a DBA/auditor runs on
    financial columns. The digit is extracted NUMERICALLY
    (x / 10^⌊log10 x⌋ — no double→string formatting, which the two
    engines render differently), map-side; the aggregation is a 9-row
    groupBy. Deviation = observed share − log10(1 + 1/d)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice")
        / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
    ).cast("int")
    n_tot = o.agg(F.count("*").cast("long").alias("n_total"))
    by_digit = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(n_tot))
    )
    benford = F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    return by_digit.select(
        "digit",
        F.col("n").cast("long").alias("n"),
        # pure count ratio -> exact rational half-up (TIES.md B');
        # benford/deviation carry a log10 (non-terminating) -> plain
        # round of the identical double stays safe
        F.expr(rat_round6_spark("n", "n_total")).alias("obs_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(
            F.col("n") / F.col("n_total").cast("double") - benford, 6
        ).alias("deviation"),
    ).orderBy("digit")


ORACLE_BENFORD = """
WITH d AS (
  SELECT CAST(floor(o_totalprice / POW(10.0, floor(log10(o_totalprice))))
              AS INT) AS digit
  FROM orders WHERE o_totalprice > 0),
g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM g)
SELECT digit, CAST(n AS BIGINT) AS n,
       CAST(((n) * 2000000 + (t.n_total)) // (2 * (t.n_total)) AS DOUBLE) / 1000000.0 AS obs_share,
       ROUND(log10(1.0 + 1.0 / digit), 6) AS benford_share,
       ROUND(n / CAST(t.n_total AS DOUBLE)
             - log10(1.0 + 1.0 / digit), 6) AS deviation
FROM g CROSS JOIN t
ORDER BY digit
"""


# --------------------------------------------------------------------------
# Sequence-contiguity audit (line numbers dense 1..n per order)
# --------------------------------------------------------------------------

def audit_line_contiguity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-sequence audit: per order, line numbers must be exactly
    1..n with no gaps or duplicates — the invariant an order-capture
    system promises and parquet can't enforce. The whole check is one
    order-keyed aggregate using the arithmetic identity (min = 1, max =
    n_distinct = count ⇒ dense): no sort, no window, no explode. The
    report is the per-table verdict plus how many orders violate and the
    worst offender — shaped for a scheduled data-quality job."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count("*").alias("n"),
        F.countDistinct("l_linenumber").alias("nd"),
        F.min("l_linenumber").alias("mn"),
        F.max("l_linenumber").alias("mx"),
    )
    flagged = per.withColumn(
        "ok",
        (F.col("mn") == 1) & (F.col("mx") == F.col("n")) & (F.col("nd") == F.col("n")),
    )
    return flagged.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("n_dense"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).cast("long").alias("n_violations"),
        F.max(F.when(~F.col("ok"), F.col("l_orderkey"))).alias("worst_orderkey"),
        F.max("mx").cast("long").alias("max_lines_per_order"),
    )


ORACLE_LINE_CONTIG = """
WITH per AS (
  SELECT l_orderkey, COUNT(*) AS n, COUNT(DISTINCT l_linenumber) AS nd,
         MIN(l_linenumber) AS mn, MAX(l_linenumber) AS mx
  FROM lineitem GROUP BY 1),
f AS (
  SELECT l_orderkey, mx,
         (mn = 1 AND mx = n AND nd = n) AS ok
  FROM per)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_dense,
       CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       MAX(CASE WHEN NOT ok THEN l_orderkey END) AS worst_orderkey,
       CAST(MAX(mx) AS BIGINT) AS max_lines_per_order
FROM f
"""


# --------------------------------------------------------------------------
# ABC / Pareto revenue classification
# --------------------------------------------------------------------------

def abc_analysis_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification — parts ranked by revenue, class A =
    the head covering 80% of cumulative revenue, B = the next 15%, C =
    the tail; the classic Pareto cut purchasing and stocking policy runs
    on. The fact stream reduces to ONE part-keyed aggregate (exact
    decimal revenue); ranking and the running total operate on the
    catalog-sized part table (bounded by SKU count, not order volume —
    the same bounded-window argument as the skyline candidates). Class
    boundaries compare via integer cross-multiplication (cum·5 ≤ tot·4)
    — exact decimal arithmetic, no division-rounding drift between
    engines."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.expr(REVENUE).cast("decimal(25,6)")).alias("rev")
        )
    )
    w = (
        W.orderBy(F.desc("rev"), F.asc("l_partkey"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    tot = rev.agg(F.sum("rev").alias("tot"))
    ranked = (
        rev.withColumn("cum", F.sum("rev").over(w))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(F.col("cum") * 5 <= F.col("tot") * 4, F.lit("A"))
            .when(F.col("cum") * 20 <= F.col("tot") * 19, F.lit("B"))
            .otherwise(F.lit("C")),
        )
    )
    return (
        ranked.groupBy("abc_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev").cast("double").alias("class_revenue"),
            F.round((F.sum("rev") / F.first("tot")).cast("double"), 6).alias(
                "rev_share"
            ),
        )
        .orderBy("abc_class")
    )


ORACLE_ABC = f"""
WITH rev AS (
  SELECT l_partkey, SUM(CAST({REVENUE} AS DECIMAL(25,6))) AS rev
  FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(rev) AS tot FROM rev),
ranked AS (
  SELECT r.rev, t.tot,
         SUM(r.rev) OVER (ORDER BY r.rev DESC, r.l_partkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM rev r CROSS JOIN tot t),
cls AS (
  SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
              WHEN cum * 20 <= tot * 19 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev, tot
  FROM ranked)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) AS class_revenue,
       ROUND(CAST(SUM(rev) / ANY_VALUE(tot) AS DOUBLE), 6) AS rev_share
FROM cls GROUP BY abc_class ORDER BY abc_class
"""


# --------------------------------------------------------------------------
# Bloom runtime-filter join (semi-join reduction)
# --------------------------------------------------------------------------

def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join with a hand-built Bloom RUNTIME FILTER on the join
    key — the semi-join reduction that makes selective fact joins viable
    at 100 TB: the filtered build side (urgent orders) compresses to a
    fixed 16 KB bitset, the probe side (lineitem) is pruned IN CODEGEN
    before its shuffle, and only bloom survivors pay join I/O. (Spark's
    own spark.sql.optimizer.runtimeFilter does this automatically for
    some shapes; building it explicitly makes the technique available to
    any plan and testable.)

    Correctness is again the no-false-negative theorem: the bloom can
    only over-admit, the join itself removes false positives, so the
    result is bit-identical to the plain join — and the oracle IS the
    plain-join SQL. Revenue aggregated per return flag in exact decimal."""
    from .text import bloom_pass_sql, build_bloom_bitset

    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    bloom = spark.createDataFrame(
        [(build_bloom_bitset(urgent, "cast(o_orderkey as string)"),)],
        "bloom_bits array<long> not null",
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"
    )
    survivors = (
        li.join(F.broadcast(bloom))
        .filter(F.expr(bloom_pass_sql("cast(l_orderkey as string)")))
        .drop("bloom_bits")
    )
    return (
        survivors.join(
            urgent, survivors["l_orderkey"] == urgent["o_orderkey"]
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            dsum_expr(REVENUE, "revenue"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_BLOOM_JOIN = f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_dsum(REVENUE)} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------------------------
# Nested denormalization (order → sorted line array), md5-canonicalized
# --------------------------------------------------------------------------

def nested_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denormalize lineitem into a per-order NESTED line array — the
    wide-table build that turns a normalized star into the nested parquet
    serving/ML layout (one row per order, lines as array<struct>). One
    shuffle on the order key; the nested array is built with
    collect_list → sort_array (struct sort: leading field = line number,
    so the array is deterministically ordered regardless of shuffle
    arrival order).

    The driver's hash can't canonicalize an array<struct> column, so the
    checked surface is an md5 over the canonical serialization
    ('ln|qty|price' entries joined with ';', decimals rendered via
    DECIMAL casts — the cross-engine-stable rendering from
    profile_table); the array-typed frame itself is what a production
    writer would persist."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("decimal(12,2)").cast("string").alias("qty_s"),
        F.round("l_extendedprice", 2)
        .cast("decimal(18,2)")
        .cast("string")
        .alias("price_s"),
    )
    entry = F.concat_ws(
        "|", F.col("l_linenumber").cast("string"), "qty_s", "price_s"
    )
    nested = (
        li.select("l_orderkey", F.struct("l_linenumber", entry.alias("e")).alias("s"))
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("s")).alias("lines"))
    )
    return nested.select(
        "l_orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        F.md5(
            F.concat_ws(";", F.transform("lines", lambda x: x["e"]))
        ).alias("lines_md5"),
    ).orderBy("l_orderkey")


ORACLE_NESTED_LINES = """
WITH e AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_linenumber AS VARCHAR) || '|' ||
         CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) || '|' ||
         CAST(CAST(ROUND(l_extendedprice, 2) AS DECIMAL(18,2)) AS VARCHAR)
           AS entry
  FROM lineitem)
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       md5(string_agg(entry, ';' ORDER BY l_linenumber, entry)) AS lines_md5
FROM e GROUP BY l_orderkey ORDER BY l_orderkey
"""


# --------------------------------------------------------------------------
# Pareto skyline (dominance query)
# --------------------------------------------------------------------------

def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline of parts on (cheaper price, larger size) — the
    dominance query ("show offers no other offer beats on both axes")
    that naive SQL writes as a quadratic NOT EXISTS self-join.

    Distributed shape exploits the discrete dominance axis: per size, only
    the min-price part can be on the skyline (groupBy — one bounded
    shuffle, map-side combine), then a single window over the ≤|sizes|-row
    candidate set keeps sizes whose min price undercuts every LARGER
    size's min (running-min over size descending, strictly-less test).
    The quadratic dominance test never touches the fact table; the oracle
    IS the quadratic NOT EXISTS, so the rewrite is proven equivalent.
    Ties: all min-price parts of a kept size are on the skyline."""
    return skyline_core(_t(spark, sf_dir, "part")).orderBy("p_partkey")


def skyline_core(part: DataFrame) -> DataFrame:
    """The distributed skyline on any (p_partkey, p_size, p_retailprice)
    frame — separated from the fixture loader so the hypothesis property
    test can drive it with random point sets against a brute-force
    dominance filter."""
    per_size = part.groupBy("p_size").agg(F.min("p_retailprice").alias("min_price"))
    w = (
        W.orderBy(F.desc("p_size"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    kept_sizes = (
        per_size.withColumn("best_larger", F.min("min_price").over(w))
        .filter(
            F.col("best_larger").isNull()
            | (F.col("min_price") < F.col("best_larger"))
        )
        # fresh column names: kept_sizes derives from `part`, and Spark's
        # ambiguous-self-join check needs the join keys disambiguated
        .select(F.col("p_size").alias("sk_size"), F.col("min_price").alias("sk_price"))
    )
    return (
        part.join(
            F.broadcast(kept_sizes),
            (F.col("p_size") == F.col("sk_size"))
            & (F.col("p_retailprice") == F.col("sk_price")),
        )
        .select(
            "p_partkey",
            "p_size",
            F.round("p_retailprice", 2).alias("price"),
        )
    )


ORACLE_SKYLINE = """
SELECT a.p_partkey, a.p_size, ROUND(a.p_retailprice, 2) AS price
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
ORDER BY a.p_partkey
"""


# --------------------------------------------------------------------------
# Market-basket co-occurrence (brand pairs per order)
# --------------------------------------------------------------------------

BASKET_TOP_K = 20


def basket_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-occurring brand pairs across order baskets — the
    market-basket support count behind cross-sell rules. Per order the
    DISTINCT brand set (dedup before pairing — multiplicity inflates
    support), pairs from an equi-join on the order key with brand_a <
    brand_b canonicalization, one (brand, brand) groupBy, global top-K
    via TakeOrderedAndProject with a full deterministic tie-break.

    The self-join fans out quadratically in basket WIDTH (brands per
    order — bounded by catalog structure, ~7 lines/order), never in
    corpus size; the pair-count table is ≤|brands|² rows."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    brands = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    ob = (
        li.join(F.broadcast(brands), "l_partkey")
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select("l_orderkey", F.col("p_brand").alias("brand_a"))
    b = ob.select("l_orderkey", F.col("p_brand").alias("brand_b"))
    pairs = a.join(b, "l_orderkey").filter(F.col("brand_a") < F.col("brand_b"))
    return (
        pairs.groupBy("brand_a", "brand_b")
        .agg(F.count("*").cast("long").alias("support"))
        .orderBy(F.desc("support"), "brand_a", "brand_b")
        .limit(BASKET_TOP_K)
    )


ORACLE_BASKET = f"""
WITH ob AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand)
SELECT brand_a, brand_b, CAST(COUNT(*) AS BIGINT) AS support
FROM pairs GROUP BY 1, 2
ORDER BY support DESC, brand_a, brand_b
LIMIT {BASKET_TOP_K}
"""


# --------------------------------------------------------------------------
# Longest monotonic streak per user (gaps-and-islands on runs)
# --------------------------------------------------------------------------

def ev_monotonic_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing run of event values per user — the
    run-length/sequence-motif detector (gaming streaks, sensor ramps,
    escalating-spend alerts). Gaps-and-islands on RUNS: a break flag from
    LAG (strict-inequality compare, event-id tiebreak ordering), a
    cumulative sum of breaks as the run id, one groupBy on
    (user, run id) for lengths, then a per-user max — every shuffle keys
    on user_id (one window partition + two keyed aggs), nothing global."""
    ev = catalog.load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.withColumn("prev_v", F.lag("value").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev_v").isNull() | (F.col("value") <= F.col("prev_v")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "run_id",
            F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    lengths = runs.groupBy("user_id", "run_id").agg(
        F.count("*").alias("run_len")
    )
    return (
        lengths.groupBy("user_id")
        .agg(
            F.max("run_len").cast("long").alias("longest_streak"),
            F.count("*").cast("long").alias("n_runs"),
        )
        .orderBy("user_id")
    )


ORACLE_STREAKS = """
WITH s AS (
  SELECT user_id, ts, event_id, value,
         LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_v
  FROM events),
b AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_v IS NULL OR value <= prev_v THEN 1 ELSE 0 END
           AS brk
  FROM s),
r AS (
  SELECT user_id,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_id
  FROM b),
l AS (SELECT user_id, run_id, COUNT(*) AS run_len FROM r GROUP BY 1, 2)
SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_runs
FROM l GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# RFM customer-value segmentation
# --------------------------------------------------------------------------

def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM (recency / frequency / monetary) customer segmentation:
    quintile scores per metric, an ``rfm_cell`` code, and the standard
    marketing segment labels — the workhorse behind churn and campaign
    targeting.

    Scale: the fact stream reduces to ONE customer-keyed aggregate first
    (exact-decimal monetary so quintile boundaries cannot drift between
    engines); the three NTILE windows then rank only the customer
    DIMENSION — bounded by customer count, the same bounded-window
    argument as ``abc_analysis_parts``. At a truly unbounded key space
    the cuts would come from approx_percentile instead of a global sort.
    Every NTILE ordering carries the custkey tie-break so bucket
    assignment is fully deterministic on both engines; the recency
    anchor is the corpus max order date (1-row broadcast)."""
    orders = _t(spark, sf_dir, "orders")
    oday = F.col("o_orderdate").cast("timestamp_ntz").cast("date")
    anchor = orders.agg(F.max(oday).alias("anchor_day"))
    base = orders.groupBy("o_custkey").agg(
        F.max(oday).alias("last_day"),
        F.count("*").cast("long").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("mon_dec"),
    )
    scored = (
        base.crossJoin(F.broadcast(anchor))
        .withColumn(
            "recency_days",
            F.datediff("anchor_day", "last_day").cast("int"),
        )
        .withColumn(
            "r_score",
            F.ntile(5).over(
                W.orderBy(F.desc("recency_days"), F.asc("o_custkey"))
            ),
        )
        .withColumn(
            "f_score",
            F.ntile(5).over(
                W.orderBy(F.asc("frequency"), F.asc("o_custkey"))
            ),
        )
        .withColumn(
            "m_score",
            F.ntile(5).over(
                W.orderBy(F.asc("mon_dec"), F.asc("o_custkey"))
            ),
        )
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "frequency",
        F.col("mon_dec").cast("double").alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.concat_ws("", "r_score", "f_score", "m_score").alias("rfm_cell"),
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion"
        )
        .when(
            (F.col("r_score") >= 4) & (F.col("f_score") <= 2),
            "recent_light",
        )
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") >= 4),
            "at_risk_loyal",
        )
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2), "hibernating"
        )
        .otherwise("core")
        .alias("segment"),
    ).orderBy("o_custkey")


def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-weighted median sale price per part — the
    "typical price a unit actually sold at" (a plain median over line
    items lets one 1-unit clearance line count as much as a 50-unit
    restock). Spark has no weighted-percentile aggregate; this is the
    distributed rewrite: collapse to (part, price) with exact-decimal
    weight sums, one part-keyed running-sum window over the per-part
    price ladder, then the median is the smallest price whose cumulative
    weight covers half the total — selected by integer-style
    cross-multiplication (2·cum ≥ tot in DECIMAL, no division).

    Scale: the window partitions by PART KEY — per-partition size is the
    part's distinct-price count (tiny), parallelism is catalog-wide, so
    the holistic aggregate never funnels through one task. Ties across
    engines are impossible: cum is an exact decimal and the price ladder
    is strictly increasing within a part."""
    # NOT load_par: (part, price) is nearly row-distinct, so the partial
    # agg doesn't reduce and an insurance repartition is a pure extra
    # shuffle (A/B: 1.6s -> 2.5s at sf0.1, r14 optimization round).
    li = _t(spark, sf_dir, "lineitem")
    wp = li.groupBy("l_partkey", "l_extendedprice").agg(
        F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("w")
    )
    wcum = W.partitionBy("l_partkey").orderBy("l_extendedprice").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wtot = W.partitionBy("l_partkey").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    ladder = wp.withColumn("cum", F.sum("w").over(wcum)).withColumn(
        "tot", F.sum("w").over(wtot)
    )
    return (
        ladder.filter(F.col("cum") * 2 >= F.col("tot"))
        .groupBy("l_partkey")
        .agg(
            F.min("l_extendedprice").alias("wmedian_price"),
            F.max("tot").cast("double").alias("total_qty"),
        )
        .orderBy("l_partkey")
    )


ORACLE_WMEDIAN = """
WITH wp AS (
  SELECT l_partkey, l_extendedprice,
         SUM(CAST(l_quantity AS DECIMAL(25,6))) AS w
  FROM lineitem GROUP BY 1, 2),
ladder AS (
  SELECT l_partkey, l_extendedprice, w,
         SUM(w) OVER (PARTITION BY l_partkey ORDER BY l_extendedprice
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(w) OVER (PARTITION BY l_partkey) AS tot
  FROM wp)
SELECT l_partkey,
       MIN(l_extendedprice) AS wmedian_price,
       CAST(MAX(tot) AS DOUBLE) AS total_qty
FROM ladder WHERE cum * 2 >= tot
GROUP BY l_partkey ORDER BY l_partkey
"""


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maximally-skewed join shape — a fact table joined on a
    handful-of-values key (event_type: every row of a type funnels into
    ONE reducer in a plain shuffle join) — rewritten with the engine's
    salting helpers so NO stage keys an exchange on the hot column:
    ``salted_join`` salts the fact side row-wise and replicates the tiny
    dim across salts (the dim lands broadcast — the fact never shuffles
    for the join at all), then ``salted_agg`` two-stages the final
    aggregate through (type, salt) sub-groups before combining the
    16-per-type partials. Results are provably the plain join+agg — the
    oracle IS the unsalted SQL — because salting is a pure plan rewrite
    and the decimal partials are associative.

    The dim is the per-type share tier (head = ≥20% of traffic, exact
    integer cross-multiplication); the weighted sum uses the dim column
    so the join is load-bearing."""
    from ..functions.skew import salted_agg, salted_join

    ev = _t(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    tot = dim.agg(F.sum("cnt").alias("tot"))
    tiers = (
        dim.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "cnt",
            F.when(F.col("cnt") * 10 >= F.col("tot") * 2, "head")
            .otherwise("tail")
            .alias("tier"),
        )
    )
    joined = salted_join(
        ev.select("event_type", "value", "event_id"),
        tiers,
        on="event_type",
        salt_from="event_id",
    )
    wexpr = (F.col("value") * F.col("cnt")).cast("decimal(25,6)")
    out = salted_agg(
        joined,
        ["event_type", "tier"],
        {
            "n_events": ("sum", F.count("*")),
            "wsum_dec": ("sum", F.sum(wexpr)),
        },
        salt_from="event_id",
    )
    return out.select(
        "event_type",
        "tier",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("wsum_dec").cast("double").alias("wsum"),
    ).orderBy("event_type")


ORACLE_SKEW_JOIN = """
WITH dim AS (
  SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY 1),
tot AS (SELECT SUM(cnt) AS tot FROM dim),
tiers AS (
  SELECT d.event_type, d.cnt,
         CASE WHEN d.cnt * 10 >= t.tot * 2 THEN 'head' ELSE 'tail' END
           AS tier
  FROM dim d CROSS JOIN tot t)
SELECT e.event_type, t.tier,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value * t.cnt AS DECIMAL(25,6))) AS DOUBLE) AS wsum
FROM events e JOIN tiers t USING (event_type)
GROUP BY 1, 2 ORDER BY e.event_type
"""


def orders_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation — the
    antitrust/supply-risk screen: HHI = Σ share_i² over each nation's
    supplier revenue shares (1.0 = monopoly, →0 = atomized). A nation
    whose parts flow through two suppliers is a disruption risk even if
    totals look healthy.

    Scale: fact stream → ONE supplier-keyed exact-decimal aggregate,
    then nation-level rollup over the supplier DIMENSION (bounded).
    Exactness: per-supplier revenue is an exact decimal; shares are one
    IEEE division each, share² contributions are rounded to 12dp and
    summed in exact decimal so partial-agg order cannot move the index."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.expr(REVENUE).cast("decimal(25,6)")).alias("rev")
    )
    located = rev.join(
        F.broadcast(
            sup.select("s_suppkey", "s_nationkey").join(
                F.broadcast(nat.select("n_nationkey", "n_name")),
                sup.s_nationkey == nat.n_nationkey,
            )
        ),
        rev.l_suppkey == F.col("s_suppkey"),
    )
    tot = located.groupBy("n_name").agg(
        F.sum("rev").alias("tot_dec"),
        F.count("*").cast("long").alias("n_suppliers"),
    )
    shares = (
        located.join(tot, "n_name")
        .withColumn(
            "share",
            F.col("rev").cast("double") / F.col("tot_dec").cast("double"),
        )
        .withColumn(
            "c", F.round(F.col("share") * F.col("share"), 12).cast(
                "decimal(25,12)"
            )
        )
    )
    return (
        shares.groupBy("n_name")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            F.round(F.sum("c").cast("double"), 6).alias("hhi"),
            F.round(F.max("share"), 6).alias("top_share"),
        )
        .orderBy("n_name")
    )


ORACLE_HHI = f"""
WITH rev AS (
  SELECT l_suppkey, SUM(CAST({REVENUE} AS DECIMAL(25,6))) AS rev
  FROM lineitem GROUP BY 1),
located AS (
  SELECT r.rev, n.n_name
  FROM rev r
  JOIN supplier s ON s.s_suppkey = r.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey),
tot AS (
  SELECT n_name, SUM(rev) AS tot_dec,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers
  FROM located GROUP BY 1),
shares AS (
  SELECT l.n_name, t.n_suppliers,
         CAST(l.rev AS DOUBLE) / CAST(t.tot_dec AS DOUBLE) AS share
  FROM located l JOIN tot t USING (n_name))
SELECT n_name,
       MAX(n_suppliers) AS n_suppliers,
       ROUND(CAST(SUM(CAST(ROUND(share * share, 12) AS DECIMAL(25,12)))
                  AS DOUBLE), 6) AS hhi,
       ROUND(MAX(share), 6) AS top_share
FROM shares GROUP BY n_name ORDER BY n_name
"""


SURVIVAL_THRESHOLDS = (7, 14, 30, 60, 90, 180)


def customer_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival curve of customer inter-order gaps — for each threshold
    t, the fraction of consecutive-order gaps longer than t days: the
    empirical "if a customer has been quiet t days, are they gone?"
    curve that churn definitions are calibrated against.

    Scale: one customer-keyed LAG pairing (gaps are integer days, exact),
    then the tiny gap stream cross-joins a 6-row broadcast threshold
    table and reduces in ONE aggregate — counts are integers, the final
    rate is a single division."""
    orders = _t(spark, sf_dir, "orders")
    oday = F.expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
    )
    w = W.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        orders.select("o_custkey", "o_orderkey", oday.alias("day"))
        .withColumn("prev_day", F.lag("day").over(w))
        .filter(F.col("prev_day").isNotNull())
        .select((F.col("day") - F.col("prev_day")).alias("gap_days"))
    )
    th = spark.createDataFrame(
        [(t,) for t in SURVIVAL_THRESHOLDS], "t int"
    )
    return (
        gaps.crossJoin(F.broadcast(th))
        .groupBy("t")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum(
                F.when(F.col("gap_days") > F.col("t"), 1).otherwise(0)
            ).cast("long").alias("n_surviving"),
        )
        .withColumn(
            "surv_rate",
            # exact rational half-up on the count ratio (TIES.md B')
            F.expr(rat_round6_spark("n_surviving", "n_gaps")),
        )
        .orderBy("t")
    )


ORACLE_GAP_SURVIVAL = f"""
WITH g AS (
  SELECT epoch_us(o_orderdate) // 86400000000
         - LAG(epoch_us(o_orderdate) // 86400000000) OVER (
             PARTITION BY o_custkey
             ORDER BY epoch_us(o_orderdate) // 86400000000, o_orderkey)
           AS gap_days
  FROM orders),
gaps AS (SELECT gap_days FROM g WHERE gap_days IS NOT NULL),
th AS (SELECT unnest([{", ".join(str(t) for t in SURVIVAL_THRESHOLDS)}])
         AS t)
SELECT CAST(th.t AS INT) AS t,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       CAST(SUM(CASE WHEN gap_days > th.t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_surviving,
       CAST(((SUM(CASE WHEN gap_days > th.t THEN 1 ELSE 0 END)) * 2000000 + (COUNT(*))) // (2 * (COUNT(*))) AS DOUBLE) / 1000000.0 AS surv_rate
FROM gaps CROSS JOIN th
GROUP BY th.t ORDER BY t
"""


def agg_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue within each nation — the
    inequality lens on the customer base (0 = everyone spends alike,
    →1 = one whale funds the nation). Uses the rank formula
    ``G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)`` over ascending-ranked
    exact-decimal customer totals; ranks carry the custkey tie-break so
    both engines rank identically, the rank-weighted sums are exact
    decimals, and only the final formula runs in (identically
    parenthesized) double.

    Scale: fact → one customer-keyed aggregate; ranking windows
    partition by NATION over the customer dimension (bounded)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("x")
    )
    located = rev.join(
        F.broadcast(
            cust.select("c_custkey", "c_nationkey").join(
                F.broadcast(nat.select("n_nationkey", "n_name")),
                cust.c_nationkey == nat.n_nationkey,
            )
        ),
        rev.o_custkey == F.col("c_custkey"),
    )
    wrank = W.partitionBy("n_name").orderBy("x", "o_custkey")
    ranked = located.withColumn("i", F.row_number().over(wrank))
    g = ranked.groupBy("n_name").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("i")).cast("double").alias("sxi"),
    )
    return g.select(
        "n_name",
        "n_customers",
        F.round(F.col("sx"), 2).alias("total_revenue"),
        F.round(
            (F.lit(2.0) * F.col("sxi")
             - (F.col("n_customers") + 1) * F.col("sx"))
            / (F.col("n_customers") * F.col("sx")),
            6,
        ).alias("gini"),
    ).orderBy("n_name")


ORACLE_GINI = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS x
  FROM orders GROUP BY 1),
located AS (
  SELECT r.o_custkey, r.x, n.n_name
  FROM rev r
  JOIN customer c ON c.c_custkey = r.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey),
ranked AS (
  SELECT n_name, x,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY x, o_custkey)
           AS i
  FROM located),
g AS (
  SELECT n_name,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(x * i) AS DOUBLE) AS sxi
  FROM ranked GROUP BY 1)
SELECT n_name, n_customers,
       ROUND(sx, 2) AS total_revenue,
       ROUND((2.0 * sxi - (n_customers + 1) * sx)
             / (n_customers * sx), 6) AS gini
FROM g ORDER BY n_name
"""


OTIF_DAYS = 30


def orders_otif_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time-in-full rate per order priority — the fulfilment KPI: an
    order counts as OTIF when its LAST line ships within {OTIF_DAYS}
    days of the order date (order-level predicate, not the line-level
    lateness of q12). One lineitem aggregate to the order grain, one
    broadcast-joined rollup; counts integer-exact, the mean days-to-
    complete is a decimal-sum average."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    close = li.groupBy("l_orderkey").agg(
        F.max(
            F.expr(
                "unix_micros(cast(l_shipdate as timestamp)) div 86400000000"
            )
        ).alias("last_ship_day")
    )
    oday = F.expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
    )
    j = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderpriority",
        oday.alias("order_day"),
    ).join(close, "l_orderkey")
    days = F.col("last_ship_day") - F.col("order_day")
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.when(days <= OTIF_DAYS, 1).otherwise(0))
            .cast("long")
            .alias("n_otif"),
            F.sum(days).cast("long").alias("days_sum"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            "n_otif",
            # integer-day sums and counts -> exact rational half-up on
            # both ratios (TIES.md B')
            F.expr(rat_round6_spark("n_otif", "n_orders")).alias(
                "otif_rate"
            ),
            F.expr(rat_round6_spark("days_sum", "n_orders")).alias(
                "avg_days_to_complete"
            ),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_OTIF = f"""
WITH close AS (
  SELECT l_orderkey,
         MAX(epoch_us(l_shipdate) // 86400000000) AS last_ship_day
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o.o_orderpriority,
         c.last_ship_day - epoch_us(o.o_orderdate) // 86400000000
           AS days
  FROM orders o JOIN close c ON c.l_orderkey = o.o_orderkey)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN days <= {OTIF_DAYS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_otif,
       CAST(((SUM(CASE WHEN days <= {OTIF_DAYS} THEN 1 ELSE 0 END)) * 2000000 + (COUNT(*))) // (2 * (COUNT(*))) AS DOUBLE) / 1000000.0 AS otif_rate,
       CAST(((SUM(days)) * 2000000 + (COUNT(*))) // (2 * (COUNT(*))) AS DOUBLE) / 1000000.0 AS avg_days_to_complete
FROM j GROUP BY 1 ORDER BY o_orderpriority
"""


BASKET_LIFT_TOPK = 20


def basket_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association metrics for part-TYPE co-purchases: support,
    confidence and LIFT per type pair (``basket_brand_pairs`` stops at
    raw support counts; lift is what separates "popular together" from
    "popular apart" — the recommender/bundling signal). Baskets reduce
    to distinct (order, type) rows first, the pair fan-out is bounded by
    basket width, and the per-type totals join back via broadcast
    (type cardinality is catalog-bounded). Counts are integers
    end-to-end; the three ratios are single divisions / one
    multiply-divide chain in identically parenthesized double. Top-K
    pairs under the total (n_ab DESC, type_a, type_b) order."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    items = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_type")),
            li.l_partkey == part.p_partkey,
        )
        .select("l_orderkey", "p_type")
        .distinct()
    )
    # basket universe size as a 1-row broadcast, NOT a driver .count():
    # builders must stay lazy (plan_audit constructs every plan)
    ntotdf = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("ntot")
    )
    tc = items.groupBy("p_type").agg(F.count("*").alias("n_t"))
    b = items.select(
        "l_orderkey", F.col("p_type").alias("type_b")
    )
    pairs = (
        items.select("l_orderkey", F.col("p_type").alias("type_a"))
        .join(b, "l_orderkey")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    enriched = (
        pairs.join(
            F.broadcast(tc.select(F.col("p_type").alias("type_a"),
                                  F.col("n_t").alias("n_a"))),
            "type_a",
        )
        .join(
            F.broadcast(tc.select(F.col("p_type").alias("type_b"),
                                  F.col("n_t").alias("n_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(ntotdf))
    )
    # Count ratios via exact rational half-up (numeric.rat_round6_*):
    # round(n_ab/ntot, 6) can land on an exact 7th-digit-5 decimal tie
    # when the denominator is 2^a·5^b-shaped, where the two engines'
    # round procedures split (TIES.md Class B′). Integer envelope:
    # num·2·10⁶ must stay under 2⁶³ → counts (and the lift product)
    # up to ~4.6·10¹² — far above any per-type basket count.
    return (
        enriched.select(
            "type_a",
            "type_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.expr(rat_round6_spark("n_ab", "ntot")).alias("support"),
            F.expr(rat_round6_spark("n_ab", "n_a")).alias("confidence"),
            F.expr(
                rat_round6_spark("n_ab * ntot", "n_a * n_b")
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), F.asc("type_a"), F.asc("type_b"))
        .limit(BASKET_LIFT_TOPK)
    )


ORACLE_BASKET_LIFT = f"""
WITH items AS (
  SELECT DISTINCT l.l_orderkey, p.p_type
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
ntot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
tc AS (SELECT p_type, COUNT(*) AS n_t FROM items GROUP BY 1),
pairs AS (
  SELECT a.p_type AS type_a, b.p_type AS type_b, COUNT(*) AS n_ab
  FROM items a JOIN items b
    ON b.l_orderkey = a.l_orderkey AND a.p_type < b.p_type
  GROUP BY 1, 2)
SELECT p.type_a, p.type_b,
       CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(((p.n_ab) * 2000000 + ((SELECT n FROM ntot))) // (2 * ((SELECT n FROM ntot))) AS DOUBLE) / 1000000.0
         AS support,
       CAST(((p.n_ab) * 2000000 + (ta.n_t)) // (2 * (ta.n_t)) AS DOUBLE) / 1000000.0
         AS confidence,
       CAST(((p.n_ab * (SELECT n FROM ntot)) * 2000000 + (ta.n_t * tb.n_t)) // (2 * (ta.n_t * tb.n_t)) AS DOUBLE) / 1000000.0
         AS lift
FROM pairs p
JOIN tc ta ON ta.p_type = p.type_a
JOIN tc tb ON tb.p_type = p.type_b
ORDER BY n_ab DESC, type_a ASC, type_b ASC
LIMIT {BASKET_LIFT_TOPK}
"""


def elasticity_discount_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount elasticity read: the correlation between the
    discount offered and the quantity bought, with exact-decimal mean
    quantities in the low- and high-discount halves — the merchandising
    question "does discounting this brand actually move volume?".

    The correlation is assembled from 9dp-rounded decimal MOMENT sums
    rather than ``F.corr``: under Spark 4's ANSI mode ``corr`` raises
    DIVIDE_BY_ZERO on any zero-variance group (verified live) while
    DuckDB returns NULL — the moment form makes the zero-variance guard
    an explicit (identically-IEEE) predicate on both engines, and the
    exact decimal sums make the moments partial-order independent. The
    half-split uses a fixed 5% literal so no engine-dependent median is
    involved.

    Scale: one broadcast dim join (part → brand), ONE brand-keyed
    aggregate carrying all six moments — no second pass, no window."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == part.p_partkey,
    )
    lo = F.col("l_discount") < 0.05

    def dsum9(expr):
        return F.sum(F.round(expr, 9).cast("decimal(25,9)")).cast("double")

    x, y = F.col("l_discount"), F.col("l_quantity")
    g = j.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_lines"),
        dsum9(x).alias("sx"),
        dsum9(y).alias("sy"),
        dsum9(x * y).alias("sxy"),
        dsum9(x * x).alias("sxx"),
        dsum9(y * y).alias("syy"),
        F.round(davg(F.when(lo, y), "_a"), 6).alias("avg_qty_low_disc"),
        F.round(davg(F.when(~lo, y), "_b"), 6).alias("avg_qty_high_disc"),
    )
    n = F.col("n_lines").cast("double")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return g.select(
        "p_brand",
        "n_lines",
        F.when(
            (varx > 0) & (vary > 0),
            F.round(cov / F.sqrt(varx * vary), 6),
        ).alias("corr_discount_qty"),
        "avg_qty_low_disc",
        "avg_qty_high_disc",
    ).orderBy("p_brand")


ORACLE_ELASTICITY = """
WITH g AS (
  SELECT p.p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(ROUND(l.l_discount, 9) AS DECIMAL(25,9)))
              AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(l.l_quantity, 9) AS DECIMAL(25,9)))
              AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(l.l_discount * l.l_quantity, 9)
                       AS DECIMAL(25,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(l.l_discount * l.l_discount, 9)
                       AS DECIMAL(25,9))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(l.l_quantity * l.l_quantity, 9)
                       AS DECIMAL(25,9))) AS DOUBLE) AS syy,
         ROUND(CAST(SUM(CAST(CASE WHEN l.l_discount < 0.05
                                  THEN l.l_quantity END
                             AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(CASE WHEN l.l_discount < 0.05
                            THEN l.l_quantity END), 6)
           AS avg_qty_low_disc,
         ROUND(CAST(SUM(CAST(CASE WHEN NOT (l.l_discount < 0.05)
                                  THEN l.l_quantity END
                             AS DECIMAL(25,6))) AS DOUBLE)
               / COUNT(CASE WHEN NOT (l.l_discount < 0.05)
                            THEN l.l_quantity END), 6)
           AS avg_qty_high_disc
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY p.p_brand)
SELECT p_brand, n_lines,
       CASE WHEN CAST(n_lines AS DOUBLE) * sxx - sx * sx > 0
             AND CAST(n_lines AS DOUBLE) * syy - sy * sy > 0 THEN
         ROUND((CAST(n_lines AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n_lines AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n_lines AS DOUBLE) * syy - sy * sy)), 6)
       END AS corr_discount_qty,
       avg_qty_low_disc, avg_qty_high_disc
FROM g ORDER BY p_brand
"""


MEDIAN_BUCKETS = 1024  # floor on the histogram width
# Pass-2 sorts one bucket per quantile in a single task; the bucket count
# SCALES with n so that expected bucket population stays ≤ this target —
# a bounded-residual guarantee at any corpus size (VERDICT r5 item 5).
MEDIAN_RESIDUAL_TARGET = 1 << 20  # ~1M rows: trivially single-task sortable
SELECTION_QUANTILES = (0.5, 0.9, 0.99)


def agg_exact_global_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global order statistics (median / p90 / p99 of
    l_extendedprice) by distributed SELECTION — no global sort, no
    single-partition holistic aggregate: pass 1 bins every value into
    max({MEDIAN_BUCKETS}, ⌈n / {MEDIAN_RESIDUAL_TARGET}⌉) width buckets
    (map-side combined counts), the small bucket histogram locates, for
    EACH requested quantile, which bucket holds its k-th smallest
    (k = ceil(q·n)) and the residual rank within it, and pass 2 sorts
    ONLY those buckets' rows. Because the bucket count grows linearly
    with n, the EXPECTED residual a single task sorts is bounded by
    ~{MEDIAN_RESIDUAL_TARGET} rows at ANY corpus size (1024 buckets at
    the fixture SFs — identical plan — and e.g. ~10⁶ buckets at 10¹² rows,
    where the histogram itself is still a trivially small aggregate).
    The bound is in expectation under the value distribution: a single
    value repeated ~n times concentrates its bucket regardless of the
    histogram width; the selection answer stays exact either way (a
    value-level pre-aggregation is the heavy-ties variant of this plan).
    The textbook two-pass SELECTION rewrite of "ORDER BY … OFFSET k",
    amortized across all three quantiles from the same histogram. (Two
    LOGICAL passes; the lazy unshared plan re-embeds the stats/bin
    subtrees across its branches, so the fact table is physically
    scanned by each branch — map-side-combined every time. A deployment
    would persist the binned frame to make the physical scan count
    match; builders here stay lazy so plan audits never execute jobs.)
    Degenerate input: an EMPTY relation yields zero rows on both
    engines (the oracle guards its quantile spine on n > 0).

    Determinism: bucket ids are IEEE arithmetic on exact parquet doubles
    (identical in both engines), k = ceil(q·n) is one IEEE product, and
    within a target bucket row_number ties on equal values are harmless
    because the k-th order STATISTIC is tie-invariant — the bucketing is
    a pure partitioning of the rank space, so NO bucket-count choice can
    change the result. Oracle: brute-force global ROW_NUMBER selection
    (bucket-free by construction)."""
    li = _t(spark, sf_dir, "lineitem")
    v = li.select(F.col("l_extendedprice").alias("v"))
    stats = v.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count("*").alias("n"),
    ).select(
        "lo",
        "hi",
        "n",
        F.greatest(
            F.lit(MEDIAN_BUCKETS),
            F.ceil(F.col("n") / F.lit(MEDIAN_RESIDUAL_TARGET)),
        ).cast("long").alias("nb"),
    )
    b = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.col("nb") - 1,
            F.floor(
                (F.col("v") - F.col("lo"))
                / (F.col("hi") - F.col("lo"))
                * F.col("nb")
            ),
        ),
    ).otherwise(0)
    binned = v.crossJoin(F.broadcast(stats)).select(
        "v", b.cast("long").alias("bucket")
    )
    qs = spark.createDataFrame(
        [(q,) for q in SELECTION_QUANTILES], "q double"
    )
    ks = qs.crossJoin(F.broadcast(stats)).select(
        "q",
        "n",
        F.greatest(
            F.lit(1), F.ceil(F.col("q") * F.col("n"))
        ).cast("long").alias("k"),
    )
    hist = binned.groupBy("bucket").agg(F.count("*").alias("c"))
    wcum = W.orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    targets = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .withColumn("prev_cum", F.col("cum") - F.col("c"))
        .crossJoin(F.broadcast(ks))
        .filter(
            (F.col("cum") >= F.col("k")) & (F.col("prev_cum") < F.col("k"))
        )
        .select(
            "q",
            "n",
            "k",
            F.col("bucket").alias("tbucket"),
            (F.col("k") - F.col("prev_cum")).alias("residual_rank"),
        )
    )
    in_bucket = binned.join(
        F.broadcast(targets), binned.bucket == F.col("tbucket")
    )
    wsel = W.partitionBy("q").orderBy("v")
    return (
        in_bucket.withColumn("rn", F.row_number().over(wsel))
        .filter(F.col("rn") == F.col("residual_rank"))
        .select(
            "q",
            F.col("n").cast("long").alias("n_rows"),
            F.col("k").cast("long").alias("k"),
            F.col("v").alias("value_exact"),
        )
        .orderBy("q")
    )


ORACLE_EXACT_MEDIAN = f"""
WITH s AS (
  SELECT l_extendedprice AS v,
         ROW_NUMBER() OVER (ORDER BY l_extendedprice) AS rn
  FROM lineitem),
nn AS (SELECT COUNT(*) AS n FROM lineitem),
qs AS (SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)"
                                 for q in SELECTION_QUANTILES)}])
         AS q),
ks AS (
  SELECT q, nn.n,
         GREATEST(1, CAST(ceil(q * nn.n) AS BIGINT)) AS k
  FROM qs CROSS JOIN nn)
SELECT ks.q,
       CAST(ks.n AS BIGINT) AS n_rows,
       ks.k,
       (SELECT v FROM s WHERE s.rn = ks.k) AS value_exact
FROM ks WHERE ks.n > 0 ORDER BY q
"""


def part_supply_redundancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-chain redundancy audit: for each observed supplier-count
    level, how many parts have exactly that many distinct suppliers —
    and the single-source share, the procurement risk number (a part
    with one supplier is one bankruptcy away from a stockout). One
    (part, supplier) dedup, one part-keyed count, one tiny rollup; the
    share is an integer cross-ratio rendered once in double."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    per_part = ps.groupBy("l_partkey").agg(
        F.count("*").alias("n_suppliers")
    )
    tot = per_part.agg(F.count("*").alias("n_parts_total"))
    return (
        per_part.groupBy("n_suppliers")
        .agg(F.count("*").cast("long").alias("n_parts"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            "n_parts",
            F.round(
                F.col("n_parts").cast("double")
                / F.col("n_parts_total").cast("double"),
                6,
            ).alias("share_of_parts"),
        )
        .orderBy("n_suppliers")
    )


ORACLE_SUPPLY_REDUNDANCY = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
per_part AS (
  SELECT l_partkey, COUNT(*) AS n_suppliers FROM ps GROUP BY 1),
tot AS (SELECT COUNT(*) AS n_parts_total FROM per_part)
SELECT CAST(p.n_suppliers AS BIGINT) AS n_suppliers,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST(t.n_parts_total AS DOUBLE), 6) AS share_of_parts
FROM per_part p CROSS JOIN tot t
GROUP BY p.n_suppliers, t.n_parts_total
ORDER BY n_suppliers
"""


def orders_brand_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month brand league table with rank SHIFTS — the
    merchandising mover report ("who climbed, who slid"). Revenue per
    (brand, month) in exact decimal, a dense month axis as integer
    y·12+m, ROW_NUMBER ranks inside each month (revenue DESC with brand
    tie-break — decimal revenue makes rank boundaries exact), then LAG
    along each brand's own observed months gives the shift (positive =
    climbed). Months where a brand had no sales simply don't appear —
    the shift is against the previous OBSERVED month, documented
    semantics.

    Scale: fact reduces to ONE (brand, month)-keyed decimal aggregate;
    both windows run over the brand×month grid (catalog × calendar,
    corpus-independent)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    sd = F.expr("cast(l_shipdate as timestamp_ntz)")
    rev = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == part.p_partkey,
        )
        .groupBy(
            "p_brand",
            (F.year(sd) * 12 + (F.month(sd) - 1)).alias("ym"),
        )
        .agg(
            F.sum(F.expr(REVENUE).cast("decimal(25,6)")).alias("rev")
        )
    )
    wrank = W.partitionBy("ym").orderBy(F.desc("rev"), F.asc("p_brand"))
    wlag = W.partitionBy("p_brand").orderBy("ym")
    ranked = rev.withColumn("rnk", F.row_number().over(wrank)).withColumn(
        "prev_rnk", F.lag("rnk").over(wlag)
    )
    return (
        ranked.filter(F.col("prev_rnk").isNotNull())
        .select(
            F.make_date(
                F.expr("ym div 12").cast("int"),
                (F.col("ym") % 12) + 1,
                F.lit(1),
            ).alias("month"),
            "p_brand",
            F.col("rev").cast("double").alias("revenue"),
            F.col("rnk").cast("int").alias("rnk"),
            F.col("prev_rnk").cast("int").alias("prev_rnk"),
            (F.col("prev_rnk") - F.col("rnk")).cast("int").alias("shift"),
        )
        .orderBy("month", "rnk")
    )


ORACLE_BRAND_RANK_SHIFT = f"""
WITH rev AS (
  SELECT p.p_brand,
         year(l.l_shipdate) * 12 + (month(l.l_shipdate) - 1) AS ym,
         SUM(CAST({REVENUE} AS DECIMAL(25,6))) AS rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2),
ranked AS (
  SELECT p_brand, ym, rev,
         ROW_NUMBER() OVER (PARTITION BY ym
                            ORDER BY rev DESC, p_brand ASC) AS rnk
  FROM rev),
shifted AS (
  SELECT *, LAG(rnk) OVER (PARTITION BY p_brand ORDER BY ym)
            AS prev_rnk
  FROM ranked)
SELECT make_date(CAST(ym // 12 AS INT), CAST(ym % 12 AS INT) + 1, 1)
         AS month,
       p_brand,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rnk AS INT) AS rnk,
       CAST(prev_rnk AS INT) AS prev_rnk,
       CAST(prev_rnk - rnk AS INT) AS shift
FROM shifted WHERE prev_rnk IS NOT NULL
ORDER BY month, rnk
"""


ORACLE_RFM = """
WITH anchor AS (
  SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor_day FROM orders),
base AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS mon_dec
  FROM orders GROUP BY 1),
scored AS (
  SELECT b.o_custkey,
         CAST(date_diff('day', b.last_day, a.anchor_day) AS INTEGER)
           AS recency_days,
         b.frequency, b.mon_dec,
         NTILE(5) OVER (ORDER BY date_diff('day', b.last_day, a.anchor_day)
                        DESC, b.o_custkey) AS r_score,
         NTILE(5) OVER (ORDER BY b.frequency ASC, b.o_custkey) AS f_score,
         NTILE(5) OVER (ORDER BY b.mon_dec ASC, b.o_custkey) AS m_score
  FROM base b CROSS JOIN anchor a)
SELECT o_custkey, recency_days, frequency,
       CAST(mon_dec AS DOUBLE) AS monetary,
       r_score, f_score, m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS rfm_cell,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score >= 4 AND f_score <= 2 THEN 'recent_light'
            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
            ELSE 'core' END AS segment
FROM scored ORDER BY o_custkey
"""


# --------------------------------------------------------------------------
# Join-key skew audit (the Spark DBA's shuffle-planning report)
# --------------------------------------------------------------------------

_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


def audit_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew report over the fact table's join keys — the
    numbers a Spark DBA reads before choosing broadcast vs sort-merge vs
    salted for each join: rows, distinct keys, the hottest key's row
    count and share, and the skew ratio (hottest / average). A ratio
    near 1 means hash partitions balance; a large ratio is the straggler
    warning that motivates salting / AQE skew-join (exactly what
    ``join_skew_salted`` then demonstrates). One map-side-combined
    groupBy per key column — embarrassingly parallel across keys, no
    driver state; the per-key aggregate reduces to a single row before
    anything crosses the wire twice.

    Determinism: every output is an integer or an EXACT rational
    half-up at 6dp (integer arithmetic on both engines — a float round
    of a count ratio can split the engines on 7th-digit-5 decimal
    ties, TIES.md Class B′)."""
    li = _t(spark, sf_dir, "lineitem")
    out = None
    for key in _SKEW_KEYS:
        per_key = (
            li.select(F.col(key).alias("k"))
            .groupBy("k")
            .agg(F.count("*").alias("c"))
        )
        branch = per_key.agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_keys"),
            F.max("c").cast("long").alias("max_per_key"),
        ).select(
            F.lit(key).alias("key_col"),
            "n_rows",
            "n_keys",
            "max_per_key",
            F.expr(
                rat_round6_spark("n_rows", "n_keys")
            ).alias("avg_per_key"),
            F.expr(
                rat_round6_spark("max_per_key", "n_rows")
            ).alias("top1_share"),
            # envelope: max_per_key·n_keys·2e6 < 2^63 -> fine up to
            # ~4.6e12 row-key products; ANSI overflows loudly beyond
            F.expr(
                rat_round6_spark("max_per_key * n_keys", "n_rows")
            ).alias("skew_ratio"),
        )
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("key_col")


def _skew_oracle_one(key: str) -> str:
    return f"""
  SELECT '{key}' AS key_col,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_per_key,
         CAST(((SUM(c)) * 2000000 + (COUNT(*))) // (2 * (COUNT(*))) AS DOUBLE) / 1000000.0
           AS avg_per_key,
         CAST(((MAX(c)) * 2000000 + (SUM(c))) // (2 * (SUM(c))) AS DOUBLE) / 1000000.0
           AS top1_share,
         CAST(((MAX(c) * COUNT(*)) * 2000000 + (SUM(c))) // (2 * (SUM(c))) AS DOUBLE) / 1000000.0 AS skew_ratio
  FROM (SELECT {key} AS k, COUNT(*) AS c FROM lineitem GROUP BY 1)"""


ORACLE_KEY_SKEW = (
    "\nUNION ALL".join(_skew_oracle_one(k) for k in _SKEW_KEYS)
    + "\nORDER BY key_col"
)


# --------------------------------------------------------------------------
# TPC-H Q13: customer order-count distribution
# --------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of per-customer order counts —
    a LEFT OUTER join that must preserve zero-order customers, a first
    aggregation keyed on the customer, then a second aggregation over
    the counts themselves. (TPC-H filters on an o_comment regex; the
    fixture has no comment column, so the stand-in predicate excludes
    '1-URGENT' orders — same join-with-filtered-right shape.)

    The priority filter is applied to orders BEFORE the join (for a
    LEFT join with a right-side-only predicate this is equivalent to
    putting it in the ON clause, and it lets Catalyst push the filter
    into the parquet scan). Scale: one shuffle on the customer key for
    the join + first agg; the second agg's key space is the max order
    count per customer (tiny) — a broadcast-friendly final rollup.
    All outputs are counts: exact on any engine."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --------------------------------------------------------------------------
# Customer lifetime-value deciles (Lorenz table)
# --------------------------------------------------------------------------

def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-revenue DECILE / Lorenz table: every customer's
    total order value (exact cents), customers split into 10
    equal-frequency tiles (zero-spend customers included — the Lorenz
    curve is about the whole base), each decile reporting its customer
    count, revenue, revenue share and CUMULATIVE share — the
    concentration readout ("the top decile carries X% of revenue")
    that the per-nation Gini (agg_gini_by_nation) summarizes away.
    NTILE's ANSI fill rule + the (spend, custkey) total order make
    tile membership deterministic on both engines.

    Scale: one orders→customer-grain agg, one left join onto the
    customer dimension, one window over the CUSTOMER DIMENSION (key
    space orders of magnitude below the fact stream — the bounded
    global window class), then a 10-row rollup."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    spend = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).alias("cents")
        )
    )
    per_cust = cust.join(spend, "c_custkey", "left").select(
        "c_custkey", F.coalesce("cents", F.lit(0)).alias("cents")
    )
    w = W.orderBy("cents", "c_custkey")
    deciled = per_cust.select(
        "c_custkey", "cents", F.ntile(10).over(w).alias("decile")
    )
    agg = (
        deciled.groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
        .localCheckpoint(eager=True)  # 10 rows; feeds total + cumsum
    )
    tot = agg.agg(F.sum("rev_cents").alias("total_cents"))
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("cum_cents", F.sum("rev_cents").over(wc))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            "rev_cents",
            F.expr(rat_round6_spark("rev_cents", "total_cents")).alias(
                "rev_share_r6"
            ),
            F.expr(rat_round6_spark("cum_cents", "total_cents")).alias(
                "cum_share_r6"
            ),
        )
        .orderBy("decile")
    )


ORACLE_VALUE_DECILES = f"""
WITH spend AS (
  SELECT c_custkey, COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                      AS BIGINT)), 0) AS cents
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY 1),
d AS (
  SELECT c_custkey, cents,
         NTILE(10) OVER (ORDER BY cents, c_custkey) AS decile
  FROM spend),
a AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(cents) AS BIGINT) AS rev_cents
  FROM d GROUP BY 1),
t AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS total_cents FROM a),
c AS (
  SELECT decile, n_customers, rev_cents,
         CAST(SUM(rev_cents) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM a)
SELECT CAST(decile AS INT) AS decile, n_customers, rev_cents,
       {rat_round6_duck("rev_cents", "total_cents")} AS rev_share_r6,
       {rat_round6_duck("cum_cents", "total_cents")} AS cum_share_r6
FROM c, t ORDER BY decile
"""


# --------------------------------------------------------------------------
# Brown-Forsythe (Levene) variance-homogeneity test: price by brand
# --------------------------------------------------------------------------

def stats_levene_brand_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (the median-based Levene
    variant) of part retail price across brands — the assumption check
    that should precede the existing stats_anova_price_brand (ANOVA
    trusts equal variances; this tests them). Fixed-point recipe:
    prices land on the integer DOLLAR grid, each group's center is the
    exact lower median (rank (n+1) div 2 under the (x, partkey) total
    order), absolute deviations z are integers, group means of z are
    half-up at 2dp (c2 grid), and the F statistic
    B·(N−k) / (W·(k−1)) over the c2-grid sums is one final half-up —
    every intermediate an exact BIGINT (bounds documented through
    ~sf1). Emits one row: group count, N, the between/within sums (c4
    units) and F.

    Scale: one part-grain map, one brand-grain median (brand-bounded
    window partitions), two brand-bounded aggs — the dimension never
    exceeds the brand count."""
    parts = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.expr("cast(floor(p_retailprice + 0.5) as bigint)").alias("xd"),
    )
    wb = W.partitionBy("p_brand").orderBy("xd", "p_partkey")
    med = (
        parts.withColumn("rn", F.row_number().over(wb))
        .withColumn("n_i", F.count("*").over(W.partitionBy("p_brand")))
        .filter(F.col("rn") == F.expr("(n_i + 1) div 2"))
        .select("p_brand", F.col("xd").alias("med"))
    )
    z = parts.join(med, "p_brand").select(
        "p_brand", F.abs(F.col("xd") - F.col("med")).alias("z")
    )
    grp = (
        z.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_i"),
            F.sum("z").alias("zi"),
        )
        .select(
            "p_brand",
            "n_i",
            "zi",
            # group mean of z, half-up on the 2dp grid (c2 units)
            F.expr(
                "(zi * 200 + n_i) div (2 * n_i)"
            ).alias("mi_c2"),
        )
        .localCheckpoint(eager=True)  # brand-bounded; feeds B and W
    )
    gtot = grp.agg(
        F.count("*").alias("k"),
        F.sum("n_i").alias("n_total"),
        F.sum("zi").alias("z_total"),
    ).select(
        "k",
        "n_total",
        F.expr("(z_total * 200 + n_total) div (2 * n_total)").alias("m_c2"),
    )
    b_ss = (
        grp.crossJoin(F.broadcast(gtot))
        .agg(
            F.sum(
                F.expr("n_i * (mi_c2 - m_c2) * (mi_c2 - m_c2)")
            ).alias("b_c4"),
            F.max("k").alias("k"),
            F.max("n_total").alias("n_total"),
        )
    )
    w_ss = (
        z.join(grp.select("p_brand", "mi_c2"), "p_brand")
        .agg(
            F.sum(
                F.expr("(z * 100 - mi_c2) * (z * 100 - mi_c2)")
            ).alias("w_c4")
        )
    )
    return (
        b_ss.crossJoin(w_ss)
        .select(
            F.col("k").cast("int").alias("k_groups"),
            F.col("n_total").cast("long").alias("n_total"),
            F.col("b_c4").cast("long").alias("between_ss_c4"),
            F.col("w_c4").cast("long").alias("within_ss_c4"),
            F.expr(
                "case when w_c4 > 0 then "
                + qrem_round6_spark(
                    "b_c4 * (n_total - k)", "w_c4 * (k - 1)"
                )
                + " else cast(null as double) end"
            ).alias("f_stat_r6"),
        )
    )


ORACLE_LEVENE = f"""
WITH p AS (
  SELECT p_partkey, p_brand,
         CAST(FLOOR(p_retailprice + 0.5) AS BIGINT) AS xd
  FROM part),
med AS (
  SELECT p_brand, xd AS med FROM (
    SELECT p_brand, xd, p_partkey,
           ROW_NUMBER() OVER (PARTITION BY p_brand
                              ORDER BY xd, p_partkey) AS rn,
           COUNT(*) OVER (PARTITION BY p_brand) AS n_i
    FROM p)
  WHERE rn = (n_i + 1) // 2),
z AS (
  SELECT p.p_brand, abs(p.xd - med.med) AS z
  FROM p JOIN med USING (p_brand)),
grp AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_i,
         CAST(SUM(z) AS BIGINT) AS zi,
         (CAST(SUM(z) AS BIGINT) * 200 + COUNT(*)) // (2 * COUNT(*))
           AS mi_c2
  FROM z GROUP BY 1),
gt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_i) AS BIGINT) AS n_total,
         (CAST(SUM(zi) AS BIGINT) * 200 + CAST(SUM(n_i) AS BIGINT))
           // (2 * CAST(SUM(n_i) AS BIGINT)) AS m_c2
  FROM grp),
b AS (
  SELECT CAST(SUM(n_i * (mi_c2 - m_c2) * (mi_c2 - m_c2)) AS BIGINT)
           AS b_c4,
         MAX(k) AS k, MAX(n_total) AS n_total
  FROM grp, gt),
wss AS (
  SELECT CAST(SUM((z.z * 100 - grp.mi_c2) * (z.z * 100 - grp.mi_c2))
              AS BIGINT) AS w_c4
  FROM z JOIN grp USING (p_brand))
SELECT CAST(k AS INT) AS k_groups, n_total,
       b_c4 AS between_ss_c4, w_c4 AS within_ss_c4,
       CASE WHEN w_c4 > 0 THEN
         {qrem_round6_duck("b_c4 * (n_total - k)", "w_c4 * (k - 1)")}
       ELSE NULL END AS f_stat_r6
FROM b, wss
"""


# --------------------------------------------------------------------------
# Year-over-year monthly revenue growth
# --------------------------------------------------------------------------

def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth: exact monthly cents joined
    to the SAME month one year earlier, growth as a signed exact
    rational — the seasonal-adjusted trend readout (month-over-month
    mixes seasonality into the delta; YoY cancels it), complementary to
    orders_seasonal_index (the seasonal profile itself). Months with no
    prior-year twin are omitted (inner join) so every growth value is
    well-defined.

    Scale: one month-grain agg (bounded by the calendar) + one
    calendar-bounded self-join."""
    orders = _t(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mon"),
        )
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).alias("rev_cents")
        )
        .localCheckpoint(eager=True)  # calendar-bounded; feeds both sides
    )
    prev = monthly.select(
        (F.col("yr") + 1).alias("yr"),
        "mon",
        F.col("rev_cents").alias("prev_rev_cents"),
    )
    return (
        monthly.join(prev, ["yr", "mon"])
        .select(
            F.col("yr").cast("int").alias("yr"),
            F.col("mon").cast("int").alias("mon"),
            F.col("rev_cents").cast("long").alias("rev_cents"),
            F.col("prev_rev_cents").cast("long").alias("prev_rev_cents"),
            F.expr(
                rat_round6_signed_spark(
                    "rev_cents - prev_rev_cents", "prev_rev_cents"
                )
            ).alias("yoy_growth_r6"),
        )
        .orderBy("yr", "mon")
    )


ORACLE_YOY_GROWTH = f"""
WITH m AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         EXTRACT(month FROM o_orderdate) AS mon,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2)
SELECT CAST(cur.yr AS INT) AS yr, CAST(cur.mon AS INT) AS mon,
       cur.rev_cents, prev.rev_cents AS prev_rev_cents,
       {rat_round6_signed_duck(
           "cur.rev_cents - prev.rev_cents", "prev.rev_cents")}
         AS yoy_growth_r6
FROM m cur JOIN m prev
  ON cur.yr = prev.yr + 1 AND cur.mon = prev.mon
ORDER BY yr, mon
"""


# --------------------------------------------------------------------------
# Count-Min heavy-change detection between two time halves
# --------------------------------------------------------------------------

CMS_SPLIT_DATE = "1997-07-01"  # lineitem ship-date halves A (<) / B (>=)


def sketch_cms_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-CHANGE detection via two Count-Min sketches (the classic
    streaming drift primitive — Cormode & Muthukrishnan's
    what's-new/what's-hot query): part-key frequencies are sketched
    separately for the two ship-date halves with the SAME fixed
    md5-derived buckets as ``sketch_count_min_deterministic``, and the
    keys with the largest TRUE |Δcount| are probed against both
    sketches — reporting the estimated change an online monitor would
    see (collision overestimates included) next to the truth. Because
    the buckets are deterministic, every counter and estimate carries
    the full value hash.

    Scale: the two counter matrices are {CMS_D}×{CMS_W} each —
    constant-size state no matter the stream; one key-grain agg builds
    both halves' counters AND selects the probe set; probes ride a
    broadcast join."""

    def bucket(key_col: str, j_col: str) -> str:
        return (
            f"cast(conv(substring(md5(concat(cast({key_col} as string), "
            f"':cms:', cast({j_col} as string))), 1, 7), 16, 10) as bigint) "
            f"% {CMS_W}"
        )

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.when(
            F.col("l_shipdate")
            < F.lit(CMS_SPLIT_DATE).cast("timestamp_ntz"),
            F.lit("a"),
        )
        .otherwise(F.lit("b"))
        .alias("half"),
    )
    keys = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("half") == "a", 1).otherwise(0))
            .cast("long")
            .alias("true_a"),
            F.sum(F.when(F.col("half") == "b", 1).otherwise(0))
            .cast("long")
            .alias("true_b"),
        )
        .localCheckpoint(eager=True)  # key-grain; feeds counters + probe
    )
    fan = keys.select(
        "l_partkey",
        "true_a",
        "true_b",
        F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("j"),
    ).withColumn("bkt", F.expr(bucket("l_partkey", "j")))
    counters = fan.groupBy("j", "bkt").agg(
        F.sum("true_a").cast("long").alias("cnt_a"),
        F.sum("true_b").cast("long").alias("cnt_b"),
    )
    probe = (
        keys.orderBy(
            F.desc(F.abs(F.col("true_a") - F.col("true_b"))),
            F.asc("l_partkey"),
        )
        .limit(CMS_TOP)
        .select(
            "l_partkey",
            "true_a",
            "true_b",
            F.explode(F.expr(f"sequence(0, {CMS_D - 1})")).alias("j"),
        )
        .withColumn("bkt", F.expr(bucket("l_partkey", "j")))
    )
    return (
        probe.join(F.broadcast(counters), ["j", "bkt"])
        .groupBy("l_partkey", "true_a", "true_b")
        .agg(
            F.min("cnt_a").cast("long").alias("cms_a"),
            F.min("cnt_b").cast("long").alias("cms_b"),
        )
        .select(
            "l_partkey",
            "true_a",
            "true_b",
            "cms_a",
            "cms_b",
            F.abs(F.col("cms_a") - F.col("cms_b"))
            .cast("long")
            .alias("est_change"),
            F.abs(F.col("true_a") - F.col("true_b"))
            .cast("long")
            .alias("true_change"),
        )
        .orderBy("l_partkey")
    )


ORACLE_CMS_HEAVY_CHANGE = f"""
WITH keys AS (
  SELECT l_partkey,
         CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '{CMS_SPLIT_DATE}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS true_a,
         CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '{CMS_SPLIT_DATE}'
                       THEN 0 ELSE 1 END) AS BIGINT) AS true_b
  FROM lineitem GROUP BY 1),
js AS (SELECT unnest(range({CMS_D})) AS j),
counters AS (
  SELECT j,
         CAST(('0x' || SUBSTRING(md5(CAST(l_partkey AS VARCHAR) || ':cms:'
                  || CAST(j AS VARCHAR)), 1, 7)) AS BIGINT) % {CMS_W} AS bkt,
         CAST(SUM(true_a) AS BIGINT) AS cnt_a,
         CAST(SUM(true_b) AS BIGINT) AS cnt_b
  FROM keys CROSS JOIN js GROUP BY 1, 2),
probe AS (
  SELECT l_partkey, true_a, true_b FROM keys
  ORDER BY abs(true_a - true_b) DESC, l_partkey LIMIT {CMS_TOP}),
pj AS (
  SELECT p.l_partkey, p.true_a, p.true_b, j.j,
         CAST(('0x' || SUBSTRING(md5(CAST(p.l_partkey AS VARCHAR) || ':cms:'
                  || CAST(j.j AS VARCHAR)), 1, 7)) AS BIGINT) % {CMS_W} AS bkt
  FROM probe p CROSS JOIN js j)
SELECT pj.l_partkey, pj.true_a, pj.true_b,
       CAST(MIN(c.cnt_a) AS BIGINT) AS cms_a,
       CAST(MIN(c.cnt_b) AS BIGINT) AS cms_b,
       CAST(abs(MIN(c.cnt_a) - MIN(c.cnt_b)) AS BIGINT) AS est_change,
       CAST(abs(pj.true_a - pj.true_b) AS BIGINT) AS true_change
FROM pj JOIN counters c ON pj.j = c.j AND pj.bkt = c.bkt
GROUP BY 1, 2, 3 ORDER BY 1
"""


# --------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with union merge
# --------------------------------------------------------------------------

KMV_K = 32
KMV_HEX = 13  # 52-bit hash keeps (k-1)*2^52 far inside BIGINT


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) distinct sketch per
    document source, with a genuine SKETCH-MERGE '__ALL__' row: the
    union sketch is computed from the per-source k-min POOLS (at most
    sources×{KMV_K} hashes), never from raw data — the same
    constant-exchange re-aggregation story as the HLL ladder, but for
    the sketch family DataSketches calls theta, which additionally
    supports intersections. Estimator: with the k-th smallest of a
    52-bit md5 hash at h_k, distinct ≈ (k−1)·2^52 / h_k; when a group
    has fewer than {KMV_K} distinct hashes the sketch IS the exact
    distinct count. All integers → full value hash.

    Scale: per-source k-mins run as a two-stage bounded top-k (a
    64-salt local cut, then the per-source cut on ≤ 64·{KMV_K} rows per
    source) — no corpus-sized window partition; the merge input is
    sketch-sized by construction."""
    docs = catalog.load(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        F.expr(
            f"cast(conv(substring(md5(text), 1, {KMV_HEX}), 16, 10)"
            " as bigint)"
        ).alias("h"),
    ).distinct()
    # stage 1: salt-local k-min (bounds every window partition)
    w1 = W.partitionBy("source", F.expr("h % 64")).orderBy("h")
    pool = (
        h.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
        .localCheckpoint(eager=True)  # sketch pools; feed source + merge
    )
    w2 = W.partitionBy("source").orderBy("h")
    per_src = (
        pool.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("source")
        .agg(
            F.count("*").alias("k_used"),
            F.max("h").alias("kth_hash"),
        )
    )
    # union merge from the pools (distinct hashes across sources)
    wall = W.orderBy("h")
    merged = (
        pool.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(wall))
        .filter(F.col("rn") <= KMV_K)
        .agg(
            F.lit("__ALL__").alias("source"),
            F.count("*").alias("k_used"),
            F.max("h").alias("kth_hash"),
        )
    )
    est = (
        f"case when k_used < {KMV_K} then k_used else "
        f"cast({KMV_K - 1} as bigint) * {1 << (4 * KMV_HEX)} div kth_hash"
        " end"
    )
    return (
        per_src.unionByName(merged)
        .select(
            "source",
            F.col("k_used").cast("long").alias("k_used"),
            F.col("kth_hash").cast("long").alias("kth_hash"),
            F.expr(est).cast("long").alias("est_distinct"),
        )
        .orderBy("source")
    )


ORACLE_KMV = f"""
WITH h AS (
  SELECT DISTINCT source,
         CAST(('0x' || substring(md5(text), 1, {KMV_HEX})) AS BIGINT) AS h
  FROM documents),
ps AS (
  SELECT source, COUNT(*) AS k_used, MAX(h) AS kth_hash FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM h) WHERE rn <= {KMV_K} GROUP BY 1),
mg AS (
  SELECT '__ALL__' AS source, COUNT(*) AS k_used, MAX(h) AS kth_hash
  FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM h)) WHERE rn <= {KMV_K}),
a AS (SELECT * FROM ps UNION ALL SELECT * FROM mg)
SELECT source, CAST(k_used AS BIGINT) AS k_used,
       CAST(kth_hash AS BIGINT) AS kth_hash,
       CAST(CASE WHEN k_used < {KMV_K} THEN k_used
                 ELSE CAST({KMV_K - 1} AS BIGINT)
                      * {1 << (4 * KMV_HEX)} // kth_hash
            END AS BIGINT) AS est_distinct
FROM a ORDER BY source
"""


# --------------------------------------------------------------------------
# Weekday seasonality index
# --------------------------------------------------------------------------

def orders_weekday_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index: revenue and order-count share per ISO
    day-of-week against the uniform 1/7 baseline (index = 7·share) —
    the day-grain companion to the monthly ``orders_seasonal_index``,
    the calendar shape capacity planning and anomaly baselines divide
    by. ISO numbering is the one dow convention both engines agree on
    exactly (Spark ``weekday()+1`` == DuckDB ``isodow``; the default
    ``dayofweek`` functions disagree by an off-by-one).

    Scale: one map + a 7-row agg; the index math is exact cents."""
    orders = _t(spark, sf_dir, "orders")
    d = (
        orders.groupBy(
            (F.expr("weekday(o_orderdate)") + 1).alias("dow_iso")
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).alias("rev_cents"),
        )
        .localCheckpoint(eager=True)  # 7 rows; feeds totals + shares
    )
    tot = d.agg(
        F.sum("n_orders").alias("n_total"),
        F.sum("rev_cents").alias("rev_total"),
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow_iso").cast("int").alias("dow_iso"),
            "n_orders",
            F.col("rev_cents").cast("long").alias("rev_cents"),
            F.expr(rat_round6_spark("rev_cents", "rev_total")).alias(
                "rev_share_r6"
            ),
            F.expr(rat_round6_spark("7 * rev_cents", "rev_total")).alias(
                "rev_index_r6"
            ),
            F.expr(rat_round6_spark("7 * n_orders", "n_total")).alias(
                "count_index_r6"
            ),
        )
        .orderBy("dow_iso")
    )


ORACLE_WEEKDAY_INDEX = f"""
WITH d AS (
  SELECT isodow(o_orderdate) AS dow_iso,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1),
t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total,
             CAST(SUM(rev_cents) AS BIGINT) AS rev_total FROM d)
SELECT CAST(dow_iso AS INT) AS dow_iso, n_orders, rev_cents,
       {rat_round6_duck("rev_cents", "rev_total")} AS rev_share_r6,
       {rat_round6_duck("7 * rev_cents", "rev_total")} AS rev_index_r6,
       {rat_round6_duck("7 * n_orders", "n_total")} AS count_index_r6
FROM d, t ORDER BY dow_iso
"""


SPECS = [
    QuerySpec("orders_weekday_index", orders_weekday_index,
              ORACLE_WEEKDAY_INDEX, ("agg", "calendar"),
              doc="ISO day-of-week revenue/count seasonality indices "
                  "vs the uniform 1/7 baseline, exact cents"),
    QuerySpec("customer_value_deciles", customer_value_deciles,
              ORACLE_VALUE_DECILES, ("window", "stats", "dba"),
              doc="customer lifetime-revenue decile / Lorenz table "
                  "(exact cents, cumulative shares)"),
    QuerySpec("stats_levene_brand_price", stats_levene_brand_price,
              ORACLE_LEVENE, ("stats",),
              doc="Brown-Forsythe variance-homogeneity F over brands "
                  "(dollar grid, exact lower medians, c2-grid means)"),
    QuerySpec("orders_yoy_growth", orders_yoy_growth,
              ORACLE_YOY_GROWTH, ("agg", "calendar"),
              doc="year-over-year monthly revenue growth, signed exact "
                  "rational on cents"),
    QuerySpec("sketch_cms_heavy_change", sketch_cms_heavy_change,
              ORACLE_CMS_HEAVY_CHANGE, ("sketch", "drift"),
              doc="Count-Min heavy-change detection between ship-date "
                  "halves (deterministic buckets, full oracle)"),
    QuerySpec("sketch_kmv_distinct", sketch_kmv_distinct,
              ORACLE_KMV, ("sketch", "rollup"),
              doc="KMV / bottom-k theta distinct sketch per source with "
                  "a pool-merged union row (re-aggregatable)"),
    QuerySpec("q01_pricing_summary", q01_pricing_summary, ORACLE_Q01,
              ("agg", "tpch"), bench=True, doc="TPC-H Q1-shaped flagship"),
    QuerySpec("q02_scan_filter_project", q02_scan_filter_project, ORACLE_Q02,
              ("scan",), bench=True),
    QuerySpec("q03_shipping_priority", q03_shipping_priority, ORACLE_Q03,
              ("join", "tpch"), bench=True),
    QuerySpec("q04_order_priority", q04_order_priority, ORACLE_Q04,
              ("join", "semi", "tpch")),
    QuerySpec("q05_local_supplier_volume", q05_local_supplier_volume, ORACLE_Q05,
              ("join", "tpch"), bench=True),
    QuerySpec("q06_forecast_revenue", q06_forecast_revenue, ORACLE_Q06,
              ("scan", "agg", "tpch")),
    QuerySpec("q07_volume_shipping", q07_volume_shipping, ORACLE_Q07,
              ("join", "tpch")),
    QuerySpec("q14_promo_revenue", q14_promo_revenue, ORACLE_Q14,
              ("join", "agg", "tpch")),
    QuerySpec("q13_customer_distribution", q13_customer_distribution,
              ORACLE_Q13, ("join", "agg", "tpch"),
              doc="TPC-H Q13: per-customer order-count distribution "
                  "(zero-preserving left outer join + two-level "
                  "aggregation, filter pushed to the orders scan)"),
    QuerySpec("q10_returned_item", q10_returned_item, ORACLE_Q10,
              ("join", "tpch"), bench=True),
    QuerySpec("join_left_outer", join_left_outer, ORACLE_JOIN_LEFT, ("join",)),
    QuerySpec("join_full_outer", join_full_outer, ORACLE_JOIN_FULL, ("join",)),
    QuerySpec("join_semi", join_semi, ORACLE_JOIN_SEMI, ("join",)),
    QuerySpec("join_anti", join_anti, ORACLE_JOIN_ANTI, ("join",)),
    QuerySpec("join_broadcast_dim", join_broadcast_dim, ORACLE_JOIN_BCAST,
              ("join",), bench=True),
    QuerySpec("join_range_bands", join_range_bands, ORACLE_JOIN_RANGE,
              ("join", "nonequi")),
    QuerySpec("agg_distinct", agg_distinct, ORACLE_AGG_DISTINCT, ("agg",),
              bench=True),
    QuerySpec("agg_stats", agg_stats, ORACLE_AGG_STATS, ("agg",)),
    QuerySpec("agg_rollup", agg_rollup, ORACLE_AGG_ROLLUP, ("agg",)),
    QuerySpec("agg_grouping_id", agg_grouping_id, ORACLE_GROUPING_ID,
              ("agg",),
              doc="GROUPING() subtotal indicators on rollup"),
    QuerySpec("agg_cube", agg_cube, ORACLE_AGG_CUBE, ("agg",)),
    QuerySpec("agg_grouping_sets", agg_grouping_sets, ORACLE_AGG_GSETS, ("agg",)),
    QuerySpec("agg_having", agg_having, ORACLE_AGG_HAVING, ("agg",)),
    QuerySpec("agg_approx_distinct", agg_approx_distinct,
              ORACLE_APPROX_DISTINCT, ("agg", "sketch"),
              doc="approx_count_distinct HLL++ with a full-oracle 5-rsd "
                  "error-band certificate (register-max merge makes the "
                  "estimate merge-order independent, so the band verdict "
                  "is deterministic given the data; raw-estimate "
                  "closeness stays gated by test_approx_distinct_"
                  "close_to_exact)"),
    QuerySpec("window_topk_per_group", window_topk_per_group, ORACLE_WIN_TOPK,
              ("window",), bench=True),
    QuerySpec("window_topk_with_ties", window_topk_with_ties,
              ORACLE_WIN_TOPK_TIES, ("window",),
              doc="top-3 per nation WITH TIES (RANK semantics over "
                  "exact integer bands — the ANSI FETCH ... WITH TIES "
                  "surface row_number cuts get wrong)"),
    QuerySpec("window_running_sum", window_running_sum, ORACLE_WIN_RUNNING,
              ("window",)),
    QuerySpec("window_lag_lead", window_lag_lead, ORACLE_WIN_LAGLEAD, ("window",)),
    QuerySpec("window_moving_avg", window_moving_avg, ORACLE_WIN_MAVG, ("window",)),
    QuerySpec("window_rank_dist", window_rank_dist, ORACLE_WIN_RANKDIST,
              ("window",)),
    QuerySpec("topk_global", topk_global, ORACLE_TOPK, ("sort",)),
    QuerySpec("set_union", set_union, ORACLE_SET_UNION, ("setop",)),
    QuerySpec("set_intersect", set_intersect, ORACLE_SET_INTERSECT, ("setop",)),
    QuerySpec("set_except", set_except, ORACLE_SET_EXCEPT, ("setop",)),
    QuerySpec("scalar_string", scalar_string, ORACLE_SCALAR_STRING, ("scalar",)),
    QuerySpec("scalar_date", scalar_date, ORACLE_SCALAR_DATE, ("scalar",)),
    QuerySpec("scalar_math", scalar_math, ORACLE_SCALAR_MATH, ("scalar",)),
    QuerySpec("scalar_conditional", scalar_conditional, ORACLE_SCALAR_COND,
              ("scalar",)),
    QuerySpec("json_extract_events", json_extract_events, ORACLE_JSON,
              ("scalar", "json"), bench=True),
    QuerySpec("in_subquery", in_subquery, ORACLE_IN_SUBQ, ("subquery",)),
    QuerySpec("correlated_scalar_subquery", correlated_scalar_subquery,
              ORACLE_CORR_SUBQ, ("subquery",)),
    QuerySpec("pivot_status", pivot_status, ORACLE_PIVOT, ("agg", "pivot")),
    QuerySpec("agg_percentiles", agg_percentiles, ORACLE_PERCENTILES,
              ("agg", "percentile")),
    QuerySpec("lateral_posexplode", lateral_posexplode, ORACLE_LATERAL,
              ("lateral", "udtf")),
    QuerySpec("scalar_regexp", scalar_regexp, ORACLE_REGEXP, ("scalar",)),
    QuerySpec("scalar_array_ops", scalar_array_ops, ORACLE_ARRAY_OPS,
              ("scalar", "array")),
    QuerySpec("set_ops_bag", set_ops_bag, ORACLE_SET_BAG, ("setop",)),
    QuerySpec("agg_corr_stats", agg_corr_stats, ORACLE_CORR,
              ("agg", "stats")),
    QuerySpec("join_cross_small", join_cross_small, ORACLE_CROSS,
              ("join", "cross")),
    QuerySpec("exists_sole_returner", exists_sole_returner,
              ORACLE_EXISTS_SOLE, ("subquery", "exists", "tpch"),
              doc="TPC-H Q21-shaped correlated EXISTS/NOT-EXISTS"),
    QuerySpec("not_exists_idle_customers", not_exists_idle_customers,
              ORACLE_NOT_EXISTS_IDLE, ("subquery", "exists", "tpch"),
              doc="TPC-H Q22-shaped NOT EXISTS + substring IN + scalar avg"),
    QuerySpec("outer_join_count_dist", outer_join_count_dist,
              ORACLE_OUTER_COUNT_DIST, ("join", "agg", "tpch"),
              doc="TPC-H Q13-shaped outer-join count distribution"),
    QuerySpec("q17_small_quantity_revenue", q17_small_quantity_revenue,
              ORACLE_Q17, ("agg", "subquery", "tpch"),
              doc="TPC-H Q17-shaped correlated-avg threshold"),
    QuerySpec("q18_large_orders", q18_large_orders, ORACLE_Q18,
              ("agg", "join", "tpch"),
              doc="TPC-H Q18-shaped HAVING + join-back"),
    QuerySpec("q19_disjunctive_revenue", q19_disjunctive_revenue, ORACLE_Q19,
              ("join", "scan", "tpch"),
              doc="TPC-H Q19-shaped OR-of-ANDs predicate"),
    QuerySpec("window_value_frames", window_value_frames,
              ORACLE_WIN_VALUE_FRAMES, ("window",),
              doc="first/last/nth_value + sliding min/max frames"),
    QuerySpec("q08_market_share", q08_market_share, ORACLE_Q08,
              ("agg", "join", "tpch"),
              doc="TPC-H Q8-shaped national market share"),
    QuerySpec("q15_top_supplier", q15_top_supplier, ORACLE_Q15,
              ("agg", "subquery", "tpch"),
              doc="TPC-H Q15-shaped scalar-max revenue view"),
    QuerySpec("q16_supplier_part_counts", q16_supplier_part_counts,
              ORACLE_Q16, ("agg", "join", "subquery", "tpch"),
              doc="TPC-H Q16-shaped NOT-IN + count-distinct"),
    QuerySpec("q12_late_shipments", q12_late_shipments, ORACLE_Q12,
              ("agg", "join", "tpch"),
              doc="TPC-H Q12-shaped conditional case-sum"),
    QuerySpec("q09_product_type_profit", q09_product_type_profit, ORACLE_Q09,
              ("agg", "join", "tpch"),
              doc="TPC-H Q9-shaped profit by nation/year, expression group key"),
    QuerySpec("q11_important_parts", q11_important_parts, ORACLE_Q11,
              ("agg", "subquery", "tpch"),
              doc="TPC-H Q11-shaped HAVING vs scalar subquery of same agg"),
    QuerySpec("q21_waiting_supplier_adapted", q21_waiting_supplier_adapted,
              ORACLE_Q21_ADAPTED, ("tpch", "subquery"),
              doc="TPC-H Q21 adapted to the fixture (no commit/receipt "
                  "dates): sole-latest-shipper in finished multi-supplier "
                  "orders — preserves the EXISTS/NOT-EXISTS fact "
                  "self-join shape"),
    QuerySpec("q22_dormant_value_adapted", q22_dormant_value_adapted,
              ORACLE_Q22_ADAPTED, ("tpch", "subquery"),
              doc="TPC-H Q22 adapted (no c_phone): above-average-balance "
                  "customers dormant since 2000 per nation; exact "
                  "cross-multiplied threshold, anti-join"),
    QuerySpec("q20_qualified_suppliers", q20_qualified_suppliers, ORACLE_Q20,
              ("join", "semi", "subquery", "tpch"),
              doc="TPC-H Q20-shaped chained semi-joins"),
    QuerySpec("agg_bitwise", agg_bitwise, ORACLE_BITWISE,
              ("agg", "scalar"),
              doc="BIT_AND/OR/XOR aggregates + popcount + shift/mask scalars"),
    QuerySpec("recursive_month_spine", recursive_month_spine,
              ORACLE_RECURSIVE_SPINE, ("recursive", "agg"),
              doc="WITH RECURSIVE date spine + gap-filled monthly revenue"),
    QuerySpec("scalar_variant_json", scalar_variant_json, ORACLE_VARIANT,
              ("scalar", "json", "variant"),
              doc="VARIANT parse_json/variant_get typed extraction"),
    QuerySpec("fuzzy_match_blocked", fuzzy_match_blocked, ORACLE_FUZZY,
              ("join", "text", "fuzzy"),
              doc="blocked levenshtein entity resolution on the name "
                  "dictionary"),
    QuerySpec("sketch_count_min_deterministic",
              sketch_count_min_deterministic, ORACLE_COUNT_MIN,
              ("sketch", "agg"),
              doc="count-min sketch with FIXED md5 bucket functions -> "
                  "fully deterministic, full value-hash oracle; top-20 "
                  "heavy keys probed for estimate + collision "
                  "overestimate (two-pass bounded counter matrix)"),
    QuerySpec("sketch_top_k_heavy_hitters", sketch_top_k_heavy_hitters,
              ORACLE_TOP_K_HEAVY, ("agg", "sketch"),
              doc="fixed-hash CMS-ranked heavy hitters (deterministic "
                  "mirror of the engine approx_top_k sketch -> full "
                  "value-hash oracle; est >= exact by the CMS "
                  "guarantee, 2%-tolerance pytest-gated)"),
    QuerySpec("agg_approx_percentiles", agg_approx_percentiles,
              ORACLE_APPROX_PERCENTILES, ("agg", "sketch", "percentile"),
              doc="percentile_approx GK sketch per group with a full-"
                  "oracle THEOREM-BACKED rank certificate (the returned "
                  "value's exact rank interval must hit the ±n/accuracy "
                  "GK window — deterministic even though the GK summary "
                  "itself is merge-order dependent; raw-estimate "
                  "closeness stays gated by test_approx_percentiles_"
                  "close_to_exact)"),
    QuerySpec("unpivot_metrics", unpivot_metrics, ORACLE_UNPIVOT,
              ("reshape", "agg"),
              doc="unpivot/melt wide measures → long + per-metric agg"),
    QuerySpec("agg_string_concat", agg_string_concat, ORACLE_STRING_CONCAT,
              ("agg", "scalar"),
              doc="deterministic ordered LISTAGG/STRING_AGG"),
    QuerySpec("agg_mode_manual", agg_mode_manual, ORACLE_MODE,
              ("agg", "window"),
              doc="deterministic MODE with explicit tie-break"),
    QuerySpec("agg_bool_predicates", agg_bool_predicates, ORACLE_BOOL_AGG,
              ("agg",),
              doc="COUNT_IF / EVERY / ANY boolean aggregates"),
    QuerySpec("scalar_map_ops", scalar_map_ops, ORACLE_MAP_OPS,
              ("scalar", "agg"),
              doc="map_from_entries / element_at / map_values surface"),
    QuerySpec("window_range_value", window_range_value,
              ORACLE_WIN_RANGE_VALUE, ("window",),
              doc="RANGE frame over a numeric ordering (±1000 price)"),
    QuerySpec("window_ntile_deciles", window_ntile_deciles, ORACLE_NTILE,
              ("window",),
              doc="NTILE equal-frequency binning + per-decile stats"),
    QuerySpec("join_null_safe_eq", join_null_safe_eq, ORACLE_NULL_SAFE_JOIN,
              ("join", "nullsafe"),
              doc="<=> / IS NOT DISTINCT FROM null-safe equi-join"),
    QuerySpec("agg_histogram_bins", agg_histogram_bins, ORACLE_HISTOGRAM,
              ("agg", "histogram"),
              doc="width_bucket fixed-width distributed histogram"),
    QuerySpec("scalar_try_arith", scalar_try_arith, ORACLE_TRY_ARITH,
              ("scalar", "ansi"),
              doc="try_divide/try_cast/try_add poison-row-safe arithmetic"),
    QuerySpec("agg_median_abs_deviation", agg_median_abs_deviation,
              ORACLE_MAD, ("agg", "stats", "robust"),
              doc="median absolute deviation (robust dispersion) per group"),
    QuerySpec("sketch_hll_registers", sketch_hll_registers,
              ORACLE_HLL_REGISTERS, ("agg", "sketch", "rollup"),
              doc="deterministic-register HLL (md5 60-bit hash, 64 "
                  "registers, bin()-string rank): dense per-source "
                  "register arrays + exact harmonic terms, with "
                  "'__ALL__' proving merge = per-bucket MAX; the "
                  "full-oracle twin of sketch_hll_reaggregate"),
    QuerySpec("sketch_hll_reaggregate", sketch_hll_reaggregate,
              ORACLE_HLL_REAGG, ("agg", "sketch", "rollup"),
              doc="deterministic HLL sketch REAGGREGATION ladder "
                  "(source x lang -> source -> __ALL__, per-bucket MAX "
                  "merge) with integer harmonic sums + raw-estimator "
                  "micro readout — upgraded from rows-only per VERDICT "
                  "r10 #4 (sketch_hll_registers precedent); the "
                  "engine-native DataSketches union path stays pinned "
                  "in test_hll_reaggregate_matches_exact"),
    QuerySpec("profile_table", profile_table, ORACLE_PROFILE,
              ("agg", "profiling", "dba"),
              doc="one-pass per-column table profile (nulls, distincts, "
                  "min/max) unpivoted to a column-per-row report"),
    QuerySpec("agg_winsorized_mean", agg_winsorized_mean, ORACLE_WINSORIZED,
              ("agg", "stats", "robust", "percentile"),
              doc="winsorized mean per group (clamp at exact p05/p95, "
                  "then average)"),
    QuerySpec("set_union_by_name", set_union_by_name, ORACLE_UNION_BY_NAME,
              ("setop", "schema-evolution"),
              doc="unionByName across differently-ordered projections "
                  "(schema-evolution append)"),
    QuerySpec("audit_referential_integrity", audit_referential_integrity,
              ORACLE_RI, ("audit", "dba", "join"),
              doc="FK orphan audit across the star schema (6 anti-join "
                  "relationship checks in one report)"),
    QuerySpec("audit_primary_keys", audit_primary_keys, ORACLE_PK,
              ("audit", "dba", "agg"),
              doc="PK uniqueness/null audit across 7 tables in one "
                  "unioned report"),
    QuerySpec("orders_interarrival", orders_interarrival,
              ORACLE_INTERARRIVAL, ("temporal", "window", "stats"),
              doc="inter-order gap stats per market segment (LAG pairing, "
                  "tz-free epoch-day axis)"),
    QuerySpec("sample_exact_k", sample_exact_k, ORACLE_SAMPLE_K,
              ("sample", "pipeline"),
              doc="deterministic exact-K global sample by md5 rank "
                  "(TakeOrderedAndProject, no global sort)"),
    QuerySpec("stats_chi2_lang_source", stats_chi2_lang_source, ORACLE_CHI2,
              ("agg", "stats", "audit"),
              doc="chi-square independence contingency audit "
                  "(lang × source observed/expected/contribution)"),
    QuerySpec("audit_benford_amounts", audit_benford_amounts, ORACLE_BENFORD,
              ("audit", "dba", "stats"),
              doc="Benford first-significant-digit screen on order "
                  "totals (numeric digit extraction, no string render)"),
    QuerySpec("ev_monotonic_streaks", ev_monotonic_streaks, ORACLE_STREAKS,
              ("temporal", "window", "sequence"),
              doc="longest strictly-increasing value run per user "
                  "(gaps-and-islands on runs)"),
    QuerySpec("skyline_price_size", skyline_price_size, ORACLE_SKYLINE,
              ("join", "skyline", "dominance"),
              doc="Pareto skyline on (price↓, size↑): per-size min + "
                  "monotone window == quadratic NOT EXISTS oracle"),
    QuerySpec("basket_brand_pairs", basket_brand_pairs, ORACLE_BASKET,
              ("join", "agg", "basket"),
              doc="market-basket brand-pair support counts, top-K with "
                  "total-order tie-break"),
    QuerySpec("audit_line_contiguity", audit_line_contiguity,
              ORACLE_LINE_CONTIG, ("audit", "dba", "agg"),
              doc="dense-sequence audit: line numbers exactly 1..n per "
                  "order via the min/max/count identity, no sort"),
    QuerySpec("abc_analysis_parts", abc_analysis_parts, ORACLE_ABC,
              ("agg", "window", "pareto", "dba"),
              doc="ABC/Pareto revenue classification (exact decimal "
                  "cumulative cut via cross-multiplication)"),
    QuerySpec("er_entity_clusters", er_entity_clusters, ORACLE_ER_CLUSTERS,
              ("join", "fuzzy", "graph", "er"),
              doc="entity resolution end-to-end: fuzzy pairs -> "
                  "transitive closure -> canonical entities + counts"),
    QuerySpec("merge_into_semantics", merge_into_semantics, ORACLE_MERGE,
              ("join", "merge", "cdc"),
              doc="MERGE INTO as a batch plan: conditional update/delete/"
                  "insert via full outer join, decimal-free BIGINT-cents "
                  "money math (IEEE floor-quantization both engines)"),
    QuerySpec("merge_diag_actions", merge_diag_actions,
              ORACLE_MERGE_DIAG_ACTIONS, ("join", "merge", "diagnostic"),
              doc="merge bisection twin 1/3: classification only (join + "
                  "action CASE + churn filter), zero money math"),
    QuerySpec("merge_diag_revenue_cents", merge_diag_revenue_cents,
              ORACLE_MERGE_DIAG_REVENUE, ("agg", "merge", "diagnostic"),
              doc="merge bisection twin 2/3: o_totalprice IEEE floor-"
                  "quantization + BIGINT-cents sum + half-up delta"),
    QuerySpec("merge_diag_acctbal_cents", merge_diag_acctbal_cents,
              ORACLE_MERGE_DIAG_ACCTBAL, ("scan", "merge", "diagnostic"),
              doc="merge bisection twin 3/3: signed c_acctbal IEEE floor-"
                  "quantization to BIGINT cents"),
    QuerySpec("join_bloom_prefilter", join_bloom_prefilter,
              ORACLE_BLOOM_JOIN, ("join", "bloom", "runtime-filter"),
              doc="semi-join reduction: bloom runtime filter on the join "
                  "key prunes the fact side in codegen == plain join"),
    QuerySpec("nested_order_lines", nested_order_lines, ORACLE_NESTED_LINES,
              ("agg", "nested", "denormalize"),
              doc="order -> sorted nested line array (collect_list + "
                  "struct sort), md5-canonicalized surface"),
    QuerySpec("rfm_segmentation", rfm_segmentation, ORACLE_RFM,
              ("agg", "window", "segmentation", "dba"),
              doc="RFM quintile segmentation (dimension-bounded NTILE "
                  "ranks after one fact-keyed exact-decimal aggregate)"),
    QuerySpec("agg_weighted_median", agg_weighted_median, ORACLE_WMEDIAN,
              ("agg", "window", "percentile", "weighted"),
              doc="exact quantity-weighted median price per part "
                  "(part-keyed running-sum ladder, decimal "
                  "cross-multiplied half-mass cut)"),
    QuerySpec("join_skew_salted", join_skew_salted, ORACLE_SKEW_JOIN,
              ("join", "agg", "skew", "salting"),
              doc="hot-key fact join + agg fully salted (salted_join + "
                  "two-stage salted_agg, no exchange on the hot column) "
                  "== plain join+agg"),
    QuerySpec("orders_hhi_concentration", orders_hhi_concentration,
              ORACLE_HHI, ("agg", "join", "stats", "dba"),
              doc="Herfindahl supplier-concentration index per nation "
                  "(12dp-rounded share-squared contributions in exact "
                  "decimal)"),
    QuerySpec("customer_gap_survival", customer_gap_survival,
              ORACLE_GAP_SURVIVAL, ("window", "stats", "churn"),
              doc="inter-order gap survival curve over a 6-row "
                  "broadcast threshold table (integer-exact counts)"),
    QuerySpec("agg_gini_by_nation", agg_gini_by_nation, ORACLE_GINI,
              ("agg", "window", "stats", "inequality"),
              doc="Gini coefficient of customer revenue per nation "
                  "(rank formula over exact-decimal totals, "
                  "dimension-bounded ranking)"),
    QuerySpec("orders_otif_rate", orders_otif_rate, ORACLE_OTIF,
              ("agg", "join", "kpi", "dba"),
              doc="on-time-in-full fulfilment rate per priority "
                  "(order-grain last-ship predicate, integer-exact)"),
    QuerySpec("basket_type_lift", basket_type_lift, ORACLE_BASKET_LIFT,
              ("join", "agg", "association", "basket"),
              doc="support/confidence/LIFT per part-type pair "
                  "(basket-width-bounded pair fan-out, broadcast type "
                  "totals, integer counts end-to-end)"),
    QuerySpec("elasticity_discount_qty", elasticity_discount_qty,
              ORACLE_ELASTICITY, ("agg", "join", "stats", "pricing"),
              doc="per-brand discount-quantity correlation + low/high "
                  "discount exact-decimal mean volumes (one brand-keyed "
                  "aggregate)"),
    QuerySpec("agg_exact_global_median", agg_exact_global_median,
              ORACLE_EXACT_MEDIAN, ("agg", "percentile", "selection"),
              doc="exact global median/p90/p99 by two-pass distributed "
                  "selection (bucket count scales with n: the histogram "
                  "locates every quantile's bucket and only ~2^20 rows "
                  "per quantile ever sort) == brute ROW_NUMBER oracle"),
    QuerySpec("part_supply_redundancy", part_supply_redundancy,
              ORACLE_SUPPLY_REDUNDANCY, ("agg", "audit", "dba"),
              doc="supplier-count distribution per part + single-source "
                  "share (procurement-risk audit, one dedup + rollup)"),
    QuerySpec("orders_brand_rank_shift", orders_brand_rank_shift,
              ORACLE_BRAND_RANK_SHIFT, ("window", "agg", "ranking"),
              doc="month-over-month brand league-table movers (exact "
                  "decimal revenue ranks, LAG along observed months, "
                  "catalog-x-calendar windows)"),
    QuerySpec("audit_key_skew", audit_key_skew, ORACLE_KEY_SKEW,
              ("audit", "dba", "skew"),
              doc="shuffle-key skew report over the fact join keys "
                  "(hottest-key share + skew ratio — the broadcast/"
                  "salt/AQE planning input)"),
]
