"""TPC-H-shaped headline queries (A1 + multi-way joins) — the bench workload.

All 22 classic queries, adapted to the driver testdata's column subset
(orders lacks shippriority; dates are timestamps; q2/q9/q11/q16/q20 run
over a deterministic derived partsupp — see ``derived_partsupp``). The
driver-declared subset is what ``bench.py`` times at sf0.1: scan-heavy
aggregation (q1, q6) and shuffle joins with selective dimensions (q3,
q5) — the two shapes that dominate at 100 TB.

All money aggregates sum in exact DECIMAL (see ``common.py``): the inputs
sit on 2-decimal grids, so decimal sums are bit-identical to the DuckDB
oracle regardless of partition/summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import dec2, load

def _one() -> F.Column:
    return F.lit(1).cast("decimal(3,2)")


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return dec2(F.col("l_extendedprice")) * (_one() - F.col("l_discount").cast("decimal(3,2)"))


def _charge() -> F.Column:
    """… * (1 + l_tax), exact decimal."""
    return _disc_price() * (_one() + F.col("l_tax").cast("decimal(3,2)"))


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (A1: grouped sums/avgs with map-side combine)."""
    li = load(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec2(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("double").alias("sum_charge"),
            F.floor(F.sum(dec2(F.col("l_quantity"))).cast("double") / n * 1e6)
            .cast("long")
            .alias("avg_qty_e6"),
            F.floor(F.sum(dec2(F.col("l_extendedprice"))).cast("double") / n * 1e6)
            .cast("long")
            .alias("avg_price_e6"),
            F.floor(F.sum(dec2(F.col("l_discount"))).cast("double") / n * 1e6)
            .cast("long")
            .alias("avg_disc_e6"),
            n.alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) * (1 + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
       CAST(floor(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_qty_e6,
       CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_price_e6,
       CAST(floor(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_disc_e6,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority revenue: selective dim filters + 2 shuffle joins."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


SQL_Q3 = """
SELECT l_orderkey, o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier revenue by nation: 5-way join, broadcast dims, one year."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(
            supp,
            (li["l_suppkey"] == supp["s_suppkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


SQL_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: pure scan + filter + scalar agg (pushdown test)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec2(F.col("l_extendedprice")) * F.col("l_discount").cast("decimal(3,2)"))
        .cast("double")
        .alias("revenue")
    )


SQL_Q6 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""




def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue by customer (join + selective flag filter)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


SQL_Q10 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority counts by flag class (join + conditional counts)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


SQL_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share: conditional decimal sums + exact ratio."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0).cast("decimal(12,2)"))
    ).cast("double")
    total = F.sum(_disc_price()).cast("double")
    return j.agg(
        F.floor(100.0 * promo / total * 1e6).cast("long").alias("promo_revenue_pct_e6")
    )


SQL_Q14 = """
SELECT CAST(floor(
         100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
       * 1000000) AS BIGINT) AS promo_revenue_pct_e6
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking via correlated EXISTS (adapted: the testdata
    lacks l_commitdate/l_receiptdate, so "late" means shipped after the
    order date). Plans as a left-semi join — no subquery re-execution."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


SQL_Q4 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bi-national volume shipping: the nation dim joins twice under two
    roles (supplier side / customer side), broadcast both."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == F.col("s_nkey"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


SQL_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share inside a region: conditional share-of-total
    ratio per year (sum(CASE)/sum, exact decimal until the final divide)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = _disc_price()
    nat_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(12,2)"))
    ).cast("double")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), cust["c_nationkey"] == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == region["r_regionkey"])
        .join(F.broadcast(n2), supp["s_nationkey"] == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.floor(nat_vol / F.sum(vol).cast("double") * 1e6).cast("long").alias("mkt_share_e6"))
    )


SQL_Q8 = """
SELECT o_year, CAST(floor(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                   ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                   / CAST(sum(volume) AS DOUBLE) * 1000000) AS BIGINT) AS mkt_share_e6
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2))) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution: LEFT OUTER join preserved rows
    (customers with zero orders) + two-level aggregation."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


SQL_Q13 = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue: aggregate once, then keep the
    max via a broadcast scalar (agg-over-agg; no window over all rows)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(top), revenue["total_revenue"] == top["mx"])
        .join(supp, revenue["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue: the correlated per-part AVG subquery
    decorrelates to one grouped agg + an equi-join (no per-row re-scan)."""
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    li = load(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(part.select("p_partkey")), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey")
        .agg(
            (F.sum(dec2(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)))
            .alias("avg_qty")
        )
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")), li["l_partkey"] == part["p_partkey"])
        .join(per_part.withColumnRenamed("l_partkey", "ap_partkey"),
              li["l_partkey"] == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.floor(F.sum(dec2(F.col("l_extendedprice"))).cast("double") / 7.0 * 1e6)
            .cast("long")
            .alias("avg_yearly_e6")
        )
    )


SQL_Q17 = """
SELECT CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 * 1000000) AS BIGINT) AS avg_yearly_e6
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#11'
  AND l_quantity < 0.2 * (
    SELECT CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
    FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: IN over a HAVING-filtered aggregate. The
    qualifying aggregate already carries the output sum, so one lineitem
    pass serves both the IN-filter and the projection (the textbook form
    re-scans and re-aggregates lineitem; per-order grain makes the second
    GROUP BY a no-op)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec2(F.col("l_quantity"))).alias("qdec"))
        .filter(F.col("qdec") > F.lit(300).cast("decimal(12,2)"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qdec").cast("double").alias("sum_qty"),
        )
    )


SQL_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under an OR-of-ANDs predicate (adapted: no
    p_container in testdata; brand × size-range × quantity-band). The
    whole disjunction stays in one codegen'd filter after the join."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(cond).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


SQL_Q19 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting: the textbook EXISTS + NOT EXISTS
    pair decorrelates to two per-order aggregates (any-other-supplier /
    exactly-one-late-supplier) semi-joined back — two hash aggs instead of
    two correlated re-scans per row. Adapted: "late" = shipped after the
    order date (testdata has no commit/receipt dates)."""
    li = load(spark, sf_dir, "lineitem")
    orders_f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = load(spark, sf_dir, "supplier")
    late = li.join(orders_f, li["l_orderkey"] == orders_f["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("nsupp"))
        .filter(F.col("nsupp") > 1)
        .select(F.col("l_orderkey").alias("m_okey"))
    )
    late_single = (
        late.groupBy(F.col("l_orderkey").alias("s_okey"))
        .agg(F.countDistinct("l_suppkey").alias("nlate"))
        .filter(F.col("nlate") == 1)
        .select("s_okey")
    )
    return (
        late.join(multi, late["l_orderkey"] == F.col("m_okey"), "left_semi")
        .join(late_single, late["l_orderkey"] == F.col("s_okey"), "left_semi")
        .join(supp, late["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


SQL_Q21 = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate)
GROUP BY s_name
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity: above-average balances (ungrouped scalar
    subquery, broadcast) with no urgent orders (anti join). Adapted: the
    country code is the last digit of c_name (testdata has no c_phone),
    and "no orders" → "no URGENT orders" (every customer has orders)."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec2(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias("ab")
        )
    )
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, cust["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy(F.expr("right(c_name, 1)").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec2(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


SQL_Q22 = """
SELECT right(c_name, 1) AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY right(c_name, 1)
"""


# --------------------------------------------------------------------------
# Derived PARTSUPP: the testdata ships no partsupp table, so the five
# queries that need one (q2/q9/q11/q16/q20) run over a DETERMINISTIC
# expansion of part × supplier — dbgen's 4-suppliers-per-part assignment
# with a constant stride (so (part, supp) keys stay distinct at any
# supplier count) and hash-grid cost/qty columns. A pure integer function
# of the shipped keys, reproduced verbatim in the oracle SQL — same
# planted-determinism contract as the outlier/PII/near-dup fixtures.
# Costs are integer CENTS end to end: no decimal division anywhere.


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load(spark, sf_dir, "supplier").count()  # bounded scalar
    step = max(1, s_cnt // 4)
    return part.select(
        F.col("p_partkey").alias("ps_partkey"),
        F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("i"),
    ).select(
        "ps_partkey",
        ((F.col("ps_partkey") + F.col("i") * step) % s_cnt + 1)
        .cast("long")
        .alias("ps_suppkey"),
        (1 + (F.col("ps_partkey") * 7 + F.col("i") * 13) % 9999)
        .cast("long")
        .alias("ps_availqty"),
        (100 + (F.col("ps_partkey") * 31 + F.col("i") * 17) % 100000)
        .cast("long")
        .alias("ps_supplycost_cents"),
    )


_SQL_PARTSUPP = """
sc AS (SELECT count(*) AS s_cnt FROM supplier),
partsupp AS (
    SELECT p_partkey AS ps_partkey,
           CAST((p_partkey + g.i * greatest(1, s_cnt // 4)) % s_cnt + 1 AS BIGINT) AS ps_suppkey,
           CAST(1 + (p_partkey * 7 + g.i * 13) % 9999 AS BIGINT) AS ps_availqty,
           CAST(100 + (p_partkey * 31 + g.i * 17) % 100000 AS BIGINT) AS ps_supplycost_cents
    FROM part, sc, (SELECT unnest(generate_series(0, 3)) AS i) g
)
"""


def _acctbal_cents() -> F.Column:
    return F.floor(dec2(F.col("s_acctbal")) * 100).cast("long")


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier: per-part min over the region's partsupp
    (correlated scalar subquery decorrelated into a grouped-min join),
    selective part filter, top-100 presentation order."""
    ps = derived_partsupp(spark, sf_dir)
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "MEDIUM")
    ).select("p_partkey", "p_brand")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_nat = nat.join(
        F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
    ).select("n_nationkey", "n_name")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(eu_nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    eu_ps = ps.join(supp, ps["ps_suppkey"] == supp["s_suppkey"])
    min_cost = eu_ps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost_cents").alias("_min_cost")
    )
    return (
        eu_ps.join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost_cents") == F.col("_min_cost"))
        .join(part, F.col("ps_partkey") == part["p_partkey"])
        .select(
            _acctbal_cents().alias("s_acctbal_cents"),
            "s_name", "n_name", "p_partkey", "p_brand", "ps_supplycost_cents",
        )
        .orderBy(
            F.desc("s_acctbal_cents"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


SQL_Q2 = f"""
WITH {_SQL_PARTSUPP.strip()}
SELECT CAST(floor(CAST(s_acctbal AS DECIMAL(12,2)) * 100) AS BIGINT) AS s_acctbal_cents,
       s_name, n_name, p_partkey, p_brand, ps_supplycost_cents
FROM part, partsupp, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15 AND p_type = 'MEDIUM'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
  AND ps_supplycost_cents = (
      SELECT min(ps2.ps_supplycost_cents)
      FROM partsupp ps2, supplier s2, nation n2, region r2
      WHERE ps2.ps_partkey = part.p_partkey AND s2.s_suppkey = ps2.ps_suppkey
        AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit: profit in exact cents =
    100·extprice·(1−disc) − supplycost_cents·quantity, grouped by
    supplier nation × order year. Five joins, all decimal-exact."""
    ps = derived_partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%rod%")
    ).select("p_partkey")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount_cents = (
        _disc_price() * 100
        - F.col("ps_supplycost_cents").cast("decimal(20,0)") * dec2(F.col("l_quantity"))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(
            ps,
            (F.col("l_partkey") == ps["ps_partkey"])
            & (F.col("l_suppkey") == ps["ps_suppkey"]),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .join(orders, F.col("l_orderkey") == orders["o_orderkey"])
        .groupBy("n_name", "o_year")
        .agg(F.sum(amount_cents).cast("double").alias("sum_profit_cents"))
    )


SQL_Q9 = f"""
WITH {_SQL_PARTSUPP.strip()}
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(3,2))) * 100
              - ps_supplycost_cents * CAST(l_quantity AS DECIMAL(12,2)))
            AS DOUBLE) AS sum_profit_cents
FROM lineitem, partsupp, part, supplier, nation, orders
WHERE l_partkey = p_partkey AND p_name LIKE '%rod%'
  AND l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND l_orderkey = o_orderkey
GROUP BY 1, 2
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: per-part inventory value for one nation's
    suppliers, HAVING value > total/100 (scalar-subquery threshold as a
    broadcast one-row join; all integer cents)."""
    ps = derived_partsupp(spark, sf_dir)
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = supp.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    scoped = ps.join(F.broadcast(nat_supp), ps["ps_suppkey"] == F.col("s_suppkey"))
    value = F.sum(
        F.col("ps_supplycost_cents") * F.col("ps_availqty")
    ).alias("value_cents")
    per_part = scoped.groupBy("ps_partkey").agg(value)
    total = per_part.agg(
        F.sum("value_cents").alias("_total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") > F.expr("_total div 100"))
        .select("ps_partkey", F.col("value_cents").cast("long").alias("value_cents"))
    )


SQL_Q11 = f"""
WITH {_SQL_PARTSUPP.strip()},
scoped AS (
    SELECT ps_partkey, ps_supplycost_cents * ps_availqty AS v
    FROM partsupp, supplier, nation
    WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3'
)
SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_cents
FROM scoped
GROUP BY ps_partkey
HAVING sum(v) > (SELECT sum(v) FROM scoped) // 100
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship: distinct supplier counts per
    (brand, type, size) bucket, excluding one brand/type and suppliers
    failing a quality screen (NOT IN → broadcast anti-join)."""
    ps = derived_partsupp(spark, sf_dir)
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000.0
    ).select("s_suppkey")
    return (
        ps.join(part, ps["ps_partkey"] == part["p_partkey"])
        .join(
            F.broadcast(bad_supp),
            ps["ps_suppkey"] == bad_supp["s_suppkey"],
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand", "p_type",
            F.col("p_size").cast("long").alias("p_size"),
            F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
        )
    )


SQL_Q16 = f"""
WITH {_SQL_PARTSUPP.strip()}
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp, part
WHERE p_partkey = ps_partkey
  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
GROUP BY 1, 2, 3
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion: suppliers in one region whose stock
    of a name-prefixed part exceeds half of that (part, supp)'s 1997
    shipments — availqty > ½·sum(qty) as the integer inequality
    200·availqty > sum(qty_cents)."""
    ps = derived_partsupp(spark, sf_dir)
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("large%")
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(dec2(F.col("l_quantity")) * 100)
            .cast("long")
            .alias("_qty_cents")
        )
    )
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nat = nat.join(
        F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
    ).select("n_nationkey", "n_name")
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "n_name")
    qualifying = (
        ps.join(
            shipped,
            (ps["ps_partkey"] == F.col("l_partkey"))
            & (ps["ps_suppkey"] == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") * 200 > F.col("_qty_cents"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        supp.join(qualifying, supp["s_suppkey"] == qualifying["ps_suppkey"])
        .select("s_name", "n_name")
    )


SQL_Q20 = f"""
WITH {_SQL_PARTSUPP.strip()}
SELECT s_name, n_name
FROM supplier, nation, region
WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND s_suppkey IN (
      SELECT ps_suppkey FROM partsupp
      WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
        AND ps_availqty * 200 > (
            SELECT CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * 100) AS BIGINT)
            FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01')
  )
"""


TPCH_QUERIES = {
    "tpch_q1": (q_tpch_q1, SQL_Q1),
    "tpch_q2": (q_tpch_q2, SQL_Q2),
    "tpch_q9": (q_tpch_q9, SQL_Q9),
    "tpch_q11": (q_tpch_q11, SQL_Q11),
    "tpch_q16": (q_tpch_q16, SQL_Q16),
    "tpch_q20": (q_tpch_q20, SQL_Q20),
    "tpch_q3": (q_tpch_q3, SQL_Q3),
    "tpch_q5": (q_tpch_q5, SQL_Q5),
    "tpch_q6": (q_tpch_q6, SQL_Q6),
    "tpch_q10": (q_tpch_q10, SQL_Q10),
    "tpch_q12": (q_tpch_q12, SQL_Q12),
    "tpch_q14": (q_tpch_q14, SQL_Q14),
    "tpch_q4": (q_tpch_q4, SQL_Q4),
    "tpch_q7": (q_tpch_q7, SQL_Q7),
    "tpch_q8": (q_tpch_q8, SQL_Q8),
    "tpch_q13": (q_tpch_q13, SQL_Q13),
    "tpch_q15": (q_tpch_q15, SQL_Q15),
    "tpch_q17": (q_tpch_q17, SQL_Q17),
    "tpch_q18": (q_tpch_q18, SQL_Q18),
    "tpch_q19": (q_tpch_q19, SQL_Q19),
    "tpch_q21": (q_tpch_q21, SQL_Q21),
    "tpch_q22": (q_tpch_q22, SQL_Q22),
}
