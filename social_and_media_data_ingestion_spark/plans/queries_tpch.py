"""TPC-H-shaped analytics breadth (adapted to the testdata star schema —
no partsupp table, so cost/stock queries substitute retailprice-derived
proxies; shapes and plan structure are the point, and every query is
DuckDB-oracle-verified like the rest of the registry).

Covers the remaining classic shapes: two-sided dimension join with year
rollup (Q7), market share via conditional agg over a multi-join (Q8),
profit decomposition (Q9), outer-join count distribution (Q13), max-
equality scalar subquery (Q15), correlated average subquery (Q17),
disjunctive multi-band predicates (Q19), anti-join + scalar subquery
over substring buckets (Q22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_and_media_data_ingestion_spark.plans.queries import q
from social_and_media_data_ingestion_spark.plans.tables import t


# =============================================================================
# Q7 shape — volume between two nations by year (both directions).
# =============================================================================
@q(
    "q7_nation_volume",
    """
    SELECT supp_nation, cust_nation, yr, round(sum(vol), 2) AS revenue
    FROM (
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             year(l_shipdate)::BIGINT AS yr,
             l_extendedprice * (1 - l_discount) AS vol
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE (sn.n_name = 'NATION_0' AND cn.n_name = 'NATION_1')
         OR (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_0')
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cnk)
        .join(F.broadcast(sn), supp.s_nationkey == sn.snk)
        .filter(
            ((F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1"))
            | ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("yr")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# =============================================================================
# Q8 shape — market share: one nation's fraction of regional revenue per
# year (conditional agg over a 6-way join).
# =============================================================================
@q(
    "q8_market_share",
    """
    SELECT yr,
           round(sum(CASE WHEN supp_nation = 'NATION_2' THEN vol ELSE 0 END)
                 / sum(vol), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate)::BIGINT AS yr,
             sn.n_name AS supp_nation,
             l_extendedprice * (1 - l_discount) AS vol
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region   ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'EUROPE'
    )
    GROUP BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == cn.cnk)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("crk") == F.col("r_regionkey"),
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.snk)
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


# =============================================================================
# Q9 shape — profit by supplier nation and year (cost proxy:
# 0.8 * p_retailprice per unit, since testdata has no partsupp).
# =============================================================================
@q(
    "q9_profit_by_nation",
    """
    SELECT supp_nation, yr, round(sum(profit), 2) AS total_profit
    FROM (
      SELECT sn.n_name AS supp_nation,
             year(o_orderdate)::BIGINT AS yr,
             l_extendedprice * (1 - l_discount)
               - 0.8 * p_retailprice * l_quantity AS profit
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
    )
    GROUP BY supp_nation, yr
    """,
)
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.8 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.snk)
        .groupBy("supp_nation", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(F.round(F.sum(profit), 2).alias("total_profit"))
    )


# =============================================================================
# Q13 shape — customer order-count distribution: LEFT OUTER join so
# zero-order customers are counted, then a histogram over the counts.
# =============================================================================
@q(
    "q13_order_distribution",
    """
    SELECT n_orders, count(*)::BIGINT AS n_customers
    FROM (
      SELECT c_custkey, count(o_orderkey)::BIGINT AS n_orders
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


# =============================================================================
# Q15 shape — top supplier(s): revenue per supplier over a quarter, keep
# the max (max-equality scalar subquery; ties all kept). Revenue is
# rounded BEFORE the max comparison so fp order can't split ties.
# =============================================================================
@q(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_rev"
        )
    )
    max_rev = rev.agg(F.max("total_rev").alias("mx"))
    return (
        supp.join(rev, supp.s_suppkey == rev.suppkey)
        .join(F.broadcast(max_rev), F.col("total_rev") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_rev")
    )


# =============================================================================
# Q17 shape — small-quantity revenue: lineitems below 50% of their part's
# average quantity (correlated AVG subquery -> grouped join).
# =============================================================================
@q(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice), 2) AS total_price,
           count(*)::BIGINT AS n_lines
    FROM lineitem JOIN (
      SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey
    ) pa ON l_partkey = pa.pk
    WHERE l_quantity < half_avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count("*").alias("n_lines"),
        )
    )


# =============================================================================
# Q19 shape — disjunction of conjunctive bands (brand x quantity range):
# the OR-of-ANDs predicate Catalyst must keep scan-side.
# =============================================================================
@q(
    "q19_banded_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*)::BIGINT AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
    """,
)
def q19_banded_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("l_quantity").between(1, 11)
            & (F.col("p_size") <= 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("l_quantity").between(10, 20)
            & (F.col("p_size") <= 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & (F.col("p_size") <= 15)
        )
    )
    return joined.filter(band).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_lines"),
    )


# =============================================================================
# Q22 shape — rich-but-idle customers: above-average balance, no RECENT
# orders (anti-join + scalar subquery), bucketed by a name-suffix code.
# =============================================================================
@q(
    "q22_idle_balances",
    """
    SELECT code, count(*)::BIGINT AS n_cust, round(sum(c_acctbal), 2) AS total_bal
    FROM (
      SELECT substr(c_name, length(c_name), 1) AS code, c_acctbal, c_custkey
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
    ) rich
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = rich.c_custkey
        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY code
    """,
)
def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .select(
            F.substring(F.col("c_name"), -1, 1).alias("code"),
            "c_acctbal",
            "c_custkey",
        )
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return idle.groupBy("code").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
    )
