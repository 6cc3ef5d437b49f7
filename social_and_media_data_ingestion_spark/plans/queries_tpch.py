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
    SELECT supp_nation, yr,
           floor(sum(profit_e6)::DOUBLE / 10000 + 0.5) / 100 AS total_profit
    FROM (
      SELECT sn.n_name AS supp_nation,
             year(o_orderdate)::BIGINT AS yr,
             -- value·10⁶ as a pure-integer expression: price·(1−disc)
             -- is price_c·(100−disc_c)·100 and 0.8·retail·qty is
             -- 80·retail_c·qty_c, both exact (2dp inputs)
             floor(l_extendedprice * 100 + 0.5)::BIGINT
               * (100 - floor(l_discount * 100 + 0.5)::BIGINT) * 100
             - 80 * floor(p_retailprice * 100 + 0.5)::BIGINT
                  * floor(l_quantity * 100 + 0.5)::BIGINT
               AS profit_e6
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
    """Quantize-then-sum (SCALE.md §4; r7 duplicate-rows probe caught
    the double-sum spelling flipping cents with summation order):
    per-row profit is an exact value·10⁶ integer — 2dp inputs make
    price_c·(100−disc_c)·100 − 80·retail_c·qty_c lossless — summed in
    DECIMAL(38,0) (DuckDB: BIGINT→HUGEINT), rounded once at the end."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )

    def _c(col):
        return F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint")

    profit_e6 = (
        _c("l_extendedprice") * (100 - _c("l_discount")) * 100
        - 80 * _c("p_retailprice") * _c("l_quantity")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == sn.snk)
        .groupBy("supp_nation", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            # floor(x·100+0.5) convention, not round(): Spark ROUND on a
            # double rounds the shortest decimal repr, DuckDB the binary
            # value — exact integer sums actually land on half-cent
            # boundaries (one sf0.01 group did)
            (
                F.floor(
                    F.sum(profit_e6.cast("decimal(38,0)")).cast("double")
                    / 10000
                    + F.lit(0.5)
                )
                / 100
            ).alias("total_profit")
        )
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
    joined = li.join(part, li.l_partkey == part.p_partkey)
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


# =============================================================================
# Q2 shape — min-value correlated subquery over a multi-join (the
# classic "cheapest supplier per part"). No partsupp table in the
# testdata, so lineitem's distinct (partkey, suppkey) pairs act as the
# part-supplier bridge and s_acctbal stands in for ps_supplycost.
# Scale note: the selective part predicate (size+type) is pushed to the
# lineitem scan as a broadcast semi-join BEFORE the distinct, so the
# bridge dedup and the per-part MIN window run over only the surviving
# parts' rows, not the whole table. The correlated MIN itself is a
# partition-window (one shuffle on partkey) rather than a re-scan per
# row; dims (nation, region, part) are broadcast. Safe because the MIN
# is per-partkey: restricting to the probed partkeys first cannot change
# any min we read.
# =============================================================================
@q(
    "q2_min_cost_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eligible AS (
      SELECT ps.l_partkey AS pk, s_name, s_acctbal, n_name
      FROM ps
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'AMERICA'
    )
    SELECT p_partkey, p_name, s_name, n_name, round(s_acctbal, 2) AS acctbal
    FROM part JOIN eligible ON p_partkey = pk
    WHERE p_size = 15 AND p_type = 'SMALL'
      AND s_acctbal = (SELECT min(s_acctbal) FROM eligible e2 WHERE e2.pk = p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    part = t(spark, sf_dir, "part")

    p = part.filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
    ps = (
        li.join(
            F.broadcast(p.select(F.col("p_partkey").alias("probe_pk"))),
            li.l_partkey == F.col("probe_pk"),
            "left_semi",
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    elig = (
        ps.join(supp, ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
              nation.n_regionkey == region.r_regionkey)
        .select(F.col("l_partkey").alias("pk"), "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("pk")
    cheapest = elig.withColumn("min_bal", F.min("s_acctbal").over(w)).filter(
        F.col("s_acctbal") == F.col("min_bal")
    )
    return (
        cheapest.join(F.broadcast(p), F.col("pk") == p.p_partkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


# =============================================================================
# Q11 shape — scalar subquery threshold over a grouped value ("important
# stock"). Value per part = sum(extendedprice * quantity) shipped by
# suppliers of one nation; keep parts whose value exceeds 0.1% of the
# national total. The grouped frame is computed once and reused for both
# the per-part values and the global threshold (broadcast scalar).
# =============================================================================
@q(
    "q11_important_parts",
    """
    WITH v AS (
      SELECT l_partkey AS partkey,
             sum(l_extendedprice * l_quantity) AS raw_value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT partkey, round(raw_value, 2) AS value
    FROM v WHERE raw_value > (SELECT sum(raw_value) * 0.001 FROM v)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")

    nat_supp = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    v = (
        li.join(F.broadcast(nat_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("raw_value"))
    )
    thresh = v.agg((F.sum("raw_value") * 0.001).alias("thresh"))
    return (
        v.join(F.broadcast(thresh))
        .filter(F.col("raw_value") > F.col("thresh"))
        .select("partkey", F.round("raw_value", 2).alias("value"))
    )


# =============================================================================
# Q12 shape — two-way conditional counts by a lineitem attribute. No
# l_shipmode/commitdate in the testdata: l_returnflag stands in for the
# ship mode and "shipped on/after order date" for the late-commit
# predicate. Single shuffle: join then partial-agg counts.
# =============================================================================
@q(
    "q12_priority_by_flag",
    """
    SELECT l_returnflag AS ret_mode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("ret_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# =============================================================================
# Q16 shape — supplier-count by part attributes with a NOT IN exclusion
# subquery ("suppliers with complaints" → negative account balance).
# The exclusion is a broadcast anti-join; part attrs arrive via a
# broadcast FK join; the only shuffle is the final distinct-count agg.
# =============================================================================
@q(
    "q16_supplier_part_counts",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")

    ps = li.select("l_partkey", "l_suppkey").distinct()
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# =============================================================================
# Q20 shape — nested IN subqueries with a correlated quantity threshold
# ("suppliers with excess stock"). Suppliers of NATION_0 who in 1997
# shipped more of some 'small%' part than half that part's per-supplier
# average. Both grouped frames shuffle on partkey once; the final
# supplier membership is a semi-join.
# =============================================================================
@q(
    "q20_excess_shippers",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
    ),
    avail AS (
      SELECT l_partkey AS pk,
             0.5 * sum(l_quantity) / count(DISTINCT l_suppkey) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT s_name, round(s_acctbal, 2) AS acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_0'
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped
        JOIN avail ON l_partkey = pk
        JOIN part  ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%' AND qty97 > half_avg)
    """,
)
def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    part = t(spark, sf_dir, "part")

    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty97"))
    )
    avail = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.sum("l_quantity") / F.countDistinct("l_suppkey")).alias("half_avg")
    )
    small = part.filter(F.col("p_name").startswith("small")).select("p_partkey")
    excess = (
        shipped.join(avail, shipped.l_partkey == avail.pk)
        .join(F.broadcast(small), shipped.l_partkey == small.p_partkey)
        .filter(F.col("qty97") > F.col("half_avg"))
        .select("l_suppkey")
    )
    nat = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_0")),
        supp.s_nationkey == F.col("n_nationkey"),
    )
    return (
        nat.join(excess, nat.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


# =============================================================================
# Q21 shape — EXISTS / NOT EXISTS over self-joined lineitem ("suppliers
# who kept orders waiting"): the supplier returned ('R') a line in a
# multi-supplier order where no OTHER supplier returned one. The oracle
# keeps the literal EXISTS/NOT EXISTS form; the Spark plan rewrites both
# correlated probes into one per-order aggregate (n_suppliers,
# n_returning_suppliers) — one shuffle on orderkey instead of two
# self-join shuffles, the winning strategy at 100 TB.
# =============================================================================
@q(
    "q21_waiting_suppliers",
    """
    SELECT s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE l1.l_returnflag = 'R' AND n_name = 'NATION_2'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")

    # One pass over lineitem: reduce to (order, supplier, returned?) pairs
    # (map-side partial agg collapses line-level rows), then derive both
    # EXISTS probes as per-order WINDOW stats over that small frame —
    # no second lineitem scan (the groupBy+join-back spelling evaluates
    # the pairs subtree twice) and no order-keyed join. Cost: one full
    # shuffle on (ok, sk), one small exchange on ok for the window.
    from pyspark.sql.window import Window

    pairs = li.groupBy(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r"))
    w = Window.partitionBy("ok")
    stats = pairs.withColumn("n_supp", F.count("*").over(w)).withColumn(
        "n_r", F.sum("has_r").over(w)
    )
    nat = supp.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_2")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        stats.filter(
            (F.col("has_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_r") == 1)
        )
        .join(F.broadcast(nat), F.col("sk") == nat.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


# =============================================================================
# Q4 shape — order priority checking: date-windowed orders that have at
# least ONE qualifying lineitem (EXISTS -> left-semi join), counted by
# priority. The classic predicate (l_commitdate < l_receiptdate) needs
# two lineitem dates this star schema doesn't carry; the adapted
# qualifier — shipped 60+ days after the order date — keeps the exact
# plan shape and ADDS a cross-table non-equi conjunct riding the semi
# join as a residual (richer than the original's lineitem-local one).
# =============================================================================
@q(
    "q4_priority_followup",
    """
    SELECT o_orderpriority, count(*)::BIGINT AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    # Inferred scan-pruning predicate Catalyst cannot derive on its own:
    # any lineitem qualifying for SOME windowed order ships at least
    # 60 days after the window opens, so the big side's parquet scan
    # drops everything before 1997-08-30 BEFORE the semi-join shuffle
    # (the window bound + the residual imply it; semantics unchanged).
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate")
        >= F.lit("1997-07-01").cast("timestamp") + F.expr("INTERVAL 60 DAYS")
    )
    hits = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            >= orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    return hits.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


# =============================================================================
# Q14 shape — promotion effect: one month of lineitem joined to the part
# dim (broadcast), promo share of revenue as a conditional-aggregate
# ratio. Quantize-then-sum (SCALE.md §4): revenue per row is the
# PURE-INTEGER product price_c·(100−disc_c), both sums exact, ONE
# floor-quantize of the final percentage; try_divide because the
# denominator CAN be zero at degenerate cardinality (DuckDB x/0 = NULL
# where ANSI Spark `/` raises).
# =============================================================================
@q(
    "q14_promo_revenue",
    """
    WITH q AS (
      SELECT (p_type LIKE 'PROMO%') AS is_promo,
             floor(l_extendedprice * 100 + 0.5)::BIGINT AS price_c,
             floor(l_discount * 100 + 0.5)::BIGINT AS disc_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate <  TIMESTAMP '1997-10-01'
    )
    SELECT floor(
             100.0 * sum(CASE WHEN is_promo THEN price_c * (100 - disc_c)
                              ELSE 0 END)::DOUBLE
             / sum(price_c * (100 - disc_c))::DOUBLE
             * 1000000 + 0.5) / 1000000 AS promo_revenue_pct
    FROM q
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("is_promo")
    )
    price_c = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
    disc_c = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint")
    j = li.select(
        "l_partkey", price_c.alias("price_c"), disc_c.alias("disc_c")
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    # value·10⁴ per row (~1e9 worst case) → DECIMAL(38,0) accumulation,
    # same width call as Q1's disc-price sum
    rev = (F.col("price_c") * (100 - F.col("disc_c"))).cast("decimal(38,0)")
    num = F.sum(F.when(F.col("is_promo"), rev).otherwise(F.lit(0))).cast(
        "double"
    )
    den = F.sum(rev).cast("double")
    return j.agg(
        (
            F.floor(F.try_divide(F.lit(100.0) * num, den) * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("promo_revenue_pct")
    )
