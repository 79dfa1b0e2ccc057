"""Extended TPC-H-style analytical plans (q4/q7/q8/q9/q10/q12/q13/q14/
q15/q16/q17/q19/q21/q22 shapes), adapted to the driver's trimmed
fixture schemas (no partsupp; no l_shipmode / l_commitdate /
l_receiptdate columns -- see TESTDATA.md).  Engine surface per
SURVEY.md par.2.4's note: multi-join pipelines, correlated-subquery
rewrites, exists/not-exists, and scalar-subquery thresholds are "free
in Spark and worth exposing".

Oracle-exactness conventions (see functions/scalars.py):

* every money SUM goes through DECIMAL(30,4) and back to DOUBLE --
  order-independent, so Spark and DuckDB hash identically;
* every ratio is computed double/double then ROUND(..., 6);
* threshold comparisons against an AVG are rewritten multiplicatively
  (``x * cnt > sum``) so no engine ever divides -- the comparison stays
  exact decimal on both sides (q17, q22);
* DuckDB year()/count() return BIGINT where Spark returns INT -- all
  such columns are cast explicitly in the oracle.

Scale notes: filters precede joins (Parquet pushdown), dims broadcast,
fact-fact joins shuffle on their natural keys and stay AQE-managed;
the q21 exists/not-exists pair is two self-joins co-partitioned on
l_orderkey so AQE plans one exchange for all three branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import (
    DISC_PRICE_SQL,
    MONEY,
    dec_sum,
    dec_sum_sql,
    disc_price,
    disc_price_units,
    exact_units_sum,
    sum_disc_price,
)
from ..registry import query
from ..sources.loaders import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# -- q4 shape: priority check via EXISTS (semi-join with extra
#    predicate).  Adapted: "a lineitem shipped after the order date"
#    stands in for commitdate < receiptdate.
@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    quarter = orders.filter(
        (F.col("o_orderdate") >= _ts("1998-01-01"))
        & (F.col("o_orderdate") < _ts("1998-04-01"))
    )
    late = quarter.join(
        lineitem,
        (quarter.o_orderkey == lineitem.l_orderkey)
        & (lineitem.l_shipdate > quarter.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


# -- q7 shape: volume shipping between two nations, by ship year.
@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1998-01-01"))
            & (F.col("l_shipdate") < _ts("2000-01-01"))
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(sum_disc_price("revenue"))
    )


# -- q8 shape: national market share inside a region, by order year.
@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           ROUND(
               CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                    THEN {DISC_PRICE_SQL} ELSE CAST(0 AS DECIMAL(30,4))
                    END) AS DOUBLE)
               / CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE), 6) AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN region r ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    GROUP BY year(o.o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    ))
    zero = F.lit(0).cast("long")
    national = F.when(F.col("supp_nation") == "NATION_3", disc_price_units()).otherwise(zero)
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                exact_units_sum(national, 4)
                / exact_units_sum(disc_price_units(), 4),
                6,
            ).alias("mkt_share")
        )
    )


# -- q9 shape: product-type profit by supplier nation and year.
#    Adapted: cost proxy = 0.5 * p_retailprice * l_quantity (the
#    fixtures carry no partsupp.ps_supplycost).
#    The cost term multiplies NARROW decimals (DECIMAL(30,4) factors
#    would overflow width 38 -- Spark reduces scale, DuckDB falls back
#    to DOUBLE, and the engines diverge in the last ULPs); l_quantity
#    is integral so quantity/2 is exact at scale 1.
_AMOUNT_SQL = f"""({DISC_PRICE_SQL}
    - CAST(p_retailprice AS DECIMAL(15,2))
      * CAST(l_quantity / 2 AS DECIMAL(15,2)))"""


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM({_AMOUNT_SQL}) AS DOUBLE) AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    amount = disc_price() - (
        F.col("p_retailprice").cast("decimal(15,2)")
        * (F.col("l_quantity") / 2).cast("decimal(15,2)")
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


# -- q10 shape: returned-item reporting, top 20 customers by lost
#    revenue in a quarter.  Decimal-exact revenue makes the top-k
#    cutoff deterministic; c_custkey breaks ties.
@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        orders.filter(
            (F.col("o_orderdate") >= _ts("1998-01-01"))
            & (F.col("o_orderdate") < _ts("1998-04-01"))
        )
        .join(lineitem.filter(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum_disc_price("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# -- q12 shape: priority-class line counts by shipping-delay band
#    (delay bands stand in for the fixtures' missing l_shipmode).
_DELAY_BAND_SQL = """CASE
    WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
    WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'medium'
    ELSE 'slow' END"""


@query(
    "tpch_q12_shipping_delay",
    oracle=f"""
    SELECT {_DELAY_BAND_SQL} AS delay_band,
           -- CAST: DuckDB SUM(INTEGER) -> HUGEINT -> pandas float64
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(delay <= 30, "fast")
        .when(delay <= 90, "medium")
        .otherwise("slow")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1998-01-01"))
            & (F.col("l_shipdate") < _ts("1999-01-01"))
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(band.alias("delay_band"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# -- q13 shape: distribution of orders per customer, zeros included
#    (left outer join + double aggregation).
@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# -- q14 shape: promo revenue share in a month (conditional ratio).
@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(
        100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN {DISC_PRICE_SQL} ELSE CAST(0 AS DECIMAL(30,4))
                 END) AS DOUBLE)
        / CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-07-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("long")
    promo = F.when(F.col("p_type") == "PROMO", disc_price_units()).otherwise(zero)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1998-06-01"))
            & (F.col("l_shipdate") < _ts("1998-07-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * exact_units_sum(promo, 4)
                / exact_units_sum(disc_price_units(), 4),
                6,
            ).alias("promo_revenue")
        )
    )


# -- q15 shape: top supplier by quarterly revenue (scalar-subquery max
#    as a 1-row broadcast scalar join -- the sanctioned scalar shape;
#    r11: the previous empty-partition window max put the whole
#    per-supplier revenue table through one WindowExec task, and
#    suppliers scale with the corpus.  Decimal-exact revenue makes
#    the equality deterministic).
@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1998-01-01"))
            & (F.col("l_shipdate") < _ts("1998-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(sum_disc_price("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    best = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        supplier.join(best, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# -- q16 shape: distinct suppliers per part group (lineitem plays the
#    missing partsupp relation).
@query(
    "tpch_q16_part_supplier_stats",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_part_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    picked = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    )
    return (
        lineitem.join(F.broadcast(picked), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# -- q17 shape: small-quantity-order revenue.  The correlated
#    ``l_quantity < 0.2 * AVG(l_quantity per part)`` is rewritten
#    multiplicatively (qty * cnt * 5 < sum) so both engines compare
#    exact decimals -- no double division at the boundary.
@query(
    "tpch_q17_small_quantity",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(30,4))) AS qty_sum,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,4)))
                AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN per_part pp ON pp.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      -- threshold compared in DOUBLE computed identically on both
      -- sides: DECIMAL(30,4) * bigint overflows width 38 in DuckDB
      -- (silent double fallback) while Spark reduces precision --
      -- divergent; one explicit shared formulation is deterministic.
      AND CAST(l.l_quantity AS DOUBLE) * 5 * pp.cnt
          < CAST(pp.qty_sum AS DOUBLE)
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    per_part = (
        lineitem.groupBy(F.col("l_partkey").alias("pp_partkey"))
        .agg(
            F.sum(F.col("l_quantity").cast(MONEY)).alias("qty_sum"),
            F.count("*").alias("cnt"),
        )
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_brand") == "Brand#3")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(per_part, F.col("pp_partkey") == F.col("l_partkey"))
        .filter(
            F.col("l_quantity").cast("double") * 5 * F.col("cnt")
            < F.col("qty_sum").cast("double")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(MONEY)).cast("double")
                / 7.0
            ).alias("avg_yearly")
        )
    )


# -- q19 shape: discounted revenue under OR'd predicate groups
#    (brand x size x quantity bands).
_Q19_PRED_SQL = """(
       (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        AND l_quantity BETWEEN 1 AND 11)
    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        AND l_quantity BETWEEN 10 AND 20)
    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 20 AND 30))"""


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({DISC_PRICE_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE {_Q19_PRED_SQL}
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(sum_disc_price("revenue"))
    )


# -- q21 shape: "suppliers who kept orders waiting" -- the lineitem
#    with the latest ship date in a multi-supplier finished order is
#    blamed.  EXISTS / NOT EXISTS become a semi- and an anti-self-join
#    co-partitioned on l_orderkey.
@query(
    "tpch_q21_waiting_orders",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s.s_name
    """,
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    l1 = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = lineitem.select(
        F.col("l_orderkey").alias("o2_key"),
        F.col("l_suppkey").alias("s2_key"),
        F.col("l_shipdate").alias("d2"),
    )
    blamed = (
        l1.join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_semi",
        )
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key")),
            "left_semi",
        )
        .join(
            l2,
            (F.col("l_orderkey") == F.col("o2_key"))
            & (F.col("l_suppkey") != F.col("s2_key"))
            & (F.col("d2") > F.col("l_shipdate")),
            "left_anti",
        )
    )
    return (
        blamed.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# -- q22 shape: rich-but-inactive customers.  The AVG threshold is
#    rewritten multiplicatively (bal * cnt > sum) to stay exact; the
#    "no orders" side is the engine's anti-join (J1 shape on a
#    different ledger).  Adapted: every fixture customer has at least
#    one order, so "inactive" means no orders since 1998-09-01 --
#    the anti-join ledger side is date-filtered (non-empty result).
@query(
    "tpch_q22_global_sales",
    oracle="""
    WITH pos AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS bal_sum,
               COUNT(*) AS bal_cnt
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
               AS totacctbal
    FROM customer c, pos
    -- threshold in DOUBLE computed identically on both sides (the
    -- decimal product would overflow width 38 in DuckDB -> double
    -- fallback with a DIFFERENT expression tree than Spark's)
    WHERE c.c_acctbal * pos.bal_cnt > CAST(pos.bal_sum AS DOUBLE)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '1998-09-01 00:00:00'
      )
    GROUP BY c.c_nationkey
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast(MONEY)).alias("bal_sum"),
        F.count("*").alias("bal_cnt"),
    )
    recent = orders.filter(F.col("o_orderdate") >= _ts("1998-09-01"))
    return (
        customer.crossJoin(F.broadcast(pos))
        .filter(
            F.col("c_acctbal") * F.col("bal_cnt")
            > F.col("bal_sum").cast("double")
        )
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            dec_sum("c_acctbal", "totacctbal"),
        )
    )


# -- q11 shape: important stock identification -- per-part value with
#    a scalar-subquery fraction threshold.  Adapted: lineitem plays
#    the missing partsupp (value = extendedprice * quantity shipped by
#    suppliers of two nations); the FRACTION comparison is rewritten
#    multiplicatively (value * 500 > total) so both engines compare
#    exact decimals.
@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH val AS (
        -- NARROW decimal factors: DECIMAL(30,4) x DECIMAL(30,4)
        -- overflows width 38 (DuckDB double fallback, order-dependent
        -- sum); (15,2) x (15,2) stays exact in both engines.
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                   * CAST(l.l_quantity AS DECIMAL(15,2))) AS v
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_nationkey IN (0, 1)
        GROUP BY l.l_partkey
    ),
    tot AS (SELECT SUM(v) AS t FROM val)
    SELECT val.l_partkey, CAST(val.v AS DOUBLE) AS part_value
    FROM val, tot
    WHERE CAST(val.v AS DOUBLE) * 500 > CAST(tot.t AS DOUBLE)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    val = (
        lineitem.join(
            F.broadcast(
                supplier.filter(F.col("s_nationkey").isin(0, 1)).select(
                    "s_suppkey"
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(15,2)")
                * F.col("l_quantity").cast("decimal(15,2)")
            ).alias("v")
        )
    )
    tot = val.agg(F.sum("v").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("v").cast("double") * 500 > F.col("t").cast("double")
        )
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )


# -- q20 shape: potential part promotion -- suppliers who shipped an
#    excess quantity of a part class in a year (nested agg-HAVING
#    inside EXISTS becomes agg -> filter -> semi-join).
@query(
    "tpch_q20_excess_shipments",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE EXISTS (
        SELECT 1
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_suppkey = s.s_suppkey
          AND p.p_name LIKE '%red%'
          AND l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l.l_partkey
        HAVING SUM(l.l_quantity) > 50
    )
    """,
)
def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    excess = (
        lineitem.filter(
            (F.col("l_shipdate") >= _ts("1998-01-01"))
            & (F.col("l_shipdate") < _ts("1999-01-01"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


# -- q2 shape: minimum-cost supplier per part inside a region (the
#    correlated MIN subquery becomes groupBy-min + equality join).
#    Adapted: the per-(part, supplier) offer is MIN(l_extendedprice)
#    from lineitem (no partsupp.ps_supplycost in the fixtures);
#    decimal MIN keeps the equality exact on both engines.
@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH offer AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(30,4))) AS price
        FROM lineitem GROUP BY 1, 2
    ),
    regional AS (
        SELECT o.l_partkey, o.price, s.s_acctbal, s.s_name, n.n_name
        FROM offer o
        JOIN supplier s ON o.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    ),
    best AS (
        SELECT l_partkey, MIN(price) AS best_price
        FROM regional GROUP BY 1
    )
    SELECT x.s_acctbal, x.s_name, x.n_name, p.p_partkey,
           CAST(x.price AS DOUBLE) AS offer_price
    FROM regional x
    JOIN part p ON p.p_partkey = x.l_partkey
               AND p.p_size IN (5, 15, 25) AND p.p_type = 'STANDARD'
    JOIN best b ON b.l_partkey = x.l_partkey
               AND x.price = b.best_price
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    part = load_table(spark, sf_dir, "part")
    offer = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast(MONEY)).alias("price")
    )
    regional = (
        offer.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            region.filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("l_partkey", "price", "s_acctbal", "s_name", "n_name")
    )
    best = regional.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("price").alias("best_price")
    )
    picked = F.broadcast(
        part.filter(
            F.col("p_size").isin(5, 15, 25)
            & (F.col("p_type") == "STANDARD")
        ).select("p_partkey")
    )
    return (
        regional.join(picked, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            best,
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("price") == F.col("best_price")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("price").cast("double").alias("offer_price"),
        )
    )
