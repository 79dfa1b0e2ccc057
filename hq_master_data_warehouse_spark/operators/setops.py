"""Set-operation family (SURVEY op U1 + par.2.7 engine surface).

The reference's only set op is accumulating chunked fetch results
(send/route.ts:36-53), obsolete under a single semi-join; the engine
exposes the full relational set-op surface: UNION ALL (unionByName),
EXCEPT ALL, INTERSECT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loaders import load_table


# -- U1: union of two scans (chunk accumulation generalized);
#    unionByName is column-order-safe, unlike positional UNION.
@query(
    "setop_union_all",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name,
           'customer' AS kind
    FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name,
           'supplier' AS kind
    FROM supplier
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_name").alias("entity_name"),
            F.lit("customer").alias("kind"),
        )
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return customer.unionByName(supplier)


# -- par.2.7: EXCEPT ALL -- customers-by-key minus ledger keys; the
#    multiset twin of the J1 anti-join.
@query(
    "setop_except_all",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT ALL
    SELECT o_custkey AS c_custkey FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    sent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.exceptAll(sent)


# -- par.2.7: INTERSECT (distinct semantics) -- keys that are both
#    customers with orders and customers with urgent orders.
@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return a.intersect(b)
