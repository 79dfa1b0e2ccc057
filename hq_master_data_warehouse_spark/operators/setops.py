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


# -- snapshot diff / CDC-style change detection (engine surface): the
#    added/removed/changed delta between two versions of a keyed
#    table, as one full-outer join.  This is how a warehouse without
#    a transaction log reconciles a re-delivered feed -- and the
#    logical core of incremental view maintenance.  Fixture: "old" is
#    suppliers as-is, "new" drops key%7==0, updates the balance of
#    key%5==0, and keeps the rest.
@query(
    "setop_snapshot_diff",
    oracle="""
    WITH new_snap AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 5 = 0
                    THEN ROUND(s_acctbal + 50.0, 2)
                    ELSE ROUND(s_acctbal, 2) END AS s_acctbal
        FROM supplier WHERE s_suppkey % 7 <> 0
    ),
    old_snap AS (
        SELECT s_suppkey, ROUND(s_acctbal, 2) AS s_acctbal FROM supplier
    )
    SELECT COALESCE(o.s_suppkey, n.s_suppkey) AS s_suppkey,
           CASE WHEN n.s_suppkey IS NULL THEN 'removed'
                WHEN o.s_suppkey IS NULL THEN 'added'
                WHEN o.s_acctbal <> n.s_acctbal THEN 'changed'
                ELSE 'unchanged' END AS change,
           o.s_acctbal AS old_acctbal,
           n.s_acctbal AS new_acctbal
    FROM old_snap o FULL OUTER JOIN new_snap n
      ON o.s_suppkey = n.s_suppkey
    """,
)
def setop_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    old_snap = supplier.select(
        "s_suppkey", F.round("s_acctbal", 2).alias("s_acctbal")
    )
    new_snap = old_snap.filter(F.col("s_suppkey") % 7 != 0).select(
        "s_suppkey",
        F.when(
            F.col("s_suppkey") % 5 == 0,
            F.round(F.col("s_acctbal") + 50.0, 2),
        )
        .otherwise(F.col("s_acctbal"))
        .alias("s_acctbal"),
    )
    o = old_snap.select(
        F.col("s_suppkey").alias("o_key"), F.col("s_acctbal").alias("o_bal")
    )
    n = new_snap.select(
        F.col("s_suppkey").alias("n_key"), F.col("s_acctbal").alias("n_bal")
    )
    change = (
        F.when(F.col("n_key").isNull(), "removed")
        .when(F.col("o_key").isNull(), "added")
        .when(F.col("o_bal") != F.col("n_bal"), "changed")
        .otherwise("unchanged")
    )
    return (
        o.join(n, F.col("o_key") == F.col("n_key"), "full_outer")
        .select(
            F.coalesce("o_key", "n_key").alias("s_suppkey"),
            change.alias("change"),
            F.col("o_bal").alias("old_acctbal"),
            F.col("n_bal").alias("new_acctbal"),
        )
    )
