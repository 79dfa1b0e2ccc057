"""Physical-layout operators: bucketed co-located joins (SCALE.md's
"bucket both tables on the join key to make this a shuffle-free
zipper", executable).

Bucketing pre-shuffles a table ONCE at write time: rows are hashed
into N buckets by the join key and each bucket is sorted, so a later
join of two tables bucketed the same way needs no exchange at all --
the map tasks zip matching buckets.  At 100 TB this converts the
biggest recurring cost of a standing pipeline (the fact-fact shuffle,
re-paid every run) into a one-time layout cost.

The staged bucketed twin tables live in a temp dir keyed by sf_dir;
`tests/test_plans.py` asserts the join plan contains no shuffle.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import dec_sum, dec_sum_sql
from ..registry import query
from ..sources.loaders import load_table

N_BUCKETS = 8


def _bucketed_table(
    spark: SparkSession, sf_dir: str, name: str, key: str
) -> str:
    """Stage `name` as a bucketed+sorted external table (once per
    sf_dir per session-catalog) and return the table identifier."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    table = f"hqmdw_bkt_{name}_{tag}"
    if not spark.catalog.tableExists(table):
        path = os.path.join(tempfile.gettempdir(), f"hqmdw_bkt_{tag}", name)
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", path)
            .saveAsTable(table)
        )
    return table


@query(
    "bucketed_colocated_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           {dec_sum_sql('l.l_extendedprice', 'revenue')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders with both sides bucketed on the orderkey:
    the sort-merge join reads pre-bucketed pre-sorted files and plans
    ZERO exchanges (asserted in tests/test_plans.py).  Same result as
    the shuffled join -- the oracle is the plain SQL."""
    li = spark.table(
        _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    )
    orders = spark.table(
        _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    )
    # hint('merge'): at test SF the planner would broadcast the small
    # side and never touch the bucket layout; production fact-fact
    # sizes get sort-merge anyway.
    return (
        li.hint("merge")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dec_sum("l_extendedprice", "revenue"),
        )
    )
