"""Flagship query: the reference's dashboard range-counts screen.

Reference lifecycle (SURVEY.md par.3.1): the dashboard POSTs
``{action:'counts'}`` and the API loops 11 buckets issuing one filtered
COUNT each (src/app/api/companies/route.ts:51-95), then pulls every
``company_sends.employee_range`` row to the app and tallies in JS
(route.ts:86-92); the UI derives ``remaining`` per card
(src/app/page.tsx:362-364).

Spark shape: ONE job -- bucket-normalize, grouped count, a left-semi
"has been sent" probe, full-outer join of the two count sets, derived
``remaining`` column.  13 HTTP round-trips become a single two-shuffle
plan; at 100 TB the groupBy is a partial+final hash aggregate over a
5-ish-value key (tiny shuffle), and the semi-join shuffles on the
customer key with AQE free to pick broadcast if the ledger side is
small.

Fixture role-play (FIXTURES.md section C): ``customer`` plays companies
(``c_mktsegment`` = employee_range), ``orders`` plays the company_sends
ledger ("sent" = customer has at least one order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.buckets import segment_bucket, segment_bucket_sql
from ..registry import query
from ..sources.ledger_fixture import SENT_LEDGER_SQL, sent_ledger
from ..sources.loaders import load_table

_FLAGSHIP_ORACLE = f"""
WITH bucketed AS (
    SELECT c_custkey, {segment_bucket_sql('c_mktsegment')} AS segment
    FROM customer
), ledger AS (
    {SENT_LEDGER_SQL}
), totals AS (
    SELECT segment, COUNT(*) AS total FROM bucketed GROUP BY segment
), sent AS (
    SELECT segment, COUNT(*) AS sent
    FROM bucketed b
    WHERE EXISTS (SELECT 1 FROM ledger l WHERE l.company_id = b.c_custkey)
    GROUP BY segment
)
SELECT
    COALESCE(t.segment, s.segment) AS segment,
    COALESCE(t.total, 0) AS total,
    COALESCE(s.sent, 0) AS sent,
    COALESCE(t.total, 0) - COALESCE(s.sent, 0) AS remaining
FROM totals t
FULL OUTER JOIN sent s ON t.segment = s.segment
"""


@query("flagship_range_counts", oracle=_FLAGSHIP_ORACLE)
def range_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed availability counts with sent/remaining (A1+A2+J4+A5)."""
    customer = load_table(spark, sf_dir, "customer")

    bucketed = customer.select(
        "c_custkey", segment_bucket(F.col("c_mktsegment")).alias("segment")
    )

    totals = bucketed.groupBy("segment").agg(F.count("*").alias("total"))

    # "already sent" = appears in the ledger; left-semi keeps the plan
    # distributed (no collected ID lists, unlike the reference's NOT-IN
    # string -- see SURVEY op J1 scale note).
    sent = (
        bucketed.join(
            sent_ledger(spark, sf_dir).withColumnRenamed(
                "company_id", "c_custkey"
            ),
            on="c_custkey",
            how="left_semi",
        )
        .groupBy("segment")
        .agg(F.count("*").alias("sent"))
    )

    return (
        totals.join(sent, on="segment", how="full_outer")
        .select(
            "segment",
            F.coalesce("total", F.lit(0)).alias("total"),
            F.coalesce("sent", F.lit(0)).alias("sent"),
        )
        .withColumn("remaining", F.col("total") - F.col("sent"))
    )
