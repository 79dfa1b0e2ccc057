"""D1/W2 -- the reference's signature operator: capacity-constrained
sequential distribution of companies to webhooks.

Reference semantics (src/app/api/send/route.ts:63-81): order the
selected companies, compute ``maxCompaniesPerWebhook =
floor(SAFE_PEOPLE_LIMIT / max_employees(range))`` (:64-65 via
src/types/index.ts:82-85), then walk the list giving each webhook the
next ``capacity`` companies until companies or webhooks run out; the
remainder is reported as ``companiesNotAssigned`` (:170).

Spark shape (SURVEY.md par.2.5 W2): this is not a loop -- it is a
window + arithmetic + join:

    rn      = row_number() over (partition by segment order by name)
    bucket  = floor((rn - 1) / capacity(segment))
    assign  = left join webhooks numbered 0..n-1 per segment on bucket

Partitioning by segment restores full parallelism (the reference
computes capacity per range anyway, route.ts:64-65); within a segment
the fill order is exactly the reference's sequential order.  At 100 TB
the only shuffle is the per-segment window sort; the webhook side is a
broadcast dimension.

Fixture role-play: ``nation`` plays the webhook config table, assigned
to customer segments round-robin by nationkey; SEGMENT_MAX plays
EMPLOYEE_RANGE_MAX.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.buckets import capacity_for_segment, capacity_sql
from ..registry import query
from ..sources.loaders import load_table

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

_SEG_CASE_SQL = (
    "CASE CAST(n_nationkey % 5 AS INT) "
    + " ".join(
        f"WHEN {i} THEN '{seg}'" for i, seg in enumerate(_SEGMENTS)
    )
    + " END"
)


def _webhooks_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation-as-webhooks: each webhook bound to one segment (J5),
    numbered 0..n-1 within its segment in key order."""
    nation = load_table(spark, sf_dir, "nation")
    seg = F.element_at(
        F.array(*[F.lit(s) for s in _SEGMENTS]),
        (F.col("n_nationkey") % 5).cast("int") + 1,
    )
    w = Window.partitionBy("segment").orderBy("webhook_id")
    return (
        nation.select(
            F.col("n_nationkey").alias("webhook_id"), seg.alias("segment")
        )
        .withColumn("hook_idx", F.row_number().over(w).cast("long") - 1)
    )


_HOOKS_SQL = f"""
    SELECT n_nationkey AS webhook_id, segment,
           CAST(row_number() OVER (
               PARTITION BY segment ORDER BY n_nationkey
           ) AS BIGINT) - 1 AS hook_idx
    FROM (SELECT n_nationkey, {_SEG_CASE_SQL} AS segment FROM nation)
"""


# -- D1 per-row assignment: which webhook gets each company.
@query(
    "capacity_distribution",
    oracle=f"""
    WITH hooks AS ({_HOOKS_SQL}),
    ranked AS (
        SELECT c_custkey, c_mktsegment AS segment,
               CAST(row_number() OVER (
                   PARTITION BY c_mktsegment ORDER BY c_name
               ) AS BIGINT) AS rn,
               {capacity_sql('c_mktsegment')} AS capacity
        FROM customer
    )
    SELECT r.c_custkey, r.segment, r.rn, r.capacity,
           h.webhook_id,
           h.webhook_id IS NOT NULL AS assigned
    FROM ranked r
    LEFT JOIN hooks h
      ON h.segment = r.segment
     AND h.hook_idx = CAST(FLOOR((r.rn - 1) / r.capacity) AS BIGINT)
    """,
)
def capacity_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_name")
    ranked = customer.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.row_number().over(w).cast("long").alias("rn"),
        capacity_for_segment(F.col("c_mktsegment")).alias("capacity"),
    )
    hooks = F.broadcast(_webhooks_dim(spark, sf_dir))
    bucket = F.floor((F.col("rn") - 1) / F.col("capacity"))
    return (
        ranked.join(
            hooks,
            on=(hooks.segment == ranked.segment)
            & (hooks.hook_idx == bucket),
            how="left",
        )
        .select(
            ranked.c_custkey,
            ranked.segment,
            ranked.rn,
            ranked.capacity,
            hooks.webhook_id,
            hooks.webhook_id.isNotNull().alias("assigned"),
        )
    )


# -- D1 invariants summary: per segment totals, per-webhook fill, and
#    the companiesNotAssigned remainder (send/route.ts:163-171).
@query(
    "distribution_summary",
    oracle=f"""
    WITH hooks AS ({_HOOKS_SQL}),
    ranked AS (
        SELECT c_custkey, c_mktsegment AS segment,
               CAST(row_number() OVER (
                   PARTITION BY c_mktsegment ORDER BY c_name
               ) AS BIGINT) AS rn,
               {capacity_sql('c_mktsegment')} AS capacity
        FROM customer
    ),
    assigned AS (
        SELECT r.segment,
               CASE WHEN h.webhook_id IS NULL THEN 0 ELSE 1 END AS is_assigned
        FROM ranked r
        LEFT JOIN hooks h
          ON h.segment = r.segment
         AND h.hook_idx = CAST(FLOOR((r.rn - 1) / r.capacity) AS BIGINT)
    )
    SELECT segment,
           COUNT(*) AS total,
           CAST(SUM(is_assigned) AS BIGINT) AS assigned_cnt,
           CAST(COUNT(*) - SUM(is_assigned) AS BIGINT)
               AS companies_not_assigned
    FROM assigned
    GROUP BY segment
    """,
)
def distribution_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = capacity_distribution(spark, sf_dir)
    return assigned.groupBy("segment").agg(
        F.count("*").alias("total"),
        F.sum(F.col("assigned").cast("int"))
        .cast("long")
        .alias("assigned_cnt"),
        (F.count("*") - F.sum(F.col("assigned").cast("int")))
        .cast("long")
        .alias("companies_not_assigned"),
    )


# -- F9 + C9: batch-metadata enrichment of the distributed rows.  The
#    struct carries a deterministic batch_id here; production path
#    stamps uuid()/current_timestamp (C1/C2) -- see operators.ledger.
@query(
    "egress_batch_metadata",
    oracle=f"""
    WITH hooks AS ({_HOOKS_SQL}),
    ranked AS (
        SELECT c_custkey, c_mktsegment AS segment,
               CAST(row_number() OVER (
                   PARTITION BY c_mktsegment ORDER BY c_name
               ) AS BIGINT) AS rn,
               {capacity_sql('c_mktsegment')} AS capacity
        FROM customer
    )
    SELECT r.c_custkey,
           'batch-0001' AS batch_id,
           r.segment AS employee_range,
           'webhook-' || CAST(h.webhook_id AS VARCHAR) AS webhook_name,
           'hq-data-warehouse' AS source
    FROM ranked r
    JOIN hooks h
      ON h.segment = r.segment
     AND h.hook_idx = CAST(FLOOR((r.rn - 1) / r.capacity) AS BIGINT)
    """,
)
def egress_batch_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = capacity_distribution(spark, sf_dir).filter("assigned")
    return assigned.select(
        "c_custkey",
        F.lit("batch-0001").alias("batch_id"),
        F.col("segment").alias("employee_range"),
        F.concat(F.lit("webhook-"), F.col("webhook_id").cast("string")).alias(
            "webhook_name"
        ),
        F.lit("hq-data-warehouse").alias("source"),
    )
