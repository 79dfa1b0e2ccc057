"""Predicate / projection family (SURVEY ops F1-F10, S2, C5-C8, C11).

Each reference predicate is a Catalyst column expression, so it is
pushed into the Parquet scan (``PushedFilters`` in ``.explain``) the
same way the reference pushes predicates into PostgREST querystrings
(src/app/api/companies/route.ts:21-23).  No driver-side evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import fan_out_scan
from ..sources.loaders import load_table


# -- F1: equality predicate -- eq('employee_range', range)
#    src/app/api/companies/route.ts:23
@query(
    "filter_eq_segment",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def filter_eq_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# -- F2: case-insensitive substring (ILIKE) -- ilike('%not sure%')
#    src/app/api/companies/route.ts:21
@query(
    "filter_ilike_substring",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders WHERE o_orderpriority ILIKE '%urgent%'
    """,
)
def filter_ilike_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").ilike("%urgent%"))
        .select("o_orderkey", "o_orderpriority")
    )


# -- F3: IS NULL predicate -- is('employee_range', null)
#    src/app/api/companies/route.ts:69.  Fixtures have no physical
#    NULLs, so the "unknown bucket" is exercised through NULLIF, which
#    still runs a genuine IS NULL filter over a nullable column.
@query(
    "filter_isnull_bucket",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders WHERE NULLIF(o_orderstatus, 'O') IS NULL
    """,
)
def filter_isnull_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "orders")
    return df.filter(
        F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull()
    ).select("o_orderkey", "o_orderstatus")


# -- F5: IN static list -- .in('id', batchIds), chunked by 100 in the
#    reference (src/app/api/send/route.ts:37-43); Spark needs no chunks.
@query(
    "filter_isin_list",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_isin_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


# -- F6: boolean flag filter -- is_active (supabase-schema.sql:9);
#    fixture derives the flag then filters it.
@query(
    "filter_boolean_flag",
    oracle="""
    SELECT event_id, user_id, is_active FROM (
        SELECT event_id, user_id, value > 100 AS is_active FROM events
    ) WHERE is_active
    """,
)
def filter_boolean_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("is_active", F.col("value") > 100)
        .filter("is_active")
        .select("event_id", "user_id", "is_active")
    )


# -- F8: field whitelist projection + NULL-coalesce + ''->NULL
#    clay-webhook/index.ts:76-91: ingest records are projected onto a
#    fixed allowed-field list; absent fields become NULL; JS `|| null`
#    also nullifies empty strings.  Role-play over documents with two
#    whitelisted-but-absent fields.
@query(
    "project_whitelist_coalesce",
    oracle="""
    SELECT
        doc_id,
        CASE WHEN length(trim(text)) = 0 THEN NULL ELSE text END AS text,
        CASE WHEN length(trim(lang)) = 0 THEN NULL ELSE lang END AS lang,
        CASE WHEN length(trim(source)) = 0 THEN NULL ELSE source END AS source,
        CAST(NULL AS VARCHAR) AS author,
        CAST(NULL AS VARCHAR) AS title
    FROM documents
    """,
)
def project_whitelist_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    present = {f.name for f in df.schema.fields}
    allowed = ["text", "lang", "source", "author", "title"]

    def norm(name: str):
        if name not in present:
            return F.lit(None).cast("string").alias(name)
        c = F.col(name)
        return (
            F.when(F.length(F.trim(c)) == 0, F.lit(None)).otherwise(c)
        ).alias(name)

    return df.select("doc_id", *[norm(f) for f in allowed])


# -- F10: validation predicates -- reject rows missing required fields
#    (src/app/api/webhooks/route.ts:27-32); engine counts rejects
#    instead of raising, mirroring the audit-log pattern.
@query(
    "filter_validation_counts",
    oracle="""
    SELECT
        COUNT(*) AS total,
        COUNT(*) FILTER (WHERE text IS NOT NULL
                         AND length(trim(text)) > 0) AS valid,
        COUNT(*) FILTER (WHERE text IS NULL
                         OR length(trim(text)) = 0) AS rejected
    FROM documents
    """,
)
def filter_validation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents")
    ok = F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    return df.agg(
        F.count("*").alias("total"),
        F.count(F.when(ok, 1)).alias("valid"),
        F.count(F.when(~ok, 1)).alias("rejected"),
    )


# -- C2-C8, C11: scalar function surface in one projection (current
#    timestamp/uuid excluded: nondeterministic, covered by ledger ops).
@query(
    "scalar_functions_showcase",
    oracle="""
    SELECT
        o_orderkey,
        strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_ts,
        CAST(FLOOR(40000 / (o_orderkey % 100 + 1)) AS BIGINT) AS floor_div,
        LEAST(o_totalprice, 100000.0) AS capped_price,
        trim(o_orderpriority) AS trimmed,
        substring(o_orderpriority, 1, 3) AS prefix3,
        contains(lower(o_orderstatus), 'f') AS has_f,
        COALESCE(NULLIF(o_orderstatus, 'O'), 'unknown') AS status_or_unknown,
        COALESCE(TRY_CAST(o_orderpriority AS INT), 100) AS int_with_default
    FROM orders
    """,
)
def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 (guide par.2.5): the per-row scalar surface ran on ONE task
    # (2.0 s CPU = the whole cell) over the single-split fixture scan;
    # conditional fan-out on the 5-column projection, no-op at
    # production split counts.
    df = fan_out_scan(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "o_orderpriority",
            "o_orderstatus",
        )
    )
    return df.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
        F.floor(F.lit(40000) / (F.col("o_orderkey") % 100 + 1)).alias(
            "floor_div"
        ),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("capped_price"),
        F.trim("o_orderpriority").alias("trimmed"),
        F.substring("o_orderpriority", 1, 3).alias("prefix3"),
        F.contains(F.lower("o_orderstatus"), F.lit("f")).alias("has_f"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("unknown")
        ).alias("status_or_unknown"),
        F.coalesce(
            F.col("o_orderpriority").try_cast("int"), F.lit(100)
        ).alias("int_with_default"),
    )


# -- C12: thousands-separated display formatting (page.tsx:378-384
#    toLocaleString) as engine surface: Spark's format_number vs a
#    DuckDB integer-decomposition twin ('{:,d}' only groups integers,
#    so the oracle splits |cents| and re-attaches the sign).  Inputs
#    are exact 2-decimal money, so both engines round identically.
@query(
    "display_format_number",
    oracle="""
    WITH seg AS (
        SELECT c_mktsegment,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
                   AS total_bal,
               COUNT(*) AS n_customers
        FROM customer GROUP BY c_mktsegment
    ),
    cents AS (
        SELECT *, CAST(ROUND(ABS(total_bal) * 100) AS BIGINT) AS c
        FROM seg
    )
    SELECT c_mktsegment, n_customers,
           concat(CASE WHEN total_bal < 0 THEN '-' ELSE '' END,
                  format('{:,d}.{:02d}', c // 100, c % 100))
               AS display_total
    FROM cents
    """,
)
def display_format_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(30,4)"))
            .cast("double")
            .alias("total_bal"),
            F.count("*").alias("n_customers"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            F.format_number(F.col("total_bal"), 2).alias("display_total"),
        )
    )
