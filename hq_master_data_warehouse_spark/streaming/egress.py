"""Rate-limited HTTP JSON egress sink (SURVEY ops S9, T3, F9, C9).

Reference behavior (src/app/api/send/route.ts:90-134): per webhook,
POST one JSON document per company in chunks of RATE_LIMIT=10 with a
1,000 ms sleep between chunks (:5-7), collecting ok/fail per row
(:125-128); a ``skipWebhooks`` flag (:13,94-95) dry-runs the sink and
counts everything as sent.

Spark disposition (SURVEY.md par.4.2): a *sink*, not a planner
concern.  ``mapPartitions`` posts each partition's rows through an
injectable transport with a per-partition token bucket; the cluster-
wide rate is ``rate_limit_per_sec`` divided across partitions, so the
destination sees at most the reference's aggregate rate no matter how
many executors fan out.  Results come back as a DataFrame (one row per
attempted POST) so the A3 tally and the S6 ledger append are ordinary
downstream aggregations -- per-row ACTUAL status, not the reference's
blanket 'sent' (route.ts:146).

The transport is a plain callable ``(url, payload_json) -> bool`` so
tests inject a recorder and production injects urllib/requests; the
engine itself never imports an HTTP client (no hidden network deps).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

#: reference rate constants -- send/route.ts:5-7
RATE_LIMIT = 10
RATE_INTERVAL_SEC = 1.0

RESULT_SCHEMA = (
    "company_id string, webhook_id string, webhook_url string, ok boolean"
)

Transport = Callable[[str, str], bool]


def build_payloads(assigned: DataFrame, batch_id: str) -> DataFrame:
    """F9+C9: enrich each assigned row with the _batch_metadata struct
    (send/route.ts:102-111) and serialize the full document to JSON."""
    with_meta = assigned.withColumn(
        "_batch_metadata",
        F.struct(
            F.lit(batch_id).alias("batch_id"),
            F.date_format(
                F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
            ).alias("batch_timestamp"),
            F.col("segment").alias("employee_range"),
            F.concat(F.lit("webhook-"), F.col("webhook_id")).alias(
                "webhook_name"
            ),
            F.lit("hq-data-warehouse").alias("source"),
        ),
    )
    return with_meta.select(
        F.col("c_custkey").cast("string").alias("company_id"),
        F.col("webhook_id").cast("string").alias("webhook_id"),
        F.concat(F.lit("https://example.invalid/hooks/"), F.col("webhook_id"))
        .alias("webhook_url"),
        F.to_json(F.struct("*")).alias("payload"),
    )


def post_with_rate_limit(
    payloads: DataFrame,
    transport: Transport | None = None,
    skip_webhooks: bool = False,
    rate_limit_per_sec: int = RATE_LIMIT,
) -> DataFrame:
    """S9/T3: fan out POSTs with a token bucket per partition.

    ``skip_webhooks=True`` reproduces the reference's dry-run flag
    (route.ts:13): no transport calls, every row counted ok.
    """
    spark = payloads.sparkSession
    n_parts = max(payloads.rdd.getNumPartitions(), 1)
    per_partition_rate = max(rate_limit_per_sec / n_parts, 0.1)

    def run_partition(rows: Iterator[Row]) -> Iterator[Row]:
        sent_in_window = 0
        window_start = time.monotonic()
        for row in rows:
            if skip_webhooks:
                ok = True
            else:
                if sent_in_window >= per_partition_rate:
                    elapsed = time.monotonic() - window_start
                    if elapsed < RATE_INTERVAL_SEC:
                        time.sleep(RATE_INTERVAL_SEC - elapsed)
                    sent_in_window = 0
                    window_start = time.monotonic()
                try:
                    ok = bool(transport(row.webhook_url, row.payload))
                except Exception:
                    ok = False
                sent_in_window += 1
            yield Row(
                company_id=row.company_id,
                webhook_id=row.webhook_id,
                webhook_url=row.webhook_url,
                ok=ok,
            )

    if transport is None and not skip_webhooks:
        raise ValueError(
            "post_with_rate_limit needs a transport unless "
            "skip_webhooks=True (the reference's dry-run flag)"
        )
    rdd = payloads.rdd.mapPartitions(run_partition)
    return spark.createDataFrame(rdd, RESULT_SCHEMA)


def post_with_retry(
    payloads: DataFrame,
    transport_factory: Callable[[int], Transport],
    max_attempts: int = 3,
    rate_limit_per_sec: int = RATE_LIMIT,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """At-least-once egress: attempt, audit, retry failures, dead-letter
    what is left (clay-webhook/index.ts:98-141 -- errors are LOGGED
    per batch, never dropped; the DLQ replaces the reference's manual
    replay from the error audit).

    ``transport_factory(attempt)`` supplies the transport for each
    attempt so tests can model transient vs permanent failures
    deterministically.  The loop unrolls into ONE DataFrame DAG
    (max_attempts is a small constant, as in any sane retry policy);
    each attempt's results are cached so the side-effecting POST runs
    once per row per attempt even though three downstream consumers
    (delivered, audit, next-attempt pending) read them.

    Returns ``(delivered, dead_letter, audit)``: delivered rows with
    the attempt that succeeded, the undeliverable remainder, and one
    audit row per attempt (n_attempted / n_delivered / n_failed).

    Retries key on ``(company_id, webhook_id)``, so those keys MUST be
    unique in ``payloads`` -- with duplicates, one failed duplicate
    would re-send every row sharing the key and the delivered/DLQ
    disjointness accounting breaks.  The precondition is enforced here
    by failing fast: silently deduplicating would pick an arbitrary
    payload body per key and the dropped bodies would reach neither
    delivered, DLQ, nor audit -- an unacceptable silent loss for an
    at-least-once channel.
    """
    n_dup = (
        payloads.groupBy("company_id", "webhook_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    if n_dup:
        raise ValueError(
            f"payloads contain {n_dup} duplicate (company_id, "
            "webhook_id) keys; deduplicate upstream (choosing which "
            "payload body wins) before calling post_with_retry"
        )
    pending = payloads
    delivered_parts: list[DataFrame] = []
    audit_parts: list[DataFrame] = []
    for attempt in range(1, max_attempts + 1):
        res = post_with_rate_limit(
            pending,
            transport_factory(attempt),
            rate_limit_per_sec=rate_limit_per_sec,
        ).cache()
        delivered_parts.append(
            res.filter(F.col("ok")).withColumn(
                "attempt", F.lit(attempt)
            )
        )
        audit_parts.append(
            res.agg(
                F.count("*").alias("n_attempted"),
                # coalesce: SUM over an empty attempt is NULL, but an
                # audit row should read 0 delivered / 0 failed
                F.coalesce(
                    F.sum(F.when(F.col("ok"), 1).otherwise(0)), F.lit(0)
                )
                .cast("long")
                .alias("n_delivered"),
                F.coalesce(
                    F.sum(F.when(~F.col("ok"), 1).otherwise(0)),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_failed"),
            ).select(F.lit(attempt).alias("attempt"), "*")
        )
        failed_keys = res.filter(~F.col("ok")).select(
            "company_id", "webhook_id"
        )
        pending = payloads.join(
            failed_keys, ["company_id", "webhook_id"], "left_semi"
        )
    delivered = delivered_parts[0]
    for part in delivered_parts[1:]:
        delivered = delivered.unionByName(part)
    audit = audit_parts[0]
    for part in audit_parts[1:]:
        audit = audit.unionByName(part)
    return delivered, pending, audit


def egress_tally(results: DataFrame) -> DataFrame:
    """A3: per-webhook sent/failed counters (send/route.ts:125-128)."""
    return results.groupBy("webhook_id").agg(
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("sent"),
        F.sum(F.when(~F.col("ok"), 1).otherwise(0)).alias("failed"),
    )
