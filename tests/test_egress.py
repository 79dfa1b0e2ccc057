"""Egress sink tests (S9/T3): dry-run flag, per-row status, tally,
rate limiting, and payload shape -- mirroring send/route.ts:90-138."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from hq_master_data_warehouse_spark.operators.distribution import (
    capacity_distribution,
)
from hq_master_data_warehouse_spark.streaming.egress import (
    build_payloads,
    egress_tally,
    post_with_rate_limit,
)

SF = "/root/testdata/sf0.001"


def _payloads(spark, limit=None):
    assigned = capacity_distribution(spark, SF).filter("assigned")
    if limit:
        assigned = assigned.limit(limit)
    return build_payloads(assigned, "batch-test")


def test_skip_webhooks_dry_run(spark):
    """skipWebhooks counts everything as sent without any transport."""
    payloads = _payloads(spark)
    results = post_with_rate_limit(payloads, skip_webhooks=True)
    assert results.filter(~F.col("ok")).count() == 0
    assert results.count() == payloads.count()


def test_transport_failures_recorded_per_row(spark):
    """Failed POSTs are per-row 'failed', not blanket 'sent'."""
    payloads = _payloads(spark, limit=20).coalesce(1)

    def flaky(url, payload):
        return json.loads(payload)["company_id"] >= "1"  # fails some

    results = post_with_rate_limit(
        payloads, transport=flaky, rate_limit_per_sec=10_000
    ).cache()
    oks = results.filter("ok").count()
    fails = results.filter("NOT ok").count()
    assert oks + fails == 20
    assert fails > 0
    tally = egress_tally(results)
    total = tally.agg(
        F.sum("sent").alias("s"), F.sum("failed").alias("f")
    ).collect()[0]
    assert total.s == oks and total.f == fails


def test_rate_limit_throttles(spark):
    """25 posts at 10/s through one partition needs >= ~2 sleep windows."""
    payloads = _payloads(spark, limit=25).coalesce(1)
    t0 = time.monotonic()
    n = post_with_rate_limit(
        payloads, transport=lambda u, p: True, rate_limit_per_sec=10
    ).count()
    elapsed = time.monotonic() - t0
    assert n == 25
    assert elapsed >= 1.5  # two full rate windows crossed


def test_payload_carries_batch_metadata(spark):
    row = _payloads(spark, limit=1).collect()[0]
    doc = json.loads(row.payload)
    meta = doc["_batch_metadata"]
    assert meta["batch_id"] == "batch-test"
    assert meta["source"] == "hq-data-warehouse"
    assert meta["webhook_name"].startswith("webhook-")


def test_retry_delivers_transient_and_dead_letters_permanent(spark):
    """post_with_retry: transient failures succeed on a later attempt,
    permanent failures land in the DLQ, audit accounts for every row."""
    from hq_master_data_warehouse_spark.streaming.egress import (
        post_with_retry,
    )

    payloads = _payloads(spark, limit=30).cache()
    n = payloads.count()

    def factory(attempt):
        def transport(url, payload):
            cid = int(json.loads(payload)["c_custkey"])
            if cid % 5 == 0:
                return False  # permanent: fails every attempt
            if cid % 3 == 0:
                return attempt >= 2  # transient: first attempt fails
            return True

        return transport

    delivered, dlq, audit = post_with_retry(
        payloads, factory, max_attempts=3, rate_limit_per_sec=10_000
    )
    delivered_rows = delivered.collect()
    dlq_keys = {r.company_id for r in dlq.collect()}
    # every payload is either delivered exactly once or dead-lettered
    assert len(delivered_rows) + len(dlq_keys) == n
    assert {r.company_id for r in delivered_rows}.isdisjoint(dlq_keys)
    # permanent failures (cid % 5 == 0) are exactly the DLQ
    assert dlq_keys == {
        r.company_id
        for r in payloads.collect()
        if int(r.company_id) % 5 == 0
    }
    # transient failures delivered on attempt 2, the rest on attempt 1
    for r in delivered_rows:
        cid = int(r.company_id)
        assert r.attempt == (2 if cid % 3 == 0 and cid % 5 != 0 else 1)
    # audit: attempted counts telescope (attempt k+1 = failures of k)
    a = {r.attempt: r for r in audit.collect()}
    assert a[1].n_attempted == n
    assert a[2].n_attempted == a[1].n_failed
    assert a[3].n_attempted == a[2].n_failed


def test_retry_rejects_duplicate_keys(spark):
    """post_with_retry fails fast on duplicate (company_id, webhook_id)
    keys: silently deduplicating would deliver an arbitrary payload
    body and the dropped bodies would reach neither delivered, DLQ,
    nor audit."""
    import pytest

    from hq_master_data_warehouse_spark.streaming.egress import (
        post_with_retry,
    )

    payloads = _payloads(spark, limit=5)
    dup = payloads.unionByName(
        payloads.limit(1).withColumn(
            "payload", F.lit('{"body": "different"}')
        )
    )
    with pytest.raises(ValueError, match="duplicate"):
        post_with_retry(
            dup, lambda attempt: (lambda url, p: True), max_attempts=1
        )
