"""Invariant/property tests for the D1 distribution operator
(SURVEY.md par.5.2): capacity respected, totals conserved, fill order
preserved, and send-twice idempotence (T4)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hq_master_data_warehouse_spark.functions.buckets import SEGMENT_MAX
from hq_master_data_warehouse_spark.operators.distribution import (
    capacity_distribution,
)
from hq_master_data_warehouse_spark.operators.ledger import (
    append_ledger,
    new_send_records,
    unsent_companies,
)
from hq_master_data_warehouse_spark.schemas import SAFE_PEOPLE_LIMIT
from hq_master_data_warehouse_spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assigned(spark):
    return capacity_distribution(spark, SF).cache()


def test_no_webhook_over_capacity(assigned):
    """(i) no webhook receives more than floor(40000/max) companies."""
    per_hook = (
        assigned.filter("assigned")
        .groupBy("segment", "webhook_id")
        .agg(F.count("*").alias("got"), F.first("capacity").alias("cap"))
    )
    over = per_hook.filter(F.col("got") > F.col("cap")).count()
    assert over == 0


def test_totals_conserved(assigned):
    """(ii) assigned + not-assigned = input count (route.ts:170)."""
    total = assigned.count()
    n_assigned = assigned.filter("assigned").count()
    n_not = assigned.filter(~F.col("assigned")).count()
    assert n_assigned + n_not == total
    assert total == assigned.sparkSession.read.parquet(
        f"{SF}/customer.parquet"
    ).count()


def test_fill_order_preserved(assigned):
    """(iii) within a segment, earlier names land in lower-or-equal
    webhook buckets (sequential fill)."""
    rows = (
        assigned.filter("assigned")
        .select("segment", "rn", (F.col("rn") - 1) / F.col("capacity"))
        .collect()
    )
    buckets = {}
    for seg, rn, bucket in rows:
        buckets.setdefault(seg, []).append((rn, int(bucket)))
    for seg, pairs in buckets.items():
        pairs.sort()
        bucket_seq = [b for _, b in pairs]
        assert bucket_seq == sorted(bucket_seq), f"fill order broken in {seg}"


def test_capacity_matches_reference_formula(assigned):
    caps = {
        r["segment"]: r["capacity"]
        for r in assigned.select("segment", "capacity").distinct().collect()
    }
    for seg, cap in caps.items():
        assert cap == SAFE_PEOPLE_LIMIT // SEGMENT_MAX[seg]


def test_send_twice_is_noop(spark):
    """(iv) T4: after recording sends in the ledger, re-running the
    selection sends nothing new."""
    tmp = tempfile.mkdtemp(prefix="ledger_")
    try:
        customers = load_table(spark, SF, "customer")
        assigned = capacity_distribution(spark, SF).filter("assigned")
        append_ledger(new_send_records(assigned, "batch-1"), tmp)

        ledger = spark.read.parquet(tmp)
        remaining = unsent_companies(customers, ledger)
        # every remaining customer is one that was NOT assigned
        assigned_keys = {r.c_custkey for r in assigned.collect()}
        remaining_keys = {r.c_custkey for r in remaining.collect()}
        assert remaining_keys.isdisjoint(assigned_keys)

        # idempotence: distributing the remainder and recording again
        # adds no duplicate company rows
        append_ledger(new_send_records(assigned, "batch-2"), tmp)
        ledger2 = spark.read.parquet(tmp)
        dupes_per_batch = (
            ledger2.groupBy("company_id", "batch_id").count().filter("count > 1")
        )
        assert dupes_per_batch.count() == 0
        assert unsent_companies(customers, ledger2).count() == len(
            remaining_keys
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_ledger_status_records_actual(spark):
    """M4 design decision: per-row actual status, not blanket 'sent'."""
    all_rows = capacity_distribution(spark, SF)
    recs = new_send_records(all_rows, "batch-x")
    statuses = {r["status"] for r in recs.select("status").distinct().collect()}
    assert statuses <= {"sent", "skipped"}
    n_skip = recs.filter("status = 'skipped'").count()
    assert n_skip == all_rows.filter(~F.col("assigned")).count()
