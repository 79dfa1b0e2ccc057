"""Batch/stream parity: the streaming engine must produce the same
windowed results as the batch plan over the same events (T1), and
keyed dedup must yield one row per key (T4)."""

from __future__ import annotations

from hq_master_data_warehouse_spark.sources.loaders import load_table
from hq_master_data_warehouse_spark.streaming.jobs import (
    events_tumbling_window,
    streaming_dedup_by_key,
    streaming_tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark):
    stream_rows = {
        (r.window_start, r.event_type): r.cnt
        for r in streaming_tumbling_counts(spark, SF).collect()
    }
    batch_rows = {
        (r.window_start, r.event_type): r.cnt
        for r in events_tumbling_window(spark, SF).collect()
    }
    assert stream_rows == batch_rows


def test_stream_dedup_one_row_per_key(spark):
    out = streaming_dedup_by_key(spark, SF)
    users = [r.user_id for r in out.collect()]
    assert len(users) == len(set(users))
    batch_users = {
        r.user_id
        for r in load_table(spark, SF, "events").select("user_id").distinct().collect()
    }
    assert set(users) == batch_users


def test_stateful_running_totals_match_batch(spark):
    from pyspark.sql import functions as F

    from hq_master_data_warehouse_spark.streaming.jobs import (
        streaming_stateful_running_totals,
    )

    out = {
        r.user_id: (r.n_events, r.total_value)
        for r in streaming_stateful_running_totals(spark, SF).collect()
    }
    batch = {
        r.user_id: (r.n, round(r.total, 4))
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("total"),
        )
        .collect()
    }
    assert set(out) == set(batch)
    for uid, (n, total) in batch.items():
        assert out[uid][0] == n
        assert abs(out[uid][1] - total) < 1e-3


def test_stream_static_join_matches_batch(spark):
    from pyspark.sql import functions as F

    from hq_master_data_warehouse_spark.streaming.jobs import (
        streaming_static_enrich_join,
    )

    out = {
        r.c_mktsegment: r.n_events
        for r in streaming_static_enrich_join(spark, SF).collect()
    }
    events = load_table(spark, SF, "events")
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = {
        r.c_mktsegment: r.n_events
        for r in events.join(dim, "user_id", "left")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert out == batch
