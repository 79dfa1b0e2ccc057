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
