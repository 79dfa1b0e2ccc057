"""Kafka source wiring parity (VERDICT r5 item 8 tier-1).

No broker or connector jar exists in the sandbox, so the tests drive
the SAME decode path three ways:

1. batch round-trip (events -> encode -> decode == events),
2. a real availableNow STREAM over a file-drop staged with
   Kafka-wire-shaped records -- proving the decode composes with the
   streaming engine exactly as it would on format("kafka"),
3. the connector-absent guard raises the actionable error.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from hq_master_data_warehouse_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    decode_events_records,
    encode_events_records,
    events_from_kafka,
    kafka_connector_available,
)
from hq_master_data_warehouse_spark.sources.loaders import load_table

SF = "/root/testdata/sf0.001"


def test_batch_roundtrip_is_lossless(spark):
    events = load_table(spark, SF, "events")
    back = decode_events_records(encode_events_records(events))
    assert back.schema.simpleString() == events.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ).schema.simpleString()
    orig = {tuple(r) for r in events.collect()}
    rt = {tuple(r) for r in back.collect()}
    assert rt == orig


def test_wire_records_match_kafka_contract(spark):
    events = load_table(spark, SF, "events")
    wire = encode_events_records(events)
    assert wire.schema.simpleString() == (
        "struct<key:binary,value:binary,topic:string,partition:int,"
        "offset:bigint,timestamp:timestamp,timestampType:int>"
    )
    row = wire.limit(1).collect()[0]
    assert isinstance(row.key, (bytes, bytearray))
    assert row.value.decode("utf-8").startswith("{")
    assert 0 <= row.partition < 8


def test_streamed_kafka_records_decode_to_batch_result(spark):
    """availableNow parity harness: Kafka-shaped records staged as
    parquet, consumed via readStream with the wire schema, decoded by
    the SAME decode_events_records, aggregated with the streaming
    engine -- must equal the batch aggregate on the raw table."""
    events = load_table(spark, SF, "events")
    drop = os.path.join(
        tempfile.gettempdir(), f"hqmdw_kafka_{uuid.uuid4().hex[:8]}"
    )
    try:
        encode_events_records(events).write.mode("overwrite").parquet(
            drop
        )
        stream = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(
            drop
        )
        agg = decode_events_records(stream).groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)")).alias("total"),
        )
        name = f"kafka_parity_{uuid.uuid4().hex[:8]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        streamed = {
            tuple(r) for r in spark.table(name).collect()
        }
        batch = {
            tuple(r)
            for r in events.groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.col("value").cast("decimal(20,2)")
                ).alias("total"),
            )
            .collect()
        }
        assert streamed == batch
    finally:
        shutil.rmtree(drop, ignore_errors=True)


def test_connector_absent_guard_is_actionable(spark):
    if kafka_connector_available(spark):  # pragma: no cover
        pytest.skip("connector present in this environment")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        events_from_kafka(spark, "localhost:9092")
