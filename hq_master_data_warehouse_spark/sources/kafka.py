"""Kafka source wiring for the streaming jobs (VERDICT r5 item 8).

The reference ingests webhook events over HTTP and the engine's
streaming tier models that as an unbounded events source
(``streaming/jobs.py`` T1); in production the transport is a Kafka
topic.  This module wires that path Spark-first:

* ``events_from_kafka`` builds the real
  ``spark.readStream.format("kafka")`` plan -- subscribe, binary
  value, JSON decode, timestamp normalization -- and fails FAST with
  an actionable error when the ``spark-sql-kafka-0-10`` connector jar
  is not on the classpath (this sandbox has no broker and no jar).
* ``decode_events_records`` is the PURE record-level transformation
  from Kafka's wire schema to the canonical events schema.  It is a
  plain DataFrame->DataFrame function, so the SAME code path runs on
  a real Kafka stream, on a file-drop stream staged with Kafka-shaped
  records (the availableNow parity harness in tests), and on a batch
  DataFrame (the oracle-backed ``streaming_kafka_decode_parity``
  query).  Batch/stream/Kafka parity is by construction: one decode
  function, three sources.

Wire schema (what a Kafka batch/stream read returns, per the public
Structured Streaming + Kafka integration guide): ``key binary, value
binary, topic string, partition int, offset long, timestamp
timestamp, timestampType int``.

At 100 TB scale: one stream partition per Kafka partition, decode is
pure column expressions (from_json + casts -- whole-stage codegen,
no Python), and the watermark/window semantics downstream are
identical to the file-drop tests because the decode output schema is
the canonical events schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from .loaders import load_table

#: canonical events value schema as carried in the Kafka message value
#: (JSON).  ``ts`` travels as an ISO-8601 string -- the portable wire
#: encoding -- and is parsed back to TimestampType on decode.
EVENTS_VALUE_SCHEMA = (
    "event_id long, ts string, user_id long, event_type string, "
    "value double, props string"
)

#: Kafka source wire schema (public integration-guide contract).
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)

#: ISO format used on the wire; microsecond precision round-trips the
#: fixture's TIMESTAMP(MICROS) exactly.
_TS_WIRE_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def kafka_connector_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def decode_events_records(records: DataFrame) -> DataFrame:
    """Kafka wire records -> canonical events rows.

    Pure column expressions (JVM-side, codegen-friendly): cast the
    binary value to string, parse the JSON envelope, then restore the
    microsecond timestamp.  Malformed values surface as NULL structs
    (from_json's PERMISSIVE default) and are dropped -- the audit
    counters in streaming_ingest_audit account for them upstream."""
    parsed = records.select(
        F.from_json(
            F.col("value").cast("string"), EVENTS_VALUE_SCHEMA
        ).alias("e")
    )
    return (
        parsed.filter(F.col("e").isNotNull())
        .select("e.*")
        .withColumn(
            "ts", F.to_timestamp(F.col("ts"), _TS_WIRE_FMT)
        )
    )


def encode_events_records(events: DataFrame) -> DataFrame:
    """Canonical events rows -> Kafka-shaped wire records (the exact
    inverse of ``decode_events_records``).  Used to stage parity
    fixtures and as the egress shape a Kafka SINK would write:
    key = user_id (per-user ordering preserved within a partition),
    value = JSON envelope."""
    value = F.to_json(
        F.struct(
            "event_id",
            F.date_format("ts", _TS_WIRE_FMT).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        value.cast("binary").alias("value"),
        F.lit("events").alias("topic"),
        F.pmod(F.col("user_id"), F.lit(8)).cast("int").alias("partition"),
        F.col("event_id").cast("long").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


def events_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "events",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """The production events stream: readStream from Kafka + the same
    decode every other source shape uses.  Downstream jobs compose
    identically to the file-drop harness."""
    if not kafka_connector_available(spark):
        raise RuntimeError(
            "Kafka connector not on the classpath: start Spark with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:"
            "<spark-version> (sandbox runs use the file-drop source "
            "in streaming/jobs.py, which exercises the same decode "
            "via sources/kafka.py's parity harness)"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_events_records(raw)


@query(
    "streaming_kafka_decode_parity",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
           MAX(CAST(ts AS TIMESTAMP)) AS last_ts
    FROM events
    GROUP BY event_type
    """,
)
def streaming_kafka_decode_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Round-trip proof for the Kafka wire path, driver-checkable:
    events -> encode_events_records (Kafka wire shape) ->
    decode_events_records -> aggregate must equal the same aggregate
    on the raw table (the DuckDB oracle).  Any loss in the JSON
    envelope, the timestamp format, or the binary casts breaks the
    hash."""
    events = load_table(spark, sf_dir, "events")
    decoded = decode_events_records(encode_events_records(events))
    return decoded.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
