"""Kafka streaming source/sink (S1/S7) — the production ingest path.

Mirrors the reference's Kafka wiring (reference
spark/apps/clickstream_aggregation.py:69-79: subscribe
``user_clicks``, latest offsets, tolerate data loss; producer
scripts/stream_generator.py:141-148,219-231: JSON values keyed by
user_id, acks=all) as engine functions.  The JSON-parse projection
(CAST value → from_json(schema) → flatten, reference :87-91) is the
P1-P3 operator chain.

This container has no Kafka broker or spark-sql-kafka package, so
these builders are exercised by schema/plan tests only
(``tests/test_operators.py``); the deterministic replay twin —
file-source + ``Trigger.availableNow`` (streaming/clickstream.py) —
carries the oracle-checked semantics.  The query graph downstream of
the source is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DEFAULT_TOPIC = "user_clicks"


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = DEFAULT_TOPIC,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """S1: subscribe to the event topic (raw Kafka frame:
    key/value/topic/partition/offset/timestamp)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
        .load()
    )


def parse_json_events(raw: DataFrame, schema: StructType, ts_field: str = "ts") -> DataFrame:
    """P1-P5: CAST binary value to string, parse with the declared
    schema, flatten, and permissively parse the event timestamp
    (exact-format attempt with a tolerant fallback, reference
    clickstream_aggregation.py:93-104)."""
    flat = (
        raw.selectExpr("CAST(value AS STRING) AS json_value")
        .select(F.from_json("json_value", schema).alias("data"))
        .select("data.*")
    )
    if ts_field in flat.columns:
        # try_to_timestamp, not to_timestamp: under ANSI (Spark 4
        # default) a format mismatch throws, which would defeat the
        # reference's coalesce-fallback intent.
        flat = flat.withColumn(
            ts_field,
            F.coalesce(
                F.try_to_timestamp(F.col(ts_field), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")),
                F.try_to_timestamp(F.col(ts_field)),
            ),
        )
    return flat


def kafka_sink(df: DataFrame, brokers: str, topic: str, checkpoint: str, key_col: str = "user_id"):
    """S7: JSON-serialized events keyed by ``key_col``; returns the
    started StreamingQuery."""
    payload = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
