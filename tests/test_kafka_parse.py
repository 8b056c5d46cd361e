"""The Kafka JSON-parse chain (P1-P5), tested batch-side: the parse
projection is source-agnostic, so we feed it rows shaped like the
raw Kafka frame (binary value) and assert schema-on-read semantics —
missing fields → NULL, both timestamp-parse branches exercised."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ml_feature_store_enterprise_grade_spark.sources.kafka import parse_json_events

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _raw(spark, events):
    return spark.createDataFrame(
        [(json.dumps(e).encode("utf-8"),) for e in events], "value binary"
    )


def test_parse_flatten_and_null_for_missing(spark):
    raw = _raw(
        spark,
        [
            {"user_id": 1, "event_type": "click", "ts": "2024-01-01T10:00:00.000123Z", "value": 2.5},
            {"user_id": 2, "event_type": "view", "ts": "2024-01-01 11:30:00"},  # no value
        ],
    )
    out = parse_json_events(raw, SCHEMA)
    rows = {r.user_id: r for r in out.collect()}
    assert rows[1].value == 2.5 and rows[2].value is None  # sparse wide-row NULLs
    # microsecond-format branch:
    assert rows[1].ts.isoformat() == "2024-01-01T10:00:00.000123"
    # permissive fallback branch:
    assert rows[2].ts.isoformat() == "2024-01-01T11:30:00"


def test_unparseable_row_yields_nulls_not_failure(spark):
    raw = _raw(spark, [])
    raw = raw.union(
        raw.sparkSession.createDataFrame([(b"not json",)], "value binary")
    )
    out = parse_json_events(raw, SCHEMA)
    assert out.count() == 1
    assert out.first().user_id is None
