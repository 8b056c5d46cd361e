"""Skew utilities must be drop-in equivalent to the direct forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.catalog import load_table
from ml_feature_store_enterprise_grade_spark.functions.skew import (
    exact_distinct_two_stage,
    salted_join,
)
from tests.conftest import SF_SMOKE


def test_two_stage_distinct_matches_direct(spark):
    e = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id").isNotNull())
    got = exact_distinct_two_stage(e, ["user_id"], "event_type")
    want = e.groupBy("user_id").agg(F.countDistinct("event_type").alias("n_distinct"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_salted_join_matches_plain_join(spark):
    e = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id").isNotNull())
    c = (
        load_table(spark, SF_SMOKE, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    got = (
        salted_join(e, c, "user_id", n_salt=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    want = (
        e.join(c, "user_id")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
