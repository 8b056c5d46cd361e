"""Stratified sampling: seeded reproducibility + per-stratum rates."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.catalog import load_table
from ml_feature_store_enterprise_grade_spark.operators.projection import (
    _SAMPLE_FRACTIONS,
    stratified_event_sample,
)
from tests.conftest import SF_SMOKE


def test_sample_rates_and_determinism(spark):
    total = {
        r.event_type: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(F.col("user_id").isNotNull())
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    s1 = stratified_event_sample(spark, SF_SMOKE)
    got = {r.event_type: r.n for r in s1.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for t, frac in _SAMPLE_FRACTIONS.items():
        expected = total[t] * frac
        assert abs(got.get(t, 0) - expected) <= max(30, 0.2 * expected), (t, got.get(t), expected)
    # full-rate strata must be complete
    assert got["purchase"] == total["purchase"]
    # seeded ⇒ two runs identical
    s2 = stratified_event_sample(spark, SF_SMOKE)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
