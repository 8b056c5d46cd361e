"""HLL sketch rollup: merged daily sketches must estimate the true
month-level distinct count within HLL's error bound (lgK=14 ⇒ rsd
≈ 0.8%; assert a loose 5%)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.catalog import load_table
from ml_feature_store_enterprise_grade_spark.operators.feature_agg import (
    sketch_distinct_users_rollup,
)
from tests.conftest import SF_SMOKE


def test_sketch_union_estimates_within_error(spark):
    got = {
        r.event_type: r.approx_distinct_users
        for r in sketch_distinct_users_rollup(spark, SF_SMOKE).collect()
    }
    e = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id").isNotNull())
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(got) == set(exact)
    for t, est in got.items():
        assert abs(est - exact[t]) / exact[t] < 0.05, (t, est, exact[t])
