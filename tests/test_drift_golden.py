"""Golden behavioral scenarios for the distributed KS operator —
the reference ships a 3-scenario seeded demo as its statistical
regression test (reference scripts/drift_detection.py:289-328:
Poisson(15) vs itself → no drift; Poisson(15) vs Poisson(25) → mean
shift; Normal(15,2) vs Normal(15,8) → variance shift; seed 42,
min-sample guard n<10 at :40-46)."""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest
from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.operators.drift import ks_2samp

RNG = np.random.default_rng(42)


def _ks(spark, a: np.ndarray, b: np.ndarray):
    rows = [(float(x), 1) for x in a] + [(float(x), 0) for x in b]
    df = spark.createDataFrame(rows, "x double, is1 int")
    return ks_2samp(df, "x", F.col("is1")).first()


def test_no_drift_same_distribution(spark):
    a = RNG.poisson(15, 1000).astype(float)
    b = RNG.poisson(15, 1000).astype(float)
    r = _ks(spark, a, b)
    assert r.n1 == 1000 and r.n2 == 1000
    assert not r.drift_detected, f"false positive: D={r.ks_stat} p={r.p_value}"


def test_mean_shift_detected(spark):
    a = RNG.poisson(15, 1000).astype(float)
    b = RNG.poisson(25, 1000).astype(float)
    r = _ks(spark, a, b)
    assert r.drift_detected and r.ks_stat > 0.5


def test_variance_shift_detected(spark):
    a = RNG.normal(15, 2, 1000)
    b = RNG.normal(15, 8, 1000)
    r = _ks(spark, a, b)
    assert r.drift_detected and r.ks_stat > 0.2


def test_degenerate_single_value(spark):
    """lo == hi branch of the bucketed prefix sum: one distinct value
    in both samples ⇒ D = 0, no drift."""
    r = _ks(spark, np.full(20, 7.0), np.full(30, 7.0))
    assert r.ks_stat == 0.0 and not r.drift_detected
    assert (r.n1, r.n2) == (20, 30)


def test_degenerate_disjoint_singletons(spark):
    """Two distinct values, fully separated samples ⇒ D = 1."""
    r = _ks(spark, np.full(10, 1.0), np.full(10, 2.0))
    assert r.ks_stat == 1.0 and r.drift_detected


@pytest.mark.skipif(
    importlib.util.find_spec("scipy") is None,
    reason=(
        "scipy is not installed in this container — this test cross-checks "
        "the distributed KS statistic against scipy.stats.ks_2samp when a "
        "scipy IS present; the exact-path coverage lives in the golden "
        "scenarios above, which always run"
    ),
)
def test_matches_scipy_if_available(spark):
    import scipy.stats as scipy_stats

    a = RNG.normal(0, 1, 500)
    b = RNG.normal(0.3, 1, 500)
    r = _ks(spark, a, b)
    ref = scipy_stats.ks_2samp(a, b)
    assert abs(r.ks_stat - ref.statistic) < 1e-6


def test_min_sample_guard(spark):
    """Reference guard (scripts/drift_detection.py:40-46): fewer than
    min_samples in either sample ⇒ the reference's exact degenerate
    report (False, 0.0, 1.0), not just an unflagged statistic."""
    from ml_feature_store_enterprise_grade_spark.operators.drift import ks_2samp as _ks2
    from pyspark.sql import functions as _F

    rows = [(1.0, 1)] * 5 + [(9.0, 0)] * 50  # D = 1.0 but n1 = 5
    df = spark.createDataFrame(rows, "x double, is1 int")
    guarded = _ks2(df, "x", _F.col("is1"), min_samples=10).first()
    assert guarded.ks_stat == 0.0
    assert guarded.p_value == 1.0
    assert not guarded.drift_detected
    unguarded = _ks2(df, "x", _F.col("is1")).first()
    assert unguarded.ks_stat == 1.0 and unguarded.drift_detected


def test_min_sample_guard_keyed(spark):
    """The keyed variant guards per feature: an under-sampled feature
    zeroes out while a well-sampled one still reports, in one pass."""
    from ml_feature_store_enterprise_grade_spark.operators.drift import ks_2samp_keyed
    from pyspark.sql import functions as _F

    rows = [("tiny", 1.0, 1)] * 5 + [("tiny", 9.0, 0)] * 50
    rows += [("big", 1.0, 1)] * 40 + [("big", 9.0, 0)] * 40
    df = spark.createDataFrame(rows, "feature string, x double, is1 int")
    out = {
        r.feature: r
        for r in ks_2samp_keyed(df, "feature", "x", _F.col("is1"), min_samples=10).collect()
    }
    assert out["tiny"].ks_stat == 0.0 and out["tiny"].p_value == 1.0
    assert not out["tiny"].drift_detected
    assert out["tiny"].severity == "negligible"
    assert out["big"].ks_stat == 1.0 and out["big"].drift_detected
    assert out["big"].severity == "very large"
