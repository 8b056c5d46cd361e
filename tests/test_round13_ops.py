"""Round-13 regressions: the census cache clear hook (ADVICE r12
item 1), the TakeOrdered re-plans of the unpartitioned row_number
census family (VERDICT r12 item 2), and the full-registry plan
flag-audit parser (VERDICT r12 item 4)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F
from pyspark.sql import Window

from ml_feature_store_enterprise_grade_spark.catalog import clear_count_cache
from ml_feature_store_enterprise_grade_spark.registry import any_query, load_all

from conftest import SF_SMOKE

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

load_all()


# ---------------------------------------------------------------- #
# ADVICE r12 item 1: clear_count_cache must also drop the census    #
# ---------------------------------------------------------------- #


def test_clear_count_cache_drops_census_memos(spark):
    from ml_feature_store_enterprise_grade_spark.operators.text import (
        _UNIGRAM_CENSUS_CACHE,
        _unigram_census,
    )

    a = _unigram_census(spark, SF_SMOKE)
    assert _unigram_census(spark, SF_SMOKE) is a
    # Clearing a DIFFERENT sf_dir must not evict this one.
    clear_count_cache("/definitely/not/a/real/dir")
    assert _unigram_census(spark, SF_SMOKE) is a
    # Clearing the census's own sf_dir must evict it.
    clear_count_cache(SF_SMOKE)
    key = (spark.sparkContext.applicationId, os.path.abspath(SF_SMOKE))
    assert key not in _UNIGRAM_CENSUS_CACHE
    b = _unigram_census(spark, SF_SMOKE)
    assert b is not a
    # The all-caches form evicts too.
    clear_count_cache()
    assert not _UNIGRAM_CENSUS_CACHE


# ---------------------------------------------------------------- #
# VERDICT r12 item 2: no unpartitioned data-sized window sorts       #
# ---------------------------------------------------------------- #


def _executed(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_census_rank_family_has_no_unbounded_window(spark):
    """doc_rake_keyphrases / rec_popularity_ndcg / vocab_zipf_fit must
    not single-task-sort a census-sized frame: the audit parser (which
    caught them) must report zero flags on their executed plans."""
    from tools.explain_all import audit_plan

    for name in (
        "doc_rake_keyphrases",
        "rec_popularity_ndcg",
        "vocab_zipf_fit",
    ):
        plan = _executed(any_query(name)(spark, SF_SMOKE))
        assert audit_plan(plan) == [], name


def test_rake_and_ndcg_rank_via_take_ordered(spark):
    """The re-rank idiom: the plan carries TakeOrderedAndProject (the
    per-partition-heap top-k) feeding the bounded re-rank window."""
    for name in ("doc_rake_keyphrases", "rec_popularity_ndcg"):
        plan = _executed(any_query(name)(spark, SF_SMOKE))
        assert "TakeOrderedAndProject" in plan, name


# ---------------------------------------------------------------- #
# VERDICT r12 item 4: the flag-audit parser itself                   #
# ---------------------------------------------------------------- #


def test_audit_flags_unpartitioned_window_over_data(spark):
    from tools.explain_all import audit_plan

    df = spark.range(10_000).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    flags = audit_plan(_executed(df))
    assert any("unpartitioned ordered Window" in f for f in flags)


def test_audit_accepts_bounded_and_partitioned_windows(spark):
    from tools.explain_all import audit_plan

    base = spark.range(10_000).withColumn("g", F.col("id") % 7)
    partitioned = base.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert audit_plan(_executed(partitioned)) == []
    rerank = (
        base.orderBy(F.col("id").desc())
        .limit(5)
        .withColumn("rn", F.row_number().over(Window.orderBy(F.col("id").desc())))
    )
    assert audit_plan(_executed(rerank)) == []


def test_audit_flags_cartesian_product(spark):
    from tools.explain_all import audit_plan

    a = spark.range(100)
    b = spark.range(100).withColumnRenamed("id", "id2")
    df = a.join(b, F.col("id") < F.col("id2"))
    # Force the cartesian strategy (no equi-keys, both sides over the
    # broadcast threshold is not guaranteed at this size — crossJoin
    # with a filter compiles to CartesianProduct when not broadcast).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        flags = audit_plan(_executed(df))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "CartesianProduct" in flags
