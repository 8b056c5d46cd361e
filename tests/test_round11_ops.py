"""Round-11 operators: the router's forced-IVF driver query."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.operators.similarity import (
    _ROUTER_RECALL_FLOOR,
    knn_router_ivf_recall,
)

from conftest import SF_ORACLE, SF_SMOKE


def test_router_ivf_recall_floor(spark):
    """The production IVF route must clear the pinned recall floor at
    both local scales (measured r11: 0.632 @ sf0.01, 0.676 @ sf0.001
    — random-embedding regime, the hardest case for IVF)."""
    for sf in (SF_SMOKE, SF_ORACLE):
        row = knn_router_ivf_recall(spark, sf).collect()[0]
        assert row["floor_met"], (sf, row["recall"])
        assert row["recall"] >= _ROUTER_RECALL_FLOOR
        assert row["n_queries"] > 0


def test_router_ivf_recall_plan_shape(spark):
    """The forced route must be the cell-pruned shortlist: no
    BroadcastNestedLoopJoin / CartesianProduct in the SHORTLIST
    frame's plan (the quadratic pair table is never built there).
    The full query's plan legitimately keeps two bounded NLJs — the
    exact BASELINE the recall is scored against, and the final 1-row
    stat attachment — so the assertion targets the production side."""
    from ml_feature_store_enterprise_grade_spark.catalog import (
        cached_count,
        load_table,
        spread,
    )
    from ml_feature_store_enterprise_grade_spark.operators.similarity import (
        _TOPK,
        knn_candidates,
        knn_index_path,
    )

    emb = spread(load_table(spark, SF_ORACLE, "embeddings"))
    sl = knn_candidates(
        emb.select(F.col("vec_id").alias("query_id"), "embedding"),
        emb.select("vec_id", "embedding"),
        k=_TOPK,
        exact_below=0,
        index_path=knn_index_path(SF_ORACLE, "router_recall"),
        corpus_rows=cached_count(emb, SF_ORACLE, "embeddings"),
    )
    sl.collect()
    plan = sl._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_router_ivf_recall_deterministic(spark):
    """Two invocations return identical rows (memoized index +
    deterministic ranking)."""
    a = knn_router_ivf_recall(spark, SF_ORACLE).collect()
    b = knn_router_ivf_recall(spark, SF_ORACLE).collect()
    assert a == b
