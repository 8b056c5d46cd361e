"""Persisted IVF vector index: build → partitioned cells → pruned
search; recall vs brute force and partition pruning both asserted."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.catalog import load_table
from ml_feature_store_enterprise_grade_spark.operators.similarity import (
    VectorIndex,
    ann_cosine_topk,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path_factory.mktemp("vidx") / "index")
    return VectorIndex.build(emb, path, k=8)


def test_layout_partitioned_by_cell(index):
    cells_dir = f"{index.path}/cells"
    parts = [d for d in os.listdir(cells_dir) if d.startswith("cell=")]
    assert len(parts) >= 2  # codebook actually spread the corpus


def test_search_recall_and_pruning(spark, index):
    queries = (
        load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") < 50)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    res = index.search(queries, topk=5, nprobe=3)
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1][:120]
    assert "cell" in pf  # probed-cell filter pruned the scan

    approx = {(r.query_id, r.neighbor_id) for r in res.collect()}
    exact = {(r.query_id, r.neighbor_id) for r in ann_cosine_topk(spark, SF_SMOKE).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f}"
