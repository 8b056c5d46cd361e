"""Stage-level wall-clock breakdown of ``dedup_clusters``
(VERDICT r5 item 5): where do its ~6 s at sf0.1 actually go —
LSH pair generation, the exact-group contraction, the CC rounds, or
fixed per-round overhead?

    python tools/profile_dedup_clusters.py [sf_dir]

Prints one JSON object with per-stage seconds and per-CC-round
seconds.  Uses the same library internals the registered query uses
(no copied logic), timing each materialization boundary.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import pyspark.sql.functions as F
from pyspark.sql import Window

from ml_feature_store_enterprise_grade_spark.operators import dedup as D
from ml_feature_store_enterprise_grade_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_dedup_clusters")
    out: dict = {"sf_dir": sf_dir}

    t0 = time.perf_counter()
    nd = D._normalized_docs(spark, sf_dir)
    rep = nd.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy(F.md5("norm"))).alias("rep"),
    ).cache()
    out["n_docs"] = rep.count()
    out["t_rep_window"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    near = D.dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    ra = rep.select(F.col("doc_id").alias("doc_a"), F.col("rep").alias("ra"))
    rb = rep.select(F.col("doc_id").alias("doc_b"), F.col("rep").alias("rb"))
    edges = (
        near.join(ra, "doc_a")
        .join(rb, "doc_b")
        .select(F.least("ra", "rb").alias("a"), F.greatest("ra", "rb").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    out["n_contracted_edges"] = edges.count()
    out["t_lsh_pairs_and_edge_remap"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    vertices = rep.select(F.col("rep").alias("doc_id")).distinct()
    out["n_contracted_vertices"] = vertices.count()
    out["t_vertices_distinct"] = round(time.perf_counter() - t0, 3)

    round_times: list = []
    t0 = time.perf_counter()
    rep_labels = D.connected_components(
        vertices, edges, round_times=round_times
    ).withColumnRenamed("doc_id", "rep")
    n_labeled = rep_labels.count()
    out["t_cc_total"] = round(time.perf_counter() - t0, 3)
    out["cc_round_times"] = round_times
    out["n_labeled"] = n_labeled

    t0 = time.perf_counter()
    labels = rep.join(rep_labels, "rep").select("doc_id", "label").localCheckpoint()
    clusters = labels.withColumnRenamed("label", "cluster_id")
    w = Window.partitionBy("cluster_id")
    final = clusters.select(
        "doc_id",
        "cluster_id",
        F.count("*").over(w).cast("bigint").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )
    final.write.format("noop").mode("overwrite").save()
    out["t_expand_and_size_window"] = round(time.perf_counter() - t0, 3)
    rep.unpersist()

    out["t_total"] = round(
        out["t_rep_window"]
        + out["t_lsh_pairs_and_edge_remap"]
        + out["t_vertices_distinct"]
        + out["t_cc_total"]
        + out["t_expand_and_size_window"],
        3,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
