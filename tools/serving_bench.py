"""Online-serving micro-benchmark — the reference's headline metric
(BASELINE.md: 1.14 ms avg / 1.57 ms P95 per request against
Feast+Redis; <20 ms realtime threshold,
reference scripts/inference_service.py:183-199).

Spark is not a millisecond KV store: its serving role is (a) batch
lookups amortized across many entities and (b) exporting the
snapshot to a real KV store (`store.export_online`).  This tool
measures what Spark itself serves:

* amortized per-entity latency of batch lookups against a cached
  snapshot (the honest Spark-side comparable),
* snapshot export throughput (rows/s streamed toward a KV sink), and
* POST-EXPORT point-read latency against an in-process KV stand-in
  (sqlite, one file), populated end-to-end through
  ``FeatureStore.export_online``'s executor-side writer callable —
  the architecture's answer to the reference's <20 ms realtime
  threshold: Spark materializes + exports, the KV serves.  The
  stand-in swaps 1:1 for Redis (same writer shape, MSET per batch).

Prints one JSON line.  Usage: python tools/serving_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.catalog import load_table
from ml_feature_store_enterprise_grade_spark.operators.asof import latest_snapshot
from ml_feature_store_enterprise_grade_spark.operators.feature_agg import hourly_features
from ml_feature_store_enterprise_grade_spark.session import get_spark

BATCH_SIZES = (1, 10, 100, 1000)
ROUNDS = 5


def _post_export_kv_metrics(spark, sf_dir: str) -> dict[str, float]:
    """Export the materialized snapshot through
    ``FeatureStore.export_online`` into a sqlite KV stand-in, then
    measure single-entity point reads — the reference's serving path
    (materialize → Redis → <20 ms reads, scripts/inference_service.py:17)
    with sqlite standing in for the absent Redis.  The writer runs
    EXECUTOR-side per partition (WAL + busy timeout make the
    concurrent partition writers safe on one local file; a Redis
    writer would pipeline the same batches with zero contention)."""
    import random
    import sqlite3
    import tempfile
    from datetime import timedelta

    from ml_feature_store_enterprise_grade_spark.store import (
        Entity,
        FeatureStore,
        FeatureView,
    )

    tmp = tempfile.mkdtemp(prefix="serving_kv_")
    db = os.path.join(tmp, "kv.sqlite")
    con = sqlite3.connect(db)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT)")
    con.commit()
    con.close()

    fs = FeatureStore(spark, os.path.join(tmp, "store"))
    user = Entity("user", join_key="user_id", value_type="bigint")
    view = FeatureView(
        name="user_click_features",
        entity=user,
        features=("total_events", "click_count", "total_revenue", "click_through_rate"),
        ttl=timedelta(hours=24),
    )
    fs.apply([user, view])
    fs.write_offline(view.name, hourly_features(load_table(spark, sf_dir, "events")))
    fs.materialize(view.name, incremental=False)

    def writer(batch: list[dict]) -> None:
        import json as _json
        import sqlite3 as _sqlite3

        c = _sqlite3.connect(db, timeout=120)
        c.execute("PRAGMA busy_timeout = 120000")
        c.executemany(
            "INSERT OR REPLACE INTO kv VALUES (?, ?)",
            [(r["user_id"], _json.dumps(r, default=str)) for r in batch],
        )
        c.commit()
        c.close()

    t0 = time.perf_counter()
    fs.export_online(view.name, writer, batch_size=1000)
    export_s = time.perf_counter() - t0

    con = sqlite3.connect(db)
    keys = [k for (k,) in con.execute("SELECT k FROM kv")]
    rng = random.Random(7)
    probes = [rng.choice(keys) for _ in range(2000)]
    lat = []
    for k in probes:
        t0 = time.perf_counter()
        (v,) = con.execute("SELECT v FROM kv WHERE k = ?", (k,)).fetchone()
        json.loads(v)  # deserialization is part of a served read
        lat.append((time.perf_counter() - t0) * 1000)
    con.close()
    lat.sort()
    return {
        "kv_export_rows": len(keys),
        "kv_export_rows_per_s": round(len(keys) / export_s, 0),
        "kv_read_avg_ms": round(sum(lat) / len(lat), 4),
        "kv_read_p95_ms": round(lat[int(len(lat) * 0.95)], 4),
        "kv_read_max_ms": round(lat[-1], 4),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("serving_bench")
    snap = latest_snapshot(hourly_features(load_table(spark, sf_dir, "events"))).cache()
    n_entities = snap.count()  # materialize the cache (the "online store")

    results: dict[str, float] = {}
    for bs in BATCH_SIZES:
        keys = [r.user_id for r in snap.select("user_id").limit(bs).collect()]
        entities = spark.createDataFrame([(k,) for k in keys], "user_id bigint")
        lat = []
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            hits = snap.join(F.broadcast(entities), "user_id")
            hits.collect()
            lat.append((time.perf_counter() - t0) * 1000)
        best = min(lat)
        results[f"batch_{bs}_ms"] = round(best, 2)
        results[f"batch_{bs}_ms_per_entity"] = round(best / bs, 3)

    # Export throughput: executor-side parallel drain (the
    # foreachPartition → KV-pipeline shape; null sink here).
    t0 = time.perf_counter()
    snap.foreachPartition(lambda it: sum(1 for _ in it))
    export_s = time.perf_counter() - t0
    results["export_rows_per_s"] = round(n_entities / export_s, 0)

    results.update(_post_export_kv_metrics(spark, sf_dir))

    print(
        json.dumps(
            {
                "metric": "online serving (batch lookup vs cached snapshot)",
                "n_entities": n_entities,
                **results,
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
