"""Bucketed tables: shuffle-free co-located joins for hot join keys.

The offline store's dominant join key is the entity id (user_id):
point-in-time retrieval, online lookup, enrichment and incremental
materialization all shuffle on it.  Bucketing pre-shuffles *at write
time* — ``bucketBy(n, key)`` hash-distributes rows into a fixed
bucket count recorded in the table catalog, so every later join or
aggregation on the key reads already-co-located data and Catalyst
drops the Exchange on the bucketed side(s).

At 100 TB this converts the biggest recurring shuffle (events ⋈
features on user_id, re-run every materialization cycle) into a
one-time write-side cost amortized across all downstream queries.
Pick the bucket count once per deployment (≈ total size / target
partition size, power of two) — both sides of a co-located join must
agree on it.

The reference has no bucketing (its Parquet is only date-partitioned,
reference spark/apps/clickstream_aggregation.py:204-218); this is an
engine-side scale addition (SURVEY §4 join strategy row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Engine-wide default bucket count for entity-keyed tables.
DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = DEFAULT_BUCKETS,
    sorted_by_key: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table in the session catalog.  Sorting within buckets lets
    sort-merge joins skip their sort as well."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sorted_by_key:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog;
    a plain path read would lose it)."""
    return spark.table(table)
