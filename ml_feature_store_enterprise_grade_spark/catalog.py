"""Table catalog: typed loading of the engine's source tables.

The reference declares explicit schemas everywhere and never relies
on inference (reference spark/apps/clickstream_aggregation.py:48-66,
feast_repo/features.py:44-49).  We follow suit: every table has a
declared post-normalization schema, and loading normalizes physical
quirks (nanosecond parquet timestamps) into clean engine types.

At 100 TB these reads are partitioned parquet scans; all queries
filter/prune on the columns they need so Catalyst pushes predicates
and projection into the scan (check with ``df.explain``:
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_engine_confs

#: All driver-provided tables (TESTDATA.md).
TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Columns stored as TIMESTAMP(NANOS) int64 in parquet → TimestampType.
_NANOS_TS_COLS: dict[str, list[str]] = {
    "events": ["ts"],
}

#: Columns surfaced as timestamp_ntz → TimestampType (UTC session ⇒
#: identical wall-clock; keeps one timestamp type engine-wide).
_NTZ_TS_COLS: dict[str, list[str]] = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table with normalized engine types."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, ()):
        # int64 nanos → micros via integer div (a float div would lose
        # precision above 2^53), then TimestampType.
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    for c in _NTZ_TS_COLS.get(name, ()):
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to cluster parallelism when the input has fewer
    partitions.

    Spark sizes scan partitions by *bytes* (maxPartitionBytes), so a
    small-on-disk but CPU-expensive input (e.g. ``documents`` feeding
    2M md5-based MinHash signatures) can land in one task and run
    single-threaded.  Upscaling costs one shuffle of the small input;
    at 100 TB the scan already has ≥ parallelism partitions and this
    is a no-op (never downscales — no data movement on big inputs).
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register catalog tables as temp views for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
