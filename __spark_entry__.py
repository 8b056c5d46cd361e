"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``ml_feature_store_enterprise_grade_spark.registry``): every operator from
SURVEY.md §2 registers a ``(spark, sf_dir) -> DataFrame`` callable
and (when ANSI-SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ml_feature_store_enterprise_grade_spark import registry
from ml_feature_store_enterprise_grade_spark.operators.feature_agg import user_hourly_features


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    windowed clickstream feature aggregate (SURVEY §7 M0) re-hosted on
    the ``events`` table."""
    return user_hourly_features(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle for each SQL-expressible query; non-expressible
    ops (custom stateful streaming, MLlib-backed ANN) are omitted and
    get the driver's rows-only check."""
    return registry.oracles()
