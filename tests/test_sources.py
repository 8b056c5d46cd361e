"""File source/sink coverage: schema-declared CSV (S5/S6) and the
partition sensor (S11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.catalog import load_table
from ml_feature_store_enterprise_grade_spark.sources.files import read_csv, write_csv
from tests.conftest import SF_SMOKE


def test_csv_roundtrip_with_declared_schema(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    path = str(tmp_path / "customers_csv")
    write_csv(src, path)
    back = read_csv(
        spark,
        path,
        "c_custkey bigint, c_name string, c_acctbal double, c_mktsegment string",
    )
    assert back.schema.simpleString() == src.schema.simpleString()
    assert back.count() == src.count()
    a = src.agg(F.round(F.sum("c_acctbal"), 2).alias("s")).first()["s"]
    b = back.agg(F.round(F.sum("c_acctbal"), 2).alias("s")).first()["s"]
    assert a == b
