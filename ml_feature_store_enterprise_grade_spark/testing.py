"""Differential-testing harness: Spark queries vs DuckDB oracles.

Mirrors the verify driver's comparison (row count + column names +
order-insensitive values) so regressions surface locally before a
round runs.  Strict by default: cells must match exactly after
canonicalization — engine queries are responsible for rounding
floats to a stable precision on both sides.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .catalog import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the catalog tables registered as views
    (same names the driver pre-registers)."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v: object) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return "0"  # normalize -0.0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int = 0
    oracle_rows: int = 0
    detail: str = ""
    mismatches: list[str] = field(default_factory=list)


def compare_query(
    name: str,
    df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
    max_mismatches: int = 5,
) -> CompareResult:
    spark_cols = list(df.columns)
    spark_rows = [tuple(r) for r in df.collect()]
    cur = con.execute(oracle_sql)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    res = CompareResult(name=name, ok=True, spark_rows=len(spark_rows), oracle_rows=len(oracle_rows))
    if sorted(spark_cols) != sorted(oracle_cols):
        res.ok = False
        res.detail = f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
        return res
    if len(spark_rows) != len(oracle_rows):
        res.ok = False
        res.detail = f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}"
        return res
    s = canonical_rows(spark_cols, spark_rows)
    o = canonical_rows(oracle_cols, oracle_rows)
    if s != o:
        res.ok = False
        diffs = [i for i, (a, b) in enumerate(zip(s, o)) if a != b]
        for i in diffs[:max_mismatches]:
            res.mismatches.append(f"row {i}: spark={s[i]} oracle={o[i]}")
        res.detail = f"value mismatch in {len(diffs)} of {len(s)} rows (cols sorted: {sorted(spark_cols)})"
    return res


def run_parity(
    spark: SparkSession,
    sf_dir: str,
    only: list[str] | None = None,
) -> list[CompareResult]:
    from . import registry

    qs = registry.queries()
    orc = registry.oracles()
    con = duckdb_connection(sf_dir)
    results: list[CompareResult] = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in orc:
                n = df.count()
                results.append(
                    CompareResult(name=name, ok=n >= 0, spark_rows=n, detail="rows-only (no oracle)")
                )
                continue
            results.append(compare_query(name, df, orc[name], con))
        except Exception as e:  # surface per-query failures without aborting the sweep
            results.append(CompareResult(name=name, ok=False, detail=f"EXCEPTION: {type(e).__name__}: {e}"))
    return results
