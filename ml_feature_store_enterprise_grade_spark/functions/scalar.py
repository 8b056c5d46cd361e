"""Shared scalar expressions with exact DuckDB-SQL twins.

Design rule: every helper that feeds an oracle-checked query has two
faces — a PySpark ``Column`` builder and a SQL-string builder that
produces the *identical* value in DuckDB.  Hash functions are the
interesting case: Spark's ``xxhash64`` and DuckDB's ``hash`` differ,
so cross-engine-checkable hashing goes through MD5 (bit-identical
everywhere) truncated to 60 bits.

All helpers are pure Catalyst expressions — no Python UDFs — so they
stay inside whole-stage codegen (SURVEY.md §2.9: the reference also
defines zero UDFs; reference spark/apps/clickstream_aggregation.py
is entirely built-in expressions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def safe_div(num: Column, den: Column) -> Column:
    """NULL-on-zero division, matching ``x / NULLIF(y, 0)``.

    Spark with ANSI off already yields NULL on /0 for doubles, but an
    explicit NULLIF keeps the semantics engine-independent (SURVEY.md
    Appendix 3; reference ratio columns
    spark/apps/clickstream_aggregation.py:193-195 rely on this).
    """
    return num / F.nullif(den, F.lit(0))


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """Deterministic 60-bit hash identical across Spark and DuckDB.

    ``bigint(conv(substr(md5(seed || ':' || x), 1, 15), 16, 10))``.
    15 hex chars = 60 bits < 2^63, so the value is an exact BIGINT in
    both engines.  Used by MinHash / SimHash / fingerprint operators
    so their signatures are oracle-checkable (SURVEY.md §7 M5).
    """
    tagged = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("bigint")


def PORTABLE_HASH64_SQL(expr: str, seed: int = 0) -> str:
    """DuckDB twin of :func:`portable_hash64`."""
    return f"CAST('0x' || substr(md5('{seed}:' || ({expr})), 1, 15) AS BIGINT)"


#: Exact-arithmetic money type for unbounded-group SUMs.  Double
#: summation is order-sensitive: at sf0.1 a 1.7e8 revenue sum already
#: landed a cent apart between Spark and DuckDB (and partial-agg
#: order is nondeterministic run to run at cluster scale).  DECIMAL
#: sums are exact and associative — deterministic under any shuffle
#: order.  (12,2) keeps 3-factor products within both engines' 38-digit
#: cap with zero precision loss.
MONEY = "decimal(12,2)"


def money(col: Column) -> Column:
    return col.cast(MONEY)


def MONEY_SQL(expr: str) -> str:
    """DuckDB twin of :func:`money`."""
    return f"CAST({expr} AS DECIMAL(12,2))"


def normalize_text(col: Column) -> Column:
    """Canonical text form for dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def NORMALIZE_TEXT_SQL(expr: str) -> str:
    """DuckDB twin of :func:`normalize_text`."""
    return f"trim(regexp_replace(lower({expr}), '\\s+', ' ', 'g'))"
