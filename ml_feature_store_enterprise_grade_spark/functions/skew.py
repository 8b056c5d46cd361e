"""Skew mitigation utilities.

The reference's activity-weighted generators deliberately make some
``user_id``s hot (reference scripts/batch_generator.py:79-108,
scripts/stream_generator.py:109-111) — at 100 TB a hot entity key
turns one shuffle partition into the straggler that dominates the
stage.  Three engine answers, in preference order:

1. **AQE** (on engine-wide, session.py): runtime skew-join splitting
   and partition coalescing — handles sort-merge join skew with no
   code changes.
2. **Two-stage exact distinct** (:func:`exact_distinct_two_stage`):
   ``COUNT(DISTINCT x)`` defeats map-side partial aggregation, so a
   hot group key ships every raw row to one reducer.  Shuffling on
   ``(key, x)`` first dedupes at full parallelism (x is the implicit
   salt), then counts per key over the deduped — far smaller — frame.
3. **Explicit salting** (:func:`salted_join`): for joins AQE can't
   fix (e.g. the big side's hot key exceeds what split-and-replicate
   handles, or broadcast is impossible): add a random salt 0..n-1 to
   the skewed side and replicate the other side n×, restoring key
   spread at the cost of an n× copy of the small side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_distinct_two_stage(
    df: DataFrame, keys: list[str], col: str, out: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT col) per keys, skew-resistant.

    Stage 1 shuffles on (keys, col) — the distinct value spreads a hot
    key over its value diversity; stage 2 counts per key with map-side
    combine.  Matches ``groupBy(keys).agg(countDistinct(col))``."""
    deduped = df.select(*keys, col).distinct()
    return deduped.groupBy(*keys).agg(F.count(col).alias(out))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed ``key`` values: salt the big
    side with rand(0..n_salt), explode the small side n_salt×, and
    join on (key, salt).  The hot key's rows now land on n_salt
    reducers instead of one.  Output columns match ``big.join(small,
    key, how)``."""
    salted_big = big.withColumn("__salt", (F.rand(seed=0) * n_salt).cast("int"))
    exploded_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_big.join(exploded_small, [key, "__salt"], how).drop("__salt")


def salt_column(n_salt: int, *cols: Column) -> Column:
    """Deterministic salt from row content (for salted two-stage
    aggregation where rand() would break retries/determinism)."""
    return F.pmod(F.hash(*cols), F.lit(n_salt))
