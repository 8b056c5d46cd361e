"""Corpus-planning operators for training-data pipelines.

North-star extensions (BASELINE; not in the reference, which stops at
feature serving): the two planning steps every large-scale training
run needs *before* any text is read —

* **mixture weights** — temperature-scaled sampling weights per
  corpus slice (language here; domain/source in general).  Raw
  proportional sampling lets one giant slice drown the rest;
  ``weight_i ∝ size_i^α`` with α < 1 (Conneau & Lample 2019's
  multilingual temperature sampling) flattens the distribution.  We
  fix α = 0.5: ``sqrt`` is correctly rounded under IEEE-754, so Spark
  and DuckDB agree bit-for-bit where a ``pow(x, 0.7)`` could differ
  in the last ulp between libm implementations.
* **sequence packing plan** — GPT-style concat-and-chunk: lay the
  corpus out as one token stream and cut every ``_SEQ_LEN`` tokens.
  A *global* stream needs a global prefix sum (single-task sort — a
  scale-killer), so the stream is sharded by a hash of ``doc_id``:
  each shard packs independently with a windowed prefix sum,
  ``PARTITION BY shard`` keeping every window a within-partition
  sort.  At 100 TB you raise ``_PACK_SHARDS`` to ~cluster
  parallelism; packing quality is unaffected (each shard is still a
  contiguous stream, and the ≤1 partially-filled tail sequence per
  shard is noise at any real shard size).

Both operators read only document *metadata* (``n_chars``) — the
plan for a 100 TB corpus is computed without scanning a byte of
text.  Pure Catalyst expressions, exact DuckDB twins, zero UDFs.
All arithmetic that crosses an aggregation boundary is BIGINT or
DECIMAL (exact, associative); doubles appear only in final
single-expression projections rounded on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import PORTABLE_HASH64_SQL, portable_hash64
from ..registry import register

#: Temperature exponent α for mixture weights is fixed at 0.5 (see
#: module docstring: sqrt is the IEEE-exact choice).

#: Independent packing streams.  Test-scale value; production sets
#: this to ~cluster parallelism so each windowed prefix sum is one
#: healthy task.
_PACK_SHARDS = 8

#: Tokens per packed training sequence.
_SEQ_LEN = 2048

#: Chars-per-token estimate for the metadata-only packing plan (the
#: usual ~4 chars/token English heuristic).  The plan needs a
#: deterministic integer estimate, not a tokenizer.
_CHARS_PER_TOKEN = 4

_PACK_SEED = 3

#: Shard-id stride in ``seq_id`` so (shard, seq_in_shard) flattens to
#: one global id without collisions.
_SEQ_STRIDE = 1_000_000_000


@register(
    "corpus_mixture_weights",
    oracle="""
    WITH slice AS (
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS slice_chars,
               CAST(ROUND(SQRT(CAST(SUM(n_chars) AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS temp_mass
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT SUM(temp_mass) AS tot_mass, SUM(slice_chars) AS tot_chars
        FROM slice
    )
    SELECT s.lang, s.n_docs, s.slice_chars,
           ROUND(CAST(s.temp_mass AS DOUBLE) / CAST(t.tot_mass AS DOUBLE), 6)
               AS mix_weight,
           ROUND((CAST(s.temp_mass AS DOUBLE) / CAST(t.tot_mass AS DOUBLE))
                 * (CAST(t.tot_chars AS DOUBLE) / CAST(s.slice_chars AS DOUBLE)), 6)
               AS eff_repeat
    FROM slice s CROSS JOIN tot t
    """,
)
def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampling mixture weights per language slice:
    ``mix_weight_i = sqrt(chars_i) / Σ_j sqrt(chars_j)`` plus the
    implied repetition factor ``eff_repeat_i = mix_weight_i /
    natural_share_i`` (how many epochs of slice *i* one epoch of the
    mixture consumes — the number a data-budget review reads first).

    Determinism: slice sizes are exact BIGINT sums; each sqrt is
    rounded to 6 dp and summed as DECIMAL (associative — safe under
    any partial-agg order), so both engines normalize by the
    identical total.  Scale: one two-phase aggregate to ~|languages|
    rows, then a scalar broadcast — nothing else moves.
    """
    docs = load_table(spark, sf_dir, "documents")
    slice_ = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("slice_chars"),
        F.round(F.sqrt(F.sum("n_chars").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("temp_mass"),
    )
    tot = slice_.agg(
        F.sum("temp_mass").alias("tot_mass"),
        F.sum("slice_chars").alias("tot_chars"),
    )
    share = F.col("temp_mass").cast("double") / F.col("tot_mass").cast("double")
    return slice_.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "slice_chars",
        F.round(share, 6).alias("mix_weight"),
        F.round(
            share
            * (F.col("tot_chars").cast("double") / F.col("slice_chars").cast("double")),
            6,
        ).alias("eff_repeat"),
    )


@register(
    "sequence_packing_plan",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               GREATEST(1, n_chars // {_CHARS_PER_TOKEN}) AS est_tokens,
               {PORTABLE_HASH64_SQL("CAST(doc_id AS VARCHAR)", _PACK_SEED)}
                   % {_PACK_SHARDS} AS shard
        FROM documents
    ),
    c AS (
        SELECT doc_id, shard, est_tokens,
               CAST(COALESCE(SUM(est_tokens) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_before
        FROM d
    )
    SELECT doc_id, shard, est_tokens,
           shard * {_SEQ_STRIDE} + cum_before // {_SEQ_LEN} AS seq_id,
           cum_before % {_SEQ_LEN} AS offset_in_seq,
           (cum_before + est_tokens - 1) // {_SEQ_LEN}
               - cum_before // {_SEQ_LEN} + 1 AS seqs_spanned
    FROM c
    """,
)
def sequence_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing plan: each document's position in the
    fixed-length training-sequence stream of its shard — global
    ``seq_id`` of the sequence it starts in, token ``offset_in_seq``,
    and how many sequences it ``seqs_spanned`` (boundary-crossing
    docs; a loader either splits them or masks the overhang).

    One windowed BIGINT prefix sum per shard (hash-of-doc_id shard →
    ``PARTITION BY shard ORDER BY doc_id`` window, all
    within-partition after a single hash shuffle); floor-division
    arithmetic on the prefix sum yields the chunk layout.  All values
    are nonnegative BIGINTs < 2^40, so Spark's ``floor(a / b)``
    (double division is exact below 2^53) equals DuckDB's ``//``.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.greatest(F.lit(1), F.floor(F.col("n_chars") / _CHARS_PER_TOKEN)).alias(
            "est_tokens"
        ),
        (
            portable_hash64(F.col("doc_id").cast("string"), seed=_PACK_SEED)
            % _PACK_SHARDS
        ).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.withColumn("cum_before", F.coalesce(F.sum("est_tokens").over(w), F.lit(0)))
    seq_in_shard = F.floor(F.col("cum_before") / _SEQ_LEN)
    return c.select(
        "doc_id",
        "shard",
        "est_tokens",
        (F.col("shard") * _SEQ_STRIDE + seq_in_shard).alias("seq_id"),
        (F.col("cum_before") % _SEQ_LEN).alias("offset_in_seq"),
        (
            F.floor((F.col("cum_before") + F.col("est_tokens") - 1) / _SEQ_LEN)
            - seq_in_shard
            + 1
        ).alias("seqs_spanned"),
    )


#: Target fraction of total corpus chars the sampled mixture draws.
_SAMPLE_BUDGET = 0.5

_SAMPLE_SEED = 13

#: 2^60 — the portable hash is uniform on [0, 2^60).
_HASH_SPAN = float(1 << 60)


@register(
    "corpus_sampling_plan",
    oracle=f"""
    WITH slice AS (
        SELECT lang,
               SUM(n_chars) AS slice_chars,
               CAST(ROUND(SQRT(CAST(SUM(n_chars) AS DOUBLE)), 6)
                    AS DECIMAL(18,6)) AS temp_mass
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT SUM(temp_mass) AS tot_mass, SUM(slice_chars) AS tot_chars
        FROM slice
    ),
    rate AS (
        SELECT s.lang,
               ROUND(LEAST(1.0,
                   {_SAMPLE_BUDGET}
                   * (CAST(s.temp_mass AS DOUBLE) / CAST(t.tot_mass AS DOUBLE))
                   * (CAST(t.tot_chars AS DOUBLE)
                      / CAST(s.slice_chars AS DOUBLE))), 6) AS keep_rate
        FROM slice s CROSS JOIN tot t
    )
    SELECT d.doc_id, d.lang, r.keep_rate,
           ROUND(CAST({PORTABLE_HASH64_SQL("CAST(d.doc_id AS VARCHAR)", _SAMPLE_SEED)}
                      AS DOUBLE) / {_HASH_SPAN}, 9) AS u,
           ROUND(CAST({PORTABLE_HASH64_SQL("CAST(d.doc_id AS VARCHAR)", _SAMPLE_SEED)}
                      AS DOUBLE) / {_HASH_SPAN}, 9) < r.keep_rate AS keep
    FROM documents d JOIN rate r ON d.lang = r.lang
    """,
)
def corpus_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture-aware downsampling plan: each document
    gets a uniform deviate ``u`` from the portable hash of its id and
    is kept iff ``u < keep_rate(lang)``, where the per-language rate
    realizes the temperature mixture (:func:`corpus_mixture_weights`)
    at a ``{_SAMPLE_BUDGET:.0%}``-of-corpus character budget
    (rates clamp at 1 — upsampling beyond 1 epoch is the training
    loader's repeat, not the sampler's).

    Hash-of-key (never ``rand()``) for the same reason as
    ``dataset_split_assignment``: the keep decision is reproducible
    across runs, clusters, and row order, so two teams sampling the
    same corpus get byte-identical datasets.  Composes upstream of
    packing: filter by ``keep``, then :func:`sequence_packing_plan`.
    Scale: rates are a ~|languages|-row broadcast; the scan is one
    map-side projection — zero shuffles of the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    slice_ = docs.groupBy("lang").agg(
        F.sum("n_chars").alias("slice_chars"),
        F.round(F.sqrt(F.sum("n_chars").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("temp_mass"),
    )
    tot = slice_.agg(
        F.sum("temp_mass").alias("tot_mass"),
        F.sum("slice_chars").alias("tot_chars"),
    )
    rate = slice_.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.round(
            F.least(
                F.lit(1.0),
                _SAMPLE_BUDGET
                * (F.col("temp_mass").cast("double") / F.col("tot_mass").cast("double"))
                * (
                    F.col("tot_chars").cast("double")
                    / F.col("slice_chars").cast("double")
                ),
            ),
            6,
        ).alias("keep_rate"),
    )
    u = F.round(
        portable_hash64(F.col("doc_id").cast("string"), seed=_SAMPLE_SEED).cast(
            "double"
        )
        / _HASH_SPAN,
        9,
    )
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(rate), "lang")
        .select(
            "doc_id",
            "lang",
            "keep_rate",
            u.alias("u"),
            (u < F.col("keep_rate")).alias("keep"),
        )
    )
