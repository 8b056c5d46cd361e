"""Scale probe: measure the engine's scale-path operators on a
synthetically amplified events table and record rows/sec — the
empirical side of the "would this plan survive 100×?" question.

Amplification: each sf0.1 event is replicated K times with a
per-replica (user_id, ts) jitter, preserving the generator's key
skew and time distribution while multiplying volume (K=100 →
10M events, written once to /tmp as real parquet so scans, pushdown,
and shuffle sizing behave like a real table, not an in-memory
relation).

Probes (one per scale-promise):
* ``hourly``        — the flagship tumbling aggregate (map-side
                      partial combine promise).
* ``sliding_direct``— 1h/10min sliding window, the 6×-explode form.
* ``sliding_rollup``— the two-level rollup that shuffles pre-
                      aggregated buckets; its speedup over direct IS
                      the scale path's measured payoff.
* ``asof``          — PIT as-of join of the amplified events against
                      per-user feature snapshots (max_by hash-agg
                      form, no window sort).
* ``exact_dedup``   — sha2 hash-aggregate dedup over the amplified
                      frame (embarrassingly parallel promise).
* ``mwu_ranks``     — the Mann-Whitney exact rank-sum path: per-value
                      counts + the KS bucketed exclusive prefix sum
                      (no single-partition sort promise).

Output: one JSON line per probe + a summary line
(``SCALE_r{N}.json`` material).  Run: python tools/scale_probe.py
[K] (default 100).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ml_feature_store_enterprise_grade_spark.catalog import load_table
from ml_feature_store_enterprise_grade_spark.functions.scalar import money
from ml_feature_store_enterprise_grade_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def amplified_events_dir(spark, k: int) -> str:
    tag = SF_DIR.strip("/").replace("/", "_")
    out = os.path.join("/tmp", f"scale_probe_{tag}_x{k}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    e = load_table(spark, SF_DIR, "events")
    amp = (
        e.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") * k + F.col("r")).alias("event_id"),
            # jitter inside ±5 min keeps the hourly/sliding window
            # population realistic instead of k-fold stacked points.
            (
                F.col("ts")
                + F.make_interval(secs=(F.col("r") * 37 % 600) - 300)
            ).alias("ts"),
            # replicas cycle over a 10× user universe: volume AND
            # cardinality grow, as they would in production.
            (F.col("user_id") + (F.col("r") % 10) * 100000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
    )
    amp.repartition(32).write.mode("overwrite").parquet(out)
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("scale_probe", cpus=32)
    t0 = time.time()
    src = amplified_events_dir(spark, k)
    gen_s = round(time.time() - t0, 1)
    ev = spark.read.parquet(src)
    n = ev.count()
    print(json.dumps({"probe": "generate", "rows": n, "sec": gen_s}))

    base = ev.filter(F.col("user_id").isNotNull())

    def timed(name, df):
        t = time.time()
        df.write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t, 2)
        print(
            json.dumps(
                {"probe": name, "rows_in": n, "sec": sec,
                 "mrows_per_sec": round(n / sec / 1e6, 2)}
            ),
            flush=True,
        )
        return sec

    hourly = base.groupBy(
        "user_id", F.window("ts", "1 hour").alias("w")
    ).agg(
        F.count("*").alias("total_events"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))
                  .otherwise(0.0)), 2
        ).alias("total_revenue"),
    )
    t_hourly = timed("hourly", hourly)

    direct = base.groupBy(
        "user_id", F.window("ts", "1 hour", "10 minutes").alias("w")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    t_direct = timed("sliding_direct", direct)

    buckets = (
        base.groupBy("user_id", F.window("ts", "10 minutes").alias("b"))
        .agg(F.count("*").alias("n"), F.sum(money(F.col("value"))).alias("v"))
        .select("user_id", F.col("b.start").alias("sb"), "n", "v")
    )
    rollup = (
        buckets.select(
            "user_id", "sb", "n", "v",
            F.explode(F.sequence(F.lit(0), F.lit(5))).alias("kk"),
        )
        .select(
            "user_id",
            (F.col("sb") - F.expr("make_interval(0,0,0,0,0,kk*10,0)")).alias("ws"),
            "n", "v",
        )
        .groupBy("user_id", "ws")
        .agg(F.sum("n").alias("n"),
             F.round(F.sum("v"), 2).cast("double").alias("v"))
    )
    t_rollup = timed("sliding_rollup", rollup)

    feats = base.groupBy("user_id").agg(
        F.max("ts").alias("feature_ts"), F.count("*").alias("f_n")
    )
    asof = (
        base.join(F.broadcast(feats.withColumnRenamed("user_id", "f_uid")),
                  (F.col("user_id") == F.col("f_uid"))
                  & (F.col("feature_ts") <= F.col("ts")), "left")
        .groupBy("event_id")
        .agg(F.max_by(F.struct("feature_ts", "f_n"), "feature_ts").alias("f"))
    )
    t_asof = timed("asof", asof)

    dedup = base.groupBy(
        F.sha2(F.concat_ws("|", "user_id", "event_type",
                           F.col("value").cast("string")), 256).alias("h")
    ).agg(F.count("*").alias("copies"), F.min("event_id").alias("keep"))
    t_dedup = timed("exact_dedup", dedup)

    # round 10: the pit_staleness_audit re-plan — window closes and
    # events merged into one per-user time-ordered stream, running
    # MAX elects each event's freshest prior close.  Measures the
    # promise that staleness needs ONE user-keyed shuffle and zero
    # join fan-out regardless of per-user history length (the old
    # fts <= ts join was Σ events × prior-hours).
    closes = base.groupBy(
        "user_id",
        (F.date_trunc("hour", F.col("ts")) + F.expr("INTERVAL 1 HOUR")).alias("fts"),
    ).agg(F.lit(1).alias("one"))
    merged = closes.select(
        "user_id", F.col("fts").alias("t"), F.lit(0).alias("kind"), "fts",
        F.lit(None).cast("string").alias("event_type"),
    ).unionByName(
        base.select(
            "user_id", F.col("ts").alias("t"), F.lit(1).alias("kind"),
            F.lit(None).cast("timestamp").alias("fts"), "event_type",
        )
    )
    from pyspark.sql.window import Window as _WS

    w_run = (
        _WS.partitionBy("user_id")
        .orderBy(F.asc("t"), F.asc("kind"))
        .rowsBetween(_WS.unboundedPreceding, _WS.currentRow)
    )
    staleness = (
        merged.withColumn("last_fts", F.max("fts").over(w_run))
        .filter(F.col("kind") == 1)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max(F.col("t").cast("long") - F.col("last_fts").cast("long")).alias("mx"),
        )
    )
    t_stale = timed("staleness_runmax", staleness)

    # round 9: the Mann-Whitney rank path — per-value counts, the
    # KS-style bucketed exclusive prefix sum (per-bucket offsets over
    # <=1024 rows + within-bucket windows), then the rank-sum join.
    # Measures the promise that the exact rank computation never
    # funnels through a single-partition sort.
    from ml_feature_store_enterprise_grade_spark.operators.drift import (
        _KS_BUCKETS,
    )
    from pyspark.sql.window import Window as _W

    s = base.filter(F.col("value").isNotNull() & ~F.isnan("value")).select(
        "event_type", F.col("value").alias("x")
    )
    tx = s.groupBy("x").agg(F.count("*").alias("cx"))
    lo, hi = tx.agg(F.min("x"), F.max("x")).first()
    span = float(hi) - float(lo)
    bucketed = tx.withColumn(
        "b",
        F.least(
            F.lit(_KS_BUCKETS - 1),
            F.floor((F.col("x") - F.lit(float(lo))) / span * _KS_BUCKETS)
            .cast("int"),
        ),
    )
    w_off = (
        _W.partitionBy(F.lit(0)).orderBy("b")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("b").agg(F.sum("cx").alias("tb"))
        .select("b", F.coalesce(F.sum("tb").over(w_off), F.lit(0)).alias("ob"))
    )
    w_in = (
        _W.partitionBy("b").orderBy("x")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    rk = bucketed.join(F.broadcast(offsets), "b").select(
        "x", "cx",
        (F.col("ob") + F.coalesce(F.sum("cx").over(w_in), F.lit(0))).alias("cl"),
    )
    mwu = (
        s.groupBy("event_type", "x").agg(F.count("*").alias("c"))
        .join(rk, "x")
        .groupBy("event_type")
        .agg(
            F.sum("c").alias("n_g"),
            F.sum(F.col("c") * (2 * F.col("cl") + F.col("cx") + 1)).alias("r2"),
        )
    )
    t_mwu = timed("mwu_ranks", mwu)

    # round 10 post-seal: the Poisson-bootstrap path
    # (order_value_bootstrap_ci's plan on the amplified frame).
    # Measures the promise that resampling inference costs a CONSTANT
    # FACTOR over a plain aggregate — the ×B explode pipelines inside
    # whole-stage codegen (never materialized) into B partial sums,
    # so rows/sec should track exact_dedup's hash-agg throughput ÷ B
    # overheads, not fall off a cliff.
    from ml_feature_store_enterprise_grade_spark.functions import (
        portable_hash64 as _ph64,
    )
    from ml_feature_store_enterprise_grade_spark.operators.analytics import (
        _BOOT_M,
        _BOOT_POWA,
        _BOOT_SEED,
        _boot_w_sql,
    )

    # round 11: the counter-based form (one md5 seed per row + Lehmer
    # skip-ahead, mirroring the re-planned operator exactly).
    pa = F.array(
        *[
            F.struct(F.lit(b).alias("b"), F.lit(x).alias("pa"))
            for b, x in enumerate(_BOOT_POWA)
        ]
    )
    boot = (
        base.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            F.floor(F.col("value") * 100.0).cast("bigint").alias("vq"),
            (
                _ph64(F.col("event_id").cast("string"), seed=_BOOT_SEED)
                % (_BOOT_M - 1)
                + 1
            ).alias("h"),
        )
        .select("vq", "h", F.explode(pa).alias("s"))
        .select(
            F.col("s.b").alias("b"),
            "vq",
            ((F.col("h") * F.col("s.pa")) % _BOOT_M).alias("u"),
        )
        .select("b", "vq", F.expr(_boot_w_sql("u")).alias("w"))
        .groupBy("b")
        .agg(
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("vq").cast("decimal(38,0)")).alias("swv"),
        )
    )
    t_boot = timed("poisson_bootstrap_x100", boot)

    # round 10 post-seal: the exponential-decay aggregation
    # (user_decay_features' plan on the amplified frame).  Measures
    # the promise that the literal-array weight lookup is free and
    # the whole feature costs exactly one user-keyed shuffle — the
    # same profile as `hourly`.
    from ml_feature_store_enterprise_grade_spark.operators.feature_agg import (
        _DECAY_MAX_AGE_D,
        _DECAY_WQ,
    )

    wq_arr = F.array(*[F.lit(wq) for wq in _DECAY_WQ])
    asof_anchor = F.lit("2024-02-01").cast("date")
    decay = (
        base.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .select(
            "user_id",
            F.least(
                F.greatest(
                    F.datediff(asof_anchor, F.to_date("ts")), F.lit(0)
                ),
                F.lit(_DECAY_MAX_AGE_D),
            ).alias("d"),
            F.floor(F.col("value") * 100.0).cast("bigint").alias("vq"),
        )
        .select(
            "user_id", "d", "vq",
            F.element_at(wq_arr, F.col("d") + 1).alias("wq"),
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("d").alias("min_d"),
            F.sum("wq").alias("swq"),
            F.sum(F.col("vq").cast("decimal(38,0)") * F.col("wq")).alias(
                "svwq"
            ),
        )
    )
    t_decay = timed("decay_features", decay)

    # round 9: connected-components scale path (the dedup-clustering
    # promise).  Two shapes: the ADVERSARIAL 2^20-vertex single path
    # (diameter = n; hash-to-min alone would need n rounds — pointer
    # jumping collapses it in 23 rounds, measured; this probe is what
    # caught the old 20-round cap being too tight) and a 10M-vertex
    # hub-chained forest (~5M components of mixed depth — hubs link
    # to other hubs, so diameter exceeds a pure star's 2).
    # Correctness asserted inline: the path must be ONE component.
    from ml_feature_store_enterprise_grade_spark.operators.dedup import (
        connected_components,
    )

    n_path = 1 << 20
    pv = spark.range(n_path).select(F.col("id").alias("doc_id"))
    pe = spark.range(n_path - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    t0 = time.time()
    labels = connected_components(pv, pe)
    n_comp = labels.select("label").distinct().count()
    t_ccp = round(time.time() - t0, 2)
    assert n_comp == 1, f"path CC wrong: {n_comp} components"
    print(
        json.dumps(
            {"probe": "cc_path_2e20", "rows_in": n_path, "sec": t_ccp,
             "components": n_comp}
        ),
        flush=True,
    )

    n_star = 10_000_000
    sv = spark.range(n_star).select(F.col("id").alias("doc_id"))
    se = spark.range(n_star).select(
        F.col("id").alias("a"),
        (F.xxhash64("id") % (n_star // 5)).alias("b"),
    ).filter(F.col("b") >= 0)
    t0 = time.time()
    slabels = connected_components(sv, se)
    n_scomp = slabels.select("label").distinct().count()
    t_ccs = round(time.time() - t0, 2)
    print(
        json.dumps(
            {"probe": "cc_star_10m", "rows_in": n_star, "sec": t_ccs,
             "components": n_scomp}
        ),
        flush=True,
    )

    # round 10: the knn_candidates IVF shortlist path at 16× the
    # sf0.1 vector count (32k vectors — far above any sensible exact
    # bound; the exact path would be a 10^9-pair cross join).
    # Measures index build (one-off) and the shortlist query for the
    # FULL amplified corpus as the query set (self-kNN, the
    # hubness/knn-accuracy shape).
    import shutil as _shutil

    emb = load_table(spark, SF_DIR, "embeddings")
    k_emb = 16
    amp_emb_dir = "/tmp/scale_probe_emb_x16"
    if not os.path.exists(os.path.join(amp_emb_dir, "_SUCCESS")):
        _shutil.rmtree(amp_emb_dir, ignore_errors=True)
        (
            emb.withColumn(
                "r", F.explode(F.sequence(F.lit(0), F.lit(k_emb - 1)))
            )
            .select(
                (F.col("vec_id") * k_emb + F.col("r")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x.cast("double")
                        + ((F.col("r") * (i + 3)) % 11 - 5).cast("double") * 0.03
                    ),
                ).alias("embedding"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(amp_emb_dir)
        )
    amp_emb = spark.read.parquet(amp_emb_dir)
    n_vec = amp_emb.count()
    from ml_feature_store_enterprise_grade_spark.operators.similarity import (
        knn_candidates,
    )

    idx_path = "/tmp/scale_probe_ivf_x16"
    _shutil.rmtree(idx_path, ignore_errors=True)
    t0 = time.time()
    cand = knn_candidates(
        amp_emb.select(F.col("vec_id").alias("query_id"), "embedding"),
        amp_emb,
        k=5,
        exact_below=0,
        nprobe=3,
        ivf_cells=32,
        index_path=idx_path,
        corpus_rows=n_vec,
    )
    n_cand = cand.count()
    t_knn = round(time.time() - t0, 2)
    print(
        json.dumps(
            {"probe": "knn_ivf_shortlist", "vectors": n_vec,
             "candidates": n_cand, "sec": t_knn,
             "kvec_per_sec": round(n_vec / t_knn / 1e3, 1)}
        ),
        flush=True,
    )

    # round 11: the scalable exact-rank path (the NTILE-family
    # re-plan: quality_concentration_curve / rfm_segmentation /
    # percentile_rank_features ...).  A 10M-row scored frame (2000×
    # the sf0.1 doc count) deciled via deterministic sampled-cut-
    # point chunking + offset correction — the promise is that exact
    # NTILE now runs at hash-agg-like throughput with NO single-task
    # sort.  Correctness asserted inline: the ten deciles must
    # partition the frame into SQL-standard tile sizes.
    from ml_feature_store_enterprise_grade_spark.functions.ranking import (
        scalable_ntile,
    )

    n_rank = 10_000_000
    scored = spark.range(n_rank).select(
        F.col("id").alias("doc_id"),
        (F.xxhash64(F.col("id")) % 1_000_000).cast("double").alias("mq"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(5000)) + 200)
        .cast("bigint")
        .alias("n_chars"),
    )
    t0 = time.time()
    lorenz = (
        scalable_ntile(
            scored, 10, [("mq", "desc"), ("doc_id", "asc")],
            out_col="decile",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
    )
    rows10 = lorenz.collect()
    t_rank = round(time.time() - t0, 2)
    sizes = sorted(r["n_docs"] for r in rows10)
    assert len(rows10) == 10 and sizes[0] == sizes[-1] == n_rank // 10, sizes
    print(
        json.dumps(
            {"probe": "rank_decile_10m", "rows_in": n_rank, "sec": t_rank,
             "mrows_per_sec": round(n_rank / t_rank / 1e6, 2)}
        ),
        flush=True,
    )

    # round 12: the GROUPED ranked path on a Zipf-skewed key (the
    # per-group NTILE family re-plan: ccnet_perplexity_buckets /
    # robust_order_value_stats / customer_segment_migration /
    # event_value_quantile_normalization — VERDICT r11 item 2).  A
    # 10M-row frame whose group key is exponentially skewed (group g
    # holds ~2^-(g+1) of the rows, so the HEAD group alone is ~5M
    # rows — the partitioned-window form sorts those in ONE task).
    # The probe times the chunked grouped scalable_ntile against that
    # single-task-per-group window on the same frame; correctness is
    # asserted inline (per-group SQL-standard tile sizes).
    skew = spark.range(n_rank).select(
        F.col("id").alias("doc_id"),
        (F.xxhash64(F.col("id")) % 1_000_000).cast("double").alias("mq"),
        # floor(log2(u+1)) over u ~ U[0, 2^20): group 19 gets half
        # the rows, 18 a quarter, ... — a 20-group Zipf-like skew.
        F.floor(
            F.log2(F.pmod(F.xxhash64(F.col("id"), F.lit(7)),
                          F.lit(1 << 20)) + 1)
        ).cast("int").alias("grp"),
    )
    t0 = time.time()
    gsizes = (
        scalable_ntile(
            skew, 3, [("mq", "desc"), ("doc_id", "asc")],
            group_cols=["grp"], out_col="tercile",
        )
        .groupBy("grp", "tercile")
        .agg(F.count("*").alias("n"))
    )
    grows = gsizes.collect()
    t_grank = round(time.time() - t0, 2)
    per_grp: dict[int, list[int]] = {}
    for r in grows:
        per_grp.setdefault(r["grp"], []).append(r["n"])
    for g, ns in per_grp.items():
        assert max(ns) - min(ns) <= 1, (g, ns)  # SQL NTILE size law
    head = max(sum(ns) for ns in per_grp.values())
    print(
        json.dumps(
            {"probe": "rank_grouped_zipf_10m", "rows_in": n_rank,
             "n_groups": len(per_grp), "head_group_rows": head,
             "sec": t_grank,
             "mrows_per_sec": round(n_rank / t_grank / 1e6, 2)}
        ),
        flush=True,
    )
    from pyspark.sql import Window as _W

    t0 = time.time()
    wsizes = (
        skew.select(
            "grp",
            F.ntile(3)
            .over(_W.partitionBy("grp").orderBy(F.desc("mq"), "doc_id"))
            .alias("tercile"),
        )
        .groupBy("grp", "tercile")
        .agg(F.count("*").alias("n"))
    )
    wsizes.collect()
    t_gwin = round(time.time() - t0, 2)
    print(
        json.dumps(
            {"probe": "rank_grouped_zipf_10m_window_baseline",
             "rows_in": n_rank, "sec": t_gwin,
             "speedup_vs_window": round(t_gwin / t_grank, 2)}
        ),
        flush=True,
    )

    # round 13: the census top-k path (the unpartitioned row_number
    # family re-plan: doc_rake_keyphrases / rec_popularity_ndcg —
    # VERDICT r12 items 2+5).  A 10M-row synthetic phrase-census
    # frame (score + text tiebreak); the re-planned orderBy+limit
    # form (TakeOrderedAndProject: per-partition heaps, only K rows
    # cross to the driver-side merge) against the old unpartitioned
    # row_number window (ALL 10M rows sort in ONE task).  Correctness
    # asserted inline: both forms elect the identical top-20.
    census = spark.range(n_rank).select(
        F.concat(F.lit("phrase_"), F.col("id").cast("string")).alias(
            "phrase"
        ),
        (F.xxhash64(F.col("id"), F.lit(13)) % 1_000_000_000).alias(
            "score_q"
        ),
    )
    t0 = time.time()
    topk = (
        census.orderBy(F.col("score_q").desc(), F.col("phrase"))
        .limit(20)
        .withColumn(
            "rank",
            F.row_number().over(
                _W.orderBy(F.col("score_q").desc(), F.col("phrase"))
            ),
        )
    )
    top_rows = topk.collect()
    t_ctopk = round(time.time() - t0, 2)
    assert len(top_rows) == 20 and top_rows[0]["rank"] == 1
    print(
        json.dumps(
            {"probe": "census_topk_10m", "rows_in": n_rank, "sec": t_ctopk,
             "mrows_per_sec": round(n_rank / t_ctopk / 1e6, 2)}
        ),
        flush=True,
    )
    # Baseline honesty (round-13 finding): Spark 4.1's
    # LimitPushDownThroughWindow RESCUES a filtered unpartitioned
    # rank site (it inserts the limit below the window, compiling to
    # TakeOrderedAndProject) — the verified pre-fix doc_rake plan was
    # already rescued, and only no-filter ranks (vocab_zipf_fit) and
    # partitionBy(lit(0)) windows (rec_coverage_gini) single-task-
    # sort for real.  To measure the NAIVE cost the explicit re-plan
    # insures against, the baseline disables the rescue rules; the
    # plan is asserted to actually contain the bare window sort.
    _EXCL = (
        "org.apache.spark.sql.catalyst.optimizer.LimitPushDownThroughWindow,"
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit"
    )
    spark.conf.set("spark.sql.optimizer.excludedRules", _EXCL)
    try:
        t0 = time.time()
        win_df = (
            census.withColumn(
                "rank",
                F.row_number().over(
                    _W.orderBy(F.col("score_q").desc(), F.col("phrase"))
                ),
            )
            .filter(F.col("rank") <= 20)
        )
        win_rows = win_df.collect()
        t_cwin = round(time.time() - t0, 2)
        wplan = win_df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" not in wplan, (
            "baseline got rescued — excludedRules did not take"
        )
    finally:
        spark.conf.unset("spark.sql.optimizer.excludedRules")
    assert sorted(
        (r["rank"], r["phrase"], r["score_q"]) for r in win_rows
    ) == sorted((r["rank"], r["phrase"], r["score_q"]) for r in top_rows)
    print(
        json.dumps(
            {"probe": "census_topk_10m_window_baseline", "rows_in": n_rank,
             "sec": t_cwin,
             "speedup_vs_window": round(t_cwin / t_ctopk, 2)}
        ),
        flush=True,
    )

    print(json.dumps({
        "metric": "scale probe",
        "k": k,
        "rows": n,
        "gen_sec": gen_s,
        "hourly_sec": t_hourly,
        "sliding_direct_sec": t_direct,
        "sliding_rollup_sec": t_rollup,
        "rollup_speedup": round(t_direct / t_rollup, 2),
        "asof_sec": t_asof,
        "exact_dedup_sec": t_dedup,
        "staleness_runmax_sec": t_stale,
        "mwu_ranks_sec": t_mwu,
        "cc_path_2e20_sec": t_ccp,
        "cc_star_10m_sec": t_ccs,
        "knn_ivf_shortlist_sec": t_knn,
        "knn_ivf_vectors": n_vec,
        "rank_decile_10m_sec": t_rank,
        "rank_grouped_zipf_10m_sec": t_grank,
        "rank_grouped_zipf_window_sec": t_gwin,
        "census_topk_10m_sec": t_ctopk,
        "census_topk_window_sec": t_cwin,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
