"""Invariant tests for the round-3 planning/layout operators: the
properties that make each plan *executable* (coverage, monotonicity,
bijectivity), checked on the real sf0.001 output — complementing the
oracle parity tests, which prove cross-engine equality but not that
the plan itself is well-formed."""

from __future__ import annotations

from collections import defaultdict

from ml_feature_store_enterprise_grade_spark import registry
from tests.conftest import SF_SMOKE

registry.load_all()


def test_chunking_plan_covers_every_document(spark):
    """Chunks must tile each document: first at 0, stride-spaced,
    positive lengths, and the final chunk reaching est_tokens."""
    rows = registry.queries()["doc_chunking_plan"](spark, SF_SMOKE).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        est = chunks[0].est_tokens
        assert chunks[0].tok_start == 0
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.tok_start == c.chunk_idx * 192
            assert 0 < c.tok_len <= 256
            assert c.tok_start + c.tok_len <= est
        last = chunks[-1]
        assert last.tok_start + last.tok_len == min(est, last.tok_start + 256)
        # full coverage: the last chunk reaches the end of the doc
        assert last.tok_start + last.tok_len == est or last.tok_len == 256


def _morton(x: int, y: int) -> int:
    z = 0
    for i in range(4):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_codes_match_reference_interleave(spark):
    """zfile must equal the reference bit-interleave of (x, y) and be
    bijective over the 16x16 grid (every code < 256, distinct codes
    for distinct cells)."""
    rows = registry.queries()["zorder_layout_plan"](spark, SF_SMOKE).collect()
    seen = {}
    for r in rows:
        assert 0 <= r.x_bucket < 16 and 0 <= r.y_bucket < 16
        z = _morton(r.x_bucket, r.y_bucket)
        assert r.zfile == z
        cell = (r.x_bucket, r.y_bucket)
        if cell in seen:
            assert seen[cell] == r.zfile
        seen[cell] = r.zfile
    assert len(set(seen.values())) == len(seen)


def test_compaction_groups_are_contiguous_and_sized(spark):
    """Merge groups must be contiguous runs in file order within each
    partition, with group boundaries at multiples of the row target."""
    rows = registry.queries()["partition_compaction_plan"](spark, SF_SMOKE).collect()
    by_date = defaultdict(list)
    for r in rows:
        by_date[r.event_date].append(r)
    for date, files in by_date.items():
        files.sort(key=lambda r: r.file_bucket)
        cum = 0
        prev_group = 0
        for f in files:
            assert f.merge_group == cum // 4000
            assert f.merge_group >= prev_group
            prev_group = f.merge_group
            assert f.undersized == (f.n_rows < 4000)
            cum += f.n_rows


def test_scalable_binning_is_value_monotone(spark):
    """Bin ids must be monotone in the binned value: the max value of
    bin k never exceeds the min value of bin k+1."""
    rows = registry.queries()["feature_binning_scalable"](spark, SF_SMOKE).collect()
    lo, hi = {}, {}
    for r in rows:
        lo[r.bin] = min(lo.get(r.bin, float("inf")), r.o_totalprice)
        hi[r.bin] = max(hi.get(r.bin, float("-inf")), r.o_totalprice)
    bins = sorted(lo)
    assert bins[0] >= 1 and bins[-1] <= 10
    for a, b in zip(bins, bins[1:]):
        assert hi[a] <= lo[b]


def test_training_set_export_is_leakage_free(spark):
    """Every feature timestamp strictly precedes (<=) its lookup time
    and every conversion strictly follows it — the leakage contract
    the export exists to enforce."""
    rows = registry.queries()["training_set_export"](spark, SF_SMOKE).collect()
    assert rows
    n_labeled = 0
    for r in rows:
        if r.click_feature_ts is not None:
            assert r.click_feature_ts <= r.lookup_ts
        if r.daily_feature_ts is not None:
            assert r.daily_feature_ts <= r.lookup_ts
        if r.label:
            n_labeled += 1
            assert r.conversion_epoch_s is not None
    assert 0 < n_labeled < len(rows)


def test_systematic_sample_takes_exactly_k_hits_per_stratum(spark):
    """Systematic sampling's defining guarantee: the stride cuts land
    exactly k hits per stratum (Σ n_hits == 20), and every hit count
    is positive."""
    rows = registry.queries()["weighted_systematic_sample"](spark, SF_SMOKE).collect()
    hits = defaultdict(int)
    for r in rows:
        assert r.n_hits >= 1
        hits[r.segment] += r.n_hits
    assert hits and all(v == 20 for v in hits.values()), dict(hits)


def test_negative_samples_are_disjoint_from_positives(spark):
    """Negative pairs must never collide with a real interaction and
    never exceed the per-user draw budget."""
    from pyspark.sql import functions as F

    from ml_feature_store_enterprise_grade_spark.catalog import load_table

    negs = registry.queries()["negative_sample_pairs"](spark, SF_SMOKE)
    orders = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id")
        )
        .distinct()
    )
    assert negs.join(pos, ["user_id", "item_id"]).count() == 0
    per_user = negs.groupBy("user_id").count().agg(F.max("count")).first()[0]
    assert per_user <= 4


def test_rfm_quintiles_are_balanced(spark):
    """NTILE(5) over the per-user aggregate must split each score
    dimension into near-equal quintiles (sizes differ by at most 1)."""
    rows = registry.queries()["rfm_segmentation"](spark, SF_SMOKE).collect()
    for col in ("r_score", "f_score", "m_score"):
        sizes = defaultdict(int)
        for r in rows:
            sizes[getattr(r, col)] += 1
        assert sorted(sizes) == [1, 2, 3, 4, 5]
        assert max(sizes.values()) - min(sizes.values()) <= 1, (col, dict(sizes))


def test_attribution_window_semantics(spark):
    """Attributed purchases must have a touch within the 30-minute
    window; unattributed ones either no prior touch or one outside it."""
    rows = registry.queries()["conversion_attribution"](spark, SF_SMOKE).collect()
    assert rows
    n_attr = 0
    for r in rows:
        if r.attributed:
            n_attr += 1
            assert r.seconds_since_touch is not None
            assert 0 <= r.seconds_since_touch <= 1800
        elif r.seconds_since_touch is not None:
            assert r.seconds_since_touch > 1800
    assert 0 < n_attr <= len(rows)


def test_interarrival_gaps_are_consistent(spark):
    """Gap stats must be internally consistent: min <= median <= max,
    all gaps nonnegative, and gap count = purchases - 1 per user."""
    from pyspark.sql import functions as F

    from ml_feature_store_enterprise_grade_spark.catalog import load_table

    stats = {r.user_id: r for r in registry.queries()["purchase_interarrival_stats"](spark, SF_SMOKE).collect()}
    purchases = dict(
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("user_id").isNotNull() & (F.col("event_type") == "purchase"))
        .groupBy("user_id")
        .count()
        .rdd.map(lambda r: (r["user_id"], r["count"]))
        .collect()
    )
    assert stats
    for uid, r in stats.items():
        assert r.n_gaps == purchases[uid] - 1
        assert 0 <= r.min_gap_s <= r.p50_gap_s <= r.max_gap_s
