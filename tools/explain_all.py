"""Dump executed physical plans for the headline queries → PLANS.md.

Each plan is captured AFTER execution (AQE-final: real join
strategies, coalesced partitions, codegen stage markers).  Re-run
after plan-affecting changes: python tools/explain_all.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ml_feature_store_enterprise_grade_spark import registry
from ml_feature_store_enterprise_grade_spark.session import get_spark

QUERIES = (
    "pricing_summary",
    "region_revenue",
    "top_revenue_orders",
    "event_customer_enrichment",
    "pit_asof_join",
    "latest_feature_snapshot",
    "user_hourly_features",
    "user_sliding_features_rollup",
    "user_rolling_7d_features",
    "drift_ks_click_vs_view",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "embedding_neardup",
    "corpus_contamination",
    "doc_repetition_stats",
    "user_primary_event_type",
    "multimodal_frame_dedup",
    "dedup_clusters",
    "pit_label_join",
    "target_encoding_loo",
    "feature_hash_cross",
    # round 3 additions
    "feature_binning_scalable",
    "training_set_export",
    "gdpr_deletion_audit",
    "user_wow_delta_features",
    "doc_bigram_logprob",
    "inverted_index_postings",
    "doc_chunking_plan",
    "zorder_layout_plan",
    "partition_compaction_plan",
    "vocab_oov_rate",
    "embedding_dim_stats",
    "dedup_rate_by_lang",
    "incremental_feature_update",
    "item_cooccurrence_lift",
    "negative_sample_pairs",
    "weighted_systematic_sample",
    "cdc_merge_upsert",
    "snapshot_diff_audit",
    "stream_sliding_features",
    "embedding_truncation_audit",
    # round 3 continuation: sketches + the new dedup passes
    "kmv_audience_overlap",
    "bloom_prejoin_prune",
    "histogram_quantile_rollup",
    "segment_dedup",
    "semantic_dedup",
    "dedup_crossdoc_spans",
    # deferred (round-4 window) queries — plans audited now
    "crossdoc_span_trim",
    "split_neardup_leakage",
    "user_decay_weighted_features",
    "order_reconciliation_audit",
    "ann_filtered_topk",
    "crossdoc_span_heavy_hitters",
    "embedding_label_confusion",
    "vocab_oov_rate",
    # round 4: TPC-H shapes, governance, containment, and the
    # round-5-deferred trio
    "returned_items_revenue",
    "large_volume_customers",
    "nation_market_share",
    "product_type_profit",
    "k_anonymity_audit",
    "doc_prefix_cluster_stats",
    "shingle_containment_pairs",
    "quality_expectation_suite",
    "dup_cluster_size_histogram",
    "embedding_covariance",
    # round 5
    "customer_order_distribution",
    "waiting_supplier_audit",
    "important_parts_share",
    "min_price_supplier_region",
    "lsh_tuning_report",
    "corpus_ngram_novelty",
    "feature_correlation_matrix",
    "l_diversity_audit",
    "hll_portable_distinct_rollup",
    "revenue_grouping_sets",
    "daily_event_type_pivot",
    "feature_unpivot_long",
    "multimodal_decode_features",
    "multimodal_resize",
    "bm25_search_topk",
    "rrf_hybrid_topk",
    "training_shard_manifest",
    "event_props_variant",
    "pyds_jsonl_roundtrip",
    "item_pagerank",
    # round 7
    "brand_bracket_revenue",
    "local_supply_share",
    "monthly_revenue_momentum",
    "order_value_zscore_outliers",
    "doc_token_entropy",
    "doc_winnowing_fingerprints",
    "embedding_pq_codes",
    "stream_event_type_share",
    "doc_winnowing_matches",
    "user_activity_entropy",
    "acctbal_gini_by_segment",
    "monthly_revenue_gap_fill",
    # round 7b: link prediction (wedge join), HRW sharding (map-side
    # argmax), JL audit (array folds), quantile normalization (NTILE),
    # SAX (bounded windows), segment migration (full outer), BPE
    # (iterative bounded-vocab loop)
    "item_ra_link_prediction",
    "doc_shard_rendezvous",
    "embedding_jl_distortion",
    "event_value_quantile_normalization",
    "daily_revenue_sax",
    "customer_segment_migration",
    "bpe_merge_learning",
    "source_ablation_report",
    "corpus_lexical_drift",
    "embedding_centroid_drift",
    "phrase_search_topdocs",
    "bitemporal_customer_features",
    "doc_language_purity",
    "top_orders_diversified",
    "hard_negative_pairs",
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    # round 8: privacy bounding (pure hash aggs), modularity (broadcast
    # labels over cached edges), margin mining (broadcast batch, no
    # all-pairs), audio kernel (MapInPandas, no BatchEvalPython).
    # stream_asof_enrichment is absent by design: its returned frame
    # is a parquet read-back of the foreachBatch sink, so the batch
    # plan here would show only the scan; its PIT semantics are
    # pinned by tests/test_round8_ops.py (never-leaks-open-window +
    # full-coverage) and its per-batch join is an explicit
    # F.broadcast in the foreachBatch body.
    "dp_contribution_bounding",
    "graph_modularity",
    "embedding_bitext_margin",
    "multimodal_audio_energy",
    # round 9: the rank-test pair (bucketed prefix sums, no global
    # sort), VR test (day-frame windows), ARI/silhouette over the
    # memoized Lloyd fit (broadcast-literal distance folds), LLR
    # (vocab-bounded margins re-aggregated, no corpus rescan),
    # blocklist scan (single pass, no join), PIT staleness audit
    # (broadcast as-of + discrete percentiles), 1-NN label agreement
    # (broadcast nested-loop all-pairs baseline, max-struct election).
    "event_value_mann_whitney",
    "event_value_kruskal_wallis",
    "daily_revenue_variance_ratio",
    "embedding_cluster_label_ari",
    "embedding_silhouette",
    "corpus_bigram_llr",
    "doc_blocklist_filter",
    "pit_staleness_audit",
    "embedding_knn_label_accuracy",
    # round 10 additions
    "minhash_jaccard_error_audit",
    "session_gap_sensitivity",
    "dict_encoding_advisor",
    "target_encoding_smoothing_sweep",
    "vocab_coverage_curve",
    "embedding_distance_profile",
    "anonymity_generalization_ladder",
    "event_value_winsorize_sweep",
    "multimodal_audio_silence_runs",
    "cobuy_community_conductance",
    "dedup_method_agreement",
    "rec_novelty_by_rank",
    # round 10 post-seal additions
    "range_partition_balance_plan",
    "part_price_dispersion_audit",
    "embedding_effective_rank",
    "doc_compression_ratio_screen",
    "embedding_pq_adc_recall",
    "user_decay_features",
    "approximate_fd_audit",
    "t_closeness_audit",
    "daily_revenue_forecast_backtest",
    "order_value_bootstrap_ci",
    "sequence_packing_efficiency",
    "skew_resilient_distinct_rollup",
    "salted_enrichment_join",
    "jaccard_prefix_filter_join",
    # round 11 additions: the re-planned NTILE family (audit target:
    # no unpartitioned WindowExec over a data-sized frame) plus one
    # per new operator class.
    "quality_concentration_curve",
    "rfm_segmentation",
    "percentile_rank_features",
    "supplier_acctbal_ntile",
    "acctbal_revenue_spearman",
    "feature_binning_quantile",
    "part_revenue_abc_classes",
    "knn_router_ivf_recall",
    "corpus_token_budget_curriculum",
    "training_shard_cut_plan",
    "dp_histogram_release",
    "order_value_median_ci",
    "order_value_conformal_interval",
    "multimodal_image_edge_density",
    "lm_dirichlet_search_topk",
    "bm25_prf_expansion",
    "event_value_hill_tail_index",
    "cobuy_edge_embeddedness",
    # round 12 additions
    "daily_revenue_theil_sen",
    "order_value_drift_fdr",
    "item_hits_authority",
    "bloom_filter_sizing_advisor",
    "dp_median_release",
    "stream_cusum_drift_monitor",
    "mmr_diversified_topk",
    "shard_reshard_movement_audit",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain_all", cpus=8)
    qs = {**registry.queries(), **registry.DEFERRED_QUERIES}
    out = [
        "# PLANS — executed physical plans (AQE-final) at "
        f"`{sf_dir}`\n\nGenerated by `tools/explain_all.py`; plans show the join "
        "strategies, pushed filters, pruned read schemas, and `*(n)` "
        "whole-stage-codegen stages the engine's scale claims rest on.\n"
    ]
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # Keep the final plan section only (drop AQE's initial-plan echo).
        plan = plan.split("+- == Initial Plan ==")[0].rstrip()
        out.append(f"\n## {name}\n\n```\n{plan}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("".join(out))
    print(f"wrote PLANS.md ({len(QUERIES)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
