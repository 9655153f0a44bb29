"""Dump the executed physical plan of every headline query to
PLANS.md — reviewable evidence that each plan has the shape the
docstrings claim (pushdown, broadcast, partial agg, no cartesian
products). Run per round after bench changes.

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark

# Plans worth reviewing beyond the benched set: the training-pipeline
# and storage-layout operators added in r2, plus the heaviest new TPC-H
# shapes.
EXTRA = [
    "pipeline_decontaminate",
    "pipeline_pack_sequences",
    "pipeline_stratified_sample",
    "text_tfidf_top_terms",
    "sim_semdedup",
    "dedup_components",
    "dedup_embedding_cosine_lsh",
    "theta_distinct_key_join",
    "rollup_daily_by_type",
    "bucketed_colocated_join",
    "stream_sliding_exec",
    "tpch_q2_best_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "stream_static_join_exec",
    "stream_stream_join_exec",
    "merge_upsert_orders",
    "skew_salted_agg",
    "pdf_grouped_map_topnorm",
    # r3 additions
    "sim_ann_ivf_kmeans_topk",
    "stream_idempotent_sink_exec",
    "win_time_range_moving_sum",
    "pipeline_full_curation",
    # r4-continuation additions
    "dedup_substring_spans",
    "pipeline_remove_dup_spans",
    "sketch_heavy_hitters",
    "text_bigram_lm_score",
    "evt_funnel_stages",
    "evt_retention_cohorts",
    "evt_anomaly_zscore",
    "stat_equidepth_histogram",
    "stat_median_abs_deviation",
    "misc_fuzzy_join_dist1",
    "sketch_hll_mergeable",
    "win_distribution_funcs",
    "src_csv_events_agg",
    "src_orc_events_agg",
    "misc_compaction_roundtrip",
    "evt_variant_extract",
    "fn_python_udtf",
    "misc_entity_resolution",
    "misc_scd2_point_in_time_join",
    "misc_surrogate_keys",
    "win_grouped_topk_two_phase",
    "pipeline_train_test_split",
    "pipeline_unicode_clean",
    "mm_ms_adpcm_audio_features",
    "misc_dq_constraint_checks",
    "stream_rollup_refresh_exec",
    # r5 additions
    "text_bm25_search",
    "text_bpe_train",
    "text_bpe_tokenize",
    "sim_hybrid_rrf",
    "sketch_bloom_membership",
    "sketch_count_min",
    "sketch_kmv_distinct",
    "pipeline_priority_sample",
    "pipeline_mixing_allocation",
    "pipeline_dup_capping",
    "dedup_sorted_neighborhood",
    "misc_association_rules",
    "misc_snapshot_diff",
    "text_term_drift",
    "evt_cusum_changepoint",
    "graph_sssp_weighted",
    "stat_winsorize",
    "sketch_kmv_intersection",
    "text_simpson_diversity",
    "pipeline_quantile_normalize",
    "pipeline_curation_v2",
    "stream_stream_left_join_exec",
    "misc_incremental_join_view",
    "misc_skyline_pareto",
    "misc_skew_diagnostics",
    "text_phrase_search",
    "evt_markov_transitions",
    "evt_time_decayed_value",
    "evt_rolling_distinct_users",
    "sim_centroid_alignment",
    # r6 additions
    "text_bm25_search_indexed",
    "sim_ann_ivfadc_topk",
    "stat_winsorize_approx",
    "mm_decode_quarantine",
    "ml_perceptron_quality_eval",
    "sim_pca_covariance",
    "sim_jl_project_topk",
    "dedup_minhash_incremental",
    "pipeline_shuffle_shards",
    "pipeline_token_budget_head",
    "ml_quality_filter",
    "stream_quality_gate_exec",
    "pipeline_curation_v3",
    "text_ccnet_ppl_buckets",
    # r7 additions
    "text_ccnet_ppl_buckets_log",
    "text_kneser_ney_ppl",
    "text_bm25_search_robertson",
    "text_bm25_index_append",
    "text_suffix_array_sharded",
    "stream_minhash_dedup_exec",
    "stream_bm25_index_append_exec",
    "pipeline_curation_v4",
    "dedup_semdedup_incremental",
    "text_gopher_quality_filters",
    # r8 additions
    "pipeline_curation_v5",
    "text_bm25_index_compact",
    "text_repetition_filters",
    "pipeline_dsir_select",
    "text_ngram_novelty",
    "pipeline_mixture_temperature",
    "sim_ann_prefix_rerank",
    "text_novelty_incremental",
    "stream_novelty_gate_exec",
    # r9 additions
    "dedup_lines_global",
    "dedup_cluster_keep_best",
    "sim_ann_recall_eval",
    "dedup_lines_incremental",
    "stream_lines_gate_exec",
    # r10: every driver-window member gets a reviewable plan — the 31
    # freshly rotated-in rows plus the parity sentinel
    "parity_f1_filter_ops",
    "tpch_q10_returned",
    "tpch_q11_important_parts",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_ratio",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_suppliers",
    "tpch_q22_global_scalar_subquery",
    "src_jsonl_events_agg",
    "join_full_outer",
    "agg_grouping_sets",
    "win_lag_lead",
    "win_rank_dense_ntile",
    "stat_correlation",
    "stat_exact_median",
    "stat_exact_quantiles_two_phase",
    "stat_group_ols",
    "sketch_approx_percentiles",
    "graph_triangle_count",
    "mm_ppm_decode_stats",
    "mm_g711_audio_features",
    # ADVICE r10: tpch_q19 was the one r10-window member whose plan
    # never got dumped; add it plus the r11-window incoming rows not
    # already covered above or in bench.HEADLINE, so every
    # driver-window member keeps a reviewable plan.
    "tpch_q19_disjunctive",
    # r11 additions
    "agg_count_if_bool",
    "agg_tpch_q6",
    "theta_count_by_key",
    "skew_salted_join",
    "misc_zorder_roundtrip",
    "text_token_count_bpe",
    "text_inverted_index",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    specs = load_all()
    spark = get_spark(app_name="mas-plans", cpus=8)
    out = ["# PLANS — executed physical plans of the headline queries",
           f"\nGenerated from {sf_dir} (AQE final plans, post-execution).\n"]
    for name in HEADLINE + EXTRA:
        df = specs[name].fn(spark, sf_dir)
        df.collect()  # finalize the AQE plan
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        out.append(f"## {name}\n\n```\n{buf.getvalue().strip()}\n```\n")
    spark.stop()
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
