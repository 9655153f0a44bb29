"""Pin the driver-window contract: the external driver's per-round
correctness gate covers only the first 50 registered queries, so that
prefix must (a) be exactly the curated list, (b) stay at 50, and
(c) contain at least one representative of every family — rounds 1 and
2 each rotated different families through the window and neither round
re-verified both halves; this test stops the seesaw.
"""

from __future__ import annotations

from minoan_athenaeum_spark.registry import CURATED_PREFIX, load_all

SPECS = load_all()

# One prefix member per family; the family tag it must carry.
FAMILY_REPRESENTATIVES = {
    "parity_f1_filter_ops": "F1",
    "theta_distinct_key_join": "theta",
    "agg_g1_groupby_count_sum": "G1",
    "agg_tpch_q1": "agg",
    "tpch_q18_large_orders": "tpch",
    "setop_intersect": "setop",
    "win_time_range_moving_sum": "window",
    # r7 rotation: heavy-hitters (green r6) handed its slot to HLL —
    # the oldest never-driver-green query; the sketch cluster keeps two
    # window members (KMV + HLL).
    "sketch_hll_distinct": "sketch",
    "dedup_substring_spans": "substring",
    "text_suffix_array": "suffix-array",
    # r7 rotation: fn_string_basics (green r1-r6) handed its slot to
    # the new ML-training family; fn_pandas_udf_vectorized carries the
    # 'functions' tag too, so the scalar-function family keeps a rep.
    "fn_pandas_udf_vectorized": "functions",
    "ml_perceptron_quality_train": "ml",
    "graph_sssp_weighted": "graph",
    # r6 rotation: SCD2/CDC (driver-green r4/r5, pytest-oracled since)
    # handed their slots to the mining rep and the IVM maintenance rep;
    # the merge/CDC/SCD2/IVM cluster keeps one window member.
    "misc_skyline_pareto": "mining",
    "evt_sessionize": "events",
    "sketch_kmv_intersection": "sketch",
    "misc_incremental_join_view": "maintenance",
    # r7 rotation: skew_salted_agg (green r1-r6) handed its slot back
    # to the stats family (GK-winsorize, the 100 TB default bounds).
    "stat_winsorize_approx": "stats",
    "mm_adpcm_audio_features": "compressed",
    "dedup_exact": "dedup",
    "dedup_minhash_incremental": "incremental",
    "sim_hybrid_rrf": "similarity",
    "sim_ann_pq_adc_topk": "pq",
    "sim_pca_covariance": "pca",
    "pipeline_pii_redact": "pii",
    "text_bm25_search_indexed": "text",
    "ts_asof_join": "timeseries",
    "mm_jpeg_decode_stats": "multimodal",
    "stream_dedup_exec": "streaming",
    "rollup_incremental_refresh": "rollup",
    "bucketed_colocated_join": "bucketing",
    "pipeline_curation_v3": "pipeline",
    "pipeline_token_budget_head": "selection",
}


def test_prefix_is_exactly_the_driver_window():
    assert len(CURATED_PREFIX) == 50
    assert len(set(CURATED_PREFIX)) == 50, "duplicate prefix entries"
    assert list(SPECS)[:50] == CURATED_PREFIX


def test_prefix_names_all_registered():
    missing = [n for n in CURATED_PREFIX if n not in SPECS]
    assert not missing, f"prefix names not in registry: {missing}"


def test_every_family_has_a_window_representative():
    for name, tag in FAMILY_REPRESENTATIVES.items():
        assert name in CURATED_PREFIX, f"{name} fell out of the driver window"
        assert tag in SPECS[name].tags, f"{name} no longer tagged {tag!r}"


def test_window_is_fully_oracle_gated():
    # Round 4 closed the last two rows-only entries (HLL via
    # within-bound verdicts; stateful streaming via final-state
    # read-back), so EVERY window row must now carry a DuckDB oracle.
    no_oracle = [n for n in CURATED_PREFIX if not SPECS[n].oracle]
    assert not no_oracle, (
        f"rows-only queries in the driver window: {no_oracle}"
    )
