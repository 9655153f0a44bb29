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
# r11 rotation (registry.py's round-11 window note — VERDICT r10 #1,
# burn the last 43-query backlog): 25 never-checked rows rotated in
# (events ×4, lakehouse-misc ×4, pipeline ×3, text ×3, stats ×2,
# agg ×2, mm ×2, plus theta_count_by_key / win_distribution_funcs /
# skew_salted_join / sim_centroid_alignment /
# ml_perceptron_quality_eval); holdovers are the five queries this
# round's VERDICT items #4-#7 modify, the five streaming gates, the
# capstones, the full sketch family, and the hardest TPC-H/stat
# shapes. Retired members stay pytest-oracled every round;
# registry.py's round-11 note lists every outgoing/incoming swap.
FAMILY_REPRESENTATIVES = {
    "parity_f1_filter_ops": "F1",
    "parity_j1_equijoin": "J1",
    "parity_j9_multiway_join": "J9",
    "theta_distinct_key_join": "theta",
    "agg_count_if_bool": "conditional",
    "agg_tpch_q6": "agg",
    "theta_count_by_key": "aggregate",
    "tpch_q17_small_quantity_revenue": "correlated-subquery",
    "tpch_q22_global_scalar_subquery": "scalar-subquery",
    "win_distribution_funcs": "window",
    "stat_median_abs_deviation": "robust",
    "stat_winsorize": "preprocessing",
    "stat_group_ols": "regression",
    "stat_exact_quantiles_two_phase": "two-phase",
    "sketch_approx_percentiles": "sketch",
    "sketch_hll_mergeable": "mergeable",
    "sketch_kmv_distinct": "kmv",
    "skew_salted_join": "skew",
    "sim_centroid_alignment": "centroid",
    "sim_ann_recall_eval": "evaluation",
    "ml_perceptron_quality_eval": "eval",
    "ml_quality_filter": "ml",
    "evt_cusum_changepoint": "anomaly",
    "evt_rolling_distinct_users": "events",
    "evt_time_decayed_value": "decay",
    "evt_variant_extract": "variant",
    "misc_compaction_roundtrip": "compaction",
    "misc_zorder_roundtrip": "zorder",
    "misc_scd2_point_in_time_join": "scd2",
    "misc_skew_diagnostics": "maintenance",
    "pipeline_dup_capping": "dedup",
    "pipeline_train_test_split": "split",
    "pipeline_unicode_clean": "unicode",
    "text_token_count_bpe": "tokenize",
    "text_inverted_index": "index",
    "text_ccnet_ppl_buckets": "ccnet",
    "dedup_lines_global": "lines",
    "dedup_minhash_incremental": "incremental",
    "pipeline_dsir_select": "dsir",
    "pipeline_full_curation": "capstone",
    "dedup_lines_incremental": "incremental",
    "text_bm25_search_robertson": "bm25",
    "text_ngram_novelty": "novelty",
    "mm_decode_quarantine": "quarantine",
    "mm_ms_adpcm_audio_features": "audio",
    "stream_novelty_gate_exec": "streaming",
    "stream_quality_gate_exec": "streaming",
    "stream_lines_gate_exec": "lines",
    "stream_idempotent_sink_exec": "sink",
    "stream_rollup_refresh_exec": "rollup",
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


def test_readme_query_count_is_current():
    """The README's headline query count must equal the live registry
    size (VERDICT r7 #7 — the count went stale twice; derive it)."""
    import pathlib
    import re

    readme = (
        pathlib.Path(__file__).resolve().parent.parent / "README.md"
    ).read_text()
    claimed = {
        int(m) for m in re.findall(r"(\d+) registered queries", readme)
    } | {
        int(m)
        for m in re.findall(r"every one of the (\d+) registered queries", readme)
    }
    assert claimed == {len(SPECS)}, (
        f"README claims {sorted(claimed)} registered queries; registry has "
        f"{len(SPECS)} — update README.md"
    )
