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
# r10 rotation (registry.py's round-10 window note — VERDICT r9 #1/#7,
# finishing the verification-debt burn): parity sentinels shrank
# 5 → 4 and THIRTY-ONE never-checked queries rotated in (all ten
# zero-history TPC-H shapes, the exact-stats and sketch families,
# pipeline_full_curation, join_full_outer, agg_grouping_sets, the two
# remaining streaming rows, plus like-for-like swaps for graph / win /
# mm / evt / sim / text-novelty). Retired members — incl. the whole
# LM-quality trio whose math pipeline_full_curation's oracle replays —
# stay pytest-oracled every round; registry.py's round-10 note lists
# every outgoing/incoming pair with its justification.
FAMILY_REPRESENTATIVES = {
    "parity_f1_filter_ops": "F1",
    "parity_j1_equijoin": "J1",
    "parity_j9_multiway_join": "J9",
    "theta_distinct_key_join": "theta",
    "tpch_q10_returned": "tpch",
    "tpch_q13_order_distribution": "outer-join",
    "tpch_q17_small_quantity_revenue": "correlated-subquery",
    "tpch_q19_disjunctive": "disjunction",
    "tpch_q20_excess_suppliers": "semi-join",
    "tpch_q22_global_scalar_subquery": "scalar-subquery",
    "src_jsonl_events_agg": "source",
    "src_orc_events_agg": "source",
    "join_full_outer": "join",
    "agg_grouping_sets": "grouping-sets",
    "win_lag_lead": "window",
    "win_rank_dense_ntile": "window",
    "stat_correlation": "stats",
    "stat_exact_quantiles_two_phase": "two-phase",
    "stat_group_ols": "regression",
    "stat_equidepth_histogram": "histogram",
    "sketch_approx_percentiles": "sketch",
    "sketch_hll_mergeable": "mergeable",
    "sketch_kmv_distinct": "kmv",
    "dedup_cluster_keep_best": "components",
    "ml_quality_filter": "ml",
    "graph_triangle_count": "graph",
    "evt_anomaly_zscore": "events",
    "dedup_lines_global": "lines",
    "dedup_minhash_incremental": "incremental",
    "pipeline_dsir_select": "dsir",
    "pipeline_mixture_temperature": "temperature",
    "pipeline_full_curation": "capstone",
    "sim_ann_recall_eval": "evaluation",
    "sim_ann_ivfadc_topk": "ann",
    "sim_jl_project_topk": "dimreduction",
    "dedup_lines_incremental": "incremental",
    "text_bm25_search_robertson": "bm25",
    "text_ngram_novelty": "novelty",
    "mm_ppm_decode_stats": "image",
    "mm_g711_audio_features": "audio",
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
