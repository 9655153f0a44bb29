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
# r9 rotation (registry.py's round-9 window note — the VERDICT r8 #1
# verification-debt burn): parity sentinels shrank 8 → 5, twenty
# never-checked queries rotated in, so several families hand their
# slot to a different member (agg → the G1 math inside the TPC-H
# shapes; time-series/multimodal/bucketing reps retired under rule 2
# after 4-green streaks — those FAMILIES remain covered by the local
# oracle sweep every round, and rule 2 allows any 3+-streak retirement
# in favor of never-checked rows). Rotated-out members stay
# pytest-oracled every round. Late-r9: the five-query r9 crop
# entered under rule 3 via like-for-like single-green swaps
# (registry.py round-9 note) — line dedup (batch + incremental +
# streaming gate), cluster keep-best, and the ANN recall harness
# take the slots of their r8-green family siblings.
FAMILY_REPRESENTATIVES = {
    "parity_f1_filter_ops": "F1",
    "theta_distinct_key_join": "theta",
    "text_repetition_filters": "quality",
    "pipeline_dsir_select": "dsir",
    "tpch_q9_product_profit": "tpch",
    "tpch_q2_best_supplier": "tpch",
    "tpch_q7_volume_shipping": "tpch",
    "tpch_q8_market_share": "tpch",
    "tpch_q21_waiting_suppliers": "tpch",
    "src_csv_events_agg": "source",
    "src_jsonl_events_agg": "source",
    "src_orc_events_agg": "source",
    "win_grouped_topk_two_phase": "window",
    "sketch_hll_distinct": "sketch",
    "text_suffix_array_sharded": "suffix-array",
    "fn_python_udtf": "functions",
    "dedup_cluster_keep_best": "components",
    "ml_quality_filter": "ml",
    "graph_pagerank_fixed_point": "graph",
    "sketch_count_min": "count-min",
    "evt_funnel_stages": "events",
    "evt_markov_transitions": "events",
    "misc_fuzzy_join_dist1": "fuzzy",
    "misc_entity_resolution": "entity",
    "text_bm25_index_compact": "compaction",
    "text_bm25_search_robertson": "bm25",
    "stat_winsorize_approx": "stats",
    "text_phrase_search": "phrase",
    "dedup_lines_global": "lines",
    "dedup_minhash_incremental": "incremental",
    "sim_ann_recall_eval": "evaluation",
    "sim_ann_ivfadc_topk": "ann",
    "sim_ann_prefix_rerank": "ann",
    "dedup_lines_incremental": "incremental",
    "text_novelty_incremental": "novelty",
    "text_ccnet_ppl_buckets_log": "lm",
    "text_kneser_ney_ppl": "perplexity",
    "text_gopher_quality_filters": "gopher",
    "mm_png_decode_stats": "multimodal",
    "mm_wav_audio_features": "audio",
    "mm_video_frame_sample": "video",
    "stream_novelty_gate_exec": "streaming",
    "stream_quality_gate_exec": "streaming",
    "stream_lines_gate_exec": "exec",
    "pipeline_mixture_temperature": "temperature",
    "pipeline_curation_v4": "pipeline",
    "pipeline_curation_v5": "capstone",
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
