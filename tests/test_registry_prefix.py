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
# r8 rotation (registry.py's round-8 window policy): the r7 crop and
# the r8 additions took their family slots; seven long-green rows
# retired for never-checked queries under rule 2. Rotated-out members
# stay pytest-oracled every round.
FAMILY_REPRESENTATIVES = {
    "parity_f1_filter_ops": "F1",
    "theta_distinct_key_join": "theta",
    "agg_g1_groupby_count_sum": "G1",
    # late r8: agg_tpch_q1 retired (green r1/3/5/6/7) for the new
    # repetition battery; q3 carries the agg-family slot.
    "agg_tpch_q3_top10": "agg",
    "text_repetition_filters": "quality",
    "pipeline_dsir_select": "dsir",
    "tpch_q9_product_profit": "tpch",
    # late r8 backlog burn: setop_intersect (green r1..r7) retired for
    # the never-checked CSV source connector; misc_skyline_pareto
    # (green r6/r7) for the never-checked count-min sketch;
    # mm_adpcm_audio_features (green r5..r7) for the never-checked
    # positional phrase search. All three incoming verified green vs
    # their DuckDB oracles at sf0.001 AND sf0.01 before the swap.
    "src_csv_events_agg": "source",
    "win_grouped_topk_two_phase": "window",
    "sketch_hll_distinct": "sketch",
    "dedup_substring_spans": "substring",
    "text_suffix_array_sharded": "suffix-array",
    "fn_python_udtf": "functions",
    "ml_perceptron_quality_train": "ml",
    "graph_pagerank_fixed_point": "graph",
    "sketch_count_min": "count-min",
    "evt_retention_cohorts": "events",
    "sketch_kmv_intersection": "sketch",
    # maintenance cluster: four incremental persisted-index members
    # (BM25 append + compact, streaming BM25, incremental semdedup)
    # plus the rollup refresh rep below.
    "text_bm25_index_compact": "compaction",
    "stat_winsorize_approx": "stats",
    "text_phrase_search": "phrase",
    "dedup_sorted_neighborhood": "dedup",
    "dedup_minhash_incremental": "incremental",
    "sim_hybrid_rrf": "similarity",
    "sim_ann_pq_adc_topk": "pq",
    "sim_pca_covariance": "pca",
    "dedup_semdedup_incremental": "semantic",
    "pipeline_pii_redact": "pii",
    "text_bm25_index_append": "text",
    "text_ccnet_ppl_buckets_log": "lm",
    "text_kneser_ney_ppl": "perplexity",
    "text_gopher_quality_filters": "gopher",
    "ts_asof_join": "timeseries",
    "mm_jpeg_decode_stats": "multimodal",
    "stream_minhash_dedup_exec": "streaming",
    "stream_bm25_index_append_exec": "exec",
    "rollup_incremental_refresh": "rollup",
    "bucketed_colocated_join": "bucketing",
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
