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
# r12 rotation (registry.py's round-12 window note — VERDICT r11 #1,
# burn the FINAL 18-query backlog, and #5, the first staleness
# re-green pass): the whole never-checked list rotates in (misc ×5,
# pipeline ×7, text ×6) plus the 26 oldest externally-green rows (all
# last green r1: the agg/setop relational core, the fn_* scalar
# families, events windows/json, embedding dedup, sampling, lateral)
# and the two queries this round's code changes modify
# (dedup_minhash_incremental, pipeline_dsir_select). Retired members
# (all r11-green) stay pytest-oracled every round; registry.py's
# round-12 note lists every outgoing/incoming swap and the standing
# staleness rule.
FAMILY_REPRESENTATIVES = {
    "parity_f1_filter_ops": "F1",
    "parity_j1_equijoin": "J1",
    "parity_j9_multiway_join": "J9",
    "theta_distinct_key_join": "theta",
    "dedup_minhash_incremental": "incremental",
    "pipeline_dsir_select": "dsir",
    "misc_association_rules": "mining",
    "misc_dq_constraint_checks": "dq",
    "misc_snapshot_diff": "maintenance",
    "misc_surrogate_keys": "surrogate-keys",
    "misc_unpivot_melt": "unpivot",
    "pipeline_mixing_allocation": "mixing",
    "pipeline_priority_sample": "sampling",
    "pipeline_quantile_normalize": "features",
    "pipeline_remove_dup_spans": "substring",
    "pipeline_shuffle_shards": "shards",
    "pipeline_url_blocklist_filter": "filter",
    "pipeline_weighted_sample": "scan",
    "text_bigram_lm_score": "lm",
    "text_chunk_sliding_window": "chunking",
    "text_lcp_adjacent": "suffix-array",
    "text_repetition_score": "quality",
    "text_simpson_diversity": "diversity",
    "text_term_drift": "drift",
    "agg_anti_join": "anti",
    "agg_count_distinct": "agg",
    "agg_cube": "cube",
    "agg_having": "agg",
    "agg_orderby_limit": "topk",
    "agg_outer_join_coalesce": "outer",
    "agg_rollup": "rollup",
    "agg_subquery_in": "subquery",
    "agg_tpch_q5_region_revenue": "flagship",
    "misc_arg_extremes": "argmax",
    "misc_string_agg_sorted": "string-agg",
    "setop_except": "setop",
    "setop_union_all_count": "setop",
    "evt_json_extract": "json",
    "evt_pivot_counts": "pivot",
    "evt_sliding_window": "window",
    "evt_tumbling_window": "events",
    "fn_conditional": "conditional",
    "fn_date_trunc_add": "date",
    "fn_hash_encode": "hash",
    "fn_map_struct": "struct",
    "fn_math": "math",
    "fn_string_regex_split": "regex",
    "dedup_embedding_cosine": "embedding",
    "misc_deterministic_sample": "sample",
    "misc_lateral_explode": "lateral",
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
