"""Unit pins for the connected-components operator beyond what the
``dedup_components`` oracle query exercises (its duplicate groups are
near-cliques of diameter ≤ 3; these fixtures stress long diameters,
disconnected pieces, and edge-list quirks)."""

from __future__ import annotations

from minoan_athenaeum_spark.operators.components import connected_components


def _labels(df):
    return {r.node: r.comp for r in df.collect()}


def test_path_graph_converges_to_min_label(spark):
    # A 40-node path has diameter 39 — far beyond the 2-3 rounds a
    # dedup clique needs; min-label propagation halves the unresolved
    # span each round only at the min end, so this exercises the loop's
    # convergence check rather than finishing in the first iterations.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], ["src", "dst"]
    )
    got = _labels(connected_components(edges, max_iter=50))
    assert got == {i: 0 for i in range(40)}


def test_two_components_and_reversed_duplicate_edges(spark):
    # Two separate components; edges listed in both directions, with
    # duplicates and a self-loop — none of which may change the result.
    rows = [(5, 3), (3, 5), (3, 1), (7, 9), (9, 7), (9, 9), (7, 11), (3, 1)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    got = _labels(connected_components(edges))
    assert got == {1: 1, 3: 1, 5: 1, 7: 7, 9: 7, 11: 7}


def test_star_graph_single_round_shape(spark):
    # A star centered on the max id: every leaf must still end up
    # labeled with the smallest leaf id, which requires propagation
    # THROUGH the center (two hops), not just direct neighbor minima.
    center = 100
    edges = spark.createDataFrame(
        [(center, leaf) for leaf in (17, 23, 42)], ["src", "dst"]
    )
    got = _labels(connected_components(edges))
    assert got == {17: 17, 23: 17, 42: 17, 100: 17}


def test_nonconvergence_raises_not_silent(spark):
    # A path graph needs O(diameter) rounds; with max_iter below that
    # the labels are WRONG, and returning them silently was the failure
    # mode flagged in round 2 — it must raise instead.
    import pytest

    edges = spark.createDataFrame([(i, i + 1) for i in range(30)], ["src", "dst"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3)


def test_star_contraction_path_graph(spark):
    # The exact case propagation cannot do in bounded rounds: a long
    # path (diameter = n). Star contraction closes it in O(log^2 n).
    from minoan_athenaeum_spark.operators.components import (
        connected_components_star,
    )

    n = 200
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], ["src", "dst"])
    got = _labels(connected_components_star(edges))
    assert got == {i: 0 for i in range(n + 1)}


def test_star_contraction_convergence_probe_job_budget(spark):
    # The fixpoint check is ONE aggregate (count + bit_xor signature)
    # per round, carried across rounds — not the two exceptAll
    # anti-joins it used to be. On this exact input the old probe cost
    # 134 Spark jobs total and the signature version costs 100 (each
    # exceptAll expanded to ~3 AQE jobs per round); pin a ceiling
    # between the two so a reintroduced per-round anti-join (or any
    # second probe action) fails loudly.
    from minoan_athenaeum_spark.operators.components import (
        connected_components_star,
    )

    sc = spark.sparkContext
    edges = spark.createDataFrame([(i, i + 1) for i in range(200)], ["src", "dst"])
    sc.setJobGroup("cc-star-budget", "convergence probe job budget")
    try:
        got = _labels(connected_components_star(edges))
    finally:
        sc.setJobGroup(None, None)
    assert got == {i: 0 for i in range(201)}
    jobs = sc.statusTracker().getJobIdsForGroup("cc-star-budget")
    assert len(jobs) <= 115, (
        f"star contraction ran {len(jobs)} jobs on the 200-node path; "
        "the single-signature convergence probe budget is 115 "
        "(exceptAll-based probing measured 134)"
    )


def test_star_contraction_matches_propagation_on_random_graphs(spark):
    import random

    from minoan_athenaeum_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(42)
    for trial in range(3):
        nodes = list(range(trial * 1000, trial * 1000 + 60))
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(40)
        ] + [(n, n) for n in rng.sample(nodes, 5)]  # self-loops tolerated
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        df = spark.createDataFrame(edges, ["src", "dst"])
        assert _labels(connected_components_star(df)) == _labels(
            connected_components(df)
        )


def test_star_contraction_two_components_and_duplicate_edges(spark):
    from minoan_athenaeum_spark.operators.components import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(5, 9), (9, 5), (9, 14), (100, 101), (101, 100)], ["src", "dst"]
    )
    got = _labels(connected_components_star(edges))
    assert got == {5: 5, 9: 5, 14: 5, 100: 100, 101: 100}
