"""Unit pins for the graph operators on hand-built graphs with
known answers (the sf-data oracle parity lives in
tests/test_oracle_parity.py via the registered graph_* queries)."""

from __future__ import annotations

from itertools import combinations

from minoan_athenaeum_spark.operators.graph import (
    pagerank_fixed_point,
    triangle_summary,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in pairs], "u long, v long"
    )


def test_triangle_k4(spark):
    # K4: 4 nodes, 6 edges, C(4,3)=4 triangles, every degree 3.
    k4 = _edges(spark, combinations(range(4), 2))
    row = triangle_summary(k4).collect()[0]
    assert (
        row.n_nodes,
        row.n_edges,
        row.n_triangles,
        row.max_degree,
    ) == (4, 6, 4, 3)


def test_triangle_path_has_none(spark):
    path = _edges(spark, [(i, i + 1) for i in range(10)])
    row = triangle_summary(path).collect()[0]
    assert row.n_triangles == 0
    assert row.n_nodes == 11
    assert row.n_edges == 10


def test_triangle_hub_with_one_closure(spark):
    # Star K1,5 (hub 0) has no triangles; closing one spoke pair adds
    # exactly one.  The hub has max degree but must generate no wedges
    # beyond the closed pair's.
    star = [(0, i) for i in range(1, 6)]
    row = triangle_summary(_edges(spark, star)).collect()[0]
    assert row.n_triangles == 0
    row = triangle_summary(_edges(spark, star + [(1, 2)])).collect()[0]
    assert row.n_triangles == 1
    assert row.max_degree == 5


def test_triangle_matches_bruteforce_random(spark):
    import random

    rng = random.Random(7)
    nodes = range(30)
    pairs = sorted({tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)})
    adj = set(pairs)
    brute = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    row = triangle_summary(_edges(spark, pairs)).collect()[0]
    assert row.n_triangles == brute
    assert row.n_edges == len(pairs)


def test_pagerank_symmetry_and_mass(spark):
    # On a 4-cycle every node is symmetric: all ranks must be EXACTLY
    # equal (fixed-point arithmetic — no float jitter), and total mass
    # stays within iters*n floor-division drops of the scale.
    scale = 10**12
    cyc = _edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])
    rows = pagerank_fixed_point(cyc, iters=4, scale=scale).collect()
    ranks = {r.node: r.rank for r in rows}
    assert len(set(ranks.values())) == 1
    total = sum(ranks.values())
    assert abs(total - scale) <= 4 * 4 * 100  # floor drops only


def test_pagerank_star_center_dominates(spark):
    star = _edges(spark, [(0, i) for i in range(1, 9)])
    rows = pagerank_fixed_point(star, iters=5).collect()
    ranks = {r.node: r.rank for r in rows}
    leaf_ranks = {v for k, v in ranks.items() if k != 0}
    assert len(leaf_ranks) == 1  # leaves exactly symmetric
    assert ranks[0] > 4 * leaf_ranks.pop()  # hub dominates


def test_pagerank_deterministic_across_partitionings(spark):
    # Same graph shuffled into a different partitioning must yield
    # bit-identical ranks (the whole point of fixed-point arithmetic).
    import random

    rng = random.Random(11)
    pairs = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(150)})
    e1 = _edges(spark, pairs)
    e2 = _edges(spark, pairs).repartition(13)
    r1 = {r.node: r.rank for r in pagerank_fixed_point(e1, iters=3).collect()}
    r2 = {r.node: r.rank for r in pagerank_fixed_point(e2, iters=3).collect()}
    assert r1 == r2


def test_sssp_weighted_path_and_unreachable(spark):
    from minoan_athenaeum_spark.operators.graph import sssp_bellman_ford

    # 0 -5- 1 -1- 2 -1- 3, plus shortcut 0 -3- 2, and isolated pair 8-9.
    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 1), (2, 3, 1), (0, 2, 3), (8, 9, 2)],
        "u long, v long, w long",
    )
    dist, prev = sssp_bellman_ford(edges, seed=0, rounds=4)
    inf = 1 << 60
    got = {r.node: (r.dist if r.dist < inf else None) for r in dist.collect()}
    assert got == {0: 0, 1: 4, 2: 3, 3: 4, 8: None, 9: None}
    # converged: rounds 3 and 4 identical
    assert (
        dist.alias("a")
        .join(prev.alias("b"), "node")
        .where("a.dist != b.dist")
        .count()
        == 0
    )
