"""Reusable graph operators (DataFrame-native, no GraphX/GraphFrames
dependency — nothing in the container provides them, and the shapes
below are plain joins + aggregations Catalyst can optimize).

Input convention: an undirected graph as a DataFrame of distinct
edges ``(u, v)`` with ``u < v`` (both integral).  See
queries/graph.py for derivation from relational tables and for the
scale rationale (degree-ordered orientation, fixed-point PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree of an undirected edge list: ``(node, d)``."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )


def orient_by_degree(edges: DataFrame, deg: DataFrame) -> DataFrame:
    """Direct each edge from its lower-(degree, id) endpoint: ``(src, dst)``.

    This total order is what bounds wedge generation by arboricity —
    a hub's edges all point INTO it, so the hub is never a wedge apex
    (Suri & Vassilvitskii's "curse of the last reducer" fix).
    """
    e = edges.join(
        deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )


def triangle_summary(edges: DataFrame) -> DataFrame:
    """One-row exact summary of an undirected graph:
    ``(n_nodes, n_edges, n_wedges, n_triangles, max_degree)``.

    Wedges are generated only at each edge's low-ordered endpoint and
    each triangle is counted exactly once at its lowest-ordered vertex.
    """
    deg = degrees(edges)
    oriented = orient_by_degree(edges, deg)

    w1 = oriented.join(
        deg.select(F.col("node").alias("dst"), F.col("d").alias("db")), "dst"
    ).select(F.col("src"), F.col("dst").alias("b"), F.col("db"))
    w2 = oriented.join(
        deg.select(F.col("node").alias("dst"), F.col("d").alias("dc")), "dst"
    ).select(F.col("src"), F.col("dst").alias("c"), F.col("dc"))
    wedges = (
        w1.join(w2, "src")
        .where(
            (F.col("db") < F.col("dc"))
            | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
        )
        .select("src", "b", "c")
    )
    tri = wedges.join(
        oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
    )
    return (
        edges.agg(F.count("*").alias("n_edges"))
        .crossJoin(
            deg.agg(F.count("*").alias("n_nodes"), F.max("d").alias("max_degree"))
        )
        .crossJoin(wedges.agg(F.count("*").alias("n_wedges")))
        .crossJoin(tri.agg(F.count("*").alias("n_triangles")))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles", "max_degree")
    )


def pagerank_fixed_point(
    edges: DataFrame, iters: int = 5, scale: int = 10**12, damping_pct: int = 85
) -> DataFrame:
    """Fixed-point integer PageRank over an undirected edge list.

    Rank is stored as ``rank * scale`` in BIGINT; every step uses
    integer division only, so the result is bit-reproducible across
    engines, partitionings, and retries.  Returns ``(node, rank)``
    after ``iters`` rounds; total mass stays ≈ ``scale`` (floor-
    division remainders are dropped, matching the oracle exactly).
    """
    arcs = edges.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        edges.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    nodes = arcs.select(F.col("src").alias("node")).distinct()
    outdeg = arcs.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("od"))
    n = nodes.count()

    teleport_pct = 100 - damping_pct
    base = (teleport_pct * scale) // (100 * n)
    rank = nodes.select("node", F.lit(scale // n).cast("long").alias("rank"))
    for _ in range(iters):
        rank = (
            rank.join(outdeg, "node")
            .select("node", F.expr("rank div od").alias("send"))
            .join(arcs, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.expr(f"{damping_pct} * sum(send) div 100") + F.lit(base)
                ).alias("rank")
            )
        )
    return rank


def sssp_bellman_ford(
    edges: DataFrame, seed: int, rounds: int
) -> tuple[DataFrame, DataFrame]:
    """Synchronous Bellman-Ford single-source shortest paths over a
    weighted undirected edge list ``(u, v, w)`` — the distance
    primitive next to the family's connectivity (components), local
    structure (triangles), and centrality (pagerank) members.

    Each round is ONE shuffle: current distances union'd with every
    one-hop relaxation, min-combined per node (partial aggregation
    makes the map-side combine free). Distances are exact BIGINTs —
    INF is a large sentinel, never NULL/float — so every round is
    bit-reproducible and an unrolled SQL twin can replay it.

    Returns ``(dist_final, dist_prev)`` after ``rounds`` and
    ``rounds-1`` relaxations: callers compare them for a convergence
    verdict (synchronous BF converges within diameter rounds; the
    caller picks ``rounds`` > expected diameter and PINS the verdict
    so data that outgrows the unroll fails loudly instead of silently
    truncating — same discipline as operators/components.py max_iter).
    """
    inf = 1 << 60
    arcs = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w"))
    nodes = arcs.select(F.col("src").alias("node")).distinct()
    dist = nodes.select(
        "node",
        F.when(F.col("node") == seed, F.lit(0))
        .otherwise(F.lit(inf))
        .cast("long")
        .alias("dist"),
    )
    prev = dist
    for r in range(rounds):
        prev = dist
        relaxed = dist.join(arcs, F.col("node") == F.col("src")).select(
            F.col("dst").alias("node"),
            F.when(F.col("dist") >= inf, F.lit(inf))
            .otherwise(F.col("dist") + F.col("w"))
            .cast("long")
            .alias("dist"),
        )
        dist = (
            dist.select("node", "dist")
            .unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist, prev
