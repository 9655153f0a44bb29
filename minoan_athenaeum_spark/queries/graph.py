"""Graph analytics over relational data — the co-occurrence-graph
family a training-data pipeline needs (duplicate clusters are graphs;
link graphs drive quality signals like PageRank-style centrality).

The graph here is derived from the TPC-H-ish tables themselves: parts
are nodes, and an edge connects two parts that appear in the same
order ("bought together").  Edge derivation is a per-order bounded
self-join (orders have a handful of line items each, so the pair
expansion is O(items_per_order²) per order — bounded, never
quadratic in the table).

Scale shapes
------------
* Triangle counting uses the classic degree-ordered orientation
  (node-iterator++ / Schank-Wagner; the MapReduce formulation is
  Suri & Vassilvitskii, WWW'11 "Counting Triangles and the Curse of
  the Last Reducer"): every edge is directed from its lower-(degree,
  id) endpoint to the higher one, wedges are generated only at each
  edge's LOW-ordered endpoint, and a triangle is counted exactly once
  at its lowest-ordered vertex.  Wedge work is O(m·α) (α = arboricity)
  instead of O(Σ deg²) — precisely the fix for the "curse of the last
  reducer" when a hub node has millions of neighbours at 100 TB.
* PageRank runs in FIXED-POINT integer arithmetic (scale 10¹²) with
  integer division, so every iteration is exactly reproducible across
  engines and partitionings — no float summation-order drift — and the
  DuckDB oracle replays the identical unrolled recursion.  Each
  iteration is one shuffle (groupBy dst).

Reference parity note: the reference engine (icirellik/minoan-athenaeum,
database.py) has no graph operators at all — this is extension surface
beyond the §2 inventory, same as the dedup/similarity families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.graph import (
    pagerank_fixed_point,
    triangle_summary,
)
from minoan_athenaeum_spark.queries._util import persist_tracked, release_tracked, t
from minoan_athenaeum_spark.registry import query


# --------------------------------------------------------------- edges
def part_cooccurrence_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected edges (u < v) between parts sharing an order.

    Per-order self-join: the join key is l_orderkey, so each order's
    line items meet only each other — the expansion is bounded by the
    square of the (small, bounded) per-order item count.  DISTINCT
    collapses multi-order repeats into one edge.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, on="l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"),
            F.col("b.l_partkey").alias("v"),
        )
        .distinct()
    )


_EDGES_SQL = """
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
"""

_TRIANGLE_ORACLE = f"""
    WITH edges AS ({_EDGES_SQL}),
    deg AS (
        SELECT node, COUNT(*) AS d
        FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
        GROUP BY node
    ),
    oriented AS (
        -- direct each edge from its lower-(degree, id) endpoint
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst
        FROM edges e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ),
    wedges AS (
        -- both spokes leave the same low-ordered apex; order the tips
        -- by the same (degree, id) total order so each wedge is unique
        SELECT e1.src AS apex, e1.dst AS b, e2.dst AS c
        FROM oriented e1
        JOIN oriented e2 ON e1.src = e2.src
        JOIN deg db ON db.node = e1.dst
        JOIN deg dc ON dc.node = e2.dst
        WHERE (db.d, e1.dst) < (dc.d, e2.dst)
    ),
    tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM wedges w JOIN oriented o ON o.src = w.b AND o.dst = w.c
    )
    SELECT (SELECT COUNT(*) FROM deg)            AS n_nodes,
           (SELECT COUNT(*) FROM edges)          AS n_edges,
           (SELECT COUNT(*) FROM wedges)         AS n_wedges,
           (SELECT n_triangles FROM tri)         AS n_triangles,
           (SELECT MAX(d) FROM deg)              AS max_degree
"""


@query("graph_triangle_count", oracle=_TRIANGLE_ORACLE, tags=("graph",))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the part-co-occurrence graph via
    degree-ordered orientation (see module docstring for the scale
    argument; wedge generation happens only at low-ordered apexes, so a
    10-million-degree hub at 100 TB generates no wedges — its edges
    all point INTO it).

    Output is the graph's one-row summary: |V|, |E|, oriented wedge
    count, triangle count, max degree — every value integer-exact.
    """
    release_tracked()
    edges = persist_tracked(part_cooccurrence_edges(spark, sf_dir))
    return triangle_summary(edges)


_PR_SCALE = 10**12
_PR_ITERS = 5


def _pr_oracle() -> str:
    """Unrolled fixed-point PageRank recursion (5 chained CTEs — same
    trick as the unrolled-Lloyd k-means oracle): rank is rank·10¹² in
    BIGINT, each iteration sends rank // od along every arc, and the
    new rank is (85 · Σ incoming) // 100 + (15·SCALE) // (100·n).
    In the both-direction arc rendering of an undirected graph every
    node has in-degree ≥ 1, so the inbox aggregate already covers all
    nodes — no dangling-node outer join needed."""
    base = (
        f"(15 * {_PR_SCALE}) // (100 * (SELECT n FROM nn))"
    )
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        """arcs AS (
            SELECT u AS src, v AS dst FROM edges
            UNION ALL
            SELECT v AS src, u AS dst FROM edges
        )""",
        "nodes AS (SELECT DISTINCT src AS node FROM arcs)",
        "outdeg AS (SELECT src AS node, COUNT(*) AS od FROM arcs GROUP BY src)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"pr0 AS (SELECT node, {_PR_SCALE} // (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(_PR_ITERS):
        ctes.append(
            f"""pr{i + 1} AS (
            SELECT a.dst AS node,
                   (85 * SUM(p.rank // o.od)) // 100 + {base} AS rank
            FROM pr{i} p
            JOIN arcs a ON a.src = p.node
            JOIN outdeg o ON o.node = p.node
            GROUP BY a.dst
        )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node AS partkey, CAST(rank AS BIGINT) AS rank_fp
    FROM pr{_PR_ITERS}
    ORDER BY rank_fp DESC, partkey
    LIMIT 20
"""
    )


@query("graph_pagerank_fixed_point", oracle=_pr_oracle(), tags=("graph",))
def graph_pagerank_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five PageRank iterations (d=0.85) over the undirected part-
    co-occurrence graph in fixed-point BIGINT arithmetic — top-20 nodes.

    Why fixed-point: floating-point PageRank sums neighbour
    contributions in partition order, so the low bits differ
    run-to-run on a cluster.  Storing rank as rank·10¹² in BIGINT
    with integer division makes every iteration exactly reproducible
    (integer addition commutes), which is what lets the DuckDB oracle
    replay the identical unrolled recursion — and at 100 TB it also
    means a resumed or speculatively-retried stage produces
    bit-identical output.

    Scale shape: each iteration is one groupBy(dst) shuffle of the
    arc list (persisted once); no driver collection beyond the scalar
    node count; the 5 fixed iterations unroll into one logical plan,
    shallow enough that no lineage checkpoint is needed.
    """
    edges = persist_tracked(part_cooccurrence_edges(spark, sf_dir))
    rank = pagerank_fixed_point(edges, iters=_PR_ITERS, scale=_PR_SCALE)
    return (
        rank.select(F.col("node").alias("partkey"), F.col("rank").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "partkey")
        .limit(20)
    )


# ------------------------------------------------------- weighted SSSP
_SSSP_ROUNDS = 5
_SSSP_INF = 1 << 60


def _sssp_oracle(rounds: int = _SSSP_ROUNDS) -> str:
    """Unrolled synchronous Bellman-Ford twin: dist_r CTE per round,
    converged verdict compares the last two rounds (pinned 1)."""
    inf = _SSSP_INF
    blocks = [
        f"""
    WITH edges AS ({_EDGES_SQL}),
    arcs AS (
        SELECT u AS src, v AS dst, (u + v) % 7 + 1 AS w FROM edges
        UNION ALL
        SELECT v AS src, u AS dst, (u + v) % 7 + 1 AS w FROM edges
    ),
    dist0 AS (
        SELECT src AS node,
               CAST(CASE WHEN src = 0 THEN 0 ELSE {inf} END AS BIGINT) AS dist
        FROM (SELECT DISTINCT src FROM arcs)
    )"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        blocks.append(
            f""", dist{r} AS (
        SELECT node, min(dist) AS dist FROM (
            SELECT node, dist FROM dist{p}
            UNION ALL
            SELECT a.dst AS node,
                   CASE WHEN d.dist >= {inf} THEN {inf} ELSE d.dist + a.w END AS dist
            FROM dist{p} d JOIN arcs a ON a.src = d.node
        ) GROUP BY node
    )"""
        )
    return "".join(blocks) + f"""
    SELECT CASE WHEN dist >= {inf} THEN -1 ELSE dist END AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes,
           (SELECT CASE WHEN count(*) = 0 THEN 1 ELSE 0 END
            FROM dist{rounds} a JOIN dist{rounds - 1} b USING (node)
            WHERE a.dist != b.dist) AS converged
    FROM dist{rounds}
    GROUP BY 1"""


@query("graph_sssp_weighted", oracle=_sssp_oracle(), tags=("graph",))
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (synchronous Bellman-Ford)
    from part 0 over the co-occurrence graph, edge weight
    (u+v) % 7 + 1 (deterministic synthetic weights so the shortest
    paths genuinely differ from hop counts). Output: exact-BIGINT
    distance histogram plus a converged verdict comparing the last two
    of the 5 unrolled rounds — the measured diameter here is 2-3
    rounds, and the PINNED verdict makes a graph that outgrows the
    unroll fail the value-hash gate loudly.

    Scale shape (operators/graph.py::sssp_bellman_ford): each round is
    one groupBy(node) shuffle of (node, candidate-dist) pairs with
    map-side min-combine; the frontier never materializes on the
    driver. Rounds = graph diameter, the Pregel bound.
    """
    edges = part_cooccurrence_edges(spark, sf_dir).withColumn(
        "w", (F.col("u") + F.col("v")) % 7 + 1
    )
    from minoan_athenaeum_spark.operators.graph import sssp_bellman_ford

    dist, prev = sssp_bellman_ford(edges, seed=0, rounds=_SSSP_ROUNDS)
    inf = _SSSP_INF
    changed = (
        dist.alias("a")
        .join(prev.alias("b"), "node")
        .where(F.col("a.dist") != F.col("b.dist"))
        .agg(
            F.when(F.count("*") == 0, F.lit(1)).otherwise(F.lit(0)).alias("converged")
        )
    )
    hist = dist.groupBy(
        F.when(F.col("dist") >= inf, F.lit(-1)).otherwise(F.col("dist")).alias("dist")
    ).agg(F.count("*").cast("bigint").alias("n_nodes"))
    return hist.crossJoin(F.broadcast(changed)).select("dist", "n_nodes", "converged")
