"""Connected components over an edge list — the clustering step of a
dedup pipeline (near-dup PAIRS → duplicate GROUPS → one keeper per
group).

Implementation: iterative min-label propagation expressed entirely in
DataFrame ops. Each round every node takes the minimum component id
seen among itself and its neighbors; a round is one join + one
aggregation, both shuffling on the node id. The loop runs on the
driver, but each iteration is fully distributed and the per-iteration
state (node → current label) is O(nodes), never O(edges²).

Convergence: plain propagation needs O(graph diameter) rounds. Dedup
duplicate-groups are near-cliques (diameter ≤ 2-3), so 3-5 rounds
close them; the generic bound is ``max_iter`` with an early-exit
convergence check (`changed == 0`). For adversarially long path graphs
at 100 TB one would switch to the large-star/small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond"),
which converges in O(log²) rounds with the same join+min building
blocks — the propagation round below IS the small-star step.

Lineage: every iteration's label table is persisted and
``localCheckpoint``-ed so the plan does not grow by one join per round
(iterative DataFrame loops otherwise accumulate lineage until the
optimizer chokes); the previous round's cache is released as soon as
the new one materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    smallest node id reachable from it. Returns (node, component).

    ``edges`` may list each undirected edge once in either direction;
    self-loops and duplicate edges are fine (they do not change the
    fixpoint).

    Partitioning note: the per-round shuffles run at the session's wide
    initial partition count (localCheckpoint materialization bypasses
    AQE coalescing). Measured at sf0.001, that is FASTER than forcing a
    small explicit repartition per round (31/15.6 s vs 59/53 s for an
    8-partition variant) — the wide empty tasks are ~ms each while the
    extra per-round exchange is real work — and at cluster scale the
    wide state layout is the posture you want anyway. Don't "fix" this
    with repartition(n) again without re-measuring both paths."""
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        und.union(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = sym.persist()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=True)  # checkpoint caches the blocks itself
    )
    try:
        converged = False
        for _ in range(max_iter):
            prop = sym.join(labels, sym.v == labels.node).select(
                F.col("u").alias("node"), F.col("comp")
            )
            new_labels = (
                labels.union(prop).groupBy("node").agg(F.min("comp").alias("comp"))
            ).localCheckpoint(eager=True)
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.comp") != F.col("o.comp"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            # Propagation needs O(diameter) rounds; silently returning
            # the partial labels would hand the caller WRONG components
            # (e.g. a path of > max_iter nodes). Fail loudly — the
            # caller can raise max_iter or switch to large-star/
            # small-star contraction for high-diameter graphs.
            raise RuntimeError(
                f"connected_components did not converge within "
                f"max_iter={max_iter} rounds (graph diameter exceeds the "
                f"iteration budget); labels would be incorrect"
            )
        return labels
    finally:
        sym.unpersist()


def dedup_keepers(components: DataFrame) -> DataFrame:
    """Given (node, comp) cluster labels, pick the keeper (min node id)
    per duplicate group — one groupBy, the standard 'keep one copy'
    policy."""
    return components.groupBy("comp").agg(
        F.min("node").alias("keeper"), F.count("*").alias("group_size")
    )
