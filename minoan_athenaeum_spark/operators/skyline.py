"""2-D skyline (Pareto frontier) — Börzsönyi et al., ICDE 2001.

A point is on the skyline iff no other point strictly dominates it
(>= on both dimensions, > on at least one). In two dimensions the
quadratic dominance test collapses to a SCAN: sorted by x, a point is
dominated exactly when

    max(y over points with strictly greater x)  >= y      (higher-x side)
 or max(y over points with the same x)          >  y      (same-x ties)

so the skyline is one strict-suffix running max plus a per-x group max
— no pairwise join anywhere. The strict-suffix max is computed on the
DISTINCT-x group table (groupBy x → max y), where "strictly greater x"
is exactly "earlier row in x-descending order" and a plain
rowsBetween(unboundedPreceding, -1) frame is exact for ANY numeric x —
integral or fractional (a RANGE frame with offset 1 would wrongly skip
fractional gaps in (x, x+1)). The group-table window is TWO-PHASE, the
same shape as operators/scan.py::global_cumsum: range-partition by x,
per-partition local running max (bounded windows), then a tiny
per-partition summary broadcast back as offsets. Spark's
RangePartitioner keeps equal x values in one partition, so
"later partition" == "strictly greater x" and the local/global split
is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    num_partitions: int | None = None,
    broadcast_bounds: bool = True,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated on (``x`` max, ``y`` max).

    Adds nothing; returns the surviving rows with original columns.
    Both dimension columns must be non-null numerics (integral or
    fractional — the dominance frame is exact for both).

    ``broadcast_bounds`` (default True) broadcasts the per-distinct-x
    dominance-bound table for the join back to ``df``. Correct default
    when |distinct x| is bounded (counts, scores, bucketed measures);
    for a continuous x where distinct values approach |df|, pass False
    so the join shuffles instead of OOM-ing the driver."""
    # distinct-x summary: per-x max y. One shuffle on x; the group
    # table is |distinct x|-sized, never the full point set.
    g = df.groupBy(F.col(x).alias("_gx")).agg(F.max(F.col(y)).alias("_smax"))
    g = (
        g.repartitionByRange(num_partitions, F.col("_gx"))
        if num_partitions
        else g.repartitionByRange(F.col("_gx"))
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    # ^ pinned: the suffix-max branch and the partition-summary branch
    #   must see ONE _pid assignment (see operators/scan.py
    #   global_cumsum for the branch-inconsistent sampling hazard).

    # per-partition strict-suffix max over DISTINCT x values: rows
    # strictly earlier in x-descending order are exactly the strictly
    # greater x values (no RANGE-offset trick, exact for fractional x)
    w_suffix = (
        Window.partitionBy("_pid")
        .orderBy(F.col("_gx").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = g.withColumn("_lmax", F.max("_smax").over(w_suffix))

    # partition summaries: max y per partition; for partition p the
    # contribution of later partitions (all strictly greater x)
    pmax = local.groupBy("_pid").agg(F.max("_smax").alias("_pmax"))
    w_later = Window.orderBy("_pid").rowsBetween(1, Window.unboundedFollowing)
    offs = pmax.select("_pid", F.max("_pmax").over(w_later).alias("_omax"))

    bounds = (
        local.join(F.broadcast(offs), "_pid")
        .withColumn("_hmax", F.greatest("_lmax", "_omax"))
        .select("_gx", "_smax", "_hmax")
    )

    if broadcast_bounds:
        bounds = F.broadcast(bounds)
    scored = df.join(bounds, df[x] == bounds["_gx"])
    dominated = (
        F.col("_hmax").isNotNull() & (F.col("_hmax") >= F.col(y))
    ) | (F.col("_smax") > F.col(y))
    return scored.where(~dominated).drop("_gx", "_smax", "_hmax")
