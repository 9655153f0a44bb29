"""2-D skyline (Pareto frontier) — Börzsönyi et al., ICDE 2001.

A point is on the skyline iff no other point strictly dominates it
(>= on both dimensions, > on at least one). In two dimensions the
quadratic dominance test collapses to a SCAN: sorted by x, a point is
dominated exactly when

    max(y over points with strictly greater x)  >= y      (higher-x side)
 or max(y over points with the same x)          >  y      (same-x ties)

so the skyline is one strict-suffix running max plus a per-x group max
— no pairwise join anywhere. The suffix max here is TWO-PHASE, the
same shape as operators/scan.py::global_cumsum: range-partition by x,
per-partition local suffix max (bounded windows), then a tiny
per-partition summary broadcast back as offsets. Spark's
RangePartitioner keeps equal x values in one partition, so
"later partition" == "strictly greater x" and the local/global split
is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def skyline_2d(
    df: DataFrame, x: str, y: str, num_partitions: int | None = None
) -> DataFrame:
    """Rows of ``df`` not strictly dominated on (``x`` max, ``y`` max).

    Adds nothing; returns the surviving rows with original columns.
    Both dimension columns must be non-null numerics."""
    d = (
        df.repartitionByRange(num_partitions, F.col(x))
        if num_partitions
        else df.repartitionByRange(F.col(x))
    ).withColumn("_pid", F.spark_partition_id())

    # per-partition strict-suffix max of y over greater x (RANGE frame
    # excludes equal-x rows)
    w_suffix = (
        Window.partitionBy("_pid")
        .orderBy(F.col(x).cast("long"))
        .rangeBetween(1, Window.unboundedFollowing)
    )
    local = d.withColumn("_lmax", F.max(F.col(y)).over(w_suffix))

    # partition summaries: max y per partition; for partition p the
    # contribution of later partitions (all strictly greater x)
    pmax = local.groupBy("_pid").agg(F.max(F.col(y)).alias("_pmax"))
    w_later = (
        Window.orderBy("_pid").rowsBetween(1, Window.unboundedFollowing)
    )
    offs = pmax.select("_pid", F.max("_pmax").over(w_later).alias("_omax"))

    # same-x group max (tie handling: equal x, strictly greater y)
    w_same = Window.partitionBy(F.col(x))
    scored = (
        local.join(F.broadcast(offs), "_pid")
        .withColumn("_hmax", F.greatest(
            F.coalesce(F.col("_lmax"), F.lit(None)),
            F.coalesce(F.col("_omax"), F.lit(None)),
        ))
        .withColumn("_smax", F.max(F.col(y)).over(w_same))
    )
    dominated = (
        F.col("_hmax").isNotNull() & (F.col("_hmax") >= F.col(y))
    ) | (F.col("_smax") > F.col(y))
    return scored.where(~dominated).drop("_pid", "_lmax", "_omax", "_hmax", "_smax")
