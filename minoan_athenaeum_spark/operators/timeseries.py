"""Time-series operators Spark lacks as primitives: as-of join, banded
range join, gap-filled resampling — expressed as compositions of
existing DataFrame ops (the task's preferred strategy (a)), so Catalyst
still plans/optimizes them and no Python runs per-row.

As-of join via union+running-max: tag both sides, union, and take a
running max of the right side's timestamp per key — because time is
monotone within the window ordering, the running max of "right-side
timestamps seen so far" IS the as-of predecessor. One shuffle on the
key, no range explosion, no BNLJ — this is the shape that scales (a
sort-merge as-of in one pass per key partition).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row (per ``on`` key)
    with right_ts <= left_ts. Left columns are preserved; right payload
    columns come back suffixed ``_asof`` (null when no predecessor)."""
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__rts"),
            *[F.col(c).alias(f"{c}_asof") for c in right_payload],
        )
        .withColumn("__side", F.lit(0))
        .withColumn("__ts", F.col("__rts"))
    )
    # Align schemas for the union.
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    u = lt.unionByName(rt)
    # Right rows sort before left rows at equal timestamps (__side asc),
    # so a right row AT the left timestamp is visible to it (<=).
    w = (
        W.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = u.select(
        "*",
        F.max("__rts").over(w).alias("__asof_ts"),
        *[F.last(f"{c}_asof", ignorenulls=True).over(w).alias(f"__{c}_filled")
          for c in right_payload],
    )
    out = filled.filter(F.col("__side") == 1)
    for c in right_payload:
        out = out.drop(f"{c}_asof").withColumnRenamed(f"__{c}_filled", f"{c}_asof")
    return out.drop("__side", "__ts", "__rts").withColumnRenamed(
        "__asof_ts", "asof_ts"
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: Column,
    right_ts: Column,
    band: Column,
) -> DataFrame:
    """Equi-key + time-band join: |left_ts − right_ts| ≤ band. The key
    equality makes this a hash join with a post-filter, NOT a nested
    loop — the efficient plan whenever a join key exists."""
    cond = (left[on] == right[on]) & (
        F.abs(left_ts - right_ts) <= band
    )
    return left.join(right, cond).drop(right[on])


def resample_gapfill(
    df: DataFrame,
    key: str,
    epoch_s: Column,
    bucket_seconds: int,
    aggs: dict[str, Column],
    fill: dict[str, Column],
) -> DataFrame:
    """Bucket to a fixed grid, then densify: generate the full bucket
    range per key with sequence()+explode and left-join the actuals,
    filling gaps with ``fill`` expressions. The dense grid is generated
    distributed (per key) — no driver-side loops."""
    bucketed = (
        df.withColumn(
            "bucket",
            (F.floor(epoch_s / bucket_seconds) * bucket_seconds).cast("long"),
        )
        .groupBy(key, "bucket")
        .agg(*[e.alias(n) for n, e in aggs.items()])
    )
    spans = bucketed.groupBy(key).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = spans.select(
        key,
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.lit(bucket_seconds))
        ).alias("bucket"),
    )
    joined = grid.join(bucketed, [key, "bucket"], "left")
    out = joined
    for n, e in fill.items():
        out = out.withColumn(n, F.coalesce(F.col(n), e))
    return out
