"""Time-series operators Spark lacks as primitives: as-of join, banded
range join, gap-filled resampling — expressed as compositions of
existing DataFrame ops (the task's preferred strategy (a)), so Catalyst
still plans/optimizes them and no Python runs per-row.

As-of join via union+running-max: tag both sides, union, and take a
running max of the right side's (timestamp, payload) struct per key —
because time is monotone within the window ordering, the running max of
"right-side rows seen so far" IS the as-of predecessor, and carrying the
payload inside the struct means timestamp and payload always come from
the same winning row. One shuffle on the key, no range explosion, no
BNLJ — this is the shape that scales (a sort-merge as-of in one pass
per key partition).
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
    columns come back suffixed ``_asof`` (null when no predecessor),
    plus ``asof_ts`` (the winning right row's timestamp).

    The winning row is selected as ONE struct (timestamp first, then
    payload) through a running ``max`` — so ``asof_ts`` and the payload
    always come from the same right row, even when the true predecessor
    carries null payload values. Ties at identical (key, ts) break
    deterministically by the largest payload tuple (struct comparison is
    field-by-field left to right)."""
    rt = right.select(
        F.col(on),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.struct(
            F.col(right_ts).alias("asof_ts"),
            *[F.col(c).alias(f"{c}_asof") for c in right_payload],
        ).alias("__r"),
    )
    lt = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__ts", F.col(left_ts))
        .withColumn("__r", F.lit(None).cast(rt.schema["__r"].dataType))
    )
    # Align schemas for the union (right side gains left's columns as nulls).
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    u = lt.unionByName(rt)
    # Right rows sort before left rows at equal timestamps (__side asc),
    # so a right row AT the left timestamp is visible to it (<=).
    w = (
        W.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    win = u.withColumn("__win", F.max("__r").over(w)).filter(F.col("__side") == 1)
    return win.select(
        *left.columns,
        *[F.col(f"__win.{c}_asof").alias(f"{c}_asof") for c in right_payload],
        F.col("__win.asof_ts").alias("asof_ts"),
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
