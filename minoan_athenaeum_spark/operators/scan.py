"""Distributed prefix sum (parallel scan) and the operators built on
it.

A naive global running sum — ``Window.orderBy(col)`` with no
partitionBy — collapses the whole dataset into ONE partition (Spark
warns `WindowExec: No Partition Defined`); at 100 TB that is a
guaranteed OOM. The classic two-phase scan fixes it:

1. range-partition by the order column; per-partition local running
   sums (each partition sorts only its own slice);
2. per-partition totals (one tiny row per partition) get their own
   exclusive prefix via a window over partition ids — thousands of
   rows at most, safe on one reducer — and broadcast-join back as
   offsets.

Total cost: one range shuffle of the data + one tiny offsets job; no
step ever holds more than a partition in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive global running sum of ``value_col`` in ``order_col``
    order (order values must be unique — they define the scan order).

    Returns the input columns plus ``out_col``. Deterministic for any
    range-boundary placement: the scan order is the total order of
    ``order_col``, so boundaries only move work, not results.
    """
    d = (
        df.repartitionByRange(num_partitions, F.col(order_col))
        if num_partitions
        else df.repartitionByRange(F.col(order_col))
    )
    # PIN one execution of the stamped partitioning. The local-sums
    # branch and the offsets branch below both consume `d`; without the
    # checkpoint Catalyst may compile the two subtrees differently
    # (e.g. an upstream limit as TakeOrderedAndProject in one and
    # Sort+GlobalLimit in the other), each sampling its OWN range
    # boundaries — the same row then lands in different _pid values per
    # branch and the _pid equi-join silently drops rows whose pid is
    # empty on the other side (observed: 8× row loss on a 50k-doc
    # limit slice). spark_partition_id is only meaningful relative to
    # ONE materialized partitioning, so materialize it.
    d = d.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("_local", F.sum(F.col(value_col)).over(w_local))

    # Per-partition totals straight off the pinned input — not over
    # `local` (optimization r13): the total ignores the running-sum
    # column, and aggregating d skips a second evaluation of the
    # window-sort stage (same fix as grouped_two_phase_rank).
    totals = d.groupBy("_pid").agg(F.sum(F.col(value_col)).alias("_ptotal"))
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_ptotal").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )


def weighted_systematic_sample(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    k: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Weight-proportional systematic sampling without replacement:
    lay every row's integer weight end-to-end along a line in
    ``order_col`` order, then pick the row covering each of the ``k``
    evenly spaced points — the classic PPS-systematic design (Madow
    1949), fully deterministic and integer-exact (selection tests
    ``floor(cum·k/total) > floor((cum−w)·k/total)``, no floats).

    Rows heavier than total/k can cover several points (sample_hits
    reports how many); every row's inclusion probability is
    proportional to its weight. Adds ``cum`` and ``sample_hits``
    (>0 ⇒ selected).

    Scale: one range shuffle (the scan) + a broadcast of the scalar
    total; weights*k must fit in BIGINT — beyond ~9e18 move the
    selection arithmetic to DECIMAL(38,0).
    """
    c = global_cumsum(df, order_col, weight_col, "cum", num_partitions)
    total = c.agg(F.max("cum").alias("t"))
    return (
        c.crossJoin(F.broadcast(total))
        .withColumn(
            "sample_hits",
            (
                F.expr(f"cum * {k} div t")
                - F.expr(f"(cum - {weight_col}) * {k} div t")
            ).cast("long"),
        )
        .drop("t")
    )


def grouped_two_phase_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-group ROW_NUMBER (1-based, ordered by ``order_cols``) without
    per-group single-reducer sorts.

    ``Window.partitionBy(group).orderBy(...)`` sends EVERY row of a
    group to one reducer — a hot group (one event type out of five, one
    tenant out of few) serializes there. The fix is the same two-phase
    scan shape as :func:`global_cumsum`, keyed by group:

    1. range-partition by (group, order) — a hot group SPANS MANY
       partitions, each sorting only its slice;
    2. per-(partition, group) local row numbers;
    3. per-(partition, group) counts (tiny: partitions × groups rows)
       get an exclusive per-group running sum over partition ids and
       broadcast back as offsets.

    Order values must be unique per group (include a tiebreak column)
    for a deterministic total order."""
    gcols = [F.col(c) for c in group_cols]
    ocols = [F.col(c) for c in order_cols]
    d = (
        df.repartitionByRange(num_partitions, *gcols, *ocols)
        if num_partitions
        else df.repartitionByRange(*gcols, *ocols)
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    # ^ pinned for the same branch-inconsistent range-sampling hazard
    #   documented in global_cumsum: local ranks and offset counts must
    #   see the SAME _pid assignment.
    w_local = Window.partitionBy("_pid", *group_cols).orderBy(*ocols)
    local = d.withColumn("_lrn", F.row_number().over(w_local))
    # Per-(partition, group) sizes straight off the pinned input — NOT
    # max(_lrn) over `local` (optimization r13): row_number is dense
    # 1..n so count(*) is the same number, and counting d skips a
    # second evaluation of the window SORT (the stage profile showed
    # the sort stage running twice per rank; one full sort pass gone).
    counts = d.groupBy("_pid", *group_cols).agg(
        F.count("*").alias("_n")
    )
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", *group_cols])
        .withColumn(out_col, (F.col("_lrn") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def grouped_topk_two_phase(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    k: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Top-k rows per group without sorting whole groups on single
    reducers.

    The window form (row_number over partitionBy(group)) ships every
    row of a group to one reducer and sorts it — the hot-group hazard
    again. Two-phase instead: (1) per-(input-partition, group) LOCAL
    top-k via a window on (_pid, group) — a map-side-local sort that
    discards all but k·P candidate rows; (2) the global window runs on
    the survivors only (≤ k·P rows per group — bounded regardless of
    group size). Classic partial-TopK/final-TopK, the same shape
    Spark's own TakeOrderedAndProject uses globally, applied per
    group.

    ``order_cols`` must be a total order (include a tiebreak) so both
    phases select identical rows; entries may be names or Column sort
    expressions (e.g. ``F.col("x").desc()``). Appends ``rn`` (1..k)."""
    ocols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    d = df.withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid", *group_cols).orderBy(*ocols)
    survivors = (
        d.withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= k)
        .drop("_pid", "_lrn")
    )
    w_final = Window.partitionBy(*group_cols).orderBy(*ocols)
    return (
        survivors.withColumn("rn", F.row_number().over(w_final))
        .filter(F.col("rn") <= k)
    )
