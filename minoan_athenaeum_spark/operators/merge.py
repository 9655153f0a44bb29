"""Merge / upsert over immutable parquet — the batch-ELT pattern.

Spark's parquet tables are append-only; an upsert is expressed as a
keyed FULL OUTER join of the base table against the updates feed, row
precedence to the update side, optional delete markers. At warehouse
scale the rewrite is bounded by partition pruning: join only the base
partitions whose key ranges intersect the updates (the updates feed is
usually tiny relative to base — broadcastable), rewrite only those.
This operator builds the merged DataFrame; writing it back is the
caller's partition-layout decision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    cols: list[str],
    delete_col: str | None = None,
    validate_keys: bool = True,
) -> DataFrame:
    """SQL-MERGE semantics on DataFrames:

    - matched key  → update row wins (per ``cols``, null-safe COALESCE
      per column so partial updates keep base values),
    - update-only key → insert,
    - base-only key   → keep,
    - ``delete_col`` true on a matched update → row dropped.

    PRECONDITION: ``updates`` must have at most one row per key. SQL
    MERGE raises on multiple matches; a duplicate key here would fan
    base rows out through the full-outer join and silently multiply
    output rows. ``validate_keys=True`` (default) enforces this with an
    eager uniqueness probe over the updates feed — one small job (the
    feed is the small side of an upsert by construction); pass
    ``validate_keys=False`` only when uniqueness is guaranteed upstream
    and the extra action matters.

    One shuffle on the key for each side (or a broadcast of the updates
    feed when it is small — the common case, left to AQE)."""
    if validate_keys:
        dup = (
            updates.groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                f"merge_upsert: updates feed has multiple rows for at least "
                f"one value of key {key!r}; SQL MERGE semantics require at "
                f"most one match (dedupe the feed or pick a winner upstream)"
            )
    b = base.select(F.col(key).alias("__bk"), *[F.col(c).alias(f"__b_{c}") for c in cols])
    extra = [delete_col] if delete_col else []
    u = updates.select(
        F.col(key).alias("__uk"),
        *[F.col(c).alias(f"__u_{c}") for c in cols],
        *[F.col(c).alias("__del") for c in extra],
    )
    j = b.join(u, F.col("__bk") == F.col("__uk"), "full_outer")
    if delete_col:
        j = j.filter(~F.coalesce(F.col("__del"), F.lit(False)))
    out_cols: list[Column] = [F.coalesce(F.col("__bk"), F.col("__uk")).alias(key)]
    for c in cols:
        out_cols.append(
            F.when(F.col("__uk").isNotNull(), F.coalesce(F.col(f"__u_{c}"), F.col(f"__b_{c}")))
            .otherwise(F.col(f"__b_{c}"))
            .alias(c)
        )
    return j.select(*out_cols)


def apply_changelog(
    changelog: DataFrame,
    key: str,
    seq: str,
    op: str,
    payload_cols: list[str],
) -> DataFrame:
    """CDC changelog compaction: collapse an insert/update/delete event
    stream to the current snapshot — the Debezium/binlog-materialization
    pattern (last writer wins by ``seq``; a final ``'D'`` removes the
    key; a later I/U after a D re-inserts it).

    Implemented as a single ``groupBy(key)`` with ``max_by`` per
    payload column (+ the final op), NOT a row_number window: max_by
    carries O(1) state per key through a partial (map-side) aggregate,
    so the shuffle moves one pre-reduced row per key per input
    partition instead of sorting every version of every key — at
    100 TB of changelog that is the difference between a merge-sort of
    the full history and a cheap hash aggregate.

    PRECONDITION: ``seq`` is unique per key (true of binlog positions /
    LSNs by construction). Emits ``versions`` (change-count per key)
    alongside the surviving payload.
    """
    aggs = [F.max_by(F.col(c), F.col(seq)).alias(c) for c in payload_cols]
    aggs.append(F.max_by(F.col(op), F.col(seq)).alias("__final_op"))
    aggs.append(F.count("*").alias("versions"))
    return (
        changelog.groupBy(key)
        .agg(*aggs)
        .where(F.col("__final_op") != F.lit("D"))
        .drop("__final_op")
    )
