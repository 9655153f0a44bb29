"""Bucketed-table co-located joins.

At 100 TB the dominant cost of a repeated fact-fact join is re-shuffling
both sides on the join key every query. Bucketing pays that shuffle ONCE
at write time: both tables are hash-partitioned into the same number of
buckets on the key and sorted within buckets, so every later join reads
bucket i of A against bucket i of B directly — `.explain` shows a
SortMergeJoin with NO Exchange on either side.

This is plain `DataFrameWriter.bucketBy` + managed parquet tables (the
warehouse dir is configured in session.py); no custom machinery. The
operator here just standardizes the write + the existence check so
query code can declare "these two tables are co-located on key k".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def clear_stale_table_location(spark: SparkSession, table: str) -> None:
    """A previous session may have left a managed table's location on
    disk while the (in-memory) catalog entry died with it; Spark refuses
    to create a managed table over an existing location, so clear it.
    Guarded: only delete a path that (a) is a local file: warehouse,
    (b) resolves strictly inside the warehouse root, and (c) looks
    like a Spark-written parquet table dir — never whatever else
    happens to sit at the derived path."""
    import os
    import shutil
    from urllib.parse import urlparse

    warehouse = spark.conf.get("spark.sql.warehouse.dir") or ""
    scheme = urlparse(warehouse).scheme
    # Scheme-less paths are local too; anything else (hdfs:, s3a:, ...)
    # can't be checked from the driver's filesystem — say so loudly
    # rather than silently skipping, because a leftover location there
    # would make the subsequent managed CREATE fail.
    if scheme not in ("", "file"):
        import warnings

        warnings.warn(
            f"cannot probe stale location for table {table!r}: warehouse "
            f"scheme {scheme!r} is not a local filesystem",
            stacklevel=2,
        )
        return
    if warehouse:
        root = os.path.abspath(warehouse.removeprefix("file:"))
        loc = os.path.abspath(os.path.join(root, table.lower()))
        inside = loc != root and os.path.commonpath([root, loc]) == root
        if inside and os.path.isdir(loc):
            entries = os.listdir(loc)
            spark_table_markers = (
                not entries
                or "_SUCCESS" in entries
                or any(e.startswith("part-") for e in entries)
            )
            if not spark_table_markers:
                raise RuntimeError(
                    f"refusing to clear {loc!r} — it does not look like a "
                    f"Spark-written table directory"
                )
            shutil.rmtree(loc)


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Materialize ``df`` as a managed parquet table bucketed AND
    sorted by ``key`` — the layout that makes every future equi-join or
    aggregation on ``key`` exchange-free."""
    if not df.sparkSession.catalog.tableExists(table):
        clear_stale_table_location(df.sparkSession, table)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def ensure_bucketed(
    spark: SparkSession, df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> DataFrame:
    """Return the bucketed managed table for ``df``, writing it first if
    this session has not materialized it yet (the in-memory catalog does
    not survive session restarts; the write is the one-time cost the
    bucketing amortizes)."""
    if not spark.catalog.tableExists(table):
        write_bucketed(df, table, key, n_buckets)
    return spark.table(table)
