"""Partitioned parquet sink — the write side of the engine.

The reference is read-only (no DML/DDL, SURVEY §2 absences); a real
pipeline engine needs a layout-aware writer:

  - ``partition_by``: hive-style directory partitioning → partition
    pruning on read (the 100 TB table is never fully scanned for a
    partition-filtered query);
  - ``sort_within_partitions``: clusters values inside each file so
    parquet row-group min/max statistics become selective (poor-man's
    Z-order for one key);
  - ``target_file_partitions``: repartition before write so output file
    count is controlled (avoids the tiny-files problem at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_within_partitions: list[str] | None = None,
    target_file_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    out = df
    if target_file_partitions:
        if partition_by:
            # Co-locate rows of each hive partition so each produces
            # few files.
            out = out.repartition(target_file_partitions, *partition_by)
        else:
            out = out.repartition(target_file_partitions)
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
