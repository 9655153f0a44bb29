"""Shared helpers for query builders."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from minoan_athenaeum_spark.catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(col: Column, prec: int = 12, scale: int = 4) -> Column:
    """Exact-decimal cast used so aggregate arithmetic matches the DuckDB
    oracle bit-for-bit (both engines do exact decimal math, then an
    identical value→double cast)."""
    return col.cast(f"decimal({prec},{scale})")


# Shared exact revenue term: extendedprice * (1 - discount) in decimal
# (scale kept ≤6 end-to-end so decimal→double casts single-round — see
# registry docstring).
REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,2)))"


def rev():
    from pyspark.sql import functions as F

    return dec(F.col("l_extendedprice"), 12, 2) * (1 - dec(F.col("l_discount"), 6, 2))
