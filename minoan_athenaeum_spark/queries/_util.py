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


# ------------------------------------------------------- persist scope
# Queries persist intermediates referenced by multiple join branches.
# The DataFrame is returned to the caller (which collects it), so the
# query function can't unpersist before consumption — instead each
# persisting query releases the PREVIOUS query's persists on entry.
# Unpersisting is always safe (the plan recomputes), so this never
# affects correctness; it stops cache blocks leaking across a long
# session running many queries.
_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    df.persist()
    _TRACKED.append(df)
    return df


def release_tracked() -> None:
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
