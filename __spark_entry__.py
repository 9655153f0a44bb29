"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H-Q3-style join+agg+topk)
at sf0.001. ``queries()``/``oracle_sql()`` expose every registered
operator query from minoan_athenaeum_spark (see SURVEY.md §2 mapping in
each query's docstring/tags).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from minoan_athenaeum_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all()
    return specs["agg_tpch_q3_top10"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extension
    surface). Each callable takes (spark, sf_dir) → DataFrame."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for every SQL-expressible
    query (same column aliases as the Spark result). Queries absent here
    (minhash/simhash/LSH-ANN) use engine-specific hashing and are pinned
    by brute-force comparisons in tests/ instead."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle
    }
