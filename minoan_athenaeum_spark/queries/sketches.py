"""Approximate (sketch) aggregates — the constant-memory path for
100 TB cardinality/quantile questions: HyperLogLog++ distinct counts
and Greenwald-Khanna approximate percentiles. Sketch values are
implementation-specific, so there is no DuckDB oracle — error bounds
vs exact answers are pinned in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query


@query("sketch_hll_distinct", tags=("sketch", "approx"))
def sketch_hll_distinct(spark, sf_dir):
    """HLL++ distinct orderkeys/partkeys per return flag (rsd=2%).
    At scale this replaces the exact two-phase COUNT(DISTINCT) expand
    with a fixed-size mergeable sketch — no second shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("rflag")).agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query("sketch_approx_percentiles", tags=("sketch", "approx"))
def sketch_approx_percentiles(spark, sf_dir):
    """Approximate p25/p50/p75 of extended price per return flag
    (accuracy 10000 ⇒ ~0.01% rank error), next to the exact p50 for
    comparison."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("rflag")).agg(
        F.percentile_approx(
            "l_extendedprice", [0.25, 0.5, 0.75], 10000
        ).alias("approx_pcts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
    )
