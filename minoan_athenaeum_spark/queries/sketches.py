"""Approximate (sketch) aggregates — the constant-memory path for
100 TB cardinality/quantile questions: HyperLogLog++ distinct counts
and Greenwald-Khanna approximate percentiles. Raw sketch estimates are
implementation-specific, so the oracle-checked surface is the
DETERMINISTIC part: the exact answers plus within-error-bound
verdicts (|approx − exact| / exact < 3·rsd ⇒ 1). The HLL estimate is
deterministic for fixed input, so a broken sketch flips a verdict to 0
and the value-hash gate catches it; the raw-estimate error magnitudes
stay pinned in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query

_HLL_ORACLE = """
    SELECT l_returnflag AS rflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           CAST(1 AS BIGINT) AS orders_within_bound,
           CAST(1 AS BIGINT) AS parts_within_bound
    FROM lineitem
    GROUP BY 1
"""


@query("sketch_hll_distinct", oracle=_HLL_ORACLE, tags=("sketch", "approx"))
def sketch_hll_distinct(spark, sf_dir):
    """HLL++ distinct orderkeys/partkeys per return flag (rsd=2%).
    At scale this replaces the exact two-phase COUNT(DISTINCT) expand
    with a fixed-size mergeable sketch — no second shuffle.

    Output is the deterministic projection of the sketch: exact
    distinct counts plus a 0/1 verdict that the HLL estimate landed
    within 3·rsd of exact (a 3-sigma bound the estimator satisfies on
    this data; any regression in the sketch path flips it). The oracle
    computes the exact counts and asserts the verdicts are 1."""
    rsd = 0.02
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy(F.col("l_returnflag").alias("rflag")).agg(
        F.approx_count_distinct("l_orderkey", rsd=rsd).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )

    def within(approx, exact):
        rel = F.abs(approx.cast("double") - exact) / exact
        return (rel < 3 * rsd).cast("bigint")

    return agg.select(
        "rflag",
        "exact_orders",
        "exact_parts",
        within(F.col("approx_orders"), F.col("exact_orders")).alias(
            "orders_within_bound"
        ),
        within(F.col("approx_parts"), F.col("exact_parts")).alias(
            "parts_within_bound"
        ),
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
