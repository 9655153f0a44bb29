"""Window functions (extension surface — the reference has none).

All deterministic: every ORDER BY inside a window frame is tie-broken by
a unique key so Spark and DuckDB agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import dec, t
from minoan_athenaeum_spark.registry import query


@query(
    "win_row_number_topk_per_group",
    oracle="""
    SELECT seg, okey, price, rn FROM (
      SELECT c.c_mktsegment AS seg, o.o_orderkey AS okey,
             o.o_totalprice AS price,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def win_row_number_topk_per_group(spark, sf_dir):
    """Top-3 orders per market segment via ROW_NUMBER. One shuffle on the
    partition key; at scale this beats a global sort by construction."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
    )
    w = W.partitionBy("seg").orderBy(F.col("price").desc(), F.col("okey"))
    return j.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey AS ckey, o_orderkey AS okey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
    FROM orders WHERE o_custkey <= 100
    """,
    tags=("window",),
)
def win_running_sum(spark, sf_dir):
    """Running total per customer (ROWS UNBOUNDED PRECEDING). Decimal
    accumulation keeps it exact vs the oracle."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("ckey"),
        F.col("o_orderkey").alias("okey"),
        F.sum(dec(F.col("o_totalprice"))).over(w).cast("double").alias("running_total"),
    )
