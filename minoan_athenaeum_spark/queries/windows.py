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


@query(
    "win_lag_lead",
    oracle="""
    SELECT o_custkey AS ckey, o_orderkey AS okey,
           LAG(o_orderkey) OVER w AS prev_okey,
           LEAD(o_orderkey) OVER w AS next_okey
    FROM orders WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def win_lag_lead(spark, sf_dir):
    """LAG/LEAD navigation within a customer's order history."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        F.col("o_custkey").alias("ckey"),
        F.col("o_orderkey").alias("okey"),
        F.lag("o_orderkey").over(w).alias("prev_okey"),
        F.lead("o_orderkey").over(w).alias("next_okey"),
    )


@query(
    "win_rank_dense_ntile",
    oracle="""
    SELECT p_brand AS brand, p_partkey AS pkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey) AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_size, p_partkey)
    """,
    tags=("window",),
)
def win_rank_dense_ntile(spark, sf_dir):
    """RANK / DENSE_RANK / NTILE over deterministic orderings."""
    p = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    w2 = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("pkey"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w2).alias("quartile"),
    )
