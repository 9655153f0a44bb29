"""Distinct-key theta join queries (reference
``/root/reference/database.py:539-617`` — NLJ over distinct keys, then
row-id fan-out). Both queries run on high-duplication key columns
(l_quantity: ~50 distinct values over the whole of lineitem; p_size:
~50 distinct over part) — exactly the regime where the distinct-key
plan beats row-level BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.theta import (
    distinct_key_theta_join,
    theta_count_by_key,
)
from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query


@query(
    "theta_distinct_key_join",
    oracle="""
    SELECT l.l_orderkey AS okey, l.l_linenumber AS lineno,
           l.l_quantity AS qty, p.p_partkey AS pkey, p.p_size AS psize
    FROM lineitem l, part p
    WHERE l.l_quantity > p.p_size
      AND l.l_orderkey < 800 AND p.p_partkey <= 50
    """,
    tags=("theta", "J3", "optimization"),
)
def theta_distinct_key_join(spark, sf_dir):
    """General distinct-key theta join (bounded sides so the oracle's
    brute force stays cheap): ~50 distinct l_quantity × ~50 distinct
    p_size key comparisons instead of row-level NLJ, then broadcast-hash
    fan-out. Reference: /root/reference/database.py:555-569 (">" case),
    fan-out at database.py:710-731."""
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 800)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
    pa = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 50)
        .select("p_partkey", "p_size")
    )
    return distinct_key_theta_join(li, pa, "l_quantity", "p_size", ">").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.col("l_quantity").alias("qty"),
        F.col("p_partkey").alias("pkey"),
        F.col("p_size").alias("psize"),
    )


@query(
    "theta_count_by_key",
    oracle="""
    WITH lq AS (SELECT l_quantity AS key, COUNT(*) AS ln FROM lineitem GROUP BY 1),
         ps AS (SELECT p_size AS sz, COUNT(*) AS pn FROM part GROUP BY 1)
    SELECT lq.key AS key, CAST(SUM(lq.ln * ps.pn) AS BIGINT) AS n_pairs
    FROM lq JOIN ps ON lq.key > ps.sz
    GROUP BY 1
    """,
    tags=("theta", "optimization", "aggregate"),
)
def theta_count_by_key_q(spark, sf_dir):
    """COUNT of theta-join pairs per key over the FULL lineitem × part —
    unboundedly scalable because the pairs are never materialized:
    per-key counts, d×d key NLJ, multiply-and-sum. The oracle SQL uses
    the same per-key-summary algebra (semantically identical to
    ``SELECT l_quantity, COUNT(*) FROM lineitem, part WHERE l_quantity >
    p_size GROUP BY 1``)."""
    li = t(spark, sf_dir, "lineitem")
    pa = t(spark, sf_dir, "part")
    return theta_count_by_key(li, pa, "l_quantity", "p_size", ">")
