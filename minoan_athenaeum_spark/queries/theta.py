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
