"""Distinct-key theta join — the reference's one real physical
optimization, re-expressed Spark-first.

The reference evaluates inequality joins by nested-looping over the
*distinct keys* of both sides' inverted indexes (O(d_left × d_right) key
comparisons) and then fanning the matching key pairs back out to row
ids (``/root/reference/database.py:539-617``). Spark's default physical
strategy for a non-equi join is BroadcastNestedLoopJoin over *rows*
(O(n_left × n_right) comparisons) — on a high-duplication key column
(many rows, few distinct values) the distinct-key formulation wins by
orders of magnitude.

Spark-first shape (no collected lists, no row-id bookkeeping):

  1. ``left.select(key).distinct()`` / ``right.select(key).distinct()``
     — two map-side-combined aggregations producing *tiny* relations
     (d rows each).
  2. NLJ the two key sets with the theta predicate — d_l × d_r
     comparisons. Both sides are small, so Spark broadcasts; the key-pair
     relation that results is at most d_l × d_r rows.
  3. Fan back out with two hash *equi*-joins (left on its key, right on
     its key). Equi-joins are Spark's fast path (broadcast-hash here,
     since the key-pair relation is small), replacing the reference's
     row-id fan-out at ``database.py:710-731``.

At 100 TB this is the right plan whenever d_l × d_r ≪ n_l × n_r: the
only full-data operations are two map-side distinct aggregations and two
broadcast-hash equi-joins — no all-rows NLJ, no shuffle of the big side
beyond the distinct partials.

For *aggregations* over a theta join (COUNT/SUM grouped by a key) there
is an even stronger form: aggregate each side per key first, theta-join
the per-key summaries, and combine — the big tables never fan out at
all. ``theta_count_by_key`` implements it for COUNT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The six comparison operators of the reference dialect
# (/root/reference/database.py:443-458 maps the same table for filters).
OPS: dict[str, Callable[[Column, Column], Column]] = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def distinct_key_theta_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    op: str,
) -> DataFrame:
    """Inner theta join ``left.left_key OP right.right_key`` via the
    distinct-key plan (reference ``Join.__greater_than`` et al.,
    /root/reference/database.py:539-617).

    Returns the full joined relation (all left columns + all right
    columns). Keys must have distinct column names across the two sides
    (standard for our star-schema tables).
    """
    theta = OPS[op]
    lk = left.select(F.col(left_key).alias("__lk")).distinct()
    rk = right.select(F.col(right_key).alias("__rk")).distinct()
    # d_l × d_r nested loop over keys only; result is small → broadcast
    # it into the two fan-out equi-joins.
    key_pairs = F.broadcast(lk.join(rk, theta(F.col("__lk"), F.col("__rk"))))
    return (
        left.join(key_pairs, left[left_key] == key_pairs["__lk"])
        .join(right, F.col("__rk") == right[right_key])
        .drop("__lk", "__rk")
    )


def theta_count_by_key(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    op: str,
) -> DataFrame:
    """COUNT(*) of theta-join pairs grouped by the left key, without ever
    materializing the pairs: per-key counts on each side (map-side
    partial agg), theta-join the d_l × d_r key summaries, multiply and
    sum. Output columns: ``key`` (left key value), ``n_pairs``.

    This is the scalable aggregate form of the reference's distinct-key
    idea — at 100 TB the only full-data work is two partial-aggregate
    shuffles of (key, count) pairs.
    """
    theta = OPS[op]
    lc = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count("*").alias("__ln")
    )
    rc = right.groupBy(F.col(right_key).alias("__rk")).agg(
        F.count("*").alias("__rn")
    )
    return (
        lc.join(F.broadcast(rc), theta(F.col("key"), F.col("__rk")))
        .groupBy("key")
        .agg(F.sum(F.col("__ln") * F.col("__rn")).alias("n_pairs"))
    )
