"""Reference-parity relational core (SURVEY.md §2 S/P/F/J/X rows).

Each query re-expresses one reference operator over the driver testdata,
Spark-first: filters/projections push down to the parquet scan, equi-joins
broadcast the small build side, theta joins go through Spark's
BroadcastNestedLoopJoin (the reference's distinct-key NLJ,
``/root/reference/database.py:539-617``, is an optimization we only need
at scale — see operators/theta.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query


@query(
    "parity_f1_filter_ops",
    oracle="""
    SELECT l_orderkey AS okey, l_linenumber AS lineno,
           l_quantity AS qty, l_discount AS disc
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus != 'X'
      AND l_quantity > 30 AND l_quantity >= 31
      AND l_linenumber < 5 AND l_discount <= 0.05
    """,
    tags=("F1", "F2", "F3", "F4", "P1"),
)
def parity_f1_filter_ops(spark, sf_dir):
    """All six comparison ops (= != > >= < <=) AND-conjoined.

    Reference: ``Filter.apply`` /root/reference/database.py:443-458 (ops),
    conjunction via row-set intersection /root/reference/database.py:746-760.
    Spark: chained Column predicates — Catalyst merges them into one
    parquet PushedFilters list (verified via explain).
    """
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R")
        & (F.col("l_linestatus") != "X")
        & (F.col("l_quantity") > 30)
        & (F.col("l_quantity") >= 31)
        & (F.col("l_linenumber") < 5)
        & (F.col("l_discount") <= 0.05)
    ).select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lineno"),
        F.col("l_quantity").alias("qty"),
        F.col("l_discount").alias("disc"),
    )


@query(
    "parity_p1_projection_alias",
    oracle="""
    SELECT o_orderkey AS okey, o_totalprice AS price, o_orderpriority AS priority
    FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("P1", "P2"),
)
def parity_p1_projection_alias(spark, sf_dir):
    """Projection with AS aliases (reference ``parse_select``
    /root/reference/database.py:231-263, alias /root/reference/sql-to-json:161-169).
    Spark: .select(col.alias(...)) — column pruning reaches the scan."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


@query(
    "parity_j1_equijoin",
    oracle="""
    SELECT o.o_orderkey AS okey, c.c_name AS cname, c.c_mktsegment AS segment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 1000
    """,
    tags=("J1", "J7", "J8"),
)
def parity_j1_equijoin(spark, sf_dir):
    """Inner equi-join (reference hash join over inverted indexes,
    ``Join.__equals`` /root/reference/database.py:526-537).
    Spark: hash equi-join; customer scales with sf, so the physical
    strategy (broadcast vs shuffle) is left to AQE."""
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 1000)
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select(
        F.col("o_orderkey").alias("okey"),
        F.col("c_name").alias("cname"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "parity_j3_theta_self_join",
    oracle="""
    SELECT a.s_suppkey AS a_supp, b.s_suppkey AS b_supp
    FROM supplier a, supplier b
    WHERE a.s_acctbal > b.s_acctbal
    """,
    tags=("J3", "J10"),
)
def parity_j3_theta_self_join(spark, sf_dir):
    """Self theta-join via aliases — the reference's golden example-3
    (``/root/reference/example-3.sql``; distinct-key NLJ
    /root/reference/database.py:555-569; alias sharing
    /root/reference/database.py:206-212).
    Spark: df.alias twice + `>` condition → BroadcastNestedLoopJoin."""
    s = t(spark, sf_dir, "supplier")
    a, b = s.alias("a"), s.alias("b")
    return a.join(b, F.col("a.s_acctbal") > F.col("b.s_acctbal")).select(
        F.col("a.s_suppkey").alias("a_supp"), F.col("b.s_suppkey").alias("b_supp")
    )


@query(
    "parity_j2_neq_join",
    oracle="""
    SELECT n.n_nationkey AS nkey, r.r_regionkey AS rkey
    FROM nation n, region r
    WHERE n.n_regionkey != r.r_regionkey
    """,
    tags=("J2",),
)
def parity_j2_neq_join(spark, sf_dir):
    """Theta join on `!=` (reference ``Join.__not_equals``
    /root/reference/database.py:539-553)."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return n.join(r, n.n_regionkey != r.r_regionkey).select(
        F.col("n_nationkey").alias("nkey"), F.col("r_regionkey").alias("rkey")
    )


@query(
    "parity_j4_range_join_ge",
    oracle="""
    SELECT 'ge' AS op, n.n_nationkey AS nkey, r.r_regionkey AS rkey
    FROM nation n JOIN region r ON n.n_regionkey >= r.r_regionkey
    WHERE n.n_nationkey <= 12
    UNION ALL
    SELECT 'le' AS op, n.n_nationkey AS nkey, r.r_regionkey AS rkey
    FROM nation n JOIN region r ON n.n_regionkey <= r.r_regionkey
    WHERE n.n_nationkey <= 12
    """,
    tags=("J4", "J6"),
)
def parity_j4_range_join_ge(spark, sf_dir):
    """Theta joins on `>=` AND `<=` with a pushed filter, row-tagged by
    op so both directions are value-hash verified in ONE driver slot
    (reference ``Join.__greater_than_equals``
    /root/reference/database.py:571-585 and ``Join.__less_than_equals``
    /root/reference/database.py:603-617 — §2 operators J4 and J6)."""
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") <= 12)
    r = t(spark, sf_dir, "region")

    def side(op_name, cond):
        return n.join(r, cond).select(
            F.lit(op_name).alias("op"),
            F.col("n_nationkey").alias("nkey"),
            F.col("r_regionkey").alias("rkey"),
        )

    return side("ge", n.n_regionkey >= r.r_regionkey).unionByName(
        side("le", n.n_regionkey <= r.r_regionkey)
    )


@query(
    "parity_j5_range_join_lt",
    oracle="""
    SELECT s.s_suppkey AS skey, n.n_nationkey AS nkey
    FROM supplier s JOIN nation n ON s.s_nationkey < n.n_nationkey
    WHERE n.n_nationkey >= 20
    """,
    tags=("J5",),
)
def parity_j5_range_join_lt(spark, sf_dir):
    """Theta join on `<` (reference ``Join.__less_than``
    /root/reference/database.py:587-601)."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_nationkey") >= 20)
    return s.join(n, s.s_nationkey < n.n_nationkey).select(
        F.col("s_suppkey").alias("skey"), F.col("n_nationkey").alias("nkey")
    )


@query(
    "parity_j9_multiway_join",
    oracle="""
    SELECT l.l_orderkey AS okey, l.l_linenumber AS lineno,
           c.c_custkey AS ckey, n.n_name AS nname, r.r_name AS rname
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE l.l_quantity > 45 AND o.o_orderstatus = 'F'
    """,
    tags=("J9", "J7"),
)
def parity_j9_multiway_join(spark, sf_dir):
    """Multi-way join chain (reference greedy chain pipeline
    ``Query.execute`` /root/reference/database.py:656-789). Spark:
    declarative join chain — Catalyst/AQE order it; bounded dims
    (nation/region) broadcast, customer is AQE's call."""
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("lineno"),
            F.col("c_custkey").alias("ckey"),
            F.col("n_name").alias("nname"),
            F.col("r_name").alias("rname"),
        )
    )


@query(
    "parity_x1_cross_join",
    oracle="""
    SELECT r.r_name AS rname, s.s_suppkey AS skey
    FROM region r CROSS JOIN supplier s
    """,
    tags=("X1",),
)
def parity_x1_cross_join(spark, sf_dir):
    """Cross product FROM list. The reference grammar accepts it but its
    executor hangs on disconnected tables (/root/reference/database.py:663-673);
    we implement the semantics the grammar implies (documented divergence)."""
    r = t(spark, sf_dir, "region")
    s = t(spark, sf_dir, "supplier")
    return r.crossJoin(s).select(
        F.col("r_name").alias("rname"), F.col("s_suppkey").alias("skey")
    )


@query(
    "parity_j10_self_equijoin_alias",
    oracle="""
    SELECT a.c_custkey AS a_cust, b.c_custkey AS b_cust, a.c_nationkey AS nkey
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE a.c_acctbal > 9000 AND b.c_acctbal > 9000
    """,
    tags=("J10", "J1"),
)
def parity_j10_self_equijoin_alias(spark, sf_dir):
    """Self equi-join through aliases (one underlying scan, two names —
    reference shares one loaded Table across aliases,
    /root/reference/database.py:206-212)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    a, b = c.alias("a"), c.alias("b")
    return a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey")),
    ).select(
        F.col("a.c_custkey").alias("a_cust"),
        F.col("b.c_custkey").alias("b_cust"),
        F.col("a.c_nationkey").alias("nkey"),
    )
