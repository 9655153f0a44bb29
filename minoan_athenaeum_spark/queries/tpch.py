"""Additional TPC-H-shaped analytic queries (adapted to the testdata's
columns): EXISTS/decorrelation, disjunctive predicates, CASE-ratio
aggregates, having-on-sum, semi-join rewrites. All decimal-exact vs the
DuckDB oracle (see queries/aggregates.py discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import (
    REV_SQL,
    dec,
    persist_tracked,
    release_tracked,
    rev,
    t,
)
from minoan_athenaeum_spark.registry import query

_REV = REV_SQL
_rev = rev


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority AS priority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "exists"),
)
def tpch_q4_order_priority(spark, sf_dir):
    """Q4: EXISTS-correlated subquery → left-semi join (Catalyst
    decorrelates; at scale the semi join shuffles once on orderkey)."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    l = t(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("order_count")
    )


@query(
    "tpch_q12_shipmode",
    oracle="""
    SELECT l_linestatus AS lstatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("tpch", "case-agg"),
)
def tpch_q12_shipmode(spark, sf_dir):
    """Q12-shape: join + CASE-bucketed counts."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_linestatus").alias("lstatus"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_ratio",
    oracle=f"""
    SELECT CAST(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE CAST(0 AS DECIMAL(19,4)) END) AS DOUBLE)
             / CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("tpch", "ratio"),
)
def tpch_q14_promo_ratio(spark, sf_dir):
    """Q14: promo revenue share — conditional decimal sums, double
    division at the end. Part is a scaling table (200k x sf rows) — no
    forced broadcast; AQE broadcasts it only while it fits."""
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp_ntz"))
    )
    joined = l.join(p, l.l_partkey == p.p_partkey)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
            F.lit(0).cast("decimal(19,4)")
        )
    ).cast("double")
    total = F.sum(_rev()).cast("double")
    return joined.agg((F.lit(100.0) * promo / total).alias("promo_revenue_pct"))


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name AS cname, o.o_orderkey AS okey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
      )
      AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, o.o_orderkey
    """,
    tags=("tpch", "having-subquery"),
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18: large-volume orders — aggregate subquery as semi-join
    filter, then re-join for detail. The HAVING aggregate runs first
    (one shuffle on orderkey); its small result semi-joins the facts."""
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec(F.col("l_quantity"), 12, 2)).alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    o = t(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("big_okey"), "left_semi"
    )
    c = t(spark, sf_dir, "customer")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_name").alias("cname"), F.col("o_orderkey").alias("okey"))
        .agg(F.sum(dec(F.col("l_quantity"), 12, 2)).cast("double").alias("total_qty"))
    )


@query(
    "tpch_q19_disjunctive",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 35)
       OR (p_type = 'PROMO' AND l_discount >= 0.05)
    """,
    tags=("tpch", "disjunction"),
)
def tpch_q19_disjunctive(spark, sf_dir):
    """Q19-shape: disjunctive multi-clause predicate across both join
    sides (the reference grammar has no OR at all — extension surface).
    Catalyst extracts the common join key and pushes per-side
    conjuncts."""
    p = t(spark, sf_dir, "part")
    l = t(spark, sf_dir, "lineitem")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_discount") >= 0.05))
    )
    return j.filter(cond).agg(
        F.sum(_rev()).cast("double").alias("revenue"), F.count("*").alias("cnt")
    )


@query(
    "tpch_q10_returned",
    oracle=f"""
    SELECT c.c_custkey AS ckey, c.c_name AS cname,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue, n.n_name AS nname
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, ckey LIMIT 20
    """,
    tags=("tpch", "topk"),
)
def tpch_q10_returned(spark, sf_dir):
    """Q10: returned-item revenue ranking (join + group + top-20)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("ckey"),
            F.col("c_name").alias("cname"),
            F.col("n_name").alias("nname"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("ckey", "cname", "revenue", "nname")
        .orderBy(F.col("revenue").desc(), F.col("ckey"))
        .limit(20)
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2
    WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
      AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey
      AND c.c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    tags=("tpch", "multiway"),
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7: bidirectional nation-pair trade volume — six-way join with a
    disjunctive cross-table predicate, grouped by year."""
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(F.sum(_rev()).cast("double").alias("revenue"))


@query(
    "tpch_q22_global_scalar_subquery",
    oracle="""
    SELECT c_mktsegment AS seg, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                              / COUNT(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    tags=("tpch", "scalar-subquery"),
)
def tpch_q22_global_scalar_subquery(spark, sf_dir):
    """Q22-shape: scalar subquery (global average balance, computed with
    the exact decimal-sum/count discipline) + NOT EXISTS anti-join.
    The scalar aggregates to one row → broadcast into the filter; the
    anti join hashes on custkey. The NOT EXISTS is date-restricted:
    every customer in this data has at least one all-time order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec(F.col("c_acctbal"), 12, 2)).cast("double") / F.count("*")).alias(
                "avg_bal"
            )
        )
    )
    filtered = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = filtered.join(o, filtered.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count("*").alias("n_cust"),
        F.sum(dec(F.col("c_acctbal"), 12, 2)).cast("double").alias("total_bal"),
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS skey, s.s_name AS sname, r.total_revenue AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "cte", "scalar-subquery"),
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: top supplier by quarterly revenue — CTE reused twice (once
    for the scalar MAX, once for the join). The revenue aggregate is
    persisted so the two consumers share one computation."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    release_tracked()
    revenue = persist_tracked(
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("skey"),
            F.col("s_name").alias("sname"),
            F.col("total_revenue"),
        )
    )
