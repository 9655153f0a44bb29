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
    filter, then enrich with order/customer detail.

    Optimization r14 (guide §1.2 step 1, §2.4): the classic shape scans
    lineitem TWICE (once for the HAVING aggregate, once re-joined for
    the detail sum) — but the detail group (c_name, o_orderkey) is per
    ORDER (o_orderkey is the orders primary key, c_custkey the customer
    primary key), so the re-joined SUM(l_quantity) is exactly the ``q``
    the HAVING aggregate already computed. Join the (tiny) filtered
    aggregate to orders/customer instead: ONE pass over the fact table,
    no second lineitem shuffle, no final re-aggregation exchange.
    Decimal sums are exact, so the surviving aggregate's value is
    bit-identical to the re-derived one; the DuckDB oracle (unchanged)
    gates the equivalence at every SF."""
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec(F.col("l_quantity"), 12, 2)).alias("q"))
        .filter(F.col("q") > 150)
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_name").alias("cname"),
            F.col("o_orderkey").alias("okey"),
            F.col("q").cast("double").alias("total_qty"),
        )
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
    """Q10: returned-item revenue ranking (join + group + top-20).
    Selective-first join order: the one-quarter date filter makes
    orders⋈customer small, so lineitem joins against the reduced side
    (AQE broadcasts it when it fits)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp_ntz"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
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
    # The disjunctive pair predicate implies BOTH endpoints lie in the
    # two named nations — push that implication down so customer and
    # supplier shrink to 2/25ths before any fact joins (the rewrite a
    # CBO's constraint propagation would emit); the exact pair filter
    # still runs at the end.
    c2 = c.join(F.broadcast(n2), c.c_nationkey == F.col("n2_key")).filter(
        F.col("cust_nation").isin("NATION_1", "NATION_2")
    )
    s2 = s.join(F.broadcast(n1), s.s_nationkey == F.col("n1_key")).filter(
        F.col("supp_nation").isin("NATION_1", "NATION_2")
    )
    j = (
        o.join(c2, o.o_custkey == c2.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s2, l.l_suppkey == s2.s_suppkey)
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


# ---------------------------------------------------------------------------
# Completion of the 22-query TPC-H-shaped suite. The testdata has no
# partsupp table and no receipt/commit dates, so: the part↔supplier
# relation is derived as SELECT DISTINCT l_partkey, l_suppkey FROM
# lineitem (q2/q16/q20), supply cost is proxied by p_retailprice (q9),
# and "late" means shipped more than 60 days after the order date (q21).
# Query SHAPES (correlated subqueries, scalar thresholds, anti joins,
# double-correlated EXISTS/NOT EXISTS) follow the originals.
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_best_supplier",
    oracle="""
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eligible AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM part p, supply ps, supplier s, nation n, region r
      WHERE p.p_partkey = ps.l_partkey AND s.s_suppkey = ps.l_suppkey
        AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
        AND r.r_name = 'EUROPE' AND p.p_size = 15)
    SELECT e.s_acctbal AS sbal, e.s_name AS sname, e.n_name AS nname,
           e.p_partkey AS pkey, e.p_name AS pname
    FROM eligible e
    WHERE e.s_acctbal = (SELECT MAX(e2.s_acctbal) FROM eligible e2
                         WHERE e2.p_partkey = e.p_partkey)
    """,
    tags=("tpch", "correlated-subquery"),
)
def tpch_q2_best_supplier(spark, sf_dir):
    """Q2-shape: per-part best supplier in a region — the correlated
    MAX subquery decorrelates to groupBy(part).max + join back (one
    shuffle on partkey for both branches; nation/region broadcast)."""
    supply = (
        t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        supply.join(p, supply.l_partkey == p.p_partkey)
        .join(s, supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    best = eligible.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.max("s_acctbal").alias("__mx")
    )
    return (
        eligible.join(
            best,
            (eligible.p_partkey == F.col("__pk"))
            & (eligible.s_acctbal == F.col("__mx")),
        )
        .select(
            F.col("s_acctbal").alias("sbal"),
            F.col("s_name").alias("sname"),
            F.col("n_name").alias("nname"),
            F.col("p_partkey").alias("pkey"),
            F.col("p_name").alias("pname"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN rev
                         ELSE CAST(0 AS DECIMAL(19,4)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE) AS mkt_share
    FROM (SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                 {_REV} AS rev, n2.n_name AS nation
          FROM part p, supplier s, lineitem l, orders o, customer c,
               nation n1, nation n2, region r
          WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
            AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
            AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r.r_regionkey
            AND r.r_name = 'ASIA' AND s.s_nationkey = n2.n_nationkey
            AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            AND p.p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    """,
    tags=("tpch", "ratio"),
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8: one nation's revenue share inside a region's import market,
    per year. Eight-way join; the two nation roles are separate aliased
    broadcasts; conditional decimal sums divide as double at the end."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    zero = F.lit(0).cast("decimal(19,4)")
    target = F.sum(F.when(F.col("nation") == "NATION_3", _rev()).otherwise(zero))
    return j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        (target.cast("double") / F.sum(_rev()).cast("double")).alias("mkt_share")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nname, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (SELECT n.n_name AS nname,
                 CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                 {_REV} - CAST(p.p_retailprice AS DECIMAL(12,2))
                            * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
          FROM part p, supplier s, lineitem l, orders o, nation n
          WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
            AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey
            AND p.p_name LIKE '%e%') profit
    GROUP BY nname, o_year
    """,
    tags=("tpch", "multiway"),
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9-shape: profit (revenue minus retail-price×quantity cost proxy
    — the testdata has no partsupp/supplycost) by supplier nation and
    order year, over parts whose name matches a pattern. All decimal
    arithmetic until the final double cast."""
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    s = t(spark, sf_dir, "supplier")
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    amount = _rev() - dec(F.col("p_retailprice"), 12, 2) * dec(F.col("l_quantity"), 12, 2)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nname"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH value_by_part AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS val
      FROM lineitem l, supplier s, nation n
      WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
        AND n.n_name = 'NATION_8'
      GROUP BY l.l_partkey)
    SELECT l_partkey AS pkey, val AS value
    FROM value_by_part
    WHERE val > (SELECT SUM(val) * 0.001 FROM value_by_part)
    """,
    tags=("tpch", "scalar-subquery"),
)
def tpch_q11_important_parts(spark, sf_dir):
    """Q11-shape: parts whose traded value within one nation exceeds a
    fraction of the nation's total. The per-part aggregate is persisted
    and reused for the scalar total (CTE reuse, one shuffle on partkey);
    both branches cast to double identically before the comparison."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    release_tracked()
    val = persist_tracked(
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("pkey"))
        .agg(
            F.sum(dec(F.col("l_extendedprice"), 12, 2) * dec(F.col("l_quantity"), 12, 2))
            .cast("double")
            .alias("value")
        )
    )
    thresh = val.agg((F.sum("value") * F.lit(0.001)).alias("__t"))
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.col("value") > F.col("__t"))
        .select("pkey", "value")
    )


@query(
    "tpch_q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "outer-join"),
)
def tpch_q13_order_distribution(spark, sf_dir):
    """Q13: histogram of orders-per-customer — left outer join with a
    join-time residual predicate (NOT a post-filter: customers whose
    only orders are urgent must still appear with count 0), then two
    aggregations."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q16_supplier_counts",
    oracle="""
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand AS brand, p.p_type AS ptype, p.p_size AS psize,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM supply ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 15, 20, 25, 30, 35)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "anti-join"),
)
def tpch_q16_supplier_counts(spark, sf_dir):
    """Q16-shape: distinct supplier counts per (brand, type, size),
    excluding negative-balance suppliers (the NOT IN is an anti join —
    s_suppkey is non-null so the semantics coincide)."""
    supply = (
        t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 15, 20, 25, 30, 35))
    )
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0)
    return (
        supply.join(bad, supply.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, supply.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("ptype"),
            F.col("p_size").alias("psize"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("tpch", "correlated-subquery"),
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """Q17: revenue lost to small orders — the correlated per-part AVG
    decorrelates to a partkey aggregate joined back (avg of
    integer-valued doubles is order-independent, so both engines agree
    bit-for-bit). The avg is computed over candidate parts only (semi
    restriction) — same result, 1/2000th of the aggregate state."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    cand = l.join(p, l.l_partkey == p.p_partkey)
    avg_qty = (
        l.join(p, l.l_partkey == p.p_partkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("__pk"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("__avg"))
    )
    return (
        cand.join(avg_qty, cand.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__avg"))
        .agg(
            (F.sum(dec(F.col("l_extendedprice"), 12, 2)).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@query(
    "tpch_q20_excess_suppliers",
    oracle="""
    SELECT s.s_name AS sname, s.s_acctbal AS sbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_8'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE '%a%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > 40.0)
    """,
    tags=("tpch", "semi-join"),
)
def tpch_q20_excess_suppliers(spark, sf_dir):
    """Q20-shape: suppliers in one nation who moved more than a
    threshold quantity of any matching part in a year (shipped-quantity
    proxy for the original's stock-excess predicate). IN-subquery →
    aggregate + semi join."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    heavy = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 40.0)
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select(F.col("s_name").alias("sname"), F.col("s_acctbal").alias("sbal"))
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
    allsupp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name AS sname, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_8'
    WHERE EXISTS (SELECT 1 FROM allsupp l2 WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
    tags=("tpch", "exists", "anti-join"),
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """Q21-shape: suppliers solely responsible for late finalized
    multi-supplier orders ("late" = shipped >60 days after the order
    date; the testdata has no receipt/commit dates). The EXISTS becomes
    a semi join and the NOT EXISTS an anti join, both on orderkey with a
    supplier-inequality residual."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    allsupp = l.select("l_orderkey", "l_suppkey").distinct()
    l1 = late.alias("l1")
    l2 = allsupp.alias("l2")
    l3 = late.alias("l3")
    qualified = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    return (
        qualified.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("s_name").alias("sname"))
        .agg(F.count("*").alias("numwait"))
    )
