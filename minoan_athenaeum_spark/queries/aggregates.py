"""Aggregation surface (SURVEY.md §2 G1 made real, plus §7.2 step 5).

The reference reserved COUNT/SUM/GROUP BY but never implemented them
(``/root/reference/sql-to-json:146-149,175-181,252``). Here they are
first-class, plus DISTINCT / HAVING / ORDER BY / LIMIT / set ops /
ROLLUP-CUBE and TPC-H-style analytic queries.

Exactness: double columns are cast to DECIMAL before SUM (exact in both
engines), result cast back to DOUBLE; averages are decimal-sum / count
via IEEE double division. This makes Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.queries._util import REV_SQL, dec, rev, t
from minoan_athenaeum_spark.registry import query

_REV_SQL = REV_SQL
_rev = rev


@query(
    "agg_g1_groupby_count_sum",
    oracle="""
    SELECT l_returnflag AS rflag,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("G1",),
)
def agg_g1_groupby_count_sum(spark, sf_dir):
    """GROUP BY + COUNT + SUM — the reference's vestigial G1 operators
    (/root/reference/sql-to-json:175-181) implemented for real.
    Spark: partial (map-side) aggregation then final — one shuffle."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("rflag"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(dec(F.col("l_quantity"), 12, 2)).cast("double").alias("sum_qty"),
        )
    )


@query(
    "agg_tpch_q1",
    oracle=f"""
    SELECT l_returnflag AS rflag, l_linestatus AS lstatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_REV_SQL} * (1 + CAST(l_tax AS DECIMAL(6,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(6,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("G1", "agg"),
)
def agg_tpch_q1(spark, sf_dir):
    """TPC-H Q1 pricing summary — the canonical scan+filter+groupBy.
    One pass over lineitem, filter pushed to parquet, map-side partials."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz")
    )
    qty, price, disc = (
        dec(F.col("l_quantity"), 12, 2),
        dec(F.col("l_extendedprice"), 12, 2),
        dec(F.col("l_discount"), 6, 2),
    )
    return (
        li.groupBy(
            F.col("l_returnflag").alias("rflag"), F.col("l_linestatus").alias("lstatus")
        )
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(_rev()).cast("double").alias("sum_disc_price"),
            F.sum(_rev() * (1 + dec(F.col("l_tax"), 6, 2)))
            .cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_tpch_q3_top10",
    oracle=f"""
    SELECT o.o_orderkey AS okey,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS odate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, okey
    LIMIT 10
    """,
    tags=("agg", "topk", "flagship"),
)
def agg_tpch_q3_top10(spark, sf_dir):
    """TPC-H Q3 shipping-priority: join customer⋈orders⋈lineitem, group,
    top-10 by revenue. Join ORDER is selective-first, the plan a CBO
    would pick: orders⋈customer cuts orders to the BUILDING segment
    BEFORE lineitem joins in, so the orderkey join's build side is the
    reduced set (AQE broadcasts it when it fits; at worst lineitem
    shuffles once against a 5×-smaller side). TakeOrderedAndProject
    avoids a global sort."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select(
            F.col("o_orderkey").alias("okey"),
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.col("revenue").desc(), F.col("okey"))
        .limit(10)
    )


@query(
    "agg_tpch_q5_region_revenue",
    oracle=f"""
    SELECT n.n_name AS nname, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("agg", "flagship"),
)
def agg_tpch_q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 local-supplier volume: 6-way join + group. Join order is
    selective-first (CBO shape): orders is date-filtered and joins
    customer before lineitem enters, so the orderkey join's non-lineitem
    side is already reduced (AQE broadcasts it when it fits rather than
    shuffling the full lineitem). Dims (nation/region) broadcast;
    customer/supplier scale with sf so no forced hints on them."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nname"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "agg_having",
    oracle="""
    SELECT c_mktsegment AS seg, COUNT(*) AS cnt
    FROM customer GROUP BY c_mktsegment HAVING COUNT(*) > 10
    """,
    tags=("agg",),
)
def agg_having(spark, sf_dir):
    """GROUP BY ... HAVING (post-aggregation filter)."""
    return (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 10)
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderstatus AS status, COUNT(DISTINCT o_custkey) AS nd_cust,
           COUNT(*) AS cnt
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg",),
)
def agg_count_distinct(spark, sf_dir):
    """COUNT(DISTINCT) — expands to a two-phase exact distinct aggregate."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.countDistinct("o_custkey").alias("nd_cust"), F.count("*").alias("cnt")
        )
    )


@query(
    "agg_min_max",
    oracle="""
    SELECT p_brand AS brand, MIN(p_retailprice) AS min_price,
           MAX(p_retailprice) AS max_price, MIN(p_size) AS min_size,
           MAX(p_size) AS max_size
    FROM part GROUP BY p_brand
    """,
    tags=("agg",),
)
def agg_min_max(spark, sf_dir):
    """MIN/MAX over doubles and ints (exact — no arithmetic involved)."""
    return (
        t(spark, sf_dir, "part")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
            F.min("p_size").alias("min_size"),
            F.max("p_size").alias("max_size"),
        )
    )


@query(
    "agg_distinct",
    oracle="SELECT DISTINCT o_orderpriority AS priority, o_orderstatus AS status FROM orders",
    tags=("distinct",),
)
def agg_distinct(spark, sf_dir):
    """SELECT DISTINCT — hash aggregate on all output columns."""
    return (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
        .distinct()
    )


@query(
    "agg_orderby_limit",
    oracle="""
    SELECT o_orderkey AS okey, o_totalprice AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("topk", "sort"),
)
def agg_orderby_limit(spark, sf_dir):
    """ORDER BY + LIMIT (top-k). Spark plans TakeOrderedAndProject —
    per-partition heaps, no global sort. Tie-broken on key for
    determinism."""
    return (
        t(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("okey"), F.col("o_totalprice").alias("price"))
        .orderBy(F.col("price").desc(), F.col("okey"))
        .limit(10)
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
    tags=("setop",),
)
def setop_intersect(spark, sf_dir):
    """INTERSECT (distinct) — left-semi hash join over distinct keys."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
    tags=("setop",),
)
def setop_except(spark, sf_dir):
    """EXCEPT (distinct) — left-anti hash join over distinct keys."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)


@query(
    "setop_union_all_count",
    oracle="""
    SELECT nk, COUNT(*) AS cnt FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier
    ) GROUP BY nk
    """,
    tags=("setop",),
)
def setop_union_all_count(spark, sf_dir):
    """UNION ALL then aggregate (bag semantics preserved)."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).groupBy("nk").agg(F.count("*").alias("cnt"))


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag AS rflag, l_linestatus AS lstatus, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark, sf_dir):
    """GROUP BY ROLLUP — hierarchical subtotals (Expand + single agg)."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup(F.col("l_returnflag").alias("rflag"), F.col("l_linestatus").alias("lstatus"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(dec(F.col("l_quantity"), 12, 2)).cast("double").alias("sum_qty"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority, COUNT(*) AS cnt
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark, sf_dir):
    """GROUP BY CUBE — all grouping-set combinations."""
    return (
        t(spark, sf_dir, "orders")
        .cube(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "agg_subquery_in",
    oracle="""
    SELECT o_orderkey AS okey, o_totalprice AS price
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
      AND o_totalprice > 100000
    """,
    tags=("subquery",),
)
def agg_subquery_in(spark, sf_dir):
    """IN-subquery — planned as a left-semi join (the reference
    has no subqueries at all; extension surface)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    hot = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9500)
    return o.join(
        hot, o.o_custkey == hot.c_custkey, "left_semi"
    ).select(F.col("o_orderkey").alias("okey"), F.col("o_totalprice").alias("price"))


@query(
    "agg_outer_join_coalesce",
    oracle="""
    SELECT c.c_custkey AS ckey, COALESCE(t.cnt, 0) AS order_cnt
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) t
      ON c.c_custkey = t.o_custkey
    """,
    tags=("join", "outer"),
)
def agg_outer_join_coalesce(spark, sf_dir):
    """LEFT OUTER join + COALESCE — the reference is inner-only
    (unmatched rows deleted, /root/reference/database.py:693-701); outer
    joins are extension surface. Aggregate-then-join keeps the build side
    small enough to broadcast at scale."""
    c = t(spark, sf_dir, "customer")
    cnt = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    return c.join(cnt, c.c_custkey == cnt.o_custkey, "left").select(
        F.col("c_custkey").alias("ckey"),
        F.coalesce(F.col("cnt"), F.lit(0)).alias("order_cnt"),
    )


@query(
    "agg_anti_join",
    oracle="""
    SELECT c_custkey AS ckey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    """,
    tags=("join", "anti"),
)
def agg_anti_join(spark, sf_dir):
    """NOT EXISTS — left-anti hash join (customers with no orders since
    2000; every customer has *some* order in this data, so the date
    restriction keeps the result non-trivial)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.col("c_custkey").alias("ckey")
    )
