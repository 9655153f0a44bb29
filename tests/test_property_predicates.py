"""Property-based randomized predicate testing (SURVEY §5 strategy):
random conjunctions of the six comparison ops over lineitem, executed
on Spark and DuckDB, must agree row-for-row. This generalizes the
reference's four golden queries to the whole filter algebra.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table

OPS = ["=", "!=", ">", ">=", "<", "<="]
# (column, literal strategy, is_string)
COLS = [
    ("l_linenumber", st.integers(min_value=0, max_value=8), False),
    ("l_quantity", st.integers(min_value=0, max_value=55), False),
    ("l_returnflag", st.sampled_from(["A", "N", "R", "X"]), True),
    ("l_linestatus", st.sampled_from(["F", "O"]), True),
    ("l_suppkey", st.integers(min_value=0, max_value=120), False),
]

predicate = st.sampled_from(COLS).flatmap(
    lambda c: st.tuples(st.just(c[0]), st.sampled_from(OPS), c[1], st.just(c[2]))
)
conjunction = st.lists(predicate, min_size=1, max_size=4)

_SPARK_OPS = {
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def duck2(sf_dir):
    con = duckdb.connect()
    for name in ("nation", "region"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    yield con
    con.close()


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(conj=conjunction)
def test_random_filter_conjunctions(spark, sf_dir, duck, conj):
    li = load_table(spark, sf_dir, "lineitem")
    cond = None
    frags = []
    for col, op, lit, is_str in conj:
        e = _SPARK_OPS[op](F.col(col), F.lit(lit))
        cond = e if cond is None else (cond & e)
        sql_lit = f"'{lit}'" if is_str else str(lit)
        sql_op = "<>" if op == "!=" else op
        frags.append(f"{col} {sql_op} {sql_lit}")
    sdf = li.filter(cond).select("l_orderkey", "l_linenumber")
    got = {tuple(r) for r in sdf.collect()}
    q = (
        "SELECT l_orderkey, l_linenumber FROM lineitem WHERE "
        + " AND ".join(frags)
    )
    expected = {tuple(r) for r in duck.execute(q).fetchall()}
    assert got == expected


# ---- random theta-join properties -----------------------------------

join_op = st.sampled_from(OPS)
nation_bound = st.integers(min_value=0, max_value=25)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(op=join_op, bound=nation_bound)
def test_random_theta_joins(spark, sf_dir, duck2, op, bound):
    """Random theta joins nation×region over all six ops, with a random
    pushed filter, vs DuckDB."""
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") <= bound)
    r = load_table(spark, sf_dir, "region")
    e = _SPARK_OPS[op](n.n_regionkey, r.r_regionkey)
    got = {
        tuple(row)
        for row in n.join(r, e)
        .select("n_nationkey", "r_regionkey")
        .collect()
    }
    sql_op = "<>" if op == "!=" else op
    expected = {
        tuple(row)
        for row in duck2.execute(
            f"SELECT n_nationkey, r_regionkey FROM nation n, region r "
            f"WHERE n.n_regionkey {sql_op} r.r_regionkey AND n.n_nationkey <= {bound}"
        ).fetchall()
    }
    assert got == expected


# ---- random group-by aggregation properties -------------------------

group_col = st.sampled_from(["l_returnflag", "l_linestatus", "l_linenumber"])
agg_col = st.sampled_from(["l_quantity", "l_extendedprice"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(g=group_col, a=agg_col, flt=st.integers(min_value=1, max_value=50))
def test_random_groupby_aggregates(spark, sf_dir, duck, g, a, flt):
    """Random (group key, decimal-summed measure, pushed filter) combos
    must match DuckDB bit-for-bit under the decimal discipline."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= flt)
    got = {
        tuple(r)
        for r in li.groupBy(F.col(g).alias("k"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col(a).cast("decimal(12,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    expected = {
        tuple(r)
        for r in duck.execute(
            f"SELECT {g} AS k, COUNT(*) AS cnt, "
            f"CAST(SUM(CAST({a} AS DECIMAL(12,2))) AS DOUBLE) AS s "
            f"FROM lineitem WHERE l_quantity >= {flt} GROUP BY {g}"
        ).fetchall()
    }
    assert got == expected
