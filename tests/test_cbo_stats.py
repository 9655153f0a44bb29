"""Cost-based-optimizer wiring: ANALYZE TABLE statistics must reach the
optimizer (rowCount in the logical plan stats) and star-schema joins
must still produce correct results with CBO + join reorder enabled.
This pins the *mechanism* (stats flow in, plans stay valid) rather
than a specific join order — reorder choices are version-dependent."""

from __future__ import annotations

import pytest

from minoan_athenaeum_spark.catalog import load_table


@pytest.fixture(scope="module")
def cbo_tables(spark, sf_dir):
    for name in ("nation", "region", "customer"):
        load_table(spark, sf_dir, name).write.mode("overwrite").saveAsTable(
            f"cbo_{name}"
        )
        spark.sql(f"ANALYZE TABLE cbo_{name} COMPUTE STATISTICS")
    yield
    for name in ("nation", "region", "customer"):
        spark.sql(f"DROP TABLE IF EXISTS cbo_{name}")


def test_analyze_populates_row_counts(spark, sf_dir, cbo_tables):
    stats = spark.sql("DESCRIBE EXTENDED cbo_nation").collect()
    rows = {r[0]: r[1] for r in stats}
    assert "Statistics" in rows, "ANALYZE produced no Statistics row"
    assert "rows" in rows["Statistics"], rows["Statistics"]
    # and the optimizer sees them on the logical plan (rowCount only
    # propagates into plan stats when CBO is on)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        df = spark.table("cbo_nation")
        plan_stats = df._jdf.queryExecution().optimizedPlan().stats()
        assert plan_stats.rowCount().isDefined()
        assert plan_stats.rowCount().get() == 25
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")


_STAR_SQL = """
    SELECT r.r_name, COUNT(*) AS n
    FROM cbo_customer c
    JOIN cbo_nation n ON c.c_nationkey = n.n_nationkey
    JOIN cbo_region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
"""


def test_cbo_join_reorder_stays_correct(spark, sf_dir, cbo_tables):
    want = sorted(map(tuple, spark.sql(_STAR_SQL).collect()))  # CBO off
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try:
        got = sorted(map(tuple, spark.sql(_STAR_SQL).collect()))
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    assert got == want
    assert sum(n for _, n in got) == spark.table("cbo_customer").count()
