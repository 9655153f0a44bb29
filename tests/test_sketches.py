from __future__ import annotations

from minoan_athenaeum_spark.registry import load_all

SPECS = load_all()


def test_hll_within_rsd(spark, sf_dir):
    rows = SPECS["sketch_hll_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.orders_within_bound == 1, (r.rflag, r.exact_orders)
        assert r.parts_within_bound == 1, (r.rflag, r.exact_parts)


def test_hll_raw_estimate_error(spark, sf_dir):
    # The query now surfaces only the within-bound verdicts; keep the
    # raw estimate's error magnitude pinned here (rsd 2% → 4σ ≈ 8%).
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.queries._util import t

    r = (
        t(spark, sf_dir, "lineitem")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a"),
            F.countDistinct("l_orderkey").alias("e"),
        )
        .collect()[0]
    )
    assert abs(r.a - r.e) <= max(0.08 * r.e, 2), (r.a, r.e)


def test_approx_percentiles_ordered_and_close(spark, sf_dir):
    rows = SPECS["sketch_approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        p25, p50, p75 = r.approx_pcts
        assert p25 <= p50 <= p75
        # ~0.01% rank error at accuracy=10000 — p50 within 2% in value
        # on this smooth distribution.
        assert abs(p50 - r.exact_p50) <= 0.02 * abs(r.exact_p50) + 1e-9
