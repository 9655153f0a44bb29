from __future__ import annotations

from minoan_athenaeum_spark.registry import load_all

SPECS = load_all()


def test_hll_within_rsd(spark, sf_dir):
    rows = SPECS["sketch_hll_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # rsd 2% → allow 4 sigma ≈ 8%.
        assert abs(r.approx_orders - r.exact_orders) <= max(
            0.08 * r.exact_orders, 2
        ), (r.rflag, r.approx_orders, r.exact_orders)


def test_approx_percentiles_ordered_and_close(spark, sf_dir):
    rows = SPECS["sketch_approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        p25, p50, p75 = r.approx_pcts
        assert p25 <= p50 <= p75
        # ~0.01% rank error at accuracy=10000 — p50 within 2% in value
        # on this smooth distribution.
        assert abs(p50 - r.exact_p50) <= 0.02 * abs(r.exact_p50) + 1e-9
