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


def test_approx_percentiles_verdicts_and_order(spark, sf_dir):
    rows = SPECS["sketch_approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p25_exact <= r.p50_exact <= r.p75_exact
        assert r.p25_within_bound == 1, (r.rflag, r.p25_exact)
        assert r.p50_within_bound == 1, (r.rflag, r.p50_exact)
        assert r.p75_within_bound == 1, (r.rflag, r.p75_exact)


def test_approx_percentiles_raw_estimate_error(spark, sf_dir):
    # The query surfaces only verdicts + exact values; keep the raw
    # sketch's tighter error magnitude pinned here (accuracy=10000 ⇒
    # rank error ≤ max(n/10000, 1); p50 within 2% in VALUE on this
    # smooth distribution).
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.queries._util import t

    r = (
        t(spark, sf_dir, "lineitem")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("e"),
        )
        .collect()[0]
    )
    assert abs(r.a - r.e) <= 0.02 * abs(r.e) + 1e-9, (r.a, r.e)


def test_kmv_estimate_within_10pct_of_exact(spark, sf_dir):
    # Accuracy proof moved OUT of the gated query (a corpus-wide exact
    # countDistinct scales with global cardinality — 262 s at 1024×);
    # here it runs once on the bounded test slice. k=256 ⇒ relative
    # stdev ≈ 1/sqrt(k-2) ≈ 6.3%; this deterministic draw lands well
    # inside 10%.
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.queries._util import t

    r = SPECS["sketch_kmv_distinct"].fn(spark, sf_dir).collect()[0]
    assert r.merged_equals_direct == 1
    exact = (
        t(spark, sf_dir, "lineitem")
        .agg(F.countDistinct("l_orderkey").alias("e"))
        .collect()[0]
        .e
    )
    assert abs(r.kmv_estimate - exact) * 10 <= exact, (r.kmv_estimate, exact)


def test_kmv_partials_superset_property(spark):
    # The map-only per-partition bottom-k candidate union must contain
    # the true global bottom-k even with heavy duplication across and
    # within partitions.
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.operators.kmv import kmv_partition_partials

    k = 16
    df = (
        spark.range(0, 20000)
        .repartition(8)
        .select(
            (F.col("id") % 3).cast("string").alias("g"),
            # many duplicates: only 500 distinct hash values
            F.conv(
                F.substring(F.md5((F.col("id") % 500).cast("string")), 1, 15), 16, 10
            )
            .cast("bigint")
            .alias("hv"),
        )
    )
    cand = kmv_partition_partials(df, "g", "hv", k)
    got = sorted(
        r.hv for r in cand.select("hv").distinct().orderBy("hv").limit(k).collect()
    )
    want = sorted(
        r.hv
        for r in df.select("hv").distinct().orderBy("hv").limit(k).collect()
    )
    assert got == want
    # per-group bottom-k must also be recoverable from the candidates
    for g in ("0", "1", "2"):
        got_g = sorted(
            r.hv
            for r in cand.where(F.col("g") == g)
            .select("hv")
            .distinct()
            .orderBy("hv")
            .limit(k)
            .collect()
        )
        want_g = sorted(
            r.hv
            for r in df.where(F.col("g") == g)
            .select("hv")
            .distinct()
            .orderBy("hv")
            .limit(k)
            .collect()
        )
        assert got_g == want_g


def test_kmv_candidates_jvm_exact_and_widen_path(spark):
    # The sketch-then-verify prefilter must return EXACTLY the distinct
    # survivor superset of each group's true bottom-k — including when
    # the uniformity assumption is violated so badly that the initial
    # threshold keeps nothing and the widen/fallback path must fire.
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.operators.kmv import kmv_candidates_jvm

    k = 16
    # group "u": ~uniform hashes (happy path, threshold keeps ~margin*k)
    uni = spark.range(0, 50000).select(
        F.lit("u").alias("g"),
        F.conv(
            F.substring(F.md5((F.col("id") % 4000).cast("string")), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .alias("hv"),
    )
    # group "t": every hash packed into the TOP of the 2^60 range —
    # approx_count_distinct sees 2000 distinct, so the initial
    # threshold ~ margin*k*2^60/2000 keeps zero rows; the operator must
    # widen (and ultimately fall back to the full range) yet stay exact.
    top = spark.range(0, 8000).select(
        F.lit("t").alias("g"),
        ((F.lit(1 << 59) * 2 - 1) - (F.col("id") % 2000)).cast("bigint").alias("hv"),
    )
    df = uni.unionAll(top).repartition(8)
    cand = kmv_candidates_jvm(df, "g", "hv", k)
    rows = cand.collect()
    # distinctness of the survivor set
    assert len(rows) == len({(r.g, r.hv) for r in rows})
    for g in ("u", "t"):
        got = sorted(r.hv for r in rows if r.g == g)[:k]
        want = [
            r.hv
            for r in df.where(F.col("g") == g)
            .select("hv")
            .distinct()
            .orderBy("hv")
            .limit(k)
            .collect()
        ]
        assert got == want, g
