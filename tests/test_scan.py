"""Pins for the distributed two-phase prefix scan and the PPS
systematic sampler built on it."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.scan import (
    global_cumsum,
    weighted_systematic_sample,
)


def _df(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "k long, w long")
    return df


def test_cumsum_matches_sequential(spark):
    rng = random.Random(2)
    rows = [(i, rng.randrange(1, 100)) for i in range(500)]
    rng.shuffle(rows)
    got = {
        r.k: r.cum
        for r in global_cumsum(
            _df(spark, rows), "k", "w", num_partitions=7
        ).collect()
    }
    acc = 0
    for k, w in sorted(rows):
        acc += w
        assert got[k] == acc


def test_cumsum_partition_count_invariance(spark):
    rows = [(i, (i * 37) % 50 + 1) for i in range(300)]
    a = global_cumsum(_df(spark, rows), "k", "w", num_partitions=3)
    b = global_cumsum(_df(spark, rows), "k", "w", num_partitions=17)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sampler_hits_sum_to_k_and_respect_weights(spark):
    rng = random.Random(9)
    rows = [(i, rng.randrange(1, 200)) for i in range(1000)]
    k = 37
    s = weighted_systematic_sample(_df(spark, rows), "k", "w", k=k, num_partitions=5)
    picked = s.where(F.col("sample_hits") > 0).collect()
    total_hits = sum(r.sample_hits for r in picked)
    assert total_hits == k  # every one of the k grid points covered once
    # a row can never be hit more often than its weight share implies +1
    total_w = sum(w for _, w in rows)
    for r in picked:
        assert r.sample_hits <= (r.w * k) // total_w + 1


def test_sampler_huge_row_gets_multiple_hits(spark):
    rows = [(i, 1) for i in range(100)] + [(100, 10_000)]
    s = weighted_systematic_sample(_df(spark, rows), "k", "w", k=10)
    hits = {r.k: r.sample_hits for r in s.where(F.col("sample_hits") > 0).collect()}
    assert hits[100] >= 9  # the dominating row covers ~all grid points


def test_grouped_topk_two_phase_matches_window(spark):
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.operators.scan import grouped_topk_two_phase

    rng = random.Random(23)
    # one hot group (80% of rows) + many cold groups; adversarial
    # repartition so candidates span many partitions
    rows = []
    for i in range(5000):
        g = "hot" if rng.random() < 0.8 else f"g{rng.randint(0, 50)}"
        rows.append((g, rng.randint(0, 10**6), i))
    df = spark.createDataFrame(rows, "g string, v bigint, id bigint").repartition(13)
    got = {
        (r.g, r.v, r.id, r.rn)
        for r in grouped_topk_two_phase(
            df, ["g"], [F.col("v").desc(), F.col("id")], 4
        ).collect()
    }
    w = W.partitionBy("g").orderBy(F.col("v").desc(), F.col("id"))
    want = {
        (r.g, r.v, r.id, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .collect()
    }
    assert got == want


def test_global_cumsum_over_limit_slice(spark):
    """Regression: an orderBy+limit upstream of global_cumsum used to
    compile differently in the local-sums and offsets branches
    (TakeOrderedAndProject vs Sort+GlobalLimit), each sampling its OWN
    range boundaries — inconsistent _pid values across branches made
    the _pid join silently DROP rows (8× row loss observed on a
    50k-doc slice). The pinned (localCheckpoint) partitioning must
    make the scan exact for any upstream shape."""
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.operators.scan import global_cumsum

    base = (
        spark.range(0, 200000)
        .repartition(32)
        .select(
            F.col("id"),
            (F.col("id") % 997 + 1).cast("bigint").alias("v"),
        )
    )
    sliced = base.orderBy("id").limit(50000)
    out = global_cumsum(sliced, "id", "v", "cum")
    n = out.count()
    assert n == 50000, f"rows dropped: {n}"
    last = out.orderBy(F.col("id").desc()).limit(1).collect()[0]
    expect = sum((i % 997) + 1 for i in range(50000))
    assert last.cum == expect


def test_global_dense_rank_over_limit_slice(spark):
    """Same hazard, dense-rank flavor: rank must be a 0..k-1 bijection
    over the distinct keys of a limit slice."""
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.operators.suffixarray import global_dense_rank

    base = (
        spark.range(0, 100000)
        .repartition(17)
        .select((F.col("id") % 3000).alias("k"))
    )
    sliced = base.orderBy(F.col("k")).limit(30000)
    ranked = global_dense_rank(sliced, ["k"], "rk")
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.countDistinct("rk").alias("d"),
        F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
    ).collect()[0]
    assert agg.n == 30000
    # 30000 rows ordered by k cover ceil(30000/34)=883 distinct keys at
    # least partially; ranks must be dense 0..d-1
    assert agg.lo == 0 and agg.hi == agg.d - 1
