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
