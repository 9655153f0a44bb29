"""spread_scan: conditional corpus repartition (optimization r14,
VERDICT r13 #4). The bench corpus is a single parquet file, so the
CPU-dense map stages (Arrow decode, signature hashing, featurize) must
still be spread to cluster parallelism — but a multi-split input (the
100 TB posture) must NOT pay an O(corpus) round-robin shuffle before
map-only work."""

from __future__ import annotations

import pyspark.sql.functions as F

from minoan_athenaeum_spark.queries._util import spread_scan


def test_multi_split_input_skips_the_exchange(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    src = str(tmp_path / "multi")
    # one file per core (>= parallelism splits once read back)
    spark.range(10_000).withColumn("txt", F.concat(F.lit("d"), "id")).repartition(
        par
    ).write.parquet(src)
    df = spark.read.parquet(src)
    assert df.rdd.getNumPartitions() >= par
    out = spread_scan(df)
    # identical DataFrame object: no repartition node added at all
    assert out is df
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


def test_single_file_input_still_spreads(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    src = str(tmp_path / "single")
    spark.range(10_000).withColumn("txt", F.concat(F.lit("d"), "id")).coalesce(
        1
    ).write.parquet(src)
    df = spark.read.parquet(src)
    assert df.rdd.getNumPartitions() < par
    out = spread_scan(df)
    assert out is not df
    assert out.rdd.getNumPartitions() == par
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange RoundRobinPartitioning" in plan


def test_filtered_scan_supported(spark, tmp_path):
    """The minhash serve spreads a FILTERED scan (batch slice); the
    helper must plan it without running a job and keep semantics."""
    src = str(tmp_path / "filt")
    spark.range(1_000).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src).filter(F.col("id") % 10 == 0)
    out = spread_scan(df)
    assert out.count() == 100
