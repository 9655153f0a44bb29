"""Pins for sources/parquet_sink.py::compact_small_files — file-count
arithmetic, even sizing, and content preservation."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from minoan_athenaeum_spark.sources.parquet_sink import compact_small_files


def _data_files(path):
    return [
        f
        for f in glob.glob(os.path.join(path, "*"))
        if not os.path.basename(f).startswith(("_", "."))
    ]


def test_compaction_reduces_file_count_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    df = spark.range(200_000).withColumn("payload", F.md5(F.col("id").cast("string")))
    df.repartition(50).write.parquet(src)
    assert len(_data_files(src)) == 50

    total = sum(os.stat(f).st_size for f in _data_files(src))
    target = total // 4
    n = compact_small_files(spark, src, dst, target_bytes=target)
    # ceil(total/target) is 5 unless total happens to divide exactly by
    # 4 (parquet sizes shift with writer parallelism/compression, and
    # the function's own listing includes metadata files) — pin the
    # arithmetic band, not a byte-exact boundary
    assert n in (4, 5), n
    assert len(_data_files(dst)) == n

    back = spark.read.parquet(dst)
    assert back.count() == 200_000
    # xor-checksum equality: every row moved exactly once (bit_xor —
    # overflow-free under ANSI mode, order-insensitive)
    def checksum(d):
        return d.agg(F.expr("bit_xor(xxhash64(id, payload)) AS s")).first().s

    assert checksum(back) == checksum(df)


def test_compaction_single_file_floor(spark, tmp_path):
    src = str(tmp_path / "tiny")
    dst = str(tmp_path / "one")
    spark.range(100).write.parquet(src)
    n = compact_small_files(spark, src, dst, target_bytes=1 << 30)
    assert n == 1
    assert len(_data_files(dst)) == 1
