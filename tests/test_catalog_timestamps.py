"""Pins for catalog timestamp handling: the three parquet physical
encodings an events table can arrive in — INT64 µs (our writes), INT64
ns (the driver testdata), and legacy INT96 (Hive-era writers, and
Spark's own default before the session factory pinned
outputTimestampType) — must all load to identical rows."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import (
    _EVENTS_TS_UNIT_CACHE,
    events_ts_unit,
    load_table,
)


def _checksum(df):
    return df.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(event_id, unix_micros(ts))) AS x"),
    ).first()


def test_int96_events_copy_loads_identically(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "events")
    want = _checksum(src)

    int96_dir = str(tmp_path / "ev96")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        src.write.mode("overwrite").parquet(f"{int96_dir}/events.parquet")
    finally:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )

    assert events_ts_unit(int96_dir) == "int96"
    got = _checksum(load_table(spark, int96_dir, "events"))
    assert (got.n, got.x) == (want.n, want.x)
    _EVENTS_TS_UNIT_CACHE.pop(int96_dir, None)
    shutil.rmtree(int96_dir, ignore_errors=True)


def test_session_writes_int64_micros(spark, sf_dir, tmp_path):
    import glob

    import pyarrow.parquet as pq

    out = str(tmp_path / "ev64")
    load_table(spark, sf_dir, "events").limit(100).write.parquet(out)
    part = glob.glob(f"{out}/*.parquet")[0]
    sch = pq.ParquetFile(part).schema
    idx = next(i for i in range(len(sch)) if sch.column(i).name == "ts")
    assert sch.column(idx).physical_type == "INT64"
