"""Pins for dirty-bucket incremental rollup refresh: correctness of
recomputed buckets AND proof that clean buckets are served from the
existing rollup (not silently recomputed)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.rollup_store import (
    aggregate_at_grain,
    refresh_dirty_buckets,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(t, datetime(2024, 1, d, h, 0, 0), u, float(v)) for t, d, h, u, v in rows],
        "event_type string, ts timestamp, user_id long, value double",
    )


BASE = [
    ("a", 1, 0, 10, 1.0),
    ("a", 1, 0, 11, 2.0),  # bucket H0: 2 events, 2 users
    ("a", 1, 1, 10, 3.0),  # bucket H1: 1 event
    ("b", 1, 0, 20, 5.0),  # other type
]
LATE = [
    ("a", 1, 1, 12, 7.0),  # lands in existing bucket H1 → dirty
    ("a", 1, 2, 10, 9.0),  # new bucket H2 → dirty
]


def test_dirty_buckets_recomputed_exactly(spark):
    base = _events(spark, BASE)
    late = _events(spark, LATE)
    all_ev = base.unionAll(late)
    merged = refresh_dirty_buckets(aggregate_at_grain(base, 3600), all_ev, late, 3600)
    full = aggregate_at_grain(all_ev, 3600)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_clean_buckets_not_recomputed(spark):
    # Poison a CLEAN bucket in the existing rollup; the sentinel must
    # survive the refresh — proving the refresh never touches clean
    # buckets (the whole point of incrementality).
    base = _events(spark, BASE)
    late = _events(spark, LATE)
    all_ev = base.unionAll(late)
    poisoned = aggregate_at_grain(base, 3600).withColumn(
        "cnt",
        F.when(
            (F.col("event_type") == "b"), F.lit(999)
        ).otherwise(F.col("cnt")),
    )
    merged = refresh_dirty_buckets(poisoned, all_ev, late, 3600)
    got = {(r.event_type, r.bucket): r.cnt for r in merged.collect()}
    b_bucket = [k for k in got if k[0] == "b"]
    assert len(b_bucket) == 1 and got[b_bucket[0]] == 999
    # while the dirty H1 bucket was corrected from raw:
    full = {(r.event_type, r.bucket): r.cnt
            for r in aggregate_at_grain(all_ev, 3600).collect()}
    dirty = [k for k in full if k[0] == "a" and full[k] == 2 and got[k] == 2]
    assert dirty  # H1 has 2 events after the late arrival


def test_empty_delta_is_noop(spark):
    base = _events(spark, BASE)
    existing = aggregate_at_grain(base, 3600)
    empty = base.limit(0)
    merged = refresh_dirty_buckets(existing, base, empty, 3600)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, existing.collect())
    )
