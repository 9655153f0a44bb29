"""Pins for the transformWithStateInPandas timer-based sessionizer.

EXECUTION BOUNDARY: running transformWithStateInPandas requires the
`google.protobuf` package (the tWS driver worker speaks protobuf to
the JVM; see StateMessage_pb2), which this container does not ship.
The full streaming execution test therefore auto-skips when protobuf
is absent, and the processor's sessionization logic — the part we
own — is pinned directly against a brute-force reference through a
fake ListState.  On an environment with protobuf installed the
execution test runs as-is (RocksDB state store is configured inline).
"""

from __future__ import annotations

import importlib.util

import pytest

from minoan_athenaeum_spark.streaming.stateful import SessionTimerProcessor

try:
    HAVE_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # no `google` namespace package at all
    HAVE_PROTOBUF = False

MIN_US = 60 * 1_000_000


class _FakeListState:
    def __init__(self):
        self.rows: list[tuple] = []

    def get(self):
        return iter(self.rows)

    def put(self, new):
        self.rows = list(new)


def _proc_with_state(gap_s=1800, preloaded=()):
    p = SessionTimerProcessor(gap_s)
    p.sessions = _FakeListState()
    p.sessions.put(list(preloaded))
    return p


def _brute_sessions(times_us, gap_us):
    out = []
    for t in sorted(times_us):
        if out and t < out[-1][1] + gap_us:
            s, l, n = out[-1]
            out[-1] = (s, max(l, t), n + 1)
        else:
            out.append((t, t, 1))
    return out


def test_merge_fresh_events_matches_bruteforce():
    p = _proc_with_state()
    times = [m * MIN_US for m in (0, 10, 60, 70, 200)]
    assert p._merged(times) == _brute_sessions(times, p.gap_us)


def test_event_at_exact_gap_boundary_opens_new_session():
    # session_window rule: [start, last + gap) — an event AT last+gap
    # belongs to a NEW session.
    p = _proc_with_state(gap_s=60)
    exact = [0, 60 * 1_000_000]  # second event exactly at gap
    assert len(p._merged(exact)) == 2
    inside = [0, 60 * 1_000_000 - 1]
    assert len(p._merged(inside)) == 1


def test_bridging_event_fuses_stored_sessions():
    # Two stored sessions 30 min apart; a new event in the middle of
    # the gap bridges them into one (counts add).
    gap_s = 1800
    s1 = (0, 5 * MIN_US, 3)
    s2 = (40 * MIN_US, 45 * MIN_US, 2)
    p = _proc_with_state(gap_s, [s1, s2])
    merged = p._merged([22 * MIN_US])
    assert merged == [(0, 45 * MIN_US, 6)]


def test_out_of_order_batch_equivalence():
    # Feeding events across two "batches" in any split must equal the
    # single-batch sessionization (the in-watermark robustness claim).
    import random

    rng = random.Random(5)
    times = sorted(rng.sample(range(0, 500), 40))
    times_us = [t * MIN_US // 10 for t in times]
    whole = _proc_with_state()._merged(times_us)
    for _ in range(5):
        shuffled = times_us[:]
        rng.shuffle(shuffled)
        cut = rng.randrange(1, len(shuffled))
        p = _proc_with_state()
        p.sessions.put(p._merged(shuffled[:cut]))
        assert p._merged(shuffled[cut:]) == whole


@pytest.mark.skipif(not HAVE_PROTOBUF, reason="google.protobuf not in container")
def test_tws_execution_end_to_end(spark, tmp_path):
    from datetime import datetime, timedelta

    from minoan_athenaeum_spark.streaming.stateful import (
        session_summaries_with_timers,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    base = datetime(2024, 1, 1)
    rows = [(1, base + timedelta(minutes=m), 1.0) for m in (0, 10, 60, 70, 200)]
    rows += [(2, base + timedelta(minutes=m), 1.0) for m in (0, 5)]
    rows.append((3, base + timedelta(minutes=300), 1.0))
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = session_summaries_with_timers(stream, gap_s=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("tws_exec_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.sql("select * from tws_exec_test").collect())
    us = lambda m: int((base + timedelta(minutes=m)).timestamp() * 1e6)  # noqa: E731
    # closed sessions (gap 30 min, final watermark at minute 300):
    assert got == sorted(
        [(1, us(0), 2), (1, us(60), 2), (1, us(200), 1), (2, us(0), 2)]
    )
