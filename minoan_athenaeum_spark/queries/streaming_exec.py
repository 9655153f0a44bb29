"""Streaming queries surfaced through the driver contract.

These actually execute Structured Streaming (file source → availableNow
→ memory sink) and return the materialized result, sharing the SAME
DuckDB oracle as their batch twins — so the driver's value-hash gate
covers the streaming engine, not just batch.
"""

from __future__ import annotations

import itertools

from minoan_athenaeum_spark.registry import query
from minoan_athenaeum_spark.streaming.ops import (
    read_events_stream,
    run_to_memory,
    tumbling_counts,
)

_counter = itertools.count()

_TUMBLING_ORACLE = """
    SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS wstart,
           event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
"""


@query("stream_tumbling_exec", oracle=_TUMBLING_ORACLE, tags=("streaming", "exec"))
def stream_tumbling_exec(spark, sf_dir):
    """Watermarked tumbling-window aggregation EXECUTED AS A STREAM
    (availableNow drain), checked against the same DuckDB oracle as the
    batch twin evt_tumbling_window — proving batch/stream result parity
    through the driver's own gate."""
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    name = f"q_stream_tumbling_{next(_counter)}"
    return run_to_memory(stream, name, mode="complete")
