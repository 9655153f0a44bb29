"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running totals with arbitrary user-defined state — the pattern
for operators Structured Streaming's built-ins can't express (custom
session logic, decaying counters, fraud scores). State is partitioned
by the grouping key across executors and checkpointed by the engine;
Arrow batches keep the Python boundary cheap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id LONG, batch_events LONG, total_events LONG, total_value DOUBLE"
)
STATE_SCHEMA = "total_events LONG, total_value DOUBLE"


def user_running_totals(events: DataFrame) -> DataFrame:
    """Emit one row per (user, microbatch) carrying running totals held
    in GroupState. Output mode: update."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = 0
        v = 0.0
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        te, tv = state.get if state.exists else (0, 0.0)
        te += n
        tv += v
        state.update((te, tv))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "batch_events": [n],
                "total_events": [te],
                "total_value": [tv],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, OUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
