"""Unit pins for the CDC changelog-compaction operator (oracle parity
for the registered cdc_apply_changelog query lives in
tests/test_oracle_parity.py)."""

from __future__ import annotations

from minoan_athenaeum_spark.operators.merge import apply_changelog


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seq long, op string, val string"
    )


def _snapshot(spark, rows, **kw):
    df = apply_changelog(
        _log(spark, rows), key="k", seq="seq", op="op", payload_cols=["val"], **kw
    )
    return {r.k: (r.val, r.versions) for r in df.collect()}


def test_last_writer_wins_and_delete(spark):
    rows = [
        (1, 1, "I", "a"), (1, 2, "U", "b"),          # update wins
        (2, 1, "I", "x"), (2, 2, "D", None),          # deleted
        (3, 1, "I", "only"),                          # untouched insert
    ]
    snap = _snapshot(spark, rows)
    assert snap == {1: ("b", 2), 3: ("only", 1)}


def test_reinsert_after_delete(spark):
    rows = [(7, 1, "I", "v1"), (7, 2, "D", None), (7, 3, "I", "v2")]
    assert _snapshot(spark, rows) == {7: ("v2", 3)}


def test_out_of_order_arrival_is_irrelevant(spark):
    # The log arrives in arbitrary order and partitioning; only seq
    # decides the winner.
    rows = [(5, 3, "U", "final"), (5, 1, "I", "first"), (5, 2, "U", "mid")]
    assert _snapshot(spark, rows) == {5: ("final", 3)}
    import random

    shuffled = rows[:]
    random.Random(3).shuffle(shuffled)
    df = _log(spark, shuffled).repartition(7)
    out = apply_changelog(df, key="k", seq="seq", op="op", payload_cols=["val"])
    assert {r.k: r.val for r in out.collect()} == {5: "final"}
