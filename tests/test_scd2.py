"""SCD2 operator pins: all four row paths plus sequential batches
(history accumulation) against a hand-computed reference."""

from __future__ import annotations

import pytest


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_scd2_two_batches(spark):
    from minoan_athenaeum_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [
            (1, "A", "t0", None),
            (2, "B", "t0", None),
            (3, "C", "t0", None),
        ],
        "k long, attr string, valid_from string, valid_to string",
    )
    # Batch 1: change k=1, no-op k=2, insert k=9.
    u1 = spark.createDataFrame(
        [(1, "A2"), (2, "B"), (9, "NEW")], "k long, attr string"
    )
    d1 = scd2_apply(dim, u1, "k", ["attr"], "t1")
    assert rows(d1) == {
        (1, "A", "t0", "t1"),
        (1, "A2", "t1", None),
        (2, "B", "t0", None),
        (3, "C", "t0", None),
        (9, "NEW", "t1", None),
    }
    # Batch 2 on the result: change k=1 again and k=9; k=3 untouched.
    u2 = spark.createDataFrame([(1, "A3"), (9, "NEW2")], "k long, attr string")
    d2 = scd2_apply(d1, u2, "k", ["attr"], "t2")
    assert rows(d2) == {
        (1, "A", "t0", "t1"),
        (1, "A2", "t1", "t2"),
        (1, "A3", "t2", None),
        (2, "B", "t0", None),
        (3, "C", "t0", None),
        (9, "NEW", "t1", "t2"),
        (9, "NEW2", "t2", None),
    }


def test_scd2_null_attr_transitions(spark):
    # NULL attr values must compare null-safely: NULL -> value and
    # value -> NULL are CHANGES; NULL -> NULL is a no-op.
    from minoan_athenaeum_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, None, "t0", None), (2, "X", "t0", None), (3, None, "t0", None)],
        "k long, attr string, valid_from string, valid_to string",
    )
    u = spark.createDataFrame([(1, "V"), (2, None), (3, None)], "k long, attr string")
    got = rows(scd2_apply(dim, u, "k", ["attr"], "t1"))
    assert got == {
        (1, None, "t0", "t1"),
        (1, "V", "t1", None),
        (2, "X", "t0", "t1"),
        (2, None, "t1", None),
        (3, None, "t0", None),
    }


def test_scd2_duplicate_update_keys_rejected(spark):
    from minoan_athenaeum_spark.operators.scd import scd2_apply

    dim = spark.createDataFrame(
        [(1, "A", "t0", None)],
        "k long, attr string, valid_from string, valid_to string",
    )
    u = spark.createDataFrame([(1, "X"), (1, "Y")], "k long, attr string")
    with pytest.raises(ValueError, match="multiple rows"):
        scd2_apply(dim, u, "k", ["attr"], "t1").collect()
