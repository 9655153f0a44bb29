"""Pins for operators/heavyhitters.py — the Misra-Gries superset
guarantee and determinism of the sketch-then-verify plan under
adversarial partitionings."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.heavyhitters import (
    _mg_reduce,
    heavy_hitters,
    misra_gries_candidates,
)


def _zipf_stream(n=20_000, seed=3):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            out.append("alpha")
        elif r < 0.45:
            out.append("beta")
        elif r < 0.53:
            out.append("gamma")
        else:
            out.append(f"tail{rng.randint(0, 5000)}")
    return out


def _expected(stream, k):
    n = len(stream)
    return {
        (key, cnt) for key, cnt in Counter(stream).items() if cnt * k > n
    }


def test_exact_result_matches_brute_force(spark):
    stream = _zipf_stream()
    df = spark.createDataFrame([(s,) for s in stream], "key string")
    got = {(r.key, r.cnt) for r in heavy_hitters(df, "key", 10).collect()}
    assert got == _expected(stream, 10)


def test_deterministic_under_adversarial_partitionings(spark):
    # Sorted partitioning concentrates each hot key in few partitions;
    # hash partitioning spreads it; both must give the identical exact
    # answer.
    stream = sorted(_zipf_stream(seed=9))
    df = spark.createDataFrame([(s,) for s in stream], "key string")
    expect = _expected(stream, 12)
    for arranged in (
        df.repartition(13),
        df.repartitionByRange(7, "key"),
        df.coalesce(1),
    ):
        got = {(r.key, r.cnt) for r in heavy_hitters(arranged, "key", 12).collect()}
        assert got == expect


def test_candidates_are_superset_of_heavy_keys(spark):
    stream = _zipf_stream(seed=21)
    df = spark.createDataFrame([(s,) for s in stream], "key string").repartition(11)
    k = 15
    cands = {r.key for r in misra_gries_candidates(df, "key", k).collect()}
    n = len(stream)
    must_have = {
        key for key, cnt in Counter(stream).items() if cnt * (k + 1) > n
    }
    assert must_have <= cands


def test_mg_reduce_preserves_guarantee():
    # Reference per-item MG vs the weighted reduction on random batches:
    # undercounts never exceed total/(k+1) for surviving keys.
    rng = random.Random(5)
    stream = [rng.choice("abcdefghij") for _ in range(5000)] + ["hot"] * 1500
    rng.shuffle(stream)
    k = 4
    counters: dict = {}
    # batch in chunks of 100 via the weighted reduction
    for i in range(0, len(stream), 100):
        batch = Counter(stream[i : i + 100])
        for key, c in batch.items():
            counters[key] = counters.get(key, 0) + c
        counters = _mg_reduce(counters, k)
    n = len(stream)
    true = Counter(stream)
    # the guarantee: any key with freq > n/(k+1) survives
    for key, cnt in true.items():
        if cnt * (k + 1) > n:
            assert key in counters
    # and stored counts never exceed true counts
    for key, cnt in counters.items():
        assert cnt <= true[key]
