"""Pins for operators/suffixarray.py — distributed prefix doubling vs a
brute-force Python suffix sort, including the adversarial highly
repetitive corpora that force the full ceil(log2 n) doubling rounds
(random text resolves ranks after 2-3 rounds; 'aaaa…' cannot)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.suffixarray import (
    corpus_positions,
    global_dense_rank,
    suffix_array,
)


def _brute_ranks(corpus: str) -> dict[int, int]:
    order = sorted(range(len(corpus)), key=lambda i: corpus[i:])
    return {pos: rank for rank, pos in enumerate(order)}


def _spark_ranks(spark, texts: list[str], sep="|") -> dict[int, int]:
    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id bigint, txt string"
    )
    chars = corpus_positions(docs, sep=sep)
    n = chars.count()
    sa = suffix_array(chars, n)
    return {r.pos: r.rank for r in sa.collect()}


def test_single_doc_random_ascii(spark):
    rng = random.Random(7)
    s = "".join(rng.choice("abcd e") for _ in range(200))
    assert _spark_ranks(spark, [s]) == _brute_ranks(s + "|")


def test_multi_doc_corpus_matches_concatenation(spark):
    texts = ["the cat sat", "on the mat", "the cat sat on"]
    corpus = "".join(t + "|" for t in texts)
    assert _spark_ranks(spark, texts) == _brute_ranks(corpus)


def test_adversarial_all_same_char(spark):
    # 'aaaa…a' — every doubling round is needed; ranks stay tied until
    # the window reaches the string length.
    s = "a" * 97
    assert _spark_ranks(spark, [s]) == _brute_ranks(s + "|")


def test_adversarial_fibonacci_word(spark):
    # Fibonacci words maximize repetition structure (worst cases for
    # naive suffix sorting).
    a, b = "a", "ab"
    while len(b) < 150:
        a, b = b, b + a
    assert _spark_ranks(spark, [b]) == _brute_ranks(b + "|")


def test_global_dense_rank_matches_local(spark):
    rng = random.Random(11)
    rows = [(i, rng.randint(0, 9), rng.randint(0, 9)) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, x int, y int")
    got = {
        (r.x, r.y): r.rank
        for r in global_dense_rank(df, ["x", "y"], "rank").collect()
    }
    keys = sorted({(x, y) for _, x, y in rows})
    expect = {k: i for i, k in enumerate(keys)}
    assert got == expect


def test_rank_is_permutation(spark):
    s = "mississippi banana mississippi"
    ranks = _spark_ranks(spark, [s])
    n = len(s) + 1
    assert sorted(ranks.keys()) == list(range(n))
    assert sorted(ranks.values()) == list(range(n))
