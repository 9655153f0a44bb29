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


def _brute_lcp(corpus: str) -> dict[int, tuple[int, int]]:
    order = sorted(range(len(corpus)), key=lambda i: corpus[i:])
    out = {}
    for r in range(1, len(order)):
        a, b = corpus[order[r - 1]:], corpus[order[r]:]
        l = 0
        while l < min(len(a), len(b)) and a[l] == b[l]:
            l += 1
        out[r] = (order[r], l)
    return out


def _spark_lcp(spark, texts: list[str]) -> dict[int, tuple[int, int]]:
    from minoan_athenaeum_spark.operators.suffixarray import (
        lcp_adjacent,
        suffix_array_tables,
    )

    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id bigint, txt string"
    )
    chars = corpus_positions(docs)
    n = chars.count()
    _ranks, tables = suffix_array_tables(chars, n)
    return {r.rank: (r.pos, r.lcp) for r in lcp_adjacent(tables).collect()}


def test_lcp_matches_brute_force_random(spark):
    rng = random.Random(13)
    s = "".join(rng.choice("ab c") for _ in range(150))
    assert _spark_lcp(spark, [s]) == _brute_lcp(s + "|")


def test_lcp_deep_repeats(spark):
    # Duplicate documents force LCPs spanning whole documents — the
    # deep-lifting path (multiple accepted windows per pair).
    texts = ["the quick brown fox jumps", "the quick brown fox jumps", "xyz"]
    corpus = "".join(t + "|" for t in texts)
    assert _spark_lcp(spark, texts) == _brute_lcp(corpus)


def test_lcp_all_same_char(spark):
    s = "a" * 40
    assert _spark_lcp(spark, [s]) == _brute_lcp(s + "|")
