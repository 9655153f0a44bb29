"""Pins for operators/fuzzy.py — FastSS candidate completeness and
exactness vs brute-force levenshtein on adversarial name sets."""

from __future__ import annotations

import random

from minoan_athenaeum_spark.operators.fuzzy import fuzzy_self_join_dist1


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(names: dict[int, str]):
    out = set()
    ids = sorted(names)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _levenshtein(names[a], names[b])
            if d <= 1:
                out.add((a, b, d))
    return out


def _spark_pairs(spark, names: dict[int, str]):
    df = spark.createDataFrame(
        [(k, v) for k, v in names.items()], "id bigint, name string"
    )
    return {
        (r.a, r.b, r.dist)
        for r in fuzzy_self_join_dist1(df, "id", "name").collect()
    }


def test_substitution_insertion_deletion_equality(spark):
    names = {
        1: "smith",
        2: "smyth",   # substitution
        3: "smiths",  # insertion
        4: "mith",    # deletion
        5: "smith",   # exact duplicate
        6: "jones",   # unrelated
        7: "",        # empty string edge
        8: "s",       # len-1; dist 1 from ""
    }
    assert _spark_pairs(spark, names) == _brute(names)


def test_random_corpus_matches_brute_force(spark):
    rng = random.Random(17)
    names = {}
    base = ["walker", "turner", "harris", "cooper"]
    for i in range(120):
        s = list(rng.choice(base))
        op = rng.randrange(4)
        p = rng.randrange(len(s))
        if op == 0:
            s[p] = rng.choice("abcdefg")
        elif op == 1:
            s.insert(p, rng.choice("abcdefg"))
        elif op == 2:
            del s[p]
        names[i] = "".join(s)
    assert _spark_pairs(spark, names) == _brute(names)


def test_no_false_positives_beyond_dist1(spark):
    names = {1: "abcdef", 2: "abQRef", 3: "xyz"}
    # 1 vs 2 is distance 2 (two substitutions) — must NOT appear
    assert _spark_pairs(spark, names) == set()
