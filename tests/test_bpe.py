"""Unit pins for the distributed BPE trainer against an independent
pure-Python reference implementation (Sennrich-style), including the
overlapping-run adversary where left==right (the oracle-parity run in
tests/test_oracle_parity.py covers the sf-data DuckDB twin)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.bpe import (
    apply_merge,
    best_pair,
    bpe_train_stats,
    initial_symbols,
    pair_counts,
)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE: dict words as symbol tuples, argmax pair with
    (count desc, left, right) tie-break, left-to-right non-overlap
    merge. Returns [(round, left, right, pair_count, corpus_tokens,
    vocab)]."""
    dict_ = {tuple(w): c for w, c in word_counts.items()}
    out = []
    for rnd in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for toks, c in dict_.items():
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += c
        (a, b), pc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        new_dict: dict[tuple, int] = {}
        for toks, c in dict_.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            new_dict[tuple(merged)] = new_dict.get(tuple(merged), 0) + c
        dict_ = new_dict
        corpus = sum(len(t) * c for t, c in dict_.items())
        vocab = len({s for t in dict_ for s in t})
        out.append((rnd, a, b, pc, corpus, vocab))
    return out


def _words_df(spark, wc: dict[str, int]):
    return spark.createDataFrame(list(wc.items()), "word string, cnt long")


def test_bpe_matches_reference_classic(spark):
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = [
        tuple(r)
        for r in bpe_train_stats(_words_df(spark, wc), 5)
        .orderBy("round")
        .collect()
    ]
    assert got == _ref_bpe(wc, 5)


def test_bpe_overlapping_runs_nonoverlap_semantics(spark):
    # 'aaaa' with best pair (a,a): left-to-right non-overlap gives
    # (aa)(aa), never (a)(aa)(a) or overlapped triples.
    wc = {"aaaa": 10, "aaa": 7, "ab": 1}
    d0 = initial_symbols(_words_df(spark, wc))
    best = best_pair(pair_counts(d0))
    row = best.collect()[0]
    # pairs: aaaa -> 3 adjacencies*10, aaa -> 2*7 => (a,a)=44
    assert (row.lft, row.rgt, row.pair_count) == ("a", "a", 44)
    merged = {
        tuple(r.toks): r.cnt for r in apply_merge(d0, best).collect()
    }
    assert merged[("aa", "aa")] == 10
    assert merged[("aa", "a")] == 7
    assert merged[("a", "b")] == 1
    # full train agrees with the reference on the adversary too
    got = [
        tuple(r)
        for r in bpe_train_stats(_words_df(spark, wc), 3)
        .orderBy("round")
        .collect()
    ]
    assert got == _ref_bpe(wc, 3)


def test_bpe_single_char_words_stable(spark):
    # single-symbol words ('c') contribute no pairs but stay in the
    # corpus/vocab statistics; two rounds exist: (a,b) then (ab,c)
    wc = {"ab": 4, "abc": 2, "c": 1}
    got = [
        tuple(r)
        for r in bpe_train_stats(_words_df(spark, wc), 2)
        .orderBy("round")
        .collect()
    ]
    assert got == _ref_bpe(wc, 2)
