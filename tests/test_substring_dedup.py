"""Unit pins for operators/substring.py::duplicated_spans — hand-built
corpora with known duplicated runs (the oracle-gated query
``dedup_substring_spans`` covers the end-to-end path; these pin the
merge/edge semantics directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.substring import duplicated_spans


def _docs(spark, texts: dict[int, str]):
    rows = [(i, s.split(" ")) for i, s in texts.items()]
    return spark.createDataFrame(rows, "doc_id bigint, tk array<string>")


def _spans(spark, texts, length):
    df = duplicated_spans(_docs(spark, texts), length=length)
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in df.collect()
    )


def test_cross_doc_duplicate_found_and_maximal(spark):
    # Docs share tokens w3..w8 (6 tokens); L=4 → overlapping windows
    # must merge into ONE maximal span per doc.
    texts = {
        1: "a b w3 w4 w5 w6 w7 w8 c d",
        2: "x w3 w4 w5 w6 w7 w8 y z q",
    }
    assert _spans(spark, texts, 4) == [
        (1, 2, 7, 6),
        (2, 1, 6, 6),
    ]


def test_within_doc_repeat_counts(spark):
    # The same 4-run appears twice INSIDE one doc — both occurrences
    # are reported (Lee et al. semantics: any substring occurring >= 2
    # times anywhere).
    texts = {1: "p q r s x x p q r s y y z"}
    assert _spans(spark, texts, 4) == [(1, 0, 3, 4), (1, 6, 9, 4)]


def test_back_to_back_runs_merge(spark):
    # Two duplicated 3-runs that touch back-to-back (gap exactly L)
    # merge into one span.
    texts = {
        1: "a1 a2 a3 b1 b2 b3 zzz",
        2: "a1 a2 a3 b1 b2 b3 qqq",
    }
    assert _spans(spark, texts, 3) == [(1, 0, 5, 6), (2, 0, 5, 6)]


def test_disjoint_runs_stay_separate(spark):
    texts = {
        1: "a1 a2 a3 gap1 gap2 gap3 gap4 b1 b2 b3 t1",
        2: "a1 a2 a3 x1 x2 x3 x4 x5 b1 b2 b3 t2",
    }
    got = _spans(spark, texts, 3)
    assert got == [
        (1, 0, 2, 3),
        (1, 7, 9, 3),
        (2, 0, 2, 3),
        (2, 8, 10, 3),
    ]


def test_short_docs_and_no_duplicates(spark):
    texts = {1: "just two", 2: "a b c d e", 3: "f g h i j"}
    assert _spans(spark, texts, 4) == []


def test_span_md5_pins_content(spark):
    texts = {
        1: "u v shared1 shared2 shared3 shared4 w",
        2: "shared1 shared2 shared3 shared4 m n o",
    }
    df = duplicated_spans(_docs(spark, texts), length=4)
    rows = {r.doc_id: r.span_md5 for r in df.collect()}
    assert rows[1] == rows[2]
    import hashlib

    expect = hashlib.md5(b"shared1 shared2 shared3 shared4").hexdigest()
    assert rows[1] == expect
