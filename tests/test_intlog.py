"""Fixed-point integer log2 (operators/intlog.py) and the log-domain
CCNet perplexity bucketing built on it.

The operator's claim is threefold: (1) the quantized log is CLOSE to
the real log2 (within 2^-24 + normalization truncation), (2) all three
implementations (Python ints, Spark codegen columns, generated DuckDB
CTE chain) are BIT-IDENTICAL, and (3) the tercile assignment that
text_ccnet_ppl_buckets_log derives from it matches an independent
float-domain NumPy implementation of CCNet bucketing on a pinned
corpus (i.e. the quantization never reorders real documents).
"""

from __future__ import annotations

import math
import random

import pytest

from minoan_athenaeum_spark.operators.intlog import (
    log2_fixed_int,
    log2_lookup_cte,
    with_log2_fixed,
)

EDGE = [1, 2, 3, 4, 5, 7, 15, 16, 17, (1 << 31) - 1, 1 << 31, (1 << 62) + 12345]


def test_python_reference_accuracy():
    rng = random.Random(7)
    xs = EDGE + [rng.randrange(1, 1 << 62) for _ in range(5000)]
    for x in xs:
        err = abs(log2_fixed_int(x) / (1 << 24) - math.log2(x))
        # 2^-24 quantization + <= ~25*2^-30 truncation during squaring
        assert err < 1e-6, (x, err)
    assert log2_fixed_int(1) == 0
    assert log2_fixed_int(2) == 1 << 24
    assert log2_fixed_int(1 << 40) == 40 << 24
    with pytest.raises(ValueError):
        log2_fixed_int(0)


def test_python_reference_monotone():
    # strictly monotone on small x (each unit step exceeds the quantum
    # up to x ~ 2^24/ln2); non-decreasing beyond
    prev = -1
    for x in range(1, 4000):
        cur = log2_fixed_int(x)
        assert cur > prev
        prev = cur


def test_spark_matches_python(spark):
    rng = random.Random(13)
    xs = EDGE + [rng.randrange(1, 1 << 62) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in xs], "x long")
    got = {r.x: r.lg for r in with_log2_fixed(df, "x", "lg").collect()}
    assert all(got[x] == log2_fixed_int(x) for x in xs)


def test_pandas_udf_matches_python(spark):
    """The Arrow-vectorized numpy twin (r12, used by the dsir fit) is
    bit-identical to the pure-Python reference across the int64 domain,
    and fails loudly below the x >= 1 domain like the other forms."""
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.operators.intlog import log2_fixed_pandas

    rng = random.Random(29)
    xs = EDGE + [rng.randrange(1, 1 << 62) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in xs], "x long")
    L = log2_fixed_pandas()
    got = {r.x: r.lg for r in df.select("x", L(F.col("x")).alias("lg")).collect()}
    assert all(got[x] == log2_fixed_int(x) for x in xs)
    bad = spark.createDataFrame([(0,)], "x long")
    with pytest.raises(Exception, match="log2_fixed domain"):
        bad.select(L(F.col("x"))).collect()


def test_duckdb_cte_matches_python():
    import duckdb

    rng = random.Random(29)
    xs = EDGE + [rng.randrange(1, 1 << 62) for _ in range(500)]
    con = duckdb.connect()
    con.execute("CREATE TABLE v(x BIGINT)")
    con.executemany("INSERT INTO v VALUES (?)", [(v,) for v in xs])
    sql = (
        "WITH vals AS (SELECT x FROM v),\n    "
        + log2_lookup_cte("vals", "lgtab")
        + "\nSELECT x, lg FROM lgtab"
    )
    got = dict(con.execute(sql).fetchall())
    assert all(got[x] == log2_fixed_int(x) for x in xs)


def _numpy_ccnet_buckets(rows: list[tuple[int, str, str]]) -> dict[int, str]:
    """Independent float-domain CCNet bucketing: add-one bigram LM on
    the lang='en' slice, score = mean log((c_bg+1)/(c_ctx+V)), terciles
    of rank order (desc score, doc_id tiebreak). Pure Python/float —
    shares NO code with the engine path."""
    tok = {d: t.lower().strip().split() for d, t, _ in rows}
    ref = [tok[d] for d, _, lang in rows if lang == "en"]
    cbg: dict[tuple[str, str], int] = {}
    vocab = set()
    for tk in ref:
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            cbg[(a, b)] = cbg.get((a, b), 0) + 1
    cctx: dict[str, int] = {}
    for (a, _), c in cbg.items():
        cctx[a] = cctx.get(a, 0) + c
    v = len(vocab)
    scores = {}
    for d, _, _ in rows:
        tk = tok[d]
        if len(tk) < 2:
            continue
        s = 0.0
        for a, b in zip(tk, tk[1:]):
            s += math.log2((cbg.get((a, b), 0) + 1) / (cctx.get(a, 0) + v))
        scores[d] = s / (len(tk) - 1)
    order = sorted(scores, key=lambda d: (-scores[d], d))
    n = len(order)
    out = {}
    for i, d in enumerate(order):
        out[d] = "head" if i * 3 < n else ("middle" if i * 3 < 2 * n else "tail")
    return out


def test_ccnet_log_buckets_match_numpy_reference(spark, tmp_path):
    """Pinned-corpus fidelity: the engine's quantized-integer-log
    terciles equal an independent float NumPy/Python implementation —
    i.e. Q24 quantization does not reorder documents across tercile
    boundaries on a realistic mixed corpus."""
    from minoan_athenaeum_spark.queries.text import text_ccnet_ppl_buckets_log

    rng = random.Random(101)
    common = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast", "a", "big"]
    rare = ["zyx", "qqv", "wkj", "vrb", "xxo", "jjq"]
    rows = []
    for d in range(120):
        if d % 3 == 0:  # fluent: common-word chains (reference-like)
            words = [rng.choice(common) for _ in range(rng.randrange(8, 30))]
        elif d % 3 == 1:  # mixed
            words = [
                rng.choice(common if rng.random() < 0.6 else rare)
                for _ in range(rng.randrange(8, 30))
            ]
        else:  # disfluent: mostly rare transitions
            words = [rng.choice(rare) for _ in range(rng.randrange(8, 30))]
        lang = "en" if d % 2 == 0 else "xx"
        rows.append((d, " ".join(words), lang))
    spark.createDataFrame(
        [(d, txt, lang, "web") for d, txt, lang in rows],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = {
        r.doc_id: r.bucket
        for r in text_ccnet_ppl_buckets_log(spark, str(tmp_path)).collect()
    }
    want = _numpy_ccnet_buckets(rows)
    assert got == want


def test_bm25_robertson_rank_matches_float_ln(spark, sf_dir):
    """Rank-faithfulness pin: the quantized-log2 Robertson BM25 ranks
    documents identically to a pure-float math.log (ln) implementation
    — log2 vs ln is a constant factor across the per-term sum, and Q24
    quantization is far below the score gaps."""
    import math

    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.catalog import load_table
    from minoan_athenaeum_spark.queries.text import (
        _BM25_TERMS,
        text_bm25_search_robertson,
    )

    k1, b = 1.2, 0.75
    docs = {
        r.doc_id: r.text.lower().strip().split()
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in _BM25_TERMS
    }
    scores = {}
    for d, toks in docs.items():
        s = 0.0
        for t in _BM25_TERMS:
            tf = toks.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            scores[d] = s
    want = sorted(scores, key=lambda d: (-scores[d], d))[:20]
    got = [r.doc_id for r in text_bm25_search_robertson(spark, sf_dir).collect()]
    assert got == want


def test_kneser_ney_matches_float_reference(spark, tmp_path):
    """Fidelity pin for the quantized-integer KN scorer: per-doc mean
    log2 probability within 1e-5 of an independent float Kneser-Ney
    implementation (same D=0.75, same backoff), and identical
    per-doc ORDERING on a pinned mixed corpus."""
    from minoan_athenaeum_spark.queries.text import text_kneser_ney_ppl

    rng = random.Random(77)
    common = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast", "a", "big"]
    rare = ["zyx", "qqv", "wkj", "vrb", "xxo", "jjq"]
    rows = []
    for d in range(90):
        pool = common if d % 3 == 0 else (common + rare if d % 3 == 1 else rare)
        words = [rng.choice(pool) for _ in range(rng.randrange(8, 25))]
        rows.append((d, " ".join(words), "en" if d % 2 == 0 else "xx"))
    spark.createDataFrame(
        [(d, txt, lang, "web") for d, txt, lang in rows],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    # independent float KN
    tok = {d: t.split() for d, t, _ in rows}
    cbg: dict[tuple[str, str], int] = {}
    for d, _, lang in rows:
        if lang != "en":
            continue
        tk = tok[d]
        for a, b in zip(tk, tk[1:]):
            cbg[(a, b)] = cbg.get((a, b), 0) + 1
    cctx: dict[str, int] = {}
    n1w1: dict[str, int] = {}
    n1w2: dict[str, int] = {}
    for (a, b), c in cbg.items():
        cctx[a] = cctx.get(a, 0) + c
        n1w1[a] = n1w1.get(a, 0) + 1
        n1w2[b] = n1w2.get(b, 0) + 1
    n1tot = len(cbg)
    D = 0.75
    want = {}
    for d, _, _ in rows:
        tk = tok[d]
        s, n = 0.0, 0
        for a, b in zip(tk, tk[1:]):
            pc = n1w2.get(b, 0) / n1tot
            if a in cctx:
                p = max(cbg.get((a, b), 0) - D, 0.0) / cctx[a] + (
                    D * n1w1[a] / cctx[a]
                ) * pc
            else:
                p = pc
            p = max(p, 2.0 ** -40)  # the engine's floor(p*2^40)+1 clamp
            s += math.log2(p)
            n += 1
        if n:
            want[d] = s / n

    got = {
        r.doc_id: (r.lg_sum / (1 << 24)) / r.n_bg
        for r in text_kneser_ney_ppl(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-5, (d, got[d], want[d])
    rank_got = sorted(got, key=lambda d: (-got[d], d))
    rank_want = sorted(want, key=lambda d: (-want[d], d))
    assert rank_got == rank_want


def test_intlog_property_accuracy_and_order():
    """Hypothesis sweep over the full int64 domain: quantized log2
    stays within 1e-6 of math.log2 and preserves <= ordering (the
    operator contract the bucketing/ranking queries rely on)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.integers(min_value=1, max_value=(1 << 63) - 1),
        st.integers(min_value=1, max_value=(1 << 63) - 1),
    )
    @settings(max_examples=1500, deadline=None)
    def check(a: int, b: int):
        la, lb = log2_fixed_int(a), log2_fixed_int(b)
        assert abs(la / (1 << 24) - math.log2(a)) < 1e-6
        if a <= b:
            assert la <= lb
        else:
            assert la >= lb

    check()
