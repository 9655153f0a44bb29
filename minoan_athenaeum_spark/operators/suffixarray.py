"""Distributed suffix-array construction by prefix doubling.

The suffix array (the permutation that sorts all suffixes of a corpus)
underlies the strongest exact-dedup tooling — Lee et al.'s substring
dedup ships a suffix-array implementation precisely because it finds
ALL repeated substrings, not just fixed-L grams. A suffix automaton /
in-RAM sort does not survive 100 TB; prefix doubling
(Manber-Myers 1990) does, because every round is plain relational
algebra:

  round k:  rank_{2k}(p)  =  dense_rank( rank_k(p), rank_k(p+k) )

* ``rank_k(p+k)`` is a self-equi-join on position (one narrow shuffle
  of (pos, rank) longs); positions past the end rank as -1, which
  reproduces "a proper prefix sorts before its extensions" — exactly
  byte-wise string comparison.
* the dense_rank is the two-phase distributed ranking below — a range
  shuffle of the distinct pairs plus a broadcast of per-partition
  offsets; NO global single-partition window ever exists.
* ceil(log2 n) rounds total, with an O(1)-row early-exit probe per
  round (all ranks distinct <=> max rank == n-1).

Cross-engine determinism: ranks are integers, comparisons are integer
comparisons, and the initial ranks come from ASCII codes — so the
result is bit-identical to DuckDB's ``ORDER BY substr(corpus, pos)``
on the same (ASCII) corpus, which is what the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.scan import global_cumsum


def global_dense_rank(
    df: DataFrame,
    cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based dense rank of the tuple ``cols`` (all NON-NULL, ranked
    ascending) over the whole dataset, without a global window and —
    since r6 — without a corpus-wide distinct or join-back.

    Fused two-phase plan: range-partition the ROWS by the key tuple
    (pinned — see the global_cumsum comment in operators/scan.py for
    the branch-inconsistent-sampling hazard), then per partition mark
    each row that starts a new key group (lag flag) and running-sum the
    flags into a local dense rank. A key group can straddle a range
    boundary, so the tiny per-partition summary (group count, first
    and last key tuple) computes a straddle correction: partition p's
    first group is not new when it equals the previous partition's
    last tuple. Global rank = preceding partitions' first-seen group
    count + local dense − 1 − straddle. One corpus materialization +
    one window exchange + a broadcast join, vs the previous
    distinct + rank + corpus join-back (~5 corpus movements) — the
    suffix-array doubling loop calls this every round, so the fusion
    is the round cost."""
    kcols = [F.col(c) for c in cols]
    d = (
        df.repartitionByRange(num_partitions, *kcols)
        if num_partitions
        else df.repartitionByRange(*kcols)
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    key = F.struct(*kcols)
    w = Window.partitionBy("_pid").orderBy(*kcols)
    prev_key = F.lag(key).over(w)
    flagged = d.withColumn(
        "_new",
        F.when(prev_key.isNull() | (prev_key != key), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "_ldense",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # per-partition summaries (|partitions| rows): group count + first/
    # last key tuple; struct min/max is lexicographic, matching the
    # ascending sort order
    summ = flagged.groupBy("_pid").agg(
        F.sum("_new").alias("_gcnt"),
        F.min(key).alias("_first"),
        F.max(key).alias("_last"),
    )
    ws = Window.orderBy("_pid")
    offsets = (
        summ.withColumn(
            "_straddle",
            F.when(F.lag("_last").over(ws) == F.col("_first"), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "_off",
            F.coalesce(
                F.sum(F.col("_gcnt") - F.col("_straddle")).over(
                    ws.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_off", "_straddle")
    )
    return (
        flagged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            out_col,
            (F.col("_off") + F.col("_ldense") - 1 - F.col("_straddle")).cast(
                "bigint"
            ),
        )
        .drop("_pid", "_new", "_ldense", "_off", "_straddle")
    )


def corpus_positions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "txt",
    sep: str = "|",
) -> DataFrame:
    """Explode documents into one row per corpus character:
    (pos, code) with ``pos`` the GLOBAL 0-based position in the
    concatenation of (text || sep) in ``id_col`` order. Per-doc offsets
    come from the distributed two-phase prefix scan — no driver-side
    concatenation ever happens. ASCII corpora only (codes are
    codepoints; byte order == codepoint order only for ASCII)."""
    d = docs.select(
        F.col(id_col), F.concat(F.col(text_col), F.lit(sep)).alias("_s")
    ).withColumn("_len", F.length("_s").cast("bigint"))
    d = global_cumsum(d, id_col, "_len", "_cum")
    d = d.withColumn("_off", F.col("_cum") - F.col("_len"))
    return d.select(
        "_off", F.posexplode(F.split("_s", "")).alias("_i", "_ch")
    ).select(
        (F.col("_off") + F.col("_i")).alias("pos"),
        F.ascii("_ch").alias("code"),
    )


def suffix_array_tables(
    chars: DataFrame,
    n: int,
    pos_col: str = "pos",
    code_col: str = "code",
) -> tuple[DataFrame, list[tuple[int, DataFrame]]]:
    """Prefix doubling, returning the final ranks AND every
    intermediate rank table as (window, ranks) pairs — rank_w(p) ==
    rank_w(q) iff the suffixes at p and q share their first w
    characters. The tables are what LCP binary lifting consumes
    (:func:`lcp_adjacent`).

    Each round: one pos-equi-join + one distributed dense rank; rounds
    are capped at ceil(log2 n) and exit early once all ranks are
    distinct (the per-round probe is one scalar agg). localCheckpoint()
    cuts the iterative lineage each round (the standard guard for
    loop-built plans)."""
    ranks = global_dense_rank(
        chars.select(F.col(pos_col).alias("pos"), F.col(code_col).alias("code")),
        ["code"],
        "rank",
    ).select("pos", "rank")
    ranks = ranks.localCheckpoint()
    tables: list[tuple[int, DataFrame]] = [(1, ranks)]

    k = 1
    while k < n:
        if ranks.agg(F.max("rank")).first()[0] == n - 1:
            break
        shifted = ranks.select(
            (F.col("pos") - k).alias("pos"), F.col("rank").alias("rank2")
        )
        pairs = (
            ranks.join(shifted, "pos", "left")
            .withColumn("rank2", F.coalesce(F.col("rank2"), F.lit(-1)))
        )
        ranks = (
            global_dense_rank(pairs, ["rank", "rank2"], "nrank")
            .select("pos", F.col("nrank").alias("rank"))
            .localCheckpoint()
        )
        k *= 2
        tables.append((k, ranks))
    return ranks, tables


def suffix_array(
    chars: DataFrame,
    n: int,
    pos_col: str = "pos",
    code_col: str = "code",
) -> DataFrame:
    """Suffix ranks by prefix doubling: returns (pos, rank) where
    ``rank`` is the 0-based position of suffix ``pos`` in the sorted
    order of all n suffixes. ``chars`` is (pos, code) as produced by
    :func:`corpus_positions`; ``n`` is the corpus length (a scalar the
    caller already knows or counts once)."""
    ranks, _tables = suffix_array_tables(chars, n, pos_col, code_col)
    return ranks


def lcp_adjacent(
    tables: list[tuple[int, DataFrame]],
) -> DataFrame:
    """LCP array from the doubling rank tables, by BINARY LIFTING:
    for each rank-adjacent suffix pair (a, b), walk the windows from
    largest to smallest; whenever rank_w(a+acc) == rank_w(b+acc)
    (both present), the suffixes agree on w more characters — add w
    and advance. Correctness needs no level beyond the last doubling
    round: the early exit fires only when all ranks at window w are
    distinct, which bounds every adjacent LCP below w, and windows
    1..w can express any value below 2w.

    Each level is two hash joins of the (n-1)-row pair table against
    that level's rank table — O(log n) narrow joins, no sequential
    Kasai pass (which is inherently single-threaded and needs the
    whole text in RAM).

    Returns (rank, pos, lcp): the suffix at ``rank`` shares ``lcp``
    leading characters with the suffix at rank-1 (ranks 1..n-1)."""
    final = tables[-1][1]
    sa = final.select("rank", F.col("pos").alias("b"))
    prev = final.select(
        (F.col("rank") + 1).alias("rank"), F.col("pos").alias("a")
    )
    pairs = sa.join(prev, "rank").withColumn("acc", F.lit(0).cast("bigint"))

    for w, ranks in sorted(tables, key=lambda t: -t[0]):
        ra = ranks.select(
            F.col("pos").alias("_pa"), F.col("rank").alias("_ra")
        )
        rb = ranks.select(
            F.col("pos").alias("_pb"), F.col("rank").alias("_rb")
        )
        pairs = (
            pairs.join(ra, F.col("a") + F.col("acc") == F.col("_pa"), "left")
            .join(rb, F.col("b") + F.col("acc") == F.col("_pb"), "left")
            .withColumn(
                "acc",
                F.when(
                    F.col("_ra").isNotNull()
                    & F.col("_rb").isNotNull()
                    & (F.col("_ra") == F.col("_rb")),
                    F.col("acc") + w,
                ).otherwise(F.col("acc")),
            )
            .drop("_pa", "_ra", "_pb", "_rb")
            .localCheckpoint()
        )
    return pairs.select(
        "rank", F.col("b").alias("pos"), F.col("acc").alias("lcp")
    )


# ---------------------------------------------------------------------------
# Bounded per-shard suffix arrays — the 100 TB production form
# ---------------------------------------------------------------------------

def np_inverse_suffix_array(s: bytes):
    """Inverse suffix array (0-based dense suffix rank per position) of
    an ASCII byte string, by in-memory prefix doubling over numpy
    (lexsort + diff-flag dense ranking — the same Manber-Myers
    recurrence as the distributed path, collapsed into vectorized
    array ops). O(n log^2 n), pure integer comparisons, bit-identical
    to sorting the suffix strings (ASCII: byte order == char order)."""
    import numpy as np

    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
    # initial ranks: dense-rank the codes so the early-exit test is exact
    order = np.argsort(rank, kind="stable")
    flags = np.ones(n, dtype=np.int64)
    flags[1:] = np.diff(rank[order]) != 0
    dense = np.cumsum(flags) - 1
    out = np.empty(n, dtype=np.int64)
    out[order] = dense
    rank = out
    k = 1
    while rank.max() != n - 1:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        pair_r, pair_k = rank[order], key2[order]
        flags = np.ones(n, dtype=np.int64)
        flags[1:] = (np.diff(pair_r) != 0) | (np.diff(pair_k) != 0)
        dense = np.cumsum(flags) - 1
        out = np.empty(n, dtype=np.int64)
        out[order] = dense
        rank = out
        k *= 2
    return rank


def sharded_suffix_ranks(
    docs: DataFrame,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "txt",
    sep: str = "|",
) -> DataFrame:
    """(shard, pos, rank) — per-shard inverse suffix arrays, one
    INDEPENDENT bounded index per shard, built inside a single Arrow
    task each (applyInPandas → numpy prefix doubling).

    This is the scale posture for suffix-array indexing at 100 TB: the
    global prefix-doubling array (suffix_array above) is the one
    operator in the repo that shuffles the full corpus O(log n) times —
    correct, but days at 100 TB. Production substring tooling (Lee et
    al. 2022's deduplicate-text-datasets builds suffix arrays on
    bounded chunks and merges results) shards the corpus
    (domain/source/date) into BOUNDED pieces, builds each array
    locally, and unions the results: zero corpus-wide shuffles, one
    groupBy(shard) exchange, every shard an independent task. The
    shard-size ceiling is the task's memory (~int64 ranks: 16 bytes ×
    chars, so ~1 GB text per 16 GB task); enforce it with the layout,
    not the operator. Cross-shard duplicate detection remains
    dedup_substring_spans' fixed-L gram job — per-shard arrays answer
    within-shard substring/repetition queries exactly.

    Input contract (production corpora are messy, so both are handled
    here rather than assumed): null-text rows are DROPPED before the
    shard concatenation (a null contributes no suffixes), and text is
    encoded as UTF-8 — suffix order is therefore UTF-8 BYTE order,
    which equals Unicode code-point order (UTF-8 is order-preserving
    by construction) and matches DuckDB's binary string collation, so
    the oracle twin stays exact on non-ASCII corpora. Positions index
    BYTES of the concatenation, not characters; for ASCII the two
    coincide."""
    import pandas as pd

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = pdf[shard_col].iloc[0]
        pdf = pdf.sort_values(id_col)
        corpus = sep.join(pdf[text_col].tolist()) + sep
        ranks = np_inverse_suffix_array(corpus.encode("utf-8"))
        return pd.DataFrame(
            {
                "shard": shard,
                "pos": range(len(ranks)),
                "rank": ranks,
            }
        )

    return (
        docs.select(shard_col, id_col, text_col)
        .filter(F.col(text_col).isNotNull())
        .groupBy(shard_col)
        .applyInPandas(build, "shard string, pos long, rank long")
    )
