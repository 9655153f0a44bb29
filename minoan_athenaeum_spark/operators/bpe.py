"""Distributed byte-pair-encoding (BPE) merge training — the
tokenizer-construction step of an LLM data pipeline (Sennrich et al.
2016), expressed Spark-first.

The classic algorithm trains on the WORD-FREQUENCY DICTIONARY, not the
raw corpus: the corpus collapses to (word, count) once (the only
corpus-sized shuffle), and every merge round after that touches only
the dictionary — vocabulary-sized (≤ a few million rows at 100 TB),
never corpus-sized. Each round is:

  1. pair counts:  explode each word's adjacent symbol pairs weighted
     by the word count, groupBy (left, right) — one dict-sized shuffle;
  2. best pair:    TakeOrdered(1) with the deterministic tie-break
     (count DESC, left, right) — never a global sort;
  3. merge apply:  broadcast the 1-row best pair into the dictionary
     and fold each word's symbol list left-to-right (the same
     non-overlapping scan the reference BPE does), entirely in JVM
     array expressions — map-only, no Python.

Nothing is ever collected to the driver: the learned merge table and
all statistics stay DataFrames, so the whole train is one declarative
plan an engine-portable DuckDB twin can replay (queries/text.py
text_bpe_train unrolls the same rounds as chained CTEs with
list_reduce folds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, cnt) dictionary: the ONE corpus-sized pass."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(word, cnt, ...) -> (toks: array<string> of characters, cnt, ...)
    — every non-toks column passes through (tokenization keeps the
    word column to produce the word -> tokens lookup)."""
    rest = [c for c in words.columns if c != "word"]
    return words.select(F.split("word", "").alias("toks"), "word", *rest)


def pair_counts(dict_df: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word count (dict-sized)."""
    idx = F.when(
        F.size("toks") > 1, F.sequence(F.lit(1), F.size("toks") - 1)
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    return (
        dict_df.select(F.explode(idx).alias("i"), "toks", "cnt")
        .select(
            F.element_at("toks", F.col("i")).alias("lft"),
            F.element_at("toks", F.col("i") + 1).alias("rgt"),
            "cnt",
        )
        .groupBy("lft", "rgt")
        .agg(F.sum("cnt").cast("long").alias("pair_count"))
    )


def best_pair(pairs: DataFrame) -> DataFrame:
    """Deterministic argmax pair (count DESC, left, right) — 1 row via
    TakeOrderedAndProject, not a global sort."""
    return pairs.orderBy(F.col("pair_count").desc(), "lft", "rgt").limit(1)


def _merge_fold(acc: Column, x: Column) -> Column:
    """Left-to-right non-overlapping merge of the broadcast (lft, rgt)
    pair: if the accumulator's last symbol is lft and the next symbol
    is rgt, replace the last symbol with lft||rgt; else append. A
    just-merged symbol can't re-merge (it is no longer equal to lft),
    which is exactly reference BPE's non-overlap scan semantics."""
    merged_last = F.concat(
        F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
        F.array(F.concat(F.col("lft"), F.col("rgt"))),
    )
    return F.when(
        (F.size(acc) > 0)
        & (F.element_at(acc, -1) == F.col("lft"))
        & (x == F.col("rgt")),
        merged_last,
    ).otherwise(F.concat(acc, F.array(x)))


def apply_merge(dict_df: DataFrame, best: DataFrame) -> DataFrame:
    """Broadcast the 1-row best pair and fold it through every word's
    symbol list (map-only JVM array expressions); non-toks columns
    pass through.

    Fails fast when ``best`` is empty (the corpus supports fewer merge
    rounds than requested): the crossJoin would otherwise silently
    empty the whole dictionary — silent data loss, not a no-op. The
    check is one dictionary-sized job on an already-checkpointed input,
    noise next to the round's own pair-count pass."""
    if best.isEmpty():
        raise ValueError(
            "BPE merge round found no adjacent pair left to merge: "
            "n_merges exceeds the merges this corpus supports; "
            "reduce n_merges"
        )
    rest = [c for c in dict_df.columns if c != "toks"]
    return dict_df.crossJoin(F.broadcast(best.select("lft", "rgt"))).select(
        F.aggregate(
            "toks", F.expr("CAST(array() AS array<string>)"), _merge_fold
        ).alias("toks"),
        *rest,
    )


def bpe_train_stats(words: DataFrame, n_merges: int) -> DataFrame:
    """Run ``n_merges`` BPE rounds over the (word, cnt) dictionary and
    return one row per round: the learned merge, its pair count, and
    the post-merge corpus token total / symbol vocabulary size (both
    weighted corpus-wide through the word counts, so they ARE the
    full-corpus tokenization statistics without re-touching the
    corpus).

    Round r's stats re-derive the (deterministic) chain up to r; with a
    vocabulary-sized dictionary that recompute is noise. For very large
    vocabularies or merge counts, localCheckpoint the dict every few
    rounds to cap lineage — same pattern as operators/components.py.

    ``n_merges`` must not exceed the number of merges the corpus
    supports (a corpus with P distinct adjacent pairs supports at
    least P rounds): once no pairs remain, ``apply_merge`` raises a
    ValueError rather than silently emptying the dictionary.
    """
    # The word-freq dict is the ONE corpus-sized computation; pin it
    # eagerly so the per-round lineages (3 outputs × n_merges rounds)
    # re-derive only dictionary-sized work, never the corpus scan
    # (measured: 44 s → ~4 s at sf0.01 for 6 rounds).
    d = initial_symbols(words).localCheckpoint(eager=True)
    stats = []
    for rnd in range(1, n_merges + 1):
        best = best_pair(pair_counts(d))
        # checkpoint each round's dict too: without it the fold
        # expression nests n_merges deep and Catalyst planning time
        # (not execution) dominates the whole train
        d = apply_merge(d, best).localCheckpoint(eager=True)
        corpus_after = d.agg(
            F.sum(F.size("toks") * F.col("cnt")).cast("long").alias("corpus_tokens_after")
        )
        vocab_after = (
            d.select(F.explode("toks").alias("tk"))
            .agg(F.countDistinct("tk").cast("long").alias("vocab_after"))
        )
        stats.append(
            best.select(
                F.lit(rnd).cast("int").alias("round"),
                F.col("lft").alias("merge_left"),
                F.col("rgt").alias("merge_right"),
                "pair_count",
            )
            .crossJoin(F.broadcast(corpus_after))
            .crossJoin(F.broadcast(vocab_after))
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


def bpe_learned_dict(words: DataFrame, n_merges: int) -> DataFrame:
    """Train ``n_merges`` rounds and return the word -> final symbol
    list lookup (word, toks) — the broadcastable tokenizer model that
    turns corpus tokenization into a map-side join."""
    d = initial_symbols(words).localCheckpoint(eager=True)
    for _ in range(n_merges):
        d = apply_merge(d, best_pair(pair_counts(d))).localCheckpoint(eager=True)
    return d.select("word", "toks")
