"""Posting-list segment sink: stream full inverted-index postings to
disk with O(1) executor memory.

An inverted index's posting lists are the textbook case where
collect_list dies at scale: a stopword's posting list IS the corpus.
Real engines never materialize the list — they write term-sorted runs
("segments") and rely on the layout: every posting for a term is
contiguous, term runs are ordered within a file, and file boundaries
partition the term space, so lookups touch one file and merges are
streaming.

This sink produces exactly that layout with two Spark primitives:
range-partition by term (file boundaries = term-space partition), then
sortWithinPartitions(term, doc_id) (contiguous, ordered runs) — the
sort is the executor's external sort, spilling as needed, so no task
ever holds a posting list in memory. Parquet keeps row-group min/max
stats on term, giving the one-file-per-lookup property to any reader
that pushes a term predicate down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_posting_segments(
    postings: DataFrame,
    path: str,
    term_col: str = "term",
    doc_col: str = "doc_id",
    num_segments: int = 8,
) -> None:
    """Write (term, doc_id, ...) postings as term-sorted parquet
    segments: ``num_segments`` files, term ranges disjoint across
    files, rows sorted by (term, doc) within each."""
    (
        postings.repartitionByRange(num_segments, F.col(term_col))
        .sortWithinPartitions(term_col, doc_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def lookup_term(
    spark: SparkSession, path: str, term: str, term_col: str = "term"
) -> DataFrame:
    """Read one term's postings; the term-range layout means the
    pushed-down equality predicate prunes to (at most) one segment via
    parquet row-group statistics."""
    return spark.read.parquet(path).filter(F.col(term_col) == term)


# ---------------------------------------------------------------------------
# BM25 serving index: postings + norms + corpus stats, built once
# ---------------------------------------------------------------------------

def bm25_index_path(
    spark: SparkSession, sf_dir: str, slice_: str = "full"
) -> str | None:
    """Warehouse directory for the BM25 index of ``sf_dir``'s documents
    table, freshness-fingerprinted like the bucketed facts (a changed
    source parquet resolves to a new path, so a stale index is simply
    never served). ``slice_`` distinguishes the full-corpus index from
    the existing-corpus base the incremental queries append onto. None
    when the warehouse isn't a local filesystem."""
    from minoan_athenaeum_spark.sources.index_family import (
        warehouse_index_path,
    )

    # v3 (VERDICT r10 #7): the stats sidecar became generation-appended
    # (one (n_docs, sum_dl) row per append, additive merge applied at
    # read) when the lifecycle moved onto the shared index_family
    # harness; the version bump keeps pre-harness warehouse dirs —
    # whose stats file stored a single read-modify-written row with a
    # derived avgdl column — from ever being served by the new reader.
    return warehouse_index_path(
        spark,
        sf_dir,
        "mas_bm25idx3",
        "documents",
        params="" if slice_ == "full" else slice_,
    )


def doc_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf, dl) postings of a documents slice — the ONE
    definition the full build and the batch append both use, so an
    appended index is bit-identical to a rebuild."""
    from minoan_athenaeum_spark.operators.text import tokens

    d = docs.select("doc_id", tokens().alias("toks"))
    dl = d.select("doc_id", F.size("toks").cast("double").alias("dl"))
    return (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .join(dl, "doc_id")
    )


def _stats_rows(docs: DataFrame) -> DataFrame:
    """1-row (n_docs, sum_dl) over a documents slice, computed from the
    docs themselves (not the postings) so token-less documents still
    count toward the corpus stats. Doc lengths are integer-valued
    doubles, so sums are exact below 2^53 and any set of generation
    rows merges to values bit-equal to a from-scratch rebuild's."""
    from minoan_athenaeum_spark.operators.text import tokens

    return docs.select(F.size(tokens()).cast("double").alias("dl")).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0.0)).alias("sum_dl"),
    )


def _merge_stats(gens: DataFrame) -> DataFrame:
    return gens.agg(
        F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
    )


def bm25_stats(spark: SparkSession, path: str) -> DataFrame:
    """The index's corpus stats as ONE row — sidecar generations
    collapsed by the additive merge, avgdl derived from the exact sums
    (bit-equal to a rebuild's sum/count, however many appends landed)."""
    import os

    return _merge_stats(
        spark.read.parquet(os.path.join(path, "stats"))
    ).select(
        "n_docs", (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"), "sum_dl"
    )


def _bm25_family(slice_: str = "full"):
    """The BM25 serving index as a harness-driven two-table family
    (VERDICT r10 #7): term-range-segmented postings (rows disjoint
    across generations — merge is the identity) + the additive-merge
    stats sidecar. Layout and append shapes are exactly the pre-harness
    writers' (write_posting_segments for the full layout, a
    within-batch term-sorted delta for appends)."""
    from minoan_athenaeum_spark.sources.index_family import (
        MergeableIndexFamily,
        TwoTableIndexFamily,
    )

    params = "" if slice_ == "full" else slice_
    postings = MergeableIndexFamily(
        prefix="mas_bm25idx3",
        subdir="postings",
        rows_fn=doc_postings,
        merge_fn=lambda df: df,
        part_col="term",
        params=params,
        layout_fn=lambda rows, target, n: write_posting_segments(
            rows, target, num_segments=n
        ),
        append_fn=lambda rows, live: (
            rows.repartitionByRange(1, F.col("term"))
            .sortWithinPartitions("term", "doc_id")
            .write.mode("append")
            .parquet(live)
        ),
    )
    stats = MergeableIndexFamily(
        prefix="mas_bm25idx3",
        subdir="stats",
        rows_fn=_stats_rows,
        merge_fn=_merge_stats,
        part_col="n_docs",  # unused: layout_fn below coalesces to 1 file
        params=params,
        layout_fn=lambda rows, target, n: (
            rows.coalesce(1).write.mode("overwrite").parquet(target)
        ),
    )
    return TwoTableIndexFamily(main=postings, side=stats)


def ensure_bm25_index(
    spark: SparkSession, sf_dir: str, num_segments: int = 8, slice_: str = "full"
) -> str:
    """Materialize a BM25 serving index under the warehouse:
    term-range-segmented postings (term, doc_id, tf, dl — the
    doc-length norm is DENORMALIZED onto each posting, the standard
    trick that makes query-time scoring join-free) plus a 1-row
    corpus-stats table (n_docs, avgdl, sum_dl — sum_dl is stored so an
    append can merge stats EXACTLY: doc lengths are integer-valued
    doubles, their sums are exact below 2^53, so merged avgdl is
    bit-equal to a rebuild's). Idempotent per source fingerprint; the
    tokenize+explode+count happens HERE, once at index-build time,
    never at query time. ``slice_='existing'`` indexes only
    ``doc_id % 10 != 0`` — the base corpus of the incremental
    append/serve queries (same convention as sources/lsh_index.py)."""
    import os

    from minoan_athenaeum_spark.catalog import load_table
    from minoan_athenaeum_spark.sources.index_family import ensure_index2

    fam = _bm25_family(slice_)
    path = fam.path(spark, sf_dir)
    if path is None:
        raise RuntimeError("BM25 index needs a local warehouse dir")
    docs = load_table(spark, sf_dir, "documents")
    if slice_ == "existing":
        docs = docs.filter(F.col("doc_id") % 10 != 0)
    built = os.path.isfile(
        os.path.join(path, "postings", "_SUCCESS")
    ) and os.path.isfile(os.path.join(path, "stats", "_SUCCESS"))
    if not built and docs.limit(1).count() == 0:
        raise ValueError(
            "BM25 index stats over an empty documents slice (n_docs=0): "
            "refusing to write a 0-doc index — check the slice filter / "
            "source path"
        )
    return ensure_index2(fam, spark, sf_dir, docs, num_segments)


def compact_bm25_index(
    spark: SparkSession, path: str, num_segments: int = 8
) -> None:
    """Rewrite the accumulated posting generations (base segments +
    any number of appended delta files) into ``num_segments`` fresh
    term-range-sorted segments — the LSM compaction step that caps
    read amplification on a long-lived ingest path.

    Every appended generation adds one-or-more delta files a term
    lookup must consult (row-group pruning keeps each touch cheap,
    but the FILE count grows linearly with generations); compaction
    restores the one-base-segment-per-term layout at the cost of one
    full index rewrite. Correctness is definitional: the posting ROWS
    are unchanged, only re-partitioned/re-sorted through the same
    write_posting_segments the full build uses, so compacted ≡
    appended ≡ rebuilt (pinned by
    tests/test_text_ops.py::test_bm25_compact_equals_append_equals_rebuild
    and by text_bm25_index_compact's full-rebuild oracle). Stats are
    untouched — append already merged them exactly.

    The rewrite lands in a sibling directory and is swapped in with
    two renames (old → .old, new → live), so a reader never sees a
    half-written index directory; the .old generation is removed
    last, and any state an interrupted prior swap left behind is
    repaired first (sources/swap.py — pinned by
    tests/test_crash_safety.py). Driven through the shared harness
    (compact_index2): the stats sidecar's generations are collapsed to
    one merged row in the same pass — the merged VALUES are unchanged
    (additive merge), only the generation count drops."""
    from minoan_athenaeum_spark.sources.index_family import compact_index2

    compact_index2(_bm25_family(), spark, path, num_segments)


def append_to_bm25_index(
    spark: SparkSession, path: str, new_docs: DataFrame, num_segments: int = 1
) -> None:
    """Fold a document batch INTO a persisted BM25 index — the
    maintenance step that keeps a growing corpus searchable without
    the full tokenize+segment rebuild (mirror of
    lsh_index.append_to_minhash_index, r6's LSH maintenance pattern).

    Postings: the batch's (term, doc_id, tf, dl) rows are written as
    DELTA segments (parquet append, term-range-sorted within the
    batch) — term lookups still prune by row-group min/max, now over
    base + delta files; a lookup touches one base segment plus one
    delta segment per appended generation, the classic LSM read
    shape (compaction = rewrite through write_posting_segments when
    generations accumulate). Stats: n_docs and sum_dl merge by exact
    addition (integer-valued doubles), so the merged avgdl is
    BIT-EQUAL to a from-scratch rebuild — pinned by
    tests/test_text_ops.py::test_bm25_append_equals_rebuild and by
    text_bm25_index_append's full-rebuild oracle. Per-doc_id
    idempotence is the caller's contract (each doc appended once).

    Driven through the shared harness (append_index2): both tables are
    now APPEND-ONLY — the stats sidecar gains one (n_docs, sum_dl)
    generation row per batch instead of the old read-modify-write of a
    single stats file, and :func:`bm25_stats` collapses generations at
    read time with the same exact integer-double sums."""
    from minoan_athenaeum_spark.sources.index_family import append_index2

    append_index2(_bm25_family(), path, new_docs)
