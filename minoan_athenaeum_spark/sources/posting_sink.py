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

def bm25_index_path(spark: SparkSession, sf_dir: str) -> str | None:
    """Warehouse directory for the BM25 index of ``sf_dir``'s documents
    table, freshness-fingerprinted like the bucketed facts (a changed
    source parquet resolves to a new path, so a stale index is simply
    never served). None when the warehouse isn't a local filesystem."""
    import hashlib
    import os

    from minoan_athenaeum_spark.sources.bucketed import _source_fingerprint

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    elif "://" in wh:
        return None
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    fresh = _source_fingerprint(f"{sf_dir}/documents.parquet")
    return os.path.join(wh, f"mas_bm25idx_{tag}_{fresh}")


def ensure_bm25_index(
    spark: SparkSession, sf_dir: str, num_segments: int = 8
) -> str:
    """Materialize the documents table's BM25 serving index under the
    warehouse: term-range-segmented postings (term, doc_id, tf, dl —
    the doc-length norm is DENORMALIZED onto each posting, the
    standard trick that makes query-time scoring join-free) plus a
    1-row corpus-stats table (n_docs, avgdl). Idempotent per source
    fingerprint; the tokenize+explode+count happens HERE, once at
    index-build time, never at query time."""
    import os

    from minoan_athenaeum_spark.catalog import load_table
    from minoan_athenaeum_spark.operators.text import tokens

    path = bm25_index_path(spark, sf_dir)
    if path is None:
        raise RuntimeError("BM25 index needs a local warehouse dir")
    if os.path.isfile(os.path.join(path, "postings", "_SUCCESS")) and os.path.isfile(
        os.path.join(path, "stats", "_SUCCESS")
    ):
        return path
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens().alias("toks")
    )
    dl = d.select("doc_id", F.size("toks").cast("double").alias("dl"))
    postings = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
        .join(dl, "doc_id")
    )
    write_posting_segments(
        postings, os.path.join(path, "postings"), num_segments=num_segments
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl") / F.count("*").cast("double")).alias("avgdl"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "stats"))
    return path
