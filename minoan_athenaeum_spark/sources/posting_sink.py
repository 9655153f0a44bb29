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
