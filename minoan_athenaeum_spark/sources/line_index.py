"""Persisted first-occurrence LINE-fingerprint index — the sixth
persisted-index family (LSH bands, BM25 postings, IVF cells,
first-occurrence grams, training shards, and now line fingerprints).

The 100-TB problem: corpus-wide line-level dedup (C4/CCNet style,
queries/dedup.py::dedup_lines_global) must not re-chunk and re-hash
the whole corpus per arriving batch. The persisted state is the lean
(fp, first_doc, first_line) table — the smallest (doc_id, line_no)
owner of every distinct line fingerprint ever seen — and serving a
batch is: batch lines map-only → per-fp batch minima → broadcast hash
probe against ONE map-only scan of the index → merged-owner compare.

First-occurrence over the (doc_id, line_no) struct is a MIN — the
canonical mergeable aggregate — so appends are delta generations whose
min-merge ≡ rebuild-from-union regardless of how doc_ids interleave
across generations (exactly the gram-index argument,
sources/gram_index.py; pinned in tests/test_line_index.py). Compaction
rewrites the generations through the same writer and swaps live with
the crash-safe two-rename dance (sources/swap.py). Freshness follows
the bucketed-facts convention: the index path embeds a fingerprint of
the source parquet, so a changed corpus resolves to a new path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINE_LEN = 10  # tokens per synthesized line, same as dedup_lines_global


def line_index_path(
    spark: SparkSession, sf_dir: str, line_len: int = LINE_LEN
) -> str | None:
    """Warehouse directory for the documents table's first-occurrence
    line index — None when the warehouse isn't a local filesystem. The
    line length is part of the cache key (the gram-index n lesson,
    ADVICE r8)."""
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
    return os.path.join(wh, f"mas_lineidx_{tag}_L{line_len}_{fresh}")


def doc_lines(docs: DataFrame, line_len: int = LINE_LEN) -> DataFrame:
    """(doc_id, line_no, fp, n_tok): every synthesized line of every
    document, fingerprinted (md5 — engine-portable) at creation so
    downstream aggregates/joins never move line text."""
    from minoan_athenaeum_spark.operators.text import tokens

    d = docs.select("doc_id", tokens().alias("tk"))
    lines_arr = F.expr(
        f"transform(sequence(0, cast(ceil(size(tk) / {line_len}.0) as int) - 1),"
        f" i -> concat_ws(' ', slice(tk, i * {line_len} + 1, {line_len})))"
    )
    return d.select(
        "doc_id", F.posexplode(lines_arr).alias("line_no", "line")
    ).select(
        "doc_id",
        F.col("line_no").cast("long").alias("line_no"),
        F.md5(F.col("line")).alias("fp"),
        F.size(F.split(F.col("line"), " ")).cast("long").alias("n_tok"),
    )


def line_owner_rows(docs: DataFrame, line_len: int = LINE_LEN) -> DataFrame:
    """(fp, first_doc, first_line) — the smallest (doc_id, line_no)
    owner of each distinct line fingerprint in ``docs``. One
    doc-colocated explode + one fp-keyed MIN aggregate (map-side
    combined; struct min orders lexicographically, the same total
    order the oracle's ROW_NUMBER uses)."""
    return (
        doc_lines(docs, line_len)
        .groupBy("fp")
        .agg(F.min(F.struct("doc_id", "line_no")).alias("own"))
        .select(
            "fp",
            F.col("own.doc_id").alias("first_doc"),
            F.col("own.line_no").alias("first_line"),
        )
    )


def ensure_line_index(
    spark: SparkSession, sf_dir: str, line_len: int = LINE_LEN, n_files: int = 8
) -> str:
    """Materialize the first-occurrence line index for the EXISTING
    corpus slice (doc_id % 10 != 0 — the repo's standard incremental
    split) as fp-hash-partitioned parquet under ``<path>/lines``.
    Idempotent per source fingerprint; repairs any interrupted
    compaction swap first."""
    import os

    from minoan_athenaeum_spark.sources.swap import recover_swap

    path = line_index_path(spark, sf_dir, line_len)
    if path is None:
        raise RuntimeError("line index needs a local warehouse dir")
    recover_swap(os.path.join(path, "lines"))
    if os.path.isfile(os.path.join(path, "lines", "_SUCCESS")):
        return path
    from minoan_athenaeum_spark.catalog import load_table

    existing = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    (
        line_owner_rows(existing, line_len)
        .repartition(n_files, F.col("fp"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "lines"))
    )
    return path


def append_to_line_index(
    spark: SparkSession, path: str, new_docs: DataFrame, line_len: int = LINE_LEN
) -> None:
    """Fold a document batch INTO the persisted index as one delta
    generation (parquet append of the batch's per-fp minima). No
    read-modify-write: first-occurrence is a MIN over the
    (doc_id, line_no) struct, so min-over-generations ≡
    rebuild-from-union under any interleaving (pinned by
    tests/test_line_index.py::test_append_equals_rebuild). Per-doc_id
    idempotence is the caller's contract."""
    import os

    (
        line_owner_rows(new_docs, line_len)
        .write.mode("append")
        .parquet(os.path.join(path, "lines"))
    )


def compact_line_index(
    spark: SparkSession, path: str, n_files: int = 8
) -> None:
    """Rewrite accumulated generations into ``n_files`` fresh
    fp-partitioned files with the min-merge APPLIED (one row per fp) —
    the LSM compaction step, swapped live crash-safely
    (sources/swap.py)."""
    import os

    from minoan_athenaeum_spark.sources.swap import (
        recover_swap,
        swap_live,
        swap_paths,
    )

    ldir = os.path.join(path, "lines")
    recover_swap(ldir)
    (
        spark.read.parquet(ldir)
        .groupBy("fp")
        .agg(F.min(F.struct("first_doc", "first_line")).alias("own"))
        .select(
            "fp",
            F.col("own.first_doc").alias("first_doc"),
            F.col("own.first_line").alias("first_line"),
        )
        .repartition(n_files, F.col("fp"))
        .write.mode("overwrite")
        .parquet(swap_paths(ldir)[0])
    )
    swap_live(ldir)
