"""Persisted first-occurrence n-gram index for INCREMENTAL novelty.

The 100-TB problem this solves: the marginal-novelty curve
(queries/text.py::text_ngram_novelty — how much genuinely new n-gram
mass an arriving crawl slice contributes) must not re-gram the whole
corpus per batch. The persisted state is the lean (gram, first_doc)
table — the min-doc_id owner of every distinct n-gram ever seen — and
serving a batch is:

  batch → (doc_id, gram) pairs → per-gram batch minima (map-only over
  the BATCH) → broadcast hash probe against ONE map-only scan of the
  index → candidate-sized min-merge + anti-join → per-doc novelty.

The corpus side never re-tokenizes and never shuffles; the index scan
carries two lean columns (no text). Appends follow the LSM shape the
BM25 posting index uses (sources/posting_sink.py): each batch writes
its (gram, batch_min) rows as a delta generation, correctness under
any interleaving is restored at read time because first-occurrence is
a MIN — the canonical mergeable aggregate — so min-over-generations ≡
rebuild-from-union (pinned in tests/test_r8_ops.py). Compaction
rewrites the generations through the same writer and swaps by rename,
identical to compact_bm25_index's reader-safe two-rename dance.

Freshness follows the bucketed-facts convention: the index path embeds
a fingerprint of the source parquet, so a changed corpus resolves to a
new path and a stale index is simply never served.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GRAM_N = 5  # the novelty unit, same as text_ngram_novelty


def gram_index_path(
    spark: SparkSession, sf_dir: str, n: int = GRAM_N
) -> str | None:
    """Warehouse directory for the documents table's first-occurrence
    gram index — None when the warehouse isn't a local filesystem.
    The gram length ``n`` is part of the cache key (directory name), so
    an index built for one gram length can never be served or extended
    for another (ADVICE r8: previously only sf_dir + source fingerprint
    keyed the cache)."""
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
    return os.path.join(wh, f"mas_gramidx_{tag}_n{n}_{fresh}")


def gram_rows(docs: DataFrame, n: int = GRAM_N) -> DataFrame:
    """(gram, first_doc) — each distinct n-gram of ``docs`` with the
    smallest doc_id that contains it. One doc-colocated explode + one
    gram-keyed MIN aggregate (map-side combined)."""
    from minoan_athenaeum_spark.operators.text import ngram_structs, tokens

    d = docs.select("doc_id", tokens().alias("tk"))
    grams = d.select(
        "doc_id", F.explode(ngram_structs("tk", n)).alias("g")
    ).select(
        "doc_id",
        F.concat_ws(" ", *[F.col(f"g.w{i}") for i in range(n)]).alias("gram"),
    )
    return grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))


def ensure_gram_index(
    spark: SparkSession, sf_dir: str, n: int = GRAM_N, n_files: int = 8
) -> str:
    """Materialize the first-occurrence index for the EXISTING corpus
    (documents with ``doc_id % 10 != 0`` — the driver-visible batch
    split this repo's incremental queries use) as gram-hash-partitioned
    parquet under ``<path>/grams``. Idempotent per source
    fingerprint."""
    import os

    from minoan_athenaeum_spark.sources.swap import recover_swap

    path = gram_index_path(spark, sf_dir, n)
    if path is None:
        raise RuntimeError("gram index needs a local warehouse dir")
    recover_swap(os.path.join(path, "grams"))
    if os.path.isfile(os.path.join(path, "grams", "_SUCCESS")):
        return path
    from minoan_athenaeum_spark.catalog import load_table

    existing = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 != 0
    )
    (
        gram_rows(existing, n)
        .repartition(n_files, F.col("gram"))
        .write.mode("overwrite")
        .parquet(os.path.join(path, "grams"))
    )
    return path


def append_to_gram_index(
    spark: SparkSession, path: str, new_docs: DataFrame, n: int = GRAM_N
) -> None:
    """Fold a document batch INTO the persisted index: the batch's
    (gram, batch_min) rows land as one delta generation (parquet
    append). No read-modify-write of existing rows — first-occurrence
    is a MIN, so any reader that min-merges across generations sees
    exactly the rebuilt-from-union index regardless of how doc_ids
    interleave across generations (pinned by
    tests/test_r8_ops.py::test_gram_index_append_equals_rebuild).
    Per-doc_id idempotence is the caller's contract (each doc appended
    once — the same contract as append_to_bm25_index)."""
    import os

    (
        gram_rows(new_docs, n)
        .write.mode("append")
        .parquet(os.path.join(path, "grams"))
    )


def compact_gram_index(
    spark: SparkSession, path: str, n_files: int = 8
) -> None:
    """Rewrite accumulated generations into ``n_files`` fresh
    gram-partitioned files with the min-merge APPLIED (one row per
    gram again) — the LSM compaction step. Lands in a sibling dir,
    swapped live by two renames so a reader never sees a half-written
    index; the old generation is removed last, and any state an
    interrupted prior swap left behind is repaired first
    (sources/swap.py — pinned by tests/test_crash_safety.py)."""
    import os

    from minoan_athenaeum_spark.sources.swap import (
        recover_swap,
        swap_live,
        swap_paths,
    )

    gdir = os.path.join(path, "grams")
    recover_swap(gdir)
    (
        spark.read.parquet(gdir)
        .groupBy("gram")
        .agg(F.min("first_doc").alias("first_doc"))
        .repartition(n_files, F.col("gram"))
        .write.mode("overwrite")
        .parquet(swap_paths(gdir)[0])
    )
    swap_live(gdir)
