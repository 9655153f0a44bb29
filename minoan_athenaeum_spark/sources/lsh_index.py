"""Persisted MinHash-LSH band index for INCREMENTAL deduplication.

The 100-TB problem this solves: near-dup detection over a growing
corpus must not re-shingle, re-hash, and re-bucket the whole corpus
every time a batch of new documents arrives. The standard layout is a
persisted band-bucket index — lean (bucket, doc_id) band rows plus a
(doc_id, hashed-shingle-set) verify table — built once per corpus
version; deduplicating a new batch is then:

  batch → signatures → band keys (map-only over the BATCH)
        → join against the index on bucket
        → exact Jaccard verify on the surviving candidates.

With the batch side broadcast (the common case: batch ≪ corpus), the
corpus-side work is ONE map-only scan of the index — no corpus
shuffle, no re-hashing; shingle sets are denormalized onto the index
rows precisely so the verify step needs no join back to the corpus
(the same denormalization trick the BM25 serving index uses for
doc-length norms, sources/posting_sink.py:78).

Freshness follows the bucketed-facts convention: the index path embeds
a fingerprint of the source parquet, so a changed corpus resolves to a
new path and a stale index is simply never served.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Banding scheme shared by the build, append, and serve paths (and by
# the serve's broadcast-size estimate in queries/dedup.py — ADVICE r11:
# a guard that hardcodes the band count silently desyncs if this
# changes). bands*rows = the 16-value signature the oracle replays.
BANDS = 4
ROWS_PER_BAND = 4


def minhash_index_path(spark: SparkSession, sf_dir: str) -> str | None:
    """Warehouse directory for the documents table's LSH band index —
    None when the warehouse isn't a local filesystem. ``params``
    carries the LAYOUT version: r13 switched the shingles table to
    xxhash64'd longs (``hashed_shingles``), so the version bump
    resolves to a new path and a pre-r13 string-form index is simply
    never served (the standard freshness convention — content-shape
    changes are params changes)."""
    from minoan_athenaeum_spark.sources.index_family import (
        warehouse_index_path,
    )

    return warehouse_index_path(
        spark, sf_dir, "mas_lshidx", "documents", params="hsh2"
    )


def shingled(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) — the 3-char shingle sets of ``docs``. NULL text is
    coalesced to '' so the append/serve path and the distinct-text build
    path (which joins back on an md5 text fingerprint — md5(NULL) would
    silently drop the doc from an inner join) agree byte-for-byte on
    corpora containing null texts."""
    from minoan_athenaeum_spark.operators.dedup import char_shingles, normalized

    return docs.select(
        "doc_id",
        char_shingles(F.coalesce(normalized(), F.lit("")), 3).alias("sh"),
    )


def hashed_shingles(sh_col):
    """String shingles → distinct 8-byte xxhash64 longs, hash-then-
    dedup in the char_shingle_hashes order (operators/dedup.py — the
    ADVICE-r12 convention), so set sizes and intersection counts
    behave identically under a within-doc collision (p ≈ 1e-13).

    The persisted ``shingles/`` table stores THIS form (r13, VERDICT
    r12 #3): the verify step only needs set identity, so the index
    carries 8-byte longs instead of 3-char strings — ~4× narrower
    verify payloads and long-vs-long array_intersect instead of
    string compares. The md5-60-bit MINHASH values are untouched
    (they are part of the oracle contract and are computed from the
    STRING shingles before hashing)."""
    return F.array_distinct(F.transform(sh_col, lambda s: F.xxhash64(s)))


def band_rows(
    sh_df: DataFrame, bands: int = BANDS, rows: int = ROWS_PER_BAND, key: str = "doc_id"
) -> DataFrame:
    """Lean (bucket, <key>) rows from a (<key>, sh) table: 16-value
    minhash signature → ``bands`` band keys, exploded. All hashing is
    the engine-portable md5-60-bit convention, so the index contents
    are reproducible in DuckDB oracle SQL. ``key`` lets the build path
    band per DISTINCT text instead of per document."""
    from minoan_athenaeum_spark.operators.dedup import band_keys, minhash_signature

    return sh_df.select(
        F.explode(
            band_keys(minhash_signature(F.col("sh"), bands * rows), bands, rows)
        ).alias("bucket"),
        key,
    )


def ensure_minhash_index(
    spark: SparkSession, sf_dir: str, bands: int = BANDS, rows: int = ROWS_PER_BAND
) -> str:
    """Materialize the two-table band index for the EXISTING corpus
    (documents with ``doc_id % 10 != 0`` — the driver-visible batch
    split this repo's incremental queries use): ``bands/`` holds the
    lean (bucket, doc_id) rows co-located by bucket, ``shingles/``
    holds (doc_id, sh) ONCE (not denormalized per band — 4× smaller
    than the naive layout; an earlier denormalized form was measured
    4.6M corpus-sized array rows and dominated the serve scan). The
    verify join against ``shingles/`` is candidate-sized, never
    corpus-sized. Idempotent per source fingerprint."""
    import os

    from minoan_athenaeum_spark.sources.swap import recover_swap

    path = minhash_index_path(spark, sf_dir)
    if path is None:
        raise RuntimeError("MinHash index needs a local warehouse dir")
    # every reader's entry point repairs an interrupted compaction swap
    # FIRST (the ADVICE-r8 recovery window, same as the siblings) — a
    # crash between the two renames must not look like a missing index
    recover_swap(os.path.join(path, "bands"))
    recover_swap(os.path.join(path, "shingles"))
    if os.path.isfile(
        os.path.join(path, "bands", "_SUCCESS")
    ) and os.path.isfile(os.path.join(path, "shingles", "_SUCCESS")):
        return path
    from minoan_athenaeum_spark.catalog import load_table
    from minoan_athenaeum_spark.operators.dedup import char_shingles, normalized

    # DISTINCT-TEXT signature build (VERDICT r10 #6): the shingle +
    # 16-permutation md5 signature depends only on the normalized
    # text, so compute it ONCE PER DISTINCT TEXT and join the results
    # back to doc_ids. The distinct is a partial-aggregated (map-side
    # combined) shuffle — each input split collapses its local
    # duplicates before anything moves — so the md5 CPU (the build's
    # dominant cost; r10 measured it mildly super-linear on amplified
    # shards: 416 s at 256x -> 2435 s at 1024x) now scales with
    # DISTINCT texts, not rows. Real pretraining corpora carry ~30%+
    # exact dups (that's why dedup_exact exists), replica-amplified
    # probes are ~100% dups; a fully dup-free corpus pays one extra
    # narrow shuffle, a fraction of the hashing it avoids re-checking.
    # The doc_id<->text join-back runs on a full-width md5 TEXT
    # FINGERPRINT, not the text itself, so the corpus-side checkpoint
    # and shuffle carry 32-byte keys instead of document bodies (the
    # first fp-keyed cut of this build moved full texts and went
    # super-linear again at 4096x: 284.9 s vs 60.0 s at 1024x).
    # 128-bit md5 as text identity is collision-safe far beyond any
    # corpus cardinality (the 60-BIT convention used for minhash
    # values stays untouched — it is part of the algorithm's oracle
    # contract, not an identity key). Index CONTENTS are
    # byte-identical to the per-doc build (pinned by
    # test_append_to_index_equals_rebuild + the incremental query's
    # full-recompute DuckDB oracle).
    docs_nt = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 != 0)
        .select(
            # same NULL→'' coalesce as shingled(): a NULL _nt would md5 to
            # NULL and vanish from the inner join-backs, diverging from the
            # append path (append-equals-rebuild byte identity).
            "doc_id",
            F.coalesce(normalized(), F.lit("")).alias("_nt"),
        )
    )
    keyed = docs_nt.select(
        "doc_id", F.md5(F.col("_nt")).alias("_fp")
    ).localCheckpoint(eager=True)
    rep_sh = (
        docs_nt.select("_nt")
        .distinct()
        .select(
            F.md5(F.col("_nt")).alias("_fp"),
            char_shingles(F.col("_nt"), 3).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    try:
        rep_bands = band_rows(rep_sh, bands, rows, key="_fp")
        (
            keyed.join(rep_bands, "_fp")
            .select("bucket", "doc_id")
            .repartition(8, F.col("bucket"))
            .write.mode("overwrite")
            .parquet(os.path.join(path, "bands"))
        )
        (
            keyed.join(rep_sh, "_fp")
            .select("doc_id", hashed_shingles(F.col("sh")).alias("sh"))
            .write.mode("overwrite")
            .parquet(os.path.join(path, "shingles"))
        )
    finally:
        # release the checkpoint blocks — the index lives on disk now
        keyed.unpersist()
        rep_sh.unpersist()
    return path


def write_training_shards(
    docs: DataFrame, path: str, n_shards: int = 16, salt: str = "shuf#"
) -> None:
    """Materialize the deterministic training shuffle as on-disk shards
    (the write path behind queries/pipeline.py::pipeline_shuffle_shards):
    permutation key = portable md5-60-bit hash of the doc id, shard =
    key mod ``n_shards``, one parquet file per shard directory with
    rows SORTED by the permutation key — a training loader reading
    shard files sequentially sees the global pseudorandom order.

    Plan shape: one hash shuffle on the shard id, per-shard external
    sort in the writer (`sortWithinPartitions`), no global sort. Use
    n_shards ≫ executor count at scale (the 65536× A/B measured the
    16-shard layout window-bound and the 1024-shard one faster)."""
    from minoan_athenaeum_spark.operators.dedup import portable_hash60

    keyed = docs.withColumn(
        "_hv",
        portable_hash60(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
    ).withColumn("shard", (F.col("_hv") % n_shards).cast("int"))
    (
        keyed.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_hv")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def append_to_minhash_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    bands: int = BANDS,
    rows: int = ROWS_PER_BAND,
) -> None:
    """Fold a deduplicated batch INTO the persisted index — the
    maintenance step after a batch passes the incremental dedup gate,
    so the next batch dedups against old + new without any rebuild.
    Appends the batch's lean band rows and shingle rows (parquet
    append); per-doc-id idempotence is the caller's contract (the
    dedup pipeline admits each doc_id once). Equivalence with a
    from-scratch rebuild is pinned by
    tests/test_dedup_similarity.py::test_append_to_index_equals_rebuild."""
    import os

    batch_sh = shingled(new_docs).localCheckpoint(eager=True)
    try:
        (
            band_rows(batch_sh, bands, rows)
            .repartition(1, F.col("bucket"))
            .write.mode("append")
            .parquet(os.path.join(path, "bands"))
        )
        (
            batch_sh.select(
                "doc_id", hashed_shingles(F.col("sh")).alias("sh")
            )
            .write.mode("append")
            .parquet(os.path.join(path, "shingles"))
        )
    finally:
        batch_sh.unpersist()


def _lsh_families() -> tuple:
    """The two-table band index expressed as harness families (VERDICT
    r12 #2 — the one family of seven without compaction). Rows are
    doc-disjoint across generations (per-doc_id append idempotence is
    the caller's contract), so merge is the identity and compaction is
    a pure layout rewrite, exactly the BM25-postings convention. The
    build path keeps its distinct-text fast path (ensure above); these
    families carry the LIFECYCLE contract (layout + compact + swap)."""
    from minoan_athenaeum_spark.sources.index_family import (
        MergeableIndexFamily,
    )

    bands_fam = MergeableIndexFamily(
        prefix="mas_lshidx",
        subdir="bands",
        rows_fn=lambda docs: band_rows(shingled(docs)),
        merge_fn=lambda gens: gens,
        part_col="bucket",
    )
    shingles_fam = MergeableIndexFamily(
        prefix="mas_lshidx",
        subdir="shingles",
        rows_fn=shingled,
        merge_fn=lambda gens: gens,
        part_col="doc_id",
    )
    return bands_fam, shingles_fam


def compact_minhash_index(
    spark: SparkSession, path: str, n_files: int = 8
) -> None:
    """Rewrite accumulated band + shingle generations (base files plus
    one file per appended batch) back into ``n_files`` bucket- /
    doc_id-partitioned files per table — the LSM compaction step the
    other index families already carry (VERDICT r12 #2). Rows
    unchanged by construction (identity merge over doc-disjoint
    generations); each table lands in a sibling dir and swaps live
    with the crash-safe two-rename dance, and ``ensure_minhash_index``
    repairs any interrupted swap on entry. Pinned by
    tests/test_dedup_similarity.py::test_lsh_compact_preserves_index
    and tests/test_crash_safety.py::test_lsh_index_crash_recovery."""
    from minoan_athenaeum_spark.sources.index_family import compact_index

    for fam in _lsh_families():
        compact_index(fam, spark, path, n_files)
