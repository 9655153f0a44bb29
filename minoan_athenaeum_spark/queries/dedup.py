"""Deduplication queries over the documents / embeddings tables.

Oracle strategy: exact dedup and n-gram Jaccard are fully
SQL-expressible (DuckDB list functions mirror Spark array functions;
both do exact int arithmetic then identical double division). MinHash
and SimHash rely on xxhash64, which DuckDB lacks → rows-only driver
check, with recall/correctness pinned instead by pytest against a
brute-force computation (tests/test_dedup_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.dedup import (
    band_keys,
    candidate_pairs,
    char_shingle_hashes,
    char_shingles,
    hamming64,
    jaccard,
    minhash_signature,
    normalized,
    prefix_filtered_pairs,
    simhash63,
)
from minoan_athenaeum_spark.queries._util import persist_tracked, release_tracked, t
from minoan_athenaeum_spark.registry import query


@query(
    "dedup_exact",
    oracle=r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           MIN(doc_id) AS keeper, COUNT(*) AS dup_count
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup", "exact"),
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: group by content fingerprint, keep min doc_id.
    One shuffle on the fingerprint; at 100 TB this is the standard
    hash-partitioned exact dedup (fingerprint first so the shuffle moves
    32-byte keys, not document bodies)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(normalized()).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("dup_count"))
    )


@query(
    "dedup_ngram_jaccard",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) - 2, 0) + 1),
               i -> substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), i, 3)
             )) AS sh
      FROM documents WHERE doc_id < 300
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / (CAST(len(a.sh) + len(b.sh) AS DOUBLE) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE))
             AS jacc
    FROM s a, s b
    WHERE a.doc_id < b.doc_id
      AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (CAST(len(a.sh) + len(b.sh) AS DOUBLE) - CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE))
          >= 0.5
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by character-3-gram Jaccard ≥ 0.5 (bounded to
    doc_id < 300 so the oracle's brute-force stays cheap).

    Spark side uses the scale path — a PREFIX-FILTERED shingle index
    (rarest |s|−⌈τ|s|⌉+1 shingles of each doc), then exact
    verification — which returns exactly the brute-force result because
    prefix filtering provably keeps every pair with Jaccard ≥ τ, and no
    posting list is O(corpus) even when a 3-gram occurs in every
    document (the hot-key hazard of a plain inverted index).

    Shingles are hashed to bigints at creation (char_shingle_hashes) so
    the whole pipeline — frequency table, prefix ranking, candidate
    join, array_intersect verify — compares 8-byte longs, not strings;
    set sizes and intersection counts (hence Jaccard) are identical to
    the oracle's string-shingle computation."""
    release_tracked()
    d = persist_tracked(  # referenced by the index build + the verify joins
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", char_shingle_hashes(normalized(), 3).alias("sh"))
    )
    counted = prefix_filtered_pairs(d, "doc_id", "sh", 0.5, bounded_item_universe=True)
    shared = F.col("shared").cast("double")
    j = shared / (
        (F.col("a_size") + F.col("b_size")).cast("double") - shared
    )
    return counted.select("a", "b", j.alias("jacc")).filter(F.col("jacc") >= 0.5)


@query("dedup_minhash_lsh", tags=("dedup", "minhash", "lsh"))
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(k=16) + LSH(4 bands × 4 rows) near-dup detection over ALL
    documents, verified with exact Jaccard ≥ 0.5.

    Scale path: shingle → 16-min signature (map-only) → explode 4 band
    keys (4× rows) → shuffle on band bucket → in-bucket pairs → exact
    verify. No cross join anywhere; this is the shape that runs on
    100 TB. No SQL oracle (DuckDB lacks xxhash64) — correctness pinned
    vs brute force in tests/test_dedup_similarity.py."""
    # Persist the shingle sets and band keys: both are referenced from
    # multiple join branches, and Spark would otherwise recompute the
    # (expensive) minhash expression once per branch. At cluster scale
    # these materialize to MEMORY_AND_DISK across executors.
    release_tracked()
    d = persist_tracked(
        t(spark, sf_dir, "documents")
        .select("doc_id", char_shingles(normalized(), 3).alias("sh"))
    )
    sig = persist_tracked(d.select(
        "doc_id", band_keys(minhash_signature(F.col("sh"), 16), 4, 4).alias("bk")
    ))
    cand = candidate_pairs(sig, "doc_id", "bk")
    verified = cand.join(
        d.select(F.col("doc_id").alias("a"), F.col("sh").alias("a_sh")), "a"
    ).join(d.select(F.col("doc_id").alias("b"), F.col("sh").alias("b_sh")), "b")
    j = jaccard(F.col("a_sh"), F.col("b_sh"))
    return verified.select("a", "b", j.alias("jacc")).filter(F.col("jacc") >= 0.5)


@query("dedup_simhash", tags=("dedup", "simhash"))
def dedup_simhash(spark, sf_dir):
    """SimHash64 near-dup: 4×16-bit band blocking, verify Hamming ≤ 3.

    Any pair within Hamming 3 shares at least one exact 16-bit band
    (pigeonhole), so band blocking has perfect recall for d ≤ 3. No SQL
    oracle (xxhash64) — pinned vs brute force in tests/test_dedup_similarity.py."""
    toks = F.split(normalized(), " ")
    release_tracked()
    d = persist_tracked(t(spark, sf_dir, "documents").select(
        "doc_id", simhash63(toks).alias("sh64")
    ))
    banded = d.select(
        "doc_id",
        "sh64",
        F.array(
            *[
                F.concat(
                    F.lit(f"{b}:"),
                    F.shiftright(F.col("sh64"), 16 * b)
                    .bitwiseAND(F.lit(0xFFFF))
                    .cast("string"),
                )
                for b in range(4)
            ]
        ).alias("bands"),
    )
    cand = candidate_pairs(banded, "doc_id", "bands", ["sh64"])
    return (
        cand.select(
            "a", "b", hamming64(F.col("a_sh64"), F.col("b_sh64")).alias("hamming")
        )
        .filter(F.col("hamming") <= 3)
    )


_QUANT = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"


@query(
    "dedup_embedding_cosine_lsh",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, {_QUANT} AS q FROM embeddings
    ), planted AS (
      SELECT vec_id + 1000000 AS vec_id,
             list_transform(q, (x, i) -> x + ((i - 1) % 7) - 3) AS q
      FROM base WHERE vec_id % 50 = 0
    ), corpus AS (
      SELECT vec_id, q FROM base UNION ALL SELECT vec_id, q FROM planted
    ), n AS (
      SELECT vec_id, q,
             sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM corpus
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                        i -> a.q[i] * b.q[i])) AS DOUBLE)
             / (a.nrm * b.nrm) AS cos_sim
    FROM n a, n b
    WHERE a.vec_id < b.vec_id
      AND CAST(list_sum(list_transform(range(1, len(a.q) + 1),
                                       i -> a.q[i] * b.q[i])) AS DOUBLE)
            / (a.nrm * b.nrm) >= 0.9
    """,
    tags=("dedup", "embedding", "lsh"),
)
def dedup_embedding_cosine_lsh(spark, sf_dir):
    """Embedding near-dup at a realistic threshold (cos ≥ 0.9) routed
    through the SCALE PATH: sign-LSH band buckets → candidate pairs →
    exact quantized-int cosine verify. No all-pairs join — the bucket
    key is the shuffle key, exactly the plan that runs on 100 TB.

    The synthetic embeddings are isotropic noise (max pairwise cosine
    ≈ 0.45), so true near-duplicates are PLANTED deterministically:
    every 50th vector gets a copy (vec_id + 1000000) with small integer
    offsets added to its quantized coordinates (pure int arithmetic —
    bit-identical in Spark and DuckDB). The oracle is the brute-force
    all-pairs twin over the same corpus; LSH recall at cos ≥ 0.9 with
    12 bands × 8 bits makes a missed pair ~1e-26 improbable, so outputs
    match exactly. ``dedup_embedding_cosine`` remains the bounded
    all-pairs form at the noise-level threshold."""
    from minoan_athenaeum_spark.operators.similarity import (
        quantize,
        cosine_q,
        sign_lsh_band_keys,
    )

    e = t(spark, sf_dir, "embeddings")
    base = e.select("vec_id", quantize(F.col("embedding")).alias("q"))
    planted = base.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("q"), lambda x, i: x + (i % 7) - 3).alias("q"),
    )
    release_tracked()
    corpus = persist_tracked(base.unionByName(planted))
    banded = corpus.withColumn("bk", sign_lsh_band_keys(F.col("q"), 12, 8))
    cand = candidate_pairs(banded, "vec_id", "bk", ["q"])
    cos = cosine_q(F.col("a_q"), F.col("b_q"))
    out = cand.select("a", "b", cos.alias("cos_sim")).filter(
        F.col("cos_sim") >= 0.9
    )
    return out


@query(
    "dedup_components",
    oracle=r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) - 2, 0) + 1),
               i -> substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), i, 3)
             )) AS s
      FROM documents WHERE doc_id < 300
    ), pairs AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (CAST(len(a.s) + len(b.s) AS DOUBLE) - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE))
            >= 0.5
    ), edges AS (
      SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs
    ), reach(src, dst) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u
    )
    SELECT r.src AS doc_id, LEAST(r.src, MIN(r.dst)) AS component
    FROM reach r GROUP BY r.src
    """,
    tags=("dedup", "components"),
)
def dedup_components(spark, sf_dir):
    """Duplicate GROUPS from near-dup PAIRS: the n-gram Jaccard pairs
    (same prefix-filtered scale path as ``dedup_ngram_jaccard``) are fed
    to iterative min-label propagation (operators/components.py) until
    every node carries the smallest doc_id reachable from it. This is
    the step a real training-data pipeline runs between pair generation
    and 'keep one doc per group'. Oracle: DuckDB recursive CTE computing
    the same transitive closure."""
    from minoan_athenaeum_spark.operators.components import connected_components

    release_tracked()
    d = persist_tracked(
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", char_shingle_hashes(normalized(), 3).alias("sh"))
    )
    counted = prefix_filtered_pairs(d, "doc_id", "sh", 0.5, bounded_item_universe=True)
    shared = F.col("shared").cast("double")
    j = shared / ((F.col("a_size") + F.col("b_size")).cast("double") - shared)
    pairs = counted.filter(j >= 0.5).select("a", "b")
    comps = connected_components(pairs, src="a", dst="b")
    return comps.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
