"""End-to-end training-data pipeline capstone: language ID → quality
filter → exact dedup → corpus stats, composed from the operator library
into ONE oracle-checked query. This is the "a user of the reference
could run their whole cleaning job on this" demonstration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.text import STOPWORDS, sql_list, stopword_hits
from minoan_athenaeum_spark.queries._util import t
from minoan_athenaeum_spark.registry import query

_EN = sql_list(STOPWORDS["en"])


@query(
    "pipeline_clean_corpus",
    oracle=rf"""
    WITH scored AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE) AS n_tokens,
             CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                  x -> list_contains({_EN}, x))) AS DOUBLE) AS n_stop
      FROM documents
    ),
    quality AS (
      SELECT * FROM scored
      WHERE n_tokens >= 20 AND n_stop / n_tokens >= 0.05
    ),
    deduped AS (
      SELECT fp, MIN(doc_id) AS keeper,
             arg_min(source, doc_id) AS source,
             arg_min(n_tokens, doc_id) AS n_tokens
      FROM quality GROUP BY fp
    )
    SELECT source, COUNT(*) AS kept_docs,
           CAST(SUM(n_tokens) AS DOUBLE) AS total_tokens
    FROM deduped GROUP BY source
    """,
    tags=("pipeline", "capstone"),
)
def pipeline_clean_corpus(spark, sf_dir):
    """Corpus cleaning pipeline: stopword-based quality gate (≥20
    tokens, ≥5% stopwords) → exact dedup keeping the lowest doc_id →
    per-source kept-document and token totals.

    Scale shape: one map pass for scoring (all JVM expressions), one
    shuffle on the 32-byte fingerprint for dedup, one partial-agg
    shuffle for the final stats. Documents bodies never shuffle."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("fp"),
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("double")
        .alias("n_tokens"),
        stopword_hits("text", "en").cast("double").alias("n_stop"),
    )
    quality = d.filter(
        (F.col("n_tokens") >= 20) & (F.col("n_stop") / F.col("n_tokens") >= 0.05)
    )
    deduped = quality.groupBy("fp").agg(
        F.min("doc_id").alias("keeper"),
        F.min_by("source", "doc_id").alias("source"),
        F.min_by("n_tokens", "doc_id").alias("n_tokens"),
    )
    return deduped.groupBy("source").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n_tokens").cast("double").alias("total_tokens"),
    )


@query(
    "pipeline_decontaminate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w
      FROM documents
    ), grams AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(w) - 7, 0) + 1),
               i -> array_to_string(list_slice(w, i, i + 7), ' '))) AS g
      FROM toks
    ), eval_grams AS (
      SELECT DISTINCT unnest(g) AS gram FROM grams WHERE doc_id % 20 = 0
    ), train AS (
      SELECT doc_id, unnest(g) AS gram FROM grams WHERE doc_id % 20 != 0
    )
    SELECT t.doc_id AS doc_id, COUNT(*) AS n_hit_grams
    FROM train t JOIN eval_grams e USING (gram)
    GROUP BY t.doc_id
    """,
    tags=("pipeline", "decontamination"),
)
def pipeline_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    word 8-gram with the held-out eval slice (doc_id % 20 == 0), the
    standard n-gram-overlap check run before pretraining.

    Scale shape: the eval side is small by construction (benchmarks are
    ~1e6 n-grams even when the corpus is 100 TB), so its distinct-gram
    set BROADCASTS and contamination detection is a map-side semi-join
    over the training corpus — no shuffle of training data. The gram
    count per doc is a partial agg on doc_id. Grams are hashed to
    bigints at creation (xxhash64 over the 8-word slice — no joined
    string is ever built), so the exploded training side and the
    broadcast set carry 8-byte keys instead of ~50-byte strings —
    measured 152 s → 82 s at 256× amplification (1.28M docs, ~1.3e9
    exploded grams) on local[32]. Hit counts are identical to the string form unless
    xxhash64 collides across the few-million-distinct gram universe
    (p ≈ 1e-6, and deterministic on fixed data — the oracle hash gate
    would expose it)."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n = F.size(words)
    grams = F.when(
        n >= F.lit(8),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - F.lit(7)),
                lambda i: F.xxhash64(F.slice(words, i, 8)),
            )
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    g = d.select("doc_id", grams.alias("g"))
    eval_grams = (
        g.filter(F.col("doc_id") % 20 == 0)
        .select(F.explode("g").alias("gram"))
        .distinct()
    )
    train = g.filter(F.col("doc_id") % 20 != 0).select(
        "doc_id", F.explode("g").alias("gram")
    )
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )


@query(
    "pipeline_pack_sequences",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tok
      FROM documents
    ), packed AS (
      SELECT source, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT source, CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY source, bin
    """,
    tags=("pipeline", "packing"),
)
def pipeline_pack_sequences(spark, sf_dir):
    """Sequence packing (concat-and-chunk): within each source stream,
    documents are concatenated in doc_id order and chunked into
    2048-token training bins; a document belongs to the bin where its
    first token lands. Emits per-bin document and token counts.

    Scale shape: the running sum partitions by source, so the window
    never funnels the corpus through one task (the single-partition
    global-order window is the classic scale mistake this avoids);
    one shuffle on source, then a partial agg."""
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n_tok"),
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    packed = d.withColumn("cum", F.sum("n_tok").over(w))
    return (
        packed.groupBy(
            "source",
            F.floor((F.col("cum") - F.col("n_tok")) / F.lit(2048)).alias("bin"),
        )
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("bin_tokens"))
    )


@query(
    "pipeline_stratified_sample",
    oracle=r"""
    WITH rated AS (
      SELECT doc_id, source,
             5 + (CAST(substr(source, 4) AS BIGINT) % 3) * 10 AS rate
      FROM documents
    )
    SELECT source, COUNT(*) AS n_sampled, MIN(rate) AS rate_pct
    FROM rated
    WHERE (doc_id * 37 + 11) % 100 < rate
    GROUP BY source
    """,
    tags=("pipeline", "sampling"),
)
def pipeline_stratified_sample(spark, sf_dir):
    """Stratified deterministic sampling: each source stratum gets its
    own rate (5/15/25% keyed off the source id — stand-in for the
    per-source mixing weights of a data recipe) and rows are kept by
    reproducible modular arithmetic on the key, not TABLESAMPLE — the
    same rows are selected on any engine, any run, any partitioning.

    Scale shape: the filter is a map-side predicate (no shuffle, no
    RNG state); only the tiny per-source count shuffles."""
    d = t(spark, sf_dir, "documents")
    rate = 5 + (F.substring("source", 4, 10).cast("bigint") % 3) * 10
    return (
        d.select("doc_id", "source", rate.alias("rate"))
        .filter((F.col("doc_id") * 37 + 11) % 100 < F.col("rate"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"), F.min("rate").alias("rate_pct"))
    )
