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
