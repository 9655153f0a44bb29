"""Persisted CCNet LM-bucket index — the SEVENTH persisted-index
family (LSH bands, BM25 postings, IVF cells, first-occurrence grams,
training shards, line fingerprints, and now LM fluency scores).

The 100-TB problem (VERDICT r12 #1): the curation capstones v4/v5 gate
on the CCNet log-perplexity tail tercile, and before this family every
run re-paid the whole LM pipeline — corpus tokenize, bigram/context
count shuffles, quantized-log lookup, per-doc scoring (~7 s of v4's
10.9 s at sf0.1; ~190 s of the 1024x probe). All of that is a pure
function of the corpus, so it is featurize-once state, exactly like
the other six families.

Persisted layout, built once per corpus fingerprint
(``warehouse_index_path`` — a regenerated corpus resolves to a new
path, so staleness is impossible):

  lm_bg/    (w1, w2, lg_bg)  — add-one bigram log-counts   } the frozen
  lm_ctx/   (w1, lg_ctx)     — context log-denominators    } MODEL
  lm_meta/  (lgv)            — 1 row: unseen-context log   } artifact
  scores/   (doc_id, n_bg, lg_sum) — per-doc integer scores (MERGEABLE:
            rows are disjoint per doc_id, merge = identity — the BM25
            postings convention)

The split mirrors the IVF family's codebook/members contract: the LM
tables are a model artifact (appends score against the FROZEN LM;
retrain + rebuild is a model event, not a maintenance event), while
``scores/`` is the maintained half — ``append_to_lm_index`` scores an
arriving batch under the frozen LM (map-only explode + two
bigram-keyed joins over the BATCH ONLY; the corpus never re-tokenizes)
and appends its rows as a delta generation, and ``compact_lm_scores``
rewrites accumulated generations through the crash-safe two-rename
swap.

BUCKETS ARE DERIVED AT READ TIME: terciles are global state (every
append shifts them), so ``read_lm_buckets`` ranks the current score
table (|docs| rows — the cheap tail of the pipeline) instead of
persisting an assignment that would go stale on the first append.
Serving v4/v5 is therefore: one parquet scan of scores/ + the shared
two-phase rank + an anti-join — no tokenize, no count shuffles, no
log recurrence.

Bit-exactness: fit, score, and bucketize are the SAME functions the
from-scratch query runs (queries/text.py::ccnet_lm_fit /
ccnet_score_docs / ccnet_bucketize), and every persisted value is an
integer (Q24 fixed-point logs, bigint sums) that round-trips parquet
exactly — so index-served buckets equal the recomputed ones
bit-for-bit (pinned in tests/test_lm_index.py), and the v4/v5 oracles
are unchanged.

Reference scope note: the reference engine (database.py) has no LM or
curation surface at all — this family serves the repo's LLM-pipeline
extension queries only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minoan_athenaeum_spark.sources.swap import (
    recover_swap,
    swap_live,
    swap_paths,
)

N_SCORE_FILES = 8


def lm_index_path(spark: SparkSession, sf_dir: str) -> str | None:
    """Warehouse directory for the documents table's LM-bucket index —
    None when the warehouse isn't a local filesystem."""
    from minoan_athenaeum_spark.sources.index_family import (
        warehouse_index_path,
    )

    return warehouse_index_path(spark, sf_dir, "mas_lmidx", "documents")


def _with_bigrams(docs_tokenized: DataFrame) -> DataFrame:
    from minoan_athenaeum_spark.operators.text import bigram_pairs

    return docs_tokenized.withColumn("g", bigram_pairs("tk"))


def _read_lm(spark: SparkSession, path: str):
    """The frozen model artifact read back as the (cbg2, cctx2, lgv)
    triple ``ccnet_score_docs`` expects."""
    cbg2 = spark.read.parquet(os.path.join(path, "lm_bg"))
    cctx2 = spark.read.parquet(os.path.join(path, "lm_ctx"))
    lgv = spark.read.parquet(os.path.join(path, "lm_meta"))
    return cbg2, cctx2, lgv


def ensure_lm_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the LM-bucket index for ``sf_dir``'s FULL documents
    table: fit the add-one bigram LM on the lang='en' slice, persist
    the three frozen LM tables, then score every document AGAINST THE
    PERSISTED ARTIFACT (read back, like the IVF codebook — so the
    build exercises the same serve path appends use) and persist the
    score table. Idempotent per source fingerprint; repairs an
    interrupted scores compaction swap first."""
    from minoan_athenaeum_spark.queries.text import (
        ccnet_lm_fit,
        ccnet_score_docs,
        ccnet_tokenized,
    )

    path = lm_index_path(spark, sf_dir)
    if path is None:
        raise RuntimeError("LM-bucket index needs a local warehouse dir")
    scores_dir = os.path.join(path, "scores")
    recover_swap(scores_dir)
    if all(
        os.path.isfile(os.path.join(path, sub, "_SUCCESS"))
        for sub in ("lm_bg", "lm_ctx", "lm_meta", "scores")
    ):
        return path
    withbg = _with_bigrams(ccnet_tokenized(spark, sf_dir))
    cbg2, cctx2, lgv = ccnet_lm_fit(withbg)
    cbg2.repartition(N_SCORE_FILES, F.col("w1")).write.mode("overwrite").parquet(
        os.path.join(path, "lm_bg")
    )
    cctx2.repartition(N_SCORE_FILES, F.col("w1")).write.mode("overwrite").parquet(
        os.path.join(path, "lm_ctx")
    )
    lgv.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "lm_meta"))
    (
        ccnet_score_docs(withbg, *_read_lm(spark, path))
        .repartition(N_SCORE_FILES, F.col("doc_id"))
        .write.mode("overwrite")
        .parquet(scores_dir)
    )
    return path


def append_to_lm_index(
    spark: SparkSession, path: str, new_docs: DataFrame
) -> None:
    """Fold a document batch into the persisted index: tokenize and
    score THE BATCH ONLY against the frozen LM tables (unseen bigrams
    and contexts take the same add-one fallbacks scoring always uses)
    and append the (doc_id, n_bg, lg_sum) rows as one delta
    generation. The corpus pays nothing; buckets need no maintenance
    because ``read_lm_buckets`` derives terciles from the current
    score set. Mirrors ivf_index.append_to_ivf_index (frozen-model
    assign); per-doc_id idempotence is the caller's contract."""
    from minoan_athenaeum_spark.operators.dedup import normalized

    tok = new_docs.select(
        "doc_id", "lang", F.split(normalized(), " ").alias("tk")
    )
    from minoan_athenaeum_spark.queries.text import ccnet_score_docs

    (
        ccnet_score_docs(_with_bigrams(tok), *_read_lm(spark, path))
        .write.mode("append")
        .parquet(os.path.join(path, "scores"))
    )


def compact_lm_scores(spark: SparkSession, path: str) -> None:
    """Rewrite accumulated score generations back into N_SCORE_FILES
    doc_id-partitioned files — rows unchanged by construction (merge is
    the identity: generations are doc-disjoint), swapped live with the
    crash-safe two-rename dance. LM tables untouched (retraining is a
    model event)."""
    sdir = os.path.join(path, "scores")
    recover_swap(sdir)
    (
        spark.read.parquet(sdir)
        .repartition(N_SCORE_FILES, F.col("doc_id"))
        .write.mode("overwrite")
        .parquet(swap_paths(sdir)[0])
    )
    swap_live(sdir)


def read_lm_scores(spark: SparkSession, path: str) -> DataFrame:
    """The maintained per-doc score table (all landed generations)."""
    return spark.read.parquet(os.path.join(path, "scores"))


def lm_tail_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The doc_ids in the 'tail' perplexity tercile, served from the
    (ensured) index — the exact gate set the curation capstones v4/v5
    anti-join against."""
    path = ensure_lm_index(spark, sf_dir)
    return (
        read_lm_buckets(spark, path)
        .where(F.col("bucket") == "tail")
        .select("doc_id")
    )


def read_lm_buckets(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, n_bg, lg_sum, bucket) — head/middle/tail terciles over
    the CURRENT score set, derived with the exact shared rank the
    from-scratch query uses. One parquet scan + two-phase rank; no LM
    featurize anywhere in the plan (pinned in tests/test_plan_shape.py)."""
    from minoan_athenaeum_spark.queries.text import ccnet_bucketize

    return ccnet_bucketize(read_lm_scores(spark, path))
