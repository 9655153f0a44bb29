"""Cluster-structured minhash probe (r11/r12 BASELINE anchors, checked
in for reproducibility — the original drivers lived in /tmp).

Builds a crawl-like corpus from an sf0.1 amplification: docs 3k, 3k+1,
3k+2 share the anchor text of doc 3k extended with a high-entropy
per-cluster suffix (20 chained md5 hex blocks), giving exact-dup
clusters of 3 (66% duplication) with cross-cluster Jaccard well under
the 0.5 threshold — so the serve's VERIFIED output is linear in the
batch (~2 partners/doc). CAVEAT the r12 probe surfaced: the hex suffix
draws 3-char shingles from a 4096-element universe, which collides
minhash values across clusters and produces SUPER-LINEAR banded
candidates (~70M pre-dedup rows for a 128k-doc batch, hot buckets up
to ~3k docs) — this corpus therefore stress-tests candidate blowup in
the verify, exactly the regime the serve's backfill router exists for
(queries/dedup.py::dedup_minhash_incremental, bucket-local verify).

Usage:
    python scripts/cluster_corpus_probe.py build 256   # corpus + index (~23 min)
    python scripts/cluster_corpus_probe.py serve 256   # drive the production query, 2 reps
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["SPARK_GRAFT_AMPLIFY_TABLES"] = "documents"


def corpus_dir(times: int) -> str:
    return f"/tmp/mas_cluster_x{times}"


def build(times: int) -> None:
    from pyspark.sql import functions as F

    from minoan_athenaeum_spark.catalog import load_table
    from minoan_athenaeum_spark.session import get_spark
    from minoan_athenaeum_spark.sources.lsh_index import (
        ensure_minhash_index,
        minhash_index_path,
    )
    from scripts.scale_probe import amplify, start_disk_guard

    src = f"/tmp/mas_scale_probe_x{times}"
    dst = corpus_dir(times)
    start_disk_guard(5.0)
    spark = get_spark(app_name=f"mcl-build-{times}", cpus=32)
    amplify(spark, "/root/testdata/sf0.1", src, times)
    if not os.path.isfile(os.path.join(dst, "documents.parquet", "_SUCCESS")):
        docs = load_table(spark, src, "documents")
        anchors = docs.filter(F.col("doc_id") % 3 == 0).select(
            F.floor(F.col("doc_id") / 3).alias("_cl"),
            F.col("text").alias("_atext"),
        )
        suffix = F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(19)),
                lambda i: F.md5(
                    F.concat(
                        F.col("_cl").cast("string"), F.lit("#"), i.cast("string")
                    )
                ),
            ),
        )
        (
            docs.withColumn("_cl", F.floor(F.col("doc_id") / 3))
            .join(anchors, "_cl")
            .withColumn("text", F.concat_ws(" ", F.col("_atext"), suffix))
            .drop("_cl", "_atext")
            .write.mode("overwrite")
            .parquet(os.path.join(dst, "documents.parquet"))
        )
    p = minhash_index_path(spark, dst)
    if p and os.path.isdir(p):
        shutil.rmtree(p)
    t0 = time.perf_counter()
    ensure_minhash_index(spark, dst)
    print(f"x{times} cluster build: {time.perf_counter() - t0:.1f}s", flush=True)
    spark.stop()


def serve(times: int) -> None:
    from minoan_athenaeum_spark.queries.dedup import dedup_minhash_incremental
    from minoan_athenaeum_spark.session import get_spark
    from minoan_athenaeum_spark.sources.lsh_index import ensure_minhash_index

    dst = corpus_dir(times)
    spark = get_spark(app_name=f"mcl-serve-{times}", cpus=32)
    t0 = time.perf_counter()
    ensure_minhash_index(spark, dst)  # warm — should be ~0
    print(f"ensure (warm): {time.perf_counter() - t0:.1f}s", flush=True)
    for i in range(2):
        t = time.perf_counter()
        n = dedup_minhash_incremental(spark, dst).count()
        print(
            f"serve rep{i}: {time.perf_counter() - t:.1f}s pairs={n}", flush=True
        )
    spark.stop()


if __name__ == "__main__":
    mode, times = sys.argv[1], int(sys.argv[2])
    {"build": build, "serve": serve}[mode](times)
