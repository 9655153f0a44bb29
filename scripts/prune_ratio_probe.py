"""Length-prune candidate-reduction probe (VERDICT r12 #3): measure
how many exact-Jaccard verifies the provably-exact LENGTH filter
(2*min(|A|,|B|) >= max(|A|,|B|), the set-similarity-join bound — see
the adjudication note in queries/dedup.py::dedup_minhash_incremental)
eliminates before the array_intersect runs, on a given corpus.

Reproduces the serve's candidate stage from the SAME library helpers
(shingled / hashed_shingles / band_rows) against the production index,
then counts four checkpoints:

  banded_rows     candidate rows out of the bucket join, PRE pair-dedup
                  (what the backfill bucket-local verify actually scans)
  cand_pairs      distinct (a, b) pairs (what the micro-batch path
                  verifies)
  after_prune     pairs surviving the length filter = exact intersects
                  actually paid
  final_pairs     pairs with exact J >= 0.5 (must equal the registered
                  query's output — the prune is a provable superset)

Usage: python scripts/prune_ratio_probe.py <corpus_dir> [--serve-reps N]
(corpus_dir e.g. /root/testdata/sf0.1 or /tmp/mas_cluster_x256; with
--serve-reps the registered dedup_minhash_incremental is also timed.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        sys.exit("usage: prune_ratio_probe.py <corpus_dir> [--serve-reps N]")
    src = args[0]
    reps = 0
    if "--serve-reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--serve-reps") + 1])

    os.environ.setdefault("SPARK_GRAFT_AMPLIFY_TABLES", "documents")
    from minoan_athenaeum_spark.catalog import load_table
    from minoan_athenaeum_spark.operators.dedup import jaccard
    from minoan_athenaeum_spark.session import get_spark
    from minoan_athenaeum_spark.sources.lsh_index import (
        band_rows,
        ensure_minhash_index,
        hashed_shingles,
        shingled,
    )

    spark = get_spark(app_name="mas-prune-ratio-probe")
    t0 = time.perf_counter()
    idx_path = ensure_minhash_index(spark, src)
    t_ensure = round(time.perf_counter() - t0, 2)
    idx_bands = spark.read.parquet(os.path.join(idx_path, "bands"))
    idx_sh = spark.read.parquet(os.path.join(idx_path, "shingles"))

    # string shingles once (band keys hash the STRINGS via the md5
    # minhash convention); the hashed-long form feeds the verify side
    batch_str = shingled(
        load_table(spark, src, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .repartition(spark.sparkContext.defaultParallelism)
    ).persist()
    batch_sh = batch_str.select(
        "doc_id", hashed_shingles(F.col("sh")).alias("sh")
    ).persist()
    n_batch = batch_sh.count()
    new_keys = band_rows(batch_str).select("bucket", F.col("doc_id").alias("b"))

    # BUCKET-LOCAL counting shape (the backfill verify's plan — per-PAIR
    # payload joins die on candidate-blowup corpora like the 256×
    # cluster probe): payloads ride the band rows, the length filter and
    # guarded Jaccard evaluate inside the bucket join, and the pair-
    # level distincts aggregate id-only structs in one pass.
    a_rows = idx_bands.join(
        idx_sh.select("doc_id", F.col("sh").alias("a_sh")), "doc_id"
    ).select("bucket", F.col("doc_id").alias("a"), "a_sh")
    b_rows = new_keys.join(
        batch_sh.select(F.col("doc_id").alias("_bd"), F.col("sh").alias("b_sh")),
        new_keys["b"] == F.col("_bd"),
    ).select("bucket", "b", "b_sh")
    sa, sb = F.size(F.col("a_sh")), F.size(F.col("b_sh"))
    survives = F.least(sa, sb) * 2 >= F.greatest(sa, sb)
    is_final = survives & (jaccard(F.col("a_sh"), F.col("b_sh")) >= 0.5)
    pair = F.struct(F.col("a"), F.col("b"))
    counted = (
        a_rows.join(b_rows, "bucket")
        .select("a", "b", survives.alias("sv"), is_final.alias("fin"))
        .agg(
            F.count("*").alias("banded_rows"),
            F.count_distinct(pair).alias("cand_pairs"),
            F.count_distinct(F.when(F.col("sv"), pair)).alias("after_prune"),
            F.count_distinct(F.when(F.col("fin"), pair)).alias("final_pairs"),
        )
    )
    t0 = time.perf_counter()
    row = counted.collect()[0]
    t_verify = round(time.perf_counter() - t0, 2)
    n_banded = int(row["banded_rows"])

    serve_secs, serve_pairs = [], None
    if reps:
        from minoan_athenaeum_spark.queries.dedup import (
            dedup_minhash_incremental,
        )

        for _ in range(reps):
            t0 = time.perf_counter()
            serve_pairs = dedup_minhash_incremental(spark, src).count()
            serve_secs.append(round(time.perf_counter() - t0, 2))
    spark.stop()

    print(json.dumps({
        "metric": "length_prune_ratio",
        "corpus": src,
        "batch_docs": n_batch,
        "ensure_sec": t_ensure,
        "banded_rows": n_banded,
        "cand_pairs": int(row["cand_pairs"]),
        "after_prune": int(row["after_prune"]),
        "final_pairs": int(row["final_pairs"]),
        "count_stage_sec": t_verify,
        "serve_secs": serve_secs,
        "serve_pairs": serve_pairs,
    }))


if __name__ == "__main__":
    main()
