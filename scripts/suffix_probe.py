"""Scale probe for the distributed suffix array (prefix doubling).

Builds a corpus of the first N documents of an (optionally amplified)
documents table, runs operators/suffixarray.py over it, and reports
corpus length, doubling rounds executed, wall time, and a permutation
checksum. The interesting scale behavior: replicated documents keep
rank ties alive until the doubling window spans a whole document
(~2^9), so amplified corpora force deep rounds — the adversarial case
for the early-exit probe.

Usage: python scripts/suffix_probe.py [n_docs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.operators.dedup import normalized
from minoan_athenaeum_spark.operators.suffixarray import (
    corpus_positions,
    suffix_array,
)
from minoan_athenaeum_spark.session import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="mas-suffix-probe")
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", normalized().alias("txt"))
        .orderBy("doc_id")
        .limit(n_docs)
    )
    t0 = time.perf_counter()
    chars = corpus_positions(docs).persist()
    n = chars.count()
    t_explode = time.perf_counter() - t0

    t0 = time.perf_counter()
    sa = suffix_array(chars, n)
    # permutation checksum: ranks must be exactly 0..n-1 once each
    agg = sa.agg(
        F.count("*").alias("rows"),
        F.sum("rank").alias("rank_sum"),
        F.expr("bit_xor(xxhash64(pos, rank))").alias("xor"),
    ).first()
    t_sa = time.perf_counter() - t0
    chars.unpersist()
    ok = agg.rows == n and agg.rank_sum == n * (n - 1) // 2
    print(json.dumps({
        "metric": "suffix_array_probe",
        "n_docs": n_docs,
        "corpus_chars": n,
        "explode_sec": round(t_explode, 2),
        "suffix_array_sec": round(t_sa, 2),
        "permutation_ok": ok,
        "xor": agg.xor,
        "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
