"""Scale probe for the text-index family (VERDICT r6 #8): substring
spans, CCNet perplexity buckets (ratio + log), BM25 indexed serve
(cold build + warm serve), and the bounded per-shard suffix array, at
amplified documents scale (expects /tmp/mas_scale_probe_x<N> built by
scripts/scale_probe.py --amplify-only).

Usage: python scripts/text_index_probe.py <amplification> [query ...]
Prints one JSON line: {"amplification": N, "n_docs": ..., "queries":
{name: sec}}. BM25 runs twice (build+serve, then warm serve). The
sharded suffix array uses a doc_id-mod shard key sized to keep each
shard's corpus near the documented per-task ceiling.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark

DEFAULT = [
    "dedup_substring_spans",
    "text_ccnet_ppl_buckets",
    "text_ccnet_ppl_buckets_log",
    "text_bm25_search_indexed",
    "text_bm25_search_indexed:warm",
    "suffix_sharded",
]


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    names = [a for a in sys.argv[2:] if not a.startswith("-")] or DEFAULT
    sf_dir = f"/tmp/mas_scale_probe_x{times}"
    assert os.path.isdir(os.path.join(sf_dir, "documents.parquet")), sf_dir
    spark = get_spark(app_name=f"mas-text-probe-{times}")
    specs = load_all()
    n_docs = load_table(spark, sf_dir, "documents").count()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        if name == "suffix_sharded":
            # bounded shards: ~2M chars of corpus per shard (well under
            # the ~1 GB/task ceiling; small enough that shard COUNT,
            # not shard size, carries the scale)
            from minoan_athenaeum_spark.operators.dedup import normalized
            from minoan_athenaeum_spark.operators.suffixarray import (
                sharded_suffix_ranks,
            )

            docs = load_table(spark, sf_dir, "documents").select(
                "doc_id", normalized().alias("txt")
            )
            total_chars = docs.agg(
                F.sum(F.length("txt")).alias("c")
            ).collect()[0]["c"]
            n_shards = max(1, int(total_chars // 2_000_000))
            sharded = docs.withColumn(
                "shard", (F.col("doc_id") % n_shards).cast("string")
            )
            cnt = sharded_suffix_ranks(
                sharded, shard_col="shard", text_col="txt"
            ).count()
            timings["suffix_sharded"] = round(time.perf_counter() - t0, 2)
            timings["suffix_sharded_positions"] = cnt
            timings["suffix_sharded_n_shards"] = n_shards
            continue
        qname = name.split(":")[0]
        specs[qname].fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "metric": "text_index_probe",
                "amplification": times,
                "n_docs": n_docs,
                "queries": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
