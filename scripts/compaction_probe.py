"""BM25 index compaction A/B (VERDICT r7 #4): measure the LSM
read-amplification cliff and its fix on an amplified corpus.

Builds the existing-slice BM25 index over the x{AMP} amplified
documents table (reusing scale_probe's amplified dir), folds the
arriving slice in as MANY small append generations (one delta file
each — the long-lived-ingest regime), measures the _BM25_TERMS serve
latency against the many-delta index, compacts via
compact_bm25_index, and measures the same serve against the compacted
layout. Prints one JSON line; the A/B row lives in BASELINE.md.

Usage: python scripts/compaction_probe.py [amplification] [generations]
(defaults 256 and 64; the amplified dir must exist or be buildable —
scale_probe.amplify is invoked idempotently for documents only).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.queries.text import bm25_serve_from_index
from minoan_athenaeum_spark.session import get_spark
from minoan_athenaeum_spark.sources.posting_sink import (
    append_to_bm25_index,
    compact_bm25_index,
    ensure_bm25_index,
)
from scripts.scale_probe import amplify, start_disk_guard


def _data_files(p: str) -> int:
    import glob

    return len([
        f
        for f in glob.glob(os.path.join(p, "*.parquet"))
        if not os.path.basename(f).startswith(("_", "."))
    ])


def _serve_times(spark, idx: str, reps: int = 5) -> list[float]:
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        bm25_serve_from_index(spark, idx).collect()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    gens = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    start_disk_guard(float(os.environ.get("SPARK_GRAFT_PROBE_MIN_FREE_GB", "3")))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/mas_scale_probe_x{times}"
    os.environ.setdefault("SPARK_GRAFT_AMPLIFY_TABLES", "documents")
    spark = get_spark(app_name="mas-compaction-probe")
    amplify(spark, src, out_dir, times)  # idempotent per table

    t0 = time.perf_counter()
    base = ensure_bm25_index(spark, out_dir, slice_="existing")
    t_build = round(time.perf_counter() - t0, 4)

    work = base + "_abwork"
    if os.path.isdir(work):
        shutil.rmtree(work)
    shutil.copytree(base, work)
    pdir = os.path.join(work, "postings")
    files_base = _data_files(pdir)

    arriving = load_table(spark, out_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    t0 = time.perf_counter()
    for g in range(gens):
        append_to_bm25_index(
            spark, work, arriving.filter(F.abs(F.hash("doc_id")) % gens == g)
        )
    t_appends = round(time.perf_counter() - t0, 4)
    files_delta = _data_files(pdir)

    serve_delta = _serve_times(spark, work)

    t0 = time.perf_counter()
    compact_bm25_index(spark, work)
    t_compact = round(time.perf_counter() - t0, 4)
    files_compacted = _data_files(pdir)

    serve_compacted = _serve_times(spark, work)
    spark.stop()

    print(json.dumps({
        "metric": "bm25_compaction_ab",
        "amplification": times,
        "generations": gens,
        "build_sec": t_build,
        "appends_sec": t_appends,
        "compact_sec": t_compact,
        "files_base": files_base,
        "files_many_delta": files_delta,
        "files_compacted": files_compacted,
        "serve_many_delta_sec": serve_delta,
        "serve_compacted_sec": serve_compacted,
    }))


if __name__ == "__main__":
    main()
