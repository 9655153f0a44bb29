"""MinHash-LSH index compaction A/B (VERDICT r12 #2): measure the LSM
generation-growth penalty and its fix for the seventh-to-get-compaction
family, with the same protocol as the BM25/line probes.

Builds the existing-slice band index over the x{AMP} amplified
documents table, folds the arriving slice in as MANY small append
generations (one band file + one shingle file each — the long-lived
ingest regime), measures the dedup_minhash_incremental serve against
the many-delta index, compacts via compact_minhash_index, and measures
the same serve against the compacted layout. The serve is pointed at
the A/B work copy by patching minhash_index_path (the fingerprinted
real index stays pristine). Prints one JSON line; the A/B row lives in
BASELINE.md.

AMPLIFICATION CHOICE: replica amplification makes every document an
exact dup of its N copies, so the minhash serve's CANDIDATE count is
QUADRATIC in N by construction (the standing scale_probe caveat) —
sf0.1's 431k candidate pairs become ~431k·N² replica-cross pairs. At
256× that drowned the file-count signal outright, and a 16× attempt
(~110M candidates; the batch's cached bytes also crossed the 256 MB
broadcast ceiling, routing the serve down the backfill path) still ran
>10 min/rep — both measured r13, both killed. Default is therefore 4×
(~6.9M candidates, serve in the tens-of-seconds band, micro-batch
route) with the GENERATION COUNT, not the corpus, as the scaled
variable: the LSM read-amplification penalty is a file-count
phenomenon (BM25 256-generation row, BASELINE.md r8).

WARM vs COLD: with the OS page cache warm the serve is verify-bound
(6.9M replica-cross candidates at 4×) and the 12-vs-1397-file layouts
time statistically flat — the LSM penalty is a COLD-path phenomenon
(the BM25 264-generation row was measured the same way). The A/B
therefore snapshots the many-delta layout before compacting and ends
with two COLD single-rep serves (sync + drop_caches, each in a FRESH
subprocess so Spark's in-session FileStatusCache can't mask the
listing/footer cost): many-delta vs compacted.

Usage: python scripts/lsh_compaction_probe.py [amplification] [generations]
(defaults 4 and 64). Internal: `cold <index_dir> <corpus_dir>` runs
one cold serve against an explicit index layout and prints JSON.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.session import get_spark
from minoan_athenaeum_spark.sources import lsh_index
from scripts.scale_probe import amplify, start_disk_guard


def _data_files(p: str) -> int:
    return len([
        f
        for f in glob.glob(os.path.join(p, "*.parquet"))
        if not os.path.basename(f).startswith(("_", "."))
    ])


def _serve_times(spark, out_dir: str, reps: int = 3) -> list[float]:
    from minoan_athenaeum_spark.queries.dedup import dedup_minhash_incremental

    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        dedup_minhash_incremental(spark, out_dir).count()
        out.append(round(time.perf_counter() - t0, 4))
    return out


def _drop_caches() -> bool:
    try:
        os.system("sync")
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False  # unprivileged box: cold numbers become warm-ish


def cold_serve(index_dir: str, corpus_dir: str) -> None:
    """One serve rep against an explicit index layout, page cache
    dropped, fresh JVM (no FileStatusCache carry-over). Prints JSON."""
    from minoan_athenaeum_spark.session import get_spark

    dropped = _drop_caches()
    lsh_index.minhash_index_path = lambda s, d: index_dir
    spark = get_spark(app_name="mas-lsh-cold-serve")
    from minoan_athenaeum_spark.queries.dedup import dedup_minhash_incremental

    t0 = time.perf_counter()
    n = dedup_minhash_incremental(spark, corpus_dir).count()
    dt = round(time.perf_counter() - t0, 4)
    spark.stop()
    print(json.dumps({
        "metric": "lsh_cold_serve",
        "index_dir": index_dir,
        "cache_dropped": dropped,
        "serve_sec": dt,
        "pairs": n,
    }))


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    gens = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    start_disk_guard(float(os.environ.get("SPARK_GRAFT_PROBE_MIN_FREE_GB", "3")))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/mas_scale_probe_x{times}"
    os.environ.setdefault("SPARK_GRAFT_AMPLIFY_TABLES", "documents")
    spark = get_spark(app_name="mas-lsh-compaction-probe")
    amplify(spark, src, out_dir, times)  # idempotent per table

    t0 = time.perf_counter()
    base = lsh_index.ensure_minhash_index(spark, out_dir)
    t_build = round(time.perf_counter() - t0, 4)

    work = base + "_abwork"
    if os.path.isdir(work):
        shutil.rmtree(work)
    shutil.copytree(base, work)
    bdir, sdir = os.path.join(work, "bands"), os.path.join(work, "shingles")
    files_base = _data_files(bdir) + _data_files(sdir)

    # route every subsequent ensure/serve at the work copy
    real_path_fn = lsh_index.minhash_index_path
    lsh_index.minhash_index_path = lambda s, d: work if d == out_dir else real_path_fn(s, d)

    arriving = load_table(spark, out_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    t0 = time.perf_counter()
    for g in range(gens):
        lsh_index.append_to_minhash_index(
            spark, work, arriving.filter(F.abs(F.hash("doc_id")) % gens == g)
        )
    t_appends = round(time.perf_counter() - t0, 4)
    files_delta = _data_files(bdir) + _data_files(sdir)

    serve_delta = _serve_times(spark, out_dir)

    # snapshot the many-delta layout for the cold A/B before compacting
    work_delta = work + "_delta"
    if os.path.isdir(work_delta):
        shutil.rmtree(work_delta)
    shutil.copytree(work, work_delta)

    t0 = time.perf_counter()
    lsh_index.compact_minhash_index(spark, work)
    t_compact = round(time.perf_counter() - t0, 4)
    files_compacted = _data_files(bdir) + _data_files(sdir)

    serve_compacted = _serve_times(spark, out_dir)
    spark.stop()

    # cold single-rep serves, fresh subprocess each (see module doc)
    import subprocess

    cold = {}
    for label, layout in (("many_delta", work_delta), ("compacted", work)):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "cold", layout, out_dir],
            capture_output=True,
            text=True,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        cold[label] = json.loads(line[-1]) if line else {"err": r.stderr[-500:]}
    shutil.rmtree(work_delta, ignore_errors=True)

    print(json.dumps({
        "metric": "lsh_compaction_ab",
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
        "cold_serve": cold,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cold":
        cold_serve(sys.argv[2], sys.argv[3])
    else:
        main()
