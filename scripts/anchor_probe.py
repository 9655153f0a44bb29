"""Generic scale-anchor probe (VERDICT r12 #5): run named registered
queries against an amplified corpus and print per-query seconds — the
one-off measurement harness behind BASELINE.md anchor rows for queries
outside scale_probe.py's standing AMPLIFIED list.

Usage:
  SPARK_GRAFT_AMPLIFY_TABLES=documents \\
  python scripts/anchor_probe.py <amplification> <query> [query ...]

Amplifies only the tables named in SPARK_GRAFT_AMPLIFY_TABLES (comma-
separated; idempotent per table, shared /tmp/mas_scale_probe_x{N} dir
with scale_probe.py) and times each query once, in order, in one
session. Reps are the caller's job (invoke repeatedly or pass the same
query twice).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark
from scripts.scale_probe import amplify, start_disk_guard


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: anchor_probe.py <amplification> <query> [query ...]")
    times = int(sys.argv[1])
    names = sys.argv[2:]
    specs = load_all()
    unknown = [n for n in names if n not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    start_disk_guard(float(os.environ.get("SPARK_GRAFT_PROBE_MIN_FREE_GB", "3")))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/mas_scale_probe_x{times}"
    spark = get_spark(app_name="mas-anchor-probe")
    amplify(spark, src, out_dir, times)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for n in names:
        t0 = time.perf_counter()
        rows[n] = specs[n].fn(spark, out_dir).count()
        timings[n] = round(time.perf_counter() - t0, 4)
        print(f"# {n}: {timings[n]} s, {rows[n]} rows", file=sys.stderr)
    spark.stop()
    print(json.dumps({
        "metric": "anchor_probe",
        "amplification": times,
        "queries": timings,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
