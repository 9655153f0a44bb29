"""Multi-query calm-gated isolated re-measure (one Spark session).

Same probe gate as ab_runner.py but loops a query LIST, so a sweep of
isolated per-query minima costs one JVM/session startup instead of one
per query. Usage:

    python scripts/multi_ab.py <label> <query1,query2,...> [reps]

Prints one line per rep: "<label> <query> rep<i> <sec> (probe <p>)".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.ab_runner import wait_calm

from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark


def main() -> None:
    label, names = sys.argv[1], sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark(app_name=f"multi-ab-{label}")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for name in names:
        best = None
        for i in range(reps):
            p = wait_calm(max_wait=60.0)
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"{label} {name} rep{i} {dt:.2f}s (probe {p:.2f})", flush=True)
        print(f"{label} {name} MIN {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
