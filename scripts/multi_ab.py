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

from scripts.ab_runner import PROBE_CALM, wait_calm

from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark


def main() -> None:
    label, names = sys.argv[1], sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark(app_name=f"multi-ab-{label}")
    # Warm the same inputs bench.py warms (ADVICE r13): documents AND
    # lineitem, so rep0 of TPC-H-style queries pays no cold-read cost.
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # Index-backed queries need their warehouse artifact before timing
    # (ADVICE r13): reuse bench.py's builder map so a cold/stale
    # artifact is rebuilt here, outside the timed region, instead of
    # silently timing a build or failing.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _index_builders

    builders = _index_builders()
    for name in names:
        if name in builders:
            t0 = time.perf_counter()
            builders[name](spark, sf_dir)
            print(
                f"{label} {name} index-ensure {time.perf_counter() - t0:.2f}s",
                flush=True,
            )
        best = None
        for i in range(reps):
            # 300 s gate (ADVICE r13: the 60 s override timed out under
            # sustained throttle and silently sampled non-calm windows);
            # when the gate still times out, flag the rep so recorded
            # minima can be filtered.
            p = wait_calm()
            flag = "" if p < PROBE_CALM else " NOT-CALM"
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(
                f"{label} {name} rep{i} {dt:.2f}s (probe {p:.2f}){flag}",
                flush=True,
            )
        print(f"{label} {name} MIN {best:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
