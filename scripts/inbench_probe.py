"""In-bench reproduction harness for the dedup_minhash_incremental
regression (VERDICT r13 #1). Replays bench.py's exact loop (same
session, same warm-up, same index ensures, same order) up to and
including a TARGET query, runs the target N times, and prints one line
per query plus a single-core calm probe before/after the target — so
an in-bench slowdown can be separated from ambient throttle. Usage:

    SPARK_GRAFT_AQE_MIN_PARTITION=64KB python scripts/inbench_probe.py [target] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.ab_runner import probe

from bench import HEADLINE, _index_builders
from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else "dedup_minhash_incremental"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark(app_name="inbench-probe")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    import pandas as _pd  # noqa: F401

    def _warm(batches):
        import numpy as _np  # noqa: F401

        yield from batches

    par = spark.sparkContext.defaultParallelism
    spark.range(par * 4, numPartitions=par).mapInPandas(_warm, "id long").count()

    builders = _index_builders()
    floor = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    )
    print(f"minPartitionSize={floor}", flush=True)
    upto = HEADLINE.index(target)
    for name in HEADLINE[: upto + 1]:
        if name in builders:
            builders[name](spark, sf_dir)
        n = reps if name == target else 1
        if name == target:
            print(f"probe-before {probe():.3f}s", flush=True)
        for i in range(n):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            print(f"{name} rep{i} {dt:.2f}s", flush=True)
        if name == target:
            print(f"probe-after {probe():.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
