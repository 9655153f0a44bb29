"""Pre-bucketed-facts A/B at scale: measure the orderkey-heavy TPC-H
trio (q18, q3, q12) on raw parquet vs pre-bucketed lineitem/orders
(sources.bucketed.ensure_bucketed_facts + SPARK_GRAFT_BUCKETED_FACTS).

Runtime bloom filters are DISABLED for the whole probe so the A/B
isolates the storage layout (the r2 bloom-filter win attacks the same
shuffle from the other side). Each query runs twice per layout —
page-cache state dominates single-run numbers at this volume
(BASELINE.md r2 notes 2-3x error bars) — and the bucketize wall time
is reported as the one-time cost the layout amortizes.

Usage: python scripts/bucketed_probe.py [amplification]   # default 256
Writes one JSON line like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe import amplify

from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark
from minoan_athenaeum_spark.sources.bucketed import ensure_bucketed_facts

QUERIES = ["tpch_q18_large_orders", "agg_tpch_q3_top10", "tpch_q12_shipmode"]
RUNS = 2


def run_set(specs, spark, data_dir):
    out = {}
    for name in QUERIES:
        for r in range(RUNS):
            t0 = time.perf_counter()
            specs[name].fn(spark, data_dir).count()
            out[f"{name}_run{r}"] = round(time.perf_counter() - t0, 4)
    return out


def main() -> None:
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = f"/tmp/mas_scale_probe_x{times}"
    os.environ.pop("SPARK_GRAFT_BUCKETED_FACTS", None)
    spark = get_spark(
        app_name="mas-bucketed-probe",
        extra_conf={"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"},
    )
    t0 = time.perf_counter()
    amplify(spark, src, out_dir, times)
    print(f"# amplify x{times} ensured in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    specs = load_all()
    plain = run_set(specs, spark, out_dir)

    t0 = time.perf_counter()
    ensure_bucketed_facts(spark, out_dir, n_buckets=32)
    bucketize_sec = round(time.perf_counter() - t0, 2)
    print(f"# bucketize took {bucketize_sec}s", file=sys.stderr)

    os.environ["SPARK_GRAFT_BUCKETED_FACTS"] = "1"
    bucketed = run_set(specs, spark, out_dir)
    os.environ.pop("SPARK_GRAFT_BUCKETED_FACTS", None)
    spark.stop()

    print(
        json.dumps(
            {
                "metric": "bucketed_probe_best_of_runs_sec",
                "value": round(
                    sum(
                        min(bucketed[f"{q}_run{r}"] for r in range(RUNS))
                        for q in QUERIES
                    ),
                    4,
                ),
                "unit": "sec",
                "plain": plain,
                "bucketed": bucketed,
                "bucketize_sec": bucketize_sec,
                "amplification": times,
                "bloom_filters": "disabled",
            }
        )
    )


if __name__ == "__main__":
    main()
