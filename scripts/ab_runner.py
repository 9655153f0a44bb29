"""Probe-gated interleaved A/B runner for this box's steal bursts.

Alternates two git states (A = committed HEAD via `git stash`-free
worktree assumption is NOT used — instead the caller passes two env
markers and this script just runs the CURRENT tree) — in practice:
run it once per tree state, interleaved by the caller. What it DOES
gate is ambient noise: before every timed run it busy-probes one core
and sleeps until the probe lands under the threshold, so every sample
is taken in a calm window.

Usage: python scripts/ab_runner.py <label> <query> [reps]
Prints one line per rep: "<label> <query> rep<i> <sec>".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark

PROBE_N = 5_000_000
PROBE_CALM = 0.45  # sec; ~0.15-0.25 s when the box is healthy


def probe() -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(PROBE_N):
        s += i
    return time.perf_counter() - t0


def wait_calm(max_wait: float = 300.0) -> float:
    t0 = time.perf_counter()
    while True:
        p = probe()
        if p < PROBE_CALM or time.perf_counter() - t0 > max_wait:
            return p
        time.sleep(5)


def main() -> None:
    label, name = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark(app_name=f"ab-{label}-{name}")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for i in range(reps):
        p = wait_calm()
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        print(f"{label} {name} rep{i} {dt:.2f}s (probe {p:.2f})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
