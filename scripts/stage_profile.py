"""Per-stage profile of one headline query via the Spark UI REST API.

Runs the query N times (first run = cold codegen) with the UI enabled,
then dumps every stage's name, task count, and executor-run/CPU time —
the local-mode stand-in for the guide's §7.1 stage-page reading.

Usage: python scripts/stage_profile.py <query> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark(
        app_name=f"stage-prof-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4045"},
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for i in range(runs):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        specs[name].fn(spark, sf_dir).count()
        print(f"run{i}: {time.perf_counter() - t0:.2f}s", flush=True)

    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:4045/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.load(urllib.request.urlopen(url))
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"{'stage':>6} {'tasks':>5} {'run_ms':>8} {'cpu_ms':>8} "
          f"{'shWrite':>9} {'shRead':>9}  name")
    for s in stages[:40]:
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>5} "
            f"{s.get('executorRunTime', 0):>8} "
            f"{(s.get('executorCpuTime', 0)) // 1_000_000:>8} "
            f"{s.get('shuffleWriteBytes', 0):>9} "
            f"{s.get('shuffleReadBytes', 0):>9}  "
            f"{s.get('description') or s['name'][:90]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
