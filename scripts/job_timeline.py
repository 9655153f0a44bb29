"""Job-level timeline of one warm query run: prints each job's
submit/complete offsets and the GAPS between jobs (driver-side
planning/codegen/collect time the stage view can't show).

Usage: python scripts/job_timeline.py <query> [warmups]
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
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark(
        app_name=f"timeline-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for i in range(warm):
        specs[name].fn(spark, sf_dir).count()
    spark.sparkContext.setJobDescription(f"{name} TIMED")
    t0 = time.perf_counter()
    specs[name].fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    print(f"timed run: {wall:.2f}s")

    app_id = spark.sparkContext.applicationId
    jobs = json.load(
        urllib.request.urlopen(
            f"http://localhost:4047/api/v1/applications/{app_id}/jobs"
        )
    )
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()

    timed = [j for j in jobs if (j.get("description") or "").endswith("TIMED")]
    timed.sort(key=lambda j: j["jobId"])
    if not timed:
        print("no TIMED jobs found")
        return
    start = ts(timed[0]["submissionTime"])
    prev_end = None
    gap_total = 0.0
    for j in timed:
        s, e = ts(j["submissionTime"]) - start, ts(j["completionTime"]) - start
        gap = (s - prev_end) if prev_end is not None else 0.0
        gap_total += max(gap, 0)
        print(
            f"job {j['jobId']:>4} {s:7.2f} -> {e:7.2f}  "
            f"({e - s:5.2f}s run, gap {gap:5.2f}s)  stages={j['stageIds']}"
        )
        prev_end = max(prev_end or 0, e)
    print(f"jobs span {prev_end:.2f}s of {wall:.2f}s wall; inter-job gaps {gap_total:.2f}s; "
          f"pre-first-job {ts(timed[0]['submissionTime']) - start:.2f}s after fn-call start unknown")
    spark.stop()


if __name__ == "__main__":
    main()
