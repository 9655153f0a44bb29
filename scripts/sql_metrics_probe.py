"""Dump per-node SQL metrics for repeated runs of one query via the
Spark UI REST API — catches plan-shape/metric differences between
bimodal fast and slow executions of the same code.

Usage: python scripts/sql_metrics_probe.py <query> [runs]
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
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    spark = get_spark(
        app_name=f"sqlprobe-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4046"},
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        specs[name].fn(spark, sf_dir).count()
        times.append(time.perf_counter() - t0)
        print(f"run{i}: {times[-1]:.2f}s", flush=True)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4046/api/v1/applications/{app_id}/sql"
    execs = json.load(urllib.request.urlopen(f"{base}?length=200"))
    # one SQL execution per run (count actions) — keep the big ones
    execs = [e for e in execs if e.get("duration", 0) > 1500]
    execs.sort(key=lambda e: e["id"])
    for e in execs:
        detail = json.load(
            urllib.request.urlopen(f"{base}/{e['id']}?details=true&planDescription=false")
        )
        print(f"\n=== execution {e['id']} duration={e['duration']}ms "
              f"desc={e.get('description', '')[:60]}")
        nodes = detail.get("nodes", [])
        rows = []
        for n in nodes:
            mt = {m["name"]: m["value"] for m in n.get("metrics", [])}
            tt = mt.get("time to build hash map total") or mt.get(
                "time in aggregation build total"
            )
            interesting = {
                k: v
                for k, v in mt.items()
                if any(
                    s in k
                    for s in (
                        "total time",
                        "time total",
                        "scan time",
                        "task total time",
                        "build time",
                        "collect time",
                        "broadcast time",
                        "number of output rows",
                    )
                )
            }
            rows.append((n["nodeId"], n["nodeName"], interesting))
        for nid, nname, mt in rows:
            if mt:
                print(f"  [{nid:>3}] {nname[:50]:50s} {mt}")
    spark.stop()


if __name__ == "__main__":
    main()
