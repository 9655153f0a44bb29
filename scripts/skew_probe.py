"""Skew-join A/B probe (VERDICT r3 #4): a deliberately skewed
fact ⋈ dim — 90% of fact rows share ONE key — timed three ways on the
same synthetic data, broadcast disabled so a real shuffle join happens:

  1. no mitigation   — AQE skew-join OFF: the hot key's partition lands
                       on one reducer (the straggler a 100 TB job dies
                       on);
  2. AQE skew split  — spark.sql.adaptive.skewJoin.enabled: runtime
                       re-plan splits the hot partition
                       (AQEShuffleRead ... skewed, pinned in
                       tests/test_skew_and_sink.py);
  3. salting         — operators/skew.salted_join: the compile-time
                       rewrite for cases AQE can't re-plan.

All three must produce the identical aggregate, and the probe asserts
it. Prints one JSON line with per-path seconds.

Usage:  python scripts/skew_probe.py [rows_millions]   (default 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.skew import salted_join
from minoan_athenaeum_spark.session import get_spark

N_KEYS = 1000


def make_inputs(spark, n_rows: int):
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 224).alias("dimval"),
    )
    return fact, dim


def agg_of(joined):
    # The aggregate must read both payloads so the shuffle carries real
    # bytes (a pruned key-only shuffle of a constant compresses below
    # every skew threshold).
    return joined.groupBy().agg(
        F.count("*").alias("rows"),
        F.sum(F.length("payload") + F.length("dimval")).alias("bytes_sum"),
    )


def run(path: str, spark, n_rows: int, skew_on: bool, salted: bool):
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    fact, dim = make_inputs(spark, n_rows)
    t0 = time.time()
    if salted:
        # salted_join resolves keys by name, so the dim key needs a
        # distinct name from the fact key
        joined = salted_join(
            fact, dim.withColumnRenamed("k", "dk"), "k", "dk", salt_buckets=32
        )
    else:
        joined = fact.join(dim, "k")
    q = agg_of(joined)
    row = q.collect()[0]
    secs = round(time.time() - t0, 2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    skewed_read = any(
        "AQEShuffleRead" in ln and "skewed" in ln for ln in plan.splitlines()
    )
    return {"path": path, "sec": secs, "rows": row.rows,
            "bytes_sum": row.bytes_sum, "skewed_read": skewed_read}


def main():
    n_rows = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 64_000_000
    spark = get_spark(app_name="skew-probe")
    for k, v in {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # production-shaped thresholds: the hot partition at 64M rows is
        # multi-GB, far beyond the 256MB default threshold, so no toy
        # tuning is needed — only the force flag because the probe's
        # aggregate adds a post-join shuffle.
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }.items():
        spark.conf.set(k, v)

    results = [
        run("no_mitigation", spark, n_rows, skew_on=False, salted=False),
        run("aqe_skew_split", spark, n_rows, skew_on=True, salted=False),
        run("salted_join", spark, n_rows, skew_on=False, salted=True),
    ]
    answers = {(r["rows"], r["bytes_sum"]) for r in results}
    assert len(answers) == 1, f"paths disagree: {results}"
    assert results[1]["skewed_read"], "AQE path did not split the hot partition"

    print(json.dumps({
        "metric": "skew_join_ab",
        "rows": n_rows,
        "unit": "sec",
        "paths": {r["path"]: r["sec"] for r in results},
        "skewed_read_in_aqe_path": results[1]["skewed_read"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
