"""Scale probe for the FastSS fuzzy self-join (edit distance <= 1).

Generates N synthetic distinct names ("acct-" + zero-padded id — the
realistic entity-resolution shape where dist-1 neighbors are the
single-digit typos), runs operators/fuzzy.py::fuzzy_self_join_dist1,
and reports candidate/output sizes and wall time. Output grows
linearly in N (each name has a bounded set of single-edit neighbors),
while the naive cross join would be N² — the point of the probe.

Usage: python scripts/fuzzy_probe.py [n_names]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minoan_athenaeum_spark.operators.fuzzy import fuzzy_self_join_dist1
from minoan_athenaeum_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="mas-fuzzy-probe")
    names = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("acct-"), F.lpad(F.col("id").cast("string"), 9, "0")).alias(
            "name"
        ),
    )
    t0 = time.perf_counter()
    out = fuzzy_self_join_dist1(names, "id", "name")
    agg = out.agg(
        F.count("*").alias("pairs"),
        F.sum("dist").alias("dist_sum"),
    ).first()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "fuzzy_join_probe",
        "n_names": n,
        "pairs": agg.pairs,
        "dist_sum": agg.dist_sum,
        "sec": round(dt, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
