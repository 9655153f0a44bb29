"""GLOBAL suffix-array + LCP binary-lifting scaling probe (VERDICT
r12 #5): the registered text_lcp_adjacent query pins its corpus to
doc_id < 40 (so its oracle's brute compare stays cheap), which means
amplified-corpus runs never grow its SA work. This probe drives the
OPERATOR — corpus_positions → suffix_array_tables → lcp_adjacent — on
geometrically growing document counts of the sf0.1 corpus to measure
where the global doubling ranks' declared ceiling (bounded corpora —
operators/suffixarray.py) actually bites on this box.

Usage: python scripts/lcp_scaling_probe.py [n_docs ...]
(default 40 160 640 2560; each step reports positions, SA rounds
time, LCP time.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minoan_athenaeum_spark.catalog import load_table
from minoan_athenaeum_spark.operators.dedup import normalized
from minoan_athenaeum_spark.operators.suffixarray import (
    corpus_positions,
    lcp_adjacent,
    suffix_array_tables,
)
from minoan_athenaeum_spark.session import get_spark


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [40, 160, 640, 2560]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="mas-lcp-scaling-probe")
    out = []
    for nd in sizes:
        docs = (
            load_table(spark, src, "documents")
            .filter(F.col("doc_id") < nd)
            .select("doc_id", normalized().alias("txt"))
        )
        chars = corpus_positions(docs, id_col="doc_id", text_col="txt").persist()
        n = chars.count()
        t0 = time.perf_counter()
        _ranks, tables = suffix_array_tables(chars, n)
        # materialize the last doubling table (the build's real cost —
        # suffix_array_tables checkpoints each round internally)
        t_sa = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        n_lcp = lcp_adjacent(tables).count()
        t_lcp = round(time.perf_counter() - t0, 4)
        chars.unpersist()
        rec = {
            "n_docs": nd,
            "positions": n,
            "sa_rounds_sec": t_sa,
            "lcp_sec": t_lcp,
            "lcp_rows": n_lcp,
        }
        print(f"# {rec}", file=sys.stderr)
        out.append(rec)
    spark.stop()
    print(json.dumps({"metric": "lcp_scaling", "steps": out}))


if __name__ == "__main__":
    main()
