"""Snapshot .explain("formatted") for every headline query into
plans/r14/<query>_<tag>.txt — the optimization round's before/after
plan evidence (OPTIMIZATION_r14.md references these files).

Usage: python scripts/r14_plan_snap.py <tag> [query ...]
  tag    "before" or "after" (suffix of the snapshot files)
  query  optional subset; default = the full headline set
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from minoan_athenaeum_spark.registry import load_all
from minoan_athenaeum_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    specs = load_all()
    spark = get_spark(app_name=f"r14-plan-snap-{tag}")
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
