"""Replay the external driver's correctness gate locally: run the first
50 registered queries (the curated driver window) against their DuckDB
oracles at sf0.01 and report per-query row/schema/value matches.

Usage: python scripts/window_sim.py [sf_dir] [n] [--json out.json]

``--json`` writes a checked-in-able per-query verdict record
(VERDICT r10 next-round #8: the backlog pre-validation must be an
auditable artifact under bench_records/, not a /tmp log).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from minoan_athenaeum_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: window_sim.py [sf_dir] [n] [--json out.json]")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    n = int(argv[1]) if len(argv) > 1 else 50
    spark = get_spark(app_name="mas-window-sim", cpus=16)
    qs, os_ = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    names = list(qs)[:n]
    fails = []
    record: dict[str, dict] = {}
    from collections import Counter

    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = Counter(tuple(r[c] for c in cols) for r in sdf.collect())
            if name not in os_:
                print(f"[{i + 1:2}/{n}] {name}: NO_ORACLE rows={sum(srows.values())}")
                record[name] = {
                    "verdict": "NO_ORACLE",
                    "spark_rows": sum(srows.values()),
                }
                continue
            odf = con.execute(os_[name]).fetch_arrow_table()
            ocols_all = list(odf.column_names)
            orows = Counter(
                tuple(rec[c] for c in cols) for rec in odf.to_pylist()
            )
            ok = srows == orows and sorted(ocols_all) == cols
            print(
                f"[{i + 1:2}/{n}] {name}: {'OK' if ok else 'FAIL'} "
                f"rows={sum(srows.values())}/{sum(orows.values())}"
            )
            record[name] = {
                "verdict": "OK" if ok else "FAIL",
                "spark_rows": sum(srows.values()),
                "oracle_rows": sum(orows.values()),
            }
            if not ok:
                fails.append(name)
                for row in list((srows - orows).keys())[:3]:
                    print("   spark-only :", row)
                for row in list((orows - srows).keys())[:3]:
                    print("   oracle-only:", row)
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(f"[{i + 1:2}/{n}] {name}: ERR {exc}")
            record[name] = {"verdict": "ERR", "error": str(exc)[:300]}
    print(f"\n{n - len(fails)}/{n} green; fails: {fails}")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n": n,
                    "green": n - len(fails),
                    "fails": fails,
                    "queries": record,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_out}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
