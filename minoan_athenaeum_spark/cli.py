"""CLI entry point with reference-parity behavior.

Usage:
    python -m minoan_athenaeum_spark.cli <query.sql> [--tables-dir DIR]

Pipeline (reference: sql-to-json | database.py two-stage pipe,
/root/reference/README.md:17-26): parse dialect SQL → validate →
load ``<table>.table.json`` files from --tables-dir (default CWD,
matching the reference's CWD-relative catalog) → execute on Spark →
print ``- Loaded ...`` preamble + aligned text table on stdout.
User errors print to stderr and exit 1
(reference error channel /root/reference/database.py:147-152).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="minoan-athenaeum-spark")
    ap.add_argument("query_file")
    ap.add_argument("--tables-dir", default=".")
    ap.add_argument("--cpus", default="4")
    args = ap.parse_args(argv)

    from minoan_athenaeum_spark.plans.dialect import DialectError, parse
    from minoan_athenaeum_spark.plans.executor import Executor, check_duplicate_aliases
    from minoan_athenaeum_spark.session import get_spark
    from minoan_athenaeum_spark.sink import format_results
    from minoan_athenaeum_spark.sources.table_json import (
        load_table_json,
        resolve_table_path,
    )

    try:
        with open(args.query_file) as f:
            text = f.read()
    except OSError:
        print(f'Input file "{args.query_file}" is not valid.', file=sys.stderr)
        return 1

    spark = get_spark(app_name="mas-cli", cpus=args.cpus)
    try:
        q = parse(text)
        check_duplicate_aliases(q)
        tables = {}
        loaded_files: set[str] = set()
        for tref in q.tables:
            path = resolve_table_path(args.tables_dir, tref.name)
            df, n_rows = load_table_json(spark, path, tref.name)
            if f"{tref.name}.table.json" not in loaded_files:
                loaded_files.add(f"{tref.name}.table.json")
                print(f'- Loaded "{tref.name}.table.json", {n_rows} rows.')
            tables[tref.effective_name] = df
        result = Executor(tables).plan(q)
        print(format_results(result))
        return 0
    except DialectError as e:
        print(str(e), file=sys.stderr)
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
