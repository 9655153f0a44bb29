"""CLI entry point with reference-parity behavior.

Usage:
    python -m minoan_athenaeum_spark.cli <query.sql|query.json> [options]

Pipeline (reference: sql-to-json | database.py two-stage pipe,
/root/reference/README.md:17-26): parse dialect SQL → validate →
load ``<table>.table.json`` files from --tables-dir (default CWD,
matching the reference's CWD-relative catalog) → execute on Spark →
print ``- Loaded ...`` preamble + aligned text table on stdout.
User errors print to stderr and exit 1
(reference error channel /root/reference/database.py:147-152).

Pipe parity with the reference's two-stage flow:
  * ``--emit-json``: parse only and print the JSON AST byte-identically
    to the reference's ``sql-to-json`` (no Spark session); parse errors
    use the reference's ``line {}, col {}: {}`` stderr envelope
    (/root/reference/sql-to-json:54-56).
  * a ``.json`` input file is treated as a pre-parsed AST (the
    reference executor's input, ``read_input``
    /root/reference/database.py:129-137), so existing ``query.json``
    files produced by the reference toolchain run unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="minoan-athenaeum-spark")
    ap.add_argument("query_file")
    ap.add_argument("--tables-dir", default=".")
    ap.add_argument("--cpus", default="4")
    ap.add_argument(
        "--emit-json",
        action="store_true",
        help="parse the SQL and print the reference-shape JSON AST "
        "(the sql-to-json stage of the reference pipe), then exit",
    )
    args = ap.parse_args(argv)

    from minoan_athenaeum_spark.plans.ast_json import emit_json, from_reference_ast
    from minoan_athenaeum_spark.plans.dialect import DialectError, ParseError, parse

    if args.emit_json:
        try:
            with open(args.query_file, "rb") as f:
                raw = f.read()
        except OSError as e:
            print(
                f'Unable to read from "{args.query_file}": {e.strerror}',
                file=sys.stderr,
            )
            return 1
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError as e:
            print(
                "Expected standard input to be valid UTF-8, but it wasn't.\n"
                f"{e}",
                file=sys.stderr,
            )
            return 1
        try:
            sys.stdout.write(emit_json(parse(text)))
            return 0
        except ParseError as e:
            print(e.reference_text(), file=sys.stderr)
            return 1
        except DialectError as e:
            print(str(e), file=sys.stderr)
            return 1

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
        if args.query_file.endswith(".json"):
            try:
                ast = json.loads(text)
            except json.JSONDecodeError:
                print(
                    f'Input file "{args.query_file}" is not valid.',
                    file=sys.stderr,
                )
                return 1
            q = from_reference_ast(ast)
        else:
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
