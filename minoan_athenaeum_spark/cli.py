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


def _debug_dump(path: str, table_file_name: str) -> None:
    """-d debug dump of the load internals, mirroring the reference's
    DEBUG block (database.py:973-989): green Loaded banner, then the
    per-column metadata (ordinal, type, max value width), the columnar
    (value, row_id) data, the distinct-value sets, and the key-sorted
    value→row_ids reverse index — each long structure shortened to one
    70-char line like the reference's write_debug_short. Unpinned by
    goldens (the reference ships no -d .out files), so this renders the
    same structures with the same labels rather than byte-exact text."""
    import textwrap

    short = lambda x: textwrap.shorten(str(x), width=70)  # noqa: E731
    raw = json.load(open(path))
    header, rows = raw[0], raw[1:]
    names = [c[0] for c in header]
    types = [c[1] for c in header]
    metadata = {
        n: (i, types[i], max((len(str(r[i])) for r in rows), default=0))
        for i, n in enumerate(names)
    }
    columns = [[(r[i], rid) for rid, r in enumerate(rows)] for i in range(len(names))]
    column_sets = [sorted({r[i] for r in rows}, key=str) for i in range(len(names))]
    reverse = []
    for i in range(len(names)):
        idx: dict = {}
        for rid, r in enumerate(rows):
            idx.setdefault(r[i], []).append(rid)
        reverse.append({k: idx[k] for k in sorted(idx, key=str)})
    print(f'\x1b[92mLoaded "{table_file_name}"\x1b[0m')
    print()
    print("- metadata")
    print(metadata)
    print()
    print("- data colums")  # sic — the reference's label, database.py:979
    for column in columns:
        print(short(column))
    print()
    print("- data column_sets")
    print(short(column_sets))
    print()
    print("- data sorted_column_reverse_index")
    print(short(reverse))
    print()


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
    ap.add_argument(
        "-d",
        action="store_true",
        dest="debug",
        help="debug mode: dump per-table load internals (metadata, "
        "column data, distinct sets, reverse index) before the Loaded "
        "line — the reference's -d flag (database.py:27-45,973-989). "
        "The reference's debug output is not pinned by any golden, so "
        "this prints the same structures in the same order/labels "
        "rather than byte-identical text",
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
                if args.debug:
                    _debug_dump(path, f"{tref.name}.table.json")
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
