"""Reference-AST JSON emit / ingest — the `sql-to-json` pipe boundary.

The reference is a two-stage pipe: ``sql-to-json q.sql > q.json`` then
the executor consumes the JSON AST (``/root/reference/README.md:17-26``,
AST shape documented at ``README.md:63-94``, pretty-printer observable
output pinned by ``/root/reference/sql-to-json:397-438``). This module
gives our engine the same boundary: ``emit_json`` renders a parsed
:class:`~minoan_athenaeum_spark.plans.dialect.Query` byte-identically to
the reference's printer (verified against captured goldens in
``tests/goldens/ast/``), and ``from_reference_ast`` accepts a
pre-parsed ``query.json`` so a reference user's existing JSON files run
unchanged.

Rendering rules (re-expressed from the documented shape + observed
output, not ported code): objects/arrays indent by 4 per level, one
key/element per line — except *leaf* values (Selector/TableRef sources,
Comparison terms), which render compactly on a single line.

Extension surface: our dialect also parses GROUP BY / COUNT / SUM (the
reference designed but never shipped them — commented-out productions
at ``sql-to-json:146-149,175-181``). Queries using them emit a
``group_by`` key and ``{"count": ...}`` / ``{"sum": ...}`` selector
sources; plain reference queries emit the exact reference shape.
"""

from __future__ import annotations

import json
from typing import Any

from minoan_athenaeum_spark.plans.dialect import (
    ColumnRef,
    Comparison,
    DialectError,
    Literal,
    Query,
    Selector,
    TableRef,
)


class _Inline:
    """Marks a subtree to be rendered compactly on one line."""

    def __init__(self, value: Any):
        self.value = value


def _column_obj(c: ColumnRef) -> dict:
    return {"column": {"name": c.name, "table": c.table}}


def _term_obj(t: ColumnRef | Literal) -> dict:
    if isinstance(t, ColumnRef):
        return _column_obj(t)
    if isinstance(t.value, int):
        return {"lit_int": t.value}
    return {"lit_str": t.value}


def _selector_source(s: Selector) -> dict:
    if s.agg is None:
        assert s.column is not None
        return _column_obj(s.column)
    inner = None if s.column is None else _column_obj(s.column)
    return {s.agg: inner}


def to_reference_ast(q: Query) -> dict:
    """Query dataclasses → the reference's JSON AST shape (with inline
    markers for the single-line leaves)."""
    ast: dict[str, Any] = {
        "select": [
            {"source": _Inline(_selector_source(s)), "as": s.alias}
            for s in q.select
        ],
        "from": [
            {"source": _Inline({"file": tr.name}), "as": tr.alias}
            for tr in q.tables
        ],
        "where": [
            {
                "op": c.op,
                "left": _Inline(_term_obj(c.left)),
                "right": _Inline(_term_obj(c.right)),
            }
            for c in q.where
        ],
    }
    if q.group_by:
        ast["group_by"] = [_Inline(_column_obj(c)) for c in q.group_by]
    return ast


def _render(obj: Any, prefix: str) -> str:
    if isinstance(obj, _Inline):
        return json.dumps(obj.value)
    if isinstance(obj, dict):
        if not obj:
            return "{}"
        inner = prefix + "    "
        parts = [
            f"{inner}{json.dumps(k)}: {_render(v, inner)}" for k, v in obj.items()
        ]
        return "{\n" + ",\n".join(parts) + "\n" + prefix + "}"
    if isinstance(obj, (list, tuple)):
        if not obj:
            return "[]"
        inner = prefix + "    "
        parts = [f"{inner}{_render(e, inner)}" for e in obj]
        return "[\n" + ",\n".join(parts) + "\n" + prefix + "]"
    return json.dumps(obj)


def emit_json(q: Query) -> str:
    """Render a parsed query exactly as the reference's ``sql-to-json``
    prints it (trailing newline included)."""
    return _render(to_reference_ast(q), "") + "\n"


# ------------------------------------------------------------ ingest


def _bad(msg: str) -> DialectError:
    return DialectError(f"Invalid query JSON: {msg}")


def _parse_column(obj: Any) -> ColumnRef:
    if not isinstance(obj, dict) or set(obj) != {"name", "table"}:
        raise _bad(f"malformed column reference: {obj!r}")
    if not isinstance(obj["name"], str):
        raise _bad(f"column name must be a string: {obj['name']!r}")
    if obj["table"] is not None and not isinstance(obj["table"], str):
        raise _bad(f"column table must be a string or null: {obj['table']!r}")
    return ColumnRef(name=obj["name"], table=obj["table"])


def _parse_term(obj: Any) -> ColumnRef | Literal:
    if not isinstance(obj, dict) or len(obj) != 1:
        raise _bad(f"malformed term: {obj!r}")
    (kind, val), = obj.items()
    if kind == "column":
        return _parse_column(val)
    if kind == "lit_int":
        if not isinstance(val, int) or isinstance(val, bool):
            raise _bad(f"lit_int must be an integer: {val!r}")
        return Literal(val)
    if kind == "lit_str":
        if not isinstance(val, str):
            raise _bad(f"lit_str must be a string: {val!r}")
        return Literal(val)
    raise _bad(f"unknown term kind: {kind!r}")


def _parse_selector(obj: Any) -> Selector:
    if not isinstance(obj, dict) or set(obj) != {"source", "as"}:
        raise _bad(f"malformed selector: {obj!r}")
    src = obj["source"]
    if not isinstance(src, dict) or len(src) != 1:
        raise _bad(f"malformed selector source: {src!r}")
    alias = obj["as"]
    if alias is not None and not isinstance(alias, str):
        raise _bad(f"selector alias must be a string or null: {alias!r}")
    (kind, val), = src.items()
    if kind == "column":
        return Selector(_parse_column(val), alias)
    if kind in ("count", "sum"):
        col = None if val is None else _parse_column(val)
        if kind == "sum" and col is None:
            raise _bad("sum requires a column")
        return Selector(col, alias, kind)
    raise _bad(f"unknown selector source: {kind!r}")


def from_reference_ast(obj: Any) -> Query:
    """A loaded ``query.json`` (reference AST shape) → our Query IR.
    Mirrors the reference executor's input stage
    (``read_input``, /root/reference/database.py:129-137)."""
    if not isinstance(obj, dict):
        raise _bad("top level must be an object")
    extra = set(obj) - {"select", "from", "where", "group_by"}
    if extra:
        raise _bad(f"unknown keys: {sorted(extra)}")
    for key in ("select", "from"):
        if not isinstance(obj.get(key), list) or not obj[key]:
            raise _bad(f'"{key}" must be a non-empty array')
    if not isinstance(obj.get("where", []), list):
        raise _bad('"where" must be an array')

    select = tuple(_parse_selector(s) for s in obj["select"])
    tables = []
    for tr in obj["from"]:
        if (
            not isinstance(tr, dict)
            or set(tr) != {"source", "as"}
            or not isinstance(tr["source"], dict)
            or set(tr["source"]) != {"file"}
            or not isinstance(tr["source"]["file"], str)
        ):
            raise _bad(f"malformed table ref: {tr!r}")
        if tr["as"] is not None and not isinstance(tr["as"], str):
            raise _bad(f"table alias must be a string or null: {tr['as']!r}")
        tables.append(TableRef(tr["source"]["file"], tr["as"]))
    where = []
    for c in obj.get("where", []):
        if not isinstance(c, dict) or set(c) != {"op", "left", "right"}:
            raise _bad(f"malformed comparison: {c!r}")
        if c["op"] not in ("=", "!=", ">", ">=", "<", "<="):
            raise _bad(f"unknown comparison op: {c['op']!r}")
        where.append(
            Comparison(c["op"], _parse_term(c["left"]), _parse_term(c["right"]))
        )
    group_by = tuple(_parse_column(g) for g in obj.get("group_by", []))
    return Query(select, tuple(tables), tuple(where), group_by)
