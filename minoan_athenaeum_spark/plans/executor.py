"""Strict-dialect validator + DataFrame executor.

Reproduces the reference's error semantics (SURVEY.md §2 E2–E6) as a
pre-plan validation pass — Spark/Catalyst is more permissive (implicit
casts, constant predicates), so strictness lives here, then execution is
pure declarative DataFrame ops that Catalyst optimizes.

Error-message text mirrors the reference's observable stderr output
(golden example-error-1.out; sites /root/reference/database.py:216-419).

Behavioral divergence (documented improvement): tables not connected by
any join predicate produce a cross join — the reference's executor
loops forever on that input (/root/reference/database.py:663-673).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from minoan_athenaeum_spark.plans.dialect import (
    ColumnRef,
    Comparison,
    DialectError,
    Literal,
    Query,
)

_OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def _ref_type(dtype: T.DataType) -> str:
    """Collapse Spark types onto the reference's two-type system."""
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dtype, T.StringType):
        return "str"
    return dtype.simpleString()


@dataclass
class ResolvedColumn:
    table: str  # effective (aliased) table name
    name: str
    ref_type: str


class Executor:
    """Executes one parsed dialect query against named DataFrames."""

    def __init__(self, tables: dict[str, DataFrame]):
        # effective name -> aliased DataFrame (alias applied once so
        # qualified refs resolve through Catalyst too)
        self.tables = {name: df.alias(name) for name, df in tables.items()}
        self.schemas: dict[str, dict[str, str]] = {
            name: {f.name: _ref_type(f.dataType) for f in df.schema.fields}
            for name, df in tables.items()
        }

    # ------------------------------------------------------- resolution

    def resolve(self, ref: ColumnRef) -> ResolvedColumn:
        if ref.table is not None:
            if ref.table not in self.schemas:
                raise DialectError(
                    f'ERROR: Column reference "{ref.name}" does not exist in table "{ref.table}"'
                )
            schema = self.schemas[ref.table]
            if ref.name not in schema:
                raise DialectError(
                    f'ERROR: Column reference "{ref.name}" does not exist in table "{ref.table}"'
                )
            return ResolvedColumn(ref.table, ref.name, schema[ref.name])
        present = [t for t, s in self.schemas.items() if ref.name in s]
        if not present:
            tables = ", ".join(self.schemas)
            raise DialectError(
                f'ERROR: Column reference "{ref.name}" does not exist in table "{tables}"'
            )
        if len(present) > 1:
            listed = ", ".join(f'"{t}"' for t in present)
            raise DialectError(
                f'ERROR: Column reference "{ref.name}" is ambiguous; '
                f"present in multiple tables: {listed}."
            )
        return ResolvedColumn(present[0], ref.name, self.schemas[present[0]][ref.name])

    # -------------------------------------------------------- planning

    def plan(self, q: Query) -> DataFrame:
        filters: list[tuple[ResolvedColumn, str, Literal]] = []
        joins: list[tuple[ResolvedColumn, str, ResolvedColumn]] = []
        _REVERSED = {"=": "=", "!=": "!=", ">": "<", ">=": "<=", "<": ">", "<=": ">="}

        for cmp in q.where:
            lcol = isinstance(cmp.left, ColumnRef)
            rcol = isinstance(cmp.right, ColumnRef)
            if not lcol and not rcol:
                raise DialectError(
                    f'Both sides of the filter are literals "{cmp.left.value}" and "{cmp.right.value}"'
                )
            if lcol and rcol:
                left, right = self.resolve(cmp.left), self.resolve(cmp.right)
                if left.ref_type != right.ref_type:
                    raise DialectError("ERROR: Column join types are incompatible.")
                joins.append((left, cmp.op, right))
            else:
                # Normalize `lit OP col` to `col OP' lit` (reference
                # reverse_operation, /root/reference/database.py:177-189).
                if lcol:
                    col, op, lit = self.resolve(cmp.left), cmp.op, cmp.right
                else:
                    col, op, lit = self.resolve(cmp.right), _REVERSED[cmp.op], cmp.left
                if col.ref_type != lit.type_name:
                    raise DialectError("ERROR: Column filter types are incompatible.")
                filters.append((col, op, lit))

        # Validate selectors before executing (reference validates
        # select list up front — golden example-error-1).
        # Aggregates (COUNT/SUM + GROUP BY) complete the reference's
        # vestigial G1 design (/root/reference/sql-to-json:146-149,175-181).
        projected: list[tuple[ResolvedColumn | None, str, str | None]] = []
        has_agg = False
        for sel in q.select:
            if sel.agg == "sum":
                rc = self.resolve(sel.column)
                if rc.ref_type != "int":
                    raise DialectError("ERROR: SUM requires an int column.")
            elif sel.agg == "count":
                rc = self.resolve(sel.column) if sel.column is not None else None
            else:
                rc = self.resolve(sel.column)
            has_agg = has_agg or sel.agg is not None
            default = (
                sel.agg
                if sel.column is None
                else (f"{sel.agg}_{sel.column.name}" if sel.agg else sel.column.name)
            )
            projected.append((rc, sel.alias or default, sel.agg))
        group_cols = [self.resolve(g) for g in q.group_by]
        if has_agg:
            grouped_names = {(g.table, g.name) for g in group_cols}
            for rc, _, agg in projected:
                if agg is None and (rc.table, rc.name) not in grouped_names:
                    raise DialectError(
                        f'ERROR: Column reference "{rc.name}" must appear in GROUP BY.'
                    )

        # Assemble: start from the first table, attach join-connected
        # tables, cross-join anything disconnected.
        # dict.fromkeys dedupes repeated unaliased refs (FROM t, t) the
        # way the reference's actual_tables dict does (database.py:220).
        order = list(dict.fromkeys(t.effective_name for t in q.tables))
        df = self.tables[order[0]]
        joined = {order[0]}
        remaining = order[1:]
        conds_used: set[int] = set()
        while remaining:
            progressed = False
            for name in list(remaining):
                conds = []
                for i, (lc, op, rc) in enumerate(joins):
                    if i in conds_used:
                        continue
                    sides = {lc.table, rc.table}
                    if name in sides and (sides - {name}) <= joined:
                        conds.append((i, lc, op, rc))
                if conds:
                    cond_expr = None
                    for i, lc, op, rc in conds:
                        conds_used.add(i)
                        e = _OPS[op](
                            F.col(f"{lc.table}.{lc.name}"), F.col(f"{rc.table}.{rc.name}")
                        )
                        cond_expr = e if cond_expr is None else (cond_expr & e)
                    df = df.join(self.tables[name], cond_expr, "inner")
                    joined.add(name)
                    remaining.remove(name)
                    progressed = True
            if not progressed:
                # Disconnected table(s): cross join (reference hangs here;
                # we implement the grammar's meaning).
                name = remaining.pop(0)
                df = df.crossJoin(self.tables[name])
                joined.add(name)

        # Any remaining join predicates between already-joined tables
        # (e.g. cycles) become post-hoc filters.
        for i, (lc, op, rc) in enumerate(joins):
            if i not in conds_used:
                df = df.filter(
                    _OPS[op](F.col(f"{lc.table}.{lc.name}"), F.col(f"{rc.table}.{rc.name}"))
                )

        for col, op, lit in filters:
            df = df.filter(_OPS[op](F.col(f"{col.table}.{col.name}"), F.lit(lit.value)))

        if has_agg:
            aggs = []
            for rc, out, agg in projected:
                if agg == "count":
                    aggs.append(
                        F.count("*").alias(out)
                        if rc is None
                        else F.count(F.col(f"{rc.table}.{rc.name}")).alias(out)
                    )
                elif agg == "sum":
                    aggs.append(F.sum(F.col(f"{rc.table}.{rc.name}")).alias(out))
            keys = [F.col(f"{g.table}.{g.name}") for g in group_cols]
            grouped = df.groupBy(*keys) if keys else df.groupBy()
            out_df = grouped.agg(*aggs)
            # Re-project in SELECT order with output names.
            order = []
            for rc, out, agg in projected:
                if agg is None:
                    order.append(F.col(rc.name).alias(out))
                else:
                    order.append(F.col(out))
            return out_df.select(*order)

        return df.select(
            *[F.col(f"{rc.table}.{rc.name}").alias(out) for rc, out, _ in projected]
        )


def check_duplicate_aliases(q: Query) -> None:
    """Mirror reference ``load_tables`` (/root/reference/database.py:206-221):
    repeating the same unaliased table silently reuses the loaded table;
    only an alias colliding with an already-registered name or alias
    raises the 'already been loaded' error."""
    registered: set[str] = set()
    for tref in q.tables:
        registered.add(tref.name)
        if tref.alias is not None:
            if tref.alias in registered:
                raise DialectError(
                    f'The table alias "{tref.alias}" has already been loaded'
                )
            registered.add(tref.alias)
