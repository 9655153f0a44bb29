"""Tokenizer + recursive-descent parser for the reference SQL dialect.

Grammar is the public spec in /root/reference/README.md ("SQL Syntax"):

    Query      = "SELECT" Selector ("," Selector)*
                 "FROM" TableRef ("," TableRef)*
                 ( "WHERE" Comparison ("AND" Comparison)* )?
    Selector   = ColumnRef ( "AS" ident )?
    TableRef   = ident ( "AS" ident )?
    Comparison = Term ("=" | "!=" | ">" | ">=" | "<" | "<=") Term
    Term       = ColumnRef | str-literal | int-literal
    ColumnRef  = ident ( "." ident )?

Dialect rules re-expressed from observable behavior (not ported code):
keywords are uppercase; identifiers start with a lowercase letter;
`--` comments run to end of line; int literals are capped at 2³¹−1;
string literals are double-quoted printable ASCII without escapes.
This is a brand-new implementation (the reference's parser is
/root/reference/sql-to-json:135-378; only its externally documented
behavior is reproduced).
"""

from __future__ import annotations

from dataclasses import dataclass


class DialectError(Exception):
    """User-facing parse/validation error → stderr + exit 1 in the CLI
    (reference error channel: /root/reference/database.py:147-152)."""


class ParseError(DialectError):
    """Parse error with position. ``str()`` keeps our message format;
    :meth:`reference_text` renders the reference's ``sql-to-json``
    stderr envelope (``line {}, col {}: {}``,
    /root/reference/sql-to-json:54-56) for the --emit-json pipe."""

    def __init__(self, line: int, col: int, message: str):
        super().__init__(f"Parse error at line {line}, column {col}: {message}")
        self.line = line
        self.col = col
        self.message = message

    def reference_text(self) -> str:
        return f"line {self.line}, col {self.col}: {self.message}"


@dataclass(frozen=True)
class Token:
    kind: str  # 'kw' | 'ident' | 'int' | 'str' | 'op' | 'delim' | 'end'
    value: str | int
    line: int
    col: int


KEYWORDS = {"SELECT", "FROM", "WHERE", "AND", "AS", "GROUP", "BY", "COUNT", "SUM"}
OPS = ("!=", ">=", "<=", "=", ">", "<")
MAX_INT = 2**31 - 1


def tokenize(text: str) -> list[Token]:
    toks: list[Token] = []
    i, line, col = 0, 1, 1

    def err(msg: str) -> ParseError:
        return ParseError(line, col, msg)

    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "\n":
            i, line, col = i + 1, line + 1, 1
            continue
        if ch in " \t\r":
            i += 1
            col += 1
            continue
        if text.startswith("--", i):
            while i < n and text[i] != "\n":
                i += 1
            continue
        start_col = col
        if ch.isdigit():
            j = i
            while j < n and text[j].isdigit():
                j += 1
            val = int(text[i:j])
            if val > MAX_INT:
                raise err(f"integer literal too large: {val}")
            toks.append(Token("int", val, line, start_col))
            col += j - i
            i = j
            continue
        if ch == '"':
            j = i + 1
            while j < n and text[j] != '"':
                c = text[j]
                if c == "\n" or not (32 <= ord(c) < 127):
                    raise err("invalid character in string literal")
                j += 1
            if j >= n:
                raise err("unterminated string literal")
            toks.append(Token("str", text[i + 1 : j], line, start_col))
            col += j - i + 1
            i = j + 1
            continue
        if ch.isalpha() or ch == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            if word in KEYWORDS:
                toks.append(Token("kw", word, line, start_col))
            else:
                if not word[0].islower():
                    raise err(f'identifier must start with a lowercase letter: "{word}"')
                toks.append(Token("ident", word, line, start_col))
            col += j - i
            i = j
            continue
        matched = False
        for op in OPS:
            if text.startswith(op, i):
                toks.append(Token("op", op, line, start_col))
                i += len(op)
                col += len(op)
                matched = True
                break
        if matched:
            continue
        if ch in ".,()":
            toks.append(Token("delim", ch, line, start_col))
            i += 1
            col += 1
            continue
        raise err(f"unexpected character {ch!r}")
    toks.append(Token("end", "", line, col))
    return toks


# ---------------------------------------------------------------- AST


@dataclass(frozen=True)
class ColumnRef:
    name: str
    table: str | None = None


@dataclass(frozen=True)
class Literal:
    value: int | str  # int → reference "int", str → reference "str"

    @property
    def type_name(self) -> str:
        return "int" if isinstance(self.value, int) else "str"


Term = ColumnRef | Literal


@dataclass(frozen=True)
class Selector:
    column: ColumnRef | None  # None for COUNT(*)
    alias: str | None = None
    # Aggregate selector support: the reference *designed* COUNT/SUM and
    # GROUP BY but never implemented them (commented-out productions,
    # /root/reference/sql-to-json:146-149,175-181) — we complete that
    # intent. agg is None (plain column), "count" or "sum".
    agg: str | None = None


@dataclass(frozen=True)
class TableRef:
    name: str
    alias: str | None = None

    @property
    def effective_name(self) -> str:
        return self.alias or self.name


@dataclass(frozen=True)
class Comparison:
    op: str
    left: Term
    right: Term


@dataclass(frozen=True)
class Query:
    select: tuple[Selector, ...]
    tables: tuple[TableRef, ...]
    where: tuple[Comparison, ...]
    group_by: tuple[ColumnRef, ...] = ()


class Parser:
    def __init__(self, toks: list[Token]):
        self.toks = toks
        self.pos = 0

    @property
    def cur(self) -> Token:
        return self.toks[self.pos]

    def _err(self, msg: str) -> ParseError:
        t = self.cur
        return ParseError(t.line, t.col, msg)

    def eat(self, kind: str, value: str | None = None) -> Token:
        t = self.cur
        if t.kind != kind or (value is not None and t.value != value):
            want = value or kind
            raise self._err(f"expected {want}, found {t.value!r}")
        self.pos += 1
        return t

    def parse_query(self) -> Query:
        self.eat("kw", "SELECT")
        select = [self.parse_selector()]
        while self.cur.kind == "delim" and self.cur.value == ",":
            self.pos += 1
            select.append(self.parse_selector())
        self.eat("kw", "FROM")
        tables = [self.parse_table_ref()]
        while self.cur.kind == "delim" and self.cur.value == ",":
            self.pos += 1
            tables.append(self.parse_table_ref())
        where: list[Comparison] = []
        if self.cur.kind == "kw" and self.cur.value == "WHERE":
            self.pos += 1
            where.append(self.parse_comparison())
            while self.cur.kind == "kw" and self.cur.value == "AND":
                self.pos += 1
                where.append(self.parse_comparison())
        group_by: list[ColumnRef] = []
        if self.cur.kind == "kw" and self.cur.value == "GROUP":
            self.pos += 1
            self.eat("kw", "BY")
            group_by.append(self.parse_column_ref())
            while self.cur.kind == "delim" and self.cur.value == ",":
                self.pos += 1
                group_by.append(self.parse_column_ref())
        self.eat("end")
        return Query(tuple(select), tuple(tables), tuple(where), tuple(group_by))

    def parse_column_ref(self) -> ColumnRef:
        first = self.eat("ident").value
        if self.cur.kind == "delim" and self.cur.value == ".":
            self.pos += 1
            second = self.eat("ident").value
            return ColumnRef(name=str(second), table=str(first))
        return ColumnRef(name=str(first))

    def parse_selector(self) -> Selector:
        agg = None
        col: ColumnRef | None
        if self.cur.kind == "kw" and self.cur.value in ("COUNT", "SUM"):
            agg = str(self.cur.value).lower()
            self.pos += 1
            self.eat("delim", "(")
            if agg == "count" and self.cur.kind == "delim" and self.cur.value == ")":
                col = None  # COUNT()
            else:
                col = self.parse_column_ref()
            self.eat("delim", ")")
        else:
            col = self.parse_column_ref()
        alias = None
        if self.cur.kind == "kw" and self.cur.value == "AS":
            self.pos += 1
            alias = str(self.eat("ident").value)
        return Selector(col, alias, agg)

    def parse_table_ref(self) -> TableRef:
        name = str(self.eat("ident").value)
        alias = None
        if self.cur.kind == "kw" and self.cur.value == "AS":
            self.pos += 1
            alias = str(self.eat("ident").value)
        return TableRef(name, alias)

    def parse_term(self) -> Term:
        t = self.cur
        if t.kind == "int":
            self.pos += 1
            return Literal(int(t.value))
        if t.kind == "str":
            self.pos += 1
            return Literal(str(t.value))
        if t.kind == "ident":
            return self.parse_column_ref()
        raise self._err(f"expected a column reference or literal, found {t.value!r}")

    def parse_comparison(self) -> Comparison:
        left = self.parse_term()
        op = str(self.eat("op").value)
        right = self.parse_term()
        return Comparison(op, left, right)


def parse(text: str) -> Query:
    return Parser(tokenize(text)).parse_query()
