"""Lucene-ish query-expression front-end → Catalyst Column compiler
(SURVEY.md §3.1 stage 4-5, §7.4).

Mirrors the *shape* of the reference's pipeline — tokenizer +
recursive-descent parser into an AST (`ocdb/core/query/parser.py::
QueryParser`, `QueryTokenizer` [U]; AST node classes PhraseQuery /
FieldValueQuery / FieldRangeQuery / FieldWildcardQuery / UnaryOpQuery /
BinaryOpQuery in `ocdb/core/query/query.py` [U]) and a visitor that
compiles it (`ocdb/db/mongo_db_driver.py::QueryConverter` [U]) — but
the compile target is a PySpark `Column` instead of a MongoDB filter
document, so Catalyst gets a declarative predicate it can push into
the parquet scan.

Grammar (the reference's public query syntax):

    expr     := or_expr
    or_expr  := and_expr (OR and_expr)*
    and_expr := unary (AND? unary)*          # juxtaposition = AND
    unary    := NOT unary | '+' unary | '-' unary | primary
    primary  := '(' expr ')' | term
    term     := field ':' value | field ':' '[' v TO v ']' | value
    value    := word (may contain * ? wildcards) | "quoted phrase"

A bare (fieldless) term searches the designated default text fields,
like the reference's PhraseQuery over metadata.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<lbrack>\[) |
        (?P<rbrack>\]) |
        (?P<quoted>"[^"]*") |
        (?P<word>[^\s()\[\]:"]+) |
        (?P<colon>:)
    )""",
    re.VERBOSE,
)


@dataclass(frozen=True)
class Token:
    kind: str
    text: str
    pos: int


def tokenize(s: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    while i < len(s):
        m = _TOKEN_RE.match(s, i)
        if not m:
            # The alternation needs a real token after \s*, so a
            # whitespace-only tail ('a ', 'name:foo ') fails to match.
            # Trailing whitespace is valid input, not a syntax error.
            if s[i:].isspace():
                break
            raise QuerySyntaxError(f"unexpected character at {i}: {s[i]!r}")
        # every alternative consumes >=1 char, so lastgroup is always
        # set and the match advances; pos points at the TOKEN (after
        # the \s* prefix), not the whitespace before it (round-13
        # review: error positions used to point at the blank)
        kind = m.lastgroup
        out.append(Token(kind, m.group(kind), m.start(kind)))
        i = m.end()
    return out


class QuerySyntaxError(ValueError):
    """Parse error with position info (ref: parser error positions
    covered by the reference's tokenizer tests [U])."""


# ---------------------------------------------------------------------- AST


class Query:
    def accept(self, v: "QueryVisitor"):
        raise NotImplementedError


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Fieldless free-text term searched over the default fields.
    wildcard=True marks a term carrying * / ? — compiled as a LIKE
    pattern instead of a literal contains (round-12 review: 'chl*'
    used to search for the literal character '*')."""

    text: str
    wildcard: bool = False

    def accept(self, v):
        return v.visit_phrase(self)


@dataclass(frozen=True)
class FieldValueQuery(Query):
    """quoted=True pins STRING comparison: unquoted numeric-looking
    values coerce via _auto (version:1.10 compares as the number 1.1),
    so quoting is the caller's escape hatch for exact string equality
    — version:"1.10" matches only the string "1.10" (round-12 review:
    quoted values used to coerce too, leaving no way to force it)."""

    field: str
    value: str
    quoted: bool = False

    def accept(self, v):
        return v.visit_field_value(self)


@dataclass(frozen=True)
class FieldRangeQuery(Query):
    """Bounds are '*' (unbounded), numbers (coerced via _auto), or —
    when quoted in the source — strings pinned to exact string
    comparison, mirroring FieldValueQuery.quoted (round-13 review:
    quoted bounds used to keep their quote characters and compare
    against the literal '\"')."""

    field: str
    lo: str
    hi: str
    lo_quoted: bool = False
    hi_quoted: bool = False

    def accept(self, v):
        return v.visit_field_range(self)


@dataclass(frozen=True)
class FieldWildcardQuery(Query):
    field: str
    pattern: str  # contains * / ?

    def accept(self, v):
        return v.visit_field_wildcard(self)


@dataclass(frozen=True)
class UnaryOpQuery(Query):
    op: str  # NOT | + | -
    child: Query

    def accept(self, v):
        return v.visit_unary(self)


@dataclass(frozen=True)
class BinaryOpQuery(Query):
    op: str  # AND | OR
    left: Query
    right: Query

    def accept(self, v):
        return v.visit_binary(self)


class QueryVisitor:
    def visit_phrase(self, q: PhraseQuery): ...
    def visit_field_value(self, q: FieldValueQuery): ...
    def visit_field_range(self, q: FieldRangeQuery): ...
    def visit_field_wildcard(self, q: FieldWildcardQuery): ...
    def visit_unary(self, q: UnaryOpQuery): ...
    def visit_binary(self, q: BinaryOpQuery): ...


# ------------------------------------------------------------------- parser


class QueryParser:
    """Recursive-descent parser (shape of the reference's QueryParser [U])."""

    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    @classmethod
    def parse(cls, s: str) -> Query:
        p = cls(tokenize(s))
        q = p._or_expr()
        if p._peek() is not None:
            t = p._peek()
            raise QuerySyntaxError(f"unexpected token {t.text!r} at {t.pos}")
        return q

    def _peek(self) -> Token | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> Token:
        t = self._peek()
        if t is None:
            raise QuerySyntaxError("unexpected end of query")
        self.i += 1
        return t

    def _or_expr(self) -> Query:
        left = self._and_expr()
        while (t := self._peek()) and t.kind == "word" and t.text.upper() == "OR":
            self._next()
            left = BinaryOpQuery("OR", left, self._and_expr())
        return left

    def _and_expr(self) -> Query:
        left = self._unary()
        while (t := self._peek()) is not None:
            if t.kind == "rparen" or (t.kind == "word" and t.text.upper() == "OR"):
                break
            if t.kind == "word" and t.text.upper() == "AND":
                self._next()
                left = BinaryOpQuery("AND", left, self._unary())
            else:
                left = BinaryOpQuery("AND", left, self._unary())  # juxtaposition
        return left

    def _unary(self) -> Query:
        t = self._peek()
        if t is not None and t.kind == "word" and t.text.upper() == "NOT":
            self._next()
            return UnaryOpQuery("NOT", self._unary())
        if t is not None and t.kind == "word" and t.text in ("+", "-"):
            self._next()
            return UnaryOpQuery(t.text, self._unary())
        return self._primary()

    def _primary(self) -> Query:
        t = self._next()
        if t.kind == "lparen":
            q = self._or_expr()
            close = self._next()
            if close.kind != "rparen":
                raise QuerySyntaxError(f"expected ')' at {close.pos}")
            return q
        if t.kind == "quoted":
            return PhraseQuery(t.text.strip('"'))
        if t.kind == "word":
            # leading +/- stuck to the word (Lucene style)
            if t.text[0] in "+-" and len(t.text) > 1:
                rest = Token("word", t.text[1:], t.pos + 1)
                self.toks.insert(self.i, rest)
                return UnaryOpQuery(t.text[0], self._primary())
            nxt = self._peek()
            if nxt is not None and nxt.kind == "colon":
                self._next()  # consume ':'
                return self._field_term(t.text)
            if "*" in t.text or "?" in t.text:
                return PhraseQuery(t.text, wildcard=True)
            return PhraseQuery(t.text)
        raise QuerySyntaxError(f"unexpected token {t.text!r} at {t.pos}")

    def _range_bound(self) -> tuple[str, bool]:
        """A range bound is a word or a quoted string — anything else
        ('(', ':', ']') is a syntax error, not a silent literal
        (round-13 review). Returns (text, quoted)."""
        t = self._next()
        if t.kind == "word":
            return t.text, False
        if t.kind == "quoted":
            return t.text.strip('"'), True
        raise QuerySyntaxError(
            f"expected range bound, got {t.text!r} at {t.pos}"
        )

    def _field_term(self, field: str) -> Query:
        t = self._next()
        if t.kind == "lbrack":
            lo, lo_q = self._range_bound()
            to = self._next()
            if not (to.kind == "word" and to.text.upper() == "TO"):
                raise QuerySyntaxError(f"expected TO at {to.pos}")
            hi, hi_q = self._range_bound()
            rb = self._next()
            if rb.kind != "rbrack":
                raise QuerySyntaxError(f"expected ']' at {rb.pos}")
            return FieldRangeQuery(field, lo, hi, lo_quoted=lo_q, hi_quoted=hi_q)
        if t.kind == "quoted":
            return FieldValueQuery(field, t.text.strip('"'), quoted=True)
        if t.kind == "word":
            if "*" in t.text or "?" in t.text:
                return FieldWildcardQuery(field, t.text)
            return FieldValueQuery(field, t.text)
        raise QuerySyntaxError(f"expected value after '{field}:' at {t.pos}")


# ----------------------------------------------------------------- compiler


def _like_pattern(pattern: str) -> str:
    """* → %, ? → _ with pre-existing %/_ escaped (same translation
    the reference does into $regex) — ONE copy for field and fieldless
    wildcards."""
    like = pattern.replace("%", r"\%").replace("_", r"\_")
    return like.replace("*", "%").replace("?", "_")


# strictly-numeric spellings only: Python's int()/float() accept
# underscore grouping ('1_000'), 'inf', 'nan', 'Infinity' — all of
# which must stay STRING literals here ('flag:nan' means the text
# 'nan'; coercing it to float NaN made the comparison silently match
# nothing against string columns — round-13 review)
_INT_RE = re.compile(r"[+-]?\d+\Z")
_FLOAT_RE = re.compile(r"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?\Z")


def _auto(value: str):
    """Literal coercion: numbers compare numerically, else string."""
    if _INT_RE.match(value):
        return int(value)
    if _FLOAT_RE.match(value):
        return float(value)
    return value


class ColumnCompiler(QueryVisitor):
    """Compile the AST into a Catalyst Column (the Spark analog of the
    reference's QueryConverter → Mongo filter [U])."""

    def __init__(self, default_fields: list[str] | None = None):
        self.default_fields = default_fields or []

    def compile(self, q: Query) -> Column:
        return q.accept(self)

    def visit_phrase(self, q: PhraseQuery) -> Column:
        if not self.default_fields:
            raise QuerySyntaxError(
                f"fieldless term {q.text!r} but no default text fields configured"
            )
        if q.wildcard:
            # contains-anywhere with the wildcards honored: translate
            # * / ? to LIKE and wrap in % — the fieldless analog of
            # visit_field_wildcard's whole-value LIKE (a fieldless
            # term is a substring search, so the pattern floats).
            conds = [
                F.col(f).like(f"%{_like_pattern(q.text)}%")
                for f in self.default_fields
            ]
        else:
            conds = [F.col(f).contains(q.text) for f in self.default_fields]
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    def visit_field_value(self, q: FieldValueQuery) -> Column:
        if q.quoted:
            return F.col(q.field) == F.lit(q.value)  # exact string
        return F.col(q.field) == F.lit(_auto(q.value))

    def visit_field_range(self, q: FieldRangeQuery) -> Column:
        col = F.col(q.field)
        conds = []
        if q.lo_quoted or q.lo != "*":
            conds.append(
                col >= F.lit(q.lo if q.lo_quoted else _auto(q.lo))
            )
        if q.hi_quoted or q.hi != "*":
            conds.append(
                col <= F.lit(q.hi if q.hi_quoted else _auto(q.hi))
            )
        if not conds:
            # field:[* TO *] is Lucene's "field has a value" idiom —
            # lit(True) would match NULL rows too (round-13 review)
            return col.isNotNull()
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def visit_field_wildcard(self, q: FieldWildcardQuery) -> Column:
        return F.col(q.field).like(_like_pattern(q.pattern))

    def visit_unary(self, q: UnaryOpQuery) -> Column:
        child = q.child.accept(self)
        if q.op in ("NOT", "-"):
            # Mongo $not semantics, which the reference compiles to: a
            # row where the field is NULL/missing DOES match the
            # negation. SQL's three-valued ~NULL = NULL would silently
            # drop those rows in filter() (round-13 review; same class
            # of fix as the keyset NULL handling in search.py).
            return ~F.coalesce(child, F.lit(False))
        return child  # '+' = required = plain AND semantics

    def visit_binary(self, q: BinaryOpQuery) -> Column:
        left, right = q.left.accept(self), q.right.accept(self)
        return (left & right) if q.op == "AND" else (left | right)


def compile_expr(expr: str, default_fields: list[str] | None = None) -> Column:
    """Parse + compile a reference-syntax query expression to a Column."""
    return ColumnCompiler(default_fields).compile(QueryParser.parse(expr))
