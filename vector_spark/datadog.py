"""Datadog log-search conditions → Catalyst ``Column`` predicates.

Vector's third condition type (after check_fields and VRL):
``type = "datadog_search"`` compiles a Datadog log-search query string
into a boolean program (reference: src/conditions/datadog_search.rs and
the grammar/build rules in lib/datadog/search-syntax/src/{grammar.pest,
parser.rs,vrl.rs,field.rs}). This module re-expresses the same query
language as a single Catalyst ``Column`` expression tree, so a search
query participates in predicate pushdown / whole-stage codegen exactly
like any other ``filter``/``route`` condition — no per-row interpreter.

Semantics mirrored from the reference build rules (vrl.rs:244-420):

- bare term / wildcard / quoted phrase → word-boundary regex match on
  the default (message) field: ``\\bfoo.*\\b`` (make_word_regex,
  vrl.rs:85-91); consecutive bare terms merge into one multiterm
  ("foo bar" → one match, parser.rs:141-170).
- ``field:value`` — field classes per field.rs:54-72:
  reserved (host, source, status, service, trace_id, message,
  timestamp, tags) and facets (``@x``) resolve to columns; any other
  bare key is a *tag* lookup inside the ``tags`` array ("k:v" entries).
- ``tags:a`` → array-contains (vrl.rs:272-276).
- wildcards on non-default fields: ``*suffix`` → ends_with fast path,
  otherwise anchored ``^glob$`` regex (vrl.rs:303-327).
- ranges ``[a TO b]`` / ``{a TO b}`` with ``*`` open ends; numeric
  comparison when the column is numeric-typed, else lexicographic
  string comparison (make_field_op, vrl.rs:160-199 — the runtime
  is_integer/is_float check becomes a schema-static dtype check here,
  consistent with this engine's documented static-schema stance).
- comparisons ``field:>5`` etc. (grammar.pest:50).
- ``_exists_:k`` / ``_missing_:k`` on tags and facets (vrl.rs:251-258).
- ``NOT x`` / ``-x``, ``AND`` / ``OR`` (implicit AND), parentheses,
  ``*:*`` / ``*`` match-all.

Every atom is null-guarded (``coalesce(pred, false)``) so negation over
a missing field passes, matching VRL's ``?? false`` coalescing — under
plain Spark three-valued logic ``NOT NULL`` would drop the row instead.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

RESERVED_ATTRIBUTES = {
    "host",
    "source",
    "status",
    "service",
    "trace_id",
    "message",
    "timestamp",
    "tags",
}


@dataclass
class SearchSchema:
    """How Datadog field classes map onto a flat DataFrame schema."""

    message_col: str = "message"
    tags_col: str = "tags"
    # the DEFAULT_FIELDS search list (field.rs:4-10): columns a bare
    # term is matched against, OR-joined. None = just message_col.
    default_cols: tuple[str, ...] | None = None
    # facet/reserved name -> Column; default: the column of that name
    resolve: Callable[[str], Column] | None = None
    # columns whose comparisons/ranges are numeric (schema-static stand-in
    # for VRL's runtime is_integer/is_float branch, vrl.rs:169-176)
    numeric_fields: frozenset[str] = frozenset()

    def col(self, name: str) -> Column:
        return (self.resolve or F.col)(name)

    @property
    def defaults(self) -> tuple[str, ...]:
        return self.default_cols or (self.message_col,)


# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<range>[\[{]\s*(?:"[^"]*"|[^\s\]}]+)\s+TO\s+(?:"[^"]*"|[^\s\]}]+)\s*[\]}])
  | (?P<phrase>"(?:\\.|[^"\\])*")
  | (?P<cmp>(?:>=|<=|>|<))
  | (?P<term>(?:\\.|[^\s()\[\]{}":])+:?)
    """,
    re.VERBOSE,
)


def _tokenize(src: str) -> list[str]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ValueError(f"datadog_search: cannot tokenize at {src[i:]!r}")
        i = m.end()
        if m.lastgroup != "ws":
            out.append(m.group(0))
    return out


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------


@dataclass
class Atom:
    field: str | None  # None = default field
    kind: str  # term | phrase | range | cmp | exists | missing | matchall
    value: str = ""
    op: str = ""  # for cmp
    lower: str | None = None  # for range
    upper: str | None = None
    incl_lower: bool = True
    incl_upper: bool = True


@dataclass
class Not:
    node: object


@dataclass
class Bool:
    op: str  # and | or
    nodes: list


class _P:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise ValueError(
                "datadog_search: unexpected end of query (dangling "
                "field:, operator, or NOT)"
            )
        t = self.toks[self.i]
        self.i += 1
        return t

    # query := clause ((AND|OR)? clause)*   — implicit op is AND
    def parse_query(self, stop_at_rparen: bool = False):
        nodes, ops = [], []
        pending: str | None = None  # explicit op awaiting its right side
        while True:
            t = self.peek()
            if t is None or (stop_at_rparen and t == ")"):
                break
            if t in ("AND", "OR"):
                if not nodes or pending is not None:
                    raise ValueError(
                        f"datadog_search: misplaced {t} operator"
                    )
                self.next()
                pending = t.lower()
                continue
            if nodes:
                ops.append(pending)  # None = implicit AND
            was_explicit = pending is not None
            pending = None
            nodes.append(self.parse_clause(after_conj=was_explicit))
        if pending is not None:
            raise ValueError("datadog_search: dangling AND/OR operator")
        if not nodes:
            raise ValueError("datadog_search: empty query")
        # left-fold; None (implicit) = and. OR binds looser than AND:
        # group maximal AND-runs first, then OR them together.
        groups, cur = [], [nodes[0]]
        for op, node in zip(ops, nodes[1:]):
            if op == "or":
                groups.append(cur)
                cur = [node]
            else:
                cur.append(node)
        groups.append(cur)
        or_nodes = [g[0] if len(g) == 1 else Bool("and", g) for g in groups]
        return or_nodes[0] if len(or_nodes) == 1 else Bool("or", or_nodes)

    def parse_clause(self, after_conj: bool = False):
        t = self.peek()
        if t in ("NOT", "-"):
            self.next()
            return Not(self.parse_clause())
        if t is not None and t.startswith("-") and len(t) > 1:
            # "-foo" / "-@a:x" tokenized as one term; strip the negation
            self.toks[self.i] = t[1:]
            return Not(self.parse_clause())
        if t == "(":
            self.next()
            q = self.parse_query(stop_at_rparen=True)
            if self.peek() != ")":
                raise ValueError("datadog_search: unbalanced parens")
            self.next()
            return q
        return self.parse_atom(after_conj=after_conj)

    def parse_atom(self, after_conj: bool = False):
        t = self.next()
        field: str | None = None
        if t.endswith(":") and len(t) > 1:
            field = t[:-1]
            if field == "*" and self.peek() == "*":  # *:*
                self.next()
                return Atom(None, "matchall")
            if self.peek() == "(":
                # field-scoped grouping: status:(error OR warn) — the
                # reference grammar allows `field? ~ LPAREN ~ query ~
                # RPAREN` (grammar.pest) and distributes the field over
                # the inner atoms.
                self.next()
                q = self.parse_query(stop_at_rparen=True)
                if self.peek() != ")":
                    raise ValueError("datadog_search: unbalanced parens")
                self.next()
                return _distribute_field(q, field)
            t = self.next()  # the value token
        elif ":" in t and not t.startswith('"') and not t.startswith("["):
            field, t = t.split(":", 1)
        if field in ("_exists_", "_missing_"):
            return Atom(t, "exists" if field == "_exists_" else "missing")
        if t == "*" and field is None:
            return Atom(None, "matchall")
        if t.startswith('"'):
            return Atom(field, "phrase", value=_unquote(t))
        if t in (">", ">=", "<", "<="):
            return Atom(field, "cmp", op=t, value=self.next())
        if t and t[0] in "[{":
            incl_l, incl_u = t[0] == "[", t[-1] == "]"
            inner = t[1:-1].strip()
            lo, up = re.split(r"\s+TO\s+", inner, maxsplit=1)
            return Atom(
                field,
                "range",
                lower=None if lo == "*" else _unquote(lo),
                upper=None if up == "*" else _unquote(up),
                incl_lower=incl_l,
                incl_upper=incl_u,
            )
        # multiterm merge: consecutive bare terms on the default field
        # become one space-joined term (parser.rs:141-170). Two boundary
        # rules from the reference's multitermlookahead/query grammar
        # ('foo bar baz AND qux quux quuz' → 'foo bar', 'baz', 'qux',
        # 'quux quuz' per parser.rs tests): (a) a term immediately
        # before an explicit AND/OR stays out of the merge, and (b) the
        # first clause after an explicit conjunction does not start one.
        if field is None and not after_conj:
            parts = [t]
            while True:
                nt = self.peek()
                if (
                    nt is None
                    or nt in ("AND", "OR", "NOT", "(", ")", "-")
                    or nt.endswith(":")
                    or ":" in nt
                    or "*" in nt
                    or nt[0] in "[{\"<>"
                    or nt.startswith("-")
                ):
                    break
                after = (
                    self.toks[self.i + 1]
                    if self.i + 1 < len(self.toks)
                    else None
                )
                if after in ("AND", "OR"):
                    break  # rule (a): leave nt as its own clause
                parts.append(self.next())
            t = " ".join(parts)
        return Atom(field, "term", value=t)


def _distribute_field(node, field: str):
    """Push a scoping field onto every default-field atom under *node*.

    Implements `field:(query)` from the reference grammar: the field
    applies to each inner atom that did not name its own field
    (`status:(error OR warn)` ≡ `status:error OR status:warn`).
    """
    if isinstance(node, Atom):
        if node.field is None and node.kind != "matchall":
            node.field = field
        return node
    if isinstance(node, Not):
        node.node = _distribute_field(node.node, field)
        return node
    if isinstance(node, Bool):
        node.nodes = [_distribute_field(n, field) for n in node.nodes]
        return node
    return node


def _unquote(s: str) -> str:
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return re.sub(r"\\(.)", r"\1", s[1:-1])
    return s


def parse_datadog_search(src: str):
    src = src.strip()
    if src in ("", "*", "*:*"):
        return Atom(None, "matchall")
    return _P(_tokenize(src)).parse_query()


# --------------------------------------------------------------------------
# Compile AST → Column
# --------------------------------------------------------------------------


def _word_regex(value: str) -> str:
    # make_word_regex (vrl.rs:85-91): escape, then '*' back to '.*'
    return r"\b" + re.escape(value).replace(r"\*", ".*") + r"\b"


def _glob_regex(value: str) -> str:
    return "^" + re.escape(value).replace(r"\*", ".*") + "$"


def _guard(c: Column) -> Column:
    return F.coalesce(c, F.lit(False))


_CMP = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def _is_num(s: str | None) -> bool:
    if s is None:
        return False
    try:
        float(s)
        return True
    except ValueError:
        return False


class _Compiler:
    def __init__(self, schema: SearchSchema):
        self.s = schema

    # ---- field classes (field.rs:54-72) ----
    def _class(self, name: str) -> str:
        if name.startswith("@"):
            return "facet"
        if name in RESERVED_ATTRIBUTES:
            return "reserved"
        return "tag"

    def _col(self, name: str) -> Column:
        if name.startswith("@"):
            return self.s.col(name[1:])
        if name == "message":
            return F.col(self.s.message_col)
        if name == "tags":
            return F.col(self.s.tags_col)
        return self.s.col(name)

    def _tag_value(self, key: str) -> Column:
        """Value of tag ``key`` inside the tags array ('k:v' entries)."""
        tags = F.col(self.s.tags_col)
        # F.get is 0-based and null-safe (no ANSI abort on empty arrays,
        # honoring the repo's no-job-abort invariant)
        hit = F.get(F.filter(tags, lambda e: e.startswith(key + ":")), 0)
        return F.substring(hit, len(key) + 2, 2**30)

    def _tag_exists(self, key: str) -> Column:
        tags = F.col(self.s.tags_col)
        return F.exists(
            tags, lambda e: (e == key) | e.startswith(key + ":")
        )

    def _numericish(self, name: str) -> bool:
        base = name[1:] if name.startswith("@") else name
        return base in self.s.numeric_fields

    # ---- field op (make_field_op, vrl.rs:160-199) ----
    def _field_cmp(self, name: str, cmp, value: str) -> Column:
        cls = self._class(name)
        if cls == "tag":
            target = self._tag_value(name)
            return cmp(target, F.lit(value))
        col = self._col(name)
        if self._numericish(name) and _is_num(value):
            return cmp(col.cast("double"), F.lit(float(value)))
        return cmp(col.cast("string"), F.lit(value))

    def _or_defaults(self, mk: Callable[[Column], Column]) -> Column:
        """OR a per-column predicate across the default-field list
        (recurse over DEFAULT_FIELDS, vrl.rs:229-232)."""
        preds = [_guard(mk(F.col(c))) for c in self.s.defaults]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out

    def _range_cmp(self, col: Column, a: Atom, num: bool) -> Column:
        lo, up = a.lower, a.upper
        if lo is None and up is None:
            return col.isNotNull()
        lit = (lambda v: F.lit(float(v))) if num else F.lit
        conds = []
        if lo is not None:
            conds.append(col >= lit(lo) if a.incl_lower else col > lit(lo))
        if up is not None:
            conds.append(col <= lit(up) if a.incl_upper else col < lit(up))
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def compile(self, node) -> Column:
        if isinstance(node, Bool):
            cols = [self.compile(n) for n in node.nodes]
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if node.op == "and" else (out | c)
            return out
        if isinstance(node, Not):
            return ~self.compile(node.node)
        assert isinstance(node, Atom)
        return self._atom(node)

    def _atom(self, a: Atom) -> Column:
        if a.kind == "matchall":
            return F.lit(True)
        if a.kind in ("exists", "missing"):
            name = a.field or ""
            if name.startswith("@") or name in RESERVED_ATTRIBUTES:
                pred = self._col(name).isNotNull()
            else:
                pred = self._tag_exists(name)
            pred = _guard(pred)
            return ~pred if a.kind == "missing" else pred

        if a.kind == "cmp":
            if a.field is None:
                return self._or_defaults(
                    lambda c: _CMP[a.op](c.cast("string"), F.lit(a.value))
                )
            return _guard(self._field_cmp(a.field, _CMP[a.op], a.value))

        if a.kind == "range":
            lo, up = a.lower, a.upper
            if a.field is None:
                # default fields: string comparison (vrl.rs:196-198),
                # OR-joined across the DEFAULT_FIELDS list
                return self._or_defaults(
                    lambda c: self._range_cmp(c.cast("string"), a, num=False)
                )
            if self._class(a.field) == "tag":
                return _guard(self._range_cmp(self._tag_value(a.field), a, num=False))
            col = self._col(a.field)
            # open ('*') bounds don't demote a numeric range to string
            num = self._numericish(a.field) and all(
                b is None or _is_num(b) for b in (lo, up)
            )
            col = col.cast("double") if num else col.cast("string")
            return _guard(self._range_cmp(col, a, num=num))

        # term / phrase
        value = a.value
        if a.field is not None and value == "*" and a.kind == "term":
            # "field:*" = attribute exists (grammar.pest:49 STAR value)
            if self._class(a.field) == "tag":
                return _guard(self._tag_exists(a.field))
            return _guard(self._col(a.field).isNotNull())
        if a.field is None:
            rx = _word_regex(value)
            if "*" not in value:
                # \b<literal>\b matching implies the literal occurs as a
                # substring, so a cheap contains() short-circuits the
                # regex for every non-matching row (identical result:
                # rlike ⇒ contains for escaped literals, and null
                # propagates the same through AND)
                return self._or_defaults(
                    lambda c: c.cast("string").contains(value)
                    & c.cast("string").rlike(rx)
                )
            return self._or_defaults(lambda c: c.cast("string").rlike(rx))
        cls = self._class(a.field)
        if a.field == "tags":
            return _guard(F.array_contains(F.col(self.s.tags_col), value))
        if "*" in value and a.kind != "phrase":
            if cls == "tag":
                target = self._tag_value(a.field)
            else:
                target = self._col(a.field).cast("string")
            if value.startswith("*") and value.count("*") == 1:
                return _guard(target.endswith(value.replace("*", "")))
            if value.endswith("*") and value.count("*") == 1:
                return _guard(target.startswith(value.replace("*", "")))
            if (
                len(value) > 2
                and value.startswith("*")
                and value.endswith("*")
                and value.count("*") == 2
            ):
                # '*lit*' glob = ^.*lit.*$ = substring containment; a
                # byte-search contains() replaces the regex outright
                return _guard(target.contains(value[1:-1]))
            return _guard(target.rlike(_glob_regex(value)))
        if cls == "tag":
            # tag equality: exact 'k:v' entry (normalized tag map equality)
            return _guard(
                F.array_contains(F.col(self.s.tags_col), f"{a.field}:{value}")
            )
        return _guard(self._col(a.field).cast("string") == F.lit(value))


def compile_datadog_search(
    source: str, schema: SearchSchema | None = None
) -> Column:
    """Datadog search query string → boolean ``Column``.

    The whole query becomes one Catalyst expression tree: filters using
    it push down to the scan, and route fan-outs share a single plan.
    """
    return _Compiler(schema or SearchSchema()).compile(
        parse_datadog_search(source)
    )
