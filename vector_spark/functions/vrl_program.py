"""VRL *program* compiler: statements with control flow → one Catalyst
projection.

The reference compiles a VRL program (lib/vrl/compiler/src/expression/:
if_statement.rs, assignment.rs, block.rs, variable.rs among the 19
expression kinds) to bytecode interpreted per event. Here the program
is SYMBOLICALLY EXECUTED at plan time: every statement updates an
environment mapping event paths / local variables to Column expression
trees, and ``if cond { … } else { … }`` merges its branch environments
with ``when(cond, then_val).otherwise(else_val)``. The result is a
single ``withColumns`` projection — the whole program runs inside
whole-stage codegen with no per-event interpreter, and Catalyst's
subexpression elimination shares repeated subtrees between targets.

Supported statement forms::

    .path = <expr>                  # event-field assignment
    var   = <expr>                  # local variable (not emitted)
    if <expr> { … } else if <expr> { … } else { … }
    del(.a, .b)                     # top-level: drops the columns;
                                    # inside a branch: NULLs them
                                    # conditionally (column presence
                                    # cannot vary per row)
    abort                           # remap abort semantics: the event
                                    # passes through UNMODIFIED (or is
                                    # dropped with drop_on_abort)
    # comments

Expressions are full VRL-lite (conditions.py): the stdlib function
table, ``??`` error coalescing, checked ``try_*`` arithmetic. Later
statements see earlier assignments (including across branches); a
branch-local variable reads as null on the path that never assigned
it, matching VRL's null for unset variables.

Documented divergences from the reference compiler:
- ``if`` conditions are null-guarded to false (VRL type-checks the
  condition as an infallible boolean at compile time; a runtime error
  would leave the event unmodified — on a typed schema the null guard
  is the analogous no-op path).
- fallible-assignment targets (``.ok, .err = f()``) are not parsed;
  use ``??`` (errors are already null-valued here).
- ``return`` terminates only the reference's function blocks — not a
  remap program — and is not accepted.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.conditions import _Parser

_PROGRAM_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<rstr>[rs]'(?:[^'\\]|\\.)*')
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<num>-?(?:\d[\d_]*(?:\.[\d_]+)?|\.\d[\d_]*))
  | (?P<path>\.[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*|\[\d+\])*)
  | (?P<op>&&|\|\||\?\?|==|!=|<=|>=|<|>|!|\(|\)|,|\+|-|\*|/|%|\{|\}|\[|\]|=|;|:|\.)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


class _EventRef:
    """Sentinel for a bare `.` (whole-event) expression. Resolved at
    apply time, when the frame's schema is known."""

    __slots__ = ()


_EVENT = _EventRef()


class _Env:
    """Overlay environment: only MUTATED paths/vars are stored; reads
    fall back to the physical column (paths) or null (vars)."""

    __slots__ = ("fields", "vars", "dropped", "abort", "has_abort")

    def __init__(self):
        self.fields: dict[str, Column] = {}
        self.vars: dict[str, Column] = {}
        self.dropped: set[str] = set()  # unconditional top-level del()
        self.abort: Column = F.lit(False)
        self.has_abort = False

    def copy(self) -> "_Env":
        e = _Env()
        e.fields = dict(self.fields)
        e.vars = dict(self.vars)
        e.dropped = set(self.dropped)
        e.abort = self.abort
        e.has_abort = self.has_abort
        return e

    def read_path(self, name: str) -> Column:
        if name in self.fields:
            return self.fields[name]
        if name in self.dropped:
            return F.lit(None)
        return F.col(name)

    def read_var(self, name: str) -> Column | None:
        return self.vars.get(name)


@dataclass
class VrlProgram:
    """Compiled program: the net effect on the event schema."""

    assignments: dict[str, Column]  # event field -> final expression
    dropped: list[str] = field(default_factory=list)
    abort: Column | None = None  # rows where `abort` executed
    result: Column | None = None  # the program's value (last statement)
    result_is_event: bool = False  # program ended with a bare `.`

    def event_struct(self, columns: list[str]) -> Column:
        """The final event as one struct Column, for a frame with the
        given physical columns (used when the program's value is `.`)."""
        names = [c for c in columns if c not in self.dropped]
        names += [c for c in self.assignments if c not in names]
        return F.struct(
            *[
                self.assignments.get(c, F.col(c)).alias(c)
                for c in names
                if c not in self.dropped
            ]
        )

    def apply(
        self,
        df: DataFrame,
        drop_on_abort: bool = False,
        abort_flag_field: str | None = None,
    ) -> DataFrame:
        """One projection. Abort semantics mirror operators.remap:
        aborting rows pass through UNMODIFIED (assignments rolled
        back, deletes kept as original values) unless dropped."""
        cols = dict(self.assignments)
        if self.abort is not None:
            if drop_on_abort:
                # filter FIRST on original columns, then assign
                df = df.filter(~self.abort)
            else:
                for name, expr in cols.items():
                    orig = (
                        F.col(name) if name in df.columns else F.lit(None)
                    )
                    cols[name] = F.when(self.abort, orig).otherwise(expr)
                if abort_flag_field:
                    cols[abort_flag_field] = self.abort
        out = df.withColumns(cols) if cols else df
        if self.dropped and (self.abort is None or drop_on_abort):
            out = out.drop(*self.dropped)
        elif self.dropped:
            # abort rollback keeps originals for aborted rows; column
            # presence cannot vary per row, so deleted fields are
            # NULLed for surviving rows instead of schema-dropped
            out = out.withColumns(
                {
                    name: F.when(self.abort, F.col(name)).otherwise(
                        F.lit(None)
                    )
                    for name in self.dropped
                    if name in out.columns
                }
            )
        return out


class _ProgramParser(_Parser):
    """Statement-level parser that symbolically executes as it parses.

    Inherits the full VRL-lite expression grammar from conditions._Parser
    and overrides path/ident resolution to consult the live
    environment, so ``.b = .a + 1`` after ``.a = 2`` folds correctly.
    """

    def __init__(self, text: str):
        self.toks = []
        self.spans = []  # (start, end) per token, for adjacency checks
        pos = 0
        while pos < len(text):
            m = _PROGRAM_TOKEN_RE.match(text, pos)
            if not m:
                raise ValueError(
                    f"VRL program: cannot tokenize at {text[pos:pos+20]!r}"
                )
            pos = m.end()
            if m.lastgroup != "ws":
                self.toks.append((m.lastgroup, m.group()))
                self.spans.append((m.start(), m.end()))
        self.i = 0
        self.env = _Env()
        self.last_value: Column | None = None

    # --- env-aware resolution -------------------------------------------
    def resolve_path(self, name: str) -> Column:
        # only whole-column mutations are tracked; a dotted/indexed
        # sub-path (.a.b, .a[0]) reads the ROOT through the env, then
        # walks fields/indexes
        if "." not in name and "[" not in name:
            return self.env.read_path(name)
        parts = re.findall(r"[A-Za-z_][A-Za-z0-9_]*|\[\d+\]", name)
        col = self.env.read_path(parts[0])
        for p in parts[1:]:
            col = (
                col.getItem(int(p[1:-1])) if p.startswith("[") else col.getField(p)
            )
        return col

    def resolve_ident(self, name: str) -> Column:
        v = self.env.read_var(name)
        return v if v is not None else F.col(name)

    # --- expression extensions (corpus surface) -------------------------
    def parse_primary(self):
        k, v = self.peek()
        if k == "rstr":
            # r'…' regex literal / s'…' raw string — both become tagged
            # string literals; match() unwraps the pattern via _vs_pyval
            self.next()
            body = v[2:-1].replace("\\'", "'")
            lit = F.lit(body)
            lit._vs_pyval = body
            return lit
        elif (k, v) == ("op", "."):
            # bare `.` = the whole event (vrl_target root query);
            # supported only as a standalone value — it resolves to the
            # final event struct at apply time (schema known then)
            self.next()
            return _EVENT
        elif (k, v) == ("op", "["):
            self.next()
            col = self._array_literal()
        elif (k, v) == ("op", "{"):
            self.next()
            col = self._brace_expr()
        elif (k, v) == ("ident", "if"):
            self.next()
            col = self._if_chain()
        else:
            col = super().parse_primary()
        # postfix access: `foo.bar` / `{…}.foo` / `[…][1]` tokenize as
        # primary + path / bracket — apply ONLY when directly adjacent
        # (a newline-separated `.bar = …` statement must not be
        # swallowed). Positional-struct arrays index via their _n
        # fields (_vs_tuple tag).
        while True:
            nk, nv = self.peek()
            if nk == "path" and self._adjacent():
                self.next()
                for part in re.findall(
                    r"[A-Za-z_][A-Za-z0-9_]*|\[\d+\]", nv[1:]
                ):
                    col = (
                        col.getItem(int(part[1:-1]))
                        if part.startswith("[")
                        else col.getField(part)
                    )
            elif (nk, nv) == ("op", "[") and self._adjacent():
                self.next()
                ik, iv = self.next()
                if ik != "num":
                    raise ValueError(
                        "VRL program: only literal indexes are supported"
                    )
                self.expect("]")
                idx = int(iv)
                if (getattr(col, "__dict__", None) or {}).get("_vs_tuple"):
                    col = col.getField(f"_{idx}")
                else:
                    col = col.getItem(idx)
            else:
                break
        return col

    def _adjacent(self) -> bool:
        return (
            0 < self.i < len(self.spans)
            and self.spans[self.i][0] == self.spans[self.i - 1][1]
        )

    def _array_literal(self) -> Column:
        items = []
        while self.peek()[1] != "]":
            items.append(self.parse_coalesce())
            if self.peek()[1] == ",":
                self.next()
            elif self.peek()[1] != "]":
                raise ValueError("VRL program: malformed array literal")
        self.expect("]")
        if not items:
            return F.array().cast("array<string>")
        missing = object()
        pyvals = [
            (getattr(x, "__dict__", None) or {}).get("_vs_pyval", missing)
            for x in items
        ]
        types = {type(p) for p in pyvals if p is not missing and p is not None}
        if (
            any(p is missing for p in pyvals)
            or len(types) <= 1
            or types <= {int, float}
        ):
            # homogeneous (or computed, assumed homogeneous) → real array
            return F.array(*items)
        # heterogeneous literal array → positional struct (_0.._n); the
        # golden harness renders it back to a list
        st = F.struct(*[c.alias(f"_{i}") for i, c in enumerate(items)])
        st._vs_tuple = True
        return st

    def _brace_expr(self) -> Column:
        # '{' already consumed: object literal ({"k": v}), empty object,
        # or block expression ({ stmts })
        nk, nv = self.peek()
        if nv == "}":
            self.next()
            return F.create_map()
        if nk == "str" and self.i + 1 < len(self.toks) and self.toks[
            self.i + 1
        ] == ("op", ":"):
            from vector_spark.conditions import _unescape

            pairs = []
            while self.peek()[1] != "}":
                sk, sv = self.next()
                if sk != "str":
                    raise ValueError("VRL program: object keys are strings")
                self.expect(":")
                pairs.append((_unescape(sv), self.parse_coalesce()))
                if self.peek()[1] == ",":
                    self.next()
            self.expect("}")
            return F.struct(*[c.alias(key) for key, c in pairs])
        # block expression: statements share the enclosing scope (VRL
        # has no block-local variables); value = last statement's value
        val = F.lit(None)
        while self.peek()[1] != "}":
            if self.peek() == (None, None):
                raise ValueError("VRL program: unterminated block")
            val = self.parse_stmt()
        self.expect("}")
        return val

    # --- statements -----------------------------------------------------
    def run(self) -> _Env:
        while self.peek() != (None, None):
            self.last_value = self.parse_stmt()
        return self.env

    def parse_stmt(self) -> Column:
        k, v = self.peek()
        if v == ";":
            self.next()
            return self.last_value if self.last_value is not None else F.lit(None)
        if k == "ident" and v == "abort":
            self.next()
            self.env.abort = F.lit(True)
            self.env.has_abort = True
            return F.lit(None)
        if (
            k == "ident"
            and v == "del"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1] == ("op", "(")
        ):
            self.next()
            self.next()
            targets = []
            while self.peek()[1] != ")":
                pk, pv = self.next()
                if pk != "path":
                    raise ValueError("VRL program: del() takes .paths")
                targets.append(pv[1:])
                if self.peek()[1] == ",":
                    self.next()
            self.expect(")")
            prior = self.env.read_path(targets[0]) if targets else F.lit(None)
            for t in targets:
                self.env.fields.pop(t, None)
                self.env.dropped.add(t)
            return prior  # del() returns the deleted value (del.rs)
        # assignment? lookahead: path/ident followed by bare '='
        if k in ("path", "ident") and self.i + 1 < len(self.toks):
            nk, nv = self.toks[self.i + 1]
            if (nk, nv) == ("op", "="):
                self.next()
                self.next()
                expr = self.parse_coalesce()
                if k == "path":
                    name = v[1:]
                    self.env.fields[name] = expr
                    self.env.dropped.discard(name)
                else:
                    self.env.vars[v] = expr
                return expr  # assignment evaluates to the assigned value
        # expression statement (includes statement-level if/blocks via
        # parse_primary); its value is the program value if last
        return self.parse_coalesce()

    def _block_value(self) -> Column:
        self.expect("{")
        val = F.lit(None)
        while self.peek()[1] != "}":
            if self.peek() == (None, None):
                raise ValueError("VRL program: unterminated block")
            val = self.parse_stmt()
        self.expect("}")
        return val

    def _if_chain(self) -> Column:
        """`if cond {…} else if … else {…}` — used in BOTH statement and
        expression position (if_statement.rs is an expression in VRL).
        Executes each branch against a copy of the environment, merges
        with when/otherwise, and returns the chain's value."""
        cond = F.coalesce(self.parse_coalesce(), F.lit(False))
        base = self.env
        self.env = base.copy()
        tval = self._block_value()
        then_env = self.env  # nested ifs replace self.env — re-read it
        self.env = base.copy()
        eval_ = F.lit(None)
        if self.peek() == ("ident", "else"):
            self.next()
            if self.peek() == ("ident", "if"):
                self.next()
                eval_ = self._if_chain()
            else:
                eval_ = self._block_value()
        else_env = self.env
        self.env = self._merge(base, cond, then_env, else_env)
        return F.when(cond, tval).otherwise(eval_)

    @staticmethod
    def _merge(base: _Env, cond: Column, t: _Env, e: _Env) -> _Env:
        out = base.copy()
        for name in set(t.fields) | set(e.fields):
            tv = t.fields.get(name, t.read_path(name))
            ev = e.fields.get(name, e.read_path(name))
            if name in t.fields or name in e.fields:
                out.fields[name] = F.when(cond, tv).otherwise(ev)
        for name in set(t.vars) | set(e.vars):
            tv = t.vars.get(name, F.lit(None))
            ev = e.vars.get(name, F.lit(None))
            out.vars[name] = F.when(cond, tv).otherwise(ev)
        # conditional del: NULL the field on the branch that deleted it
        # (schema-level drop only when BOTH branches deleted it)
        t_only = t.dropped - base.dropped
        e_only = e.dropped - base.dropped
        for name in t_only & e_only:
            out.dropped.add(name)
            out.fields.pop(name, None)
        for name in (t_only | e_only) - (t_only & e_only):
            dropper = cond if name in t_only else ~cond
            keeper = e if name in t_only else t
            kept = keeper.fields.get(name, keeper.read_path(name))
            out.fields[name] = F.when(dropper, F.lit(None)).otherwise(kept)
        if t.has_abort or e.has_abort:
            out.abort = F.when(cond, t.abort).otherwise(e.abort)
            out.has_abort = True
        return out


def compile_vrl_program(source: str) -> VrlProgram:
    """Compile VRL program *source* to its net schema effect."""
    p = _ProgramParser(source)
    env = p.run()
    is_event = isinstance(p.last_value, _EventRef)
    return VrlProgram(
        assignments=dict(env.fields),
        dropped=sorted(env.dropped),
        abort=env.abort if env.has_abort else None,
        result=None if is_event else p.last_value,
        result_is_event=is_event,
    )
