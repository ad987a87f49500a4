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
- event paths are schema-static: an absent column reads as typed
  null (kind "null") rather than the reference's ``any``, so the
  fallibility analysis is MORE precise — programs the reference
  rejects for possible-runtime-error on unknown paths can compile
  here (tests/test_vrl_golden.py lists the three corpus files).
- ``return`` terminates only the reference's function blocks — not a
  remap program — and is not accepted.

Strict static diagnostics (strict=True, always on for programs):
unhandled fallibility E100/E103 (kind-aware per-function
fallibility), unnecessary handling E104/E651 (plan-time literals
only), abort-on-infallible E620, fallible arguments E630, type
checks E102/E610/E652/E660, syntax/lexical E101/E202/E203/E205 —
the reference's diagnostics corpus is pinned in the REJECTED tier of
tests/test_vrl_golden.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.conditions import (
    _MISSING,
    _Parser,
    _clear_fallible,
    _col_tags,
    _err_value,
    _is_fallible,
    _lit_static,
    _mark_fallible,
    _merge_cols,
    _obj_fields,
    _obj_struct,
    _pyv,
    _static_err,
    _stype,
    _tag,
)

# lexer-reserved identifier names (lib/vrl/parser/src/lex.rs
# `ident_or_reserved`): legal as function names and path segments,
# rejected as variable assignment targets (E205, reserved_keyword.vrl)
_RESERVED_IDENTS = frozenset(
    "array bool boolean break continue do emit float for forall foreach "
    "all each any try undefined int integer iter object regex return "
    "string traverse timestamp duration unless walk while loop".split()
)


def _static_val(c):
    """Full static Python value of an expression (scalar, list, dict)
    or _MISSING. Lists/dicts come from literals and statically parsed
    JSON/k=v; used for plan-time evaluation of container functions."""
    d = _col_tags(c)
    if "_vs_error" in d:
        return _MISSING
    if "_vs_pystat" in d:
        return d["_vs_pystat"]
    return _pyv(c)


def _render_static(v) -> Column:
    """Python value → fully-tagged literal Column. Dicts become object
    structs with known fields; heterogeneous lists become positional
    structs (the golden harness renders them back)."""
    if isinstance(v, dict):
        st = _obj_struct({k: _render_static(x) for k, x in v.items()})
        st._vs_pystat = v
        return st
    if isinstance(v, list):
        col = _pack_items([_render_static(x) for x in v])
        col._vs_pystat = v
        return col
    return _lit_static(v)


_COMMON_LOG_RE = (
    r'^(\S+) (\S+) (\S+) \[([^\]]*)\] "([^"]*)" (\S+) (\S+)\s*$'
)


def _vrl_parse_common_log(col: Column) -> Column:
    """Column-level parse_common_log (parse_common_log.rs /
    log_util.rs REGEX_APACHE_COMMON_LOG) returning an object with
    known fields — the shape `.  = parse_common_log!(.log)` needs.
    `-` and unmatched groups are nulls (the static-schema analogue of
    VRL's omitted fields). One regex, per-group extraction; the
    DataFrame-level parse (functions/logformats.parse_common_log) is
    the bulk path."""
    col = col.cast("string")

    def g(i: int) -> Column:
        v = F.regexp_extract(col, _COMMON_LOG_RE, i)
        return F.when((v == "") | (v == "-"), F.lit(None)).otherwise(v)

    message = g(5)
    req = F.split(message, " ")
    fields = {
        "host": g(1),
        "identity": g(2),
        "user": g(3),
        "timestamp": _tag(
            F.to_timestamp(g(4), "dd/MMM/yyyy:HH:mm:ss xx"), "timestamp"
        ),
        "message": message,
        "method": F.element_at(req, 1),
        "path": F.element_at(req, 2),
        "protocol": F.element_at(req, 3),
        "status": g(6).cast("int"),
        "size": g(7).cast("int"),
    }
    return _obj_struct(fields)


_SYSLOG_SEVERITIES = [
    "emerg", "alert", "crit", "err", "warning", "notice", "info", "debug",
]
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]
# RFC5424: <PRI>VERSION TS HOST APP PROCID MSGID SD [MSG]
_SYSLOG5424_VRL_RE = (
    r"^<(\d+)>(\d{1,2}) (\S+) (\S+) (\S+) (\S+) (\S+) (-|\[.*?\])(?: (.*))?$"
)
# RFC3164-ish: <PRI>Mmm dd HH:MM:SS host app[pid]: msg
_SYSLOG3164_VRL_RE = (
    r"^(?:<(\d+)>)?([A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(\S+) ([^\[\s:]+)(?:\[(\d+)\])?:? ?(.*)$"
)


def _syslog_static(s: str) -> dict | None:
    """Plan-time parse_syslog of a literal (parse_syslog.rs /
    syslog_loose): RFC5424 first, then RFC3164. None = unparseable."""
    m = re.match(_SYSLOG5424_VRL_RE, s)
    if m:
        pri = int(m.group(1))
        procid = m.group(6)
        out = {
            "severity": _SYSLOG_SEVERITIES[pri & 7],
            "facility": _SYSLOG_FACILITIES[pri >> 3]
            if (pri >> 3) < len(_SYSLOG_FACILITIES)
            else None,
            "version": int(m.group(2)),
            "timestamp": None,  # replaced with a typed literal below
            "hostname": None if m.group(4) == "-" else m.group(4),
            "appname": None if m.group(5) == "-" else m.group(5),
            "procid": int(procid)
            if procid.isdigit()
            else (None if procid == "-" else procid),
            "msgid": None if m.group(7) == "-" else m.group(7),
            "message": m.group(9) or "",
        }
        out["_ts_raw"] = None if m.group(3) == "-" else m.group(3)
        return out
    m = re.match(_SYSLOG3164_VRL_RE, s)
    if m and m.group(1) is not None:
        pri = int(m.group(1))
        return {
            "severity": _SYSLOG_SEVERITIES[pri & 7],
            "facility": _SYSLOG_FACILITIES[pri >> 3]
            if (pri >> 3) < len(_SYSLOG_FACILITIES)
            else None,
            "hostname": m.group(3),
            "appname": m.group(4),
            "procid": int(m.group(5)) if m.group(5) else None,
            "message": m.group(6),
            "_ts_raw": None,
        }
    return None


def _vrl_parse_syslog(col: Column, span: tuple | None = None) -> Column:
    """parse_syslog as a plan-time object: literals fold through
    _syslog_static (failures become the reference's position-bearing
    error value — infallible_err_merge_assignment.vrl pins
    `at (start:end)`); runtime columns compile to one regex dispatch
    over the RFC5424 and RFC3164 layouts with known fields."""
    p = _pyv(col)
    if isinstance(p, str):
        d = _syslog_static(p)
        if d is None:
            at = f" at ({span[0]}:{span[1]})" if span else ""
            return _err_value(
                f'function call error for "parse_syslog"{at}: unable to '
                f"parse input as valid syslog message"
            )
        ts_raw = d.pop("_ts_raw", None)
        fields = {k: _lit_static(v) for k, v in d.items()}
        if ts_raw is not None:
            from datetime import datetime, timezone

            dt = datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
            lit = F.lit(dt.astimezone(timezone.utc).replace(tzinfo=None))
            fields["timestamp"] = _tag(lit, "timestamp")
        elif "timestamp" in d:
            fields["timestamp"] = _tag(F.lit(None), "timestamp")
        return _obj_struct(fields)

    col = col.cast("string")
    is54 = col.rlike(r"^<\d+>\d{1,2} ")

    def e54(i: int) -> Column:
        v = F.regexp_extract(col, _SYSLOG5424_VRL_RE, i)
        return F.when((v == "") | (v == "-"), F.lit(None)).otherwise(v)

    def e31(i: int) -> Column:
        v = F.regexp_extract(col, _SYSLOG3164_VRL_RE, i)
        return F.when((v == "") | (v == "-"), F.lit(None)).otherwise(v)

    pri = F.when(is54, e54(1)).otherwise(e31(1)).cast("int")
    sev_arr = F.array(*[F.lit(s) for s in _SYSLOG_SEVERITIES])
    fac_arr = F.array(*[F.lit(s) for s in _SYSLOG_FACILITIES])
    procid = F.when(is54, e54(6)).otherwise(e31(5))
    s, i = lambda c: _tag(c, "string"), lambda c: _tag(c, "integer")
    fields = {
        "severity": s(F.element_at(sev_arr, pri.bitwiseAND(F.lit(7)) + 1)),
        "facility": s(
            F.element_at(fac_arr, F.shiftright(pri, 3).cast("int") + 1)
        ),
        "version": i(F.when(is54, e54(2)).cast("int")),
        "timestamp": _tag(
            F.when(is54, F.try_to_timestamp(e54(3))), "timestamp"
        ),
        "hostname": s(F.when(is54, e54(4)).otherwise(e31(3))),
        "appname": s(F.when(is54, e54(5)).otherwise(e31(4))),
        "procid": i(procid.cast("long")),
        "msgid": s(F.when(is54, e54(7))),
        "message": s(
            F.when(is54, F.coalesce(e54(9), F.lit(""))).otherwise(e31(6))
        ),
    }
    return _obj_struct(fields)


def _dt_struct_fields(dt: str | None) -> dict[str, str] | None:
    """Top-level field→dtype map of a ``struct<…>`` simpleString, or
    None for non-structs. Handles nested angle brackets; field names
    may contain @ and other specials (ampersat.vrl)."""
    if not dt or not dt.startswith("struct<") or not dt.endswith(">"):
        return None
    fields: dict[str, str] = {}
    depth, cur = 0, ""
    for ch in dt[7:-1]:
        if ch == "," and depth == 0:
            k, _, v = cur.partition(":")
            fields[k] = v
            cur = ""
            continue
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        cur += ch
    if cur:
        k, _, v = cur.partition(":")
        fields[k] = v
    return fields


def _with_dtype(col: Column, dt: str | None) -> Column:
    if dt:
        col._vs_dtype = dt
        k = _spark_kind(dt)
        if k is not None:
            col = _tag(col, k)
    return col


def _get_field(col: Column, name: str) -> Column:
    """Field access that preserves plan-time tags when the object's
    fields are known (merged/parsed objects keep their member kinds),
    and schema dtypes when the frame's nested types are (schema-typed
    struct columns: a missing field is VRL null, not an analysis
    error)."""
    if _stype(col) == "null":
        return _tag(F.lit(None), "null")
    fields = _obj_fields(col)
    if fields is not None:
        if name in fields:
            return fields[name]
        return _tag(F.lit(None), "null")
    flds = _dt_struct_fields(_col_tags(col).get("_vs_dtype"))
    absent = _col_tags(col).get("_vs_maybe_absent")
    if flds is not None:
        if name not in flds:
            return _tag(F.lit(None), "null")
        out = _with_dtype(col.getField(name), flds[name])
    else:
        out = col.getField(name)
    if absent:
        # a field of a maybe-absent parent is itself maybe-absent
        out._vs_maybe_absent = True
    return out


def _get_index(col: Column, idx: int) -> Column:
    """VRL array indexing: 0-based, negative counts from the end,
    out-of-range is null (query/array_indexing.vrl,
    issues/5546) — F.get is the null-safe accessor (getItem aborts
    under ANSI on out-of-range)."""
    d = _col_tags(col)
    if d.get("_vs_stype") == "null" and "_vs_error" not in d:
        return _tag(F.lit(None), "null")
    sv = d.get("_vs_pystat")
    if isinstance(sv, list):
        v = sv[idx] if -len(sv) <= idx < len(sv) else None
        return _render_static(v)
    mem = d.get("_vs_members")
    if isinstance(mem, list):
        # literal array: the member column IS the element — exact
        # kind, known in-range (out-of-range is a plan-time null)
        if -len(mem) <= idx < len(mem):
            return mem[idx]
        return _tag(F.lit(None), "null")
    if d.get("_vs_tuple"):
        return col.getField(f"_{idx}")
    # array element dtype flows through (schema-typed nested access)
    dt = _col_tags(col).get("_vs_dtype")
    el = dt[6:-1] if dt and dt.startswith("array<") and dt.endswith(">") else None
    if idx < 0:
        out = _with_dtype(F.get(col, F.size(col) + F.lit(idx)), el)
    else:
        out = _with_dtype(F.get(col, idx), el)
    # element-level fallibility (unhandled_parse_regex_all_type.vrl):
    # a runtime index may be out of range, so the element's kind
    # unions null — kind-requiring functions downstream become
    # fallible (the reference compiles array access as `kind | null`)
    out._vs_maybe_absent = True
    return out


def _with_path(cur: Column | None, parts: list[str], value: Column) -> Column:
    """Nested-path assignment: build the updated container for
    `.a.b = x` / `foo.bar = 5` (assignment/single_variable_path.vrl).
    ``cur=None`` creates fresh objects along the path; known-field
    objects update structurally; runtime structs use withField."""
    if not parts:
        return value
    head = parts[0]
    if head.startswith("["):
        # index assignment (assignment/indexing.vrl, issues/6319):
        # requires the current value to be a plan-time list (or absent)
        # — per-row array surgery has no static schema. In-range
        # replaces; past-the-end pads with nulls (VRL semantics);
        # negative creates [v, null, …] when out of range.
        idx = int(head[1:-1])
        if cur is None:
            items: list[Column] = []
        else:
            sv = _static_val(cur)
            if isinstance(sv, list):
                items = [_render_static(x) for x in sv]
            elif sv is not _MISSING:
                # indexed assignment to a non-array REPLACES it with an
                # array (indexing.vrl: v1 = 0; v1[-1] = 0 → [0])
                items = []
            else:
                raise ValueError(
                    "VRL program: index assignment needs a plan-time "
                    "list value"
                )
        inner = _with_path(
            items[idx] if -len(items) <= idx < len(items) else None,
            parts[1:],
            value,
        )
        if idx < 0:
            if -idx <= len(items):
                items[idx] = inner
            else:
                items = (
                    [inner]
                    + [_lit_static(None)] * (-idx - len(items) - 1)
                    + items
                )
        elif idx < len(items):
            items[idx] = inner
        else:
            items = items + [_lit_static(None)] * (idx - len(items)) + [inner]
        out = _pack_items(items)
        vals = [_static_val(x) for x in items]
        if all(x is not _MISSING for x in vals):
            out._vs_pystat = vals
        return out
    if cur is None:
        return _obj_struct({head: _with_path(None, parts[1:], value)})
    fields = _obj_fields(cur)
    if fields is not None:
        f = dict(fields)
        f[head] = _with_path(f.get(head), parts[1:], value)
        return _obj_struct(f)
    if len(parts) == 1:
        return _tag(cur.withField(head, value), "object")
    return _tag(
        cur.withField(head, _with_path(cur.getField(head), parts[1:], value)),
        "object",
    )


def _pack_items(items: list[Column]) -> Column:
    """Array-literal packing shared by the parser and _render_static:
    homogeneous kinds → real array; mixed kinds → positional struct."""
    if not items:
        return _tag(F.array().cast("array<string>"), "array")
    kinds = {_stype(x) for x in items}
    kinds.discard("null")
    if kinds == {"object"}:
        # objects are array-homogeneous only when their field layouts
        # agree — [., err] can hold two different shapes
        layouts = set()
        for x in items:
            if _stype(x) == "null":
                continue
            fl = _obj_fields(x)
            if fl is None:
                layouts.clear()
                break
            layouts.add(tuple(fl.keys()))
        if len(layouts) > 1:
            st = F.struct(*[c.alias(f"_{i}") for i, c in enumerate(items)])
            st._vs_tuple = True
            return _tag(st, "array")
    if None in kinds:
        # unknown member kind: fall back to the pyval heuristic
        missing = object()
        pyvals = [
            (getattr(x, "__dict__", None) or {}).get("_vs_pyval", missing)
            for x in items
        ]
        types = {type(p) for p in pyvals if p is not missing and p is not None}
        if any(p is missing for p in pyvals) or len(types) <= 1 or types <= {int, float}:
            out = _tag(F.array(*items), "array")
            out._vs_members = items
            return out
    elif len(kinds) <= 1 or kinds <= {"integer", "float"}:
        # literal arrays keep their member columns: indexing returns
        # the exact member (known kind, known in-range — the reference
        # tracks per-index kinds on literal arrays, issue 6361)
        out = _tag(F.array(*items), "array")
        out._vs_members = items
        return out
    st = F.struct(*[c.alias(f"_{i}") for i, c in enumerate(items)])
    st._vs_tuple = True
    return _tag(st, "array")

_PROGRAM_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<rstr>[rst]'(?:[^'\\]|\\.)*')
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<num>-?(?:\d[\d_]*(?:\.[\d_]+)?|\.\d[\d_]*))
  | (?P<path>\.[A-Za-z_@][A-Za-z0-9_@]*(?:\.[A-Za-z_@][A-Za-z0-9_@]*|\[-?\d+\])*)
  | (?P<op>&&|\|\||\|=|\?\?|==|!=|<=|>=|<|>|!|\(|\)|,|\+|-|\*|/|%|\{|\}|\[|\]|=|;|:|\.|\||@)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


_PATH_SEG_RE = re.compile(r'"[^"]*"|[A-Za-z_@][A-Za-z0-9_@]*|\[-?\d+\]')


def _path_parts(name: str) -> list[str]:
    """Split a dotted path into segments: identifiers (may contain @),
    [n] indexes, and ``"quoted segments"`` (quotes stripped — they mark
    field names with spaces/specials, encoded by _try_target)."""
    return [
        p[1:-1] if p.startswith('"') else p
        for p in _PATH_SEG_RE.findall(name)
    ]


def _spark_kind(dt: str) -> str | None:
    """Spark dtype simpleString → VRL kind (schema-typed event paths:
    the frame's schema IS VRL's type environment on a fixed schema)."""
    dt = dt.lower()
    if dt.startswith("array"):
        return "array"
    if dt.startswith(("struct", "map")):
        return "object"
    if dt == "string":
        return "string"
    if dt in ("bigint", "int", "smallint", "tinyint", "long", "integer", "short", "byte"):
        return "integer"
    if dt in ("double", "float") or dt.startswith("decimal"):
        return "float"
    if dt == "boolean":
        return "boolean"
    if dt.startswith("timestamp") or dt == "date":
        return "timestamp"
    return None


class _EventRef:
    """Sentinel for a bare `.` (whole-event) expression. Resolved at
    apply time, when the frame's schema is known."""

    __slots__ = ()


_EVENT = _EventRef()


class _Env:
    """Overlay environment: only MUTATED paths/vars are stored; reads
    fall back to the physical column (paths) or null (vars)."""

    __slots__ = (
        "fields", "vars", "dropped", "abort", "has_abort", "cols",
        "kinds", "dtypes",
    )

    def __init__(
        self,
        cols: list[str] | None = None,
        kinds: dict | None = None,
        dtypes: dict | None = None,
    ):
        self.fields: dict[str, Column] = {}
        self.vars: dict[str, Column] = {}
        self.dropped: set[str] = set()  # unconditional top-level del()
        self.abort: Column = F.lit(False)
        self.has_abort = False
        self.cols = cols  # physical schema when known (None = unknown)
        self.kinds = kinds or {}  # column name → VRL kind (shared ref)
        self.dtypes = dtypes or {}  # column name → Spark simpleString

    def copy(self) -> "_Env":
        e = _Env(self.cols, self.kinds, self.dtypes)
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
        if self.cols is not None and name not in self.cols:
            # known schema, nonexistent field → VRL null (an unguarded
            # F.col would be a Catalyst analysis error)
            return _tag(F.lit(None), "null")
        # names with non-identifier chars (`foo@bar`, ampersat.vrl)
        # need backtick quoting or the column resolver rejects them
        col = F.col(f"`{name}`" if not name.isidentifier() else name)
        dt = self.dtypes.get(name)
        if dt is not None:
            col._vs_dtype = dt  # nested struct/array access stays typed
        k = self.kinds.get(name)
        if k is not None:
            col = _tag(col, k)
        return col

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


# string→string stdlib functions that are infallible given a string
# input (their Parameter lists accept any string; no runtime error arm)
_STR_IN_STR_OUT = {
    "strip_whitespace",
    "strip_ansi_escape_codes",
    "truncate",
    "replace",
    "trim",
}

# always-fallible stdlib signatures (each fn's TypeDef in
# lib/vrl/stdlib/src/<fn>.rs): calls carry the Fallible bit unless
# handled by `fn!()`, `??`, or `ok, err =`. parse_* are all fallible
# by prefix.
_FALLIBLE_FNS = {
    "to_timestamp", "to_regex", "from_unix_timestamp", "assert",
    "assert_eq", "slice", "decode_base64", "get",
}

# coercion asserts: infallible exactly when the argument's kind is
# already the target kind (`string(.known_str)` can't fail;
# `string(.unknown)` can — fallible_unless in each coercion's TypeDef)
_COERCE_KIND = {
    "string": "string", "int": "integer", "float": "float",
    "bool": "boolean", "array": "array", "object": "object",
    "timestamp": "timestamp",
}


# functions whose TypeDef demands a concrete input kind (bytes /
# numeric): a maybe-absent argument (array-element access — kind
# unions null) makes the call fallible, per the reference's
# fallible_unless(kind) on each signature
_KIND_REQUIRED_FNS = _STR_IN_STR_OUT | {
    "md5", "sha1", "sha2", "sha3", "upcase", "downcase", "split",
    "join", "length", "floor", "ceil", "round", "abs",
    "format_timestamp", "format_number", "encode_base64", "contains",
    "starts_with", "ends_with", "match",
}


def _maybe_absent(a) -> bool:
    return bool(_col_tags(a).get("_vs_maybe_absent"))


def _fn_fallible(name: str, args: list) -> bool:
    """Call-site fallibility, kind-aware like the reference's
    `fallible_unless`: `to_int(<timestamp>)` is infallible
    (issues/6792_lost_type_defs.vrl), `to_string(<unknown>)` is
    fallible (internal/infallible_ok_maybe_null.vrl). A maybe-absent
    argument (array-element access unions null into the kind) makes
    any kind-requiring call fallible
    (unhandled_parse_regex_all_type.vrl → E103)."""
    k0 = _stype(args[0]) if args else None
    if args and _maybe_absent(args[0]) and (
        name in _KIND_REQUIRED_FNS or name in _COERCE_KIND
    ):
        return True
    if name in _COERCE_KIND:
        return k0 != _COERCE_KIND[name]
    if name in ("to_int", "to_float", "to_bool", "to_unix_timestamp"):
        # to_int.rs: with_fallibility(has_kind(Bytes|Array|Object|Regex))
        return k0 in (None, "string", "array", "object", "regex")
    if name == "to_string":
        return k0 is None
    return name.startswith("parse_") or name in _FALLIBLE_FNS


# fixed result kinds of the conversion/coercion fns (their TypeDefs)
_RESULT_KIND = {
    "to_int": "integer", "to_float": "float", "to_bool": "boolean",
    "to_string": "string", "int": "integer", "float": "float",
    "bool": "boolean", "string": "string", "to_unix_timestamp": "integer",
    "length": "integer", "upcase": "string", "downcase": "string",
    "md5": "string", "sha1": "string", "sha2": "string", "sha3": "string",
    "encode_json": "string", "encode_base64": "string",
    "format_number": "string", "format_timestamp": "string",
    "join": "string", "uuid_v4": "string",
}

# functions whose signature can NEVER fail regardless of argument
# kinds — `fn!()` on these is the reference's E620
# (cant_abort_infallible_function.vrl: `now!()`). Kind-dependent fns
# (upcase, sha3, length) stay out: `upcase!(.unknown)` is legal there.
_HARD_INFALLIBLE = {"now", "uuid_v4", "encode_json"}


class _ProgramParser(_Parser):
    """Statement-level parser that symbolically executes as it parses.

    Inherits the full VRL-lite expression grammar from conditions._Parser
    and overrides path/ident resolution to consult the live
    environment, so ``.b = .a + 1`` after ``.a = 2`` folds correctly.

    strict=True turns on the reference compiler's static diagnostics
    (fallibility E100/E103/E104/E620/E630/E651, type checks E660/E652,
    syntax E202/E203/E205) — a program the reference rejects compiles
    to a ValueError here, not to a wrong plan.
    """

    strict = True

    def __init__(
        self,
        text: str,
        columns: list[str] | None = None,
        schema: dict | None = None,
    ):
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
        self.columns = list(columns) if columns is not None else None
        kinds = {
            n: k
            for n, dt in (schema or {}).items()
            if (k := _spark_kind(str(dt))) is not None
        }
        dtypes = {n: str(dt) for n, dt in (schema or {}).items()}
        self.env = _Env(self.columns, kinds, dtypes)
        self.last_value: Column | None = None

    def read_event(self) -> Column:
        """The whole event as a struct, at the CURRENT program point:
        physical columns (minus deleted) overlaid with assignments."""
        names = [c for c in (self.columns or []) if c not in self.env.dropped]
        names += [c for c in self.env.fields if c not in names]
        return _obj_struct(
            {c: self.env.read_path(c) for c in names if c not in self.env.dropped}
        )

    def _discard(self, fn):
        """Statically dead branch: consume its tokens but roll back any
        environment mutations (VRL short-circuit — `true || (.foo =
        true)` must not assign)."""
        saved = self.env
        self.env = saved.copy()
        try:
            return fn()
        finally:
            self.env = saved

    # --- env-aware resolution -------------------------------------------
    def resolve_path(self, name: str) -> Column:
        # only whole-column mutations are tracked; a dotted/indexed
        # sub-path (.a.b, .a[0]) reads the ROOT through the env, then
        # walks fields/indexes
        if "." not in name and "[" not in name:
            return self.env.read_path(name)
        parts = _path_parts(name)
        col = self.env.read_path(parts[0])
        for p in parts[1:]:
            col = (
                _get_index(col, int(p[1:-1]))
                if p.startswith("[")
                else _get_field(col, p)
            )
        return col

    def resolve_ident(self, name: str) -> Column:
        v = self.env.read_var(name)
        return v if v is not None else F.col(name)

    def call_func(
        self,
        name: str,
        args: list,
        kwargs: dict | None = None,
        bang: bool = False,
        span: tuple | None = None,
    ) -> Column:
        """Static-evaluation layer over the stdlib table: functions of
        literal arguments fold at plan time, making their fallibility
        (parse_json of bad input) a plan-time error value — the same
        decision VRL's type checker makes at compile time.

        strict diagnostics here: E620 (`now!()` — can't abort an
        infallible function, cant_abort_infallible_function.vrl) and
        E630 (fallible argument — `to_int(5 / 4)`,
        function_argument_fallible.vrl). `fn!()` on a fallible call
        clears the fallibility bit (abort-on-error asserts success —
        the remap transform's drop_on_error machinery observes the
        error value)."""
        if self.strict:
            if bang and name in _HARD_INFALLIBLE:
                raise ValueError(
                    f"VRL program: can't abort infallible function "
                    f"{name}() — remove this abort-instruction [E620]"
                )
            for a in args:
                if _is_fallible(a):
                    raise ValueError(
                        f'VRL program: fallible argument to "{name}" — '
                        f"this expression can fail; handle the error "
                        f"before passing it in as an argument [E630]"
                    )
        if (
            name in ("parse_syslog", "parse_linux_authorization") and args
        ):
            # parse_linux_authorization.rs delegates to parse_syslog
            out = _vrl_parse_syslog(args[0], span)
        else:
            out = self._call_func_inner(name, args, kwargs)
        if _static_err(out) is None and name in _RESULT_KIND:
            # conversions/coercions have fixed result kinds
            # (each fn's TypeDef) — tagging keeps downstream
            # fallibility precise (to_string(to_int(floor(x))))
            out = _tag(out, _RESULT_KIND[name])
        if bang or not _fn_fallible(name, args):
            return _clear_fallible(out)
        return _mark_fallible(out)

    def _call_func_inner(
        self, name: str, args: list, kwargs: dict | None = None
    ) -> Column:
        import json as _json

        if name == "parse_common_log" and args:
            return _vrl_parse_common_log(args[0])
        if name == "parse_tokens" and args:
            # tokenizer.rs semantics — same machinery as the tokenizer
            # transform (quote/bracket aware, `-` → null)
            from vector_spark.operators.parsers import tokens_array

            return _tag(tokens_array(args[0].cast("string")), "array")
        a0 = _pyv(args[0]) if args else _MISSING
        if name == "parse_json" and isinstance(a0, str):
            try:
                return _render_static(_json.loads(a0))
            except ValueError:
                return _err_value(
                    'function call error for "parse_json": unable to parse '
                    "json"
                )
        if name in ("parse_key_value", "parse_logfmt") and isinstance(a0, str):
            # parse_logfmt.rs is parse_key_value with the default
            # separators (logfmt IS k=v space-separated)
            try:
                pairs = {}
                for part in a0.split():
                    kk, _, vv = part.partition("=")
                    if not _:
                        raise ValueError(part)
                    pairs[kk] = vv.strip('"')
                return _render_static(pairs)
            except ValueError:
                return _err_value(
                    'function call error for "parse_key_value": unable to '
                    "parse key/value input"
                )
        if name == "append" and len(args) == 2:
            av, bv = _static_val(args[0]), _static_val(args[1])
            if isinstance(av, list) and isinstance(bv, list):
                return _render_static(av + bv)
        if name == "to_string" and args and _stype(args[0]) in ("array", "object"):
            return _err_value(
                f"can't coerce \"{_stype(args[0])}\" into \"string\""
            )
        # per-function argument-kind checks (the VRL type checker's
        # compile-time argument errors; exact texts are unobservable —
        # every corpus use is ??-coalesced)
        if args:
            k0 = _stype(args[0])
            if self.strict and name == "redact" and len(args) >= 2:
                filters = _static_val(args[1])
                if isinstance(filters, list):
                    for flt in filters:
                        if isinstance(flt, dict) and flt.get("type") not in (
                            "us_social_security_number",
                            "pattern",
                        ):
                            # E610 (function_invalid_argument.vrl):
                            # redact filter objects accept only the
                            # types redact.rs's TryFrom<Value> lists
                            raise ValueError(
                                f"VRL program: invalid argument type for "
                                f'"redact" — unknown filter type '
                                f"{flt.get('type')!r} [E610]"
                            )
            if (
                self.strict
                and name in ("contains", "starts_with", "ends_with")
                and k0 not in (None, "string", "null")
            ):
                # E610 invalid argument type
                # (arithmetic/merge/type_defs_wrong.vrl:
                # contains(<integer>, "nork"))
                raise ValueError(
                    f'VRL program: invalid argument type for "{name}" — '
                    f'expected string, got {k0} [E610]'
                )
            if name in ("floor", "ceil", "abs", "round") and k0 in (
                "integer",
                "float",
            ):
                # numeric kind flows through (floor.rs TypeDef) so
                # to_int(floor(x)) stays infallible
                return _tag(super().call_func(name, args, kwargs), k0)
            if name in _STR_IN_STR_OUT and k0 == "string":
                # string→string stdlib fns: infallible on a known
                # string input, result kind carries forward
                out = _tag(super().call_func(name, args, kwargs), "string")
                out._vs_infallible = not _maybe_absent(args[0])
                return out
            if name == "slice":
                if k0 in ("integer", "float", "boolean", "timestamp", "null", "object"):
                    return _err_value(
                        f'function call error for "slice": expected array '
                        f'or string, got {k0}'
                    )
                if k0 == "array":
                    from vector_spark.conditions import _as_py_int

                    s = _as_py_int(args[1])
                    if len(args) > 2:
                        e = _as_py_int(args[2])
                        out = F.slice(args[0], s + 1, e - s)
                    else:
                        out = F.slice(
                            args[0], s + 1, F.greatest(F.size(args[0]) - s, F.lit(0))
                        )
                    out = _tag(out, "array")
                    out._vs_infallible = not _maybe_absent(args[0])
                    return out
                if k0 == "string":
                    out = _tag(super().call_func(name, args, kwargs), "string")
                    out._vs_infallible = not _maybe_absent(args[0])
                    return out
            if name in ("upcase", "downcase"):
                if k0 not in (None, "string", "null"):
                    return _err_value(
                        f'function call error for "{name}": expected string, '
                        f"got {k0}"
                    )
                if k0 == "string":
                    out = _tag(super().call_func(name, args, kwargs), "string")
                    out._vs_infallible = not _maybe_absent(args[0])
                    return out
            if name == "push":
                if k0 not in (None, "array", "null"):
                    return _err_value(
                        f'function call error for "push": expected array, '
                        f"got {k0}"
                    )
                if k0 == "array":
                    out = _tag(super().call_func(name, args, kwargs), "array")
                    out._vs_infallible = not _maybe_absent(args[0])
                    return out
        return super().call_func(name, args, kwargs)

    # --- expression extensions (corpus surface) -------------------------
    def _parse_del(self) -> Column:
        """`del(.a, .b)` — drops the fields, returns the first deleted
        value (del.rs). Valid in statement AND expression position
        (`.total_bytes = del(.size)`)."""
        self.next()  # 'del'
        self.next()  # '('
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
        return prior

    def parse_primary(self):
        k, v = self.peek()
        if (
            k == "ident"
            and v == "del"
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1] == ("op", "(")
        ):
            return self._parse_del()
        if k == "rstr":
            # r'…' regex / s'…' raw string / t'…' timestamp literal —
            # tagged with their VRL kind; match() unwraps the pattern
            # via _vs_pyval, the timestamp folds to a datetime literal
            self.next()
            body = v[2:-1].replace("\\'", "'")
            if v[0] == "t":
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(body.replace("Z", "+00:00"))
                # Spark timestamps are naive-in-session-tz (UTC here)
                lit = F.lit(dt.astimezone(timezone.utc).replace(tzinfo=None))
                lit._vs_pyval = body
                return _tag(lit, "timestamp")
            if v[0] == "r" and self.strict:
                try:
                    re.compile(body)
                except re.error as exc:
                    # E101 (invalid_regular_expression.vrl /
                    # regex_parsing_unsuccessful.vrl): `r'['`
                    raise ValueError(
                        f"VRL program: invalid regular expression "
                        f"{body!r}: {exc} [E101]"
                    ) from None
            lit = F.lit(body)
            lit._vs_pyval = body
            return _tag(lit, "regex" if v[0] == "r" else "string")
        elif (k, v) == ("op", "."):
            # bare `.` = the whole event. With a known schema
            # (compile_vrl_program(columns=...)) it resolves HERE to the
            # current event struct — usable anywhere in an expression;
            # without one it is the _EVENT sentinel, valid only as the
            # program's final value (resolved at apply time)
            self.next()
            if self.columns is not None:
                return self.read_event()
            return _EVENT
        elif (k, v) == ("op", "("):
            # in program mode a parenthesized group may contain full
            # STATEMENTS — VRL assignment is an expression
            # (`true || (.foo = true)`), and `;` sequences statements
            # (`(status, err = int(.status); err == null)`)
            self.next()
            col = self.parse_stmt()
            while self.peek()[1] == ";":
                self.next()
                if self.peek()[1] == ")":
                    break
                col = self.parse_stmt()
            self.expect(")")
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
            if (
                self.strict
                and self._adjacent()
                and (nk == "path" or (nk == "op" and nv == "["))
                and _stype(col)
                in ("boolean", "integer", "float", "string", "timestamp",
                    "regex", "null")
            ):
                # (`.`-group / quoted continuations stay exempt: a
                # null-kind base is a known-missing field whose
                # coalesced read is legal — query_ignore_parens_in_
                # quotes.vrl)
                # E203-class: field/index query on a scalar
                # (expressions/query/scalar.vrl: `true.foo`, `0[0]`…)
                raise ValueError(
                    f"VRL program: syntax error — can't query a "
                    f'"{_stype(col)}" value with a path [E203]'
                )
            if nk == "path" and self._adjacent():
                self.next()
                for part in _path_parts(nv[1:]):
                    col = (
                        _get_index(col, int(part[1:-1]))
                        if part.startswith("[")
                        else _get_field(col, part)
                    )
            elif (nk, nv) == ("op", "[") and self._adjacent():
                self.next()
                ik, iv = self.next()
                if ik != "num":
                    raise ValueError(
                        "VRL program: only literal indexes are supported"
                    )
                self.expect("]")
                col = _get_index(col, int(iv))
            elif (
                (nk, nv) == ("op", ".")
                and self._adjacent()
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1][1] == "("
            ):
                # path coalescing `.(a | b)` (lookup_buf path syntax):
                # first present field wins
                self.next()
                self.next()
                col = self._coalesced_field(col)
            elif (
                (nk, nv) == ("op", ".")
                and self._adjacent()
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1][0] == "str"
            ):
                # quoted path segment `."lorem ipsum"`
                from vector_spark.conditions import _unescape

                self.next()
                _, sv = self.next()
                col = _get_field(col, _unescape(sv))
            elif (
                nk == "num"
                and nv.startswith(".")
                and self._adjacent()
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1][0] == "ident"
            ):
                # numeric-leading path field `.0tar` (query/mixed.vrl):
                # tokenizes as num(".0") + ident("tar") — adjacent
                # pieces concatenate into one field name
                self.next()
                name = nv[1:]
                while (
                    self.peek()[0] in ("ident", "num") and self._adjacent()
                ):
                    name += self.next()[1]
                col = _get_field(col, name)
            elif (nk, nv) == ("op", ".") and self._adjacent() and self.strict:
                # dangling `.` after a query (`.foo.`) — E203
                # (syntax_error_path_segment.vrl): the reference parser
                # expects a field, "(" group, or string literal here
                raise ValueError(
                    "VRL program: syntax error — unexpected end of "
                    "query path [E203]"
                )
            else:
                break
        return col

    def _coalesced_field(self, col: Column) -> Column:
        """`.(a | 0bar | "c d")` after '(' is consumed: returns the
        first field present (plan-time objects) or a runtime coalesce.
        Segment names may span several tokens (`0bar` = num+ident) —
        adjacent tokens concatenate."""
        from vector_spark.conditions import _unescape

        names: list[str] = []
        cur = ""
        while self.peek()[1] != ")":
            if self.peek() == (None, None):
                raise ValueError("VRL program: unterminated path group")
            tk, tv = self.next()
            if (tk, tv) == ("op", "|"):
                names.append(cur)
                cur = ""
            else:
                cur += _unescape(tv) if tk == "str" else tv
        self.expect(")")
        names.append(cur)
        names = [n for n in names if n]
        if _stype(col) == "null":
            # base is a known-missing field: every alternative is null
            return _tag(F.lit(None), "null")
        fields = _obj_fields(col)
        if fields is not None:
            for n in names:
                if n in fields:
                    return fields[n]
            return _tag(F.lit(None), "null")
        flds = _dt_struct_fields(_col_tags(col).get("_vs_dtype"))
        if flds is not None:
            # schema-typed struct: only fields that EXIST in the dtype
            # participate (getField on an absent name is an analysis
            # error, not a null — ampersat.vrl's `.(@noog | @buz)`)
            present = [n for n in names if n in flds]
            if not present:
                return _tag(F.lit(None), "null")
            if len(present) == 1:
                return _with_dtype(col.getField(present[0]), flds[present[0]])
            return F.coalesce(*[col.getField(n) for n in present])
        return F.coalesce(*[col.getField(n) for n in names])

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
        col = _pack_items(items)
        vals = [_static_val(x) for x in items]
        if all(v is not _MISSING for v in vals):
            col._vs_pystat = vals
        return col

    def _brace_expr(self) -> Column:
        # '{' already consumed: object literal ({"k": v}), empty object,
        # or block expression ({ stmts })
        nk, nv = self.peek()
        if nv == "}":
            self.next()
            obj = _obj_struct({})
            obj._vs_pystat = {}
            return obj
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
            obj = _obj_struct(dict(pairs))
            vals = {k: _static_val(c) for k, c in pairs}
            if all(v is not _MISSING for v in vals.values()):
                obj._vs_pystat = vals
            return obj
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
            if self.strict and (
                _is_fallible(self.last_value)
                or _static_err(self.last_value) is not None
            ):
                # E100 unhandled error (unhandled_function_error.vrl,
                # unhandled_expression_error.vrl): a top-level
                # expression statement that can result in a runtime
                # error must be handled (`fn!()`, `??`, `ok, err =`)
                raise ValueError(
                    "VRL program: unhandled error — expression can "
                    "result in runtime error; handle the error case to "
                    "ensure runtime success [E100]"
                )
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
            return self._parse_del()
        # assignment lookahead (try-parse with backtracking). Targets:
        # `.path` / `var` / `var.path` / `var[0]` / `_` (discard) /
        # bare `.` (whole event, requires a known schema). Forms:
        #   target = expr            target |= expr
        #   ok, err = expr           ok, err |= expr   (fallible —
        #     assignment.rs Variant::Infallible: ok gets the value or
        #     the result-kind default, err gets the error string or null)
        saved = self.i
        t1 = self._try_target()
        if t1 is not None:
            nk, nv = self.peek()
            if nk == "op" and nv in ("=", "|="):
                self.next()
                return self._stmt_assign(t1, nv)
            if (nk, nv) == ("op", ","):
                self.next()
                t2 = self._try_target()
                if t2 is not None and self.peek()[1] in ("=", "|="):
                    _, op = self.next()
                    return self._stmt_assign(t1, op, err_target=t2)
            self.i = saved  # not an assignment — reparse as expression
        # expression statement (includes statement-level if/blocks via
        # parse_primary); its value is the program value if last
        return self.parse_coalesce()

    def _try_target(self):
        """Consume a potential assignment target and return (kind,
        name), or None without consuming. Compound variable targets
        (`err.bar.baz`, `lines[0]`) fold their adjacent path/index
        tokens into the name; quoted segments (`."lorem ipsum"`) and
        coalesced segments (`.(qux | "quux qux")` — resolved eagerly
        against the current env) encode as ``"quoted"`` parts
        (single_external_complex.vrl, single_variable_complex_path
        .vrl)."""
        k, v = self.peek()
        if (k, v) == ("op", "."):
            if (
                self.i + 1 < len(self.toks)
                and self.toks[self.i + 1][0] == "str"
                and self._spans_adjacent(self.i, self.i + 1)
            ):
                # `."quoted root" = …`
                self.next()
                _, sv = self.next()
                return ("path", "." + self._fold_target_tail(sv))
            self.next()
            return ("op", ".")
        if k == "path":
            self.next()
            return ("path", "." + self._fold_target_tail(v[1:]))
        if k == "ident":
            self.next()
            return ("ident", self._fold_target_tail(v, var=True))
        return None

    def _spans_adjacent(self, i: int, j: int) -> bool:
        return (
            0 <= i < len(self.spans)
            and j < len(self.spans)
            and self.spans[j][0] == self.spans[i][1]
        )

    def _fold_target_tail(self, name: str, var: bool = False) -> str:
        """Fold adjacent path continuations onto an assignment-target
        name: `.seg` path tokens, `[n]` indexes, `."quoted"` segments,
        and `.(a | b)` coalesce groups (picked eagerly: first
        alternative present in the current value, else the last —
        the reference's lookup insert semantics)."""
        kind = "ident" if var else "path"
        while True:
            nk, nv = self.peek()
            if nk == "path" and self._adjacent():
                self.next()
                name += nv
            elif (
                (nk, nv) == ("op", "[")
                and self._adjacent()
                and self.i + 2 < len(self.toks)
                and self.toks[self.i + 1][0] == "num"
                and self.toks[self.i + 2] == ("op", "]")
            ):
                self.next()
                _, num = self.next()
                self.next()
                name += f"[{num}]"
            elif (
                (nk, nv) == ("op", ".")
                and self._adjacent()
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1][0] == "str"
            ):
                self.next()
                _, sv = self.next()
                name += sv  # token keeps its quotes — _path_parts strips
            elif (
                (nk, nv) == ("op", ".")
                and self._adjacent()
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1] == ("op", "(")
            ):
                self.next()
                self.next()
                alts = self._consume_group_names()
                picked = self._pick_coalesce_alt(kind, name, alts)
                name += f'"{picked}"'
            else:
                break
        return name

    def _consume_group_names(self) -> list[str]:
        """Names of a `( a | b | "c d" )` path group after '(' is
        consumed — same token-concat rules as _coalesced_field."""
        from vector_spark.conditions import _unescape

        names: list[str] = []
        cur = ""
        while self.peek()[1] != ")":
            if self.peek() == (None, None):
                raise ValueError("VRL program: unterminated path group")
            tk, tv = self.next()
            if (tk, tv) == ("op", "|"):
                names.append(cur)
                cur = ""
            else:
                cur += _unescape(tv) if tk == "str" else tv
        self.expect(")")
        names.append(cur)
        return [n for n in names if n]

    def _pick_coalesce_alt(self, kind: str, name: str, alts: list[str]) -> str:
        """Assignment-side coalesce: write into the first alternative
        that already exists at this path; none → the last alternative
        (observable in single_external_complex.vrl: the fresh object
        gets "quux qux")."""
        try:
            cur = self._target_current((kind, name if kind == "ident" else name))
        except ValueError:
            cur = None
        if cur is not None:
            fields = _obj_fields(cur)
            if fields:
                for n in alts:
                    if n in fields:
                        return n
        return alts[-1]

    # --- assignment machinery -------------------------------------------
    def _target_current(self, t) -> Column | None:
        k, v = t
        if (k, v) == ("op", "."):
            if self.columns is None:
                raise ValueError(
                    "VRL program: whole-event assignment needs "
                    "compile_vrl_program(columns=...)"
                )
            return self.read_event()
        if k == "path":
            name = v[1:]
            root = re.match(r"[A-Za-z_@][A-Za-z0-9_@]*", name).group()
            if (
                self.columns is not None
                and root not in self.columns
                and root not in self.env.fields
            ):
                return None  # nonexistent event field → fresh object
            return self.resolve_path(name)
        if v == "_":
            return None
        parts = _path_parts(v)
        cur = self.env.read_var(parts[0])
        for p in parts[1:]:
            if cur is None:
                return None
            cur = (
                _get_index(cur, int(p[1:-1]))
                if p.startswith("[")
                else _get_field(cur, p)
            )
        return cur

    def _assign_one(self, t, value: Column) -> None:
        k, v = t
        if (k, v) == ("op", "."):
            # whole-event replacement: the value's fields become the
            # event; every physical column is superseded
            fields = _obj_fields(value)
            if fields is None:
                raise ValueError(
                    "VRL program: `. = expr` needs an object with "
                    "plan-time-known fields"
                )
            for c in self.columns or []:
                self.env.dropped.add(c)
            self.env.fields = dict(fields)
            for name in fields:
                self.env.dropped.discard(name)
            return
        if k == "path":
            name = v[1:]
            parts = _path_parts(name)
            root = parts[0]
            if len(parts) == 1:
                self.env.fields[root] = value
            else:
                root_missing = (
                    self.columns is not None
                    and root not in self.columns
                    and root not in self.env.fields
                ) or root in self.env.dropped
                cur = None if root_missing else self.env.read_path(root)
                self.env.fields[root] = _with_path(cur, parts[1:], value)
            self.env.dropped.discard(root)
            return
        if v == "_":
            return
        name = v
        parts = _path_parts(name)
        if len(parts) == 1:
            self.env.vars[name] = value
        else:
            self.env.vars[parts[0]] = _with_path(
                self.env.read_var(parts[0]), parts[1:], value
            )

    def _stmt_assign(self, t1, op: str, err_target=None) -> Column:
        if self.strict:
            for t in (t1, err_target):
                if (
                    t is not None
                    and t[0] == "ident"
                    and t[1] in _RESERVED_IDENTS
                ):
                    # E205 (reserved_keyword.vrl): `array = []`
                    raise ValueError(
                        f"VRL program: reserved keyword — the identifier "
                        f"name {t[1]!r} is reserved for future use in the "
                        f"language [E205]"
                    )
        expr = self.parse_coalesce()
        rhs_fallible = _is_fallible(expr)
        if op == "|=":
            cur = self._target_current(t1)
            if cur is None:
                raise ValueError(
                    "VRL program: |= target must exist before merging"
                )
            if self.strict:
                for side in (cur, expr):
                    sk = _stype(side)
                    if sk not in (None, "object") and _obj_fields(side) is None:
                        # E652 (merge_assignment_wrong_type.vrl):
                        # `x = "oh no"; x |= 32`
                        raise ValueError(
                            f"VRL program: only objects can be merged — "
                            f'this expression resolves to "{sk}" [E652]'
                        )
            # the merged Column is fresh — re-carry the rhs's
            # fallibility so `ok, err |=` / E103 see through the merge
            expr = _merge_cols(cur, expr)
            if rhs_fallible:
                expr = _mark_fallible(expr)
        if self.strict and err_target is None and _is_fallible(expr):
            # E103 unhandled fallible assignment: `.a = parse_json(.m)`
            # without `!`, `??`, or an error target
            raise ValueError(
                "VRL program: unhandled fallible assignment — this "
                "expression is fallible; use `ok, err = ...` or handle "
                "the error [E103]"
            )
        if (
            self.strict
            and err_target is not None
            and not _is_fallible(expr)
            and _static_err(expr) is None
            and (
                _pyv(expr) is not _MISSING
                or _col_tags(expr).get("_vs_infallible")
            )
        ):
            # E104 unnecessary error assignment: `ok, err = 5`. Gated
            # on PLAN-TIME literals only: this engine's schema-typed
            # event paths know kinds the reference compiler (external
            # paths = `any`) does not, and `ok, err = int(.status)` on
            # a typed column must stay legal
            # (internal/ok_assignment_default_value.vrl)
            raise ValueError(
                "VRL program: unnecessary error assignment — the "
                "expression can't fail [E104]"
            )
        expr = _clear_fallible(expr)
        e = _static_err(expr)
        if err_target is not None:
            if e is not None:
                default = _col_tags(expr).get("_vs_okdefault")
                if op != "|=":
                    self._assign_one(t1, _lit_static(default))
                # |= with error: target keeps its current value
                err_val = _lit_static(e)
                self._assign_one(err_target, err_val)
                return err_val
            self._assign_one(t1, expr)
            self._assign_one(err_target, _lit_static(None))
            return expr
        self._assign_one(t1, expr)
        return expr

    def _block_value(self) -> Column:
        self.expect("{")
        val = F.lit(None)
        while self.peek()[1] != "}":
            if self.peek() == (None, None):
                raise ValueError("VRL program: unterminated block")
            if self.strict and _is_fallible(val):
                # E100 on a NON-final block statement; the final
                # statement's fallibility propagates as the block value
                raise ValueError(
                    "VRL program: unhandled error in block — expression "
                    "can result in runtime error [E100]"
                )
            val = self.parse_stmt()
        self.expect("}")
        return val

    def _if_chain(self) -> Column:
        """`if cond {…} else if … else {…}` — used in BOTH statement and
        expression position (if_statement.rs is an expression in VRL).
        Executes each branch against a copy of the environment, merges
        with when/otherwise, and returns the chain's value."""
        raw_cond = self.parse_coalesce()
        if self.strict:
            ck = _stype(raw_cond)
            cp = _pyv(raw_cond)
            if (
                ck is not None
                and ck != "boolean"
                and not isinstance(cp, bool)
            ):
                # E102 (invalid_if_condition_type.vrl): `if "nope" {}`
                raise ValueError(
                    f"VRL program: if-statement predicate must resolve "
                    f'to a boolean, got "{ck}" [E102]'
                )
        cond = F.coalesce(raw_cond, F.lit(False))
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


def compile_vrl_program(
    source: str,
    columns: list[str] | None = None,
    schema: dict | None = None,
) -> VrlProgram:
    """Compile VRL program *source* to its net schema effect.

    ``columns`` (the frame's physical column names, when known at
    compile time) lets bare `.` resolve to the live event struct
    anywhere in an expression, and enables whole-event assignment
    (`. = {...}`, `. |= obj`). ``schema`` (name → Spark dtype string,
    e.g. ``{f.name: f.dataType.simpleString() for f in df.schema}``)
    additionally gives event paths STATIC VRL KINDS, so type-invalid
    operations on real columns compile to VRL error values (the
    type-checking the reference does at compile time). Without either,
    `.` is only valid as the program's final value and paths are
    untyped."""
    if schema is not None and columns is None:
        columns = list(schema)
    p = _ProgramParser(source, columns=columns, schema=schema)
    env = p.run()
    is_event = isinstance(p.last_value, _EventRef)
    return VrlProgram(
        assignments=dict(env.fields),
        dropped=sorted(env.dropped),
        abort=env.abort if env.has_abort else None,
        result=None if is_event else p.last_value,
        result_is_event=is_event,
    )
