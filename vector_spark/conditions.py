"""Condition compiler: Vector's predicate surfaces → Spark ``Column``.

Reference surfaces (SURVEY.md §2.2):

- ``check_fields`` DSL — src/conditions/check_fields.rs:442-458:
  ``"<field>.<predicate>" = arg`` pairs; predicates
  ``eq/equals, neq/not_equals, contains, prefix, starts_with,
  ends_with, exists, regex, ip_cidr_contains, length_eq`` and
  ``not_*`` negations. Multi-value arg = OR across values; multiple
  keys = AND across keys.
- VRL boolean expressions (src/conditions/vrl.rs:40-95) — here a
  compiled subset ("VRL-lite"): field paths (``.a.b``), literals,
  comparison ops, ``&& || !``, parentheses, and predicate functions
  ``contains/starts_with/ends_with/match/exists/length/is_null``.

Everything compiles to a boolean ``Column`` so Catalyst can push the
predicate into the parquet scan — Vector evaluates these per event in
an interpreter; we get whole-stage codegen for free.
"""

from __future__ import annotations

import ipaddress
import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------


def ip_aton(col: Column) -> Column:
    """Dotted-quad IPv4 string → uint32-as-long, JVM-side (no UDF)."""
    parts = F.split(col, r"\.")
    return (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )


def ip_cidr_contains(col: Column, cidr: str) -> Column:
    """IPv4 CIDR membership as pure bit arithmetic (check_fields
    ``ip_cidr_contains``; VRL ``ip_cidr_contains`` —
    lib/vrl/stdlib/src/ip_cidr_contains.rs)."""
    net = ipaddress.ip_network(cidr, strict=False)
    lo = int(net.network_address)
    hi = int(net.broadcast_address)
    a = ip_aton(col)
    return (a >= F.lit(lo)) & (a <= F.lit(hi))


def _field(name: str) -> Column:
    return F.col(name)


# --------------------------------------------------------------------------
# check_fields DSL
# --------------------------------------------------------------------------

_CF_PREDICATES = {
    "eq",
    "equals",
    "neq",
    "not_equals",
    "contains",
    "prefix",
    "starts_with",
    "ends_with",
    "exists",
    "regex",
    "ip_cidr_contains",
    "length_eq",
}


def _cf_one(field: str, pred: str, arg: Any) -> Column:
    col = _field(field)
    if pred in ("eq", "equals"):
        return col == F.lit(arg)
    if pred in ("neq", "not_equals"):
        return col != F.lit(arg)
    if pred == "contains":
        return col.contains(arg)
    if pred in ("prefix", "starts_with"):
        return col.startswith(arg)
    if pred == "ends_with":
        return col.endswith(arg)
    if pred == "exists":
        exists = col.isNotNull()
        return exists if arg else ~exists
    if pred == "regex":
        return col.rlike(arg)
    if pred == "ip_cidr_contains":
        return ip_cidr_contains(col, arg)
    if pred == "length_eq":
        return F.length(col.cast("string")) == F.lit(int(arg))
    raise ValueError(f"unknown check_fields predicate: {pred}")


def compile_check_fields(spec: dict[str, Any]) -> Column:
    """``{"<field>.<pred>": arg, ...}`` → AND of per-key predicates,
    each key OR-ing over list-valued args (check_fields.rs semantics).
    ``not_<pred>`` negates. ``exists`` takes a bool arg."""
    conjuncts: list[Column] = []
    for key, arg in spec.items():
        field, _, pred = key.rpartition(".")
        negate = False
        if pred.startswith("not_") and pred not in _CF_PREDICATES:
            negate, pred = True, pred[4:]
        if pred not in _CF_PREDICATES:
            raise ValueError(f"unknown predicate in key {key!r}")
        args = arg if isinstance(arg, (list, tuple)) else [arg]
        disjunct = None
        for a in args:
            c = _cf_one(field, pred, a)
            disjunct = c if disjunct is None else (disjunct | c)
        if negate:
            # check_fields.rs: a missing/null field makes the inner
            # predicate FALSE, so its negation is TRUE (the event is
            # kept). Spark's three-valued logic would give NULL → the
            # filter coalesces to false and drops the event — coalesce
            # the inner predicate to false BEFORE negating to match.
            disjunct = ~F.coalesce(disjunct, F.lit(False))
        conjuncts.append(disjunct)
    out = None
    for c in conjuncts:
        out = c if out is None else (out & c)
    if out is None:
        raise ValueError("empty check_fields spec")
    return out


# --------------------------------------------------------------------------
# VRL-lite expression parser
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<path>\.[A-Za-z_][A-Za-z0-9_.\[\]]*)
  | (?P<op>&&|\|\||\?\?|==|!=|<=|>=|<|>|!|\(|\)|,|\+|-|\*|/|%)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

# VRL stdlib subset (lib/vrl/stdlib/src/, 113 fns — SURVEY.md §2.3);
# each maps to a JVM-side builtin so remap programs stay codegen'd.
_FUNCS = {
    "contains": lambda a, b: a.contains(b),
    "starts_with": lambda a, b: a.startswith(b),
    "ends_with": lambda a, b: a.endswith(b),
    "match": lambda a, b: a.rlike(_as_py_val(b)),
    "exists": lambda a: a.isNotNull(),
    "is_null": lambda a: a.isNull(),
    "is_nullish": lambda a: a.isNull() | (a.cast("string") == "") | (a.cast("string") == "-"),
    "length": lambda a: F.length(a),
    # reference order is (cidr, value) (ip_cidr_contains.rs); the
    # historical engine order (value, cidr) is also accepted — the
    # literal CIDR side is unambiguous
    "ip_cidr_contains": lambda a, b: (
        ip_cidr_contains(b, _as_py_val(a))
        if isinstance(getattr(a, "_vs_pyval", None), str)
        and "/" in a._vs_pyval
        else ip_cidr_contains(a, _as_py_val(b))
    ),
    "upcase": lambda a: F.upper(a),
    "downcase": lambda a: F.lower(a),
    "abs": lambda a: F.abs(a),
    "ceil": lambda a: F.ceil(a),
    "floor": lambda a: F.floor(a),
    "round": lambda a, *n: F.round(a, *[_as_py_int(x) for x in n]),
    "truncate": lambda a, n: F.substring(a, 1, _as_py_int(n)),
    # slice(value, start, [end]) — end optional (slice.rs); string
    # path here, the array path dispatches on static kind in the
    # program compiler's call_func
    "slice": lambda a, s, *e: F.substring(
        a,
        _as_py_int(s) + 1,
        (_as_py_int(e[0]) - _as_py_int(s)) if e else (1 << 30),
    ),
    "replace": lambda a, p, r: F.regexp_replace(a, p, r),
    "strip_whitespace": lambda a: F.trim(a),
    "strip_ansi_escape_codes": lambda a: F.regexp_replace(
        # \r included: strip-ansi-escapes' vte parser eats carriage
        # returns (see operators/shapers.py _ANSI_RE)
        a, r"\x1b\[[0-9;]*[A-Za-z]|\x1b\][^\x07]*\x07|\x1b[@-Z\\-_]|\r", ""
    ),
    "split": lambda a, sep: F.split(a, _as_py_val(sep)),
    "join": lambda a, sep: F.array_join(a, _as_py_val(sep)),
    "to_string": lambda a: a.cast("string"),
    "to_int": lambda a: a.cast("double").cast("long"),
    "to_float": lambda a: a.cast("double"),
    "to_bool": lambda a: a.cast("boolean"),
    # to_timestamp.rs → Conversion::Timestamp: tries RFC3339/ISO first,
    # then the common-log and RFC2822-ish layouts Vector's conversion
    # table accepts (conversion.rs parse_timestamp formats)
    "to_timestamp": lambda a: F.coalesce(
        F.try_to_timestamp(a.cast("string")),
        F.try_to_timestamp(a.cast("string"), F.lit("dd/MMM/yyyy:HH:mm:ss Z")),
        F.try_to_timestamp(a.cast("string"), F.lit("dd/MMM/yyyy:HH:mm:ss")),
        F.try_to_timestamp(a.cast("string"), F.lit("MMM d HH:mm:ss yyyy")),
        # ANSI-C ctime ("Sun Jun  6 12:00:00 2021"): Spark ≥3 refuses
        # day-name (EEE) fields in PARSE patterns — strip the weekday
        # prefix and squeeze padding instead
        F.try_to_timestamp(
            F.regexp_replace(
                F.regexp_replace(a.cast("string"), r"^[A-Za-z]{3},?\s+", ""),
                r"\s+",
                " ",
            ),
            F.lit("MMM d HH:mm:ss yyyy"),
        ),
    ),
    # parse_timestamp.rs: explicit strftime format; try_to_timestamp →
    # malformed input is a per-event error (null), not a job abort
    "parse_timestamp": lambda a, fmt: F.try_to_timestamp(
        a.cast("string"), F.lit(_strftime(_as_py_val(fmt)))
    ),
    "to_unix_timestamp": lambda a: F.unix_timestamp(a),
    "format_timestamp": lambda a, fmt: F.date_format(a, _as_py_val(fmt)),
    "now": lambda: F.current_timestamp(),
    "md5": lambda a: F.md5(a.cast("string")),
    "sha1": lambda a: F.sha1(a.cast("string")),
    # variant accepts the VRL spelling ("SHA-224") or a bit count
    "sha2": lambda a, *bits: F.sha2(a.cast("string"), _sha2_bits(bits[0]) if bits else 256),
    "uuid_v4": lambda: F.expr("uuid()"),
    "encode_base64": lambda a: F.base64(a.cast("binary")),
    "decode_base64": lambda a: F.unbase64(a).cast("string"),
    "encode_json": lambda a: F.to_json(a),
    "flatten": lambda a: F.flatten(a),
    # merge.rs — shallow object merge (see _merge_cols); the
    # `a | b` operator compiles through the same helper
    "merge": lambda a, b: _merge_cols(a, b),
    # object!/array! type guards: on a typed schema the kind is
    # schema-static, so the guard is an identity (mismatch surfaces
    # at Catalyst analysis instead of per-event)
    "object": lambda a: a,
    "array": lambda a: a,
    "compact": lambda a: F.array_compact(a),
    "includes": lambda a, v: F.array_contains(a, v),
    "append": lambda a, b: F.concat(a, b),
    "push": lambda a, v: F.array_append(a, v),
    # merge of two MAP columns; struct/object merge routes through
    # _merge_cols (the "merge" entry above — last-wins would otherwise
    # shadow it, so dispatch on the static tags here)
    "merge_maps": lambda a, b: F.map_concat(a, b),
    "format_number": lambda a, d: F.format_number(a, _as_py_int(d)),
    "parse_int": lambda a, *base: F.conv(a, _as_py_int(base[0]) if base else 10, 10).cast(
        "long"
    ),
    "get": lambda a, k: F.element_at(a, k),
    # to_regex.rs: string → regex. VRL compiles the regex at each call
    # (and warns it is expensive); here the pattern must be a plan-time
    # literal and is compiled/validated ONCE at VRL-compile time — a
    # per-row dynamic pattern would turn one bad value into a job
    # abort inside Spark's regexp functions, violating the engine's
    # no-abort invariant, so non-literal args are a compile error.
    "to_regex": lambda a: _to_regex(a),
    "parse_regex": lambda a, p, *ng: _parse_regex(a, p, ng[0] if ng else None),
    "coalesce": lambda *a: F.coalesce(*a),
    "if_else": lambda c, t, f: F.when(c, t).otherwise(f),
    # type-coercion guards (lib/vrl/stdlib: String/Integer/Float/
    # Boolean/Timestamp/Array/Object): in VRL these assert the runtime
    # type; on a typed schema they are casts (try_*: mismatch = a
    # per-event error value, i.e. null)
    "string": lambda a: a.cast("string"),
    # long-preserving first (a double hop would corrupt ints > 2^53),
    # then the float-truncation path for "2.5"-style strings
    "int": lambda a: F.coalesce(
        a.try_cast("long"), a.try_cast("double").try_cast("long")
    ),
    "float": lambda a: a.try_cast("double"),
    "bool": lambda a: a.try_cast("boolean"),
    "timestamp": lambda a: a,
    "array": lambda a: a,
    "object": lambda a: a,
    # assert/assert_eq (assert.rs): the condition value itself; pair
    # with error_when/drop_on_error for the abort behavior
    "assert": lambda c, *msg: c,
    "assert_eq": lambda a, b, *msg: a == b,
    # log (log.rs): side-effect in the reference; pass-through here
    "log": lambda a, *rest: a,
    # parse_json.rs: a PLAN-TIME literal argument becomes a typed
    # literal tree (runtime JSON needs a schema — use from_json via
    # the json_parser operator for that path)
    "parse_json": lambda a: _parse_json_literal(a),
    # redact.rs regex mode — typed scrubbing is dataops.curation.pii_scrub
    "redact": lambda a, pat, *repl: _redact(a, pat, *repl),
    "sha3": lambda a, *variant: _sha3(a, *variant),
    "parse_regex_all": lambda a, p, *ng: _parse_regex_all(
        a, p, ng[0] if ng else None
    ),
    "parse_grok": lambda a, p: _parse_grok(a, p),
}

# spelled-out coercion aliases (boolean.rs / integer.rs are the same
# implementations as bool.rs / int.rs in the reference stdlib)
_FUNCS["boolean"] = _FUNCS["bool"]
_FUNCS["integer"] = _FUNCS["int"]


def _json_literal(v) -> Column:
    """Python JSON value → Column literal tree. Heterogeneous lists
    become positional structs (_0.._n) — the same convention as VRL
    program array literals (functions/vrl_program.py)."""
    if isinstance(v, dict):
        if not v:
            return F.create_map()
        return F.struct(*[_json_literal(x).alias(k) for k, x in v.items()])
    if isinstance(v, list):
        if not v:
            return F.array().cast("array<string>")
        types = {type(x) for x in v if x is not None}
        if len(types) <= 1 or types <= {int, float}:
            return F.array(*[_json_literal(x) for x in v])
        return F.struct(
            *[_json_literal(x).alias(f"_{i}") for i, x in enumerate(v)]
        )
    c = F.lit(v)
    if isinstance(v, (str, int, float, bool)):
        c._vs_pyval = v
    return c


def _strftime(fmt: str) -> str:
    from vector_spark.conversion import strftime_to_spark

    return strftime_to_spark(fmt)


def _parse_regex(value, pattern, numeric_groups=None) -> Column:
    """parse_regex / parse_regex_all's single-match form
    (lib/vrl/stdlib/src/parse_regex.rs): named captures → object;
    ``numeric_groups: true`` adds "0".."n" positional keys. The
    pattern must be a plan-time literal (same stance as to_regex) —
    group names/arity decide the struct schema, so a per-row pattern
    cannot produce a fixed shape. One Java regex, one regexp_extract
    per emitted group."""
    pat = _as_py_val(pattern)
    if not isinstance(pat, str):
        raise ValueError(
            f"parse_regex: expected a regex or string literal pattern, got {pat!r}"
        )
    try:
        cre = re.compile(pat)
    except re.error as exc:
        raise ValueError(f"parse_regex: invalid regex {pat!r}: {exc}") from exc
    # numbered groups — Java group names reject underscores, and the
    # group INDEX (from Python's compiler) is what we extract by anyway
    jpat = re.sub(r"\(\?P<[^>]+>", "(", pat)
    want_numeric = False
    if numeric_groups is not None:
        nv = _pyv(numeric_groups)
        want_numeric = bool(nv) if nv is not _MISSING else False
    fields: dict = {}
    if want_numeric:
        for i in range(cre.groups + 1):
            fields[str(i)] = _tag(F.regexp_extract(value, jpat, i), "string")
    for gname, gidx in cre.groupindex.items():
        fields[gname] = _tag(F.regexp_extract(value, jpat, gidx), "string")
    if not fields:
        fields["0"] = _tag(F.regexp_extract(value, jpat, 0), "string")
    return _obj_struct(fields)


def _parse_regex_all(value, pattern, numeric_groups=None) -> Column:
    """parse_regex_all.rs: every match → array of objects. Same
    plan-time-literal-pattern stance as parse_regex; one
    regexp_extract_all per emitted group, arrays_zip packs them into
    array<struct> (field names = group names)."""
    pat = _as_py_val(pattern)
    if not isinstance(pat, str):
        raise ValueError(
            f"parse_regex_all: expected a regex or string literal pattern, "
            f"got {pat!r}"
        )
    try:
        cre = re.compile(pat)
    except re.error as exc:
        raise ValueError(
            f"parse_regex_all: invalid regex {pat!r}: {exc}"
        ) from exc
    jpat = re.sub(r"\(\?P<[^>]+>", "(", pat)  # numbered groups (see parse_regex)
    want_numeric = False
    if numeric_groups is not None:
        nv = _pyv(numeric_groups)
        want_numeric = bool(nv) if nv is not _MISSING else False
    arrays: list[Column] = []
    if want_numeric:
        for i in range(cre.groups + 1):
            arrays.append(
                F.regexp_extract_all(value, F.lit(jpat), F.lit(i)).alias(str(i))
            )
    for gname, gidx in cre.groupindex.items():
        arrays.append(
            F.regexp_extract_all(value, F.lit(jpat), F.lit(gidx)).alias(gname)
        )
    if not arrays:
        arrays.append(
            F.regexp_extract_all(value, F.lit(jpat), F.lit(0)).alias("0")
        )
    return _tag(F.arrays_zip(*arrays), "array")


def _is_kind(a, target: str) -> Column:
    """is_string/is_integer/… (lib/vrl/stdlib/src/is_*.rs): value-kind
    predicate. Known plan-time kinds fold to a null-guarded boolean;
    unknown kinds dispatch on F.typeof (a Catalyst-constant dtype
    probe, not per-row reflection). A null VALUE is no kind (VRL:
    is_string(null) == false)."""
    k0 = _stype(a)
    if k0 == "null":
        return _lit_static(False)
    if k0 is not None:
        if k0 != target:
            return _lit_static(False)
        p0 = _pyv(a)
        if p0 is not _MISSING:
            return _lit_static(p0 is not None)
        return a.isNotNull()
    if target == "regex":
        # regex values exist only as plan-time literals here
        return _lit_static(False)
    t = F.typeof(a)
    if target == "integer":
        m = t.isin("int", "bigint", "smallint", "tinyint")
    elif target == "float":
        m = t.isin("double", "float") | t.startswith("decimal")
    elif target == "array":
        m = t.startswith("array")
    elif target == "object":
        m = t.startswith("struct") | t.startswith("map")
    else:  # string / boolean / timestamp
        m = t == F.lit(target)
    return F.when(a.isNull(), F.lit(False)).otherwise(m)


def _vrl_parse_glog(a) -> Column:
    """parse_glog.rs / parse_klog.rs — column form returning a
    known-fields object (glog wire format, _GLOG_RE groups)."""
    from vector_spark.functions.logformats import _GLOG_RE

    a = a.cast("string")
    # numbered groups: Java group names reject underscores
    # (thread_id, message_text)
    jre = re.sub(r"\(\?P<[^>]+>", "(", _GLOG_RE)

    def g(i: int) -> Column:
        v = F.regexp_extract(a, jre, i)
        return F.when(v == "", F.lit(None)).otherwise(v)

    level_map = F.create_map(
        F.lit("I"), F.lit("info"), F.lit("W"), F.lit("warning"),
        F.lit("E"), F.lit("error"), F.lit("F"), F.lit("fatal"),
    )
    fields = {
        "level": _tag(F.element_at(level_map, g(1)), "string"),
        "timestamp": _tag(
            F.try_to_timestamp(
                F.concat(
                    F.date_format(F.current_date(), "yyyy"), g(2), F.lit(" "), g(3)
                ),
                F.lit("yyyyMMdd HH:mm:ss.SSSSSS"),
            ),
            "timestamp",
        ),
        "id": _tag(g(4).cast("long"), "integer"),
        "file": _tag(g(5), "string"),
        "line": _tag(g(6).cast("long"), "integer"),
        "message": _tag(g(7), "string"),
    }
    return _obj_struct(fields)


def _parse_grok(value, pattern) -> Column:
    """parse_grok.rs: grok pattern (plan-time literal) → object via the
    shared grok→regex translation (operators/grok.py registry)."""
    from vector_spark.operators.grok import grok_to_regex

    pat = _as_py_val(pattern)
    if not isinstance(pat, str):
        raise ValueError(
            f"parse_grok: expected a grok pattern literal, got {pat!r}"
        )
    return _parse_regex(value, _lit_static(grok_to_regex(pat)))


def _parse_kv_runtime(a) -> Column:
    """Expression-level parse_key_value / parse_logfmt on a runtime
    column: space-separated k=v pairs → map, surrounding quotes
    stripped. Values containing quoted spaces need the quote-aware
    DataFrame operator (operators/parsers.key_value_parser) — the bulk
    path; this is the per-field remap form. Literal inputs fold
    statically in program mode instead."""
    m = F.str_to_map(a.cast("string"), F.lit(" "), F.lit("="))
    return _tag(
        F.transform_values(
            m, lambda k, v: F.regexp_replace(v, '^"|"$', "")
        ),
        "object",
    )


# late registrations: these helpers are defined below the _FUNCS dict
_FUNCS["parse_key_value"] = _parse_kv_runtime
_FUNCS["parse_logfmt"] = _parse_kv_runtime
# is_* value-kind predicates (is_string.rs … is_timestamp.rs)
for _k in (
    "string", "integer", "float", "boolean", "array", "object", "regex",
    "timestamp",
):
    _FUNCS[f"is_{_k}"] = (lambda t: lambda a: _is_kind(a, t))(_k)
# glog/klog share one wire format (parse_klog.rs delegates)
_FUNCS["parse_glog"] = _vrl_parse_glog
_FUNCS["parse_klog"] = _vrl_parse_glog


def _to_regex(a) -> Column:
    """Compile-time-validated regex literal (see _FUNCS['to_regex'])."""
    pat = _as_py_val(a)
    if not isinstance(pat, str):
        raise ValueError(f"to_regex: expected a string literal, got {pat!r}")
    try:
        re.compile(pat)
    except re.error as exc:
        raise ValueError(f"to_regex: invalid regex {pat!r}: {exc}") from exc
    col = F.lit(pat)
    col._vs_pyval = pat  # downstream match()/split() unwrap the literal
    return col


def _is_strish(c) -> bool:
    """Plan-time 'this is a string' tag: a string literal, or a value
    derived from one by concat. Column.__getattr__ fabricates nested-
    field Columns for unknown attributes, so only the instance dict is
    consulted."""
    d = getattr(c, "__dict__", None) or {}
    return (
        isinstance(d.get("_vs_pyval"), str)
        or bool(d.get("_vs_isstr"))
        or d.get("_vs_stype") == "string"
    )


# ---------------------------------------------------------------------------
# Static (plan-time) VRL type/error model
#
# VRL type-checks programs at compile time and represents operation
# failures as first-class ERROR VALUES (lib/vrl/compiler/src/value/
# arithmetic.rs + error.rs). Spark Columns carry no VRL types, but
# literals do: the parser tags every literal with its Python value
# (``_vs_pyval``) and/or VRL kind (``_vs_stype``), propagates kinds
# through operators, and computes the reference's exact error strings
# when an operation between known kinds is invalid. An error value
# compiles to a NULL literal tagged ``_vs_error`` — `??`, `ok, err =`
# and the logical operators give it VRL semantics. Unknown-kind
# operands (real columns) keep the existing checked-arithmetic
# behavior (try_* → null), the documented fixed-schema stance.
# ---------------------------------------------------------------------------

_MISSING = object()
_NUMERIC = {"integer", "float"}


def _col_tags(c) -> dict:
    return getattr(c, "__dict__", None) or {}


def _stype(c) -> str | None:
    """Static VRL kind of an expression, or None when unknown."""
    d = _col_tags(c)
    if "_vs_stype" in d:
        return d["_vs_stype"]
    v = d.get("_vs_pyval", _MISSING)
    if v is not _MISSING:
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "integer"
        if isinstance(v, float):
            return "float"
        if isinstance(v, str):
            return "string"
    if d.get("_vs_isstr"):
        return "string"
    return None


def _pyv(c):
    """Static Python value, or _MISSING. A known-null is None."""
    d = _col_tags(c)
    if d.get("_vs_stype") == "null" and "_vs_error" not in d:
        return None
    return d.get("_vs_pyval", _MISSING)


def _static_err(c) -> str | None:
    return _col_tags(c).get("_vs_error")


def _err_value(msg: str, ok_default=None) -> Column:
    c = F.lit(None)
    c._vs_error = msg
    if ok_default is not None:
        c._vs_okdefault = ok_default
    return c


def _tag(c: Column, stype=None, pyval=_MISSING) -> Column:
    if stype is not None:
        c._vs_stype = stype
    if pyval is not _MISSING:
        c._vs_pyval = pyval
    return c


def _lit_static(v) -> Column:
    """Literal Column from a Python value, fully tagged."""
    if v is None:
        return _tag(F.lit(None), "null")
    c = F.lit(v)
    c._vs_pyval = v
    return c


def _is_fallible(c) -> bool:
    """Static fallibility bit (the reference compiler's Fallible type
    state, lib/vrl/compiler/src/type_def.rs): set on expressions that
    can produce a runtime error — parse_*/coercions on unknown kinds,
    division — and cleared by the handlers (`fn!()`, `??`,
    `ok, err =`)."""
    return bool(_col_tags(c).get("_vs_fallible"))


def _mark_fallible(c: Column) -> Column:
    c._vs_fallible = True
    return c


def _clear_fallible(c: Column) -> Column:
    _col_tags(c).pop("_vs_fallible", None)
    return c


def _prop_fallible(out: Column, *ops) -> Column:
    """Binary/unary ops inherit operand fallibility (op.rs type_def)."""
    if any(o is not None and _is_fallible(o) for o in ops):
        out._vs_fallible = True
    return out


def _obj_fields(c) -> dict | None:
    """Field→Column map of a plan-time object (struct literal, parsed
    static JSON, merged object), or None."""
    return _col_tags(c).get("_vs_obj")


def _obj_struct(fields: dict) -> Column:
    """Tagged object struct from a field→Column map."""
    if not fields:
        c = F.create_map()
        c._vs_obj = {}
        return _tag(c, "object")
    st = F.struct(*[col.alias(k) for k, col in fields.items()])
    st._vs_obj = dict(fields)
    return _tag(st, "object")


def _merge_cols(left: Column, right: Column) -> Column:
    """VRL object merge `|` (value/arithmetic.rs try_merge): shallow,
    right wins. Both objects plan-time → merged struct literal; a
    runtime struct column on the left merges a plan-time object via
    withField (no shuffle, stays in codegen)."""
    if _static_err(left) is not None:
        return left
    if _static_err(right) is not None:
        return right
    lt, rt = _stype(left), _stype(right)
    lf, rf = _obj_fields(left), _obj_fields(right)
    if rt is not None and rt != "object":
        return _err_value(
            f"can't merge type \"{rt}\" into \"{lt or 'object'}\""
        )
    if lt is not None and lt != "object":
        return _err_value(f"can't merge type \"{rt}\" into \"{lt}\"")
    if lf is not None and rf is not None:
        merged = dict(lf)
        merged.update(rf)
        return _obj_struct(merged)
    if rf is not None:
        # runtime struct ⊕ known fields → withField chain
        out = left
        for k, col in rf.items():
            out = out.withField(k, col)
        return _tag(out, "object")
    # neither side's fields known at plan time: the only legal runtime
    # shape is two MAP columns (parsed kv/tags) → map_concat
    return F.map_concat(left, right)


def _fold_int_ok(v) -> bool:
    """A folded integer must fit i64 (VRL ints are i64; a wider fold
    would also be unrepresentable as a Spark literal). Out-of-range →
    caller falls back to try_* runtime arithmetic, which nulls —
    the engine's overflow-is-error-value contract."""
    return not isinstance(v, int) or isinstance(v, bool) or -(2**63) <= v < 2**63


def _as_py_val(col_or_val):
    """Literal argument (string/number) for PySpark APIs that do not
    accept a Column (rlike, array_join separator, date_format pattern).
    The parser tags literal Columns with ``_vs_pyval``."""
    if isinstance(col_or_val, (str, int, float)):
        return col_or_val
    v = getattr(col_or_val, "_vs_pyval", None)
    if v is None:
        raise ValueError("expected a literal (non-column) argument")
    return v


def _parse_json_literal(a):
    """parse_json of a LITERAL argument; a runtime column has no
    plan-time-expressible result schema, so it is rejected cleanly
    (the reference's unhandled-fallible diagnostic is the analogue)."""
    import json as _json

    v = getattr(a, "_vs_pyval", None) if not isinstance(a, str) else a
    if not isinstance(v, str):
        raise ValueError(
            "VRL-lite: parse_json needs a literal string argument — a "
            "runtime column's JSON shape is not schema-static (use the "
            "json_parser transform with an explicit schema instead)"
        )
    return _json_literal(_json.loads(v))


def _sha3(a, variant=None):
    """sha3.rs — SHA-3 digests (default SHA3-512). Literals fold via
    hashlib; runtime columns delegate to functions/vrl.sha3 (the
    Arrow-batched pandas_udf — the JVM has no SHA-3 builtin)."""
    import hashlib

    v = _as_py_val(variant) if variant is not None else "SHA3-512"
    bits = int(str(v).rsplit("-", 1)[-1])
    p = _pyv(a)
    if isinstance(p, str):
        return _lit_static(hashlib.new(f"sha3_{bits}", p.encode()).hexdigest())
    from vector_spark.functions.vrl import sha3

    out = sha3(a, f"SHA3-{bits}")
    out._vs_isstr = True
    return out


def _redact(a, pat, *repl):
    from vector_spark.functions.vrl import redact

    args = [_as_py_val(pat)]
    if repl:
        args.append(_as_py_val(repl[0]))
    return redact(a, *args)


def _sha2_bits(variant) -> int:
    """sha2 variant: VRL passes "SHA-224"/"SHA-256"/…; also accept a
    plain bit count (sha2.rs variant parameter)."""
    v = _as_py_val(variant)
    if isinstance(v, str):
        v = int(v.rsplit("-", 1)[-1])
    return int(v)


def _as_py_int(col_or_int) -> int:
    """Literal int arg passed through the parser as a Column — the
    parser tags literal Columns with ``_vs_pyval`` so static args
    (substring lengths, rounding digits) stay plan-time constants."""
    if isinstance(col_or_int, int):
        return col_or_int
    v = getattr(col_or_int, "_vs_pyval", None)
    if not isinstance(v, int):
        raise ValueError("expected integer literal argument")
    return v


class _Parser:
    # strict=True (the program compiler) enforces the reference
    # compiler's static diagnostics — E651 unnecessary coalesce, E660
    # non-boolean negation, E100/E103/E104 unhandled-fallibility (in
    # vrl_program.py). VRL-lite condition/config mode stays permissive:
    # runtime failures are per-event nulls on a fixed schema.
    strict = False

    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m:
                raise ValueError(f"VRL-lite: cannot tokenize at {text[pos:pos+20]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind != "ws":
                self.toks.append((kind, m.group()))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise ValueError(f"VRL-lite: expected {val!r}, got {v!r}")

    # precedence: ?? < or < and < cmp < add < mul < unary < primary
    # (?? is VRL's error-coalescing operator → F.coalesce)
    def parse(self):
        e = self.parse_coalesce()
        if self.peek() != (None, None):
            raise ValueError(f"VRL-lite: trailing tokens at {self.peek()!r}")
        return e

    def _discard(self, fn):
        """Parse-and-discard: consume the tokens of a statically dead
        branch. The program parser overrides this to also roll back
        environment side effects (VRL short-circuit: `true || (.foo =
        true)` must not assign)."""
        return fn()

    def parse_coalesce(self):
        left = self.parse_or()
        while self.peek()[1] == "??":
            self.next()
            if (
                self.strict
                and not _is_fallible(left)
                and _static_err(left) is None
                and _pyv(left) is not _MISSING
            ):
                # E651 (parser diagnostics): `??` on an expression the
                # type checker knows can't fail is rejected, matching
                # unnecessary_error_coalesce.vrl. Plan-time LITERALS
                # only — schema-typed paths make this engine's
                # infallibility stricter than the reference's
                # (external paths are `any` there), and
                # `upcase(x) ?? x` on a schema-known string must stay
                # legal (internal/progressive_type_checking.vrl)
                raise ValueError(
                    "VRL program: unnecessary error coalescing operation "
                    "(the left-hand side can't fail) [E651]"
                )
            if _static_err(left) is not None:
                # statically errored lhs → the fallback, unconditionally
                left = self.parse_or()
            elif _pyv(left) is not _MISSING or _col_tags(left).get("_vs_infallible"):
                # lhs VALUE statically known (literal or folded), or a
                # kind-checked infallible call → fallback is dead code.
                # Kind-only tags do NOT qualify: a runtime try_add can
                # still overflow-null
                self._discard(self.parse_or)
                left = _clear_fallible(left)
            else:
                left = F.coalesce(left, self.parse_or())
        return left

    def parse_or(self):
        left = self.parse_and()
        while self.peek()[1] == "||":
            self.next()
            lp = _pyv(left)
            if _static_err(left) is not None:
                self._discard(self.parse_and)  # lhs error propagates
            elif lp is None or lp is False:
                # VRL try_or: null / false → rhs VALUE (side effects live)
                left = self.parse_and()
            elif lp is not _MISSING:
                # statically truthy VALUE (true, "foo", 1, …) → lhs
                self._discard(self.parse_and)
            elif (lt := _stype(left)) is not None and lt != "boolean":
                # VRL ||'s value-OR form (compiler op.rs ErrorOr): a
                # non-boolean lhs can only be falsy by being null, so
                # this is a null-coalesce carrying the lhs kind
                right = self.parse_and()
                left = _prop_fallible(
                    _tag(F.when(left.isNotNull(), left).otherwise(right), lt),
                    left,
                    right,
                )
            else:
                right = self.parse_and()
                left = _prop_fallible(left | right, left, right)
        return left

    def parse_and(self):
        left = self.parse_cmp()
        while self.peek()[1] == "&&":
            self.next()
            lt, lp = _stype(left), _pyv(left)
            if _static_err(left) is not None:
                self._discard(self.parse_cmp)  # lhs error propagates
            elif lp is None or lp is False:
                # VRL try_and: null/false lhs → false, rhs dead
                self._discard(self.parse_cmp)
                left = _lit_static(False)
            elif lp is not _MISSING and lt != "boolean":
                self._discard(self.parse_cmp)
                left = _err_value(
                    f"can't apply an AND to types \"{lt}\" and \"boolean\""
                )
            else:
                right = self.parse_cmp()
                re_ = _static_err(right)
                rt, rp = _stype(right), _pyv(right)
                if re_ is not None:
                    left = right  # rhs error propagates (try_and is eager)
                elif rp is None:
                    left = _lit_static(False)
                elif rp is not _MISSING and rt != "boolean":
                    left = _err_value(
                        f"can't apply an AND to types \"boolean\" and \"{rt}\""
                    )
                elif lp is True and rp is not _MISSING:
                    left = _lit_static(bool(rp))
                else:
                    left = _prop_fallible(left & right, left, right)
        return left

    _CMP_ERR = {
        "<": "can't compare {l} < {r}",
        "<=": "can't compare {l} <= {r}",
        ">": "can't compare {l} > {r}",
        ">=": "can't compare {l} >= {r}",
    }

    def parse_cmp(self):
        left = self.parse_add()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            right = self.parse_add()
            if _static_err(left) is not None:
                return left
            if _static_err(right) is not None:
                return right
            lt, rt = _stype(left), _stype(right)
            lp, rp = _pyv(left), _pyv(right)
            if lt is not None and rt is not None:
                comparable = (lt in _NUMERIC and rt in _NUMERIC) or (
                    lt == rt and lt in ("string", "boolean")
                )
                if v in ("==", "!="):
                    # eq_lossy: cross-kind (outside the numeric pair)
                    # is FALSE, never an error ("true" == true → false)
                    if lt != rt and not (lt in _NUMERIC and rt in _NUMERIC):
                        return _lit_static(v == "!=")
                    if lp is not _MISSING and rp is not _MISSING:
                        eq = lp == rp
                        return _lit_static(eq if v == "==" else not eq)
                else:
                    if not comparable:
                        return _err_value(
                            self._CMP_ERR[v].format(
                                l=f'"{lt}"', r=f'"{rt}"'
                            )
                        )
                    if lp is not _MISSING and rp is not _MISSING:
                        res = {
                            "<": lp < rp,
                            "<=": lp <= rp,
                            ">": lp > rp,
                            ">=": lp >= rp,
                        }[v]
                        return _lit_static(bool(res))
            return {
                "==": lambda a, b: a == b,
                "!=": lambda a, b: a != b,
                "<": lambda a, b: a < b,
                "<=": lambda a, b: a <= b,
                ">": lambda a, b: a > b,
                ">=": lambda a, b: a >= b,
            }[v](left, right)
        return left

    # Arithmetic compiles to try_* functions: VRL's checked arithmetic
    # turns overflow / divide-by-zero into a runtime *error* that leaves
    # the event unmodified (src/transforms/remap.rs:77-127,
    # lib/vrl/compiler/src/type_def.rs:38-49). Under Spark ANSI mode the
    # plain operators would abort the whole job on one hot row — the
    # worst possible scale behavior. try_add/try_multiply/... yield NULL
    # instead, which feeds the existing ``??`` / error_when / drop_on_error
    # machinery exactly like a VRL error value.
    #
    # VRL integers are i64: a 32-bit int COLUMN would otherwise do
    # int32 arithmetic and null out at 2^31 — promote the left operand
    # to bigint (adding 0L: ints widen to long, doubles stay double).
    # Promotion applies to * and % only: those are numeric-only, while
    # + and - must keep resolving for date/timestamp arithmetic
    # (try_add(date, 0L) fails analysis). Multiplication is where i64
    # range is actually reached; a pure-addition int32 overflow needs
    # ~2^21 same-sign terms, and multiply results (the realistic
    # overflow source) are already long when they reach +/-.
    @staticmethod
    def _promote(c: Column) -> Column:
        return F.try_add(c, F.lit(0).cast("bigint"))

    @staticmethod
    def _add_static(v, left, right):
        """Static kind check for + and - (value/arithmetic.rs try_add /
        try_sub). Returns the replacement Column, or None to use the
        runtime path."""
        if _static_err(left) is not None:
            return left
        if _static_err(right) is not None:
            return right
        lt, rt = _stype(left), _stype(right)
        if lt is None or rt is None:
            return None
        lp, rp = _pyv(left), _pyv(right)
        if v == "+":
            ok = (lt in _NUMERIC and rt in _NUMERIC) or (
                lt == "string" and rt in ("string", "null")
            ) or (lt == "null" and rt == "string")
            if not ok:
                return _err_value(f"can't add type \"{rt}\" to \"{lt}\"")
            if lt in _NUMERIC and lp is not _MISSING and rp is not _MISSING:
                if _fold_int_ok(lp + rp):
                    return _lit_static(lp + rp)
                return None
            if lp is not _MISSING and rp is not _MISSING and "string" in (lt, rt):
                # string concat / null-absorbing concat, statically
                return _lit_static((lp or "") + (rp or ""))
        else:
            if not (lt in _NUMERIC and rt in _NUMERIC):
                return _err_value(
                    f"can't subtract type \"{rt}\" from \"{lt}\""
                )
            if lp is not _MISSING and rp is not _MISSING:
                if _fold_int_ok(lp - rp):
                    return _lit_static(lp - rp)
                return None
        return None

    def parse_add(self):
        left = self.parse_mul()
        while self.peek() in (("op", "+"), ("op", "-"), ("op", "|")):
            _, v = self.next()
            right = self.parse_mul()
            if v == "|":
                # object merge (value/arithmetic.rs try_merge; only the
                # program tokenizer emits a single `|`)
                left = _merge_cols(left, right)
                continue
            static = self._add_static(v, left, right)
            if static is not None:
                left = static
                continue
            lt, rt = _stype(left), _stype(right)
            if lt in _NUMERIC and rt in _NUMERIC:
                # kinds known, values not: tag the result kind
                out_kind = (
                    "integer" if lt == rt == "integer" else "float"
                )
                if v == "+":
                    left = _prop_fallible(
                        _tag(F.try_add(left, right), out_kind), left, right
                    )
                else:
                    left = _prop_fallible(
                        _tag(F.try_subtract(left, right), out_kind),
                        left,
                        right,
                    )
                continue
            if v == "+" and (_is_strish(left) or _is_strish(right)):
                # VRL `+` on strings is concatenation (expression/op.rs);
                # plan-time type info is limited to literal/derived
                # tags, so a string operand anywhere in the chain flips
                # the whole chain to concat. Null operands contribute
                # nothing (VRL: null + "bar" == "bar").
                cat = F.concat(
                    F.coalesce(left.cast("string"), F.lit("")),
                    F.coalesce(right.cast("string"), F.lit("")),
                )
                cat._vs_isstr = True
                left = _prop_fallible(cat, left, right)
            else:
                left = _prop_fallible(
                    F.try_add(left, right)
                    if v == "+"
                    else F.try_subtract(left, right),
                    left,
                    right,
                )
        return left

    @staticmethod
    def _mul_static(v, left, right):
        """Static kind check for * / % (try_mul / try_div / try_rem).
        Division by a literal zero is the DivideByZero error with the
        reference's float-default ok value."""
        if _static_err(left) is not None:
            return left
        if _static_err(right) is not None:
            return right
        lt, rt = _stype(left), _stype(right)
        lp, rp = _pyv(left), _pyv(right)
        if v == "/":
            # try_div coerces rhs first, then zero-checks, then lhs
            if rt is not None and rt not in _NUMERIC:
                if lt is None:
                    return None
                return _err_value(f"can't divide type \"{lt}\" by \"{rt}\"")
            if rp is not _MISSING and rp == 0 and rt in _NUMERIC:
                return _err_value("can't divide by zero", ok_default=0.0)
            if lt is not None and rt is not None:
                if lt not in _NUMERIC:
                    return _err_value(
                        f"can't divide type \"{lt}\" by \"{rt}\""
                    )
                if lp is not _MISSING and rp is not _MISSING:
                    # VRL division is float; the fold keeps the
                    # FALLIBLE bit — the reference's / is fallible even
                    # on literals (corpus: `5 / 2 ?? 0`, E630 on
                    # to_int(5 / 4))
                    return _mark_fallible(_lit_static(lp / rp))
            return None
        if lt is None or rt is None:
            return None
        if v == "*":
            ok = (lt in _NUMERIC and rt in _NUMERIC) or {lt, rt} == {
                "integer",
                "string",
            }
            if not ok:
                return _err_value(f"can't multiply type \"{lt}\" by \"{rt}\"")
            if lt in _NUMERIC and rt in _NUMERIC and lp is not _MISSING and rp is not _MISSING:
                if _fold_int_ok(lp * rp):
                    return _lit_static(lp * rp)
                return None
            return None
        # %
        if not (lt in _NUMERIC and rt in _NUMERIC):
            return _err_value(
                f"can't calculate remainder of type \"{lt}\" and \"{rt}\""
            )
        if lp is not _MISSING and rp is not _MISSING and rp != 0:
            # Rem on known numerics is INFALLIBLE in the reference
            # (op.rs type_def test: `op(Rem, 5, 5)` → infallible) —
            # corpus remainder/integer.vrl runs bare `5 % 2` with no ??
            return _lit_static(
                lp % rp if isinstance(lp, int) and isinstance(rp, int)
                else float(lp) % float(rp)
            )
        return None

    def parse_mul(self):
        left = self.parse_unary()
        while self.peek()[1] in ("*", "/", "%") and self.peek()[0] == "op":
            _, v = self.next()
            right = self.parse_unary()
            static = self._mul_static(v, left, right)
            if static is not None:
                left = static
                continue
            lt, rt = _stype(left), _stype(right)
            if lt in _NUMERIC and rt in _NUMERIC:
                if v == "*":
                    left = _prop_fallible(
                        _tag(
                            F.try_multiply(self._promote(left), right),
                            "integer" if lt == rt == "integer" else "float",
                        ),
                        left,
                        right,
                    )
                elif v == "/":
                    left = _mark_fallible(
                        _tag(F.try_divide(left, right), "float")
                    )
                else:
                    # Rem on known-numeric operands: infallible per the
                    # reference typedef (runtime %0 still nulls — the
                    # permissive lite-mode contract)
                    left = _prop_fallible(
                        _tag(
                            F.try_mod(self._promote(left), right),
                            "integer" if lt == rt == "integer" else "float",
                        ),
                        left,
                        right,
                    )
                continue
            if v == "*" and (_is_strish(left) or _is_strish(right)):
                # VRL `*` with a string operand is repetition
                # (expression/op.rs: "foo" * 2 == "foofoo")
                s, n = (left, right) if _is_strish(left) else (right, left)
                left = F.repeat(s, n.cast("int"))
                left._vs_isstr = True
            elif v == "*":
                left = _prop_fallible(
                    F.try_multiply(self._promote(left), right), left, right
                )
            elif v == "/":
                # VRL division always yields float (op.rs: Div →
                # TypeDef::fallible().float()) — kind survives even on
                # untyped operands
                left = _mark_fallible(
                    _tag(F.try_divide(left, right), "float")
                )
            else:
                left = _mark_fallible(F.try_mod(self._promote(left), right))
        return left

    def parse_unary(self):
        k, v = self.peek()
        if k == "op" and v == "!":
            self.next()
            inner = self.parse_unary()
            p = _pyv(inner)
            if isinstance(p, bool):
                return _lit_static(not p)
            it = _stype(inner)
            if self.strict and it is not None and it != "boolean":
                # E660 non-boolean negation (unary.rs / not.rs)
                raise ValueError(
                    f'VRL program: negation only works on boolean values, '
                    f'this expression resolves to "{it}" [E660]'
                )
            return _prop_fallible(~inner, inner)
        if k == "op" and v == "-":
            self.next()
            inner = self.parse_unary()
            p = _pyv(inner)
            if isinstance(p, (int, float)) and not isinstance(p, bool):
                return _lit_static(-p)
            return _prop_fallible(-inner, inner)
        return self.parse_primary()

    def parse_primary(self):
        k, v = self.next()
        if k == "op" and v == "(":
            # full-precedence recursion so ``??`` works inside parens
            e = self.parse_coalesce()
            self.expect(")")
            return e
        if k == "str":
            sv = _unescape(v, self.strict)
            lit = F.lit(sv)
            lit._vs_pyval = sv
            return lit
        if k == "num":
            v = v.replace("_", "")  # VRL numeric literals allow 1_000
            pyval = float(v) if "." in v else int(v)
            lit = F.lit(pyval)
            lit._vs_pyval = pyval
            return lit
        if k == "path":
            return self.resolve_path(v[1:])
        if k == "ident":
            if v in ("true", "false"):
                lit = F.lit(v == "true")
                lit._vs_pyval = v == "true"
                return lit
            if v == "null":
                return _tag(F.lit(None), "null")
            # VRL fallible-call marker `fn!(...)`: in lite mode errors
            # are already null-valued so the bang is dropped; the
            # program compiler receives it for E620 checks and
            # abort-on-error semantics
            bang = False
            fn_tok_i = self.i - 1  # index of the function-name token
            if (
                self.peek() == ("op", "!")
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1] == ("op", "(")
            ):
                bang = True
                self.next()
            if self.peek()[1] == "(":
                self.next()
                args: list = []
                kwargs: dict = {}

                def _one_arg():
                    k2, v2 = self.peek()
                    if (
                        k2 == "ident"
                        and self.i + 1 < len(self.toks)
                        and self.toks[self.i + 1] == ("op", ":")
                    ):
                        # VRL keyword argument (`level: "error"`) —
                        # only the program tokenizer emits ':'
                        self.next()
                        self.next()
                        kwargs[v2] = self.parse_coalesce()
                    else:
                        args.append(self.parse_coalesce())

                if self.peek()[1] != ")":
                    _one_arg()
                    while self.peek()[1] == ",":
                        self.next()
                        _one_arg()
                self.expect(")")
                # source span of the whole call (byte offsets, for the
                # reference's position-bearing runtime-abort messages);
                # only the program tokenizer records spans
                spans = getattr(self, "spans", None)
                call_span = (
                    (spans[fn_tok_i][0], spans[self.i - 1][1])
                    if spans
                    else None
                )
                return self.call_func(
                    v, args, kwargs or None, bang=bang, span=call_span
                )
            # bare identifier = column reference (or, in program mode,
            # a local variable — see vrl_program._ProgramParser)
            return self.resolve_ident(v)
        raise ValueError(f"VRL-lite: unexpected token {v!r}")

    # resolution hooks — the program compiler (functions/vrl_program.py)
    # overrides these so paths/idents see earlier program assignments
    def resolve_path(self, name: str) -> Column:
        return _field(name)

    def resolve_ident(self, name: str) -> Column:
        return _field(name)

    # function-call hook — the program compiler layers static
    # evaluation (parse_json of literals, append of static lists,
    # object merge, timestamp kind tagging) on top of the table
    def call_func(
        self,
        name: str,
        args: list,
        kwargs: dict | None = None,
        bang: bool = False,
        span: tuple | None = None,
    ) -> Column:
        if kwargs and "value" in kwargs and not args:
            # VRL allows naming the first positional arg (`value:`)
            args = [kwargs.pop("value")]
        if kwargs:
            # named arguments map onto the trailing positional slots in
            # the function's declared parameter order (each stdlib fn's
            # Parameter list in lib/vrl/stdlib/src/<fn>.rs)
            for k in _KW_ORDER.get(name, ()):
                if k in kwargs:
                    args.append(kwargs.pop(k))
        if kwargs and name not in ("log", "assert"):
            raise ValueError(
                f"VRL-lite: keyword arguments are not supported for {name}()"
            )
        if name not in _FUNCS:
            raise ValueError(f"VRL-lite: unknown function {name}()")
        out = _FUNCS[name](*args)
        if name in ("now", "to_timestamp", "parse_timestamp", "from_unix_timestamp"):
            out = _tag(out, "timestamp")
        return out


_KW_ORDER = {
    "parse_timestamp": ("format",),
    "parse_regex": ("pattern", "numeric_groups"),
    "parse_regex_all": ("pattern", "numeric_groups"),
    "parse_grok": ("pattern",),
    "format_timestamp": ("format",),
    "slice": ("start", "end"),
    "replace": ("pattern", "with"),
    "split": ("pattern",),
    "join": ("separator",),
    "round": ("precision",),
    "truncate": ("limit",),
}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str, strict: bool = False) -> str:
    """VRL string literal unescape: \\n/\\t/\\r/quotes/backslash;
    unknown escapes (e.g. regex \\d) pass through verbatim in lite
    mode. strict mode (the program compiler) mirrors the reference
    lexer's escape table (lex.rs unescape_string_literal): an unknown
    escape character is a syntax error (invalid_string.vrl,
    6571_invalid_escape.vrl)."""
    body = s[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if strict and nxt not in _ESCAPES:
                raise ValueError(
                    f"VRL program: invalid escape character: \\{nxt} [E202]"
                )
            out.append(_ESCAPES.get(nxt, "\\" + nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def compile_vrl_lite(expr: str) -> Column:
    """Compile a VRL-lite boolean/scalar expression to a Column."""
    return _Parser(expr).parse()


def compile_condition(spec: Any) -> Column:
    """AnyCondition (src/conditions/mod.rs:63-67): a bare string = VRL
    expression; a dict with type 'check_fields' = the DSL; a dict with
    type 'vrl' carries 'source'."""
    if isinstance(spec, str):
        return compile_vrl_lite(spec)
    if isinstance(spec, Column):
        return spec
    if isinstance(spec, dict):
        typ = spec.get("type", "check_fields")
        if typ == "vrl":
            return compile_vrl_lite(spec["source"])
        if typ == "check_fields":
            body = {k: v for k, v in spec.items() if k != "type"}
            return compile_check_fields(body)
        if typ == "datadog_search":
            from vector_spark.datadog import SearchSchema, compile_datadog_search

            schema = SearchSchema(
                message_col=spec.get("message_field", "message"),
                tags_col=spec.get("tags_field", "tags"),
                numeric_fields=frozenset(spec.get("numeric_fields", ())),
            )
            return compile_datadog_search(spec["source"], schema)
        if typ == "is_log":
            return F.lit(True)  # log-only frames in this engine
        if typ == "is_metric":
            return F.lit(False)
        raise ValueError(f"unknown condition type {typ!r}")
    raise TypeError(f"cannot compile condition from {type(spec)}")
