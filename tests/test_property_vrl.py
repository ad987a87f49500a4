"""Property-based tests — the port of the reference's proptest suite
(lib/vrl/proptests/src/main.rs: generated-grammar round trips).

Strategy: generate random VRL-lite expressions from the grammar,
assert the compiler (a) never crashes on grammatical input, (b) is
deterministic, and (c) agrees with a Python reference evaluator on
arithmetic/boolean semantics over concrete rows.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from vector_spark.conditions import compile_vrl_lite

# -- grammar generators -------------------------------------------------------

_num = st.integers(min_value=0, max_value=1000)
_field = st.sampled_from([".a", ".b", ".c"])


def _arith(depth: int):
    if depth <= 0:
        return st.one_of(_num.map(str), _field)
    sub = _arith(depth - 1)
    return st.one_of(
        _num.map(str),
        _field,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
    )


def _boolean(depth: int):
    base = st.tuples(_arith(1), st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), _arith(1)).map(
        lambda t: f"{t[0]} {t[1]} {t[2]}"
    )
    if depth <= 0:
        return base
    sub = _boolean(depth - 1)
    return st.one_of(
        base,
        st.tuples(sub, st.sampled_from(["&&", "||"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda s: f"!({s})"),
    )


def _py_eval(expr: str, row: dict):
    py = expr.replace("&&", " and ").replace("||", " or ").replace("!(", " not (")
    for k, v in row.items():
        py = py.replace(f".{k}", str(v))
    return eval(py)  # noqa: S307 - test-only reference evaluator


_I64_MIN, _I64_MAX = -(2**63), 2**63 - 1


def _py_eval_checked(expr: str, row: dict):
    """Reference evaluator with VRL checked-arithmetic semantics:
    any intermediate i64 overflow (or div/mod by zero) is a runtime
    error → the compiled plan yields NULL (try_add/try_multiply/...).
    Mirrors lib/vrl/compiler checked ops; None models the error."""
    import ast

    for k, v in row.items():
        expr = expr.replace(f".{k}", str(v))

    def ev(node):
        if isinstance(node, ast.Expression):
            return ev(node.body)
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            v = ev(node.operand)
            return None if v is None else -v
        if isinstance(node, ast.BinOp):
            a, b = ev(node.left), ev(node.right)
            if a is None or b is None:
                return None
            if isinstance(node.op, ast.Add):
                v = a + b
            elif isinstance(node.op, ast.Sub):
                v = a - b
            elif isinstance(node.op, ast.Mult):
                v = a * b
            else:
                raise AssertionError(f"unexpected op {node.op}")
            return v if _I64_MIN <= v <= _I64_MAX else None
        raise AssertionError(f"unexpected node {node}")

    return ev(ast.parse(expr, mode="eval"))


ROWS = [{"a": 3, "b": 7, "c": 0}, {"a": 100, "b": 2, "c": 55}]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame([tuple(r.values()) for r in ROWS], "a int, b int, c int")


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(expr=_boolean(2))
def test_boolean_semantics_match_python(spark, frame, expr):
    col = compile_vrl_lite(expr)
    got = [r.x for r in frame.select(col.alias("x")).collect()]
    want = [bool(_py_eval(expr, row)) for row in ROWS]
    assert got == want, expr


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(expr=_arith(3))
def test_arithmetic_semantics_match_python(spark, frame, expr):
    col = compile_vrl_lite(expr)
    got = [r.x for r in frame.select(col.alias("x")).collect()]
    want = [_py_eval_checked(expr, row) for row in ROWS]
    assert got == want, expr


def test_overflow_is_error_value_not_job_abort(spark, frame):
    """VRL checked arithmetic: i64 overflow is a per-event runtime
    error (NULL here), never a whole-job ARITHMETIC_OVERFLOW abort —
    one hot row must not kill a 100 TB job (remap.rs:77-127)."""
    big = str(_I64_MAX)
    col = compile_vrl_lite(f"({big} + {big})")
    got = [r.x for r in frame.select(col.alias("x")).collect()]
    assert got == [None, None]
    # ...and the ?? error-coalescing operator catches it, VRL-style
    col2 = compile_vrl_lite(f"({big} * 2) ?? -1")
    got2 = [r.x for r in frame.select(col2.alias("x")).collect()]
    assert got2 == [-1, -1]


def test_division_and_mod_by_zero_yield_null(spark, frame):
    """row c=0: .b / .c and .b % .c are errors → NULL, not an ANSI
    DIVIDE_BY_ZERO job abort."""
    got = [
        (r.d, r.m)
        for r in frame.select(
            compile_vrl_lite(".b / .c").alias("d"),
            compile_vrl_lite(".b % .c").alias("m"),
        ).collect()
    ]
    assert got[0] == (None, None)  # c == 0
    assert got[1] == (2 / 55, 2 % 55)  # c == 55: defined


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(expr=_boolean(2))
def test_compile_deterministic(expr):
    a = str(compile_vrl_lite(expr))
    b = str(compile_vrl_lite(expr))
    assert a == b


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(garbage=st.text(min_size=1, max_size=30))
def test_garbage_never_hangs_only_valueerror(garbage):
    """Arbitrary text either compiles (it may be grammatical) or
    raises ValueError — never another exception type."""
    try:
        compile_vrl_lite(garbage)
    except ValueError:
        pass


# -- encode/parse round trip: logfmt --------------------------------------

_key = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8)
_val = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .:/-", min_size=1, max_size=16
).map(str.strip).filter(bool)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(m=st.dictionaries(_key, _val, min_size=1, max_size=5))
def test_logfmt_encode_parse_roundtrip(spark, m):
    """encode_logfmt ∘ logfmt_parser recovers every key/value —
    including space-containing values (quoted on encode, unquoted on
    parse). The parse side is the same operator the pipeline uses."""
    from vector_spark.functions.vrl import encode_logfmt
    from vector_spark.operators import logfmt_parser

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(m,)], "m map<string,string>")
    line = df.select(encode_logfmt(F.col("m")).alias("message"))
    parsed = logfmt_parser(line, fields=sorted(m))
    row = parsed.first()
    for k, v in m.items():
        assert row[k] == v, (k, v, row)


# -- the engine-wide invariant: dirty input never aborts a job -------------

_garbage = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    min_size=0,
    max_size=60,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(lines=st.lists(_garbage, min_size=1, max_size=6))
def test_every_parser_survives_arbitrary_garbage(spark, lines):
    """One malformed event is a per-event null, never a job failure:
    every parser family must complete over arbitrary text (ANSI mode
    is on — a plain cast/element_at anywhere in the path would throw)."""
    from vector_spark.functions.logformats import (
        parse_aws_alb_log,
        parse_aws_vpc_flow_log,
        parse_glog,
        parse_syslog,
        parse_syslog5424,
    )
    from vector_spark.operators import (
        grok_parser,
        json_parser,
        key_value_parser,
        logfmt_parser,
        regex_parser,
        split_fields,
        tokenizer,
    )

    df = spark.createDataFrame([(l,) for l in lines], "message string")
    frames = [
        parse_syslog(df),
        parse_syslog5424(df),
        parse_glog(df),
        parse_aws_alb_log(df),
        parse_aws_vpc_flow_log(df),
        json_parser(df),
        key_value_parser(df),
        logfmt_parser(df, fields=["a"], types={"a": "int"}),
        tokenizer(df, ["t1", "t2"], types={"t2": "float"}),
        split_fields(df, ["s1", "s2"], types={"s2": "int"}),
        grok_parser(df, "%{WORD:w} %{NUMBER:n}", types={"n": "int"}),
        regex_parser(df, [r"^(?P<k>\w+)=(?P<v>\d+)$"], types={"v": "int"}),
    ]
    for f in frames:
        assert f.count() == len(lines)  # every row survives, none aborts


def test_to_regex_compile_time_validation(spark):
    """to_regex.rs: string → regex, fallible — here the fallibility
    surfaces at VRL-compile time (literal patterns only; a per-row
    dynamic pattern would let one bad value abort the job inside
    Spark's regexp functions)."""
    df = spark.createDataFrame([("foo123",), ("bar",)], "a string")
    cond = compile_vrl_lite('match(.a, to_regex("[0-9]+"))')
    assert [r[0] for r in df.select(cond).collect()] == [True, False]
    with pytest.raises(ValueError, match="invalid regex"):
        compile_vrl_lite('match(.a, to_regex("(unclosed"))')
    with pytest.raises(ValueError):
        compile_vrl_lite("match(.a, to_regex(.a))")  # non-literal


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(lines=st.lists(_garbage, min_size=1, max_size=6))
def test_fallible_remap_program_on_dirty_input_never_aborts(spark, lines):
    """Every compiled remap program over dirty input yields per-row
    nulls for the rows that fail — never a job abort (ANSI mode is
    on). Exercises the fallible stdlib families together: checked
    arithmetic, int coercion, timestamp parse, regex match."""
    from vector_spark.operators.remap import remap

    df = spark.createDataFrame([(l,) for l in lines], "message string")
    out = remap(
        df,
        [
            (".n", "int(.message)"),
            (".t", 'parse_timestamp(.message, "%Y-%m-%d")'),
            (".m", 'match(.message, to_regex("^[a-z]+$"))'),
            (".sum", "int(.message) + 9223372036854775807"),
            (".q", "int(.message) / 0"),
        ],
    )
    rows = out.collect()  # the invariant: this must complete
    assert len(rows) == len(lines)
    for line, row in zip(lines, rows):
        if not line.strip().lstrip("+-").isdigit():
            assert row.n is None or isinstance(row.n, int)
