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
    want = [_py_eval(expr, row) for row in ROWS]
    assert got == want, expr


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
