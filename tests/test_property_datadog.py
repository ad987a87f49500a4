"""Property tests for the datadog_search compiler: any generated query
compiles to a TOTAL predicate — never null (so ``NOT (q)`` exactly
complements ``q``; under plain three-valued logic a null atom would
leak rows out of both sides), and never a job abort on dirty data
(the engine-wide no-abort invariant)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vector_spark.datadog import SearchSchema, compile_datadog_search

words = st.sampled_from(["bla", "foo", "err42", "web.go", "x_y"])
fieldable = st.sampled_from(["host", "service", "@a", "@num", "tags", "kx"])

atom = st.one_of(
    words,
    words.map(lambda w: f"{w}*"),
    words.map(lambda w: f"*{w}"),
    st.tuples(fieldable, words).map(lambda t: f"{t[0]}:{t[1]}"),
    st.tuples(fieldable, words).map(lambda t: f'{t[0]}:"{t[1]}"'),
    st.tuples(fieldable, st.integers(0, 99), st.integers(0, 99)).map(
        lambda t: f"{t[0]}:[{min(t[1], t[2])} TO {max(t[1], t[2])}]"
    ),
    fieldable.map(lambda f: f"_exists_:{f}"),
    fieldable.map(lambda f: f"_missing_:{f}"),
    st.sampled_from(["[1 TO 10]", "[* TO 50]", "*:*"]),
)


@st.composite
def queries(draw, depth=2):
    if depth == 0:
        q = draw(atom)
    else:
        kind = draw(st.integers(0, 3))
        if kind == 0:
            q = draw(atom)
        elif kind == 1:
            a, b = draw(queries(depth=depth - 1)), draw(queries(depth=depth - 1))
            q = f"{a} {draw(st.sampled_from(['AND', 'OR']))} {b}"
        elif kind == 2:
            q = f"({draw(queries(depth=depth - 1))})"
        else:
            q = f"NOT {draw(atom)}"
    return q


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        ("bla happened", "web", "api", ["kx:bla", "env:prod"], "foo", 5.0),
        (None, None, None, None, None, None),
        ("foo err42", "db", None, [], "bla", 50.0),
        ("x_y web.go", "web", "api", ["kx:foo"], None, 99.0),
    ]
    df = spark.createDataFrame(
        rows,
        "message string, host string, service string, "
        "tags array<string>, a string, num double",
    )
    return df.cache(), df.count()


@settings(max_examples=30, deadline=None)
@given(q=queries())
def test_query_and_negation_partition_frame(frame, q):
    df, total = frame
    schema = SearchSchema(numeric_fields=frozenset({"num"}))
    pos = compile_datadog_search(q, schema)
    neg = compile_datadog_search(f"NOT ({q})", schema)
    counts = df.select(
        F.sum(F.when(pos, 1).otherwise(0)).alias("p"),
        F.sum(F.when(neg, 1).otherwise(0)).alias("n"),
        F.sum(F.when(pos & neg, 1).otherwise(0)).alias("both"),
    ).collect()[0]
    assert counts.p + counts.n == total, f"query {q!r} leaks rows"
    assert counts.both == 0, f"query {q!r} overlaps its negation"
