"""Port of the reference's datadog_search condition test corpus
(src/conditions/datadog_search.rs:49-736 `check_datadog`): every
(query, pass-event, fail-event) triplet, evaluated through
``compile_datadog_search`` on one-row frames.

Facet mapping: the reference hosts facets under ``custom.*``; this
engine's flat schema maps ``@x`` to column ``x`` and ``custom.title``
(a DEFAULT_FIELD) to column ``title``. Facets carrying JSON *numbers*
in the reference use double-typed columns + ``numeric_fields`` —
the schema-static stand-in for VRL's runtime is_integer/is_float
branch (vrl.rs:169-176).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vector_spark.datadog import SearchSchema, compile_datadog_search

# (query, pass_event, fail_event); events: message/host/trace_id strings,
# tags list, facets dict. Numeric facet values -> the numeric group.
CASES = [
    ("_exists_:a", {"tags": ["a:foo"]}, {"tags": ["b:foo"]}),
    ("NOT _exists_:a", {"tags": ["b:foo"]}, {"tags": ["a:foo"]}),
    ("-_exists_:a", {"tags": ["b:foo"]}, {"tags": ["a:foo"]}),
    ("_exists_:@b", {"facets": {"b": "foo"}}, {"facets": {"a": "foo"}}),
    ("NOT _exists_:@b", {"facets": {"a": "foo"}}, {"facets": {"b": "foo"}}),
    ("-_exists_:@b", {"facets": {"a": "foo"}}, {"facets": {"b": "foo"}}),
    ("_missing_:a", {}, {"tags": ["a:foo"]}),
    ("NOT _missing_:a", {"tags": ["a:foo"]}, {}),
    ("-_missing_:a", {"tags": ["a:foo"]}, {}),
    ("_missing_:@b", {"facets": {"a": "foo"}}, {"facets": {"b": "foo"}}),
    ("NOT _missing_:@b", {"facets": {"b": "foo"}}, {"facets": {"a": "foo"}}),
    ("-_missing_:@b", {"facets": {"b": "foo"}}, {"facets": {"a": "foo"}}),
    # Keyword.
    ("bla", {"message": "bla"}, {}),
    ("foo", {"message": '{"key": "foo"}'}, {}),
    ("bar", {"message": '{"nested": {"value": ["foo", "bar"]}}'}, {}),
    ("NOT bla", {"message": "nothing"}, {"message": "bla"}),
    ("NOT foo", {}, {"message": '{"key": "foo"}'}),
    ("NOT bar", {}, {"message": '{"nested": {"value": ["foo", "bar"]}}'}),
    ("-bla", {"message": "nothing"}, {"message": "bla"}),
    ("-foo", {}, {"message": '{"key": "foo"}'}),
    ("-bar", {}, {"message": '{"nested": {"value": ["foo", "bar"]}}'}),
    # Quoted keyword.
    ('"bla"', {"message": "bla"}, {}),
    ('"foo"', {"message": '{"key": "foo"}'}, {}),
    ('"bar"', {"message": '{"nested": {"value": ["foo", "bar"]}}'}, {}),
    ('NOT "bla"', {}, {"message": "bla"}),
    ('NOT "foo"', {}, {"message": '{"key": "foo"}'}),
    ('-"bla"', {}, {"message": "bla"}),
    # Tag / reserved matches.
    ("a:bla", {"tags": ["a:bla"]}, {"tags": ["b:bla"]}),
    ("host:foo", {"host": "foo"}, {"tags": ["host:foo"]}),
    ("host:foo", {"host": "foo"}, {"host": "foobar"}),
    ("host:foo", {"host": "foo"}, {"host": '{"value": "foo"}'}),
    ("NOT a:bla", {"tags": ["b:bla"]}, {"tags": ["a:bla"]}),
    ("NOT host:foo", {"tags": ["host:fo  o"]}, {"host": "foo"}),
    ("-a:bla", {"tags": ["b:bla"]}, {"tags": ["a:bla"]}),
    ("-trace_id:foo", {}, {"trace_id": "foo"}),
    ('a:"bla"', {"tags": ["a:bla"]}, {"facets": {"a": "bla"}}),
    ('NOT a:"bla"', {"facets": {"a": "bla"}}, {"tags": ["a:bla"]}),
    ('-a:"bla"', {"facets": {"a": "bla"}}, {"tags": ["a:bla"]}),
    # Facet matches.
    ("@a:bla", {"facets": {"a": "bla"}}, {"tags": ["a:bla"]}),
    ("NOT @a:bla", {"tags": ["a:bla"]}, {"facets": {"a": "bla"}}),
    ("-@a:bla", {"tags": ["a:bla"]}, {"facets": {"a": "bla"}}),
    ('@a:"bla"', {"facets": {"a": "bla"}}, {"tags": ["a:bla"]}),
    ('NOT @a:"bla"', {"tags": ["a:bla"]}, {"facets": {"a": "bla"}}),
    ('-@a:"bla"', {"tags": ["a:bla"]}, {"facets": {"a": "bla"}}),
    # Wildcards on default fields.
    ("*bla", {"message": "foobla"}, {"message": "blafoo"}),
    ("NOT *bla", {"message": "blafoo"}, {"message": "foobla"}),
    ("-*bla", {"message": "blafoo"}, {"message": "foobla"}),
    ("bla*", {"message": "blafoo"}, {"message": "foobla"}),
    ("NOT bla*", {"message": "foobla"}, {"message": "blafoo"}),
    ("-bla*", {"message": "foobla"}, {"message": "blafoo"}),
    ("*b*la*", {"facets": {"title": "foobla"}}, {}),
    ("NOT *b*la*", {}, {"facets": {"title": "foobla"}}),
    ("-*b*la*", {}, {"facets": {"title": "foobla"}}),
    # Wildcards on tags.
    ("a:*bla", {"tags": ["a:foobla"]}, {"tags": ["a:blafoo"]}),
    ("NOT a:*bla", {"tags": ["a:blafoo"]}, {"tags": ["a:foobla"]}),
    ("-a:*bla", {"tags": ["a:blafoo"]}, {"tags": ["a:foobla"]}),
    ("b:bla*", {"tags": ["b:blabop"]}, {"tags": ["b:bopbla"]}),
    ("NOT b:bla*", {"tags": ["b:bopbla"]}, {"tags": ["b:blabop"]}),
    ("-b:bla*", {"tags": ["b:bopbla"]}, {"tags": ["b:blabop"]}),
    ("c:*b*la*", {"tags": ["c:foobla"]}, {}),
    ("NOT c:*b*la*", {}, {"tags": ["c:foobla"]}),
    ("-c:*b*la*", {}, {"tags": ["c:foobla"]}),
    # Wildcards on facets.
    ("@a:*bla", {"facets": {"a": "foobla"}}, {"tags": ["a:foobla"]}),
    ("NOT @a:*bla", {"tags": ["a:foobla"]}, {"facets": {"a": "foobla"}}),
    ("-@a:*bla", {"tags": ["a:foobla"]}, {"facets": {"a": "foobla"}}),
    ("@b:bla*", {"facets": {"b": "blabop"}}, {"tags": ["b:blabop"]}),
    ("NOT @b:bla*", {"tags": ["b:blabop"]}, {"facets": {"b": "blabop"}}),
    ("-@b:bla*", {"tags": ["b:blabop"]}, {"facets": {"b": "blabop"}}),
    ("@c:*b*la*", {"facets": {"c": "foobla"}}, {"tags": ["c:foobla"]}),
    ("NOT @c:*b*la*", {"tags": ["c:foobla"]}, {"facets": {"c": "foobla"}}),
    ("-@c:*b*la*", {"tags": ["c:foobla"]}, {"facets": {"c": "foobla"}}),
    # tags special case.
    ("tags:a", {"tags": ["a", "b", "c"]}, {"tags": ["d", "e", "f"]}),
    ("NOT tags:a", {"tags": ["d", "e", "f"]}, {"tags": ["a", "b", "c"]}),
    ("-tags:a", {"tags": ["d", "e", "f"]}, {"tags": ["a", "b", "c"]}),
    # Ranges on default fields (string comparison).
    ("[1 TO 10]", {"message": "1"}, {"message": "2"}),
    ("NOT [1 TO 10]", {"message": "2"}, {"message": "1"}),
    ("-[1 TO 10]", {"message": "2"}, {"message": "1"}),
    ("[50 TO *]", {"message": "6"}, {"message": "40"}),
    ("NOT [50 TO *]", {"message": "40"}, {"message": "6"}),
    ("-[50 TO *]", {"message": "40"}, {"message": "6"}),
    ("[* TO 50]", {"message": "3"}, {"message": "6"}),
    ("NOT [* TO 50]", {"message": "6"}, {"message": "3"}),
    ("-[* TO 50]", {"message": "6"}, {"message": "3"}),
    ("[* TO *]", {"message": "foo"}, {}),
    ("NOT [* TO *]", {}, {"message": "foo"}),
    ("-[* TO *]", {}, {"message": "foo"}),
    # Ranges on tags (string comparison).
    ("a:[1 TO 10]", {"tags": ["a:1"]}, {"tags": ["a:2"]}),
    ("NOT a:[1 TO 10]", {"tags": ["a:2"]}, {"tags": ["a:1"]}),
    ("-a:[1 TO 10]", {"tags": ["a:2"]}, {"tags": ["a:1"]}),
    ("a:[50 TO *]", {"tags": ["a:6"]}, {"tags": ["a:40"]}),
    ("NOT a:[50 TO *]", {"tags": ["a:40"]}, {"tags": ["a:6"]}),
    ("-a:[50 TO *]", {"tags": ["a:40"]}, {"tags": ["a:6"]}),
    ("a:[* TO 50]", {"tags": ["a:400"]}, {"tags": ["a:600"]}),
    ("NOT a:[* TO 50]", {"tags": ["a:600"]}, {"tags": ["a:400"]}),
    ("-a:[* TO 50]", {"tags": ["a:600"]}, {"tags": ["a:400"]}),
    ("a:[* TO *]", {"tags": ["a:test"]}, {"tags": ["b:test"]}),
    ("NOT a:[* TO *]", {"tags": ["b:test"]}, {"tags": ["a:test"]}),
    ("-a:[* TO *]", {"tags": ["b:test"]}, {"tags": ["a:test"]}),
    # Ranges on numeric facets.
    ("@b:[1 TO 10]", {"facets": {"b": 5}}, {"facets": {"b": 11}}),
    ("NOT @b:[1 TO 10]", {"facets": {"b": 11}}, {"facets": {"b": 5}}),
    ("-@b:[1 TO 10]", {"facets": {"b": 11}}, {"facets": {"b": 5}}),
    ("@f:{1 TO 100}", {"facets": {"f": 50}}, {"facets": {"f": 1}}),
    ("@f:{1 TO 100}", {"facets": {"f": 50}}, {"facets": {"f": 100}}),
    ("NOT @f:{1 TO 100}", {"facets": {"f": 1}}, {"facets": {"f": 50}}),
    ("NOT @f:{1 TO 100}", {"facets": {"f": 100}}, {"facets": {"f": 50}}),
    ("-@f:{1 TO 100}", {"facets": {"f": 1}}, {"facets": {"f": 50}}),
    ("-@f:{1 TO 100}", {"facets": {"f": 100}}, {"facets": {"f": 50}}),
    # Ranges on string facets (lexicographic).
    ("@b:[1 TO 100]", {"facets": {"b": "10"}}, {"facets": {"b": "2"}}),
    ("NOT @b:[1 TO 100]", {"facets": {"b": "2"}}, {"facets": {"b": "10"}}),
    ("@b:[a TO z]", {"facets": {"b": "c"}}, {"facets": {"b": "5"}}),
    ('@b:["1" TO "100"]', {"facets": {"b": "10"}}, {"facets": {"b": "2"}}),
    ('NOT @b:["1" TO "100"]', {"facets": {"b": "2"}}, {"facets": {"b": "10"}}),
    ('-@b:["1" TO "100"]', {"facets": {"b": "2"}}, {"facets": {"b": "10"}}),
    # Ranges on tags, exclusive.
    ("f:{1 TO 100}", {"tags": ["f:10"]}, {"tags": ["f:1"]}),
    ("f:{1 TO 100}", {"tags": ["f:10"]}, {"tags": ["f:100"]}),
    ("NOT f:{1 TO 100}", {"tags": ["f:1"]}, {"tags": ["f:10"]}),
    ("NOT f:{1 TO 100}", {"tags": ["f:100"]}, {"tags": ["f:10"]}),
    ("-f:{1 TO 100}", {"tags": ["f:1"]}, {"tags": ["f:10"]}),
    ("-f:{1 TO 100}", {"tags": ["f:100"]}, {"tags": ["f:10"]}),
    # Boolean composition (engine-level additions, same grammar).
    ("host:foo AND tags:a", {"host": "foo", "tags": ["a"]}, {"host": "foo"}),
    ("host:foo OR tags:a", {"tags": ["a"]}, {"tags": ["b"]}),
    ("host:foo tags:a", {"host": "foo", "tags": ["a"]}, {"host": "foo"}),
    (
        "(host:foo OR host:bar) AND -tags:x",
        {"host": "bar"},
        {"host": "bar", "tags": ["x"]},
    ),
    ("*:*", {"message": "anything"}, None),
    # Field-scoped grouping (grammar.pest `field? ~ LPAREN ~ query ~
    # RPAREN`): the field distributes over the inner atoms.
    ("host:(foo OR bar)", {"host": "bar"}, {"host": "baz"}),
    ("a:(bla OR blub)", {"tags": ["a:blub"]}, {"tags": ["a:x"]}),
    ("-host:(foo OR bar)", {"host": "baz"}, {"host": "foo"}),
    (
        "host:(foo OR bar) AND tags:x",
        {"host": "foo", "tags": ["x"]},
        {"host": "foo"},
    ),
    # Multiterm merge boundaries (parser.rs tests): 'foo bar baz AND
    # qux quux quuz' → terms 'foo bar', 'baz', 'qux', 'quux quuz' —
    # the term before AND and the first clause after it stay unmerged.
    (
        "foo bar baz AND qux quux quuz",
        {"message": "baz foo bar qux quux quuz"},
        {"message": "foo bar baz qux quux zzz quuz"},
    ),
]

FACETS = ["a", "b", "c", "f", "title"]


def _numeric_case(case) -> bool:
    for ev in case[1:]:
        for v in (ev or {}).get("facets", {}).values():
            if isinstance(v, (int, float)):
                return True
    return False


def _schema(numeric: bool) -> T.StructType:
    facet_t = T.DoubleType() if numeric else T.StringType()
    fields = [
        T.StructField("case_id", T.IntegerType()),
        T.StructField("expect", T.BooleanType()),
        T.StructField("message", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
    for fc in FACETS:
        t = facet_t if (numeric and fc in ("b", "f")) else T.StringType()
        fields.append(T.StructField(fc, t))
    return T.StructType(fields)


def _row(case_id: int, expect: bool, ev: dict, numeric: bool) -> Row:
    facets = ev.get("facets", {})
    vals = {}
    for fc in FACETS:
        v = facets.get(fc)
        if numeric and fc in ("b", "f"):
            vals[fc] = float(v) if v is not None else None
        else:
            vals[fc] = str(v) if v is not None else None
    return Row(
        case_id=case_id,
        expect=expect,
        message=ev.get("message"),
        host=ev.get("host"),
        trace_id=ev.get("trace_id"),
        tags=ev.get("tags"),
        **vals,
    )


@pytest.mark.parametrize("numeric", [False, True])
def test_datadog_corpus(spark, numeric):
    group = [
        (i, c) for i, c in enumerate(CASES) if _numeric_case(c) == numeric
    ]
    if not group:
        pytest.skip("empty group")
    rows = []
    for i, (src, pass_ev, fail_ev) in group:
        if pass_ev is not None:
            rows.append(_row(i, True, pass_ev, numeric))
        if fail_ev is not None:
            rows.append(_row(i, False, fail_ev, numeric))
    df = spark.createDataFrame(rows, schema=_schema(numeric))
    schema = SearchSchema(
        default_cols=("message", "title"),
        numeric_fields=frozenset({"b", "f"}) if numeric else frozenset(),
    )
    sel = [df.case_id, df.expect]
    for i, (src, _, _) in group:
        sel.append(
            compile_datadog_search(src, schema).alias(f"q{i}")
        )
    out = df.select(*sel).collect()
    for r in out:
        i = r.case_id
        got = r[f"q{i}"]
        src = CASES[i][0]
        assert got == r.expect, (
            f"query {src!r}: expected {r.expect}, got {got} (case {i})"
        )


def test_condition_spec_integration(spark):
    from vector_spark.conditions import compile_condition

    df = spark.createDataFrame(
        [("payment failed", ["env:prod"]), ("ok", ["env:dev"])],
        "message string, tags array<string>",
    )
    cond = compile_condition(
        {"type": "datadog_search", "source": "failed env:prod"}
    )
    got = df.filter(cond).collect()
    assert len(got) == 1 and got[0].message == "payment failed"


def test_parse_errors():
    from vector_spark.datadog import parse_datadog_search

    with pytest.raises(ValueError):
        parse_datadog_search("(unbalanced")


@pytest.mark.parametrize("bad", ["host:", "NOT", "a AND", "-", "(", "b:>"])
def test_truncated_queries_raise_cleanly(bad):
    from vector_spark.datadog import parse_datadog_search

    with pytest.raises(ValueError):
        parse_datadog_search(bad)
