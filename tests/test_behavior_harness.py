"""Config-driven behavior tests — the port of `vector test`
(src/config/unit_test.rs, tests/behavior/transforms/*.toml shapes).
The TOML below is OUR corpus written in the reference's format (lane
membership, downstream composition, no_outputs_from), not copied data.
"""

from __future__ import annotations

import pytest

from vector_spark.plans.config import load_pipeline, load_pipeline_config, parse_remap_source
from vector_spark.testing import run_behavior_file, run_behavior_test

ROUTE_BEHAVIOR_TOML = '''
[transforms.stamp]
type = "add_fields"
inputs = ["in"]
[transforms.stamp.fields]
app = "behavior"

[transforms.router]
type = "route"
inputs = ["stamp"]
[transforms.router.route]
first = '.message == "test swimlane 1"'
second = '.message == "test swimlane 2"'
starts = 'starts_with(.message, "test")'

[transforms.tag_first]
type = "add_fields"
inputs = ["router.first"]
[transforms.tag_first.fields]
lane = "first"

[[tests]]
name = "lane membership and downstream composition"
input_schema = "message string"
[[tests.input_rows]]
message = "test swimlane 1"
[[tests.input_rows]]
message = "test swimlane 2"
[[tests.input_rows]]
message = "other"

[[tests.outputs]]
extract_from = "router.first"
expect_rows = 1
conditions = ['.message == "test swimlane 1"', '.app == "behavior"']

[[tests.outputs]]
extract_from = "router.starts"
expect_rows = 2

[[tests.outputs]]
extract_from = "tag_first"
expect_rows = 1
conditions = ['.lane == "first"']

[[tests]]
name = "no outputs from unmatched lane"
input_schema = "message string"
[[tests.input_rows]]
message = "nothing matches me"
no_outputs_from = ["router.first", "router.second", "router.starts"]
'''


def test_route_behavior_file(spark):
    results = run_behavior_file(spark, ROUTE_BEHAVIOR_TOML)
    assert len(results) == 2
    for r in results:
        assert r.passed, r.failures


PARSE_PIPELINE_TOML = '''
[transforms.parse]
type = "remap"
inputs = ["in"]
source = """
# derive fields with VRL-lite
.loud = upcase(.message)
.n2 = .n * 2
"""

[transforms.keep]
type = "filter"
inputs = ["parse"]
condition = ".n2 >= 4"

[sinks.out]
inputs = ["keep"]
'''


def test_toml_remap_filter_pipeline(spark):
    pipe = load_pipeline(PARSE_PIPELINE_TOML)
    df = spark.createDataFrame([("a", 1), ("b", 2), ("c", 3)], "message string, n int")
    res = pipe.run(df, write=False)
    rows = {(r.message, r.loud, r.n2) for r in res.lanes["out"].collect()}
    assert rows == {("b", "B", 4), ("c", "C", 6)}
    assert res.telemetry["keep_discarded_total"] == 1
    res.frame.unpersist()


def test_parse_remap_source():
    assigns = parse_remap_source(
        """
        # comment
        .a = upcase(.x)
        .b = .n + 1
        """
    )
    assert assigns == [(".a", "upcase(.x)"), (".b", ".n + 1")]


def test_check_fields_condition_in_config(spark):
    cfg = load_pipeline_config(
        '''
[transforms.keep]
type = "filter"
inputs = ["in"]
[transforms.keep.condition]
type = "check_fields"
"message.prefix" = "test"
"code.eq" = 200

[sinks.out]
inputs = ["keep"]
'''
    )
    test = {
        "name": "check_fields filter",
        "input_schema": "message string, code int",
        "input_rows": [
            {"message": "test ok", "code": 200},
            {"message": "test bad", "code": 500},
            {"message": "other", "code": 200},
        ],
        "outputs": [
            {"extract_from": "keep", "expect_rows": 1, "conditions": ['.message == "test ok"']}
        ],
    }
    r = run_behavior_test(spark, cfg, test)
    assert r.passed, r.failures


def test_swimlanes_alias(spark):
    cfg = load_pipeline_config(
        '''
[transforms.lanes]
type = "swimlanes"
inputs = ["in"]
[transforms.lanes.lanes]
errors = '.level == "error"'

[sinks.out]
inputs = ["lanes.errors"]
'''
    )
    test = {
        "input_schema": "level string",
        "input_rows": [{"level": "error"}, {"level": "info"}],
        "outputs": [{"extract_from": "lanes.errors", "expect_rows": 1}],
    }
    assert run_behavior_test(spark, cfg, test).passed


SAMPLE_BEHAVIOR_TOML = '''
[transforms.sampler]
type = "sample"
inputs = ["in"]
rate = 2
key_field = "message"
exclude = 'contains(.message, "keep")'

[sinks.out]
inputs = ["sampler"]

[[tests]]
name = "exclude bypasses sampling"
input_schema = "message string"
[[tests.input_rows]]
message = "keep me always 1"
[[tests.input_rows]]
message = "keep me always 2"
[[tests.outputs]]
extract_from = "sampler"
expect_rows = 2
conditions = ['contains(.message, "keep")']
'''


def test_sample_behavior(spark):
    results = run_behavior_file(spark, SAMPLE_BEHAVIOR_TOML)
    assert all(r.passed for r in results), [r.failures for r in results]


PARSER_CHAIN_TOML = '''
[transforms.parse]
type = "grok_parser"
inputs = ["in"]
pattern = "%{WORD:verb} %{NOTSPACE:path} %{NUMBER:code}"
[transforms.parse.types]
code = "int"

[transforms.enrich_status]
type = "remap"
inputs = ["parse"]
source = """
.ok = .code < 400
"""

[transforms.only_errors]
type = "filter"
inputs = ["enrich_status"]
condition = ".ok == false"

[sinks.out]
inputs = ["only_errors"]

[[tests]]
name = "grok -> remap -> filter chain"
input_schema = "message string"
[[tests.input_rows]]
message = "GET /ok 200"
[[tests.input_rows]]
message = "POST /broken 503"
[[tests.outputs]]
extract_from = "only_errors"
expect_rows = 1
conditions = ['.path == "/broken"', '.code == 503', '.verb == "POST"']
'''


def test_parser_chain_behavior(spark):
    results = run_behavior_file(spark, PARSER_CHAIN_TOML)
    assert all(r.passed for r in results), [r.failures for r in results]


DEDUPE_REDUCE_TOML = '''
[transforms.dd]
type = "dedupe"
inputs = ["in"]
match = ["k"]
order_by = ["ord"]

[transforms.collapse]
type = "reduce"
inputs = ["dd"]
group_by = ["grp"]
order_by = "ord"
[transforms.collapse.merge_strategies]
n = "sum"
k = "concat"

[sinks.out]
inputs = ["collapse"]

[[tests]]
name = "dedupe then reduce"
input_schema = "grp string, k string, n int, ord int"
[[tests.input_rows]]
grp = "g"
k = "a"
n = 1
ord = 1
[[tests.input_rows]]
grp = "g"
k = "a"
n = 100
ord = 2
[[tests.input_rows]]
grp = "g"
k = "b"
n = 2
ord = 3
[[tests.outputs]]
extract_from = "collapse"
expect_rows = 1
conditions = ['.n == 3', '.k == "a b"']
'''


def test_dedupe_reduce_behavior(spark):
    results = run_behavior_file(spark, DEDUPE_REDUCE_TOML)
    assert all(r.passed for r in results), [r.failures for r in results]


DEL_ONLY_TOML = '''
[transforms.scrub]
type = "remap"
inputs = ["in"]
source = """
.masked = upcase(.secret)
del(.secret)
"""

[sinks.out]
inputs = ["scrub"]

[[tests]]
name = "del removes the column"
input_schema = "id int, secret string, keep string"
[[tests.input_rows]]
id = 1
secret = "abc"
keep = "k"
[[tests.outputs]]
extract_from = "scrub"
expect_rows = 1
conditions = ['.masked == "ABC"', '.keep == "k"']
absent_fields = ["secret"]
'''


def test_remap_del_statement(spark):
    results = run_behavior_file(spark, DEL_ONLY_TOML)
    assert all(r.passed for r in results), [r.failures for r in results]


def test_remap_only_fields(spark):
    from vector_spark.plans.config import parse_remap_source
    from vector_spark.operators.remap import remap

    stmts = parse_remap_source(
        """
        .b = .a * 2
        only_fields(.id, .b)
        """
    )
    df = spark.createDataFrame([(1, 10, "drop-me")], "id int, a int, x string")
    out = remap(df, stmts)
    assert out.columns == ["id", "b"]
    assert out.first().b == 20
