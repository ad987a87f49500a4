"""Condition compiler tests — mirrors check_fields.rs test cases and
conditions/vrl.rs truthiness."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.conditions import compile_check_fields, compile_vrl_lite


def _msgs(spark):
    return spark.createDataFrame(
        [
            ("test swimlane 1", 200, "10.0.1.7"),
            ("test swimlane 2", 404, "192.168.0.1"),
            ("other", 500, "8.8.8.8"),
        ],
        "message string, code int, ip string",
    )


def test_check_fields_eq_and(spark):
    df = _msgs(spark)
    cond = compile_check_fields({"message.eq": "test swimlane 1", "code.eq": 200})
    assert df.filter(cond).count() == 1


def test_check_fields_or_values(spark):
    df = _msgs(spark)
    cond = compile_check_fields({"message.eq": ["test swimlane 1", "test swimlane 2"]})
    assert df.filter(cond).count() == 2


def test_check_fields_not_contains(spark):
    df = _msgs(spark)
    cond = compile_check_fields({"message.not_contains": "swimlane"})
    assert df.filter(cond).count() == 1


def test_check_fields_regex_exists_length(spark):
    df = _msgs(spark)
    assert df.filter(compile_check_fields({"message.regex": r"swimlane \d"})).count() == 2
    assert df.filter(compile_check_fields({"message.exists": True})).count() == 3
    assert df.filter(compile_check_fields({"message.length_eq": 5})).count() == 1


def test_check_fields_cidr(spark):
    df = _msgs(spark)
    cond = compile_check_fields({"ip.ip_cidr_contains": "10.0.0.0/8"})
    rows = df.filter(cond).collect()
    assert [r.ip for r in rows] == ["10.0.1.7"]


def test_vrl_lite_basic(spark):
    df = _msgs(spark)
    assert df.filter(compile_vrl_lite('.message == "other"')).count() == 1
    assert df.filter(compile_vrl_lite(".code >= 400 && .code < 500")).count() == 1
    assert df.filter(compile_vrl_lite('contains(.message, "swim") || .code == 500')).count() == 3
    assert df.filter(compile_vrl_lite('!starts_with(.message, "test")')).count() == 1


def test_vrl_lite_arith_and_funcs(spark):
    df = _msgs(spark)
    out = df.select(compile_vrl_lite(".code * 2 + 1").alias("x")).collect()
    assert sorted(r.x for r in out) == [401, 809, 1001]
    out = df.select(compile_vrl_lite("upcase(.message)").alias("u")).first()
    assert out.u == "TEST SWIMLANE 1"


def test_vrl_lite_coalesce(spark):
    df = spark.createDataFrame([(None, "b")], "a string, b string")
    assert df.select(compile_vrl_lite(".a ?? .b").alias("x")).first().x == "b"


def test_vrl_parse_timestamp_strftime(spark):
    from vector_spark.conditions import compile_vrl_lite

    df = spark.createDataFrame([("2020-02-20 12:34:56",), ("garbage",)], "t string")
    out = df.select(
        compile_vrl_lite('to_unix_timestamp(parse_timestamp(.t, "%Y-%m-%d %H:%M:%S"))').alias("u")
    ).collect()
    assert out[0].u == 1582202096
    assert out[1].u is None  # malformed → per-event null, no abort


def test_vrl_bang_calls_and_type_guards(spark):
    """Vector-docs remap lines compile verbatim: fn!(...) fallible
    markers and string!/int!/float!/bool! type guards (casts here;
    mismatch = per-event null)."""
    from vector_spark.conditions import compile_vrl_lite

    df = spark.createDataFrame([(7, "x", "2.5", "yes")], "n int, s string, f string, b string")
    r = df.select(
        compile_vrl_lite('upcase(string!(.s))').alias("a"),
        compile_vrl_lite('int!(.f)').alias("i"),
        compile_vrl_lite('float!(.f) * 2').alias("fl"),
        compile_vrl_lite('string(.n)').alias("ns"),
        compile_vrl_lite('assert_eq(.n, 7)').alias("ae"),
        compile_vrl_lite('log(.s)').alias("lg"),
    ).first()
    assert r.a == "X" and r.i == 2 and r.fl == 5.0
    assert r.ns == "7" and r.ae is True and r.lg == "x"
    # mismatch: int!("x") is a per-event null, not a job abort
    bad = df.select(compile_vrl_lite('int!(.s)').alias("v")).first()
    assert bad.v is None
