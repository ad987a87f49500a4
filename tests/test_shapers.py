"""Shaper transforms — add/remove/rename_fields, concat,
ansi_stripper, coercer (reference tests in the respective files)."""

from __future__ import annotations

from vector_spark.operators import (
    add_fields,
    ansi_stripper,
    coercer,
    concat_fields,
    remove_fields,
    rename_fields,
)
from vector_spark.operators.remap import explode_events, remap


def test_add_fields_literal_and_template(spark):
    df = spark.createDataFrame([("post", "200")], "method string, code string")
    out = add_fields(
        df, {"static": "val", "combined": "{{method}}-{{code}}", "num": 7}
    )
    r = out.first()
    assert r.static == "val" and r.combined == "post-200" and r.num == 7


def test_add_fields_no_overwrite(spark):
    df = spark.createDataFrame([("keep",)], "a string")
    out = add_fields(df, {"a": "new"}, overwrite=False)
    assert out.first().a == "keep"


def test_remove_rename(spark):
    df = spark.createDataFrame([(1, 2)], "a int, b int")
    assert remove_fields(df, ["b", "nonexistent"]).columns == ["a"]
    assert rename_fields(df, {"a": "x"}).columns == ["x", "b"]


def test_concat_substrings(spark):
    # concat.rs test shape: field[start..end]
    df = spark.createDataFrame([("hello", "world")], "first string, second string")
    out = concat_fields(df, "out", ["first[0..3]", "second"], joiner="_")
    assert out.first().out == "hel_world"


def test_ansi_stripper(spark):
    df = spark.createDataFrame([("\x1b[31mred\x1b[0m text",)], "message string")
    assert ansi_stripper(df).first().message == "red text"


def test_coercer_types_and_drop_unspecified(spark):
    df = spark.createDataFrame(
        [("42", "3.5", "true", "extra")], "i string, f string, b string, junk string"
    )
    out = coercer(
        df, {"i": "int", "f": "float", "b": "bool"}, drop_unspecified=True
    )
    r = out.first()
    assert (r.i, r.f, r.b) == (42, 3.5, True)
    assert out.columns == ["i", "f", "b"]


def test_coercer_timestamp_format(spark):
    df = spark.createDataFrame([("2020-03-05 11:12:13",)], "t string")
    out = coercer(df, {"t": "timestamp|%Y-%m-%d %H:%M:%S"})
    assert str(out.first().t) == "2020-03-05 11:12:13"


def test_remap_program(spark):
    df = spark.createDataFrame([("post", 200)], "method string, code int")
    out = remap(
        df,
        [
            (".method_up", "upcase(.method)"),
            (".is_ok", ".code >= 200 && .code < 300"),
            (".double", ".code * 2"),
        ],
    )
    r = out.first()
    assert r.method_up == "POST" and r.is_ok is True and r.double == 400


def test_remap_abort_rollback(spark):
    # remap.rs:77-127 — aborted events pass through UNMODIFIED
    df = spark.createDataFrame([(1,), (2,)], "v int")
    out = remap(df, [(".v", ".v * 10")], abort_when=".v == 2")
    vals = sorted(r.v for r in out.collect())
    assert vals == [2, 10]


def test_remap_drop_on_abort(spark):
    df = spark.createDataFrame([(1,), (2,)], "v int")
    out = remap(df, [(".v", ".v * 10")], abort_when=".v == 2", drop_on_abort=True)
    assert [r.v for r in out.collect()] == [10]


def test_explode_events(spark):
    df = spark.createDataFrame([("a", [1, 2, 3])], "k string, arr array<int>")
    out = explode_events(df, "arr", target="v")
    assert sorted(r.v for r in out.collect()) == [1, 2, 3]


def test_concat_negative_end_slice(spark):
    """Review r2: negative END counts from the end of the string
    ('field[0..-1]' = all but last char) — previously produced ''."""
    from vector_spark.operators.shapers import concat_fields

    df = spark.createDataFrame([("hello", "world")], "a string, b string")
    out = concat_fields(df, target="t", items=["a[0..-1]", "b[1..-2]"])
    # "hello"[0..-1] = "hell" (all but last); "world"[1..-2] = "or"
    assert out.first().t == "hell or"


def test_coercer_int_exact_above_2pow53(spark):
    """ADVICE r2: 18-digit snowflake ids must parse exactly — a
    double round-trip would corrupt integers above 2^53. Float-looking
    strings still truncate through the double fallback
    (conversion.rs:121-126 strict-i64-first semantics)."""
    df = spark.createDataFrame(
        [("823563440601616987", "3.9", "nope")], "id string, f string, bad string"
    )
    out = coercer(df, {"id": "int", "f": "int", "bad": "int"})
    r = out.first()
    assert r.id == 823563440601616987
    assert r.f == 3 and r.bad is None


def test_add_fields_nested_merges_existing_struct(spark):
    """ADVICE r4: a dotted path landing on an existing struct root
    must INSERT at the path (add_fields.rs:104), preserving sibling
    fields — not rebuild the root from the literal alone — and
    overwrite=False must keep an existing non-null leaf."""
    from pyspark.sql import functions as F

    from vector_spark.operators.shapers import add_fields

    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "x", F.struct(F.lit(7).alias("a"))
    )
    r = add_fields(df, {"x.y": 456}).select("x").first().x
    assert r.a == 7 and r.y == 456  # sibling survives
    r = add_fields(df, {"x.a": 99}, overwrite=False).select("x").first().x
    assert r.a == 7  # keep-existing applies to nested leaves
    r = add_fields(df, {"x.a": 99}).select("x").first().x
    assert r.a == 99
    r = add_fields(df, {"x.b.c": 1}).select("x").first().x
    assert r.a == 7 and r.b.c == 1  # deep path builds missing levels
    # null leaf + overwrite=False → insert (reference skips only
    # when the path resolves to a value)
    dfn = spark.createDataFrame([(1,)], "id int").withColumn(
        "x", F.struct(F.lit(None).cast("int").alias("a"))
    )
    assert add_fields(dfn, {"x.a": 9}, overwrite=False).first().x.a == 9
