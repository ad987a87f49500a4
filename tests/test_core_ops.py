"""filter / route / sample / dedupe — semantics pinned against the
reference tests (route.rs:153-207, sample.rs:161-235, dedupe.rs:208-474,
tests/behavior/transforms/route.toml)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.operators import dedupe, filter_events, route_flags, route_split, sample


def _lanes_df(spark):
    return spark.createDataFrame(
        [("test swimlane 1",), ("test swimlane 2",), ("other",)], "message string"
    )


def test_filter_condition_string(spark):
    df = _lanes_df(spark)
    out = filter_events(df, 'contains(.message, "swimlane")')
    assert out.count() == 2


def test_filter_null_is_false(spark):
    df = spark.createDataFrame([(None,), ("x",)], "a string")
    assert filter_events(df, '.a == "x"').count() == 1


def test_route_non_exclusive_lanes(spark):
    # route.toml behavior: an event goes to EVERY matching lane
    df = _lanes_df(spark)
    routes = {
        "first": '.message == "test swimlane 1"',
        "second": '.message == "test swimlane 2"',
        "all_tests": 'starts_with(.message, "test")',
    }
    lanes = route_split(df, routes)
    assert [r.message for r in lanes["first"].collect()] == ["test swimlane 1"]
    assert [r.message for r in lanes["second"].collect()] == ["test swimlane 2"]
    assert lanes["all_tests"].count() == 2  # duplicated across lanes
    # discarded event ("other") is in no lane
    total = sum(lanes[k].count() for k in lanes)
    assert total == 4


def test_route_flags_columns(spark):
    df = _lanes_df(spark)
    flagged = route_flags(df, {"x": 'contains(.message, "1")'})
    rows = {r.message: r["_route_x"] for r in flagged.collect()}
    assert rows == {"test swimlane 1": True, "test swimlane 2": False, "other": False}


def test_sample_deterministic_and_rate(spark):
    # sample.rs:161-235 — hash sampling: within ±50% of ideal rate,
    # identical across runs
    n = 10_000
    df = spark.range(n).select(F.concat(F.lit("msg-"), F.col("id")).alias("message"))
    for rate in (2, 10, 25):
        out1 = sample(df, rate, key_field="message")
        out2 = sample(df, rate, key_field="message")
        c1 = out1.count()
        ideal = n / rate
        assert ideal * 0.5 <= c1 <= ideal * 1.5, f"rate {rate}: {c1} vs ideal {ideal}"
        s1 = {r.message for r in out1.collect()}
        s2 = {r.message for r in out2.collect()}
        assert s1 == s2  # determinism
    out = sample(df, 10, key_field="message")
    assert all(r.sample_rate == 10 for r in out.collect())


def test_sample_exclude_bypasses(spark):
    df = spark.createDataFrame(
        [("keep always",), ("normal 1",), ("normal 2",)], "message string"
    )
    out = sample(df, 1_000_000, key_field="message", exclude='contains(.message, "always")')
    rows = out.collect()
    kept = [r for r in rows if r.message == "keep always"]
    assert len(kept) == 1
    # excluded rows pass WITHOUT sample_rate (null)
    assert kept[0].sample_rate is None


def test_sample_counter_mode(spark):
    df = spark.range(100).select(F.col("id"))
    out = sample(df, 10, order_field="id")
    assert out.count() == 10


def test_dedupe_match_fields(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")], "ord int, k string, payload string"
    )
    out = dedupe(df, match=["k"], order_by=["ord"])
    rows = {(r.k, r.payload) for r in out.collect()}
    assert rows == {("a", "x"), ("b", "z")}  # first by ord wins


def test_dedupe_ignore_fields(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "a", "y")], "ord int, k string, payload string"
    )
    out = dedupe(df, ignore=["ord"], order_by=["ord"])
    assert out.count() == 2


def test_dedupe_type_distinction(spark):
    # dedupe.rs:208-474 — "123" (string) vs 123 (int) must NOT dedupe;
    # Spark columns are typed so the two live in different columns —
    # verify a stringified int doesn't collide with a real int key.
    df = spark.createDataFrame(
        [(1, "123", None), (2, None, 123)],
        "ord int, k_str string, k_int int",
    )
    out = dedupe(df, match=["k_str", "k_int"], order_by=["ord"])
    assert out.count() == 2
