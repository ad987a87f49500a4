"""reduce / merge / enrich tests — reduce/mod.rs tests +
tests/behavior/transforms/reduce.toml shapes; geoip.rs broadcast-join
analogue."""

from __future__ import annotations

from vector_spark.fixtures import enrich_sources
from vector_spark.operators import enrich, merge_partial, reduce_events


def test_reduce_merge_strategies(spark):
    rows = [
        ("req1", 1, "first", 10),
        ("req1", 2, "second", 20),
        ("req1", 3, "third", 5),
        ("req2", 1, "only", 7),
    ]
    df = spark.createDataFrame(rows, "request_id string, ts int, message string, counter int")
    out = reduce_events(
        df,
        group_by=["request_id"],
        merge_strategies={"counter": "sum", "message": "concat"},
        order_by="ts",
    )
    got = {r.request_id: (r.counter, r.message, r.ts) for r in out.collect()}
    assert got["req1"] == (35, "first second third", 1)
    assert got["req2"] == (7, "only", 1)


def test_reduce_array_and_defaults(spark):
    rows = [("g", 1, "a", 5), ("g", 2, "b", 6)]
    df = spark.createDataFrame(rows, "k string, ts int, v string, n int")
    out = reduce_events(df, ["k"], {"v": "array", "n": "max"}, order_by="ts")
    r = out.first()
    assert r.v == ["a", "b"] and r.n == 6


def test_reduce_ends_when_sessionizes(spark):
    # a row matching ends_when CLOSES its session (inclusive)
    rows = [
        ("r", 1, "start", False),
        ("r", 2, "mid", False),
        ("r", 3, "end", True),
        ("r", 4, "next1", False),
        ("r", 5, "end2", True),
    ]
    df = spark.createDataFrame(rows, "k string, ts int, message string, done boolean")
    out = reduce_events(
        df, ["k"], {"message": "concat"}, ends_when=".done == true", order_by="ts"
    )
    msgs = sorted(r.message for r in out.collect())
    assert msgs == ["next1 end2", "start mid end"] or msgs == sorted(
        ["start mid end", "next1 end2"]
    )
    assert out.count() == 2


def test_merge_partial_folding(spark):
    # merge.rs: partials concatenate onto the next non-partial
    rows = [
        ("s1", 1, "hel", True),
        ("s1", 2, "lo ", True),
        ("s1", 3, "world", False),
        ("s1", 4, "solo", False),
        ("s2", 1, "other", False),
    ]
    df = spark.createDataFrame(rows, "stream string, ts int, message string, _partial boolean")
    out = merge_partial(df, fields=["message"], discriminant=["stream"], order_by="ts")
    msgs = sorted(r.message for r in out.collect())
    assert msgs == ["hello world", "other", "solo"]


def test_merge_trailing_partials_dropped(spark):
    rows = [("s", 1, "a", False), ("s", 2, "dangling", True)]
    df = spark.createDataFrame(rows, "stream string, ts int, message string, _partial boolean")
    out = merge_partial(df, fields=["message"], discriminant=["stream"], order_by="ts")
    assert [r.message for r in out.collect()] == ["a"]


def test_enrich_broadcast_join(spark):
    dim = enrich_sources(spark)
    df = spark.createDataFrame(
        [("d1", "web-frontend"), ("d2", "src-03"), ("d3", "unknown-src")],
        "doc_id string, source string",
    )
    out = enrich(df, dim, on="source", miss_flag_field="enrich_miss")
    rows = {r.doc_id: (r.team, r.enrich_miss) for r in out.collect()}
    assert rows["d1"] == ("edge", False)
    assert rows["d2"][0] is not None and rows["d2"][1] is False
    assert rows["d3"] == (None, True)
    # physical plan must be a broadcast join (no shuffle of the fact side)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_enrich_prefix(spark):
    dim = enrich_sources(spark)
    df = spark.createDataFrame([("web-frontend",)], "source string")
    out = enrich(df, dim, on="source", prefix="src_")
    assert "src_team" in out.columns


def test_reduce_expire_gap_sessions(spark):
    # staleness sessionization: gap > expire_gap opens a new session
    rows = [
        ("u", 100, "a"),
        ("u", 105, "b"),
        ("u", 200, "c"),   # gap 95 > 30 -> new session
        ("u", 210, "d"),
        ("v", 100, "x"),
    ]
    df = spark.createDataFrame(rows, "k string, ts int, message string")
    from vector_spark.operators import reduce_events

    out = reduce_events(
        df, ["k"], {"message": "concat"}, order_by="ts", expire_gap=30
    )
    got = {(r.k, r.ts): r.message for r in out.collect()}
    assert got == {("u", 100): "a b", ("u", 200): "c d", ("v", 100): "x"}
