"""Structured Streaming ops driven synchronously via parquet source +
memory/foreachBatch sinks (counts pinned, not wall-clock —
SURVEY.md §2.6 divergence note)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_spark.streaming import (
    stream_aggregate,
    stream_dedupe,
    stream_reduce_sessions,
    stream_route_writer,
)


@pytest.fixture()
def stream_input(spark):
    tmp = tempfile.mkdtemp(prefix="vs_stream_")
    rows = [
        (1, "a", 1.0, "2024-01-01 00:00:01"),
        (2, "a", 2.0, "2024-01-01 00:00:05"),
        (3, "b", 3.0, "2024-01-01 00:00:07"),
        (4, "a", 4.0, "2024-01-01 00:05:00"),  # new window/session
        (5, "b", 3.0, "2024-01-01 00:00:07"),  # dup key (k,ts)
    ]
    df = spark.createDataFrame(rows, "id long, k string, v double, ts_s string").withColumn(
        "ts", F.to_timestamp("ts_s")
    ).drop("ts_s")
    df.write.parquet(f"{tmp}/in")
    schema = spark.read.parquet(f"{tmp}/in").schema
    stream = spark.readStream.schema(schema).parquet(f"{tmp}/in")
    yield stream, tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _run_to_memory(spark, df, name, mode="append"):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"select * from {name}")


def test_stream_aggregate_tumbling(spark, stream_input):
    stream, _ = stream_input
    agg = stream_aggregate(
        stream, "ts", "1 minute", ["k"], {"v": "sum", "id": "count"}
    )
    # complete mode: append only emits after the watermark passes a
    # window, which a single static micro-batch never triggers
    out = _run_to_memory(spark, agg, "agg_out", mode="complete")
    rows = {(r.k, str(r.window.start)): (r.v_sum, r.id_count) for r in out.collect()}
    assert rows[("a", "2024-01-01 00:00:00")] == (3.0, 2)
    assert rows[("b", "2024-01-01 00:00:00")] == (6.0, 2)
    assert rows[("a", "2024-01-01 00:05:00")] == (4.0, 1)


def test_stream_dedupe(spark, stream_input):
    stream, _ = stream_input
    out = _run_to_memory(spark, stream_dedupe(stream, ["k", "ts"], "ts"), "dd_out")
    assert out.count() == 4  # row 5 is a (k, ts) duplicate of row 3


def test_stream_reduce_sessions(spark, stream_input):
    stream, _ = stream_input
    red = stream_reduce_sessions(
        stream, "ts", "1 minute", ["k"], {"v": "sum", "id": "count"}
    )
    out = _run_to_memory(spark, red, "sess_out", mode="complete")
    a_sessions = [r for r in out.collect() if r.k == "a"]
    assert len(a_sessions) == 2  # 00:00 run and 00:05 singleton


def test_stream_route_writer(spark, stream_input):
    stream, tmp = stream_input
    writer = stream_route_writer(
        stream,
        routes={"ka": '.k == "a"', "big": ".v >= 3.0"},
        sink_paths={"ka": f"{tmp}/ka", "big": f"{tmp}/big"},
        checkpoint_dir=f"{tmp}/ckpt",
    )
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    ka = spark.read.parquet(f"{tmp}/ka")
    big = spark.read.parquet(f"{tmp}/big")
    assert {r.id for r in ka.collect()} == {1, 2, 4}
    assert {r.id for r in big.collect()} == {3, 4, 5}  # non-exclusive lanes


def test_stream_reduce_ends_when_stateful(spark, stream_input):
    """applyInPandasWithState: closing event flushes the group;
    unclosed groups stay buffered (reduce.rs ends_when semantics)."""
    from vector_spark.streaming.ops import stream_reduce_ends_when

    stream, tmp = stream_input
    # rows: k=a ids 1,2(v=2.0),4 ; k=b ids 3,5. Close when v >= 2.0.
    out = stream_reduce_ends_when(
        stream,
        group_by=["k"],
        ends_when=".v >= 2.0",
        concat_field="id",
        order_col="id",
        joiner=",",
    )
    q = (
        out.writeStream.format("memory").queryName("srew").outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {(r.k, r.merged): r.n_events for r in spark.sql("select * from srew").collect()}
    # a: 1 then 2 (v=2.0 closes) -> "1,2"; 4 (v=4 closes) -> "4"
    assert rows[("a", "1,2")] == 2
    assert rows[("a", "4")] == 1
    # b: 3 (v=3 closes) -> "3"; 5 (v=3 closes) -> "5"
    assert ("b", "3") in rows and ("b", "5") in rows


def test_stream_enrich_broadcast_per_batch(spark, stream_input):
    """Stream-static enrichment: every micro-batch row joins the
    static dim (broadcast); misses flagged, not dropped."""
    from vector_spark.streaming import stream_enrich

    stream, tmp = stream_input
    dim = spark.createDataFrame([("a", "alpha")], "k string, label string")
    out = stream_enrich(stream, dim, on="k", miss_flag_field="_miss")
    got = _run_to_memory(spark, out, "enriched")
    rows = {(r.id, r.label, r._miss) for r in got.collect()}
    assert (1, "alpha", False) in rows
    assert (3, None, True) in rows  # k='b' miss kept + flagged
    assert got.count() == 5


def test_stream_chunk_tokens_carries_tail_across_batches(spark, tmp_path):
    """Stateful concat-and-chunk: full blocks emit per batch, the
    partial tail persists in state and completes in a later
    micro-batch (maxFilesPerTrigger=1 → one file per batch)."""
    import time

    from vector_spark.streaming.ops import stream_chunk_tokens

    d = str(tmp_path / "in")
    schema = "src string, seq long, tokens array<int>"
    # batch 1: 5 + 4 = 9 tokens -> blocks [1..4],[5..8], carry [9]
    spark.createDataFrame(
        [("s", 1, [1, 2, 3, 4, 5]), ("s", 2, [6, 7, 8, 9])], schema
    ).coalesce(1).write.parquet(d, mode="append")
    time.sleep(1.1)  # file-source ordering is by modification time
    # batch 2: 7 tokens -> carry+7 = 8 -> blocks [9..12],[13..16]
    spark.createDataFrame(
        [("s", 3, [10, 11, 12, 13, 14, 15, 16])], schema
    ).coalesce(1).write.parquet(d, mode="append")

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = stream_chunk_tokens(
        stream, 4, stream_cols=["src"], order_col="seq"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("chunks")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r.block: list(r.tokens)
        for r in spark.sql("select * from chunks").collect()
    }
    assert rows == {
        0: [1, 2, 3, 4],
        1: [5, 6, 7, 8],
        2: [9, 10, 11, 12],
        3: [13, 14, 15, 16],
    }


def test_stream_reduce_ends_when_state_survives_batches(spark, tmp_path):
    """Regression: GroupState.get is a PROPERTY in pyspark>=4 — the
    old `state.get()` call only explodes when a group stays open
    ACROSS micro-batches, which the single-batch test never hit."""
    import time

    from vector_spark.streaming.ops import stream_reduce_ends_when

    d = str(tmp_path / "in")
    schema = "k string, id long, v double"
    spark.createDataFrame([("a", 1, 0.0), ("a", 2, 0.0)], schema) \
        .coalesce(1).write.parquet(d, mode="append")
    time.sleep(1.1)
    spark.createDataFrame([("a", 3, 9.0)], schema) \
        .coalesce(1).write.parquet(d, mode="append")

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = stream_reduce_ends_when(
        stream, group_by=["k"], ends_when=".v >= 2.0",
        concat_field="id", order_col="id", joiner=",",
    )
    q = (
        out.writeStream.format("memory").queryName("srew2")
        .outputMode("append").start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {(r.k, r.merged): r.n_events
            for r in spark.sql("select * from srew2").collect()}
    # ids 1,2 buffered in batch 1; id 3 (v=9) closes in batch 2
    assert rows == {("a", "1,2,3"): 3}


def test_stream_chunk_tokens_idle_flush(spark, tmp_path):
    """flush_after_ms: an idle stream key's partial tail emits as a
    short block and its state is removed. ProcessingTimeTimeout means
    the engine runs timer batches even with no new data — so the test
    runs an always-on query with a real trigger interval and polls the
    sink (an availableNow run never terminates under active timers,
    and the default ASAP trigger busy-loops)."""
    import time

    from vector_spark.streaming.ops import stream_chunk_tokens

    d = str(tmp_path / "in")
    schema = "src string, seq long, tokens array<int>"
    # key s: 5 tokens at block 4 -> one full block + tail [5]
    spark.createDataFrame([("s", 1, [1, 2, 3, 4, 5])], schema) \
        .coalesce(1).write.parquet(d, mode="append")

    stream = spark.readStream.schema(schema).parquet(d)
    out = stream_chunk_tokens(
        stream, 4, stream_cols=["src"], order_col="seq",
        flush_after_ms=1500,
    )
    q = (
        out.writeStream.format("memory").queryName("cflush")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds").start()
    )
    try:
        deadline = time.time() + 90
        rows = {}
        while time.time() < deadline:
            rows = {
                (r.src, r.block): (list(r.tokens), r.n_tok)
                for r in spark.sql("select * from cflush").collect()
            }
            if ("s", 1) in rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert rows.get(("s", 0)) == ([1, 2, 3, 4], 4)
    # the idle tail flushed via a no-data timer batch
    assert rows.get(("s", 1)) == ([5], 1)


def test_stream_chunk_tokens_nonstring_key(spark, tmp_path):
    """ADVICE r4: the output schema must derive stream-key dtypes from
    the source schema — a bigint key previously came out mistyped
    (hardcoded string)."""
    from vector_spark.streaming.ops import stream_chunk_tokens

    d = str(tmp_path / "in")
    schema = "src long, seq long, tokens array<int>"
    spark.createDataFrame(
        [(7, 1, [1, 2, 3, 4, 5])], schema
    ).coalesce(1).write.parquet(d, mode="append")
    stream = spark.readStream.schema(schema).parquet(d)
    out = stream_chunk_tokens(stream, 4, stream_cols=["src"], order_col="seq")
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema)[
        "src"
    ] == "bigint"
    q = (
        out.writeStream.format("memory")
        .queryName("chunks_intkey")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from chunks_intkey").collect()
    assert rows and rows[0].src == 7 and list(rows[0].tokens) == [1, 2, 3, 4]
