"""Structured Streaming variants of the stateful (Task) transforms.

Vector's streaming semantics are processing-time based (SURVEY.md
§2.6): aggregate flushes every interval_ms (tumbling), reduce expires
groups after expire_after_ms of staleness (session), dedupe holds an
LRU of 5000 keys. Here the event-time equivalents:

| Vector                        | this module                         |
|-------------------------------|-------------------------------------|
| aggregate.interval_ms         | tumbling window + watermark         |
| reduce.expire_after_ms        | session_window(ts, gap)             |
| dedupe LRU(5000)              | dropDuplicates + watermark (TTL)    |
| route fan-out to sinks        | foreachBatch multi-write            |

Divergence (documented, SURVEY.md §7): Vector measures staleness in
processing time; we use event-time + watermark, which is strictly
better behaved under replay/backfill. Tests pin counts, not wall
clock.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.conditions import compile_condition
from vector_spark.operators.core import ROUTE_COL_PREFIX, route_flags


def stream_aggregate(
    stream: DataFrame,
    ts_col: str,
    interval: str,
    group_by: list[str],
    aggs: dict[str, str],
    watermark: str = "10 seconds",
) -> DataFrame:
    """Tumbling-window aggregate (aggregate.rs:18-130 interval flush).

    ``aggs``: column -> strategy (sum|max|min|count|last). ``last``
    approximates Absolute-kind last-write via max_by(ts)."""
    exprs: list[Column] = []
    for col, how in aggs.items():
        if how == "sum":
            exprs.append(F.sum(col).alias(f"{col}_sum"))
        elif how == "max":
            exprs.append(F.max(col).alias(f"{col}_max"))
        elif how == "min":
            exprs.append(F.min(col).alias(f"{col}_min"))
        elif how == "count":
            exprs.append(F.count(col).alias(f"{col}_count"))
        elif how == "last":
            exprs.append(F.max_by(col, ts_col).alias(f"{col}_last"))
        else:
            raise ValueError(f"unknown agg {how!r}")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, interval).alias("window"), *group_by)
        .agg(*exprs)
    )


def stream_dedupe(
    stream: DataFrame, keys: list[str], ts_col: str, watermark: str = "10 seconds"
) -> DataFrame:
    """Streaming dedupe (dedupe.rs LRU analogue): exact key dedupe with
    state TTL bound by the watermark instead of an LRU count bound."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates([*keys])


def stream_reduce_sessions(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    group_by: list[str],
    aggs: dict[str, str],
    watermark: str = "30 seconds",
) -> DataFrame:
    """Session-window reduce (reduce.rs expire_after_ms): a group's
    events merge until ``gap`` of event-time silence."""
    exprs = []
    for col, how in aggs.items():
        if how == "sum":
            exprs.append(F.sum(col).alias(f"{col}_sum"))
        elif how == "count":
            exprs.append(F.count(col).alias(f"{col}_count"))
        elif how == "array":
            exprs.append(F.collect_list(col).alias(f"{col}_array"))
        elif how == "concat":
            exprs.append(F.concat_ws(" ", F.collect_list(col)).alias(f"{col}_concat"))
        else:
            raise ValueError(f"unknown agg {how!r}")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *group_by)
        .agg(*exprs)
    )


def stream_route_writer(
    stream: DataFrame,
    routes: dict[str, Any],
    sink_paths: dict[str, str],
    checkpoint_dir: str,
    fmt: str = "parquet",
):
    """Streaming fan-out: ONE stream, foreachBatch writes every lane
    per micro-batch (the exactly-once multi-sink pattern; Vector's
    fanout channel, src/topology/fanout.rs). The micro-batch frame is
    persisted so N lane writes share one upstream evaluation."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        flagged = route_flags(batch_df, routes).persist()
        try:
            for lane, path in sink_paths.items():
                (
                    flagged.filter(F.col(ROUTE_COL_PREFIX + lane))
                    .drop(*[ROUTE_COL_PREFIX + r for r in routes])
                    .write.mode("append")
                    .format(fmt)
                    .save(path)
                )
        finally:
            flagged.unpersist()

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def stream_reduce_ends_when(
    stream: DataFrame,
    group_by: list[str],
    ends_when: Any,
    concat_field: str = "message",
    order_col: str | None = None,
    joiner: str = " ",
):
    """Custom stateful reduce with ends_when — the reference's exact
    semantics (reduce/mod.rs:178-200: a matching event CLOSES and
    flushes its group), via ``applyInPandasWithState``.

    Faithful in a way the batch/session-window variants are not:
    state accumulates in ARRIVAL order across micro-batches
    (processing-time, like Vector), a closing event emits exactly one
    merged row, and unclosed groups stay buffered. ``order_col``
    sorts within each micro-batch for determinism.

    Returns a grouped-state DataFrame: (group_by..., merged string,
    n_events long).
    """
    import pandas as pd

    cond = compile_condition(ends_when)
    work = stream.withColumn("_vs_ends", F.coalesce(cond, F.lit(False)))

    out_schema = (
        ", ".join(f"{c} string" for c in group_by) + ", merged string, n_events long"
    )
    state_schema = "acc string, n long"

    def fn(key, pdfs, state):
        # .get is a PROPERTY returning the state tuple (pyspark>=4);
        # calling it raises 'tuple is not callable' on the second batch
        acc, n = state.get if state.exists else ("", 0)
        emitted = []
        for pdf in pdfs:
            if order_col is not None:
                pdf = pdf.sort_values(order_col)
            for val, ends in zip(pdf[concat_field].astype(str), pdf["_vs_ends"]):
                acc = val if not acc else acc + joiner + val
                n += 1
                if bool(ends):
                    emitted.append((*key, acc, n))
                    acc, n = "", 0
        state.update((acc, n))
        if emitted:
            yield pd.DataFrame(
                emitted, columns=[*group_by, "merged", "n_events"]
            )

    return work.groupBy(*group_by).applyInPandasWithState(
        fn, out_schema, state_schema, "append", "NoTimeout"
    )


def stream_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    prefix: str | None = None,
    miss_flag_field: str | None = None,
) -> DataFrame:
    """Streaming enrichment: stream-static broadcast join — the
    enrichment-table lookup (src/transforms/geoip + enrichment tables)
    applied per micro-batch. The static dim is broadcast once per
    batch; no state store involved (lookups are stateless in the
    reference too)."""
    from vector_spark.operators.enrich import enrich as enrich_fn

    return enrich_fn(stream, dim, on=on, prefix=prefix, miss_flag_field=miss_flag_field)


def stream_chunk_tokens(
    stream: DataFrame,
    block_size: int,
    stream_cols: list[str] = ("source",),
    tokens_col: str = "tokens",
    order_col: str | None = None,
    flush_after_ms: int | None = None,
):
    """Streaming concat-and-chunk: the continuous counterpart of
    ``dataops.tokens.chunk_tokens`` — sequences arriving on a stream
    are concatenated per stream key in ARRIVAL order
    (processing-time, Vector's ordering model) and full
    ``block_size``-token training blocks are emitted as soon as they
    complete; the partial tail stays in the state store across
    micro-batches, so no token is ever dropped or duplicated
    (exactly-once under checkpointed state).

    ``applyInPandasWithState`` keyed by the stream columns; state is
    (carry-over token buffer, next block id). ``order_col`` sorts
    WITHIN a micro-batch for determinism — cross-batch order is
    arrival order by definition. State size is bounded by
    block_size-1 tokens per stream key.

    Output: (*stream_cols, block, tokens array<int>, n_tok int) —
    every row exactly ``block_size`` tokens, except a flushed tail.

    ``flush_after_ms``: without it the final partial tail waits in the
    state store for more tokens forever (the drop_last analogue). With
    it, a stream key idle for that long has its partial tail emitted
    as a short block (n_tok < block_size) and its state removed.
    ProcessingTimeTimeout makes the engine schedule NO-DATA timer
    batches, so pair it with a real trigger interval
    (``.trigger(processingTime="30 seconds")``): the default ASAP
    trigger busy-loops on empty timer batches, and
    ``availableNow``/``processAllAvailable`` never settle while
    timers are pending (measured, pinned by the test).
    """
    import pandas as pd

    # stream-key columns keep their SOURCE dtypes (a bigint key stays
    # bigint — hardcoding string here mistyped non-string keys)
    key_types = {f.name: f.dataType.simpleString() for f in stream.schema.fields}
    out_schema = (
        ", ".join(f"{c} {key_types[c]}" for c in stream_cols)
        + ", block long, tokens array<int>, n_tok int"
    )
    state_schema = "buf array<int>, next_block long"
    timeout = "ProcessingTimeTimeout" if flush_after_ms else "NoTimeout"

    def fn(key, pdfs, state):
        if state.exists:
            buf_raw, next_block = state.get  # property in pyspark>=4
            buf = list(buf_raw) if buf_raw is not None else []
        else:
            buf, next_block = [], 0
        emitted = []
        if getattr(state, "hasTimedOut", False):
            # idle flush: emit the partial tail, drop the state
            if buf:
                emitted.append((*key, next_block, buf, len(buf)))
            state.remove()
        else:
            for pdf in pdfs:
                if order_col is not None:
                    pdf = pdf.sort_values(order_col)
                for toks in pdf[tokens_col]:
                    if toks is None:
                        continue
                    buf.extend(int(t) for t in toks)
                    while len(buf) >= block_size:
                        emitted.append(
                            (*key, next_block, buf[:block_size], block_size)
                        )
                        buf = buf[block_size:]
                        next_block += 1
            state.update((buf, next_block))
            if flush_after_ms:
                state.setTimeoutDuration(flush_after_ms)
        if emitted:
            yield pd.DataFrame(
                emitted,
                columns=[*stream_cols, "block", "tokens", "n_tok"],
            )

    return stream.groupBy(*stream_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
