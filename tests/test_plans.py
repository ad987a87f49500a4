"""Physical-plan assertions: the plans Catalyst produces must be the
plans we'd want at 100 TB — pushdown to the scan, column pruning,
broadcast joins, map-side partial aggregation, no extra shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.fixtures import enrich_sources
from vector_spark.operators import filter_events, log_to_metric, route_flags
from vector_spark.operators.enrich import enrich


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def events_pq(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_filter_pushes_to_parquet_scan(events_pq):
    out = filter_events(events_pq, '.event_type == "error"').select("event_id")
    plan = _plan(out)
    assert "PushedFilters" in plan and "event_type" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(events_pq):
    out = events_pq.select("event_id", "event_type").filter("event_id > 10")
    plan = _plan(out)
    # ReadSchema must not include unused columns like props/value
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "props" not in read_schema and "value" not in read_schema


def test_route_flags_single_scan_no_shuffle(events_pq):
    flagged = route_flags(
        events_pq, {"a": '.event_type == "error"', "b": ".value > 10.0"}
    )
    plan = _plan(flagged)
    assert "Exchange" not in plan  # narrow op: no shuffle


def test_enrich_is_broadcast_not_shuffle(spark, events_pq):
    dim = spark.createDataFrame(
        [("error", "fault")], "event_type string, category string"
    )
    out = enrich(events_pq, dim, on="event_type")
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_log_to_metric_aggregate_has_partial_agg(spark, events_pq):
    metrics = log_to_metric(
        events_pq.withColumnRenamed("ts", "timestamp"),
        [{"type": "counter", "field": "event_type", "name": "n"}],
    )
    from vector_spark.operators import aggregate_metrics

    agg = aggregate_metrics(metrics)
    plan = _plan(agg)
    # map-side combine: partial aggregation before the exchange
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan
    assert "Exchange" in plan


def test_whole_stage_codegen_covers_parsers(spark):
    from vector_spark.operators import regex_parser

    df = spark.range(100).select(F.format_string("status=%d", F.col("id")).alias("message"))
    out = regex_parser(df, [r"status=(?P<status>\d+)"], types={"status": "int"})
    plan = _plan(out)
    # "*(n)" prefixes mark WholeStageCodegen stages in the compact form
    assert "*(1)" in plan


def test_explode_fanout_single_exchange_free_plan(spark, events_pq):
    # the explode fan-out write path is shuffle-free up to the write
    from vector_spark.operators.core import ROUTE_COL_PREFIX

    flagged = route_flags(events_pq, {"x": ".value > 10.0", "y": ".value <= 10.0"})
    lanes = F.array_compact(
        F.array(
            F.when(F.col(ROUTE_COL_PREFIX + "x"), F.lit("x")),
            F.when(F.col(ROUTE_COL_PREFIX + "y"), F.lit("y")),
        )
    )
    out = flagged.withColumn("lane", F.explode(lanes))
    assert "Exchange" not in _plan(out)


def test_flagship_gate_is_single_scan(spark, sf_dir):
    """The flagship gate query must read the events parquet exactly
    once (explode fan-out), not once per sink lane."""
    import __spark_entry__ as entry

    out = entry.queries()["flagship_pipeline"](spark, sf_dir)
    plan = _plan(out)
    assert plan.count("Scan parquet") == 1, plan


def test_lanes_exploded_shape(spark, events_pq):
    """lanes_exploded: lane column present, internals stripped, row
    multiplicity = lane memberships."""
    from vector_spark.plans import Pipeline

    cfg = {
        "transforms": {
            "router": {
                "type": "route",
                "inputs": ["in"],
                "routes": {"err": '.event_type == "error"', "all": ".value >= 0.0"},
            }
        },
        "sinks": {"e": {"inputs": ["router.err"]}, "a": {"inputs": ["router.all"]}},
    }
    out = Pipeline(cfg).lanes_exploded(events_pq)
    assert "lane" in out.columns
    assert not [c for c in out.columns if c.startswith("_")]
    n_err = events_pq.filter("event_type = 'error'").count()
    n_all = events_pq.filter("value >= 0.0").count()
    got = {r["lane"]: r["n"] for r in out.groupBy("lane").agg(F.count("*").alias("n")).collect()}
    assert got == {"e": n_err, "a": n_all}


def test_regex_parser_single_pass_plan(spark):
    """Single-pattern regex_parser executes the pattern ONCE per row:
    one regexp_replace (the sentinel pass), zero rlike (match status
    reads off the split-array size); the per-field regexp_extracts
    exist only as sentinel-fallback when-branches."""
    from vector_spark.operators.parsers import regex_parser

    df = spark.createDataFrame([("a=1 b=2",)], "message string")
    out = regex_parser(
        df, r"(?P<a>\w+)=(?P<b>\d+) (?P<c>\w+)=(?P<d>\d+)", drop_field=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_replace") == 1
    assert "RLike" not in plan and "rlike" not in plan


def test_pii_scrub_is_shuffle_free(spark):
    from vector_spark.dataops.curation import pii_scrub

    df = spark.createDataFrame([(1, "a@b.io")], "doc_id long, text string")
    plan = _plan(pii_scrub(df, "text"))
    assert "Exchange" not in plan  # map-only projection
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contamination_benchmark_is_broadcast(spark):
    from vector_spark.dataops.curation import contamination_check

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    plan = _plan(contamination_check(docs, bench, n=3))
    # the benchmark gram side ships broadcast; the doc side never
    # shuffles for the semi-join itself (only the per-doc groupBys)
    assert "BroadcastHashJoin" in plan


def test_stratified_sample_no_shuffle_no_python(spark):
    from vector_spark.dataops.curation import stratified_sample

    df = spark.createDataFrame([(1, "web")], "k long, src string")
    plan = _plan(stratified_sample(df, "src", {"web": 0.5}, key_col="k"))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_datadog_search_filter_pushes_to_scan(events_pq):
    """A datadog_search condition on a plain column is a Catalyst
    predicate like any other — it must reach the parquet scan."""
    from vector_spark.datadog import SearchSchema, compile_datadog_search

    cond = compile_datadog_search(
        "@event_type:error", SearchSchema(message_col="props", tags_col="props")
    )
    plan = _plan(events_pq.filter(cond).select("event_id"))
    assert "PushedFilters" in plan
    assert "event_type" in plan.split("PushedFilters")[1][:300]


def test_winnow_has_no_window_exchange(spark):
    from vector_spark.dataops.textstats import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    plan = _plan(winnow_fingerprints(df))
    assert "Window" not in plan  # minima computed array-side
    # exactly one exchange: the final distinct
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final pair


def test_minhash_signatures_hash_aggregate_not_sort(spark):
    """The min() aggregation buffer must be a fixed-width long so the
    signature aggregate plans as HashAggregate with map-side partials —
    min over an md5 STRING demotes it to SortAggregate (a per-partition
    sort of every exploded (doc, seed, shingle) row)."""
    from pyspark.sql import functions as F

    from vector_spark.dataops.dedup import minhash_signatures

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.withColumn("doc_id", F.col("doc_id").cast("long"))
    plan = _plan(minhash_signatures(docs, k=8))
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_chunk_tokens_two_shuffles_sharded_window(spark):
    """chunk_tokens must cost exactly its two stated shuffles — the
    running-sum window exchange and the block-reassembly aggregate —
    and the window partitioning must include the shard column (K
    parallel sorts per stream, not one task per source)."""
    from pyspark.sql import functions as F

    from vector_spark.dataops.tokens import chunk_tokens

    df = spark.createDataFrame(
        [("s", i, list(range(5))) for i in range(10)],
        "source string, doc_id long, tokens array<int>",
    )
    plan = _plan(chunk_tokens(df, 8, stream_cols=["source"], n_shards=4))
    # ONE exchange: the block aggregate's keys (stream, shard, block)
    # are a superset of the window partitioning (stream, shard), so
    # Catalyst reuses the window exchange for the reassembly
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortAggregate" not in plan  # reassembly stays hash-based
    # block ids are integer `div`, never double division (exactness
    # past 2^53)
    assert "/ 8.0" not in plan
    # window partition keys: (source, shard)
    wline = next(
        ln for ln in plan.splitlines() if ln.lstrip().startswith(("Window", "+- Window"))
    )
    assert "shard" in wline


def test_classifier_training_aggregate_is_hash_partial(spark):
    """NB training must plan as partial/final HashAggregate on the
    exploded features (shuffle bounded by n_features, map-side
    combine) — not a sort, not a row-count-bound exchange."""
    from pyspark.sql import functions as F

    from vector_spark.dataops.classify import hash_features, train_nb_classifier

    df = spark.createDataFrame(
        [(True, "a b"), (False, "c d")], "label boolean, text string"
    )
    feats = df.withColumn("features", hash_features(F.col("text"), 256))
    plan = _plan(train_nb_classifier(feats, "label", n_features=256))
    assert "SortAggregate" not in plan
    assert "partial_sum" in plan
