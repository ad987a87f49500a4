"""End-to-end pipeline: the north-rule flagship
(parse → enrich → route → aggregate) with telemetry conservation,
routed-row set equality vs a pure-Python oracle, token-array
invariant, and resumable checkpointing.

Mirrors Vector's behavior-test harness (src/config/unit_test.rs:11-57,
tests/behavior/transforms/route.toml): inputs in, per-sink row-set
assertions out.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vector_spark.checkpoint import resumable_run, shard_files
from vector_spark.fixtures import HOT_SOURCE, enrich_sources, sequences
from vector_spark.plans import Pipeline


def flagship_config(tmp: str | None = None, write: bool = False) -> dict:
    sinks = {
        "hot_sink": {"inputs": ["router.hot"]},
        "large_sink": {"inputs": ["router.large"]},
        "rest_sink": {"inputs": ["router.rest"]},
    }
    if tmp:
        for name in sinks:
            sinks[name]["path"] = f"{tmp}/{name}"
            sinks[name]["partition_by"] = ["source"]
    return {
        "transforms": {
            "derive": {
                "type": "remap",
                "inputs": ["in"],
                "assignments": [
                    (
                        ".size_bucket",
                        'if_else(.n_tok < 128, "small", if_else(.n_tok < 1024, "medium", "large"))',
                    ),
                    (".tok_head", "get(.tokens, 1)"),
                ],
            },
            "drop_empty": {
                "type": "filter",
                "inputs": ["derive"],
                "condition": ".n_tok >= 4",
            },
            "enrich_src": {
                "type": "enrich",
                "inputs": ["drop_empty"],
                "table": "sources",
                "on": "source",
            },
            "router": {
                "type": "route",
                "inputs": ["enrich_src"],
                "routes": {
                    "hot": f'.source == "{HOT_SOURCE}"',
                    "large": '.size_bucket == "large"',
                    "rest": f'.source != "{HOT_SOURCE}" && .size_bucket != "large"',
                },
            },
        },
        "sinks": sinks,
    }


@pytest.fixture(scope="module")
def seq_df(spark):
    return sequences(spark, 4000).cache()


def _python_oracle(rows):
    """Pure-Python reimplementation of the flagship semantics."""
    lanes = {"hot": set(), "large": set(), "rest": set()}
    n_filtered = 0
    for r in rows:
        if r.n_tok < 4:
            n_filtered += 1
            continue
        bucket = "small" if r.n_tok < 128 else ("medium" if r.n_tok < 1024 else "large")
        if r.source == HOT_SOURCE:
            lanes["hot"].add(r.doc_id)
        if bucket == "large":
            lanes["large"].add(r.doc_id)
        if r.source != HOT_SOURCE and bucket != "large":
            lanes["rest"].add(r.doc_id)
    return lanes, n_filtered


def test_flagship_routed_row_equality_and_telemetry(spark, seq_df):
    pipe = Pipeline(flagship_config(), enrich_tables={"sources": enrich_sources(spark)})
    res = pipe.run(seq_df, write=False)

    raw = seq_df.collect()
    oracle_lanes, oracle_filtered = _python_oracle(raw)

    # routed-row SET equality per sink (the north-rule gate)
    for lane in ("hot", "large", "rest"):
        got = {r.doc_id for r in res.lanes[f"{lane}_sink"].select("doc_id").collect()}
        assert got == oracle_lanes[lane], f"lane {lane} mismatch"

    # telemetry conservation: in - filtered = live; lane counts match oracle
    t = res.telemetry
    assert t["events_in_total"] == 4000
    assert t["drop_empty_discarded_total"] == oracle_filtered
    for lane in ("hot", "large", "rest"):
        assert t[f"router_{lane}_total"] == len(oracle_lanes[lane])
    # every live event hit >= 1 lane (rest is the complement) → no discards
    assert t["router_discarded_total"] == 0
    res.frame.unpersist()


def test_flagship_token_invariant(spark, seq_df):
    pipe = Pipeline(flagship_config(), enrich_tables={"sources": enrich_sources(spark)})
    res = pipe.run(seq_df, write=False, collect_telemetry=False)
    surv = res.lanes["hot_sink"].select("doc_id", F.md5(F.concat_ws(",", "tokens")).alias("h2"))
    orig = seq_df.select("doc_id", F.md5(F.concat_ws(",", "tokens")).alias("h1"))
    assert surv.join(orig, "doc_id").filter("h1 <> h2").count() == 0
    res.frame.unpersist()


def test_flagship_single_scan_fanout(spark, seq_df):
    """The fan-out must not rescan the input per sink: terminal frame
    is persisted (InMemoryTableScan feeds each lane)."""
    pipe = Pipeline(flagship_config(), enrich_tables={"sources": enrich_sources(spark)})
    res = pipe.run(seq_df, write=False, collect_telemetry=False)
    plan = res.lanes["hot_sink"]._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    res.frame.unpersist()


def test_pipeline_writes_partitioned_sinks(spark, seq_df):
    tmp = tempfile.mkdtemp(prefix="vs_sinks_")
    try:
        pipe = Pipeline(
            flagship_config(tmp, write=True), enrich_tables={"sources": enrich_sources(spark)}
        )
        res = pipe.run(seq_df, write=True, collect_telemetry=True)
        hot = spark.read.parquet(f"{tmp}/hot_sink")
        assert hot.count() == res.sink_counts["hot_sink"]
        # hive-partitioned by source
        assert any("source=" in f for f in hot.inputFiles())
        # internal flag columns must not leak into sinks
        assert not [c for c in hot.columns if c.startswith("_")]
        res.frame.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_resumable_checkpoint(spark):
    tmp = tempfile.mkdtemp(prefix="vs_ckpt_")
    try:
        # write a small partitioned input (several files)
        sequences(spark, 1000, num_partitions=6).write.parquet(f"{tmp}/input")
        calls = []

        def process(df, sid):
            pipe = Pipeline(
                flagship_config(), enrich_tables={"sources": enrich_sources(spark)}
            )
            res = pipe.run(df, write=False)
            res.frame.unpersist()
            calls.append(sid)
            return res

        r1 = resumable_run(spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=3)
        assert len(calls) == 3 and not any(s.skipped for s in r1)
        total_in = sum(s.telemetry["events_in_total"] for s in r1)
        assert total_in == 1000
        # resume: nothing reprocessed
        calls.clear()
        r2 = resumable_run(spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=3)
        assert calls == [] and all(s.skipped for s in r2)
        # lineage recorded
        from vector_spark.checkpoint import CheckpointLog

        recs = CheckpointLog(f"{tmp}/ckpt").read_all()
        assert len(recs) == 3 and all(r["lineage_files"] for r in recs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_shard_files_deterministic():
    files = [f"f{i}" for i in range(10)]
    a = shard_files(list(reversed(files)), 3)
    b = shard_files(files, 3)
    assert a == b and sum(len(s) for s in a) == 10


def test_telemetry_prometheus_export(spark, seq_df):
    from vector_spark.telemetry import prometheus_text, telemetry_frame

    pipe = Pipeline(flagship_config(), enrich_tables={"sources": enrich_sources(spark)})
    res = pipe.run(seq_df, write=False)
    tf = telemetry_frame(spark, res.telemetry, labels={"job": "flagship"})
    rows = {r.name: r.value for r in tf.collect()}
    assert rows["events_in_total"] == 4000.0
    text = prometheus_text(res.telemetry, labels={"job": "flagship"})
    assert '# TYPE events_in_total counter' in text
    assert 'events_in_total{job="flagship"} 4000.0' in text
    res.frame.unpersist()


def test_pipeline_terminal_aggregation_with_error_counter(spark):
    """A pipeline ENDING in log_to_metric: schema changes at the
    terminal, so upstream counters bind to their own frames; missing
    metric fields increment processing_errors (log_to_metric.rs
    missing-field semantics, FIXTURES.md F4)."""
    rows = [
        ("a", "200", 1),
        ("b", None, 2),     # missing field -> processing error
        ("a", "500", 3),
    ]
    df = spark.createDataFrame(rows, "source string, status string, ord int")
    cfg = {
        "transforms": {
            "keep": {"type": "filter", "inputs": ["in"], "condition": ".ord >= 1"},
            "to_metric": {
                "type": "log_to_metric",
                "inputs": ["keep"],
                "metrics": [{"type": "counter", "field": "status", "name": "status_total"}],
            },
        },
        "sinks": {"metrics": {"inputs": ["to_metric"]}},
    }
    pipe = Pipeline(cfg)
    res = pipe.run(df, write=False)
    assert res.telemetry["to_metric_processing_errors_total"] == 1
    assert res.telemetry["keep_discarded_total"] == 0
    # metric rows: 2 events had the field
    assert res.sink_counts["metrics"] == 2
    res.frame.unpersist()


def test_forked_dag_counters_bind_to_their_branch(spark, seq_df):
    """ADVICE r1: a stage that is NOT an ancestor of the terminal
    transform must still report correct discard counts — its marks
    never reach the terminal frame, so an unbound counter evaluated
    there silently reads 0."""
    cfg = {
        "transforms": {
            # main lineage (terminal)
            "keep_big": {
                "type": "filter",
                "inputs": ["in"],
                "condition": ".n_tok >= 4",
            },
            "tag": {
                "type": "add_fields",
                "inputs": ["keep_big"],
                "fields": {"pipeline": "main"},
            },
            # forked side branch — not an ancestor of "tag"
            "side_drop": {
                "type": "filter",
                "inputs": ["in"],
                "condition": ".n_tok < 4",
            },
        },
        "sinks": {
            "main": {"inputs": ["tag"]},
            "side": {"inputs": ["side_drop"]},
        },
    }
    pipe = Pipeline(cfg)
    res = pipe.run(seq_df, write=False)
    total = seq_df.count()
    small = seq_df.filter(F.col("n_tok") < 4).count()
    assert res.telemetry["keep_big_discarded_total"] == small
    # the forked branch drops the complement — must NOT read 0
    assert res.telemetry["side_drop_discarded_total"] == total - small
    assert res.sink_counts["main"] == total - small
    assert res.sink_counts["side"] == small
    res.frame.unpersist()


def test_resume_reprocesses_on_lineage_mismatch(spark):
    """ADVICE r1: a committed checkpoint is honored only when its
    lineage matches the current shard's file list — changed inputs or
    n_shards must reprocess, never silently skip."""
    tmp = tempfile.mkdtemp(prefix="vs_ckpt_lin_")
    try:
        sequences(spark, 600, num_partitions=6).write.parquet(f"{tmp}/input")
        calls = []

        def process(df, sid):
            pipe = Pipeline(
                flagship_config(), enrich_tables={"sources": enrich_sources(spark)}
            )
            res = pipe.run(df, write=False)
            res.frame.unpersist()
            calls.append(sid)
            return res

        resumable_run(spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=3)
        assert sorted(calls) == [0, 1, 2]
        # change the input set: add more files
        sequences(spark, 200, num_partitions=2).write.mode("append").parquet(
            f"{tmp}/input"
        )
        calls.clear()
        r2 = resumable_run(spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=3)
        # every shard's file list changed → all reprocess, none skipped
        assert sorted(calls) == [0, 1, 2] and not any(s.skipped for s in r2)
        total_in = sum(s.telemetry["events_in_total"] for s in r2)
        assert total_in == 800
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_crash_replay_is_idempotent_with_shard_overwrite(spark):
    """Crash AFTER the sink write but BEFORE the checkpoint commit:
    the replay overwrites the shard-scoped output — row count is
    exact, no duplication (module-docstring contract)."""
    from vector_spark.checkpoint import shard_output_path

    tmp = tempfile.mkdtemp(prefix="vs_ckpt_crash_")
    try:
        sequences(spark, 600, num_partitions=6).write.parquet(f"{tmp}/input")
        crash = {"armed": True}

        def process(df, sid):
            out = shard_output_path(f"{tmp}/out", sid)
            df.write.mode("overwrite").parquet(out)
            if sid == 1 and crash["armed"]:
                raise RuntimeError("simulated crash before checkpoint commit")

            class R:
                telemetry = {"events_in_total": df.count()}
                sink_counts = {}

            return R()

        try:
            resumable_run(spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=3)
        except RuntimeError:
            pass
        crash["armed"] = False
        r2 = resumable_run(spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=3)
        # shard 0 committed → skipped; shards 1,2 reprocessed
        assert [s.skipped for s in r2] == [True, False, False]
        got = spark.read.parquet(f"{tmp}/out").count()
        assert got == 600  # exactly once — the replayed shard did not duplicate
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_run_pipeline_job_cli_end_to_end(spark):
    """jobs/run_pipeline.py — the spark-submit deploy artifact — runs
    end-to-end in a fresh interpreter: shard-checkpointed explode
    fan-out, then a resume that skips every committed shard."""
    import json as _json
    import subprocess
    import sys

    tmp = tempfile.mkdtemp(prefix="vs_job_")
    try:
        sequences(spark, 800, num_partitions=4).write.parquet(f"{tmp}/input")

        def run():
            proc = subprocess.run(
                [
                    sys.executable,
                    "jobs/run_pipeline.py",
                    "--input", f"{tmp}/input",
                    "--output", f"{tmp}/out",
                    "--checkpoint", f"{tmp}/ckpt",
                    "--shards", "2",
                ],
                capture_output=True,
                text=True,
                timeout=600,
                env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "4"},
            )
            assert proc.returncode == 0, proc.stderr[-1500:]
            return _json.loads(proc.stdout.strip().splitlines()[-1])

        first = run()
        assert first["shards_processed"] == 2 and first["events_in_total"] == 800
        # resume: everything skipped, nothing reprocessed
        second = run()
        assert second["shards_processed"] == 0 and second["shards_skipped"] == 2
        # routed output exists per shard, hive-partitioned by lane
        out = spark.read.option("basePath", f"{tmp}/out").parquet(f"{tmp}/out")
        assert out.count() > 0 and "lane" in out.columns and "shard" in out.columns
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sink_counts_correct_for_mid_pipeline_router_tap(spark):
    """Review r2: a sink tapping a ROUTER that is not the terminal
    transform writes the router-stage frame — its count must match the
    written rows, not terminal-stage aliveness."""
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    cfg = {
        "transforms": {
            "r": {
                "type": "route",
                "inputs": ["in"],
                "routes": {"evens": ".id % 2 == 0", "odds": ".id % 2 == 1"},
            },
            "f": {"type": "filter", "inputs": ["r.odds"], "condition": ".id < 4"},
        },
        "sinks": {"ev": {"inputs": ["r.evens"]}, "small_odds": {"inputs": ["f"]}},
    }
    res = Pipeline(cfg).run(df, write=False)
    assert res.sink_counts["ev"] == res.lanes["ev"].count() == 5
    assert res.sink_counts["small_odds"] == res.lanes["small_odds"].count() == 2
    res.frame.unpersist()


def test_resume_shrinking_shards_requires_cleanup(spark):
    """Review r2: reducing n_shards on resume must not silently leave
    stale shard output duplicating data — without a cleanup hook the
    run fails loudly; with one, stale shards are scrubbed."""
    import pytest as _pytest

    tmp = tempfile.mkdtemp(prefix="vs_ckpt_shrink_")
    try:
        sequences(spark, 400, num_partitions=8).write.parquet(f"{tmp}/input")
        scrubbed = []

        def process(df, sid):
            class R:
                telemetry = {"events_in_total": df.count()}
                sink_counts = {}

            return R()

        resumable_run(spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=4)
        with _pytest.raises(ValueError, match="beyond the current shard count"):
            resumable_run(spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=2)
        r = resumable_run(
            spark, f"{tmp}/input", f"{tmp}/ckpt", process,
            n_shards=2, cleanup=scrubbed.append,
        )
        # stale shards (2,3) scrubbed first; then shards 0,1 — their
        # committed lineage changed with the shard count, so the
        # ADVICE-r2 fix scrubs them too before reprocessing (a
        # non-overwrite sink would otherwise keep their old output
        # next to the reprocessed rows)
        assert scrubbed == [2, 3, 0, 1]
        assert len(r) == 2 and not any(s.skipped for s in r)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_remap_del_respects_error_rollback(spark):
    """Review r2b: del() must not destroy the field for rows the
    error path promises to pass through unmodified."""
    from vector_spark.operators.remap import remap

    df = spark.createDataFrame(
        [(1, "keep-me"), (2, "scrub-me")], "id int, secret string"
    )
    out = remap(
        df,
        [(".masked", "upcase(.secret)"), ("__del__", ".secret")],
        error_when='.id == 1',
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].secret == "keep-me"  # errored row unmodified
    assert rows[2].secret is None  # del applied (null on flat schema)
    assert rows[2].masked == "SCRUB-ME"


def test_crashed_shard_beyond_new_count_is_scrubbed(spark):
    """Review r2b: a crashed (in-progress, uncommitted) shard beyond a
    shrunken shard count is scrubbed too, not just committed ones."""
    from vector_spark.checkpoint import CheckpointLog

    tmp = tempfile.mkdtemp(prefix="vs_ckpt_crash2_")
    try:
        sequences(spark, 300, num_partitions=6).write.parquet(f"{tmp}/input")
        log = CheckpointLog(f"{tmp}/ckpt")
        log.mark_inprogress(5, "deadrun", ["f1"])  # crashed attempt, id 5
        scrubbed = []

        def process(df, sid):
            class R:
                telemetry = {"events_in_total": df.count()}
                sink_counts = {}

            return R()

        resumable_run(
            spark, f"{tmp}/input", f"{tmp}/ckpt", process,
            n_shards=2, cleanup=scrubbed.append,
        )
        assert 5 in scrubbed
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_mid_pipeline_sink_counts_fold_without_extra_jobs(spark):
    """Review r2b: mid-pipeline tap counts ride the telemetry
    aggregation (frame-bound counters), and stay CORRECT."""
    df = spark.createDataFrame([(i,) for i in range(10)], "id int")
    cfg = {
        "transforms": {
            "r": {
                "type": "route",
                "inputs": ["in"],
                "routes": {"evens": ".id % 2 == 0", "odds": ".id % 2 == 1"},
            },
            "f": {"type": "filter", "inputs": ["r.odds"], "condition": ".id < 4"},
        },
        "sinks": {"ev": {"inputs": ["r.evens"]}, "small_odds": {"inputs": ["f"]}},
    }
    res = Pipeline(cfg).run(df, write=False)
    assert res.sink_counts == {"ev": 5, "small_odds": 2}
    res.frame.unpersist()


def test_lineage_mismatch_scrubs_committed_output(spark):
    """ADVICE r2: a COMMITTED shard whose lineage mismatches must run
    cleanup() (and drop the stale record) before reprocessing — for
    non-overwrite sinks the old committed output would otherwise sit
    next to the reprocessed rows, violating the no-duplication
    contract."""
    tmp = tempfile.mkdtemp(prefix="vs_ckpt_scrub_")
    try:
        sequences(spark, 300, num_partitions=3).write.parquet(f"{tmp}/input")
        cleaned = []

        def process(df, sid):
            class R:
                telemetry = {"events_in_total": df.count()}
                sink_counts = {}

            return R()

        resumable_run(
            spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=2,
            cleanup=cleaned.append,
        )
        assert cleaned == []  # clean first run: nothing to scrub
        sequences(spark, 100, num_partitions=1).write.mode("append").parquet(
            f"{tmp}/input"
        )
        r2 = resumable_run(
            spark, f"{tmp}/input", f"{tmp}/ckpt", process, n_shards=2,
            cleanup=cleaned.append,
        )
        # both shards' lineage changed → both scrubbed then reprocessed
        assert sorted(cleaned) == [0, 1]
        assert not any(s.skipped for s in r2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
