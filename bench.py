"""Benchmark harness — prints ONE JSON line.

Headline: end-to-end parse→enrich→route→aggregate pipeline throughput
(sequences/sec) over a pre-materialized parquet table of pre-tokenized
sequences (BASELINE.json metric), plus an N-vs-4N-cores scaling
comparison (sandbox substitute for N vs 4N executors).

Scaling methodology (hard-won on this VM — full writeup in
BASELINE.md):

- every leg runs in its OWN subprocess/JVM: shared-JVM JIT/heap state
  and an idle multi-GB parent heap measurably perturb later runs;
- each leg is preceded by a full-pipeline JIT warmup and a writeback
  quiesce (the virtual disk's dirty-page flush throttles successors
  5-10×);
- each leg times a FIXED schedule of (R-row, 2R-row) run pairs and
  the scaling ratio uses MARGINAL throughput R/(w(2R)-w(R)): per-job
  fixed costs (planning, scheduling, commit — ~2.4 s here) cancel
  exactly. They are <0.1% of wall at the 10^12-row target but ~35% of
  a fast leg's wall at bench scale, and would otherwise dominate the
  ratio. No value-dependent stopping anywhere; min-wall is the robust
  statistic because host-tenancy noise only ever SLOWS a run; every
  wall is recorded in the artifact;
- the scaling pair defaults to N=1 vs 4N=4 threads: this VM's DRAM
  bandwidth saturates at ~8-10 cores (token-array parquet decode
  scales only ~2.2× from 2→8 threads; the same job burns 3.6× the
  cycles at 32), so 2→8 already runs into the single-socket memory
  wall. On a real cluster each of the 4N executors brings its OWN
  memory bus, so executor scaling tracks the below-the-wall regime —
  1→4 threads — not thread-scaling into one saturated socket.
- the headline still reports the best INCLUSIVE wall-clock config
  (local[8] on this box — above the wall per-thread but highest
  absolute rate), directly comparable to the reference's single-node
  numbers.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_BENCH_ROWS, SPARK_GRAFT_SCALE_N (default 1),
SPARK_GRAFT_BENCH_LEGS (fresh JVMs per side, default 2),
SPARK_GRAFT_LEG_REPS (R-row reps per N-side JVM, default 3; the 4N
side and headline legs run 4× that),
SPARK_GRAFT_BENCH_SCALING=0 to skip scaling legs.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
SCALE_4N = SCALE_N * 4
LEGS_PER_SIDE = int(os.environ.get("SPARK_GRAFT_BENCH_LEGS", "2"))
HEADLINE_ALT = 8  # best measured inclusive config on this box

BENCH_QUERIES = [
    "flagship_pipeline",
    "grok_parser",
    "reduce",
    "aggregate_window",
    "dedupe",
    "log_to_metric",
    "dedup_exact",
    "ngram_jaccard",
    "minhash_lsh",
    "simhash",
    "embed_topk",
    "text_stats",
    # round-2 additions
    "parse_aws_alb_log",
    "syslog5424",
    "winnow_fingerprints",
    "minhash_estimate",
    # round-3 additions
    "datadog_search",
    "pii_scrub",
    "contamination",
    "rollup_tiers",
    "session_windows",
    "curation_pipeline",
    # round-4 additions
    "chunk_tokens",
    "quality_classifier",
    "bigram_logprob",
    # round-5 additions
    "bpe_encode",
    "bpe_train",
    "grok_services",
    "tf_idf",
    "pq_ann",
]


def _sf_of(path: str) -> float:
    import re

    m = re.search(r"sf([\d.]+)", path)
    return float(m.group(1)) if m else 0.1


def _quiesce_writeback(max_wait: float = 90.0) -> None:
    """Wait for the kernel to drain dirty pages from the PREVIOUS
    phase's writes — on this VM the virtual disk's flush throttles
    subsequent runs 5-10×; every timed phase must start from the same
    I/O state."""
    os.sync()
    deadline = time.monotonic() + max_wait
    while time.monotonic() < deadline:
        try:
            with open("/proc/meminfo") as f:
                info = dict(
                    (line.split(":")[0], int(line.split()[1])) for line in f if ":" in line
                )
            if info.get("Dirty", 0) + info.get("Writeback", 0) < 51_200:  # <50 MB
                return
        except OSError:
            return
        time.sleep(1.0)


def run_pipeline(spark, input_path: str, out_dir: str):
    """The flagship sequences pipeline: remap → filter → enrich
    (broadcast) → route (3 lanes) → single explode-write with
    piggybacked telemetry. Returns (rows_in, wall_seconds,
    sink_counts) — the per-sink routed
    row counts ride along so the scaling legs can prove ROUTED-ROW
    EQUALITY across parallelism levels, not just throughput.
    (Also imported by tools/bench_leg.py.)"""
    from vector_spark.fixtures import HOT_SOURCE, enrich_sources
    from vector_spark.plans import Pipeline

    cfg = {
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
            "keep": {"type": "filter", "inputs": ["derive"], "condition": ".n_tok >= 4"},
            "enrich_src": {
                "type": "enrich",
                "inputs": ["keep"],
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
        "sinks": {
            "hot": {"inputs": ["router.hot"]},
            "large": {"inputs": ["router.large"]},
            "rest": {"inputs": ["router.rest"]},
        },
        "fanout": {"strategy": "explode", "root": f"{out_dir}/routed"},
    }
    df = spark.read.parquet(input_path)
    pipe = Pipeline(cfg, enrich_tables={"sources": enrich_sources(spark)})
    t0 = time.monotonic()
    res = pipe.run(df, write=True, collect_telemetry=True)
    wall = time.monotonic() - t0
    return res.telemetry["events_in_total"], wall, dict(res.sink_counts)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return max(total, 1)


def _run_leg(threads: int, work: str, out_dir: str, mpb: int, reps: int) -> dict:
    _quiesce_writeback()
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "tools", "bench_leg.py"),
            str(threads),
            f"{work}/seq",
            f"{work}/seq2",
            f"{work}/warm",
            out_dir,
            str(mpb),
            str(reps),
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"error": proc.stderr[-300:]}


def main() -> None:
    sf = _sf_of(SF_DIR)
    n_rows = int(
        os.environ.get("SPARK_GRAFT_BENCH_ROWS", str(max(100_000, int(6_000_000 * sf))))
    )

    work = tempfile.mkdtemp(prefix="vs_bench_")
    result: dict = {"sf": sf, "unit": "sec", "queries": {}}
    try:
        subprocess.run(
            [
                sys.executable,
                os.path.join(HERE, "tools", "bench_gen.py"),
                work,
                str(n_rows),
                str(2 * n_rows),
                str(CPUS),
            ],
            check=True,
            capture_output=True,
            timeout=1800,
        )
        mpb = max(4 << 20, _dir_bytes(f"{work}/seq") // (CPUS * 4))

        base_reps = max(1, int(os.environ.get("SPARK_GRAFT_LEG_REPS", "3")))
        fast_reps = base_reps * 4

        # ---- headline: best inclusive wall-clock config. local[8]
        # beats local[32] on this box (DRAM wall — BASELINE.md), so
        # both run and the max is reported.
        head_legs: list[dict] = []
        for t in {CPUS, HEADLINE_ALT}:
            r = _run_leg(t, work, f"{work}/head{t}", mpb, fast_reps)
            if "seq_per_sec" in r:
                head_legs.append(r)
        best_head = max(head_legs, key=lambda r: r["seq_per_sec"], default={})
        result.update(
            {
                "metric": "pipeline_parse_enrich_route_aggregate_wall",
                "value": best_head.get("wall"),
                "pipeline_rows": best_head.get("rows"),
                "sequences_per_sec": best_head.get("seq_per_sec"),
                "headline_cpu_pct": best_head.get("mean_cpu_pct"),
                "headline_config": f"local[{best_head.get('threads')}]",
                "headline_marginal_seq_per_sec": best_head.get("marginal_seq_per_sec"),
            }
        )

        # ---- operator queries at SF_DIR (own JVM) ----
        qproc = subprocess.run(
            [
                sys.executable,
                os.path.join(HERE, "tools", "bench_queries.py"),
                SF_DIR,
                str(CPUS),
                ",".join(BENCH_QUERIES),
            ],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        if qproc.stdout.strip():
            result["queries"] = json.loads(qproc.stdout.strip().splitlines()[-1])

        # ---- N vs 4N scaling: fixed interleaved schedule of fresh-JVM
        # legs, equal count per side, marginal-throughput estimator ----
        if RUN_SCALING:
            walls: dict[int, dict[str, list[float]]] = {
                SCALE_N: {"w1": [], "w2": []},
                SCALE_4N: {"w1": [], "w2": []},
            }
            cpu_pct: dict[int, float] = {}
            sink_counts: dict[int, dict] = {}
            schedule = [SCALE_N, SCALE_4N] * LEGS_PER_SIDE
            for t in schedule:
                reps = base_reps if t == SCALE_N else fast_reps
                r = _run_leg(
                    t, work, f"{work}/leg{t}_{len(walls[t]['w1'])}", mpb, reps
                )
                if "w1_walls" in r:
                    walls[t]["w1"] += r["w1_walls"]
                    walls[t]["w2"] += r["w2_walls"]
                    cpu_pct[t] = max(cpu_pct.get(t, 0.0), r.get("mean_cpu_pct", 0.0))
                    if r.get("sink_counts"):
                        sink_counts[t] = r["sink_counts"]

            def _marginal(t: int) -> float | None:
                if not walls[t]["w1"] or not walls[t]["w2"]:
                    return None
                delta = min(walls[t]["w2"]) - min(walls[t]["w1"])
                return round(n_rows / delta, 1) if delta > 0 else None

            def _inclusive(t: int) -> float | None:
                return (
                    round(n_rows / min(walls[t]["w1"]), 1) if walls[t]["w1"] else None
                )

            marg_n, marg_4n = _marginal(SCALE_N), _marginal(SCALE_4N)
            inc_n, inc_4n = _inclusive(SCALE_N), _inclusive(SCALE_4N)
            eff_marg = round(marg_4n / (4.0 * marg_n), 3) if marg_n and marg_4n else None
            eff_inc = round(inc_4n / (4.0 * inc_n), 3) if inc_n and inc_4n else None
            result["scaling"] = {
                f"local{SCALE_N}_seq_per_sec": inc_n,
                f"local{SCALE_4N}_seq_per_sec": inc_4n,
                "estimator": "inclusive min-wall ratio (conservative: per-job "
                "fixed costs penalize 4N); marginal ratio reported as "
                "diagnostic — see BASELINE.md",
                "cores_ratio": 4.0,
                # primary = inclusive min-wall ratio: low-variance and
                # conservative (fixed costs penalize the fast leg)
                "efficiency": eff_inc,
                "marginal_seq_per_sec": {str(SCALE_N): marg_n, str(SCALE_4N): marg_4n},
                # routed-row equality across the two parallelism levels:
                # identical per-sink counts prove the fan-out routes the
                # same rows regardless of cluster size (north-rule check)
                "sink_counts": {str(t): c for t, c in sink_counts.items()},
                "routed_rows_equal": (
                    sink_counts.get(SCALE_N) == sink_counts.get(SCALE_4N)
                    if len(sink_counts) == 2
                    else None
                ),
                "efficiency_marginal_diagnostic": eff_marg,
                "scale_rows": n_rows,
                "scale_rows_2x": 2 * n_rows,
                "cpu_pct": {str(t): cpu_pct.get(t) for t in (SCALE_N, SCALE_4N)},
                # every wall from every leg/rep — the full evidence the
                # min-estimators integrate over, recorded for audit
                "walls_sec": {
                    str(t): walls[t] for t in (SCALE_N, SCALE_4N)
                },
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
