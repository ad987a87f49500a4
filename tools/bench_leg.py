"""One scaling leg of the bench: run the flagship pipeline at a given
thread count in a FRESH process (own JVM — no JIT/heap cross-talk),
print one JSON line. Used by bench.py via subprocess.

Each leg times a FIXED schedule of (R-row, 2R-row) run pairs
(SPARK_GRAFT_LEG_REPS pairs, default 3 — no value-dependent stopping;
every wall lands in the artifact). Two estimators come out:

- inclusive throughput rows/min(w1) — comparable to wall-clock runs
  of the whole job, used for the headline;
- MARGINAL throughput R/(min(w2) - min(w1)) — the steady-state rate
  with per-job fixed costs (planning, scheduling, commit) differenced
  out exactly. At the 10^12-row target those costs are <0.1% of wall;
  at bench scale they are ~35% of a fast leg's wall and would
  otherwise dominate any scaling ratio. min() per wall is the robust
  choice because host-tenancy noise only ever SLOWS a run.

argv: threads input_path input2_path warm_path out_dir [mpb]

Two sandbox-survival guards (round 6 — both were fatal at the
driver's sf1.0 scale, where one rep's routed output is ~6 GB and a
local[1] R-row run is ~390 s):

- each rep's sink output is deleted as soon as its wall is recorded
  (the output is never read back; sink counts ride the telemetry), so
  disk stays bounded at ~2 rep outputs instead of reps×6 GB — the
  round-5 sf1.0 legs died on disk-full, which is why BENCH_r05's
  headline value is null;
- a wall-clock budget (SPARK_GRAFT_LEG_BUDGET, default 1200 s) skips
  remaining reps / the 2R run when the next run's conservative
  estimate would cross it, and the JSON gains "budget_truncated".
  The caller (the frozen bench.py) kills the subprocess at 1800 s,
  which would crash the whole bench with TimeoutExpired — a truncated
  leg with every recorded wall is strictly more information. The
  budget is CLOCK-dependent only, never value-dependent: at bench
  scale (sf0.1) every schedule fits and behavior is byte-identical.

Scale-adaptive schedule (round 6, second fix of the same class): the
WHOLE bench — gen + 2 headline legs + the query table + 2×2 scaling
legs — must finish inside the measurement harness's tolerance, which
round 5 demonstrated at ~25 min per bench.py run (its sf1.0 legs
failed fast, so the harness never saw a long schedule). With the legs
actually running, six 1200 s legs would push one bench.py run past
2 h and the harness would time the round out with NO output line —
strictly worse than fewer reps. So when the leg input is large
(> SPARK_GRAFT_LEG_BIG_ROWS, default 2 M rows — sf1.0 is 6 M, the
default bench sf0.1 is 600 k), each leg's budget drops to
SPARK_GRAFT_LEG_BUDGET_BIG (default 330 s) and the SECOND scaling leg
of each side (out_dir suffix "_<n>", n > 0) exits immediately with no
walls (bench.py accumulates nothing for it by design). The decision
input is the INPUT SIZE read from parquet footers — deterministic,
never a measured value; at the default bench scale nothing binds and
the schedule is byte-identical to round 5.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEG_BUDGET = float(os.environ.get("SPARK_GRAFT_LEG_BUDGET", "1200"))
LEG_BUDGET_BIG = float(os.environ.get("SPARK_GRAFT_LEG_BUDGET_BIG", "330"))
LEG_BIG_ROWS = int(os.environ.get("SPARK_GRAFT_LEG_BIG_ROWS", "2000000"))


def _dir_rows(path: str) -> int:
    """Row count of a parquet dir from footers alone (driver-side KBs)."""
    try:
        import pyarrow.parquet as pq

        total = 0
        for name in os.listdir(path):
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(path, name)).metadata.num_rows
        return total
    except Exception:
        return 0


def cpu_sampler(stop, samples):
    def snap():
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        return sum(vals), vals[3] + vals[4]

    t, i = snap()
    while not stop.is_set():
        time.sleep(1)
        t2, i2 = snap()
        ncpu = os.cpu_count() or 1
        samples.append(100.0 * (1 - (i2 - i) / max(t2 - t, 1)) * ncpu)
        t, i = t2, i2


def _timed(spark, path, out, cpu_out):
    from bench import _quiesce_writeback, run_pipeline

    _quiesce_writeback()
    stop = threading.Event()
    samples: list[float] = []
    thr = threading.Thread(target=cpu_sampler, args=(stop, samples), daemon=True)
    thr.start()
    rows, wall, sinks = run_pipeline(spark, path, out)
    stop.set()
    cpu_out.append(round(sum(samples) / max(len(samples), 1), 1))
    return rows, round(wall, 3), sinks


def main():
    threads = int(sys.argv[1])
    input_path, input2_path, warm_path, out_dir = sys.argv[2:6]
    mpb = int(sys.argv[6]) if len(sys.argv) > 6 else None
    reps = (
        int(sys.argv[7])
        if len(sys.argv) > 7
        else max(1, int(os.environ.get("SPARK_GRAFT_LEG_REPS", "3")))
    )

    big = _dir_rows(input_path) > LEG_BIG_ROWS
    budget = LEG_BUDGET_BIG if big else LEG_BUDGET
    import re as _re

    m = _re.search(r"leg\d+_(\d+)$", out_dir)
    if big and m and int(m.group(1)) > 0:
        # repeat scaling leg at escalated scale: a second fresh-JVM
        # sample of the same side costs another warmup + unconditional
        # first rep (~8 min at local[1]/6 M rows) for one extra wall;
        # at this scale the whole-schedule tolerance matters more.
        # bench.py accumulates nothing when w1_walls is absent.
        print(json.dumps({"threads": threads, "skipped": "big-scale repeat leg"}))
        return

    from bench import run_pipeline
    from vector_spark.session import get_spark

    extra = {"spark.sql.files.maxPartitionBytes": str(mpb)} if mpb else {}
    spark = get_spark(
        f"leg{threads}",
        master=f"local[{threads}]",
        shuffle_partitions=threads,
        extra_conf=extra,
    )
    t_start = time.monotonic()
    run_pipeline(spark, warm_path, f"{out_dir}/warm")  # JIT warmup
    shutil.rmtree(f"{out_dir}/warm", ignore_errors=True)
    w1s: list[float] = []
    w2s: list[float] = []
    cpus: list[float] = []
    rows = 0
    sink_counts: dict = {}
    truncated = False

    def _fits(est: float) -> bool:
        return (time.monotonic() - t_start) + est <= budget

    for i in range(reps):
        # conservative next-run estimate: the worst wall seen so far
        # (+50% flush/quiesce slack); the first rep always runs
        if w1s and not _fits(max(w1s) * 1.5):
            truncated = True
            break
        rows, w1, sink_counts = _timed(spark, input_path, f"{out_dir}/o1_{i}", cpus)
        w1s.append(w1)
        # timed output is never read back — free it immediately so the
        # leg's disk high-water mark is O(1 rep), not O(reps)
        shutil.rmtree(f"{out_dir}/o1_{i}", ignore_errors=True)
    if _fits(max(w1s) * 2.6):
        _, w2, _ = _timed(spark, input2_path, f"{out_dir}/o2", cpus)
        w2s.append(w2)
        shutil.rmtree(f"{out_dir}/o2", ignore_errors=True)
    else:
        truncated = True
    spark.stop()
    delta = (min(w2s) - min(w1s)) if w2s else 0.0
    print(
        json.dumps(
            {
                "threads": threads,
                "rows": rows,
                "wall": min(w1s),
                "seq_per_sec": round(rows / min(w1s), 1),
                "marginal_seq_per_sec": round(rows / delta, 1) if delta > 0 else None,
                "w1_walls": w1s,
                "w2_walls": w2s,
                "mean_cpu_pct": round(sum(cpus) / max(len(cpus), 1), 1),
                "sink_counts": sink_counts,
                "budget_truncated": truncated,
            }
        )
    )


if __name__ == "__main__":
    main()
