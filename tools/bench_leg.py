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
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from bench import run_pipeline
    from vector_spark.session import get_spark

    extra = {"spark.sql.files.maxPartitionBytes": str(mpb)} if mpb else {}
    spark = get_spark(
        f"leg{threads}",
        master=f"local[{threads}]",
        shuffle_partitions=threads,
        extra_conf=extra,
    )
    run_pipeline(spark, warm_path, f"{out_dir}/warm")  # JIT warmup
    w1s: list[float] = []
    w2s: list[float] = []
    cpus: list[float] = []
    rows = 0
    sink_counts: dict = {}
    for i in range(reps):
        rows, w1, sink_counts = _timed(spark, input_path, f"{out_dir}/o1_{i}", cpus)
        w1s.append(w1)
    _, w2, _ = _timed(spark, input2_path, f"{out_dir}/o2", cpus)
    w2s.append(w2)
    spark.stop()
    delta = min(w2s) - min(w1s)
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
            }
        )
    )


if __name__ == "__main__":
    main()
