"""One scaling leg of the bench: run the flagship pipeline at a given
thread count in a FRESH process (own JVM — no JIT/heap cross-talk),
print one JSON line. Used by bench.py via subprocess.

argv: threads input_path warm_path out_dir [mpb]
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


def main():
    threads = int(sys.argv[1])
    input_path, warm_path, out_dir = sys.argv[2:5]
    mpb = int(sys.argv[5]) if len(sys.argv) > 5 else None

    from bench import _quiesce_writeback, run_pipeline
    from vector_spark.session import get_spark

    extra = {"spark.sql.files.maxPartitionBytes": str(mpb)} if mpb else {}
    spark = get_spark(
        f"leg{threads}",
        master=f"local[{threads}]",
        shuffle_partitions=threads,
        extra_conf=extra,
    )
    run_pipeline(spark, warm_path, f"{out_dir}/warm")  # JIT warmup
    _quiesce_writeback()
    stop = threading.Event()
    samples: list[float] = []
    thr = threading.Thread(target=cpu_sampler, args=(stop, samples), daemon=True)
    thr.start()
    rows, wall = run_pipeline(spark, input_path, f"{out_dir}/out")
    stop.set()
    spark.stop()
    print(
        json.dumps(
            {
                "threads": threads,
                "rows": rows,
                "wall": round(wall, 3),
                "seq_per_sec": round(rows / wall, 1),
                "mean_cpu_pct": round(sum(samples) / max(len(samples), 1), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
