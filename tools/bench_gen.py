"""Materialize bench inputs in a dedicated JVM (subprocess of bench.py).

argv: work_dir n_rows scale_rows cpus
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    work, n_rows, scale_rows, cpus = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
    )
    from vector_spark.fixtures import sequences
    from vector_spark.session import get_spark

    spark = get_spark("bench_gen", master=f"local[{cpus}]", shuffle_partitions=cpus)
    sequences(spark, n_rows, num_partitions=cpus * 2).write.parquet(f"{work}/seq")
    # the 2R input for the marginal-throughput estimator: same seed →
    # identical per-row distribution, twice the volume, same file
    # count (bigger files, so a fixed maxPartitionBytes yields 2× the
    # equally-sized splits — per-row cost stays constant)
    sequences(spark, scale_rows, num_partitions=cpus * 2).write.parquet(f"{work}/seq2")
    sequences(spark, 40_000, seed=7, num_partitions=cpus).write.parquet(f"{work}/warm")
    spark.stop()
    print("ok")


if __name__ == "__main__":
    main()
