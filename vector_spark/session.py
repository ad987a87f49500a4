"""SparkSession factory tuned for this engine.

Local mode is the test substrate; configs are chosen so the same plan
shapes survive on a multi-executor cluster (AQE on, skew-join on,
shuffle partitions sized explicitly, Arrow enabled for the pandas-UDF
slow path). Iceberg catalog config is applied only when the runtime
jars are present (not in the test image) — parquet ``partitionBy``
writes are the default sink.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "vector_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the
    sandbox). On a real cluster, pass ``master=None`` and let
    spark-submit supply it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # Scan-split sizing: bounds task size AND floor-parallelism.
        # Too large packs many small files into few splits and starves
        # the cores (measured: 256MB packed a 700MB/64-file input into
        # 3 tasks → 32 cores idle). 128MB (Spark default) for cluster
        # scale; benches override via env to keep splits ≈ 4×cores.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
        # lz4+dictionary writes token-array parquet 2× faster than the
        # snappy default at equal file size (measured 4.0s vs 8.2s for
        # 333MB). zstd is ~20% smaller but 2.6× slower — use it for
        # cold archival sinks via the sink-level compression option.
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "lz4"),
        )
    )
    # allocation-heavy array decode benches sometimes prefer ParallelGC
    # over G1 (only effective when the JVM hasn't started yet)
    if os.environ.get("SPARK_GRAFT_GC") == "parallel":
        builder = builder.config(
            "spark.driver.extraJavaOptions", "-XX:+UseParallelGC"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
