"""Sources: Vector's source components as Spark scans.

Reference registry: src/sources/ (33 modules — SURVEY.md §2.4). The
north-rule pipeline reads ONE table (Iceberg/parquet); the rest of
Vector's source surface maps as below. Network servers (socket/
syslog/http/fluent/...) have no Spark equivalent by design — Spark
pulls, Vector listens — their role is filled by kafka/file streams.

| Vector source        | here                                          |
|----------------------|-----------------------------------------------|
| file (src/sources/file.rs: globs, checkpoints, multiline) | file_source: spark.read/readStream text/json/csv; resume = streaming checkpoint; multiline = file_source(multiline=...) start-pattern folding (+ merge_partial for the _partial-marker protocol) |
| kafka.rs             | kafka_source (gated: needs spark-sql-kafka jar) |
| generator.rs (GeneratorConfig interval/count/format) | generator_source: deterministic spark.range synthesis |
| stdin.rs             | stdin_source (driver-side, dev only)           |
| aws_s3, gcs, ...     | the same readers with an object-store URI      |
| internal_metrics.rs  | telemetry.Telemetry counters                   |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_source(
    spark: SparkSession,
    path: str,
    fmt: str = "text",
    schema: str | None = None,
    streaming: bool = False,
    multiline: dict | None = None,
    **options,
) -> DataFrame:
    """Glob-capable file scan (file.rs FileConfig include globs).
    ``streaming=True`` = tailing mode: new files are micro-batches and
    the stream checkpoint replaces the reference's per-file
    fingerprint checkpointer.

    ``multiline`` (text only, batch only) aggregates continuation
    lines into one event, the file.rs:63-100 multiline config:
    ``{"start_pattern": regex, "join_with": "\\n"}`` — a line matching
    start_pattern OPENS an event; following non-matching lines
    (stack-trace continuations) append to it. Order comes from the
    file itself (wholetext + posexplode), so each file must fit an
    executor — the same constraint as the reference, which tails one
    file sequentially per reader."""
    reader = spark.readStream if streaming else spark.read
    if schema:
        reader = reader.schema(schema)
    elif streaming:
        raise ValueError("streaming file source requires an explicit schema")
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "text":
        if multiline:
            if streaming:
                raise ValueError("multiline aggregation is batch-only")
            return _multiline_text(reader, path, multiline)
        return reader.text(path).withColumnRenamed("value", "message")
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return reader.csv(path)
    if fmt == "parquet":
        return reader.parquet(path)
    raise ValueError(f"unknown format {fmt!r}")


def _multiline_text(reader, path: str, multiline: dict) -> DataFrame:
    """start_pattern grouping: group id = running count of start-line
    matches in file order; one window + one groupBy, both partitioned
    by file — files process independently and in parallel."""
    from pyspark.sql import Window

    start = multiline["start_pattern"]
    join_with = multiline.get("join_with", "\n")
    # NOTE: wholetext must be the .text() KWARG — the method's default
    # (wholetext=False) silently overrides a reader-level .option()
    raw = reader.text(path, wholetext=True).select(
        F.input_file_name().alias("_file"), F.col("value")
    )
    # drop ONLY the trailing empty artifact of splitting a \n-terminated
    # file — blank lines INSIDE an event are content (stack traces may
    # contain them) and must survive
    arr = F.split(F.col("value"), "\n")
    arr = F.when(F.element_at(arr, -1) == "", F.slice(arr, 1, F.size(arr) - 1)).otherwise(arr)
    # indexed transform instead of posexplode: the pos column of
    # posexplode(split(...)) over a text-source scan came back all-zero
    # under whole-stage codegen (observed on Spark 4.1) — the explicit
    # (element, index) lambda is plan-stable
    indexed = F.transform(
        arr, lambda x, i: F.struct(i.alias("_ln"), x.alias("message"))
    )
    lines = raw.select("_file", F.explode(indexed).alias("_e")).select(
        "_file", F.col("_e._ln").alias("_ln"), F.col("_e.message").alias("message")
    )
    w = Window.partitionBy("_file").orderBy("_ln")
    grp = F.sum(F.col("message").rlike(start).cast("long")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    # lines BEFORE the first start match are not silently dropped: each
    # orphan line is emitted as its own event (negative group id keyed
    # by line number — the reference flushes unmatched lines standalone)
    grp = F.when(grp > 0, grp).otherwise(-(F.col("_ln") + 1))
    grouped = lines.withColumn("_grp", grp)
    return (
        grouped.groupBy("_file", "_grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_ln"), F.col("message")))
                    ),
                    lambda s: s["message"],
                ),
                join_with,
            ).alias("message"),
            F.min("_ln").alias("_line"),
        )
        .select(F.col("_file").alias("file"), F.col("_line").alias("line"), "message")
    )


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    streaming: bool = True,
) -> DataFrame:
    """Kafka consumer (src/sources/kafka.rs). Requires the
    spark-sql-kafka package on the classpath — gated because the test
    image ships without it; the returned frame exposes Vector's
    message/key/timestamp/topic fields."""
    from pyspark.sql import functions as F

    reader = (spark.readStream if streaming else spark.read).format("kafka")
    try:
        df = (
            reader.option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - jar not in image
        raise NotImplementedError(
            "kafka source needs org.apache.spark:spark-sql-kafka on the "
            "classpath (spark-submit --packages)"
        ) from e
    return df.select(
        F.col("value").cast("string").alias("message"),
        F.col("key").cast("string").alias("key"),
        F.col("timestamp").alias("timestamp"),
        F.col("topic").alias("topic"),
        F.col("partition").alias("partition"),
        F.col("offset").alias("offset"),
    )


def iceberg_source(spark: SparkSession, table: str) -> DataFrame:
    """North-rule input: an Iceberg table of pre-tokenized sequences.
    Gated on the Iceberg runtime jars; parquet paths work identically
    for the semantics (both are columnar scans with pushdown)."""
    try:
        return spark.read.table(table)
    except Exception as e:  # pragma: no cover
        raise NotImplementedError(
            "iceberg source needs the iceberg-spark-runtime jar and a "
            "catalog config (spark.sql.catalog.*)"
        ) from e


def generator_source(
    spark: SparkSession, count: int, fmt: str = "shuffle", seed: int = 42
) -> DataFrame:
    """src/sources/generator.rs (GeneratorConfig{interval,count,format})
    — deterministic synthetic events, JVM-side."""
    from pyspark.sql import functions as F

    base = spark.range(count)
    lines = F.element_at(
        F.array(
            F.lit("GET /api/ok 200"),
            F.lit("POST /api/submit 201"),
            F.lit("GET /missing 404"),
            F.lit("ERROR upstream timeout"),
        ),
        (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(4)) + 1).cast("int"),
    )
    return base.select(F.col("id"), lines.alias("message"))


def stdin_source(spark: SparkSession) -> DataFrame:
    """src/sources/stdin.rs — dev convenience; driver-side read."""
    import sys

    lines = [(i, line.rstrip("\n")) for i, line in enumerate(sys.stdin)]
    return spark.createDataFrame(lines, "id long, message string")


def read_source(spark: SparkSession, spec: dict) -> DataFrame:
    """Config dispatch (the `[sources.*]` table of a Vector config)."""
    typ = spec["type"]
    if typ == "file":
        return file_source(
            spark,
            spec["path"],
            fmt=spec.get("format", "text"),
            schema=spec.get("schema"),
            streaming=spec.get("streaming", False),
        )
    if typ == "kafka":
        return kafka_source(
            spark,
            spec["bootstrap_servers"],
            spec["topics"],
            starting_offsets=spec.get("starting_offsets", "latest"),
        )
    if typ == "iceberg":
        return iceberg_source(spark, spec["table"])
    if typ == "generator":
        return generator_source(spark, spec.get("count", 1000), seed=spec.get("seed", 42))
    raise ValueError(f"unknown source type {typ!r}")
