"""Sinks: Vector's sink components as Spark writes.

Reference registry: src/sinks/ (35 modules — SURVEY.md §2.5); shared
machinery src/sinks/util/ (BatchConfig, partitioned batching,
retries, compression).

| Vector sink machinery                  | here                          |
|----------------------------------------|-------------------------------|
| file sink templated path + encoding    | partitionBy columns + format  |
| aws_s3 templated key_prefix batching   | partitionBy + maxRecordsPerFile |
| BatchConfig{max_bytes,max_events}      | spark.sql.files sizing / AQE coalesce |
| compression (gzip)                     | parquet codec / text codec option |
| console (Encoding::Text|Json)          | console_sink (driver show/json) |
| blackhole                              | format("noop")                |
| kafka/pulsar/...                       | kafka gated on classpath jar  |
| retries / adaptive concurrency         | Spark task retries (free)     |

Encoding note (src/sinks/file/mod.rs:64-72 Encoding::Text|Ndjson):
``encoding="ndjson"`` serializes rows via to_json → text files;
``text`` writes the message column only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sink(df: DataFrame, spec: dict) -> None:
    """Config dispatch for the `[sinks.*]` table."""
    typ = spec.get("type", "file")
    if typ == "blackhole":
        df.write.format("noop").mode("overwrite").save()
        return
    if typ == "console":
        n = spec.get("limit", 20)
        if spec.get("encoding") == "json":
            for row in df.toJSON().take(n):
                print(row)
        else:
            df.show(n, truncate=False)
        return
    if typ == "kafka":
        try:
            (
                df.select(F.to_json(F.struct(*df.columns)).alias("value"))
                .write.format("kafka")
                .option("kafka.bootstrap.servers", spec["bootstrap_servers"])
                .option("topic", spec["topic"])
                .save()
            )
        except Exception as e:  # pragma: no cover - jar not in image
            raise NotImplementedError(
                "kafka sink needs spark-sql-kafka on the classpath"
            ) from e
        return
    if typ == "iceberg":
        try:
            df.writeTo(spec["table"]).append()
        except Exception as e:  # pragma: no cover
            raise NotImplementedError(
                "iceberg sink needs the iceberg-spark-runtime jar"
            ) from e
        return
    if typ == "file":
        fmt = spec.get("format", "parquet")
        encoding = spec.get("encoding")
        out = df
        if encoding == "ndjson":
            out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
            fmt = "text"
        elif encoding == "text":
            out = df.select(F.col(spec.get("text_field", "message")).alias("value"))
            fmt = "text"
        writer = out.write.mode(spec.get("mode", "overwrite"))
        if spec.get("partition_by"):
            writer = writer.partitionBy(*spec["partition_by"])
        if spec.get("max_records_per_file"):
            writer = writer.option("maxRecordsPerFile", spec["max_records_per_file"])
        if spec.get("compression"):
            writer = writer.option("compression", spec["compression"])
        writer.format(fmt).save(spec["path"])
        return
    raise ValueError(f"unknown sink type {typ!r}")
