"""Deterministic, seed-stable synthetic fixtures (FIXTURES.md).

Everything is generated JVM-side from ``spark.range`` + hash
expressions (``xxhash64``) — no Python RNG, no driver-side loops — so
the same code generates 1k rows for unit tests and 10^12 rows on a
cluster with identical per-row values (generation is embarrassingly
parallel and row-id-keyed).

The primary table mirrors the north-rule input hint:
``sequences(doc_id string, tokens array<int>, n_tok int, source string)``
with a deliberately hot ``source`` ("web-frontend", ~40% of rows) to
exercise skew mitigation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOCAB_SIZE = 50257
MAX_TOKENS = 2048
HOT_SOURCE = "web-frontend"
N_COLD_SOURCES = 19

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _u01(seed_col, salt: int):
    """Deterministic uniform [0,1) from a column + integer salt."""
    return F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(1_000_000)) / 1_000_000.0


def sequences(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    max_tokens: int = MAX_TOKENS,
    num_partitions: int | None = None,
) -> DataFrame:
    """The pre-tokenized training-sequence table (input_hint shape).

    - ``tokens[i] = xxhash64(seed, row_id, i) mod 50257`` — fully
      deterministic per (seed, row), independent of partitioning.
    - ``n_tok`` is Zipf-ish on [1, max_tokens] (u^4 power law).
    - ``source``: 40% hot "web-frontend", remainder uniform over
      src-00..src-18 — the skew knob from FIXTURES.md F1.
    """
    base = spark.range(0, n_rows, numPartitions=num_partitions)
    rid = F.col("id")
    u_len = _u01(rid, seed * 7 + 1)
    u_src = _u01(rid, seed * 7 + 2)
    n_tok = (1 + F.floor((max_tokens - 1) * F.pow(u_len, F.lit(4.0)))).cast("int")
    source = F.when(u_src < 0.4, F.lit(HOT_SOURCE)).otherwise(
        F.format_string(
            "src-%02d", F.pmod(F.xxhash64(rid, F.lit(seed * 7 + 3)), F.lit(N_COLD_SOURCES))
        )
    )
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda i: F.pmod(F.xxhash64(rid, F.lit(seed), i), F.lit(VOCAB_SIZE)).cast("int"),
    )
    return base.select(
        F.format_string("doc-%012d", rid).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        source.alias("source"),
    )


def enrich_sources(spark: SparkSession) -> DataFrame:
    """Enrichment dimension (FIXTURES.md F6) — the broadcast-join
    analogue of Vector's enrichment-table/geoip lookups
    (reference: src/transforms/geoip.rs:126-220).

    One row per source value; deterministic attributes.
    """
    rows = [(HOT_SOURCE, "edge", "us-east-1", 0)] + [
        (
            f"src-{i:02d}",
            ["platform", "ml", "data", "infra"][i % 4],
            ["us-east-1", "eu-west-1", "ap-south-1"][i % 3],
            1 + (i % 3),
        )
        for i in range(N_COLD_SOURCES)
    ]
    return spark.createDataFrame(rows, "source string, team string, region string, tier int")


def raw_logs(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Log-line fixture table for the parser operators (FIXTURES.md F2).

    ``raw_logs(id long, message string, fmt string, host string,
    ts timestamp)`` — message families: apache common log, key=value,
    JSON, logfmt, mirroring the reference's parser unit-test inputs
    (grok_parser.rs:192-230, regex_parser.rs:342-370, json_parser.rs,
    logfmt_parser.rs).
    """
    base = spark.range(0, n_rows)
    rid = F.col("id")
    verb = F.element_at(
        F.array(F.lit("GET"), F.lit("POST"), F.lit("PUT"), F.lit("DELETE")),
        (F.pmod(F.xxhash64(rid, F.lit(seed + 11)), F.lit(4)) + 1).cast("int"),
    )
    code = F.element_at(
        F.array(F.lit(200), F.lit(200), F.lit(200), F.lit(404), F.lit(500), F.lit(301)),
        (F.pmod(F.xxhash64(rid, F.lit(seed + 12)), F.lit(6)) + 1).cast("int"),
    )
    size = F.pmod(F.xxhash64(rid, F.lit(seed + 13)), F.lit(50_000))
    ip = F.format_string(
        "%d.%d.%d.%d",
        F.pmod(F.xxhash64(rid, F.lit(seed + 14)), F.lit(223)) + 1,
        F.pmod(F.xxhash64(rid, F.lit(seed + 15)), F.lit(256)),
        F.pmod(F.xxhash64(rid, F.lit(seed + 16)), F.lit(256)),
        F.pmod(F.xxhash64(rid, F.lit(seed + 17)), F.lit(256)),
    )
    path = F.format_string(
        "/api/v1/resource/%d", F.pmod(F.xxhash64(rid, F.lit(seed + 18)), F.lit(100))
    )
    ms = F.pmod(F.xxhash64(rid, F.lit(seed + 19)), F.lit(10_000))
    ts = F.timestamp_seconds(F.lit(1_540_000_000) + rid * 7)

    apache = F.format_string(
        '%s - frank [12/Dec/2015:18:32:56 +0100] "%s %s HTTP/1.1" %d %d', ip, verb, path, code, size
    )
    kv = F.format_string("status=%d time=%d", code, ms)
    js = F.format_string(
        '{"greeting": "hello", "name": "user-%d", "code": %d}',
        F.pmod(F.xxhash64(rid, F.lit(seed + 20)), F.lit(50)),
        code,
    )
    logfmt = F.format_string('level=info msg="request done" id=%d dur=%dms', rid, ms)

    fmt_idx = F.pmod(rid, F.lit(4))
    message = (
        F.when(fmt_idx == 0, apache)
        .when(fmt_idx == 1, kv)
        .when(fmt_idx == 2, js)
        .otherwise(logfmt)
    )
    fmt = (
        F.when(fmt_idx == 0, F.lit("apache"))
        .when(fmt_idx == 1, F.lit("kv"))
        .when(fmt_idx == 2, F.lit("json"))
        .otherwise(F.lit("logfmt"))
    )
    host = F.format_string("host-%d", F.pmod(rid, F.lit(8)))
    return base.select(
        rid.alias("id"),
        message.alias("message"),
        fmt.alias("fmt"),
        host.alias("host"),
        ts.alias("ts"),
    )
