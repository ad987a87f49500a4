"""Skew mitigation + extended VRL function surface + 1→N parser."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.fixtures import HOT_SOURCE, sequences
from vector_spark.functions.vrl import (
    encode_logfmt,
    format_int,
    ip_ntoa,
    ip_subnet,
    parse_duration_seconds,
    parse_int,
    parse_query_string,
    parse_url,
    redact,
    to_syslog_level,
    to_syslog_severity,
)
from vector_spark.conditions import ip_aton
from vector_spark.operators.core import field_filter
from vector_spark.operators.parsers import json_array_parser
from vector_spark.skew import explode_salted_join, salted_agg, salted_join


def test_salted_agg_equals_plain_agg(spark):
    df = sequences(spark, 3000)
    plain = {
        (r.source): (r.cnt, r.sum_n)
        for r in df.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_tok").alias("sum_n"))
        .collect()
    }
    salted = salted_agg(
        df,
        ["source"],
        [F.count(F.lit(1)).alias("c"), F.sum("n_tok").alias("s")],
        [F.sum("c").alias("cnt"), F.sum("s").alias("sum_n")],
        n_salts=8,
    )
    got = {r.source: (r.cnt, r.sum_n) for r in salted.collect()}
    assert got == plain
    # phase-1 spread: the hot key occupies multiple salt buckets
    from vector_spark.skew import with_salt

    spread = (
        with_salt(df.filter(F.col("source") == HOT_SOURCE), 8)
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread >= 6


def test_salted_join_matches_plain_join(spark):
    from vector_spark.fixtures import enrich_sources

    df = sequences(spark, 1000)
    dim = enrich_sources(spark)
    plain = df.join(dim, "source", "left").select("doc_id", "team")
    for fn in (salted_join, explode_salted_join):
        got = fn(df, dim, on="source", n_salts=4).select("doc_id", "team")
        assert {tuple(r) for r in got.collect()} == {tuple(r) for r in plain.collect()}


def test_parse_url_and_query_string(spark):
    df = spark.createDataFrame(
        [("https://example.com:8080/a/b?x=1&y=two#frag",)], "url string"
    )
    r = df.select(parse_url(F.col("url")).alias("u")).first().u
    assert r.scheme == "https" and r.path == "/a/b" and r.fragment == "frag"
    q = df.select(
        parse_query_string(F.regexp_extract("url", r"\?([^#]*)", 1)).alias("q")
    ).first().q
    assert q == {"x": "1", "y": "two"}


def test_parse_duration(spark):
    df = spark.createDataFrame([("300ms",), ("5m",), ("2h",), ("bogus",)], "d string")
    vals = [r.s for r in df.select(parse_duration_seconds(F.col("d")).alias("s")).collect()]
    assert vals[0] == 0.3 and vals[1] == 300.0 and vals[2] == 7200.0 and vals[3] is None


def test_syslog_mappings(spark):
    df = spark.createDataFrame([("err",), ("INFO",)], "lvl string")
    sev = [r.s for r in df.select(to_syslog_severity(F.col("lvl")).alias("s")).collect()]
    assert sev == [3, 6]
    lvl = spark.range(1).select(to_syslog_level(F.lit(4)).alias("l")).first().l
    assert lvl == "warning"


def test_ip_functions(spark):
    df = spark.createDataFrame([("192.168.1.77",)], "ip string")
    assert df.select(ip_aton(F.col("ip")).alias("n")).first().n == 3232235853
    assert (
        df.select(ip_ntoa(ip_aton(F.col("ip"))).alias("s")).first().s == "192.168.1.77"
    )
    assert df.select(ip_subnet(F.col("ip"), 24).alias("s")).first().s == "192.168.1.0"


def test_redact_parse_int_format_int(spark):
    df = spark.createDataFrame([("card 4111111111111111 ok", "ff")], "t string, h string")
    assert (
        df.select(redact(F.col("t"), r"\d{16}").alias("r")).first().r
        == "card [REDACTED] ok"
    )
    assert df.select(parse_int(F.col("h"), 16).alias("v")).first().v == 255
    assert spark.range(1).select(format_int(F.lit(255), 16).alias("x")).first().x == "ff"


def test_encode_logfmt(spark):
    df = spark.createDataFrame(
        [({"level": "info", "msg": "shutting down"},)], "m map<string,string>"
    )
    out = df.select(encode_logfmt(F.col("m")).alias("line")).first().line
    assert out == 'level=info msg="shutting down"'


def test_field_filter(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    assert [r.k for r in field_filter(df, "k", "a").collect()] == ["a"]


def test_json_array_parser_one_to_n(spark):
    # aws_cloudwatch_logs_subscription_parser shape: one event per record
    df = spark.createDataFrame(
        [
            ("grp1", '[{"id": 1, "message": "a"}, {"id": 2, "message": "b"}]'),
            ("grp2", '[{"id": 3, "message": "c"}]'),
        ],
        "log_group string, message string",
    )
    out = json_array_parser(df, field="message", element_schema="id long, message string")
    rows = sorted((r.log_group, r.id, r.message) for r in out.collect())
    assert rows == [("grp1", 1, "a"), ("grp1", 2, "b"), ("grp2", 3, "c")]


def test_salted_join_spreads_hot_key_over_reducers(spark):
    """Regression (VERDICT r1 #2): the old salted_join salted BOTH
    sides with hash(key) % n — every hot-key row got the SAME salt and
    the hot key still landed on one reducer. The canonical salted_join
    is now the explode variant: hot-key rows must scatter across >1
    shuffle partition of the (key, salt) distribution."""
    assert salted_join is explode_salted_join
    df = sequences(spark, 2000)
    hot = df.filter(F.col("source") == HOT_SOURCE)
    # same salt derivation as explode_salted_join's big side
    big_s = hot.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8))
    )
    n_parts = (
        big_s.repartition(8, F.col("source"), F.col("_salt"))
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts > 1, "hot key must spread over multiple reducers"
    n_salts = big_s.select("_salt").distinct().count()
    assert n_salts >= 6
