"""Named log-format parsers + bucketed co-located join (the
shuffle-free join path for repeated large-large joins at scale)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from vector_spark.functions.logformats import (
    parse_apache_log,
    parse_glog,
    parse_nginx_log,
    parse_syslog,
)


def test_parse_syslog(spark):
    line = "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed for lonvick"
    df = spark.createDataFrame([(line,)], "message string")
    r = parse_syslog(df).first()
    assert r.priority == 34
    assert r.hostname == "mymachine"
    assert r.appname == "su" and r.procid == 230
    assert r.message_text.startswith("'su root' failed")


def test_parse_glog(spark):
    line = "I0816 12:34:56.789012 1234 server.cc:42] request handled"
    df = spark.createDataFrame([(line,)], "message string")
    r = parse_glog(df).first()
    assert r.level == "I" and r.line == 42 and r.file == "server.cc"
    assert r.thread_id == 1234 and r.message_text == "request handled"


def test_parse_apache_combined_and_nginx(spark):
    line = (
        '10.0.0.1 - alice [12/Dec/2015:18:32:56 +0100] "POST /submit HTTP/1.1" '
        '201 123 "http://ref.example" "curl/8.0"'
    )
    df = spark.createDataFrame([(line,)], "message string")
    for fn in (lambda d: parse_apache_log(d, format="combined"), parse_nginx_log):
        r = fn(df).first()
        assert r.verb == "POST" and r.response == 201 and r.bytes == 123
        assert r.referrer == '"http://ref.example"'
        assert r.auth == "alice"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """bucketBy co-location: joining two tables bucketed on the same
    key must not Exchange either side — the repeated-join strategy for
    fact-fact joins at 100 TB (SURVEY.md §4 skew/partitioning row)."""
    suffix = uuid.uuid4().hex[:8]
    a_name, b_name = f"vs_a_{suffix}", f"vs_b_{suffix}"
    df = spark.range(1000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 97).alias("v"),
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        (
            df.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite")
            .saveAsTable(a_name)
        )
        (
            df.withColumnRenamed("v", "w").write.bucketBy(8, "doc_id").sortBy("doc_id")
            .mode("overwrite").saveAsTable(b_name)
        )
        # disable broadcast so the planner uses the bucketed SMJ path
        # (at real scale both sides are too big to broadcast anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(a_name).join(spark.table(b_name), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql(f"DROP TABLE IF EXISTS {a_name}")
        spark.sql(f"DROP TABLE IF EXISTS {b_name}")
