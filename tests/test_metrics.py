"""log_to_metric / aggregate / tags / tag_cardinality_limit /
metric_to_log — golden cases from log_to_metric.rs:404-856."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vector_spark.operators import (
    add_tags,
    aggregate_metrics,
    log_to_metric,
    metric_to_log,
    remove_tags,
    tag_cardinality_limit,
)
from vector_spark.operators.metrics import histogram_buckets

TS = datetime.datetime(2018, 11, 14, 8, 9, 10)


def _log_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_counter_basic(spark):
    # log_to_metric.rs `count_http_status_codes`-style: counter value 1
    df = _log_df(spark, [("i am a log", "42", TS)], "message string, status string, timestamp timestamp")
    out = log_to_metric(df, [{"type": "counter", "field": "status"}])
    r = out.first()
    assert r.name == "status" and r.value == 1.0 and r.kind == "incremental"
    assert r.ts == TS


def test_counter_templated_tags_and_missing_tag_dropped(spark):
    # `count_http_requests_with_tags`: tags {method:{{method}}, code:{{code}},
    # host:localhost}; a template referencing a missing field drops that tag
    df = _log_df(
        spark,
        [("i am a log", "post", "200", TS)],
        "message string, method string, code string, timestamp timestamp",
    )
    out = log_to_metric(
        df,
        [
            {
                "type": "counter",
                "field": "message",
                "name": "http_requests_total",
                "namespace": "app",
                "tags": {
                    "method": "{{method}}",
                    "code": "{{code}}",
                    "host": "localhost",
                },
            }
        ],
    )
    r = out.first()
    assert r.name == "http_requests_total" and r.namespace == "app"
    assert r.tags == {"method": "post", "code": "200", "host": "localhost"}


def test_counter_increment_by_value(spark):
    df = _log_df(spark, [("x", "33.99", TS)], "message string, amount string, timestamp timestamp")
    out = log_to_metric(df, [{"type": "counter", "field": "amount", "increment_by_value": True}])
    assert out.first().value == 33.99


def test_gauge_and_set(spark):
    df = _log_df(
        spark,
        [("x", "123", "1.2.3.4", TS), ("x", "200", "5.6.7.8", TS), ("x", "201", "1.2.3.4", TS)],
        "message string, memory_rss string, user_ip string, timestamp timestamp",
    )
    gauges = log_to_metric(df, [{"type": "gauge", "field": "memory_rss"}])
    assert gauges.first().kind == "absolute"
    sets = log_to_metric(df, [{"type": "set", "field": "user_ip"}])
    agg = aggregate_metrics(sets)
    r = agg.first()
    assert r.value == 2.0  # two distinct IPs
    assert sorted(r.set_values) == ["1.2.3.4", "5.6.7.8"]


def test_missing_field_emits_nothing(spark):
    df = _log_df(spark, [("x", None, TS)], "message string, status string, timestamp timestamp")
    out = log_to_metric(df, [{"type": "counter", "field": "status"}])
    assert out.count() == 0


def test_aggregate_counter_sums_gauge_last(spark):
    df = _log_df(
        spark,
        [
            ("x", "1", "100", TS),
            ("x", "1", "150", TS + datetime.timedelta(seconds=1)),
        ],
        "message string, hit string, mem string, timestamp timestamp",
    )
    metrics = log_to_metric(
        df,
        [
            {"type": "counter", "field": "hit"},
            {"type": "gauge", "field": "mem"},
        ],
    )
    agg = aggregate_metrics(metrics)
    rows = {r.name: r.value for r in agg.collect()}
    assert rows == {"hit": 2.0, "mem": 150.0}  # counter adds, gauge last-write


def test_aggregate_tumbling_window(spark):
    df = _log_df(
        spark,
        [
            ("x", "1", TS),
            ("x", "1", TS + datetime.timedelta(seconds=5)),
            ("x", "1", TS + datetime.timedelta(seconds=15)),
        ],
        "message string, hit string, timestamp timestamp",
    )
    metrics = log_to_metric(df, [{"type": "counter", "field": "hit"}])
    agg = aggregate_metrics(metrics, interval="10 seconds")
    vals = sorted(r.value for r in agg.collect())
    assert vals == [1.0, 2.0]


def test_histogram_buckets(spark):
    df = spark.createDataFrame([(5.0,), (15.0,), (50.0,), (200.0,)], "time_ms double")
    out = histogram_buckets(df, "time_ms", [10.0, 100.0])
    r = out.first()
    assert r.le_10_0 == 1 and r.le_100_0 == 3 and r["count"] == 4 and r["sum"] == 270.0


def test_add_remove_tags(spark):
    df = spark.createDataFrame(
        [("m", {"a": "1"})], "name string, tags map<string,string>"
    )
    out = add_tags(df, {"b": "2", "a": "override"})
    assert out.first().tags == {"a": "override", "b": "2"}
    out2 = add_tags(df, {"a": "no"}, overwrite=False)
    assert out2.first().tags == {"a": "1"}
    out3 = remove_tags(out, ["a"])
    assert out3.first().tags == {"b": "2"}


def test_tag_cardinality_limit_drop_tag(spark):
    rows = [(i, {"user": f"u{i}", "env": "prod"}) for i in range(10)]
    df = spark.createDataFrame(rows, "ts long, tags map<string,string>")
    out = tag_cardinality_limit(df, value_limit=3, action="drop_tag", order_by="ts")
    collected = sorted(out.collect(), key=lambda r: r.ts)
    # first 3 users kept; later users' tag stripped; env always kept
    assert collected[0].tags == {"user": "u0", "env": "prod"}
    assert collected[2].tags == {"user": "u2", "env": "prod"}
    assert collected[5].tags == {"env": "prod"}


def test_tag_cardinality_limit_drop_event(spark):
    rows = [(i, {"user": f"u{i}"}) for i in range(10)]
    df = spark.createDataFrame(rows, "ts long, tags map<string,string>")
    out = tag_cardinality_limit(df, value_limit=4, action="drop_event", order_by="ts")
    assert sorted(r.ts for r in out.collect()) == [0, 1, 2, 3]


def test_metric_to_log(spark):
    df = spark.createDataFrame(
        [("cnt", None, {"host": "h1", "env": "p"}, TS, "incremental", "counter", 3.0, None)],
        "name string, namespace string, tags map<string,string>, ts timestamp, "
        "kind string, metric_type string, value double, set_value string",
    )
    out = metric_to_log(df, host_tag="host")
    r = out.first()
    assert r.name == "cnt" and r.value == 3.0 and r.host == "h1"
    assert r.timestamp == TS


def test_summary_quantiles_subcent_sum_and_no_abort(spark):
    """ADVICE r2: the fixed-point sum must not round away sub-cent
    magnitudes (latencies in seconds) and must NEVER abort on huge
    values — try_cast excludes them as null instead."""
    from vector_spark.operators.metrics import summary_quantiles

    df = spark.createDataFrame(
        [(0.001,), (0.002,), (0.003,)], "v double"
    )
    r = summary_quantiles(df, "v", quantiles=[0.5], exact=True).first()
    assert abs(r.sum - 0.006) < 1e-9  # decimal(38,6) keeps 6 dp
    # |v| >= 1e16 overflowed the old decimal(18,2) cast → ANSI job
    # abort; now excluded per-value, job completes
    big = spark.createDataFrame([(1e33,), (2.5,)], "v double")
    r2 = summary_quantiles(big, "v", quantiles=[0.5], exact=True).first()
    assert r2.sum == 2.5 and r2["count"] == 2
    # sum_decimal=None -> reference-parity plain f64 sum
    r3 = summary_quantiles(big, "v", quantiles=[0.5], exact=True, sum_decimal=None).first()
    assert r3.sum == 1e33 + 2.5


def test_tag_cardinality_runaway_key_salted_ranking(spark):
    """VERDICT r2: a key at >>value_limit cardinality must never be
    sorted by one task — the ranking stage partitions on (key, salt).
    Result must equal the reference first-N-by-arrival semantics."""
    rows = [(i, {"user": f"u{i:05d}", "env": "prod"}) for i in range(2000)]
    df = spark.createDataFrame(rows, "ts long, tags map<string,string>")
    out = tag_cardinality_limit(df, value_limit=10, action="drop_tag", order_by="ts")
    got = out.orderBy("ts").collect()
    # first 10 arrivals keep their user tag, the rest lose it
    for r in got[:10]:
        assert r.tags and "user" in r.tags
    for r in got[10:]:
        assert r.tags == {"env": "prod"}
    # the local ranking stage must shuffle on (_k, _salt), not _k alone
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_distribution_statistic_weighted_r3(spark):
    """statistic.rs:23-105 parity: rate-weighted sum/count, rate<=0
    samples dropped, R-3 quantiles (i-th smallest, i=round(p*count),
    i=0 => 1, first cumulative rate >= i)."""
    from vector_spark.operators.metrics import distribution_statistic

    rows = [(1.0, 3), (2.0, 1), (3.0, 2), (99.0, 0)]  # rate 0 dropped
    df = spark.createDataFrame(rows, "value double, rate long")
    r = distribution_statistic(df, quantiles=[0.95]).first()
    assert r["count"] == 6 and abs(r["sum"] - 11.0) < 1e-9
    assert r["min"] == 1.0 and r["max"] == 3.0
    # i = round(0.5*6) = 3 -> cumulative [3,4,6] -> first >= 3 is 1.0
    assert r["median"] == 1.0
    # i = round(0.95*6) = 6 -> 3.0
    assert r["q95"] == 3.0
    assert abs(r["avg"] - 11.0 / 6.0) < 1e-9
    # single-sample series: every quantile is the value, sum=v*rate
    one = spark.createDataFrame([(5.0, 4)], "value double, rate long")
    r1 = distribution_statistic(one, quantiles=[0.99]).first()
    assert (r1["median"], r1["q99"], r1["sum"], r1["count"]) == (5.0, 5.0, 20.0, 4)


def test_aggregate_metrics_rate_weighted(spark):
    """Distribution sample rate weights sums and counts in the
    aggregate rollup; rate-free frames behave exactly as before."""
    from vector_spark.operators.metrics import aggregate_metrics

    rows = [
        ("lat", None, None, TS, "incremental", "distribution", 2.0, None, 3),
        ("lat", None, None, TS, "incremental", "distribution", 4.0, None, 1),
    ]
    schema = (
        "name string, namespace string, tags map<string,string>, ts timestamp, "
        "kind string, metric_type string, value double, set_value string, rate long"
    )
    df = spark.createDataFrame(rows, schema)
    r = aggregate_metrics(df).first()
    assert r["count"] == 4 and r["sum"] == 10.0 and r["value"] == 10.0
    # no rate column -> weight 1 (legacy frames)
    legacy = df.drop("rate")
    r2 = aggregate_metrics(legacy).first()
    assert r2["count"] == 2 and r2["sum"] == 6.0


def test_rollup_metrics_one_pass_grouping_sets(spark):
    from vector_spark.operators.metrics import rollup_metrics
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 0, 1), "a", 1.0),
        (dt.datetime(2024, 1, 1, 0, 7), "a", 2.0),
        (dt.datetime(2024, 1, 1, 1, 1), "a", 4.0),
        (dt.datetime(2024, 1, 2, 0, 0), "b", 8.0),
    ]
    df = spark.createDataFrame(rows, "timestamp timestamp, name string, value double")
    out = rollup_metrics(df)
    rows_by = {(r.tier, r.name, str(r.window_start)): r for r in out.collect()}
    # 5m tier: three windows for 'a'
    assert rows_by[("5m", "a", "2024-01-01 00:00:00")].sum_value == 1.0
    assert rows_by[("5m", "a", "2024-01-01 00:05:00")].sum_value == 2.0
    # 1h tier folds the first two
    assert rows_by[("1h", "a", "2024-01-01 00:00:00")].sum_value == 3.0
    assert rows_by[("1h", "a", "2024-01-01 01:00:00")].n == 1
    # 1d tier folds all of Jan 1 for 'a'
    assert rows_by[("1d", "a", "2024-01-01 00:00:00")].sum_value == 7.0
    assert rows_by[("1d", "b", "2024-01-02 00:00:00")].max_value == 8.0
    # one pass over the input: the optimized plan has a single Expand
    # over a single relation (AQE's physical dump repeats subtrees)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Expand") == 1
    assert plan.count("LogicalRDD") == 1
