"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` exercises a vector_spark operator
(SURVEY.md §2 inventory) through the library's public API, and
``oracle_sql()`` carries the equivalent ANSI SQL for DuckDB over the
same parquet tables. Column names/types are aligned on both sides so
the driver's order-insensitive value-hash matches.

Cross-engine parity rules used throughout:
- hashes are md5 hex strings (identical in both engines);
- double aggregations go through decimal(18,2) casts or round(, n);
- integer division is explicit floor();
- deterministic tiebreaks on every window/top-k.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make vector_spark importable regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# Primary key per table: redistribution hashes on it so downstream
# equi-joins / self-joins on the key can reuse the one exchange instead
# of adding their own (multi-arm parse gates join back on event_id).
_TABLE_KEY = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}

# (path) -> (rows, row_groups, bytes); footer reads are KBs, driver-side
_SCAN_META: dict[str, tuple[int, int, int]] = {}

# Redistribute a scan when its split count is far below the session's
# parallelism AND the table is big enough that pre-shuffle compute
# dominates the one extra (tiny) shuffle. Parameterised, local defaults.
_REDIST_MIN_ROWS = int(os.environ.get("SPARK_GRAFT_REDIST_MIN_ROWS", "20000"))
_REDIST_MODE = os.environ.get("SPARK_GRAFT_SCAN_REDIST", "auto")  # auto|off|force


def _load(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    redistribute: bool = True,
    min_rows: int | None = None,
) -> DataFrame:
    """``min_rows`` overrides the redistribution row threshold for
    gates whose per-row compute is heavy enough (shingling, regex
    sweeps, vector arithmetic) that even a few thousand rows are worth
    a redistribution shuffle (measured per-gate; see
    OPTIMIZATION_r06.md)."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if _REDIST_MODE == "off" or not redistribute:
        return df
    meta = _SCAN_META.get(path)
    if meta is None:
        try:
            import pyarrow.parquet as _pq

            pf = _pq.ParquetFile(path)
            meta = (
                pf.metadata.num_rows,
                pf.metadata.num_row_groups,
                os.path.getsize(path),
            )
        except Exception:
            meta = (0, 1, 0)
        _SCAN_META[path] = meta
    rows, row_groups, nbytes = meta
    # A parquet ROW GROUP is the minimum split granularity: the driver's
    # generated tables are single files with ~10^6-row row groups, so a
    # scan cannot run wider than ~row_groups tasks no matter the core
    # count (guide §2.5 "input skew": one huge unsplittable file →
    # repartition immediately after the read). Effective splits are
    # additionally capped by maxPartitionBytes byte-ranges.
    mpb = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    splits = min(row_groups, max(1, -(-nbytes // mpb)))
    par = spark.sparkContext.defaultParallelism
    n = int(spark.conf.get("spark.sql.shuffle.partitions", str(par)))
    threshold = _REDIST_MIN_ROWS if min_rows is None else min_rows
    if _REDIST_MODE == "force" or (rows >= threshold and splits < par // 2):
        key = _TABLE_KEY.get(name)
        if key is not None:
            # explicit numPartitions (= session shuffle partitions):
            # AQE keeps REPARTITION_BY_NUM exchanges uncoalesced, and a
            # later join on the key sees hashpartitioning(key, n) on
            # both sides → no further exchange
            df = df.repartition(n, F.col(key))
        else:
            df = df.repartition(n)
    return df


# ---------------------------------------------------------------------------
# flagship pipeline: parse → enrich → route → aggregate over events
# ---------------------------------------------------------------------------

_ENRICH_ROWS = [
    ("click", "interaction", 1),
    ("view", "interaction", 0),
    ("signup", "conversion", 5),
    ("purchase", "conversion", 10),
    ("error", "fault", -1),
]


def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """remap → filter → enrich (broadcast) → route → per-lane counts.

    The whole Vector pipeline shape in one plan: the result is the
    per-(lane, event_type) aggregate counts + summed value — the
    'log_to_metric per sink' output of SURVEY.md §7 Phase 1.
    """
    from vector_spark.plans import Pipeline

    events = _load(spark, sf_dir, "events").withColumnRenamed("ts", "timestamp")
    dim = spark.createDataFrame(_ENRICH_ROWS, "event_type string, category string, weight int")
    cfg = {
        "transforms": {
            "derive": {
                "type": "remap",
                "inputs": ["in"],
                "assignments": [
                    (".vtier", 'if_else(.value < 5.0, "low", if_else(.value < 15.0, "mid", "high"))'),
                ],
            },
            "keep": {"type": "filter", "inputs": ["derive"], "condition": ".value >= 1.0"},
            "enrich_type": {"type": "enrich", "inputs": ["keep"], "table": "etypes", "on": "event_type"},
            "router": {
                "type": "route",
                "inputs": ["enrich_type"],
                "routes": {
                    "faults": '.category == "fault"',
                    "big": '.vtier == "high"',
                    "rest": '.category != "fault" && .vtier != "high"',
                },
            },
        },
        "sinks": {
            "faults": {"inputs": ["router.faults"]},
            "big": {"inputs": ["router.big"]},
            "rest": {"inputs": ["router.rest"]},
        },
    }
    pipe = Pipeline(cfg, enrich_tables={"etypes": dim})
    # single-scan scale path: every live row explodes into one copy per
    # matching lane, then ONE groupBy — the input is scanned once (the
    # previous per-lane union re-scanned the parquet once per sink)
    exploded = pipe.lanes_exploded(events)
    return exploded.groupBy("lane", "event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )


_FLAGSHIP_ORACLE = """
WITH base AS (
  SELECT *,
         CASE WHEN value < 5.0 THEN 'low' WHEN value < 15.0 THEN 'mid' ELSE 'high' END AS vtier,
         CASE event_type WHEN 'click' THEN 'interaction' WHEN 'view' THEN 'interaction'
              WHEN 'signup' THEN 'conversion' WHEN 'purchase' THEN 'conversion'
              WHEN 'error' THEN 'fault' END AS category
  FROM events WHERE value >= 1.0
), lanes AS (
  SELECT 'faults' AS lane, * FROM base WHERE category = 'fault'
  UNION ALL
  SELECT 'big' AS lane, * FROM base WHERE vtier = 'high'
  UNION ALL
  SELECT 'rest' AS lane, * FROM base WHERE category <> 'fault' AND vtier <> 'high'
)
SELECT lane, event_type, count(*) AS cnt,
       cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
FROM lanes GROUP BY lane, event_type
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# per-operator queries (Spark via library ops) + DuckDB oracles
# ---------------------------------------------------------------------------


def _q_filter(spark, sf):
    from vector_spark.operators import filter_events

    ev = _load(spark, sf, "events")
    out = filter_events(ev, '.event_type == "error" && .value > 10.0')
    return out.select("event_id", "event_type", "value")


def _q_route(spark, sf):
    """Non-exclusive route lanes + a field_filter lane (field_filter.rs
    is route's single-predicate ancestor) — one gate covers both
    condition-driven fan-out operators."""
    from vector_spark.operators import route_split
    from vector_spark.operators.core import field_filter

    ev = _load(spark, sf, "events")
    lanes = route_split(
        ev,
        {
            "errors": '.event_type == "error"',
            "high_value": ".value >= 15.0",
            "rest": '.event_type != "error" && .value < 15.0',
        },
    )
    parts = [
        df.select(F.lit(name).alias("lane"), "event_id") for name, df in lanes.items()
    ]
    parts.append(
        field_filter(ev, "event_type", "purchase").select(
            F.lit("purchases").alias("lane"), "event_id"
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _q_sample(spark, sf):
    # md5-hex-prefix sampling: engine-portable determinism (the
    # engine's native path is xxhash64 — see operators/core.py sample)
    ev = _load(spark, sf, "events")
    h = F.md5(F.col("event_id").cast("string"))
    out = ev.filter(F.substring(h, 1, 1).isin("0", "1", "2", "3")).withColumn(
        "sample_rate", F.lit(4)
    )
    return out.select("event_id", "event_type", "sample_rate")


def _q_remap(spark, sf):
    from vector_spark.operators import remap

    ev = _load(spark, sf, "events")
    out = remap(
        ev,
        [
            (".etype_up", "upcase(.event_type)"),
            (".value2", "round(.value * 2.0 + 1.0, 2)"),
            (".vnz", ".value ?? 0.0"),
        ],
    )
    return out.select("event_id", "etype_up", "value2", "vnz")


def _q_remap_program(spark, sf):
    """Multi-statement VRL PROGRAM (control flow, local variables, del,
    abort) compiled to ONE projection by symbolic execution — the
    remap.rs `source` surface with if/else statements
    (lib/vrl/compiler/src/expression/if_statement.rs, assignment.rs,
    block.rs). Abort keeps remap's rollback semantics: 'purchase'
    events pass through with NO assignments applied."""
    from vector_spark.operators import remap_program

    ev = _load(spark, sf, "events")
    prog = """
    hi = 100.0
    if .value > hi {
        .tier = "high"
        .score = .value * 2.0
    } else if .value > hi / 2.0 {
        .tier = "mid"
        .score = .value
    } else {
        .tier = "low"
        .score = 0.0
    }
    if .event_type == "error" {
        .flag = true
        del(.props)
    } else {
        .flag = false
    }
    .label = .event_type + "/" + .tier
    if .event_type == "purchase" { abort }
    """
    out = remap_program(ev, prog)
    return out.select(
        "event_id",
        "tier",
        F.round(F.col("score"), 2).alias("score"),
        # int, not boolean: a NULL boolean round-trips differently
        # through the two engines' pandas bridges
        F.col("flag").cast("int").alias("flag"),
        "label",
        F.col("props").alias("props_left"),
    )


def _q_json_parser(spark, sf):
    from vector_spark.operators import json_parser

    ev = _load(spark, sf, "events")
    out = json_parser(ev, field="props", schema="k long", target_field=None, drop_field=False)
    return out.select("event_id", F.col("k").alias("prop_k"))


def _q_grok(spark, sf):
    """Grok vocabulary gate: three pattern families in one composite —
    HTTPD_COMMONLOG (apache), SYSLOGLINE and HAPROXYHTTPBASE (both
    outside the round-3 registry). Each parse is a map-only regexp
    projection; the three results equi-join back on event_id."""
    from vector_spark.operators import grok_parser

    ev = _load(spark, sf, "events")
    msg = F.format_string(
        '10.0.%d.%d - frank [12/Dec/2015:18:32:56 +0100] "GET /api/%d HTTP/1.1" %d %d',
        F.pmod(F.col("user_id"), F.lit(256)),
        F.pmod(F.col("event_id"), F.lit(256)),
        F.col("event_id"),
        F.lit(200) + F.pmod(F.col("event_id"), F.lit(3)) * 100,
        (F.col("value") * 100).cast("long"),
    )
    apache = grok_parser(
        ev.select("event_id", msg.alias("message")),
        "%{HTTPD_COMMONLOG}",
        types={"response": "int", "bytes": "int"},
    ).select("event_id", "clientip", "verb", "request", "response", "bytes")

    sysmsg = F.format_string(
        "Oct %d 22:14:15 host%d cron[%d]: job %d finished",
        F.lit(1) + F.pmod(F.col("event_id"), F.lit(28)),
        F.col("user_id"),
        F.pmod(F.col("event_id"), F.lit(1000)),
        F.col("event_id"),
    )
    syslog = grok_parser(
        ev.select("event_id", sysmsg.alias("message")),
        "%{SYSLOGLINE}",
        types={"pid": "int"},
    ).select(
        "event_id",
        F.col("logsource").alias("sys_host"),
        F.col("program").alias("sys_prog"),
        F.col("pid").alias("sys_pid"),
        F.col("message").alias("sys_msg"),
    )

    hamsg = F.format_string(
        '10.1.%d.%d:%d [09/Feb/2024:10:00:01.123] ft_web bk_web/srv%d '
        '0/0/1/%d/3 %d 1024 - - ---- 10/10/5/5/0 0/0 "GET /page/%d HTTP/1.1"',
        F.pmod(F.col("user_id"), F.lit(200)),
        F.pmod(F.col("event_id"), F.lit(200)),
        F.lit(40000) + F.pmod(F.col("event_id"), F.lit(1000)),
        F.lit(1) + F.pmod(F.col("event_id"), F.lit(4)),
        F.pmod(F.col("event_id"), F.lit(50)),
        F.lit(200) + F.pmod(F.col("event_id"), F.lit(4)) * 100,
        F.col("event_id"),
    )
    haproxy = grok_parser(
        ev.select("event_id", hamsg.alias("message")),
        "%{HAPROXYHTTPBASE}",
        types={"http_status_code": "int", "time_backend_response": "int"},
    ).select(
        "event_id",
        F.col("client_ip").alias("ha_client_ip"),
        F.col("server_name").alias("ha_server"),
        F.col("time_backend_response").alias("ha_t_resp"),
        F.col("http_status_code").alias("ha_status"),
        F.col("http_request").alias("ha_request"),
    )
    pgmsg = F.format_string(
        "12/%02d/2015 10:00:%02d UTC user=u%d conn%d %d",
        F.lit(1) + F.pmod(F.col("event_id"), F.lit(28)),
        F.pmod(F.col("event_id"), F.lit(60)),
        F.col("user_id"),
        F.col("event_id"),
        F.lit(100) + F.pmod(F.col("event_id"), F.lit(900)),
    )
    pg = grok_parser(
        ev.select("event_id", pgmsg.alias("message")),
        "%{POSTGRESQL}",
        types={"pid": "int"},
    ).select(
        "event_id",
        F.col("timestamp").alias("pg_ts"),
        F.col("user_id").alias("pg_user"),
        F.col("connection_id").alias("pg_conn"),
        F.col("pid").alias("pg_pid"),
    )

    rlmsg = F.format_string(
        'Started GET "/items/%d" for 10.3.0.%d at 2015-02-%02d 10:00:%02d +0100',
        F.col("event_id"),
        F.pmod(F.col("user_id"), F.lit(256)),
        F.lit(1) + F.pmod(F.col("event_id"), F.lit(28)),
        F.pmod(F.col("event_id"), F.lit(60)),
    )
    rails = grok_parser(
        ev.select("event_id", rlmsg.alias("message")),
        "%{RAILS3HEAD}",
    ).select(
        "event_id",
        F.col("verb").alias("rl_verb"),
        F.col("request").alias("rl_request"),
        F.col("clientip").alias("rl_clientip"),
        F.col("timestamp").alias("rl_ts"),
    )

    return (
        apache.join(syslog, "event_id")
        .join(haproxy, "event_id")
        .join(pg, "event_id")
        .join(rails, "event_id")
    )


def _q_grok_services(spark, sf):
    """Round-5 grok vocabulary: the service-log families from the
    logstash base library — POSTGRESQL, MONGO3_LOG, REDISMONLOG, EXIM,
    RAILS3HEAD — each a map-only regexp projection over a
    deterministic printf-built line, equi-joined 1:1 on event_id (the
    window `grok_parser` composite folds the postgres + rails arms)."""
    from vector_spark.operators import grok_parser

    ev = _load(spark, sf, "events")

    def arm(fmt, args, pattern, picks, types=None):
        msg = F.format_string(fmt, *args)
        parsed = grok_parser(
            ev.select("event_id", msg.alias("message")), pattern, types=types
        )
        return parsed.select(
            "event_id", *[F.col(src).alias(dst) for src, dst in picks]
        )

    e, u = F.col("event_id"), F.col("user_id")
    mongo = arm(
        "2015-01-%02dT10:00:%02d.000+0000 I NETWORK [conn%d] end connection 10.0.0.%d",
        [F.lit(1) + F.pmod(e, F.lit(28)), F.pmod(e, F.lit(60)), e,
         F.pmod(u, F.lit(256))],
        "%{MONGO3_LOG}",
        [("timestamp", "mg_ts"), ("severity", "mg_sev"),
         ("component", "mg_comp"), ("context", "mg_ctx"),
         ("message", "mg_msg")],
    )
    redis = arm(
        '1424%06d.%06d [%d 10.2.3.%d:%d] "GET" key:%d',
        [F.pmod(e, F.lit(1000000)), F.pmod(e, F.lit(1000000)),
         F.pmod(e, F.lit(16)), F.pmod(u, F.lit(256)),
         F.lit(40000) + F.pmod(e, F.lit(10000)), e],
        "%{REDISMONLOG}",
        [("timestamp", "rd_ts"), ("database", "rd_db"),
         ("client", "rd_client"), ("port", "rd_port"),
         ("command", "rd_cmd"), ("params", "rd_params")],
        types={"database": "int", "port": "int"},
    )
    exim = arm(
        "2015-03-%02d 11:22:%02d %06d-AbCdEf-%02d <= u%d@example.com S=%d",
        [F.lit(1) + F.pmod(e, F.lit(28)), F.pmod(e, F.lit(60)),
         F.pmod(e, F.lit(1000000)), F.pmod(e, F.lit(100)), u,
         F.lit(100) + F.pmod(e, F.lit(5000))],
        "%{EXIM}",
        [("timestamp", "ex_ts"), ("msgid", "ex_msgid"),
         ("flags", "ex_flags"), ("message", "ex_msg")],
    )
    pg = arm(
        "12/%02d/2015 10:00:%02d UTC user=u%d conn%d %d",
        [F.lit(1) + F.pmod(e, F.lit(28)), F.pmod(e, F.lit(60)), u, e,
         F.lit(100) + F.pmod(e, F.lit(900))],
        "%{POSTGRESQL}",
        [("user_id", "pg_user"), ("connection_id", "pg_conn"),
         ("pid", "pg_pid")],
        types={"pid": "int"},
    )
    rails = arm(
        'Started GET "/items/%d" for 10.3.0.%d at 2015-02-%02d 10:00:%02d +0100',
        [e, F.pmod(u, F.lit(256)), F.lit(1) + F.pmod(e, F.lit(28)),
         F.pmod(e, F.lit(60))],
        "%{RAILS3HEAD}",
        [("verb", "rl_verb"), ("request", "rl_request"),
         ("clientip", "rl_clientip"), ("timestamp", "rl_ts")],
    )
    return (
        mongo.join(redis, "event_id")
        .join(exim, "event_id")
        .join(pg, "event_id")
        .join(rails, "event_id")
    )


def _q_kv_parser(spark, sf):
    from vector_spark.operators import key_value_parser

    ev = _load(spark, sf, "events")
    msg = F.format_string(
        "status=%d time=%d",
        F.lit(200) + F.pmod(F.col("event_id"), F.lit(5)),
        (F.col("value") * 10).cast("long"),
    )
    logs = ev.select("event_id", msg.alias("message"))
    out = key_value_parser(
        logs, fields=["status", "time"], types={"status": "int", "time": "int"}
    )
    return out.select("event_id", "status", "time")


def _q_logfmt(spark, sf):
    from vector_spark.operators import logfmt_parser

    ev = _load(spark, sf, "events")
    msg = F.format_string(
        'level=info msg="evt %s done" dur=%dms', F.col("event_type"), F.col("user_id")
    )
    logs = ev.select("event_id", msg.alias("message"))
    out = logfmt_parser(logs, fields=["level", "msg", "dur"])
    return out.select("event_id", "level", "msg", "dur")


def _q_tokenizer(spark, sf):
    from vector_spark.operators import tokenizer

    docs = _load(spark, sf, "documents")
    out = tokenizer(docs.select("doc_id", F.col("text").alias("message")), ["tok1", "tok2", "tok3"])
    return out.select("doc_id", "tok1", "tok2", "tok3")


def _q_split(spark, sf):
    from vector_spark.operators import split_fields

    docs = _load(spark, sf, "documents")
    out = split_fields(
        docs.select("doc_id", F.col("text").alias("message")), ["w1", "w2"], separator=" "
    )
    return out.select("doc_id", "w1", "w2")


def _q_coercer(spark, sf):
    from vector_spark.operators import coercer

    ev = _load(spark, sf, "events").select(
        "event_id", F.col("value").cast("string").alias("value_s")
    )
    out = coercer(ev, {"value_s": "float"})
    return out.select("event_id", F.col("value_s").alias("value_f"))


def _q_shapers(spark, sf):
    from vector_spark.operators import add_fields, concat_fields, rename_fields

    ev = _load(spark, sf, "events")
    out = add_fields(ev, {"app": "pipeline", "label": "{{event_type}}-{{user_id}}"})
    out = concat_fields(out, "etype_head", ["event_type[0..3]"], joiner="")
    out = rename_fields(out, {"event_type": "etype"})
    return out.select("event_id", "app", "label", "etype_head", "etype")


def _q_dedupe(spark, sf):
    from vector_spark.operators import dedupe

    ev = _load(spark, sf, "events")
    out = dedupe(
        ev.select("event_id", "user_id", "event_type", "ts"),
        match=["user_id", "event_type"],
        order_by=["ts", "event_id"],
    )
    return out.select("event_id", "user_id", "event_type")


def _q_reduce(spark, sf):
    from vector_spark.operators import reduce_events

    ev = _load(spark, sf, "events").select(
        "user_id",
        F.col("event_id").alias("ord"),
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("dval"),
    )
    out = reduce_events(
        ev,
        group_by=["user_id"],
        merge_strategies={"event_type": "concat", "dval": "sum"},
        order_by="ord",
    )
    return out.select(
        "user_id",
        F.col("event_type").alias("etypes"),
        F.col("dval").cast("double").alias("sum_value"),
        F.col("ord").alias("first_ord"),
    )


def _q_reduce_ends_when(spark, sf):
    from vector_spark.operators import reduce_events

    ev = _load(spark, sf, "events").select(
        "user_id",
        F.col("event_id").alias("ord"),
        "event_type",
    )
    out = reduce_events(
        ev,
        group_by=["user_id"],
        merge_strategies={"event_type": "concat"},
        ends_when='.event_type == "error"',
        order_by="ord",
    )
    return out.select(
        "user_id", F.col("ord").alias("session_start"), F.col("event_type").alias("etypes")
    )


def _q_log_to_metric(spark, sf):
    from vector_spark.operators import aggregate_metrics, log_to_metric

    ev = _load(spark, sf, "events").withColumnRenamed("ts", "timestamp")
    metrics = log_to_metric(
        ev,
        [
            {
                "type": "counter",
                "field": "event_type",
                "name": "events_total",
                "tags": {"type": "{{event_type}}"},
            }
        ],
    )
    agg = aggregate_metrics(metrics)
    return agg.select(
        "name",
        F.element_at(F.col("tags"), "type").alias("type_tag"),
        F.col("value").cast("long").alias("cnt"),
    )


def _q_histogram(spark, sf):
    from vector_spark.operators.metrics import histogram_buckets

    ev = _load(spark, sf, "events").withColumn(
        "dvalue", F.col("value").cast("decimal(18,2)")
    )
    out = histogram_buckets(ev, "value", [5.0, 10.0, 15.0], group_cols=["event_type"])
    # recompute sum exactly via decimal for parity
    sums = ev.groupBy("event_type").agg(
        F.sum("dvalue").cast("double").alias("sum")
    )
    return (
        out.drop("sum")
        .join(sums, "event_type")
        .select("event_type", "le_5_0", "le_10_0", "le_15_0", "count", "sum")
    )


def _q_aggregate_window(spark, sf):
    from vector_spark.operators import aggregate_metrics, log_to_metric

    # redistribute=False: the gate's pre-shuffle work is a trivial
    # projection straight into a hash aggregation (its own exchange) —
    # the redistribution shuffle of full rows is pure cost here
    # (measured 0.51 s -> 0.98 s at sf1.0 with it on)
    ev = _load(spark, sf, "events", redistribute=False).withColumnRenamed(
        "ts", "timestamp"
    )
    metrics = log_to_metric(ev, [{"type": "counter", "field": "event_id", "name": "evt"}])
    agg = aggregate_metrics(metrics, interval="1 hour")
    return agg.select(
        F.col("window.start").alias("hour"), F.col("value").cast("long").alias("cnt")
    )


def _q_enrich(spark, sf):
    from vector_spark.operators import enrich

    ev = _load(spark, sf, "events")
    dim = spark.createDataFrame(_ENRICH_ROWS, "event_type string, category string, weight int")
    out = enrich(ev, dim, on="event_type")
    return out.select("event_id", "event_type", "category", "weight")


def _q_tag_cardinality(spark, sf):
    from vector_spark.operators import tag_cardinality_limit

    ev = _load(spark, sf, "events").select(
        "event_id",
        # plain timestamp, not struct(ts, id): min() over a struct is
        # not hash-aggregable and demoted the first-seen aggregate to
        # SortAggregate; min(ts) is order-insensitive-deterministic and
        # ranking ties break on the value column (oracle-identical)
        F.col("ts").alias("ord"),
        F.create_map(F.lit("user"), F.col("user_id").cast("string")).alias("tags"),
        "event_type",
    )
    # limit per-tag-key distinct values to the first 5 seen (by ts)
    out = tag_cardinality_limit(ev, value_limit=5, action="drop_event", order_by="ord")
    return out.select("event_id")


def _q_dedup_exact(spark, sf):
    from vector_spark.dataops.dedup import exact_dedup

    docs = _load(spark, sf, "documents").withColumn("doc_id", F.col("doc_id").cast("long"))
    out = exact_dedup(docs)
    return out.select("fingerprint", "keep_id", "dup_count")


def _q_jaccard(spark, sf):
    """Jaccard pairs WITH stop-shingle pruning active (max_shingle_df):
    the hot-shingle anti-join is part of the verified plan, and the
    oracle mirrors the pruning with a HAVING clause."""
    from vector_spark.dataops.dedup import ngram_jaccard_pairs

    docs = _load(spark, sf, "documents", min_rows=2000).withColumn("doc_id", F.col("doc_id").cast("long"))
    return ngram_jaccard_pairs(docs, threshold=0.35, max_shingle_df=50)


def _q_minhash(spark, sf):
    from vector_spark.dataops.dedup import minhash_signatures

    docs = _load(spark, sf, "documents").withColumn("doc_id", F.col("doc_id").cast("long"))
    return minhash_signatures(docs, k=8).select("id", "seed", "minhash")


def _q_minhash_lsh(spark, sf):
    from vector_spark.dataops.dedup import minhash_lsh_candidates, minhash_signatures

    docs = _load(spark, sf, "documents", min_rows=2000).withColumn("doc_id", F.col("doc_id").cast("long"))
    sigs = minhash_signatures(docs, k=8)
    return minhash_lsh_candidates(sigs, bands=4, rows_per_band=2)


def _q_simhash(spark, sf):
    from vector_spark.dataops.dedup import simhash16

    docs = _load(spark, sf, "documents", min_rows=2000).withColumn("doc_id", F.col("doc_id").cast("long"))
    out = simhash16(docs)
    return out.select("id", F.col("simhash").cast("long").alias("simhash"))


def _q_embed_topk(spark, sf):
    from vector_spark.dataops.similarity import brute_force_topk

    emb = _load(spark, sf, "embeddings", min_rows=2000)
    q = emb.filter(F.col("vec_id") == 0)
    out = brute_force_topk(emb, q, k=5)
    return out.select("query_id", "neighbor_id", "cos")


def _q_embed_lsh(spark, sf):
    from vector_spark.dataops.similarity import sign_lsh_bucket

    emb = _load(spark, sf, "embeddings")
    return (
        emb.select(sign_lsh_bucket(F.col("embedding"), 8).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_text_stats(spark, sf):
    from vector_spark.dataops.textstats import text_stats

    docs = _load(spark, sf, "documents", min_rows=2000).withColumn("doc_id", F.col("doc_id").cast("long"))
    out = text_stats(docs)
    return out.select(
        "doc_id", "n_words", "n_tokens", "stopword_ratio", "lang_guess", "fingerprint"
    )


def _q_field_filter(spark, sf):
    from vector_spark.operators.core import field_filter

    ev = _load(spark, sf, "events")
    return field_filter(ev, "event_type", "purchase").select("event_id", "event_type")


def _q_explode_1n(spark, sf):
    from vector_spark.operators.parsers import json_array_parser

    ev = _load(spark, sf, "events")
    payload = F.format_string(
        '[{"rec_id": %d, "body": "%s"}, {"rec_id": %d, "body": "%s-tail"}]',
        F.col("event_id"),
        F.col("event_type"),
        F.col("event_id") + 10_000_000,
        F.col("event_type"),
    )
    df = ev.select("event_id", payload.alias("message"))
    out = json_array_parser(df, field="message", element_schema="rec_id long, body string")
    return out.select("event_id", "rec_id", "body")


def _q_salted_agg(spark, sf):
    from vector_spark.skew import salted_agg

    ev = _load(spark, sf, "events")
    out = salted_agg(
        ev.select("event_type", F.col("value").cast("decimal(18,2)").alias("dv")),
        ["event_type"],
        [F.count(F.lit(1)).alias("c"), F.sum("dv").alias("s")],
        [F.sum("c").alias("cnt"), F.sum("s").cast("double").alias("sum_value")],
        n_salts=8,
    )
    return out.select("event_type", "cnt", "sum_value")


def _q_parse_url(spark, sf):
    from vector_spark.functions.vrl import parse_url

    ev = _load(spark, sf, "events")
    url = F.format_string(
        "https://host%d.example.com/api/%s/%d?page=%d",
        F.pmod(F.col("user_id"), F.lit(10)),
        F.col("event_type"),
        F.col("event_id"),
        F.pmod(F.col("event_id"), F.lit(7)),
    )
    u = parse_url(url)
    return ev.select(
        "event_id",
        u["scheme"].alias("scheme"),
        u["host"].alias("host"),
        u["path"].alias("path"),
        u["query"].alias("query"),
    )


def _q_parse_duration(spark, sf):
    from vector_spark.functions.vrl import parse_duration_seconds

    ev = _load(spark, sf, "events")
    dur = F.format_string("%dms", (F.col("value") * 10).cast("long"))
    return ev.select(
        "event_id",
        F.round(parse_duration_seconds(dur), 6).alias("dur_s"),
    )


def _q_syslog(spark, sf):
    from vector_spark.functions.vrl import to_syslog_level, to_syslog_severity

    ev = _load(spark, sf, "events")
    level = F.element_at(
        F.array(*[F.lit(x) for x in ("emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")]),
        (F.pmod(F.col("event_id"), F.lit(8)) + 1).cast("int"),
    )
    return ev.select(
        "event_id",
        level.alias("level"),
        to_syslog_severity(level).alias("severity"),
        to_syslog_level(F.pmod(F.col("event_id"), F.lit(8))).alias("roundtrip"),
    )


def _q_encode_logfmt(spark, sf):
    from vector_spark.functions.vrl import encode_logfmt

    ev = _load(spark, sf, "events")
    m = F.create_map(
        F.lit("etype"), F.col("event_type"),
        F.lit("msg"), F.format_string("user %d", F.col("user_id")),
    )
    return ev.select("event_id", encode_logfmt(m).alias("line"))


def _q_metric_to_log(spark, sf):
    from vector_spark.operators import aggregate_metrics, log_to_metric, metric_to_log

    ev = _load(spark, sf, "events").withColumnRenamed("ts", "timestamp")
    metrics = log_to_metric(
        ev,
        [{"type": "counter", "field": "event_type", "name": "events_total",
          "tags": {"type": "{{event_type}}"}}],
    )
    agg = aggregate_metrics(metrics)
    logs = metric_to_log(agg)
    return logs.select("name", "kind", "metric_type", F.col("value").cast("long").alias("cnt"), "tags_json")


def _q_embed_lsh_topk(spark, sf):
    from vector_spark.dataops.similarity import lsh_topk

    emb = _load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    out = lsh_topk(emb, q, k=5, dims=8)
    return out.select("query_id", "neighbor_id", "cos")


def _q_merge_partial(spark, sf):
    from vector_spark.operators import merge_partial

    ev = _load(spark, sf, "events").select(
        "user_id",
        F.col("event_id").alias("ord"),
        "event_type",
        (F.pmod(F.col("event_id"), F.lit(3)) != 0).alias("_partial"),
    )
    out = merge_partial(
        ev, fields=["event_type"], discriminant=["user_id"], order_by="ord", joiner=" "
    )
    return out.select("user_id", F.col("ord").alias("closed_at"), F.col("event_type").alias("merged"))


def _q_ansi_stripper(spark, sf):
    from vector_spark.operators import ansi_stripper

    ev = _load(spark, sf, "events")
    msg = F.concat(
        F.lit("\x1b[31m"), F.col("event_type"), F.lit("\x1b[0m"), F.lit(" done")
    )
    df = ev.select("event_id", msg.alias("message"))
    return ansi_stripper(df).select("event_id", F.col("message").alias("clean"))


def _q_stream_aggregate(spark, sf):
    """Structured Streaming tumbling aggregate driven to completion
    over the events parquet (complete mode == batch counts)."""
    import uuid

    from vector_spark.streaming import stream_aggregate

    schema = _load(spark, sf, "events").schema
    # streaming file source needs a DIRECTORY: point at sf_dir and
    # glob-filter to the events table file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    # parquet reads NTZ; watermarks require TIMESTAMP (LTZ, session=UTC)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = stream_aggregate(stream, "ts", "1 hour", ["event_type"], {"event_id": "count"})
    name = f"vs_stream_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql(f"select * from {name}")
    return out.select(
        F.col("window.start").alias("hour"),
        "event_type",
        F.col("event_id_count").alias("cnt"),
    )


def _q_reduce_expire_gap(spark, sf):
    from vector_spark.operators import reduce_events

    ev = _load(spark, sf, "events").select(
        "user_id", F.col("event_id").alias("ord"), "event_type"
    )
    out = reduce_events(
        ev,
        group_by=["user_id"],
        merge_strategies={"event_type": "concat"},
        order_by="ord",
        expire_gap=500,
    )
    return out.select(
        "user_id", F.col("ord").alias("session_start"), F.col("event_type").alias("etypes")
    )


def _q_embed_near_dups(spark, sf):
    from vector_spark.dataops.dedup import embedding_near_dups

    emb = _load(spark, sf, "embeddings")
    return embedding_near_dups(emb, threshold=0.2, dims=8)


def _q_multimodal(spark, sf):
    """Arrow-batched feature extraction over binary media columns —
    REAL lib-free codecs (RIFF/WAVE PCM16, binary PPM) for the
    audio/image rows, honest decode_ok=false for video (ffmpeg-less).
    Features explode to (media_id, fidx, fval) so every decoded value
    is pinned. Oracle: independent pure-Python reparse of the same
    deterministic payloads (see _multimodal_oracle_sql)."""
    from vector_spark.dataops.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, 300)
    out = extract_features(media)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        "sha",
        "decode_ok",
        F.posexplode_outer("feat").alias("fidx", "fval"),
    )


def _ivf_gate_centroids() -> list[list[float]]:
    """Fixed seeded coarse quantizer for the GATE query — shared
    verbatim (rounded literals) between the Spark plan and the DuckDB
    oracle so both engines quantize identically at every sf. The
    production path trains centroids with ivf_centroids (driver-side
    k-means, tests/test_ivf_custom.py); the gate pins the PROBE
    machinery: pandas-UDF cell assignment + cell equi-join + top-k."""
    import numpy as np

    rng = np.random.RandomState(7)
    cents = rng.standard_normal((8, 64))
    return [[round(float(v), 6) for v in row] for row in cents]


def _q_ivf_topk(spark, sf):
    """IVF ANN probe: fixed coarse quantizer (gate) + pandas-UDF cell
    assignment + cell-restricted scoring."""
    from vector_spark.dataops.similarity import ivf_topk

    emb = _load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return ivf_topk(emb, q, _ivf_gate_centroids(), k=5)


def _ivf_oracle_sql() -> str:
    """IVF probe reimplemented in SQL over the same centroid literals:
    assignment = argmax cosine vs centroids (first-max tie-break like
    numpy argmax), probe = cell equi-join, top-5 by rounded cosine."""
    cents = _ivf_gate_centroids()
    rows = ",\n              ".join(
        f"({i}, {c}::DOUBLE[])" for i, c in enumerate(cents)
    )
    return f"""
        WITH cents(cell, cvec) AS (VALUES
              {rows}),
        sims AS (
          SELECT e.vec_id, e.embedding, c.cell,
                 list_cosine_similarity(cast(e.embedding AS double[]), c.cvec) AS sim
          FROM embeddings e CROSS JOIN cents c
        ),
        assign AS (
          SELECT vec_id, embedding, cell FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
            FROM sims) WHERE rn = 1
        ),
        q AS (SELECT * FROM assign WHERE vec_id = 0),
        scored AS (
          SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
                 round(list_cosine_similarity(cast(a.embedding AS double[]),
                                              cast(q.embedding AS double[])), 4) AS cos
          FROM assign a JOIN q ON a.cell = q.cell AND a.vec_id <> q.vec_id
        )
        SELECT query_id, neighbor_id, cos FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
          FROM scored) WHERE rk <= 5
    """


def _multimodal_oracle_sql(n_rows: int = 300, seed: int = 42) -> str:
    """Independent pure-Python reparse of the deterministic media
    payloads: the WAV/PPM bytes are rebuilt with the shared
    generators, then the expected features are recomputed here with
    plain struct/loops (NOT the numpy decoders under test) and
    emitted as a VALUES table — DuckDB cannot sha256 BLOBs or parse
    RIFF, so the expectation is precomputed rather than recomputed in
    SQL."""
    import hashlib
    import math
    import struct

    from vector_spark.dataops.multimodal import make_ppm, make_wav

    kinds = ("image", "audio", "video")
    vals = []
    for i in range(n_rows):
        kind = kinds[i % 3]
        if kind == "image":
            payload = make_ppm(i)
            header, _, rest = payload.partition(b"\n")
            dims, _, rest = rest.partition(b"\n")
            _, _, body = rest.partition(b"\n")
            w, h = (int(v) for v in dims.split())
            sums = [0, 0, 0]
            for j, byte in enumerate(body):
                sums[j % 3] += byte
            feat = [
                float(w),
                float(h),
                *[round(s / (w * h), 6) for s in sums],
            ]
            ok = True
        elif kind == "audio":
            payload = make_wav(i)
            n = struct.unpack_from("<I", payload, 40)[0] // 2
            samples = struct.unpack_from(f"<{n}h", payload, 44)
            sr = struct.unpack_from("<I", payload, 24)[0]
            peak = max(abs(s) for s in samples) if n else 0
            rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
            feat = [float(n), float(sr), float(peak), round(rms, 6)]
            ok = True
        else:
            payload = (
                bytes.fromhex(
                    hashlib.md5((str(seed) + str(i)).encode()).hexdigest()
                )
                * 64
            )
            feat = None
            ok = False
        sha = hashlib.sha256(payload).hexdigest()
        if feat is None:
            vals.append(
                f"('media-{i:08d}', '{kind}', {len(payload)}::BIGINT, "
                f"'{sha}', FALSE, NULL::INT, NULL::DOUBLE)"
            )
        else:
            for fidx, fval in enumerate(feat):
                vals.append(
                    f"('media-{i:08d}', '{kind}', {len(payload)}::BIGINT, "
                    f"'{sha}', TRUE, {fidx}::INT, {fval!r}::DOUBLE)"
                )
    body_sql = ",\n              ".join(vals)
    return f"""
        SELECT * FROM (VALUES
              {body_sql})
        AS t(media_id, kind, n_bytes, sha, decode_ok, fidx, fval)
    """




# ---------------------------------------------------------------------------
# VRL stdlib round-2 additions: parse_csv, percent encoding, match_any,
# AWS formats, ruby hash, encode_key_value, IP family conversions
# ---------------------------------------------------------------------------


def _q_parse_csv(spark, sf):
    """parse_csv over a synthesized CSV line with a quoted+comma field
    (lib/vrl/stdlib/src/parse_csv.rs)."""
    from vector_spark.functions.vrl import parse_csv

    ev = _load(spark, sf, "events")
    msg = F.format_string('%s,%d,"%s, Inc."', F.col("event_type"), F.col("event_id"), F.col("event_type"))
    fields = parse_csv(msg)
    return ev.select(
        "event_id",
        F.element_at(fields, 1).alias("f1"),
        F.element_at(fields, 2).alias("f2"),
        F.element_at(fields, 3).alias("f3"),
    )


def _q_encode_percent(spark, sf):
    """encode_percent / decode_percent round trip (encode_percent.rs)."""
    from vector_spark.functions.vrl import decode_percent, encode_percent

    ev = _load(spark, sf, "events")
    raw = F.concat(F.col("event_type"), F.lit(" x y"))
    return ev.select(
        "event_id",
        encode_percent(raw).alias("enc"),
        decode_percent(encode_percent(raw)).alias("dec"),
    )


def _q_match_any(spark, sf):
    """match_any RegexSet membership over document text (match_any.rs)."""
    from vector_spark.functions.vrl import match_any

    docs = _load(spark, sf, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        match_any(F.col("text"), ["data", "the "]).alias("hit"),
    )


def _q_parse_aws_alb_log(spark, sf):
    """parse_aws_alb_log over synthesized ALB lines
    (parse_aws_alb_log.rs test shape)."""
    from vector_spark.functions.logformats import parse_aws_alb_log

    ev = _load(spark, sf, "events")
    line = F.format_string(
        'http 2018-11-30T22:23:00.%06dZ app/lb/%d 192.168.131.%d:2817 - '
        '0.000 0.001 0.000 %d 200 %d 366 "GET http://example.com/%s HTTP/1.1" '
        '"agent/%d" - - arn:tg/%d "Root=1-%d" "-" "-" 0 '
        '2018-11-30T22:22:48.364000Z "forward" "-" "-" "-" "-" "-" "-"',
        F.pmod(F.col("event_id"), F.lit(1000000)),
        F.col("event_id"),
        F.pmod(F.col("event_id"), F.lit(250)),
        F.lit(200) + F.pmod(F.col("event_id"), F.lit(3)) * 100,
        (F.col("value") * 100).cast("long"),
        F.col("event_type"),
        F.col("user_id"),
        F.col("event_id"),
        F.col("event_id"),
    )
    out = parse_aws_alb_log(ev.select("event_id", line.alias("message")))
    return out.select(
        "event_id",
        F.col("type").alias("rtype_out"),
        "elb",
        "client_host",
        "target_host",
        "request_processing_time",
        "target_processing_time",
        "elb_status_code",
        "received_bytes",
        "request_method",
        "request_url",
        "user_agent",
        "trace_id",
        "actions_executed",
        "error_reason",
    )


def _q_parse_vpc_flow_log(spark, sf):
    """parse_aws_vpc_flow_log default format with '-' nulls
    (parse_aws_vpc_flow_log.rs)."""
    from vector_spark.functions.logformats import parse_aws_vpc_flow_log

    ev = _load(spark, sf, "events")
    line = F.format_string(
        "2 %d eni-%d 10.0.0.%d - %d - 6 %d - %d %d ACCEPT OK",
        F.col("user_id"),
        F.col("event_id"),
        F.pmod(F.col("event_id"), F.lit(250)),
        F.lit(1000) + F.pmod(F.col("event_id"), F.lit(64000)),
        (F.col("value") * 10).cast("long"),
        F.col("event_id") + F.lit(1431280000),
        F.col("event_id") + F.lit(1431280060),
    )
    out = parse_aws_vpc_flow_log(ev.select("event_id", line.alias("message")))
    return out.select(
        "event_id", "version", "account_id", "interface_id", "srcaddr",
        "dstaddr", "srcport", "dstport", "protocol", "packets", "bytes",
        "start", "end", "action", "log_status",
    )


def _q_ruby_hash_and_ip(spark, sf):
    """parse_ruby_hash + encode_key_value + IP family conversions in
    one projection (parse_ruby_hash.rs, encode_key_value.rs,
    ip_to_ipv6.rs, ipv6_to_ipv4.rs)."""
    from vector_spark.functions.vrl import (
        encode_key_value,
        ip_to_ipv6,
        ipv6_to_ipv4,
        parse_ruby_hash,
    )

    ev = _load(spark, sf, "events")
    rh = F.format_string(
        '{ "etype" => "%s", "n" => %d, "x" => nil }', F.col("event_type"), F.col("event_id")
    )
    parsed = parse_ruby_hash(rh)
    ip = F.format_string(
        "10.%d.%d.%d",
        F.pmod(F.col("event_id"), F.lit(250)),
        F.pmod(F.col("user_id"), F.lit(250)),
        F.pmod(F.col("event_id") * 7, F.lit(250)),
    )
    return ev.select(
        "event_id",
        F.element_at(parsed, "etype").alias("etype"),
        F.element_at(parsed, "n").alias("n"),
        encode_key_value(
            F.create_map(F.lit("lvl"), F.col("event_type"), F.lit("id"), F.col("event_id").cast("string"))
        ).alias("kv"),
        ip_to_ipv6(ip).alias("v6"),
        ipv6_to_ipv4(ip_to_ipv6(ip)).alias("v4_back"),
    )




def _q_regex_multi(spark, sf):
    """Multi-pattern FIRST-MATCH regex_parser (regex_parser.rs:242-300
    RegexSet semantics): a line matching both patterns takes ONLY the
    first pattern's captures — fields unique to the later pattern stay
    null."""
    from vector_spark.operators import regex_parser

    ev = _load(spark, sf, "events")
    msg = F.when(
        F.pmod(F.col("event_id"), F.lit(2)) == 0,
        F.format_string("ERR %d failure", F.col("event_id")),
    ).otherwise(F.format_string("GET %d ok", F.col("event_id")))
    logs = ev.select("event_id", msg.alias("message"))
    out = regex_parser(
        logs,
        [r"^ERR (?P<code>\d+) (?P<detail>.*)$", r"^(?P<word>\w+) (?P<code>\d+).*$"],
        types={"code": "int"},
    )
    return out.select("event_id", "code", "detail", "word")


def _q_tags_shaping(spark, sf):
    """add_tags / remove_tags over a metric stream (add_tags.rs:68,
    remove_tags.rs:55): template tag + added tag survive, scrubbed tag
    is gone; tags rendered as the sorted k=v encoding."""
    from vector_spark.functions.vrl import encode_key_value
    from vector_spark.operators import add_tags, log_to_metric, remove_tags

    ev = _load(spark, sf, "events").withColumnRenamed("ts", "timestamp")
    m = log_to_metric(
        ev,
        [
            {
                "type": "counter",
                "field": "event_type",
                "name": "events_total",
                "tags": {"etype": "{{event_type}}", "tmp": "scrub-me"},
            }
        ],
    )
    m = add_tags(m, {"env": "prod"})
    m = remove_tags(m, ["tmp"])
    return m.groupBy(
        "name", encode_key_value(F.col("tags")).alias("tagkv")
    ).agg(F.count(F.lit(1)).alias("cnt"))




def _q_summary_quantiles(spark, sf):
    """log_to_metric summary output: AggregatedSummary-shaped quantile
    columns + count + sum per series (metric.rs:135-142). Exact
    percentiles here so DuckDB's quantile_cont can verify; the approx
    sketch is the documented scale default."""
    from vector_spark.operators.metrics import summary_quantiles

    ev = _load(spark, sf, "events")
    return summary_quantiles(
        ev, "value", quantiles=[0.5, 0.9], group_cols=["event_type"], exact=True
    )




def _q_syslog5424(spark, sf):
    """RFC5424 incl. structured data over synthesized lines; sd map
    rendered with the sorted k=v encoding for engine-portable
    comparison."""
    from vector_spark.functions.logformats import parse_syslog5424
    from vector_spark.functions.vrl import encode_key_value

    ev = _load(spark, sf, "events")
    line = F.format_string(
        '<%d>1 2020-01-01T00:00:00Z host-%d app%d %d MSG%d '
        '[meta@1 etype="%s" uid="%d"] event %d happened',
        F.lit(8) + F.pmod(F.col("event_id"), F.lit(184)),
        F.pmod(F.col("user_id"), F.lit(50)),
        F.pmod(F.col("event_id"), F.lit(7)),
        F.col("event_id"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("user_id"),
        F.col("event_id"),
    )
    out = parse_syslog5424(ev.select("event_id", line.alias("message")))
    return out.select(
        "event_id", "priority", "facility", "severity", "hostname",
        "appname",
        # RFC5424 PROCID is a string (names are legal); the synthesized
        # gate lines are numeric, so cast for the BIGINT oracle column
        F.col("procid").try_cast("long").alias("procid"),
        "msgid",
        encode_key_value(F.col("sd")).alias("sdkv"),
        "message_text",
    )




def _q_winnow(spark, sf):
    """Winnowing rolling-hash fingerprints (SIGMOD'03) over documents
    — the document-fingerprinting training-data op; guarantees shared
    fingerprints for shared passages of >= k+window-1 words."""
    from vector_spark.dataops.textstats import winnow_fingerprints

    docs = _load(spark, sf, "documents", min_rows=2000).withColumn("doc_id", F.col("doc_id").cast("long"))
    return winnow_fingerprints(docs, k=5, window=4)




def _q_minhash_estimate(spark, sf):
    """LSH pipeline end-to-end: signatures → banded candidates →
    per-pair Jaccard ESTIMATE (fraction of agreeing minhash coords) —
    the verification stage between candidate generation and a final
    exact check."""
    from vector_spark.dataops.dedup import (
        minhash_jaccard_estimate,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = _load(spark, sf, "documents", min_rows=2000).withColumn("doc_id", F.col("doc_id").cast("long"))
    sigs = minhash_signatures(docs, k=8).persist()
    cands = minhash_lsh_candidates(sigs, bands=4, rows_per_band=2)
    return minhash_jaccard_estimate(sigs, cands, threshold=0.25)


def _q_distribution(spark, sf):
    """Distribution {value, rate} flattening (statistic.rs:23-105):
    rate-weighted count + exact R-3 weighted quantiles per series;
    sum recomputed through decimal for engine-portable addition order
    (the operator's plain-f64 sum matches the reference but double
    addition order is engine-dependent)."""
    from vector_spark.operators.metrics import distribution_statistic

    ev = _load(spark, sf, "events").filter(F.col("value").isNotNull())
    samples = ev.select(
        "event_type",
        F.col("value"),
        (F.lit(1) + F.pmod(F.col("event_id"), F.lit(3))).cast("long").alias("rate"),
    )
    stat = distribution_statistic(
        samples, "value", "rate", quantiles=[0.95], group_cols=["event_type"]
    ).select("event_type", "min", "max", "median", "q95", "count")
    sums = samples.groupBy("event_type").agg(
        F.sum((F.col("value") * F.col("rate")).cast("decimal(38,6)"))
        .cast("double")
        .alias("sum")
    )
    return stat.join(sums, "event_type")


def _q_stream_dedupe(spark, sf):
    """Structured Streaming watermark dedupe driven to completion
    (dedupe.rs LRU analogue, state TTL = watermark). Output is the
    distinct key set — deterministic regardless of which arrival wins
    inside the engine."""
    import uuid

    from vector_spark.streaming import stream_dedupe

    schema = _load(spark, sf, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    ded = stream_dedupe(stream, ["event_type", "user_id"], "ts")
    name = f"vs_sdedup_{uuid.uuid4().hex[:8]}"
    q = (
        ded.select("event_type", F.col("user_id").cast("long").alias("user_id"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def _q_stream_route(spark, sf):
    """Streaming fan-out driven to completion: ONE readStream, three
    predicate lanes written per micro-batch through foreachBatch
    (stream_route_writer — the fanout-channel analogue), then the lane
    sinks are read back and summarized. Verified on routed-row
    equality: per-lane counts + exact integer id-sums match the batch
    oracle regardless of micro-batch boundaries."""
    import shutil
    import tempfile

    from vector_spark.streaming.ops import stream_route_writer

    schema = _load(spark, sf, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    routes = {
        "errors": '.event_type == "error"',
        "big": ".value >= 150.0",
        "rest": '.event_type != "error" && .value < 150.0',
    }
    work = tempfile.mkdtemp(prefix="vs_stream_route_")
    sinks = {lane: f"{work}/{lane}" for lane in routes}
    try:
        q = stream_route_writer(
            stream, routes, sinks, checkpoint_dir=f"{work}/_ckpt"
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()  # never leak a stream against the temp sinks
        frames = []
        for lane, path in sinks.items():
            frames.append(
                spark.read.parquet(path)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("event_id").alias("id_sum"),
                )
                .select(F.lit(lane).alias("lane"), "n", "id_sum")
            )
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionByName(fr)
        # materialize the 3 summary rows before the temp sinks vanish
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_stream_chunk_tokens(spark, sf):
    """Stateful streaming concat-and-chunk proven equal to the BATCH
    blocks: the pre-tokenized corpus replays as TWO ordered
    micro-batches (maxFilesPerTrigger=1, doc_id-prefix split keeps
    per-key arrival order), the partial tail of every (stream, shard)
    key carries across the batch boundary in the state store, and the
    emitted 64-token blocks must match ``chunk_tokens``' batch output
    bit-for-bit — the gate's oracle IS the batch chunk_tokens oracle.
    Un-flushed tails equal the batch drop_last=True convention."""
    import shutil
    import tempfile
    import time
    import uuid

    from vector_spark.dataops.tokens import tokenize_words
    from vector_spark.streaming.ops import stream_chunk_tokens

    docs = _load(spark, sf, "documents")
    seqs = docs.select(
        F.pmod(F.col("doc_id").cast("long"), F.lit(4)).alias("stream"),
        F.pmod(F.floor(F.col("doc_id").cast("long") / 4), F.lit(3))
        .cast("long")
        .alias("shard"),
        F.col("doc_id").cast("long").alias("doc_id"),
        tokenize_words(F.col("text"), hash_mode="portable").alias("tokens"),
    )
    mid = docs.agg(F.max(F.col("doc_id").cast("long"))).first()[0] // 2
    work = tempfile.mkdtemp(prefix="vs_stream_chunk_")
    indir = f"{work}/in"
    qname = "vs_sc_" + uuid.uuid4().hex[:8]
    try:
        seqs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(
            indir, mode="append"
        )
        time.sleep(1.1)  # file-source ordering is by modification time
        seqs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(
            indir, mode="append"
        )
        stream = (
            spark.readStream.schema(seqs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        blocks = stream_chunk_tokens(
            stream, 64, stream_cols=["stream", "shard"], order_col="doc_id"
        )
        q = (
            blocks.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()  # never leak a stream against the temp dir
        out = spark.table(qname).select(
            "stream",
            "shard",
            "block",
            F.array_join("tokens", " ").alias("tokens_str"),
            F.col("n_tok").cast("int").alias("n_tok"),
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_streaming_suite(spark, sf):
    """Streaming family composite: foreachBatch fan-out routing
    (routed-row equality) + stateful concat-and-chunk (block-level
    token equality vs the batch oracle), unioned on a canonical
    schema."""
    r = _q_stream_route(spark, sf).select(
        F.lit("route").alias("part"),
        F.col("lane").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("long").alias("k3"),
        F.col("n").cast("long").alias("n"),
        F.col("id_sum").cast("string").alias("payload"),
    )
    c = _q_stream_chunk_tokens(spark, sf).select(
        F.lit("chunk").alias("part"),
        F.col("stream").cast("string").alias("k1"),
        F.col("shard").alias("k2"),
        F.col("block").alias("k3"),
        F.col("n_tok").cast("long").alias("n"),
        F.col("tokens_str").alias("payload"),
    )
    return r.unionByName(c)


def _q_winnow_dup_pairs(spark, sf):
    """Shared-passage near-dup pairs from winnowing fingerprints
    (MOSS strategy): docs sharing >= 2 fingerprints after pruning
    boilerplate fingerprints above a document-frequency cap — the
    stop-shingle defense against d² fan-out on hot fingerprints."""
    from vector_spark.dataops.textstats import winnow_dup_pairs

    docs = _load(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    return winnow_dup_pairs(docs, min_shared=2, max_fingerprint_df=50)


def _q_repetition_signals(spark, sf):
    """Gopher-style per-document quality/repetition signals — all
    array/string expressions over one scan (no explode, no shuffle),
    the shape a quality filter needs at 10^12 docs."""
    from vector_spark.dataops.textstats import repetition_signals

    docs = _load(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    return repetition_signals(docs)


def _q_mix_rates(spark, sf):
    """Temperature-based domain-mixing rates (kept mass ∝ count^0.5,
    capped at 1): the bounded driver-side computation verified against
    the closed form sqrt(min_count/count) in SQL."""
    from vector_spark.dataops.curation import temperature_rates

    docs = _load(spark, sf, "documents")
    rates = temperature_rates(docs, "lang", alpha=0.5)
    return spark.createDataFrame(
        [(k, float(round(v, 6))) for k, v in sorted(rates.items())],
        "lang string, rate double",
    )


def _q_resumable_run(spark, sf):
    """Checkpointed sharded execution driven end-to-end TWICE: the
    first run processes every shard and commits lineage records; the
    rerun with the same checkpoint dir must skip every shard (resume
    without loss or duplication — the north rule's resumability
    contract). Output: per-type counts read back from the shard-scoped
    sinks, plus the rerun's all-skipped witness."""
    import shutil
    import tempfile

    from vector_spark.checkpoint import resumable_run, shard_output_path

    work = tempfile.mkdtemp(prefix="vs_resume_gate_")
    out_root = f"{work}/out"
    try:

        class _Res:
            def __init__(self, telemetry, sink_counts):
                self.telemetry = telemetry
                self.sink_counts = sink_counts

        def process(df, sid):
            kept = df.filter(F.col("value") >= 50.0)
            kept.write.mode("overwrite").parquet(shard_output_path(out_root, sid))
            return _Res({"events_in": df.count()}, {})

        first = resumable_run(
            spark, f"{sf}/events.parquet", f"{work}/ckpt", process, n_shards=2
        )
        second = resumable_run(
            spark, f"{sf}/events.parquet", f"{work}/ckpt", process, n_shards=2
        )
        all_skipped = bool(second) and all(r.skipped for r in second)
        ran_first = bool(first) and not any(r.skipped for r in first)
        agg = (
            spark.read.parquet(out_root)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "resume_contract",
                F.lit(all_skipped and ran_first),
            )
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _q_dedup_resolution(spark, sf):
    """The complete dedup decision pipeline: MinHash signatures → LSH
    candidate pairs → connected-component clusters → ONE keeper per
    cluster (longest document, ties to smaller id). Output
    (id, cluster, keep) is the actionable drop set."""
    from vector_spark.dataops.dedup import (
        dup_clusters,
        minhash_lsh_candidates,
        minhash_signatures,
        resolve_keepers,
    )

    docs = _load(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    sigs = minhash_signatures(docs, k=8)
    pairs = minhash_lsh_candidates(sigs, bands=4, rows_per_band=2)
    clusters = dup_clusters(pairs)
    return resolve_keepers(
        clusters, docs, length_col="n_chars", policy="longest"
    )


def _q_simhash_near_dups(spark, sf):
    """SimHash Hamming-radius near-dup pairs via pigeonhole banding:
    4 nibble bands guarantee every pair within distance 3 shares an
    intact band, so the candidate set is a band equi-join (never
    all-pairs) and the exact bit_count(xor) filter keeps true
    neighbors. Oracle = literal all-pairs Hamming filter — identical
    result set by the pigeonhole guarantee."""
    from vector_spark.dataops.dedup import simhash_near_dups

    docs = _load(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    return simhash_near_dups(docs, max_hamming=3)


def _q_unigram_logprob(spark, sf):
    """Perplexity-style quality scoring: mean unigram -log p(token)
    under the corpus's own distribution (add-0.5 smoothing). The freq
    table broadcasts; the big side never shuffles for the join."""
    from vector_spark.dataops.tokens import tokenize_words, unigram_logprob

    docs = _load(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokenize_words(F.col("text"), hash_mode="portable").alias("tokens"),
    ).filter(F.size("tokens") > 0)
    return unigram_logprob(docs)


def _q_curation_pipeline(spark, sf):
    """The curation FLAGSHIP: quality gate (repetition signals) →
    exact dedup (min-id keeper) → deterministic stratified sample →
    per-source survivor counts. One composed Catalyst plan — each
    stage is a narrow projection or single hash aggregate, so the
    whole pipeline is two shuffles (dedup groupBy + final rollup) no
    matter the corpus size."""
    from pyspark.sql import Window

    from vector_spark.dataops.curation import stratified_sample
    from vector_spark.dataops.dedup import kgram_positions, normalize_text

    docs = _load(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    # signals as COLUMNS on one scan; the signal frame is PERSISTED
    # before the filter because PushDownPredicate substitutes alias
    # definitions into the predicate per referenced field — filtering
    # directly on the derived dup3 re-evaluates the gram subtree ~5×
    # (measured 0.5 s → 17.9 s at sf0.1). Persist is the same
    # lineage-cut the dedup ops use (reuse_shingles/staging_path); at
    # 100 TB stage to parquet instead of memory.
    base = docs.withColumn("_w", F.split(normalize_text(F.col("text")), " "))
    w = F.col("_w")
    grams3 = F.transform(
        kgram_positions(w, 3), lambda i: F.concat_ws(" ", F.slice(w, i, 3))
    )
    base = base.withColumn("_g3", grams3)
    total3 = F.size(F.col("_g3"))
    dup3 = F.when(
        total3 > 0,
        F.round((total3 - F.size(F.array_distinct(F.col("_g3")))) / total3, 6),
    ).otherwise(F.lit(0.0))
    sig = (
        base.withColumn("n_words", F.size(w))
        .withColumn("dup3", dup3)
        .drop("_w", "_g3")
        .persist()
    )
    quality = sig.filter((F.col("n_words") >= 5) & (F.col("dup3") < 0.5))
    # exact dedup in ONE shuffle: rank within fingerprint, keep min id
    # (same keeper as exact_dedup's min(doc_id), no self-join)
    rn = F.row_number().over(
        Window.partitionBy(F.md5(normalize_text(F.col("text")))).orderBy("doc_id")
    )
    survivors = quality.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn")
    sampled = stratified_sample(
        survivors,
        "source",
        {"src1": 0.75, "src2": 0.5},
        key_col="doc_id",
        default_rate=1.0,
        rate_field=None,
        hash_mode="md5",
    )
    # model-based quality stage (r4 fold): train the NB classifier on
    # the FULL corpus (deterministic pseudo-labels, same shape as the
    # quality_classifier fine gate), score the sampled survivors with
    # the broadcast weight table, and roll the scores into the
    # per-source survivor summary — the fasttext-style "classifier
    # filter" step of a real curation pipeline, chained, not unioned
    from vector_spark.dataops.classify import (
        hash_features,
        score_classifier,
        train_nb_classifier,
    )

    ws = F.filter(F.split(normalize_text(F.col("text")), " "), lambda x: x != "")
    feats_all = docs.select(
        (F.size(ws) >= 30).alias("label"),
        hash_features(
            F.col("text"), n_features=4096, bigrams=True, hash_mode="portable"
        ).alias("features"),
    )
    wtab = train_nb_classifier(feats_all, "label", n_features=4096)
    scored = score_classifier(
        sampled.withColumn(
            "features",
            hash_features(
                F.col("text"), n_features=4096, bigrams=True, hash_mode="portable"
            ),
        ),
        wtab,
        keep_cols=("source", "n_chars"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("chars"),
        F.round(F.avg("score"), 6).alias("avg_quality"),
        F.sum((F.col("score") >= 0.5).cast("long")).alias("n_good"),
    )


def _q_session_windows(spark, sf):
    """Spark-native session windows (F.session_window) in batch: per
    user, events merge while gaps stay under 1 hour; session end =
    last event + gap. Verified against a DuckDB gaps-and-islands
    oracle (lag + running break-sum) — the same shape Structured
    Streaming uses for stream_reduce_sessions."""
    ev = _load(spark, sf, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "1 hour").alias("s"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").try_cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            F.col("user_id").cast("long").alias("user_id"),
            "n",
            "sum_value",
        )
    )


def _q_rollup_tiers(spark, sf):
    """Multi-resolution rollup (5m/1h/1d continuous-aggregate tiers)
    in ONE pass: single scan + Expand + one partial/final aggregate
    via GROUPING SETS — not one scan per tier."""
    from vector_spark.operators.metrics import rollup_metrics

    ev = _load(spark, sf, "events").withColumnRenamed("ts", "timestamp")
    return rollup_metrics(ev, series_cols=("event_type",))


def _q_pack_sequences(spark, sf):
    """Concat-and-chunk example packing over a tokenized view of
    documents (word count as n_tok, doc_id%4 as the stream), run
    through the SHARDED path: shard_expr splits each stream into 3
    parallel window sorts (the 100 TB shape — no single-task sort per
    source), with a portable shard derivation so the oracle matches
    bit-for-bit."""
    from vector_spark.dataops.textstats import pack_sequences, word_count

    docs = _load(spark, sf, "documents")
    seqs = docs.select(
        F.pmod(F.col("doc_id").cast("long"), F.lit(4)).alias("stream"),
        F.col("doc_id").cast("long").alias("doc_id"),
        word_count(F.col("text")).cast("int").alias("n_tok"),
    )
    return pack_sequences(
        seqs,
        256,
        stream_cols=["stream"],
        shard_expr=F.pmod(F.floor(F.col("doc_id") / 4), F.lit(3)).cast("long"),
    )


def _q_chunk_tokens(spark, sf):
    """Concat-and-chunk MATERIALIZATION over the pre-tokenized shape:
    each stream's sequences are concatenated in (stream, shard, doc_id)
    order and emitted as exact 64-token training blocks
    (``chunk_tokens`` — the metadata counterpart is
    ``pack_sequences``). Runs the SHARDED path (3 parallel window
    sorts per stream); drop_last trainer convention, so every row is
    exactly 64 tokens. Tokens are emitted as a joined string for
    engine-portable value comparison; the per-block token-array
    equality vs the oracle IS the north-rule token invariant."""
    from vector_spark.dataops.tokens import chunk_tokens, tokenize_words

    docs = _load(spark, sf, "documents")
    seqs = docs.select(
        F.pmod(F.col("doc_id").cast("long"), F.lit(4)).alias("stream"),
        F.col("doc_id").cast("long").alias("doc_id"),
        tokenize_words(F.col("text"), hash_mode="portable").alias("tokens"),
    )
    blocks = chunk_tokens(
        seqs,
        64,
        stream_cols=["stream"],
        shard_expr=F.pmod(F.floor(F.col("doc_id") / 4), F.lit(3)).cast("long"),
        drop_last=True,
    )
    return blocks.select(
        "stream",
        "shard",
        "block",
        F.array_join("tokens", " ").alias("tokens_str"),
        "n_tok",
    )


# Fixed BPE merge table for the bpe_encode gate: multi-step merge
# chains over the synthetic corpus vocabulary (table/value/scan/hash/
# row/slow/fast/data/the), deliberate rank interleavings ("row" must
# go r|o → ro|w, not o|w; "slow" must go o|w → s|l → sl|ow), and
# chars absent from every merge part (k, g, p, …) so the unk_id=0
# path is exercised. The DuckDB oracle replays the greedy loop with a
# recursive CTE over the SAME table (see _bpe_oracle()).
_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("r", "o"), ("ro", "w"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("h", "a"), ("ha", "s"), ("has", "h"),
    ("e", "r"), ("t", "h"), ("th", "e"),
    ("o", "w"), ("s", "l"), ("sl", "ow"),
    ("f", "a"), ("fa", "s"), ("fas", "t"),
    ("d", "a"), ("da", "t"), ("dat", "a"),
]


def _q_bpe_encode(spark, sf):
    """BPE tokenization over raw document text — the engine PRODUCES
    the pre-tokenized sequence shape (rank-greedy merge loop in the
    sanctioned mapInPandas escape hatch, per-batch word cache).
    Output is the fully-exploded (doc_id, pos, token_id) table so the
    oracle pins every token id at every position, not a digest."""
    from vector_spark.dataops.tokens import bpe_encode

    docs = _load(spark, sf, "documents", min_rows=2000).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "text"
    )
    enc = bpe_encode(docs, _BPE_MERGES, text_col="text", out_col="tokens")
    return enc.select(
        "doc_id", "source", F.posexplode("tokens").alias("pos", "token_id")
    ).select(
        "doc_id",
        "source",
        F.col("pos").cast("long").alias("pos"),
        F.col("token_id").cast("int").alias("token_id"),
    )


def _q_bpe_train(spark, sf):
    """Distributed BPE merge-table LEARNING (Sennrich on the word
    histogram): 8 iterations of count-pairs → argmax → map-only merge
    application, ties lexicographic so DuckDB replays the exact
    table. Output is the learned merge table itself."""
    from vector_spark.dataops.tokens import bpe_train

    docs = _load(spark, sf, "documents")
    merges = bpe_train(docs, 8, min_freq=2)
    rows = [(i, a, b, c) for i, (a, b, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, lhs string, rhs string, freq bigint"
    )


def _q_bigram_logprob(spark, sf):
    """Bigram-LM perplexity scoring over the pre-tokenized shape
    (portable hash tokenization, V=4096) — the order-sensitive quality
    signal; packed-long bigram keys, partial-agg frequency tables."""
    from vector_spark.dataops.tokens import bigram_logprob, tokenize_words

    # redistribute=False: bigram_logprob persists its tokenize subtree
    # (the r5 staging win) and the redistribution exchange sits UNDER
    # that persist, so the shuffle is paid during materialization while
    # every post-persist consumer reads the cache — pure cost. Measured
    # at both scales: sf0.1 0.67→0.36 s (r6 negative-result note),
    # sf1.0 1.78→1.12 s (best-of-5 A/B).
    docs = _load(spark, sf, "documents", redistribute=False).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokenize_words(
            F.col("text"), vocab_size=4096, hash_mode="portable"
        ).alias("tokens"),
    )
    return bigram_logprob(docs, vocab_size=4096)


def _q_lang_id_ngram(spark, sf):
    """Profile-based n-gram language ID (Cavnar-Trenkle style) over
    documents — engine-parity gate (the synthetic corpus is
    English-ish for every label, so linguistic accuracy is pinned by
    tests/test_dataops.py on authentic snippets; this gate pins the
    trigram extraction + broadcast profile join + conditional-sum
    argmax against DuckDB)."""
    from vector_spark.dataops.textstats import lang_id_ngram

    docs = _load(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return lang_id_ngram(docs)


def _q_quality_classifier(spark, sf):
    """Model-based quality filtering END-TO-END: closed-form NB
    log-odds training on deterministic pseudo-labels (docs with >= 30
    words are 'good') over hashed unigram+bigram features, then
    broadcast-join scoring of the same corpus — the fasttext-style
    classifier stage of an LLM curation pipeline, all DataFrame
    algebra, no MLlib, no RNG. The oracle replays train AND score in
    SQL, so the driver gate pins the whole model, not just the
    scorer."""
    from vector_spark.dataops.classify import (
        hash_features,
        score_classifier,
        train_nb_classifier,
    )
    from vector_spark.dataops.dedup import normalize_text

    docs = _load(spark, sf, "documents", min_rows=2000)
    ws = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda w: w != ""
    )
    feats = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.size(ws) >= 30).alias("label"),
        hash_features(
            F.col("text"), n_features=4096, bigrams=True, hash_mode="portable"
        ).alias("features"),
    )
    # feats feeds BOTH the training aggregation and the scoring pass —
    # stage it so the hash_features lineage executes once (SCALE.md
    # staging rule; same cut the curation flagship applies).
    feats = feats.persist()
    w = train_nb_classifier(feats, "label", n_features=4096)
    return score_classifier(feats, w)


def _q_ec2_metadata(spark, sf):
    """aws_ec2_metadata analogue (aws_ec2_metadata.rs:74-250):
    driver-fetched instance constants become literal columns —
    constant-folded, no join. Gate closes the one §2.1 row that had
    no oracle (r2 VERDICT: 'untested by oracle')."""
    from vector_spark.operators.enrich import enrich_constants

    ev = _load(spark, sf, "events")
    out = enrich_constants(
        ev,
        {
            "instance_id": "i-0123456789abcdef0",
            "region": "us-east-1",
            "availability_zone": "us-east-1a",
            "instance_type": "m5.2xlarge",
        },
    )
    return out.select(
        "event_id", "instance_id", "region", "availability_zone", "instance_type"
    )


def _q_datadog_search(spark, sf):
    """Datadog log-search conditions (src/conditions/datadog_search.rs
    + lib/datadog/search-syntax) compiled to Catalyst predicates: tag
    lookups, reserved-field wildcards, numeric facet ranges, word-
    boundary free text, NOT/AND/OR — three searches evaluated in one
    pass over a synthesized message/host/tags/facet frame."""
    from vector_spark.datadog import SearchSchema, compile_datadog_search

    ev = _load(spark, sf, "events")
    frame = ev.select(
        "event_id",
        F.format_string("user %d did %s", F.col("user_id"), F.col("event_type")).alias(
            "message"
        ),
        F.format_string("host-%d", F.pmod(F.col("user_id"), F.lit(20))).alias("host"),
        F.array(
            F.format_string("etype:%s", F.col("event_type")),
            F.format_string("sh%d", F.pmod(F.col("event_id"), F.lit(4))),
        ).alias("tags"),
        F.element_at(
            F.array(F.lit("us-east-1"), F.lit("eu-west-2"), F.lit("ap-east-9")),
            (F.pmod(F.col("user_id"), F.lit(3)) + F.lit(1)).cast("int"),
        ).alias("region"),
        F.col("value"),
    )
    schema = SearchSchema(numeric_fields=frozenset({"value"}))
    q1 = compile_datadog_search("etype:error AND @value:[100 TO *]", schema)
    q2 = compile_datadog_search("host:host-1* OR (did AND purchase)", schema)
    q3 = compile_datadog_search(
        "-tags:sh2 AND _exists_:etype AND @region:*east*", schema
    )
    # localCheckpoint before the filter: PushDownPredicate substitutes
    # the q1/q2/q3 alias DEFINITIONS into the pushed scan filter, so
    # without a lineage cut the whole frame synthesis + all three
    # compiled searches evaluate TWICE (scan filter + project) —
    # measured 1.78 s vs 0.55 s single-evaluation at 1 M rows. The cut
    # is a lazy localCheckpoint, NOT persist(): CacheManager dedups
    # identical persisted plans across bench reps (reps 2-3 would read
    # cache and the best-of-N wall would measure a cached run), while a
    # checkpoint is per-instance — every invocation recomputes from
    # parquet. ~20 MB of (long, 3×bool) rows; at 100 TB stage to
    # parquet instead (same note as the curation persists). Wall
    # 1.78 → 1.00 s; result-identical (oracle-green).
    return (
        frame.select(
            "event_id", q1.alias("q1"), q2.alias("q2"), q3.alias("q3")
        )
        .localCheckpoint(eager=False)
        .filter(F.col("q1") | F.col("q2") | F.col("q3"))
    )


def _q_pii_scrub(spark, sf):
    """PII redaction pass: typed placeholder substitution for emails /
    IPv4 / phones / long digit runs, plus per-kind match counts. PII is
    synthesized deterministically onto the documents text so both
    engines scrub the same spans. Map-only — no shuffle, no UDF."""
    from vector_spark.dataops.curation import pii_scrub

    docs = _load(spark, sf, "documents", min_rows=2000).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.col("text"),
            F.format_string(
                " contact user%d@ex%d.org or 10.%d.%d.%d tel 555-%03d-%04d card 4111%012d",
                F.col("doc_id"),
                F.pmod(F.col("doc_id"), F.lit(7)),
                F.pmod(F.col("doc_id"), F.lit(200)),
                F.pmod(F.col("doc_id") * 3, F.lit(200)),
                F.pmod(F.col("doc_id") * 7, F.lit(200)),
                F.pmod(F.col("doc_id"), F.lit(1000)),
                F.pmod(F.col("doc_id"), F.lit(10000)),
                F.col("doc_id"),
            ),
        ).alias("text"),
    )
    out = pii_scrub(docs, "text")
    return out.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        "n_longnum",
        F.md5(F.col("text")).alias("scrub_md5"),
    )


def _q_contamination(spark, sf):
    """Benchmark-decontamination pass: word n-gram overlap between the
    training split and a held-out 'benchmark' split (doc_id % 97 == 0),
    broadcast semi-join on 64-bit gram hashes. n=3 here so the tiny
    synthetic corpus overlaps; production default is 8-13."""
    from vector_spark.dataops.curation import contamination_check

    docs = _load(spark, sf, "documents", min_rows=2000).withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_check(train, bench, n=3)


def _q_contamination_fuzzy(spark, sf):
    """MinHash-LSH NEAR-DUP decontamination: training docs flagged as
    near-duplicates of benchmark items — catches the paraphrased
    leakage the exact n-gram overlap gate misses. The benchmark split
    is a LIGHTLY-EDITED copy of the docs it came from (doc_id % 97 ==
    0, last word dropped — simulated paraphrase), so the gate provably
    fires: every bench item should re-find its source doc. Pure
    composition of the oracle-gated signature/band/estimate machinery
    across docs ∪ offset benchmark ids."""
    from vector_spark.dataops.curation import contamination_fuzzy

    docs = _load(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    w = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") % 97 == 0).withColumn(
        "text",
        F.array_join(F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))), " "),
    )
    return contamination_fuzzy(docs, bench, threshold=0.25)


def _q_decontamination(spark, sf):
    """Decontamination family — exact word-n-gram overlap
    (contamination_check) and MinHash-LSH near-dup flags
    (contamination_fuzzy) against the same benchmark split, unioned
    with a part discriminator."""
    ex = _q_contamination(spark, sf).select(
        F.lit("exact").alias("part"), "doc_id",
        F.col("n_grams").cast("long").alias("k"),
        F.col("n_contaminated").cast("long").alias("n"),
        F.col("contamination").alias("ratio"),
    )
    fz = _q_contamination_fuzzy(spark, sf).select(
        F.lit("fuzzy").alias("part"), "doc_id",
        F.col("bench_id").alias("k"),
        F.lit(None).cast("long").alias("n"),
        F.col("est_jaccard").alias("ratio"),
    )
    return ex.unionByName(fz)


def _q_stratified_sample(spark, sf):
    """Domain-mixing sampler: deterministic per-source keep rates via
    md5-uniform hashing (engine-portable mode; xxhash64 is the fast
    path). Map-only, no RNG state, reproducible across runs."""
    from vector_spark.dataops.curation import stratified_sample

    docs = _load(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    out = stratified_sample(
        docs,
        "source",
        {"src1": 0.75, "src2": 0.5, "src3": 0.25},
        key_col="doc_id",
        default_rate=0.125,
        hash_mode="md5",
    )
    return out.select("doc_id", "source", "sample_rate")


def _q_token_stats(spark, sf):
    """Per-sequence token statistics over the pre-tokenized shape
    (doc_id, tokens array<int32>) the 10^12-row target table has —
    documents are tokenized with the engine-portable word hash so the
    DuckDB oracle computes the identical arrays. Map-only plan."""
    from vector_spark.dataops.tokens import token_stats, tokenize_words

    docs = _load(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokenize_words(F.col("text"), hash_mode="portable").alias("tokens"),
    )
    return token_stats(docs)


def _q_vocab_topk(spark, sf):
    """Corpus vocabulary histogram, top-50: explode → partial hash
    aggregate → exchange bounded by |vocab| per partition → TakeOrdered
    heap (no global sort)."""
    from vector_spark.dataops.tokens import tokenize_words, vocab_histogram

    docs = _load(spark, sf, "documents").select(
        tokenize_words(F.col("text"), hash_mode="portable").alias("tokens")
    )
    return vocab_histogram(docs, top_k=50)


def _q_oov_rate(spark, sf):
    """Out-of-vocabulary occurrence rate per source — the per-row OOV
    count is an array-side filter size, so the aggregate sums two longs
    per sequence (no explode, no per-token rows)."""
    from vector_spark.dataops.tokens import oov_rate, tokenize_words

    docs = _load(spark, sf, "documents").select(
        "source",
        tokenize_words(F.col("text"), hash_mode="portable").alias("tokens"),
    )
    return oov_rate(docs, vocab_size=1000, group_cols=("source",))


def _q_dup_clusters(spark, sf):
    """LSH candidate pairs → duplicate clusters (connected components,
    min-id canonical representative) via iterative min-label
    propagation — the keep/drop resolution step of a dedup pass.
    Verified against a DuckDB recursive-CTE reachability oracle."""
    from vector_spark.dataops.dedup import (
        dup_clusters,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = _load(spark, sf, "documents").withColumn(
        "doc_id", F.col("doc_id").cast("long")
    )
    sigs = minhash_signatures(docs, k=8)
    pairs = minhash_lsh_candidates(sigs, bands=4, rows_per_band=2)
    return dup_clusters(pairs)


# ---------------------------------------------------------------------------
# Composite (family) gates — the driver's CORRECTNESS artifact records
# only the FIRST 50 entries of queries(), so each composite folds several
# single-operator gates into one oracle-backed DataFrame; the original
# fine-grained gates remain in all_queries() for bench + local parity.
# ---------------------------------------------------------------------------


def _q_json_parsers(spark, sf):
    """json_parser (object → typed columns) + 1→N JSON-array explode
    (cloudwatch-style subscription parse) in one gate: every exploded
    row carries the object-parsed prop_k alongside rec_id/body."""
    from vector_spark.operators import json_parser
    from vector_spark.operators.parsers import json_array_parser

    ev = _load(spark, sf, "events")
    obj = json_parser(
        ev, field="props", schema="k long", target_field=None, drop_field=False
    )
    payload = F.format_string(
        '[{"rec_id": %d, "body": "%s"}, {"rec_id": %d, "body": "%s-tail"}]',
        F.col("event_id"),
        F.col("event_type"),
        F.col("event_id") + 10_000_000,
        F.col("event_type"),
    )
    df = obj.select("event_id", F.col("k").alias("prop_k"), payload.alias("message"))
    out = json_array_parser(df, field="message", element_schema="rec_id long, body string")
    return out.select("event_id", "prop_k", "rec_id", "body")


def _q_kv_logfmt(spark, sf):
    """key_value_parser + logfmt_parser + encode_logfmt on one frame —
    the three k=v codecs (parse generic, parse quoted logfmt, encode)
    verified as one wide projection."""
    from vector_spark.functions.vrl import encode_logfmt
    from vector_spark.operators import key_value_parser, logfmt_parser

    ev = _load(spark, sf, "events")
    kvmsg = F.format_string(
        "status=%d time=%d",
        F.lit(200) + F.pmod(F.col("event_id"), F.lit(5)),
        (F.col("value") * 10).cast("long"),
    )
    lfmsg = F.format_string(
        'level=info msg="evt %s done" dur=%dms', F.col("event_type"), F.col("user_id")
    )
    base = ev.select(
        "event_id", "event_type", "user_id",
        kvmsg.alias("kvmsg"), lfmsg.alias("lfmsg"),
    )
    out = key_value_parser(
        base, field="kvmsg", fields=["status", "time"],
        types={"status": "int", "time": "int"},
    )
    out = logfmt_parser(out, field="lfmsg", fields=["level", "msg", "dur"])
    enc = encode_logfmt(
        F.create_map(
            F.lit("etype"), F.col("event_type"),
            F.lit("msg"), F.format_string("user %d", F.col("user_id")),
        )
    )
    return out.select(
        "event_id", "status", "time", "level", "msg", "dur", enc.alias("line")
    )


def _q_tokenize_split(spark, sf):
    """tokenizer (quote/bracket-aware) + split (literal separator)
    positional field assignment over the same text, one projection."""
    from vector_spark.operators import split_fields, tokenizer

    docs = _load(spark, sf, "documents")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("text").alias("message")
    )
    out = tokenizer(base, ["tok1", "tok2", "tok3"], drop_field=False)
    out = split_fields(out, ["w1", "w2"], separator=" ")
    return out.select("doc_id", "tok1", "tok2", "tok3", "w1", "w2")


def _q_shaper_suite(spark, sf):
    """The event-shaping family in one pass: add_fields (templated),
    concat (substring specs), rename_fields, coercer, ansi_stripper."""
    from vector_spark.operators import (
        add_fields,
        ansi_stripper,
        coercer,
        concat_fields,
        rename_fields,
    )

    ev = _load(spark, sf, "events")
    colored = F.concat(
        F.lit("\x1b[31m"), F.col("event_type"), F.lit("\x1b[0m"), F.lit(" done")
    )
    base = ev.withColumn("value_s", F.col("value").cast("string")).withColumn(
        "message", colored
    )
    out = add_fields(base, {"app": "pipeline", "label": "{{event_type}}-{{user_id}}"})
    out = concat_fields(out, "etype_head", ["event_type[0..3]"], joiner="")
    out = rename_fields(out, {"event_type": "etype"})
    out = coercer(out, {"value_s": "float"})
    out = ansi_stripper(out)
    return out.select(
        "event_id", "app", "label", "etype_head", "etype",
        F.col("value_s").alias("value_f"), F.col("message").alias("clean"),
    )


def _q_reduce_modes(spark, sf):
    """The reduce/merge family: plain grouped reduce, ends_when
    session close, expire_gap sessionization, and partial-event merge
    — four strategies unioned with a mode discriminator."""
    nul = F.lit(None).cast("double")
    r = _q_reduce(spark, sf).select(
        F.lit("reduce").alias("mode"), "user_id",
        F.col("first_ord").alias("anchor"), F.col("etypes").alias("text"),
        F.col("sum_value"),
    )
    e = _q_reduce_ends_when(spark, sf).select(
        F.lit("ends_when").alias("mode"), "user_id",
        F.col("session_start").alias("anchor"), F.col("etypes").alias("text"),
        nul.alias("sum_value"),
    )
    g = _q_reduce_expire_gap(spark, sf).select(
        F.lit("expire_gap").alias("mode"), "user_id",
        F.col("session_start").alias("anchor"), F.col("etypes").alias("text"),
        nul.alias("sum_value"),
    )
    m = _q_merge_partial(spark, sf).select(
        F.lit("merge").alias("mode"), "user_id",
        F.col("closed_at").alias("anchor"), F.col("merged").alias("text"),
        nul.alias("sum_value"),
    )
    return r.unionByName(e).unionByName(g).unionByName(m)


def _q_metric_aggregate(spark, sf):
    """log_to_metric → aggregate (instant flush) and the same stream
    through a 1-hour tumbling aggregate window — counter semantics at
    both flush granularities (aggregate.rs + log_to_metric.rs)."""
    a = _q_log_to_metric(spark, sf).select(
        F.lit("by_type").alias("part"), F.col("type_tag").alias("key"), "cnt"
    )
    b = _q_aggregate_window(spark, sf).select(
        F.lit("hourly").alias("part"), F.col("hour").cast("string").alias("key"), "cnt"
    )
    return a.unionByName(b)


def _q_metric_statistics(spark, sf):
    """The distribution-statistic family joined on series key:
    histogram buckets + exact summary quantiles + rate-weighted
    distribution stats (statistic.rs) — one row per event_type."""
    h = _q_histogram(spark, sf).select(
        "event_type", "le_5_0", "le_10_0", "le_15_0",
        F.col("count").alias("h_count"), F.col("sum").alias("h_sum"),
    )
    s = _q_summary_quantiles(spark, sf).select(
        "event_type", "q5", "q9",
        F.col("count").alias("s_count"), F.col("sum").alias("s_sum"),
    )
    d = _q_distribution(spark, sf).select(
        "event_type", F.col("min").alias("d_min"), F.col("max").alias("d_max"),
        F.col("median").alias("d_median"), F.col("q95").alias("d_q95"),
        F.col("count").alias("d_count"), F.col("sum").alias("d_sum"),
    )
    return h.join(s, "event_type").join(d, "event_type")


def _q_metric_tags_log(spark, sf):
    """add_tags / remove_tags / metric_to_log chained: counter tagged
    with a template + a scrub-me tag, env added, tmp removed, then
    serialized to the log shape."""
    from vector_spark.operators import (
        add_tags,
        aggregate_metrics,
        log_to_metric,
        metric_to_log,
        remove_tags,
    )

    ev = _load(spark, sf, "events").withColumnRenamed("ts", "timestamp")
    m = log_to_metric(
        ev,
        [
            {
                "type": "counter",
                "field": "event_type",
                "name": "events_total",
                "tags": {"etype": "{{event_type}}", "tmp": "scrub-me"},
            }
        ],
    )
    m = add_tags(m, {"env": "prod"})
    m = remove_tags(m, ["tmp"])
    agg = aggregate_metrics(m)
    logs = metric_to_log(agg)
    # tags_json key order is the map's construction order (etype from
    # the template, env appended by add_tags, tmp scrubbed) — stable,
    # and asserted verbatim by the oracle
    return logs.select(
        "name", "kind", "metric_type",
        F.col("value").cast("long").alias("cnt"),
        "tags_json",
    )


def _q_enrich_full(spark, sf):
    """Broadcast-join enrichment + aws_ec2_metadata-style constant
    enrichment on the same event stream."""
    from vector_spark.operators import enrich
    from vector_spark.operators.enrich import enrich_constants

    ev = _load(spark, sf, "events")
    dim = spark.createDataFrame(_ENRICH_ROWS, "event_type string, category string, weight int")
    out = enrich(ev, dim, on="event_type")
    out = enrich_constants(
        out,
        {
            "instance_id": "i-0123456789abcdef0",
            "region": "us-east-1",
            "availability_zone": "us-east-1a",
            "instance_type": "m5.2xlarge",
        },
    )
    return out.select(
        "event_id", "event_type", "category", "weight",
        "instance_id", "region", "availability_zone", "instance_type",
    )


def _q_vrl_stdlib(spark, sf):
    """VRL stdlib sweep — parse_url, parse_duration, syslog level and
    severity conversions, parse_csv, percent encode/decode,
    parse_ruby_hash, encode_key_value, IP family conversions — all as
    ONE map-only projection over events (18 derived columns, one scan,
    whole-stage codegen)."""
    from vector_spark.functions.vrl import (
        decode_percent,
        encode_key_value,
        encode_percent,
        ip_to_ipv6,
        ipv6_to_ipv4,
        parse_csv,
        parse_duration_seconds,
        parse_ruby_hash,
        parse_url,
        to_syslog_level,
        to_syslog_severity,
    )

    ev = _load(spark, sf, "events")
    url = F.format_string(
        "https://host%d.example.com/api/%s/%d?page=%d",
        F.pmod(F.col("user_id"), F.lit(10)),
        F.col("event_type"),
        F.col("event_id"),
        F.pmod(F.col("event_id"), F.lit(7)),
    )
    u = parse_url(url)
    dur = F.format_string("%dms", (F.col("value") * 10).cast("long"))
    level = F.element_at(
        F.array(*[F.lit(x) for x in ("emerg", "alert", "crit", "err", "warning", "notice", "info", "debug")]),
        (F.pmod(F.col("event_id"), F.lit(8)) + 1).cast("int"),
    )
    csvmsg = F.format_string(
        '%s,%d,"%s, Inc."', F.col("event_type"), F.col("event_id"), F.col("event_type")
    )
    fields = parse_csv(csvmsg)
    raw = F.concat(F.col("event_type"), F.lit(" x y"))
    rh = F.format_string(
        '{ "etype" => "%s", "n" => %d, "x" => nil }', F.col("event_type"), F.col("event_id")
    )
    parsed = parse_ruby_hash(rh)
    ip = F.format_string(
        "10.%d.%d.%d",
        F.pmod(F.col("event_id"), F.lit(250)),
        F.pmod(F.col("user_id"), F.lit(250)),
        F.pmod(F.col("event_id") * 7, F.lit(250)),
    )
    return ev.select(
        "event_id",
        u["scheme"].alias("scheme"),
        u["host"].alias("host"),
        u["path"].alias("path"),
        u["query"].alias("query"),
        F.round(parse_duration_seconds(dur), 6).alias("dur_s"),
        level.alias("level"),
        to_syslog_severity(level).alias("severity"),
        to_syslog_level(F.pmod(F.col("event_id"), F.lit(8))).alias("roundtrip"),
        F.element_at(fields, 1).alias("f1"),
        F.element_at(fields, 2).alias("f2"),
        F.element_at(fields, 3).alias("f3"),
        encode_percent(raw).alias("enc"),
        decode_percent(encode_percent(raw)).alias("dec"),
        F.element_at(parsed, "etype").alias("etype"),
        F.element_at(parsed, "n").alias("n"),
        encode_key_value(
            F.create_map(F.lit("lvl"), F.col("event_type"), F.lit("id"), F.col("event_id").cast("string"))
        ).alias("kv"),
        ip_to_ipv6(ip).alias("v6"),
        ipv6_to_ipv4(ip_to_ipv6(ip)).alias("v4_back"),
    )


def _q_ivf_refine(spark, sf):
    """Distributed Lloyd refinement of the IVF coarse quantizer over
    the FULL corpus: seeds are the embeddings of the 8 smallest
    vec_ids (deterministic, engine-portable), two
    assign→per-(cell,dim)-mean iterations with round-6 similarity and
    mean rounding so the DuckDB oracle replays the refinement exactly.
    Output: one row per (cell, dim) of the refined quantizer."""
    from vector_spark.dataops.similarity import ivf_refine_centroids

    emb = _load(spark, sf, "embeddings")
    seeds = [
        r["embedding"]
        for r in emb.orderBy("vec_id").limit(8).select("embedding").collect()
    ]
    refined = ivf_refine_centroids(emb, seeds, iters=2, round_digits=6)
    rows = [
        (c, d, float(v))
        for c, vec in enumerate(refined)
        for d, v in enumerate(vec)
    ]
    return spark.createDataFrame(rows, "cell bigint, dim bigint, val double")


def _q_ann_topk(spark, sf):
    """The ANN family — brute-force cosine top-k (cross-validation
    baseline), sign-LSH bucketed top-k, IVF multi-probe top-k, and
    the refined coarse quantizer itself (distributed Lloyd over the
    full corpus, emitted per (cell, dim)) — unioned with a method
    discriminator. Bucket/cell candidate generation is exercised
    transitively (both prune before scoring)."""
    b = _q_embed_topk(spark, sf).select(
        F.lit("brute").alias("method"), "query_id", "neighbor_id", "cos"
    )
    l = _q_embed_lsh_topk(spark, sf).select(
        F.lit("lsh").alias("method"), "query_id", "neighbor_id", "cos"
    )
    i = _q_ivf_topk(spark, sf).select(
        F.lit("ivf").alias("method"), "query_id", "neighbor_id", "cos"
    )
    r = _q_ivf_refine(spark, sf).select(
        F.lit("centroid").alias("method"),
        F.col("cell").alias("query_id"),
        F.col("dim").alias("neighbor_id"),
        F.col("val").alias("cos"),
    )
    p = _q_pq_ann(spark, sf).select(
        F.col("part").alias("method"),
        F.col("a").alias("query_id"),
        F.col("b").alias("neighbor_id"),
        F.col("val").alias("cos"),
    )
    return b.unionByName(l).unionByName(i).unionByName(r).unionByName(p)


def _q_pq_ann(spark, sf):
    """Product-quantization ANN: per-subspace Lloyd codebooks (m=4,
    k=8, one iteration from the 8 smallest-id seeds), 4-int codes per
    vector (map-only projection — the corpus' original vectors are
    never touched again), and ADC top-5 for the 3 smallest-id queries
    via in-plan LUT literals. Emits every code and every top-k row."""
    from vector_spark.dataops.similarity import pq_encode, pq_topk, pq_train

    emb = _load(spark, sf, "embeddings", min_rows=2000)
    # ONE TakeOrdered collect serves both the 8 training seeds and the
    # 3 query vectors (queries ⊂ seeds by the same smallest-id
    # convention) — previously three sequential driver jobs: seeds
    # collect, query collect, plus their plans
    head = emb.orderBy("vec_id").limit(8).collect()
    seeds = [[float(v) for v in r["embedding"]] for r in head]
    cb = pq_train(emb, m=4, k=8, iters=1, seeds=seeds)
    # the encode projection feeds BOTH union branches (code listing +
    # ADC scoring) — staged so it executes once, 5 small ints per row
    codes_df = pq_encode(emb, cb).persist()
    codes = (
        codes_df
        .select(
            F.col("vec_id").cast("long").alias("a"),
            F.posexplode("codes").alias("j", "code"),
        )
        .select(
            F.lit("pq_code").alias("part"),
            "a",
            F.col("j").cast("long").alias("b"),
            F.col("code").cast("double").alias("val"),
        )
    )
    queries = [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in head[:3]]
    topk = pq_topk(
        emb, None, cb, k=5, queries=queries, codes_df=codes_df
    ).select(
        F.lit("pq").alias("part"),
        F.col("query_id").cast("long").alias("a"),
        F.col("neighbor_id").cast("long").alias("b"),
        F.col("score").alias("val"),
    )
    return codes.unionByName(topk)


def _q_text_doc_signals(spark, sf):
    """Per-document text-analysis family: stats/quality/lang-guess
    fingerprint + Gopher-style repetition signals + match_any regex-set
    hit — joined on doc_id (all map-only; join collapses to one
    projection per side + one shuffle-free zip at equal partitioning)."""
    ts = _q_text_stats(spark, sf)
    rep = _q_repetition_signals(spark, sf).drop("n_words")
    ma = _q_match_any(spark, sf)
    lid = _q_lang_id_ngram(spark, sf).select(
        "doc_id", F.col("lang").alias("lang_ngram"), "lang_score"
    )
    tk = (
        _q_tf_idf(spark, sf)
        .filter(F.col("rank") == 1)
        .select("doc_id", F.col("word").alias("top_kw"))
    )
    return (
        ts.join(rep, "doc_id")
        .join(ma, "doc_id")
        .join(lid, "doc_id", "left")
        .join(tk, "doc_id", "left")
        .withColumn("lang_ngram", F.coalesce("lang_ngram", F.lit("unk")))
        .withColumn("top_kw", F.coalesce("top_kw", F.lit("")))
    )


def _q_tf_idf(spark, sf):
    """Per-document TF-IDF keyword extraction (top-5, lexicographic
    ties, round-6 scores so the DuckDB replay ranks identically)."""
    from vector_spark.dataops.textstats import tf_idf_keywords

    docs = _load(spark, sf, "documents", min_rows=2000).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return tf_idf_keywords(docs, top_k=5)


def _q_packing_suite(spark, sf):
    """Sequence-packing family: concat-and-chunk PLACEMENT metadata
    (``pack_sequences`` — where each sequence lands) and the block
    MATERIALIZATION (``chunk_tokens`` — exact 64-token training
    blocks), unioned with a mode discriminator. Both run the SHARDED
    path (3 parallel window sorts per stream); the chunk rows carry
    the per-block token string, so the north-rule token-array
    invariant stays inside the driver window."""
    nul = F.lit(None).cast("string")
    p = _q_pack_sequences(spark, sf).select(
        F.lit("pack").alias("mode"), "stream", "shard",
        F.col("doc_id").alias("k1"), F.col("bin").alias("k2"),
        F.col("n_tok").cast("int").alias("n_tok"),
        F.col("offset").cast("string").alias("payload"),
    )
    c = _q_chunk_tokens(spark, sf).select(
        F.lit("chunk").alias("mode"), "stream", "shard",
        F.col("block").alias("k1"), F.lit(None).cast("long").alias("k2"),
        F.col("n_tok").cast("int").alias("n_tok"),
        F.col("tokens_str").alias("payload"),
    )
    b = _q_bpe_encode(spark, sf).select(
        F.lit("bpe").alias("mode"),
        F.pmod(F.col("doc_id"), F.lit(4)).alias("stream"),
        F.pmod(F.floor(F.col("doc_id") / 4), F.lit(3)).cast("long").alias("shard"),
        F.col("doc_id").alias("k1"),
        F.col("pos").alias("k2"),
        F.col("token_id").alias("n_tok"),
        F.col("source").alias("payload"),
    )
    t = _q_bpe_train(spark, sf).select(
        F.lit("bpetrain").alias("mode"),
        F.lit(None).cast("long").alias("stream"),
        F.lit(None).cast("long").alias("shard"),
        F.col("rank").cast("long").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.col("freq").cast("int").alias("n_tok"),
        F.concat(F.col("lhs"), F.lit("+"), F.col("rhs")).alias("payload"),
    )
    return p.unionByName(c).unionByName(b).unionByName(t)


def _q_tokens_doc(spark, sf):
    """Per-sequence token family over the pre-tokenized shape: token
    stats + unigram-LM mean negative logprob + bigram-LM (the
    order-sensitive signal), joined on doc_id. Bigram rows exist only
    for docs with >= 2 tokens — LEFT join, n_bigrams coalesced to 0."""
    t = _q_token_stats(spark, sf)
    u = _q_unigram_logprob(spark, sf).select("doc_id", "mean_neg_logprob")
    b = _q_bigram_logprob(spark, sf).select(
        "doc_id", "n_bigrams",
        F.col("mean_neg_logprob").alias("bigram_neg_logprob"),
    )
    return (
        t.join(u, "doc_id")
        .join(b, "doc_id", "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0).cast("long")))
    )


def _q_sampling_mix(spark, sf):
    """Curation sampling family: temperature-based mixing rates
    (corpus-level, |langs| rows) + deterministic stratified sampling
    (per-doc keep decisions) — unioned on a canonical schema."""
    mix = _q_mix_rates(spark, sf).select(
        F.lit("mix").alias("part"), F.col("lang").alias("k"),
        F.col("rate"), F.lit(None).cast("long").alias("doc_id"),
    )
    samp = _q_stratified_sample(spark, sf).select(
        F.lit("sample").alias("part"), F.col("source").alias("k"),
        F.col("sample_rate").alias("rate"), "doc_id",
    )
    return mix.unionByName(samp)


# The 50 driver-window gates, in artifact order: the driver records the
# FIRST 50 entries of queries() in CORRECTNESS_r{N}.json, so this list
# IS the hard correctness artifact. Every operator family has a row —
# composites fold the fine-grained gates (kept in all_queries() for
# bench + local parity runs; tools/check_oracles.py verifies ALL gates).
_WINDOW = [
    "flagship_pipeline",
    "filter",
    "route",
    "sample",
    "remap",
    "remap_program",
    "json_parsers",
    "grok_parser",
    "kv_logfmt",
    "tokenize_split",
    "shaper_suite",
    "dedupe",
    "reduce_modes",
    "session_windows",
    "metric_aggregate",
    "metric_statistics",
    "metric_tags_log",
    "rollup_tiers",
    "enrich_full",
    "tag_cardinality",
    "salted_agg",
    "regex_multi",
    "syslog5424",
    "parse_aws_alb_log",
    "parse_aws_vpc_flow_log",
    "datadog_search",
    "vrl_stdlib",
    "dedup_exact",
    "ngram_jaccard",
    "minhash_estimate",
    "simhash",
    "simhash_near_dups",
    "dedup_resolution",
    "ann_topk",
    "embed_near_dups",
    "text_doc_signals",
    "winnow_dup_pairs",
    "tokens_doc",
    "vocab_topk",
    "oov_rate",
    "sampling_mix",
    "pii_scrub",
    "decontamination",
    "packing_suite",
    "curation_pipeline",
    "multimodal_features",
    "stream_aggregate",
    "stream_dedupe",
    "streaming_suite",
    "resumable_run",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver-window gates (exactly 50, every operator family)."""
    allq = all_queries()
    return {k: allq[k] for k in _WINDOW}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Every gate — driver-window composites plus the fine-grained
    per-operator gates they fold (bench.py times the fine-grained set
    so per-query numbers stay comparable across rounds)."""
    return {
        "flagship_pipeline": _flagship,
        "filter": _q_filter,
        "route": _q_route,
        "sample": _q_sample,
        "remap": _q_remap,
        "remap_program": _q_remap_program,
        "json_parser": _q_json_parser,
        "grok_parser": _q_grok,
        "grok_services": _q_grok_services,
        "kv_parser": _q_kv_parser,
        "logfmt_parser": _q_logfmt,
        "tokenizer": _q_tokenizer,
        "split": _q_split,
        "coercer": _q_coercer,
        "shapers": _q_shapers,
        "dedupe": _q_dedupe,
        "reduce": _q_reduce,
        "reduce_ends_when": _q_reduce_ends_when,
        "log_to_metric": _q_log_to_metric,
        "histogram": _q_histogram,
        "aggregate_window": _q_aggregate_window,
        "enrich": _q_enrich,
        "tag_cardinality": _q_tag_cardinality,
        "dedup_exact": _q_dedup_exact,
        "ngram_jaccard": _q_jaccard,
        "minhash": _q_minhash,
        "minhash_lsh": _q_minhash_lsh,
        "simhash": _q_simhash,
        "embed_topk": _q_embed_topk,
        "embed_lsh_buckets": _q_embed_lsh,
        "text_stats": _q_text_stats,
        "field_filter": _q_field_filter,
        "explode_1n": _q_explode_1n,
        "salted_agg": _q_salted_agg,
        "parse_url": _q_parse_url,
        "parse_duration": _q_parse_duration,
        "syslog": _q_syslog,
        "encode_logfmt": _q_encode_logfmt,
        "metric_to_log": _q_metric_to_log,
        "embed_lsh_topk": _q_embed_lsh_topk,
        "merge_partial": _q_merge_partial,
        "ansi_stripper": _q_ansi_stripper,
        "stream_aggregate": _q_stream_aggregate,
        "multimodal_features": _q_multimodal,
        "ivf_topk": _q_ivf_topk,
        "vrl_parse_csv": _q_parse_csv,
        "vrl_percent": _q_encode_percent,
        "vrl_match_any": _q_match_any,
        "parse_aws_alb_log": _q_parse_aws_alb_log,
        "parse_aws_vpc_flow_log": _q_parse_vpc_flow_log,
        "vrl_ruby_hash_ip": _q_ruby_hash_and_ip,
        "regex_multi": _q_regex_multi,
        "tags_shaping": _q_tags_shaping,
        "summary_quantiles": _q_summary_quantiles,
        "syslog5424": _q_syslog5424,
        "winnow_fingerprints": _q_winnow,
        "minhash_estimate": _q_minhash_estimate,
        "reduce_expire_gap": _q_reduce_expire_gap,
        "embed_near_dups": _q_embed_near_dups,
        "distribution": _q_distribution,
        "dup_clusters": _q_dup_clusters,
        "ec2_metadata": _q_ec2_metadata,
        "pack_sequences": _q_pack_sequences,
        "chunk_tokens": _q_chunk_tokens,
        "bpe_encode": _q_bpe_encode,
        "bpe_train": _q_bpe_train,
        "quality_classifier": _q_quality_classifier,
        "bigram_logprob": _q_bigram_logprob,
        "lang_id_ngram": _q_lang_id_ngram,
        "stream_dedupe": _q_stream_dedupe,
        "datadog_search": _q_datadog_search,
        "pii_scrub": _q_pii_scrub,
        "contamination": _q_contamination,
        "stratified_sample": _q_stratified_sample,
        "token_stats": _q_token_stats,
        "vocab_topk": _q_vocab_topk,
        "oov_rate": _q_oov_rate,
        "stream_route": _q_stream_route,
        "stream_chunk_tokens": _q_stream_chunk_tokens,
        "streaming_suite": _q_streaming_suite,
        "winnow_dup_pairs": _q_winnow_dup_pairs,
        "repetition_signals": _q_repetition_signals,
        "mix_rates": _q_mix_rates,
        "rollup_tiers": _q_rollup_tiers,
        "resumable_run": _q_resumable_run,
        "session_windows": _q_session_windows,
        "dedup_resolution": _q_dedup_resolution,
        "curation_pipeline": _q_curation_pipeline,
        "unigram_logprob": _q_unigram_logprob,
        "simhash_near_dups": _q_simhash_near_dups,
        # composite family gates (driver window)
        "json_parsers": _q_json_parsers,
        "kv_logfmt": _q_kv_logfmt,
        "tokenize_split": _q_tokenize_split,
        "shaper_suite": _q_shaper_suite,
        "reduce_modes": _q_reduce_modes,
        "metric_aggregate": _q_metric_aggregate,
        "metric_statistics": _q_metric_statistics,
        "metric_tags_log": _q_metric_tags_log,
        "enrich_full": _q_enrich_full,
        "vrl_stdlib": _q_vrl_stdlib,
        "ann_topk": _q_ann_topk,
        "text_doc_signals": _q_text_doc_signals,
        "tf_idf": _q_tf_idf,
        "tokens_doc": _q_tokens_doc,
        "packing_suite": _q_packing_suite,
        "contamination_fuzzy": _q_contamination_fuzzy,
        "ivf_refine": _q_ivf_refine,
        "pq_ann": _q_pq_ann,
        "decontamination": _q_decontamination,
        "sampling_mix": _q_sampling_mix,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# duckdb's range() table function cannot be lateral — generate the
# shingle index with unnest(generate_series(...)) instead
_SHINGLES = """
  SELECT DISTINCT id, array_to_string(words[i:i+2], ' ') AS shingle
  FROM (
    SELECT doc_id AS id, words,
           unnest(generate_series(1, greatest(len(words)-2, 0))) AS i
    FROM (SELECT cast(doc_id AS bigint) AS doc_id, string_split(text, ' ') AS words
          FROM documents)
  )
"""


def oracle_sql() -> dict[str, str]:
    """Oracles for the 50 driver-window gates (same keys/order as
    queries())."""
    allo = all_oracle_sql()
    return {k: allo[k] for k in _WINDOW}


def all_oracle_sql() -> dict[str, str]:
    o = _legacy_oracle_sql()
    o.update(_composite_oracles(o))
    return o


def _composite_oracles(o: dict[str, str]) -> dict[str, str]:
    """Oracles for the composite family gates, built FROM the
    fine-grained oracles so both stay definitionally in lockstep."""
    return {
        "json_parsers": """
            SELECT event_id,
                   cast(regexp_extract(props, '"k": (\\d+)', 1) AS bigint) AS prop_k,
                   event_id AS rec_id, event_type AS body
            FROM events
            UNION ALL
            SELECT event_id,
                   cast(regexp_extract(props, '"k": (\\d+)', 1) AS bigint) AS prop_k,
                   event_id + 10000000 AS rec_id, event_type || '-tail' AS body
            FROM events
        """,
        "kv_logfmt": """
            SELECT event_id,
                   cast(200 + event_id % 5 AS bigint) AS status,
                   cast(trunc(value * 10) AS bigint) AS time,
                   'info' AS level,
                   printf('evt %s done', event_type) AS msg,
                   printf('%dms', user_id) AS dur,
                   printf('etype=%s msg="user %d"', event_type, user_id) AS line
            FROM events
        """,
        "tokenize_split": """
            SELECT cast(doc_id AS bigint) AS doc_id,
                   split_part(text, ' ', 1) AS tok1,
                   split_part(text, ' ', 2) AS tok2,
                   split_part(text, ' ', 3) AS tok3,
                   split_part(text, ' ', 1) AS w1,
                   split_part(text, ' ', 2) AS w2
            FROM documents
        """,
        "shaper_suite": """
            SELECT event_id, 'pipeline' AS app,
                   event_type || '-' || cast(user_id AS varchar) AS label,
                   substr(event_type, 1, 3) AS etype_head,
                   event_type AS etype,
                   cast(cast(value AS varchar) AS double) AS value_f,
                   event_type || ' done' AS clean
            FROM events
        """,
        "reduce_modes": f"""
            SELECT 'reduce' AS mode, user_id, first_ord AS anchor,
                   etypes AS text, sum_value
            FROM ({o["reduce"]})
            UNION ALL
            SELECT 'ends_when' AS mode, user_id, session_start AS anchor,
                   etypes AS text, cast(NULL AS double) AS sum_value
            FROM ({o["reduce_ends_when"]})
            UNION ALL
            SELECT 'expire_gap' AS mode, user_id, session_start AS anchor,
                   etypes AS text, cast(NULL AS double) AS sum_value
            FROM ({o["reduce_expire_gap"]})
            UNION ALL
            SELECT 'merge' AS mode, user_id, closed_at AS anchor,
                   merged AS text, cast(NULL AS double) AS sum_value
            FROM ({o["merge_partial"]})
        """,
        "metric_aggregate": f"""
            SELECT 'by_type' AS part, type_tag AS key, cnt
            FROM ({o["log_to_metric"]})
            UNION ALL
            SELECT 'hourly' AS part, cast(hour AS varchar) AS key, cnt
            FROM ({o["aggregate_window"]})
        """,
        "metric_statistics": f"""
            SELECT h.event_type, h.le_5_0, h.le_10_0, h.le_15_0,
                   h.count AS h_count, h.sum AS h_sum,
                   s.q5, s.q9, s.count AS s_count, s.sum AS s_sum,
                   d.min AS d_min, d.max AS d_max, d.median AS d_median,
                   d.q95 AS d_q95, d.count AS d_count, d.sum AS d_sum
            FROM ({o["histogram"]}) h
            JOIN ({o["summary_quantiles"]}) s USING (event_type)
            JOIN ({o["distribution"]}) d USING (event_type)
        """,
        "metric_tags_log": """
            SELECT 'events_total' AS name, 'incremental' AS kind,
                   'counter' AS metric_type, cast(count(*) AS bigint) AS cnt,
                   printf('{"etype":"%s","env":"prod"}', event_type) AS tags_json
            FROM events GROUP BY event_type
        """,
        "enrich_full": f"""
            SELECT event_id, event_type, category, weight,
                   'i-0123456789abcdef0' AS instance_id,
                   'us-east-1' AS region,
                   'us-east-1a' AS availability_zone,
                   'm5.2xlarge' AS instance_type
            FROM ({o["enrich"]})
        """,
        "vrl_stdlib": """
            WITH lv AS (
              SELECT *,
                     ['emerg','alert','crit','err','warning','notice','info','debug']
                       [cast(event_id % 8 AS int) + 1] AS level
              FROM events
            )
            SELECT event_id,
                   'https' AS scheme,
                   printf('host%d.example.com', user_id % 10) AS host,
                   printf('/api/%s/%d', event_type, event_id) AS path,
                   printf('page=%d', event_id % 7) AS query,
                   round(cast(trunc(value * 10) AS bigint) * 0.001, 6) AS dur_s,
                   level,
                   CASE level WHEN 'emerg' THEN 0 WHEN 'alert' THEN 1 WHEN 'crit' THEN 2
                        WHEN 'err' THEN 3 WHEN 'warning' THEN 4 WHEN 'notice' THEN 5
                        WHEN 'info' THEN 6 WHEN 'debug' THEN 7 END AS severity,
                   level AS roundtrip,
                   event_type AS f1,
                   cast(event_id AS varchar) AS f2,
                   event_type || ', Inc.' AS f3,
                   event_type || '%20x%20y' AS enc,
                   event_type || ' x y' AS dec,
                   event_type AS etype,
                   cast(event_id AS varchar) AS n,
                   printf('id=%d lvl=%s', event_id, event_type) AS kv,
                   printf('::ffff:10.%d.%d.%d', event_id % 250, user_id % 250,
                          (event_id * 7) % 250) AS v6,
                   printf('10.%d.%d.%d', event_id % 250, user_id % 250,
                          (event_id * 7) % 250) AS v4_back
            FROM lv
        """,
        "ann_topk": f"""
            SELECT 'brute' AS method, query_id, neighbor_id, cos
            FROM ({o["embed_topk"]})
            UNION ALL
            SELECT 'lsh' AS method, query_id, neighbor_id, cos
            FROM ({o["embed_lsh_topk"]})
            UNION ALL
            SELECT 'ivf' AS method, query_id, neighbor_id, cos
            FROM ({o["ivf_topk"]})
            UNION ALL
            SELECT 'centroid' AS method, cell AS query_id,
                   dim AS neighbor_id, val AS cos
            FROM ({o["ivf_refine"]})
            UNION ALL
            SELECT part AS method, a AS query_id, b AS neighbor_id,
                   val AS cos
            FROM ({o["pq_ann"]})
        """,
        "text_doc_signals": f"""
            SELECT t.*, r.mean_word_len, r.symbol_word_ratio, r.bullet_ratio,
                   r.ellipsis_ratio, r.dup_2gram_frac, r.dup_3gram_frac, m.hit,
                   coalesce(l.lang, 'unk') AS lang_ngram, l.lang_score,
                   coalesce(k.word, '') AS top_kw
            FROM ({o["text_stats"]}) t
            JOIN ({o["repetition_signals"]}) r USING (doc_id)
            JOIN ({o["vrl_match_any"]}) m USING (doc_id)
            LEFT JOIN ({o["lang_id_ngram"]}) l ON l.doc_id = t.doc_id
            LEFT JOIN (SELECT doc_id, word FROM ({o["tf_idf"]})
                       WHERE "rank" = 1) k ON k.doc_id = t.doc_id
        """,
        "tokens_doc": f"""
            SELECT t.*, u.mean_neg_logprob,
                   coalesce(b.n_bigrams, 0) AS n_bigrams,
                   b.mean_neg_logprob AS bigram_neg_logprob
            FROM ({o["token_stats"]}) t
            JOIN ({o["unigram_logprob"]}) u USING (doc_id)
            LEFT JOIN ({o["bigram_logprob"]}) b ON b.doc_id = t.doc_id
        """,
        "decontamination": f"""
            SELECT 'exact' AS part, doc_id, cast(n_grams AS bigint) AS k,
                   cast(n_contaminated AS bigint) AS n, contamination AS ratio
            FROM ({o["contamination"]})
            UNION ALL
            SELECT 'fuzzy' AS part, doc_id, bench_id AS k,
                   cast(NULL AS bigint) AS n, est_jaccard AS ratio
            FROM ({o["contamination_fuzzy"]})
        """,
        "packing_suite": f"""
            SELECT 'pack' AS mode, stream, shard, doc_id AS k1, bin AS k2,
                   cast(n_tok AS int) AS n_tok, cast("offset" AS varchar) AS payload
            FROM ({o["pack_sequences"]})
            UNION ALL
            SELECT 'chunk' AS mode, stream, shard, block AS k1,
                   cast(NULL AS bigint) AS k2, cast(n_tok AS int) AS n_tok,
                   tokens_str AS payload
            FROM ({o["chunk_tokens"]})
            UNION ALL
            SELECT 'bpe' AS mode, doc_id % 4 AS stream,
                   cast(floor(doc_id / 4) % 3 AS bigint) AS shard,
                   doc_id AS k1, pos AS k2, token_id AS n_tok,
                   source AS payload
            FROM ({o["bpe_encode"]})
            UNION ALL
            SELECT 'bpetrain' AS mode, cast(NULL AS bigint) AS stream,
                   cast(NULL AS bigint) AS shard,
                   cast("rank" AS bigint) AS k1,
                   cast(NULL AS bigint) AS k2,
                   cast(freq AS int) AS n_tok,
                   lhs || '+' || rhs AS payload
            FROM ({o["bpe_train"]})
        """,
        "stream_chunk_tokens": o["chunk_tokens"],
        "streaming_suite": f"""
            SELECT 'route' AS part, lane AS k1,
                   cast(NULL AS bigint) AS k2, cast(NULL AS bigint) AS k3,
                   cast(n AS bigint) AS n, cast(id_sum AS varchar) AS payload
            FROM ({o["stream_route"]})
            UNION ALL
            SELECT 'chunk' AS part, cast(stream AS varchar) AS k1,
                   shard AS k2, block AS k3, cast(n_tok AS bigint) AS n,
                   tokens_str AS payload
            FROM ({o["chunk_tokens"]})
        """,
        "sampling_mix": f"""
            SELECT 'mix' AS part, lang AS k, rate, cast(NULL AS bigint) AS doc_id
            FROM ({o["mix_rates"]})
            UNION ALL
            SELECT 'sample' AS part, source AS k, sample_rate AS rate, doc_id
            FROM ({o["stratified_sample"]})
        """,
    }




def _lang_id_oracle() -> str:
    from vector_spark.dataops.textstats import LANG_TRIGRAM_PROFILES

    prof_values = ", ".join(
        f"('{lang}', '{tri.replace(chr(39), chr(39)*2)}', {w})"
        for lang, prof in sorted(LANG_TRIGRAM_PROFILES.items())
        for tri, w in sorted(prof.items())
    )
    langs = sorted(LANG_TRIGRAM_PROFILES)
    score_cols = ",\n                     ".join(
        f"sum(CASE WHEN p.lang = '{lg}' THEN p.w ELSE 0 END) AS s_{lg}"
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"s_{lg}" for lg in langs) + ")"
    winner = "'unk'"
    for lg in reversed(langs):
        winner = f"CASE WHEN s_{lg} = {best} THEN '{lg}' ELSE {winner} END"
    return f"""
        WITH base AS (
          SELECT cast(doc_id AS bigint) AS doc_id,
                 {_NORM} AS t,
                 length(text)
                   - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS cjk,
                 length(text) AS len
          FROM documents
        ), occ AS (
          SELECT doc_id, cjk, len,
                 unnest([substr(t, i, 3)
                         for i in generate_series(1, greatest(length(t) - 2, 0))])
                     AS trigram
          FROM base
        ), prof(lang, trigram, w) AS (VALUES {prof_values}),
        scored AS (
          SELECT o.doc_id,
                 any_value(o.cjk) AS cjk, any_value(o.len) AS len,
                 {score_cols}
          FROM occ o LEFT JOIN prof p USING (trigram)
          GROUP BY o.doc_id
        )
        SELECT doc_id,
               CASE WHEN cjk * 3 >= len THEN 'zh'
                    WHEN {best} < 8 THEN 'unk'
                    ELSE {winner} END AS lang,
               CASE WHEN cjk * 3 >= len THEN NULL
                    ELSE cast({best} AS bigint) END AS lang_score
        FROM scored
    """


_LANG_ID_ORACLE = _lang_id_oracle()


def _bpe_oracle() -> str:
    """DuckDB replay of the rank-greedy BPE merge loop: a recursive
    CTE carries (word, parts[]) and each iteration merges the single
    lowest-rank adjacent pair (leftmost on ties — ``list_position``
    returns the first minimum, matching the engine's strict ``<``
    scan). Merge ranks and the derived vocabulary ship as MAP
    literals built from the SAME ``_BPE_MERGES`` constant the Spark
    gate uses, so gate and oracle cannot drift."""
    from vector_spark.dataops.tokens import derive_bpe_vocab

    vocab = derive_bpe_vocab(_BPE_MERGES)
    mkeys = ", ".join(f"'{a}|{b}'" for a, b in _BPE_MERGES)
    mvals = ", ".join(str(i) for i in range(len(_BPE_MERGES)))
    vkeys = ", ".join(f"'{s}'" for s in vocab)
    vvals = ", ".join(str(i) for i in vocab.values())
    return f"""
        WITH RECURSIVE
        ws AS (
          SELECT cast(doc_id AS bigint) AS doc_id, source,
                 list_filter(string_split({_NORM}, ' '), w -> w <> '') AS words
          FROM documents
        ),
        wpos AS (
          SELECT doc_id, source,
                 unnest(range(1, len(words)+1)) AS widx,
                 unnest(words) AS word
          FROM ws
        ),
        dw AS (SELECT DISTINCT word FROM wpos),
        step(word, parts, done) AS (
          SELECT word,
                 list_transform(range(1, length(word)+1), i -> word[i]),
                 false
          FROM dw
          UNION ALL
          SELECT word,
                 CASE WHEN bj IS NULL THEN parts
                      ELSE parts[1:bj-1] || [parts[bj] || parts[bj+1]]
                           || parts[bj+2:] END,
                 bj IS NULL
          FROM (
            SELECT word, parts,
                   CASE WHEN list_min(rks) >= 999999 THEN NULL
                        ELSE list_position(rks, list_min(rks)) END AS bj
            FROM (
              SELECT word, parts,
                     list_transform(range(1, len(parts)),
                       j -> coalesce(map_extract(MAP([{mkeys}], [{mvals}]),
                                     parts[j] || '|' || parts[j+1])[1],
                                     999999)) AS rks
              FROM step WHERE NOT done
            )
          )
        ),
        enc AS (
          SELECT word,
                 list_transform(parts,
                   p -> coalesce(map_extract(MAP([{vkeys}], [{vvals}]),
                                 p)[1], 0)) AS ids
          FROM step WHERE done
        ),
        flat AS (
          SELECT w.doc_id, w.source,
                 flatten(list(e.ids ORDER BY w.widx)) AS toks
          FROM wpos w JOIN enc e USING (word)
          GROUP BY w.doc_id, w.source
        )
        SELECT doc_id, source,
               unnest(range(0, len(toks))) AS pos,
               cast(unnest(toks) AS int) AS token_id
        FROM flat
    """


_PQ_ANN_ORACLE = """
    WITH emb AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), js AS (SELECT unnest(range(0, 4)) AS j
    ), seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
             embedding::DOUBLE[] AS c
      FROM embeddings ORDER BY vec_id LIMIT 8
    ), subs AS (
      SELECT vec_id, j, v[j*16+1 : j*16+16] AS sv FROM emb CROSS JOIN js
    ), scb AS (
      SELECT s.cell, j, c[j*16+1 : j*16+16] AS cent
      FROM seeds s CROSS JOIN js
    ), a1 AS (
      SELECT vec_id, j, cell, sv FROM (
        SELECT t.vec_id, t.j, s.cell, t.sv,
               row_number() OVER (
                 PARTITION BY t.vec_id, t.j
                 ORDER BY round(list_dot_product(s.cent, s.cent)
                                - 2*list_dot_product(t.sv, s.cent), 6) ASC,
                          s.cell ASC) AS rk
        FROM subs t JOIN scb s USING (j)
      ) WHERE rk = 1
    ), m1 AS (
      SELECT j, cell, dim, round(avg(sv[dim]), 6) AS m
      FROM (SELECT j, cell, sv,
                   unnest(generate_series(1, 16)) AS dim FROM a1)
      GROUP BY j, cell, dim
    ), cb1 AS (
      SELECT s.j, s.cell, coalesce(g.c, s.cent) AS cent
      FROM scb s LEFT JOIN (
        SELECT j, cell, list(m ORDER BY dim) AS c FROM m1 GROUP BY j, cell
      ) g ON g.j = s.j AND g.cell = s.cell
    ), codes AS (
      SELECT vec_id, j, cell AS code FROM (
        SELECT t.vec_id, t.j, s.cell,
               row_number() OVER (
                 PARTITION BY t.vec_id, t.j
                 ORDER BY round(list_dot_product(s.cent, s.cent)
                                - 2*list_dot_product(t.sv, s.cent), 6) ASC,
                          s.cell ASC) AS rk
        FROM subs t JOIN cb1 s USING (j)
      ) WHERE rk = 1
    ), queries AS (
      SELECT vec_id AS query_id, v FROM emb ORDER BY vec_id LIMIT 3
    ), lut AS (
      SELECT q.query_id, c.j, c.cell,
             round(list_dot_product(q.v[c.j*16+1 : c.j*16+16], c.cent), 6) AS p
      FROM queries q CROSS JOIN cb1 c
    ), parts AS (
      SELECT c.vec_id AS neighbor_id, l.query_id,
             list(l.p ORDER BY l.j) AS ps
      FROM codes c JOIN lut l ON l.j = c.j AND l.cell = c.code
      GROUP BY 1, 2
    ), topk AS (
      SELECT query_id, neighbor_id, score FROM (
        SELECT query_id, neighbor_id,
               round(ps[1] + ps[2] + ps[3] + ps[4], 6) AS score,
               row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY round(ps[1] + ps[2] + ps[3] + ps[4], 6) DESC,
                          neighbor_id ASC) AS rk
        FROM parts WHERE neighbor_id <> query_id
      ) WHERE rk <= 5
    )
    SELECT 'pq_code' AS part, cast(vec_id AS bigint) AS a,
           cast(j AS bigint) AS b, cast(code AS double) AS val
    FROM codes
    UNION ALL
    SELECT 'pq' AS part, cast(query_id AS bigint) AS a,
           cast(neighbor_id AS bigint) AS b, score AS val
    FROM topk
"""


def _bpe_train_oracle(k: int = 8) -> str:
    """DuckDB replay of distributed BPE merge learning: k unrolled
    stages, each computing weighted adjacent-pair counts over the
    word histogram, the lexicographic-tie argmax, and the merge
    application as a list_reduce string fold (pending symbol = tail
    of a \\x1f-joined accumulator — the same fold bpe_train runs via
    F.aggregate). A best row with freq < 2 is filtered (Spark's
    min_freq early stop); once the max drops below 2 it can never
    recover, so filtered rows are always a suffix and ranks align."""
    stages = []
    for i in range(k):
        stages.append(f"""
        p{i} AS (
          SELECT pair, sum(freq) AS c
          FROM (
            SELECT freq,
                   unnest([x[1] || chr(30) || x[2]
                           for x in list_zip(arr, arr[2:], true)]) AS pair
            FROM s{i}
          )
          GROUP BY pair
        ),
        b{i} AS (
          SELECT {i} AS "rank",
                 string_split(pair, chr(30))[1] AS lhs,
                 string_split(pair, chr(30))[2] AS rhs,
                 cast(c AS bigint) AS freq
          FROM p{i} ORDER BY c DESC, pair ASC LIMIT 1
        ),
        s{i + 1} AS (
          SELECT word, s{i}.freq AS freq,
                 string_split(list_reduce(arr,
                   (acc, x) -> CASE
                     WHEN (acc = b{i}.lhs
                           OR ends_with(acc, chr(31) || b{i}.lhs))
                          AND x = b{i}.rhs
                     THEN acc || b{i}.rhs
                     ELSE acc || chr(31) || x END), chr(31)) AS arr
          FROM s{i}, b{i}
        )""")
    union = "\nUNION ALL\n".join(
        f'SELECT * FROM b{i} WHERE freq >= 2' for i in range(k)
    )
    return f"""
        WITH words AS (
          SELECT word, cast(count(*) AS bigint) AS freq
          FROM (
            SELECT unnest(list_filter(string_split({_NORM}, ' '),
                                      w -> w <> '')) AS word
            FROM documents
          )
          GROUP BY word
        ),
        s0 AS (
          SELECT word, freq,
                 list_transform(range(1, length(word)+1), i -> word[i]) AS arr
          FROM words
        ),
        {",".join(stages)}
        {union}
    """


def _legacy_oracle_sql() -> dict[str, str]:
    return {
        "flagship_pipeline": _FLAGSHIP_ORACLE,
        "filter": """
            SELECT event_id, event_type, value FROM events
            WHERE event_type = 'error' AND value > 10.0
        """,
        "route": """
            SELECT 'errors' AS lane, event_id FROM events WHERE event_type = 'error'
            UNION ALL
            SELECT 'high_value' AS lane, event_id FROM events WHERE value >= 15.0
            UNION ALL
            SELECT 'rest' AS lane, event_id FROM events
            WHERE event_type <> 'error' AND value < 15.0
            UNION ALL
            SELECT 'purchases' AS lane, event_id FROM events
            WHERE event_type = 'purchase'
        """,
        "sample": """
            SELECT event_id, event_type, 4 AS sample_rate FROM events
            WHERE substr(md5(cast(event_id AS varchar)), 1, 1) IN ('0','1','2','3')
        """,
        "remap": """
            SELECT event_id, upper(event_type) AS etype_up,
                   round(value * 2.0 + 1.0, 2) AS value2,
                   coalesce(value, 0.0) AS vnz
            FROM events
        """,
        "remap_program": """
            -- mirrors the symbolic execution of the VRL program:
            -- abort ('purchase') rolls back every assignment; the
            -- branch-local del(.props) nulls props for 'error' rows
            WITH t AS (
              SELECT *,
                     CASE WHEN value > 100.0 THEN 'high'
                          WHEN value > 50.0 THEN 'mid'
                          ELSE 'low' END AS tier0,
                     CASE WHEN value > 100.0 THEN value * 2.0
                          WHEN value > 50.0 THEN value
                          ELSE 0.0 END AS score0
              FROM events
            )
            SELECT event_id,
                   CASE WHEN event_type = 'purchase' THEN NULL ELSE tier0 END AS tier,
                   CASE WHEN event_type = 'purchase' THEN NULL
                        ELSE round(score0, 2) END AS score,
                   CASE WHEN event_type = 'purchase' THEN NULL
                        ELSE cast(event_type = 'error' AS int) END AS flag,
                   CASE WHEN event_type = 'purchase' THEN NULL
                        ELSE event_type || '/' || tier0 END AS label,
                   CASE WHEN event_type = 'error' THEN NULL
                        ELSE props END AS props_left
            FROM t
        """,
        "json_parser": """
            SELECT event_id,
                   cast(regexp_extract(props, '"k": (\\d+)', 1) AS bigint) AS prop_k
            FROM events
        """,
        "grok_parser": """
            SELECT event_id,
                   printf('10.0.%d.%d', user_id % 256, event_id % 256) AS clientip,
                   'GET' AS verb,
                   printf('/api/%d', event_id) AS request,
                   cast(200 + (event_id % 3) * 100 AS bigint) AS response,
                   cast(trunc(value * 100) AS bigint) AS bytes,
                   printf('host%d', user_id) AS sys_host,
                   'cron' AS sys_prog,
                   cast(event_id % 1000 AS bigint) AS sys_pid,
                   printf('job %d finished', event_id) AS sys_msg,
                   printf('10.1.%d.%d', user_id % 200, event_id % 200) AS ha_client_ip,
                   printf('srv%d', 1 + event_id % 4) AS ha_server,
                   cast(event_id % 50 AS bigint) AS ha_t_resp,
                   cast(200 + (event_id % 4) * 100 AS bigint) AS ha_status,
                   printf('/page/%d', event_id) AS ha_request,
                   printf('12/%02d/2015 10:00:%02d',
                          1 + event_id % 28, event_id % 60) AS pg_ts,
                   printf('user=u%d', user_id) AS pg_user,
                   printf('conn%d', event_id) AS pg_conn,
                   cast(100 + event_id % 900 AS bigint) AS pg_pid,
                   'GET' AS rl_verb,
                   printf('/items/%d', event_id) AS rl_request,
                   printf('10.3.0.%d', user_id % 256) AS rl_clientip,
                   printf('2015-02-%02d 10:00:%02d +0100',
                          1 + event_id % 28, event_id % 60) AS rl_ts
            FROM events
        """,
        "grok_services": """
            SELECT event_id,
                   printf('2015-01-%02dT10:00:%02d.000+0000',
                          1 + event_id % 28, event_id % 60) AS mg_ts,
                   'I' AS mg_sev,
                   'NETWORK' AS mg_comp,
                   printf('conn%d', event_id) AS mg_ctx,
                   printf('end connection 10.0.0.%d', user_id % 256) AS mg_msg,
                   printf('1424%06d.%06d',
                          event_id % 1000000, event_id % 1000000) AS rd_ts,
                   cast(event_id % 16 AS bigint) AS rd_db,
                   printf('10.2.3.%d', user_id % 256) AS rd_client,
                   cast(40000 + event_id % 10000 AS bigint) AS rd_port,
                   'GET' AS rd_cmd,
                   printf('key:%d', event_id) AS rd_params,
                   printf('2015-03-%02d 11:22:%02d',
                          1 + event_id % 28, event_id % 60) AS ex_ts,
                   printf('%06d-AbCdEf-%02d',
                          event_id % 1000000, event_id % 100) AS ex_msgid,
                   '<=' AS ex_flags,
                   printf('u%d@example.com S=%d',
                          user_id, 100 + event_id % 5000) AS ex_msg,
                   printf('user=u%d', user_id) AS pg_user,
                   printf('conn%d', event_id) AS pg_conn,
                   cast(100 + event_id % 900 AS bigint) AS pg_pid,
                   'GET' AS rl_verb,
                   printf('/items/%d', event_id) AS rl_request,
                   printf('10.3.0.%d', user_id % 256) AS rl_clientip,
                   printf('2015-02-%02d 10:00:%02d +0100',
                          1 + event_id % 28, event_id % 60) AS rl_ts
            FROM events
        """,
        "kv_parser": """
            SELECT event_id,
                   cast(200 + event_id % 5 AS bigint) AS status,
                   cast(trunc(value * 10) AS bigint) AS time
            FROM events
        """,
        "logfmt_parser": """
            SELECT event_id, 'info' AS level,
                   printf('evt %s done', event_type) AS msg,
                   printf('%dms', user_id) AS dur
            FROM events
        """,
        "tokenizer": """
            SELECT cast(doc_id AS bigint) AS doc_id,
                   split_part(text, ' ', 1) AS tok1,
                   split_part(text, ' ', 2) AS tok2,
                   split_part(text, ' ', 3) AS tok3
            FROM documents
        """,
        "split": """
            SELECT cast(doc_id AS bigint) AS doc_id,
                   split_part(text, ' ', 1) AS w1,
                   split_part(text, ' ', 2) AS w2
            FROM documents
        """,
        "coercer": """
            SELECT event_id, cast(cast(value AS varchar) AS double) AS value_f FROM events
        """,
        "shapers": """
            SELECT event_id, 'pipeline' AS app,
                   event_type || '-' || cast(user_id AS varchar) AS label,
                   substr(event_type, 1, 3) AS etype_head,
                   event_type AS etype
            FROM events
        """,
        "dedupe": """
            SELECT event_id, user_id, event_type FROM (
              SELECT event_id, user_id, event_type,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "reduce": """
            SELECT user_id,
                   string_agg(event_type, ' ' ORDER BY event_id) AS etypes,
                   cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value,
                   min(event_id) AS first_ord
            FROM events GROUP BY user_id
        """,
        "reduce_ends_when": """
            WITH s AS (
              SELECT user_id, event_id AS ord, event_type,
                     coalesce(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sess
              FROM events
            )
            SELECT user_id, min(ord) AS session_start,
                   string_agg(event_type, ' ' ORDER BY ord) AS etypes
            FROM s GROUP BY user_id, sess
        """,
        "log_to_metric": """
            SELECT 'events_total' AS name, event_type AS type_tag,
                   count(*) AS cnt
            FROM events GROUP BY event_type
        """,
        "histogram": """
            SELECT event_type,
                   cast(sum(CASE WHEN value <= 5.0 THEN 1 ELSE 0 END) AS bigint) AS le_5_0,
                   cast(sum(CASE WHEN value <= 10.0 THEN 1 ELSE 0 END) AS bigint) AS le_10_0,
                   cast(sum(CASE WHEN value <= 15.0 THEN 1 ELSE 0 END) AS bigint) AS le_15_0,
                   count(value) AS count,
                   cast(sum(cast(value AS decimal(18,2))) AS double) AS sum
            FROM events GROUP BY event_type
        """,
        "aggregate_window": """
            SELECT date_trunc('hour', ts) AS hour, count(*) AS cnt
            FROM events GROUP BY 1
        """,
        "enrich": """
            SELECT e.event_id, e.event_type, v.category, v.weight
            FROM events e
            LEFT JOIN (VALUES ('click','interaction',1),('view','interaction',0),
                              ('signup','conversion',5),('purchase','conversion',10),
                              ('error','fault',-1)) v(event_type, category, weight)
              ON e.event_type = v.event_type
        """,
        "tag_cardinality": """
            WITH fs AS (
              SELECT cast(user_id AS varchar) AS uv, min(ts) AS f_ts
              FROM events GROUP BY 1
            ), ranked AS (
              SELECT uv, row_number() OVER (ORDER BY f_ts, uv) AS rk FROM fs
            )
            SELECT e.event_id FROM events e
            JOIN ranked r ON cast(e.user_id AS varchar) = r.uv
            WHERE r.rk <= 5
        """,
        "dedup_exact": f"""
            SELECT md5({_NORM}) AS fingerprint,
                   min(cast(doc_id AS bigint)) AS keep_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "ngram_jaccard": f"""
            WITH sh_all AS ({_SHINGLES}),
            sh AS (
              -- stop-shingle pruning mirror: drop shingles whose
              -- document frequency exceeds the cap (50)
              SELECT * FROM sh_all
              WHERE shingle IN (
                SELECT shingle FROM sh_all GROUP BY shingle HAVING count(*) <= 50
              )
            ),
            sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
            inter AS (
              SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(i / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE round(i / (sa.n_sh + sb.n_sh - i), 6) >= 0.35
        """,
        "minhash": f"""
            WITH sh AS ({_SHINGLES})
            SELECT id, seed,
                   min(CAST(('0x' || substr(md5(cast(seed AS varchar) || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
            FROM sh, range(0, 8) s(seed)
            GROUP BY id, seed
        """,
        "minhash_lsh": f"""
            WITH sh AS ({_SHINGLES}),
            sig AS (
              SELECT id, seed,
                     min(CAST(('0x' || substr(md5(cast(seed AS varchar) || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
              FROM sh, range(0, 8) s(seed) GROUP BY id, seed
            ),
            banded AS (
              SELECT id, cast(floor(seed / 2) AS int) AS band,
                     md5(string_agg(CAST(minhash AS varchar), '|' ORDER BY minhash)) AS band_hash
              FROM sig GROUP BY id, band
            )
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
        """,
        "stream_dedupe": """
            SELECT DISTINCT event_type, cast(user_id AS bigint) AS user_id
            FROM events
        """,
        "datadog_search": r"""
            WITH frame AS (
                SELECT event_id,
                       printf('user %d did %s', user_id, event_type) AS message,
                       printf('host-%d', user_id % 20) AS host,
                       [printf('etype:%s', event_type),
                        printf('sh%d', event_id % 4)] AS tags,
                       (['us-east-1', 'eu-west-2', 'ap-east-9'])[(user_id % 3) + 1]
                           AS region,
                       value
                FROM events
            ), judged AS (
                SELECT event_id,
                       (list_contains(tags, 'etype:error') AND value >= 100.0) AS q1,
                       (starts_with(host, 'host-1')
                        OR (regexp_matches(message, '\bdid\b')
                            AND regexp_matches(message, '\bpurchase\b'))) AS q2,
                       (NOT list_contains(tags, 'sh2')
                        AND len(list_filter(tags,
                            t -> t = 'etype' OR starts_with(t, 'etype:'))) > 0
                        AND regexp_matches(region, '^.*east.*$')) AS q3
                FROM frame
            )
            SELECT event_id, q1, q2, q3 FROM judged WHERE q1 OR q2 OR q3
        """,
        "pii_scrub": r"""
            WITH synth AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     text || printf(
                       ' contact user%d@ex%d.org or 10.%d.%d.%d tel 555-%03d-%04d card 4111%012d',
                       doc_id, doc_id % 7, doc_id % 200, (doc_id * 3) % 200,
                       (doc_id * 7) % 200, doc_id % 1000, doc_id % 10000, doc_id
                     ) AS text
              FROM documents
            )
            -- counts are progressive: each kind counted on the text
            -- AFTER earlier kinds were redacted (matches pii_scrub)
            SELECT doc_id,
                   cast(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS int) AS n_email,
                   cast(len(regexp_extract_all(t1,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS int) AS n_ipv4,
                   cast(len(regexp_extract_all(t2,
                       '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS int) AS n_phone,
                   cast(len(regexp_extract_all(t3,
                       '\b\d{13,19}\b')) AS int) AS n_longnum,
                   md5(regexp_replace(t3, '\b\d{13,19}\b', '<NUM>', 'g')) AS scrub_md5
            FROM (
              SELECT doc_id, text, t1, t2,
                     regexp_replace(t2, '\b\d{3}[-.]\d{3}[-.]\d{4}\b',
                                    '<PHONE>', 'g') AS t3
              FROM (
                SELECT doc_id, text, t1,
                       regexp_replace(t1,
                         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                         '<IP>', 'g') AS t2
                FROM (
                  SELECT doc_id, text,
                         regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS t1
                  FROM synth
                )
              )
            )
        """,
        "contamination": f"""
            WITH words AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     string_split({_NORM}, ' ') AS w
              FROM documents
            ), grams AS (
              -- docs shorter than n words emit no grams (shingle
              -- convention; matches curation._gram_frame)
              SELECT DISTINCT doc_id,
                     unnest([array_to_string(w[j+1:j+3], ' ')
                             for j in range(0, len(w)-3+1)]) AS g
              FROM words WHERE len(w) >= 3
            ), grams_ne AS (
              SELECT * FROM grams WHERE len(g) > 0
            ), bench AS (
              SELECT DISTINCT g FROM grams_ne WHERE doc_id % 97 = 0
            ), train AS (
              SELECT * FROM grams_ne WHERE doc_id % 97 <> 0
            ), totals AS (
              SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id
            ), hits AS (
              SELECT t.doc_id, count(*) AS n_contaminated
              FROM train t JOIN bench b USING (g) GROUP BY t.doc_id
            )
            SELECT t.doc_id, t.n_grams, h.n_contaminated,
                   round(h.n_contaminated / t.n_grams, 6) AS contamination
            FROM hits h JOIN totals t ON h.doc_id = t.doc_id
        """,
        "ivf_refine": """
            WITH emb AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ), seeds AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                     embedding::DOUBLE[] AS c
              FROM embeddings ORDER BY vec_id LIMIT 8
            ), a1 AS (
              SELECT vec_id, cell, v FROM (
                SELECT e.vec_id, s.cell, e.v,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round(list_dot_product(e.v, s.c)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(s.c, s.c)) + 1e-12), 6)
                           DESC, s.cell ASC) AS rk
                FROM emb e CROSS JOIN seeds s
              ) WHERE rk = 1
            ), m1 AS (
              SELECT cell, dim, round(avg(v[dim]), 6) AS m
              FROM (SELECT cell, v,
                           unnest(generate_series(1, len(v))) AS dim
                    FROM a1)
              GROUP BY cell, dim
            ), cents1 AS (
              SELECT s.cell, coalesce(g.c, s.c) AS c
              FROM seeds s LEFT JOIN (
                SELECT cell, list(m ORDER BY dim) AS c FROM m1 GROUP BY cell
              ) g USING (cell)
            ), a2 AS (
              SELECT vec_id, cell, v FROM (
                SELECT e.vec_id, s.cell, e.v,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round(list_dot_product(e.v, s.c)
                           / (sqrt(list_dot_product(e.v, e.v))
                              * sqrt(list_dot_product(s.c, s.c)) + 1e-12), 6)
                           DESC, s.cell ASC) AS rk
                FROM emb e CROSS JOIN cents1 s
              ) WHERE rk = 1
            ), m2 AS (
              SELECT cell, dim, round(avg(v[dim]), 6) AS m
              FROM (SELECT cell, v,
                           unnest(generate_series(1, len(v))) AS dim
                    FROM a2)
              GROUP BY cell, dim
            ), final AS (
              SELECT s.cell, dd.dim,
                     coalesce(m2.m, s.c[dd.dim]) AS val
              FROM cents1 s
              CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim) dd
              LEFT JOIN m2 ON m2.cell = s.cell AND m2.dim = dd.dim
            )
            SELECT cast(cell AS bigint) AS cell,
                   cast(dim - 1 AS bigint) AS dim,
                   val
            FROM final
        """,
        "contamination_fuzzy": """
            WITH ids AS (
              -- every doc is on the training side; the benchmark side
              -- is the lightly-edited copy (last word dropped) of the
              -- doc_id % 97 == 0 docs, offset into the 2^40 id space
              SELECT cast(doc_id AS bigint) AS id,
                     string_split(text, ' ') AS words
              FROM documents
              UNION ALL
              SELECT cast(doc_id AS bigint) + 1099511627776 AS id,
                     ws[1:len(ws)-1] AS words
              FROM (SELECT doc_id, string_split(text, ' ') AS ws
                    FROM documents WHERE doc_id % 97 = 0)
            ), sh AS (
              SELECT DISTINCT id, array_to_string(words[i:i+2], ' ') AS shingle
              FROM (
                SELECT id, words,
                       unnest(generate_series(1, greatest(len(words)-2, 0))) AS i
                FROM ids
              )
            ), sig AS (
              SELECT id, seed,
                     min(CAST(('0x' || substr(md5(cast(seed AS varchar) || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
              FROM sh, range(0, 16) s(seed) GROUP BY id, seed
            ), banded AS (
              SELECT id, cast(floor(seed / 2) AS int) AS band,
                     md5(string_agg(CAST(minhash AS varchar), '|' ORDER BY minhash)) AS band_hash
              FROM sig GROUP BY id, band
            ), cands AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
            ), est AS (
              SELECT c.id_a, c.id_b,
                     round(avg(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END), 6)
                       AS est_jaccard
              FROM cands c
              JOIN sig sa ON sa.id = c.id_a
              JOIN sig sb ON sb.id = c.id_b AND sb.seed = sa.seed
              GROUP BY c.id_a, c.id_b
              HAVING round(avg(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END), 6) >= 0.25
            )
            SELECT CASE WHEN id_a < 1099511627776 THEN id_a ELSE id_b END AS doc_id,
                   CASE WHEN id_a >= 1099511627776 THEN id_a ELSE id_b END
                     - 1099511627776 AS bench_id,
                   est_jaccard
            FROM est
            WHERE (id_a < 1099511627776) <> (id_b < 1099511627776)
        """,
        "stratified_sample": """
            WITH d AS (
              SELECT cast(doc_id AS bigint) AS doc_id, source,
                     CASE source WHEN 'src1' THEN 'c000'
                                 WHEN 'src2' THEN '8000'
                                 WHEN 'src3' THEN '4000'
                                 ELSE '2000' END AS cutoff,
                     CASE source WHEN 'src1' THEN 0.75
                                 WHEN 'src2' THEN 0.5
                                 WHEN 'src3' THEN 0.25
                                 ELSE 0.125 END AS r
              FROM documents
            )
            SELECT doc_id, source, cast(r AS double) AS sample_rate
            FROM d
            WHERE substr(md5(cast(doc_id AS varchar)), 1, 4) < cutoff
        """,
        "stream_route": """
            SELECT 'errors' AS lane, count(*) AS n,
                   cast(sum(event_id) AS bigint) AS id_sum
            FROM events WHERE event_type = 'error'
            UNION ALL
            SELECT 'big', count(*), cast(sum(event_id) AS bigint)
            FROM events WHERE value >= 150.0
            UNION ALL
            SELECT 'rest', count(*), cast(sum(event_id) AS bigint)
            FROM events WHERE event_type <> 'error' AND value < 150.0
        """,
        "token_stats": f"""
            WITH words AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
              FROM documents
            ), toks AS (
              SELECT doc_id,
                     [ (length(w)*31 + ascii(substr(w,1,1))*7
                        + ascii(substr(w,-1,1))) % 32768 for w in ws ] AS t
              FROM words
            )
            SELECT doc_id,
                   cast(len(t) AS int) AS n_tok,
                   cast(len(list_distinct(t)) AS int) AS n_unique,
                   round(len(list_distinct(t)) / greatest(len(t), 1), 6)
                       AS unique_ratio,
                   cast(list_max(t) AS int) AS max_token,
                   cast(list_min(t) AS int) AS min_token
            FROM toks
        """,
        "vocab_topk": f"""
            WITH words AS (
              SELECT list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
              FROM documents
            ), occ AS (
              SELECT unnest([ (length(w)*31 + ascii(substr(w,1,1))*7
                               + ascii(substr(w,-1,1))) % 32768 for w in ws ])
                     AS token
              FROM words
            )
            SELECT cast(token AS int) AS token, count(*) AS freq
            FROM occ GROUP BY token
            ORDER BY freq DESC, token ASC LIMIT 50
        """,
        "oov_rate": f"""
            WITH words AS (
              SELECT source,
                     list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
              FROM documents
            ), toks AS (
              SELECT source,
                     [ (length(w)*31 + ascii(substr(w,1,1))*7
                        + ascii(substr(w,-1,1))) % 32768 for w in ws ] AS t
              FROM words
            ), per AS (
              SELECT source,
                     len(list_filter(t, x -> x < 0 OR x >= 1000)) AS o,
                     len(t) AS n
              FROM toks
            )
            SELECT source, cast(sum(o) AS BIGINT) AS n_oov, cast(sum(n) AS BIGINT) AS n_tok,
                   round(sum(o) / greatest(sum(n), 1), 6) AS oov_rate
            FROM per GROUP BY source
        """,
        "pack_sequences": f"""
            WITH seqs AS (
                SELECT cast(doc_id % 4 AS bigint) AS stream,
                       cast(doc_id AS bigint) AS doc_id,
                       cast(len(string_split({_NORM}, ' ')) AS int) AS n_tok
                FROM documents
            ), sharded AS (
                SELECT stream,
                       cast(floor(doc_id / 4) % 3 AS bigint) AS shard,
                       doc_id, n_tok
                FROM seqs
            ), cum AS (
                SELECT stream, shard, doc_id, n_tok,
                       cast(coalesce(sum(n_tok) OVER (
                           PARTITION BY stream, shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS bigint) AS cumb
                FROM sharded
            )
            SELECT stream, shard, doc_id, n_tok,
                   cast(floor(cumb / 256) AS bigint) AS bin,
                   cast(cumb % 256 AS bigint) AS offset
            FROM cum
        """,
        "chunk_tokens": f"""
            WITH words AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
              FROM documents
            ), toks AS (
              SELECT doc_id % 4 AS stream,
                     cast(floor(doc_id / 4) % 3 AS bigint) AS shard,
                     doc_id,
                     [ (length(w)*31 + ascii(substr(w,1,1))*7
                        + ascii(substr(w,-1,1))) % 32768 for w in ws ] AS t
              FROM words
            ), cum AS (
              SELECT stream, shard, doc_id, t,
                     cast(len(t) AS bigint) AS n,
                     cast(coalesce(sum(len(t)) OVER (
                         PARTITION BY stream, shard ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS bigint) AS cumb
              FROM toks
              WHERE len(t) > 0
            ), pieces AS (
              SELECT stream, shard, blk AS block,
                     greatest(cumb - blk*64, 0) AS pos,
                     t[(greatest(blk*64 - cumb, 0) + 1)
                       : least((blk+1)*64 - cumb, n)] AS piece
              FROM (
                SELECT *, unnest(generate_series(cumb // 64,
                                                 (cumb + n - 1) // 64)) AS blk
                FROM cum
              )
            ), blocks AS (
              SELECT stream, shard, block,
                     flatten(list(piece ORDER BY pos)) AS tok
              FROM pieces
              GROUP BY stream, shard, block
            )
            SELECT cast(stream AS bigint) AS stream,
                   shard,
                   cast(block AS bigint) AS block,
                   array_to_string(tok, ' ') AS tokens_str,
                   cast(len(tok) AS int) AS n_tok
            FROM blocks
            WHERE len(tok) = 64
        """,
        "lang_id_ngram": _LANG_ID_ORACLE,
        "bpe_encode": _bpe_oracle(),
        "tf_idf": f"""
            WITH words AS (
              SELECT doc_id, word, cast(count(*) AS bigint) AS tf FROM (
                SELECT cast(doc_id AS bigint) AS doc_id,
                       unnest(list_filter(string_split({_NORM}, ' '),
                                          w -> w <> '')) AS word
                FROM documents
              ) GROUP BY doc_id, word
            ),
            docfreq AS (SELECT word, cast(count(*) AS bigint) AS df
                        FROM words GROUP BY word),
            nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM words),
            scored AS (
              SELECT doc_id, w.word,
                     round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
              FROM words w JOIN docfreq USING (word) CROSS JOIN nd
            )
            SELECT doc_id, "rank", word, tfidf FROM (
              SELECT doc_id, word, tfidf,
                     cast(row_number() OVER (
                         PARTITION BY doc_id
                         ORDER BY tfidf DESC, word ASC) AS int) AS "rank"
              FROM scored
            ) WHERE "rank" <= 5
        """,
        "bpe_train": _bpe_train_oracle(),
        "pq_ann": _PQ_ANN_ORACLE,
        "bigram_logprob": f"""
            WITH words AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
              FROM documents
            ), toks AS (
              SELECT doc_id,
                     [ (length(w)*31 + ascii(substr(w,1,1))*7
                        + ascii(substr(w,-1,1))) % 4096 for w in ws ] AS t
              FROM words
            ), pairs AS (
              SELECT doc_id,
                     [ cast(p[1] AS bigint) * 4096 + cast(p[2] AS bigint)
                       for p in list_zip(t, t[2:], true) ] AS ps
              FROM toks
            ), big AS (
              SELECT bigram, count(*) AS big_freq
              FROM (SELECT unnest(ps) AS bigram FROM pairs)
              GROUP BY bigram
            ), uni AS (
              SELECT token, count(*) AS uni_freq
              FROM (SELECT unnest(t) AS token FROM toks)
              GROUP BY token
            ), occ AS (
              SELECT doc_id, unnest(ps) AS bigram FROM pairs
            ), scored AS (
              SELECT o.doc_id,
                     -ln((coalesce(b.big_freq, 0) + 0.5)
                         / (coalesce(u.uni_freq, 0) + 0.5 * 4096)) AS nlp
              FROM occ o
              LEFT JOIN big b USING (bigram)
              LEFT JOIN uni u ON u.token = o.bigram // 4096
            )
            SELECT doc_id,
                   cast(count(*) AS bigint) AS n_bigrams,
                   round(avg(nlp), 6) AS mean_neg_logprob
            FROM scored GROUP BY doc_id
        """,
        "quality_classifier": f"""
            WITH base AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
              FROM documents
            ), feat AS (
              SELECT doc_id, len(ws) >= 30 AS label,
                     [ (length(w)*31 + ascii(substr(w,1,1))*7
                        + ascii(substr(w,-1,1))) % 4096 for w in ws ]
                     || [ ((length(p[1]) + 1 + length(p[2]))*31
                           + ascii(substr(p[1],1,1))*7
                           + ascii(substr(p[2],-1,1))) % 4096
                          for p in list_zip(ws, ws[2:], true) ] AS fs
              FROM base
            ), occ AS (
              SELECT doc_id, label, unnest(fs) AS feature FROM feat
            ), perfeat AS (
              SELECT feature,
                     sum(CASE WHEN label THEN 1 ELSE 0 END) AS c_pos,
                     sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS c_neg
              FROM occ GROUP BY feature
            ), totals AS (
              SELECT sum(CASE WHEN label THEN len(fs) ELSE 0 END) AS t_pos,
                     sum(CASE WHEN NOT label THEN len(fs) ELSE 0 END) AS t_neg,
                     sum(CASE WHEN label THEN 1 ELSE 0 END) AS d_pos,
                     sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS d_neg
              FROM feat
            ), weights AS (
              SELECT feature,
                     round(ln((c_pos + 1.0) / (t_pos + 4096.0))
                           - ln((c_neg + 1.0) / (t_neg + 4096.0)), 12) AS weight
              FROM perfeat CROSS JOIN totals
              UNION ALL
              SELECT -1 AS feature,
                     round(ln((d_pos + 1.0) / (d_neg + 1.0)), 12) AS weight
              FROM totals
            ), socc AS (
              -- scoring appends the reserved bias feature to every doc
              SELECT doc_id, unnest(fs || [-1]) AS feature FROM feat
            ), scored AS (
              SELECT o.doc_id, count(*) - 1 AS n_feat,
                     sum(coalesce(w.weight, 0.0)) AS acc
              FROM socc o LEFT JOIN weights w USING (feature)
              GROUP BY o.doc_id
            )
            SELECT doc_id,
                   cast(n_feat AS bigint) AS n_feat,
                   round(acc, 6) AS logit,
                   round(1.0 / (1.0 + exp(-acc)), 6) AS score
            FROM scored
        """,
        "ec2_metadata": """
            SELECT event_id,
                   'i-0123456789abcdef0' AS instance_id,
                   'us-east-1' AS region,
                   'us-east-1a' AS availability_zone,
                   'm5.2xlarge' AS instance_type
            FROM events
        """,
        "dup_clusters": f"""
            WITH RECURSIVE sh AS ({_SHINGLES}),
            sig AS (
              SELECT id, seed,
                     min(CAST(('0x' || substr(md5(cast(seed AS varchar) || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
              FROM sh, range(0, 8) s(seed) GROUP BY id, seed
            ),
            banded AS (
              SELECT id, cast(floor(seed / 2) AS int) AS band,
                     md5(string_agg(CAST(minhash AS varchar), '|' ORDER BY minhash)) AS band_hash
              FROM sig GROUP BY id, band
            ),
            pairs AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
            ),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            reach AS (
              SELECT src AS id, src AS label FROM edges
              UNION
              SELECT e.dst AS id, r.label
              FROM edges e JOIN reach r ON e.src = r.id
            )
            SELECT id, min(label) AS cluster FROM reach GROUP BY id
        """,
        "simhash": f"""
            WITH words AS (
              SELECT cast(doc_id AS bigint) AS id,
                     unnest(string_split({_NORM}, ' ')) AS w
              FROM documents
            ),
            bits AS (
              SELECT id, j,
                     cast(floor((strpos('0123456789abcdef',
                                        substr(md5(w), cast(floor(j/4) AS int) + 1, 1)) - 1)
                                / pow(2, 3 - (j % 4))) AS bigint) % 2 AS bit
              FROM words, range(0, 16) t(j)
            ),
            maj AS (
              SELECT id, j, CASE WHEN sum(2*bit - 1) >= 0 THEN 1 ELSE 0 END AS mbit
              FROM bits GROUP BY id, j
            )
            SELECT id, cast(sum(mbit * cast(pow(2, j) AS bigint)) AS bigint) AS simhash
            FROM maj GROUP BY id
        """,
        "embed_topk": """
            WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT cast(0 AS bigint) AS query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(cast(e.embedding AS double[]),
                                                  cast(q.embedding AS double[])), 4) AS cos
              FROM embeddings e, q WHERE e.vec_id <> 0
            )
            SELECT query_id, neighbor_id, cos FROM scored
            ORDER BY cos DESC, neighbor_id LIMIT 5
        """,
        "embed_lsh_buckets": """
            SELECT concat(
                     cast(cast(embedding[1] > 0 AS int) AS varchar),
                     cast(cast(embedding[2] > 0 AS int) AS varchar),
                     cast(cast(embedding[3] > 0 AS int) AS varchar),
                     cast(cast(embedding[4] > 0 AS int) AS varchar),
                     cast(cast(embedding[5] > 0 AS int) AS varchar),
                     cast(cast(embedding[6] > 0 AS int) AS varchar),
                     cast(cast(embedding[7] > 0 AS int) AS varchar),
                     cast(cast(embedding[8] > 0 AS int) AS varchar)
                   ) AS bucket, count(*) AS n
            FROM embeddings GROUP BY 1
        """,
        "field_filter": """
            SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
        """,
        "explode_1n": """
            SELECT event_id, event_id AS rec_id, event_type AS body FROM events
            UNION ALL
            SELECT event_id, event_id + 10000000 AS rec_id,
                   event_type || '-tail' AS body
            FROM events
        """,
        "salted_agg": """
            SELECT event_type, count(*) AS cnt,
                   cast(sum(cast(value AS decimal(18,2))) AS double) AS sum_value
            FROM events GROUP BY event_type
        """,
        "parse_url": """
            SELECT event_id,
                   'https' AS scheme,
                   printf('host%d.example.com', user_id % 10) AS host,
                   printf('/api/%s/%d', event_type, event_id) AS path,
                   printf('page=%d', event_id % 7) AS query
            FROM events
        """,
        "parse_duration": """
            SELECT event_id,
                   round(cast(trunc(value * 10) AS bigint) * 0.001, 6) AS dur_s
            FROM events
        """,
        "syslog": """
            WITH lv AS (
              SELECT event_id,
                     ['emerg','alert','crit','err','warning','notice','info','debug']
                       [cast(event_id % 8 AS int) + 1] AS level
              FROM events
            )
            SELECT event_id, level,
                   CASE level WHEN 'emerg' THEN 0 WHEN 'alert' THEN 1 WHEN 'crit' THEN 2
                        WHEN 'err' THEN 3 WHEN 'warning' THEN 4 WHEN 'notice' THEN 5
                        WHEN 'info' THEN 6 WHEN 'debug' THEN 7 END AS severity,
                   level AS roundtrip
            FROM lv
        """,
        "encode_logfmt": """
            SELECT event_id,
                   printf('etype=%s msg="user %d"', event_type, user_id) AS line
            FROM events
        """,
        "metric_to_log": """
            SELECT 'events_total' AS name, 'incremental' AS kind,
                   'counter' AS metric_type, count(*) AS cnt,
                   printf('{"type":"%s"}', event_type) AS tags_json
            FROM events GROUP BY event_type
        """,
        "embed_lsh_topk": """
            WITH b AS (
              SELECT vec_id, embedding,
                     concat(
                       cast(cast(embedding[1] > 0 AS int) AS varchar),
                       cast(cast(embedding[2] > 0 AS int) AS varchar),
                       cast(cast(embedding[3] > 0 AS int) AS varchar),
                       cast(cast(embedding[4] > 0 AS int) AS varchar),
                       cast(cast(embedding[5] > 0 AS int) AS varchar),
                       cast(cast(embedding[6] > 0 AS int) AS varchar),
                       cast(cast(embedding[7] > 0 AS int) AS varchar),
                       cast(cast(embedding[8] > 0 AS int) AS varchar)) AS bucket
              FROM embeddings
            ), q AS (SELECT * FROM b WHERE vec_id = 0),
            scored AS (
              SELECT cast(0 AS bigint) AS query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(cast(e.embedding AS double[]),
                                                  cast(q.embedding AS double[])), 4) AS cos
              FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
            )
            SELECT query_id, neighbor_id, cos FROM scored
            ORDER BY cos DESC, neighbor_id LIMIT 5
        """,
        "ansi_stripper": """
            SELECT event_id, event_type || ' done' AS clean FROM events
        """,
        "stream_aggregate": """
            SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS cnt
            FROM events GROUP BY 1, 2
        """,
        "embed_near_dups": """
            WITH b AS (
              SELECT vec_id AS id, cast(embedding AS double[]) AS vec,
                     concat(
                       cast(cast(embedding[1] > 0 AS int) AS varchar),
                       cast(cast(embedding[2] > 0 AS int) AS varchar),
                       cast(cast(embedding[3] > 0 AS int) AS varchar),
                       cast(cast(embedding[4] > 0 AS int) AS varchar),
                       cast(cast(embedding[5] > 0 AS int) AS varchar),
                       cast(cast(embedding[6] > 0 AS int) AS varchar),
                       cast(cast(embedding[7] > 0 AS int) AS varchar),
                       cast(cast(embedding[8] > 0 AS int) AS varchar)) AS bucket
              FROM embeddings
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   round(list_cosine_similarity(a.vec, b.vec), 4) AS cos
            FROM b a JOIN b b ON a.bucket = b.bucket AND a.id < b.id
            WHERE round(list_cosine_similarity(a.vec, b.vec), 4) >= 0.2
        """,
        "reduce_expire_gap": """
            WITH s AS (
              SELECT user_id, event_id AS ord, event_type,
                     CASE WHEN lag(event_id) OVER w IS NULL
                               OR event_id - lag(event_id) OVER w > 500
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
            ), g AS (
              SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ord
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
              FROM s
            )
            SELECT user_id, min(ord) AS session_start,
                   string_agg(event_type, ' ' ORDER BY ord) AS etypes
            FROM g GROUP BY user_id, sess
        """,
        "merge_partial": """
            WITH marked AS (
              SELECT user_id, event_id AS ord, event_type,
                     CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS np
              FROM events
            ), grouped AS (
              SELECT *, sum(np) OVER (PARTITION BY user_id ORDER BY ord
                                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS grp
              FROM marked
            )
            SELECT user_id, max(ord) AS closed_at,
                   string_agg(event_type, ' ' ORDER BY ord) AS merged
            FROM grouped WHERE grp > 0
            GROUP BY user_id, grp
        """,
        "ivf_topk": _ivf_oracle_sql(),
        "vrl_parse_csv": """
            SELECT event_id, event_type AS f1,
                   cast(event_id AS varchar) AS f2,
                   event_type || ', Inc.' AS f3
            FROM events
        """,
        "vrl_percent": """
            SELECT event_id,
                   event_type || '%20x%20y' AS enc,
                   event_type || ' x y' AS dec
            FROM events
        """,
        "vrl_match_any": """
            SELECT cast(doc_id AS bigint) AS doc_id,
                   (regexp_matches(text, 'data') OR regexp_matches(text, 'the ')) AS hit
            FROM documents
        """,
        "parse_aws_alb_log": """
            SELECT event_id,
                   'http' AS rtype_out,
                   printf('app/lb/%d', event_id) AS elb,
                   printf('192.168.131.%d:2817', event_id % 250) AS client_host,
                   CAST(NULL AS VARCHAR) AS target_host,
                   0.0 AS request_processing_time,
                   0.001 AS target_processing_time,
                   cast(200 + (event_id % 3) * 100 AS varchar) AS elb_status_code,
                   cast(trunc(value * 100) AS bigint) AS received_bytes,
                   'GET' AS request_method,
                   printf('http://example.com/%s', event_type) AS request_url,
                   printf('agent/%d', user_id) AS user_agent,
                   printf('Root=1-%d', event_id) AS trace_id,
                   'forward' AS actions_executed,
                   CAST(NULL AS VARCHAR) AS error_reason
            FROM events
        """,
        "parse_aws_vpc_flow_log": """
            SELECT event_id,
                   cast(2 AS bigint) AS version,
                   cast(user_id AS bigint) AS account_id,
                   printf('eni-%d', event_id) AS interface_id,
                   printf('10.0.0.%d', event_id % 250) AS srcaddr,
                   CAST(NULL AS VARCHAR) AS dstaddr,
                   cast(1000 + event_id % 64000 AS bigint) AS srcport,
                   NULL AS dstport,
                   cast(6 AS bigint) AS protocol,
                   cast(trunc(value * 10) AS bigint) AS packets,
                   NULL AS bytes,
                   cast(event_id + 1431280000 AS bigint) AS start,
                   cast(event_id + 1431280060 AS bigint) AS "end",
                   'ACCEPT' AS action,
                   'OK' AS log_status
            FROM events
        """,
        "regex_multi": """
            SELECT event_id,
                   cast(event_id AS bigint) AS code,
                   CASE WHEN event_id % 2 = 0 THEN 'failure' END AS detail,
                   CASE WHEN event_id % 2 = 1 THEN 'GET' END AS word
            FROM events
        """,
        "minhash_estimate": f"""
            WITH sh AS ({_SHINGLES}),
            sig AS (
              SELECT id, seed,
                     min(CAST(('0x' || substr(md5(cast(seed AS varchar) || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
              FROM sh, range(0, 8) s(seed) GROUP BY id, seed
            ),
            banded AS (
              SELECT id, cast(floor(seed / 2) AS int) AS band,
                     md5(string_agg(CAST(minhash AS varchar), '|' ORDER BY minhash)) AS band_hash
              FROM sig GROUP BY id, band
            ),
            cands AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
            )
            SELECT c.id_a, c.id_b,
                   round(avg(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END), 6)
                     AS est_jaccard
            FROM cands c
            JOIN sig sa ON sa.id = c.id_a
            JOIN sig sb ON sb.id = c.id_b AND sb.seed = sa.seed
            GROUP BY c.id_a, c.id_b
            HAVING round(avg(CASE WHEN sa.minhash = sb.minhash THEN 1.0 ELSE 0.0 END), 6) >= 0.25
        """,
        "winnow_fingerprints": f"""
            WITH grams AS (
              SELECT id, i AS pos,
                     substring(md5(array_to_string(words[i:i+4], ' ')), 1, 16) AS h
              FROM (
                SELECT doc_id AS id, words,
                       unnest(generate_series(1, greatest(len(words)-4, 0))) AS i
                FROM (SELECT cast(doc_id AS bigint) AS doc_id,
                             string_split({_NORM}, ' ') AS words
                      FROM documents)
              )
            )
            SELECT DISTINCT id,
                   min(h) OVER (PARTITION BY id ORDER BY pos
                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fingerprint
            FROM grams
        """,
        "repetition_signals": f"""
            WITH base AS (
              SELECT cast(doc_id AS bigint) AS doc_id, text,
                     string_split({_NORM}, ' ') AS w,
                     string_split(text, chr(10)) AS lines
              FROM documents
            ), grams AS (
              SELECT doc_id,
                     [array_to_string(w[j:j+1], ' ')
                      for j in range(1, greatest(len(w)-1, 0)+1)] AS g2,
                     [array_to_string(w[j:j+2], ' ')
                      for j in range(1, greatest(len(w)-2, 0)+1)] AS g3
              FROM base
            )
            SELECT b.doc_id,
                   cast(len(w) AS int) AS n_words,
                   round(length(array_to_string(w, '')) / greatest(len(w), 1), 6)
                       AS mean_word_len,
                   round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                         / greatest(len(w), 1), 6) AS symbol_word_ratio,
                   round(len(list_filter(lines,
                         l -> regexp_matches(trim(l), '^[-*•]')))
                         / greatest(len(lines), 1), 6) AS bullet_ratio,
                   round(len(list_filter(lines,
                         l -> ends_with(rtrim(l), '...')))
                         / greatest(len(lines), 1), 6) AS ellipsis_ratio,
                   CASE WHEN len(g2) > 0
                        THEN round((len(g2) - len(list_distinct(g2)))
                                   / len(g2), 6)
                        ELSE 0.0 END AS dup_2gram_frac,
                   CASE WHEN len(g3) > 0
                        THEN round((len(g3) - len(list_distinct(g3)))
                                   / len(g3), 6)
                        ELSE 0.0 END AS dup_3gram_frac
            FROM base b JOIN grams USING (doc_id)
        """,
        "resumable_run": """
            SELECT event_type, count(*) AS cnt, true AS resume_contract
            FROM events WHERE value >= 50.0 GROUP BY event_type
        """,
        "simhash_near_dups": f"""
            -- 64-bit simhash as four 16-bit limbs (limb k = md5 hex
            -- digits 4k+1..4k+4); oracle = literal all-pairs Hamming
            -- filter, equal to the banded join by pigeonhole (<=3
            -- differing bits leave >=1 of 4 limbs intact)
            WITH words AS (
              SELECT cast(doc_id AS bigint) AS id,
                     unnest(string_split({_NORM}, ' ')) AS w
              FROM documents
            ),
            bits AS (
              SELECT id, k, j,
                     cast(floor((strpos('0123456789abcdef',
                                        substr(md5(w), 4*k + cast(floor(j/4) AS int) + 1, 1)) - 1)
                                / pow(2, 3 - (j % 4))) AS bigint) % 2 AS bit
              FROM words, range(0, 4) tk(k), range(0, 16) tj(j)
            ),
            maj AS (
              SELECT id, k, j, CASE WHEN sum(2*bit - 1) >= 0 THEN 1 ELSE 0 END AS mbit
              FROM bits GROUP BY id, k, j
            ),
            s AS (
              SELECT id,
                     cast(sum(CASE WHEN k = 0 THEN mbit * cast(pow(2, j) AS bigint) ELSE 0 END) AS bigint) AS s0,
                     cast(sum(CASE WHEN k = 1 THEN mbit * cast(pow(2, j) AS bigint) ELSE 0 END) AS bigint) AS s1,
                     cast(sum(CASE WHEN k = 2 THEN mbit * cast(pow(2, j) AS bigint) ELSE 0 END) AS bigint) AS s2,
                     cast(sum(CASE WHEN k = 3 THEN mbit * cast(pow(2, j) AS bigint) ELSE 0 END) AS bigint) AS s3
              FROM maj GROUP BY id
            )
            SELECT a.id AS id_a, b.id AS id_b,
                   cast(bit_count(xor(a.s0, b.s0)) + bit_count(xor(a.s1, b.s1))
                      + bit_count(xor(a.s2, b.s2)) + bit_count(xor(a.s3, b.s3)) AS int) AS hamming
            FROM s a JOIN s b ON a.id < b.id
            WHERE bit_count(xor(a.s0, b.s0)) + bit_count(xor(a.s1, b.s1))
                + bit_count(xor(a.s2, b.s2)) + bit_count(xor(a.s3, b.s3)) <= 3
        """,
        "unigram_logprob": f"""
            WITH words AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
              FROM documents
            ), toks AS (
              SELECT doc_id,
                     [ (length(w)*31 + ascii(substr(w,1,1))*7
                        + ascii(substr(w,-1,1))) % 32768 for w in ws ] AS t
              FROM words
              WHERE len(ws) > 0
            ), occ AS (
              SELECT doc_id, unnest(t) AS token FROM toks
            ), freqs AS (
              SELECT token, count(*) AS freq FROM occ GROUP BY token
            ), scal AS (
              SELECT sum(freq) AS total, count(*) AS vocab FROM freqs
            )
            SELECT o.doc_id, count(*) AS n_tok,
                   round(avg(-ln((f.freq + 0.5)
                                 / (s.total + 0.5 * s.vocab))), 6)
                       AS mean_neg_logprob
            FROM occ o JOIN freqs f USING (token), scal s
            GROUP BY o.doc_id
        """,
        "curation_pipeline": f"""
            WITH words AS (
              SELECT cast(doc_id AS bigint) AS doc_id, text, source, n_chars,
                     string_split({_NORM}, ' ') AS w
              FROM documents
            ), sig AS (
              SELECT doc_id, text, source, n_chars,
                     len(w) AS n_words,
                     CASE WHEN greatest(len(w)-2, 0) > 0 THEN
                       round((greatest(len(w)-2, 0)
                        - len(list_distinct([array_to_string(w[j:j+2], ' ')
                            for j in range(1, greatest(len(w)-2, 0)+1)])))
                       / greatest(len(w)-2, 0), 6)
                     ELSE 0.0 END AS dup3
              FROM words
            ), quality AS (
              SELECT * FROM sig WHERE n_words >= 5 AND dup3 < 0.5
            ), keepers AS (
              SELECT min(doc_id) AS doc_id
              FROM quality
              GROUP BY md5({_NORM})
            ), survivors AS (
              SELECT q.* FROM quality q JOIN keepers k USING (doc_id)
            ), sampled AS (
              SELECT * FROM survivors
              WHERE CASE source
                      WHEN 'src1' THEN substr(md5(cast(doc_id AS varchar)), 1, 4) < 'c000'
                      WHEN 'src2' THEN substr(md5(cast(doc_id AS varchar)), 1, 4) < '8000'
                      ELSE true END
            ),
            -- model-based quality stage: NB classifier trained on the
            -- FULL corpus (same fragment as the quality_classifier
            -- oracle), scoring only the sampled survivors
            cbase AS (
              SELECT cast(doc_id AS bigint) AS doc_id,
                     list_filter(string_split({_NORM}, ' '), w -> w <> '') AS ws
              FROM documents
            ), cfeat AS (
              SELECT doc_id, len(ws) >= 30 AS label,
                     [ (length(w)*31 + ascii(substr(w,1,1))*7
                        + ascii(substr(w,-1,1))) % 4096 for w in ws ]
                     || [ ((length(p[1]) + 1 + length(p[2]))*31
                           + ascii(substr(p[1],1,1))*7
                           + ascii(substr(p[2],-1,1))) % 4096
                          for p in list_zip(ws, ws[2:], true) ] AS fs
              FROM cbase
            ), cocc AS (
              SELECT doc_id, label, unnest(fs) AS feature FROM cfeat
            ), cperfeat AS (
              SELECT feature,
                     sum(CASE WHEN label THEN 1 ELSE 0 END) AS c_pos,
                     sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS c_neg
              FROM cocc GROUP BY feature
            ), ctotals AS (
              SELECT sum(CASE WHEN label THEN len(fs) ELSE 0 END) AS t_pos,
                     sum(CASE WHEN NOT label THEN len(fs) ELSE 0 END) AS t_neg,
                     sum(CASE WHEN label THEN 1 ELSE 0 END) AS d_pos,
                     sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS d_neg
              FROM cfeat
            ), cweights AS (
              SELECT feature,
                     round(ln((c_pos + 1.0) / (t_pos + 4096.0))
                           - ln((c_neg + 1.0) / (t_neg + 4096.0)), 12) AS weight
              FROM cperfeat CROSS JOIN ctotals
              UNION ALL
              SELECT -1 AS feature,
                     round(ln((d_pos + 1.0) / (d_neg + 1.0)), 12) AS weight
              FROM ctotals
            ), socc AS (
              SELECT s.doc_id, s.source, s.n_chars,
                     unnest(f.fs || [-1]) AS feature
              FROM sampled s JOIN cfeat f USING (doc_id)
            ), cscored AS (
              SELECT o.doc_id, any_value(o.source) AS source,
                     any_value(o.n_chars) AS n_chars,
                     round(1.0 / (1.0 + exp(-sum(coalesce(w.weight, 0.0)))), 6)
                         AS score
              FROM socc o LEFT JOIN cweights w USING (feature)
              GROUP BY o.doc_id
            )
            SELECT source, count(*) AS n_docs,
                   cast(sum(n_chars) AS bigint) AS chars,
                   round(avg(score), 6) AS avg_quality,
                   cast(sum(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END)
                        AS bigint) AS n_good
            FROM cscored GROUP BY source
        """,
        "dedup_resolution": f"""
            WITH RECURSIVE sh AS ({_SHINGLES}),
            sig AS (
              SELECT id, seed,
                     min(CAST(('0x' || substr(md5(cast(seed AS varchar) || ':' || shingle), 1, 15)) AS BIGINT)) AS minhash
              FROM sh, range(0, 8) s(seed) GROUP BY id, seed
            ),
            banded AS (
              SELECT id, cast(floor(seed / 2) AS int) AS band,
                     md5(string_agg(CAST(minhash AS varchar), '|' ORDER BY minhash)) AS band_hash
              FROM sig GROUP BY id, band
            ),
            pairs AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
            ),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            reach AS (
              SELECT src AS id, src AS label FROM edges
              UNION
              SELECT e.dst AS id, r.label
              FROM edges e JOIN reach r ON e.src = r.id
            ),
            clusters AS (
              SELECT id, min(label) AS cluster FROM reach GROUP BY id
            )
            SELECT c.id, c.cluster,
                   (row_number() OVER (PARTITION BY c.cluster
                                       ORDER BY d.n_chars DESC, c.id ASC) = 1)
                       AS keep
            FROM clusters c
            JOIN documents d ON c.id = cast(d.doc_id AS bigint)
        """,
        "session_windows": """
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), g AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            )
            SELECT min(ts) AS session_start,
                   max(ts) + INTERVAL 1 HOUR AS session_end,
                   cast(user_id AS bigint) AS user_id,
                   count(*) AS n,
                   cast(sum(cast(value AS decimal(38,6))) AS double) AS sum_value
            FROM g GROUP BY user_id, sid
        """,
        "rollup_tiers": """
            WITH base AS (
              SELECT event_type, value,
                     cast(to_timestamp(cast(floor(epoch(ts)/300) AS bigint)*300)
                          AS timestamp) AS w5,
                     cast(to_timestamp(cast(floor(epoch(ts)/3600) AS bigint)*3600)
                          AS timestamp) AS w1h,
                     cast(to_timestamp(cast(floor(epoch(ts)/86400) AS bigint)*86400)
                          AS timestamp) AS w1d
              FROM events
            )
            SELECT CASE WHEN grouping(w5) = 0 THEN '5m'
                        WHEN grouping(w1h) = 0 THEN '1h'
                        ELSE '1d' END AS tier,
                   coalesce(w5, w1h, w1d) AS window_start, event_type,
                   count(value) AS n,
                   cast(sum(cast(value AS decimal(38,6))) AS double) AS sum_value,
                   min(value) AS min_value, max(value) AS max_value
            FROM base
            GROUP BY GROUPING SETS ((event_type, w5), (event_type, w1h),
                                    (event_type, w1d))
        """,
        "mix_rates": """
            WITH c AS (
              SELECT lang, cast(count(*) AS double) AS c
              FROM documents GROUP BY lang
            ), m AS (SELECT min(c) AS mc FROM c)
            SELECT lang, round(least(1.0, round(sqrt(mc / c), 9)), 6) AS rate
            FROM c, m
        """,
        "winnow_dup_pairs": f"""
            WITH grams AS (
              SELECT id, i AS pos,
                     substring(md5(array_to_string(words[i:i+4], ' ')), 1, 16) AS h
              FROM (
                SELECT doc_id AS id, words,
                       unnest(generate_series(1, greatest(len(words)-4, 0))) AS i
                FROM (SELECT cast(doc_id AS bigint) AS doc_id,
                             string_split({_NORM}, ' ') AS words
                      FROM documents)
              )
            ), fp AS (
              SELECT DISTINCT id,
                     min(h) OVER (PARTITION BY id ORDER BY pos
                                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                         AS fingerprint
              FROM grams
            ), rare AS (
              SELECT fingerprint FROM fp GROUP BY fingerprint
              HAVING count(*) <= 50
            ), pruned AS (
              SELECT fp.id, fp.fingerprint FROM fp JOIN rare USING (fingerprint)
            )
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
            FROM pruned a JOIN pruned b
              ON a.fingerprint = b.fingerprint AND a.id < b.id
            GROUP BY a.id, b.id HAVING count(*) >= 2
        """,
        "syslog5424": """
            SELECT event_id,
                   cast(8 + event_id % 184 AS bigint) AS priority,
                   cast(floor((8 + event_id % 184) / 8) AS int) AS facility,
                   cast((8 + event_id % 184) % 8 AS int) AS severity,
                   printf('host-%d', user_id % 50) AS hostname,
                   printf('app%d', event_id % 7) AS appname,
                   cast(event_id AS bigint) AS procid,
                   printf('MSG%d', event_id) AS msgid,
                   printf('etype=%s uid=%d', event_type, user_id) AS sdkv,
                   printf('event %d happened', event_id) AS message_text
            FROM events
        """,
        "distribution": """
            WITH s AS (
                SELECT event_type, value AS v,
                       cast(1 + event_id % 3 AS bigint) AS r
                FROM events WHERE value IS NOT NULL
            ), perval AS (
                SELECT event_type, v, sum(r) AS w
                FROM s WHERE r > 0 GROUP BY event_type, v
            ), cum AS (
                SELECT event_type, v, w,
                       sum(w) OVER (PARTITION BY event_type ORDER BY v) AS c,
                       sum(w) OVER (PARTITION BY event_type) AS n
                FROM perval
            ), stat AS (
                SELECT event_type,
                       min(v) AS min, max(v) AS max,
                       min(CASE WHEN c >= greatest(round(0.5*n), 1) THEN v END) AS median,
                       min(CASE WHEN c >= greatest(round(0.95*n), 1) THEN v END) AS q95,
                       cast(max(n) AS bigint) AS count
                FROM cum GROUP BY event_type
            ), sums AS (
                SELECT event_type,
                       cast(sum(cast(v*r AS decimal(38,6))) AS double) AS sum
                FROM s GROUP BY event_type
            )
            SELECT stat.*, sums.sum FROM stat JOIN sums USING (event_type)
        """,
        "summary_quantiles": """
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS q5,
                   round(quantile_cont(value, 0.9), 6) AS q9,
                   cast(count(value) AS bigint) AS count,
                   cast(sum(cast(value AS decimal(38,6))) AS double) AS sum
            FROM events GROUP BY event_type
        """,
        "tags_shaping": """
            SELECT 'events_total' AS name,
                   printf('env=prod etype=%s', event_type) AS tagkv,
                   cast(count(*) AS bigint) AS cnt
            FROM events GROUP BY event_type
        """,
        "vrl_ruby_hash_ip": """
            SELECT event_id,
                   event_type AS etype,
                   cast(event_id AS varchar) AS n,
                   printf('id=%d lvl=%s', event_id, event_type) AS kv,
                   printf('::ffff:10.%d.%d.%d', event_id % 250, user_id % 250,
                          (event_id * 7) % 250) AS v6,
                   printf('10.%d.%d.%d', event_id % 250, user_id % 250,
                          (event_id * 7) % 250) AS v4_back
            FROM events
        """,
        "multimodal_features": _multimodal_oracle_sql(),
        "text_stats": f"""
            WITH norm AS (
              SELECT cast(doc_id AS bigint) AS doc_id, text, {_NORM} AS ntext
              FROM documents
            ), base AS (
              SELECT doc_id, text, ntext,
                     len(string_split(ntext, ' ')) AS n_words,
                     len(list_filter(string_split(ntext, ' '),
                         w -> w IN ('the','a','an','and','of','to','in','is','it','that'))) AS n_sw
              FROM norm
            )
            SELECT doc_id, n_words,
                   len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens,
                   round(n_sw / greatest(n_words, 1), 6) AS stopword_ratio,
                   CASE WHEN round(n_sw / greatest(n_words, 1), 6) >= 0.03
                        THEN 'en' ELSE 'unk' END AS lang_guess,
                   md5(ntext) AS fingerprint
            FROM base
        """,
    }
