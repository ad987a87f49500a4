"""Parser golden tests — mirror the reference unit tests:
regex_parser.rs:342-470, grok_parser.rs:192-230, json_parser.rs,
logfmt_parser.rs, tokenizer.rs, split.rs."""

from __future__ import annotations

import pytest

from vector_spark.operators import (
    grok_parser,
    json_parser,
    key_value_parser,
    logfmt_parser,
    regex_parser,
    split_fields,
    tokenizer,
)


def test_regex_parser_named_captures(spark):
    # regex_parser.rs:342-370 golden case
    df = spark.createDataFrame([("status=1234 time=5678",)], "message string")
    out = regex_parser(
        df,
        [r"status=(?P<status>\d+) time=(?P<time>\d+)"],
        types={"status": "int", "time": "int"},
    )
    row = out.first()
    assert row.status == 1234 and row.time == 5678
    assert "message" not in out.columns  # drop_field default


def test_regex_parser_first_match_and_drop_failed(spark):
    df = spark.createDataFrame(
        [("a=1",), ("b=2",), ("nope",)], "message string"
    )
    out = regex_parser(
        df,
        [r"a=(?P<val>\d+)", r"b=(?P<val>\d+)"],
        types={"val": "int"},
        drop_failed=True,
        drop_field=False,
    )
    rows = {r.message: r.val for r in out.collect()}
    assert rows == {"a=1": 1, "b=2": 2}


def test_regex_parser_unmatched_null(spark):
    df = spark.createDataFrame([("nope",)], "message string")
    out = regex_parser(df, [r"a=(?P<val>\d+)"], drop_field=False)
    assert out.first().val is None


def test_grok_apache_common_log(spark):
    # grok_parser.rs:192-230
    line = '109.184.11.34 - - [12/Dec/2015:18:32:56 +0100] "GET /administrator/ HTTP/1.1" 200 4263'
    df = spark.createDataFrame([(line,)], "message string")
    out = grok_parser(
        df,
        "%{HTTPD_COMMONLOG}",
        types={"response": "int", "bytes": "int"},
    )
    r = out.first()
    assert r.clientip == "109.184.11.34"
    assert r.ident is None or r.ident == "-" or r.ident == ""  # '-' captured raw
    assert r.verb == "GET"
    assert r.request == "/administrator/"
    assert r.httpversion == "1.1"
    assert r.response == 200
    assert r.bytes == 4263
    assert r.timestamp == "12/Dec/2015:18:32:56 +0100"


def test_json_parser_typed_merge(spark):
    df = spark.createDataFrame(
        [('{"greeting":"hello","name":"bob"}',), ("not json",)], "message string"
    )
    out = json_parser(df, schema="greeting string, name string")
    rows = out.collect()
    assert ("hello", "bob") in [(r.greeting, r.name) for r in rows]
    # invalid row kept with nulls (drop_invalid=False default)
    assert len(rows) == 2
    out2 = json_parser(df, schema="greeting string, name string", drop_invalid=True)
    assert out2.count() == 1


def test_json_parser_map_mode(spark):
    df = spark.createDataFrame([('{"a":"1","b":"x"}',)], "message string")
    out = json_parser(df)
    assert out.first().parsed == {"a": "1", "b": "x"}


def test_key_value_parser(spark):
    df = spark.createDataFrame([("status=1234 time=5678",)], "message string")
    out = key_value_parser(df, fields=["status", "time"], types={"status": "int"})
    r = out.first()
    assert r.status == 1234 and r.time == "5678"


def test_logfmt_quoted_values(spark):
    df = spark.createDataFrame(
        [('level=info msg="shutting down" id=42',)], "message string"
    )
    out = logfmt_parser(df, fields=["level", "msg", "id"], types={"id": "int"})
    r = out.first()
    assert r.level == "info" and r.msg == "shutting down" and r.id == 42


def test_tokenizer_quotes_brackets_null(spark):
    # tokenizer.rs / lib/shared/src/tokenize.rs:11
    df = spark.createDataFrame(
        [('1.2.3.4 - - [2015-01-01] "GET /"',)], "message string"
    )
    out = tokenizer(df, ["ip", "ident", "auth", "ts", "req"])
    r = out.first()
    assert r.ip == "1.2.3.4"
    assert r.ident is None and r.auth is None
    assert r.ts == "2015-01-01"
    assert r.req == "GET /"


def test_split_positional(spark):
    df = spark.createDataFrame([("a,b,12",)], "message string")
    out = split_fields(df, ["x", "y", "z"], separator=",", types={"z": "int"})
    r = out.first()
    assert (r.x, r.y, r.z) == ("a", "b", 12)


def test_split_whitespace_default(spark):
    df = spark.createDataFrame([("  a   b  ",)], "message string")
    out = split_fields(df, ["x", "y"])
    r = out.first()
    assert (r.x, r.y) == ("a", "b")


def test_grok_widened_vocabulary(spark):
    """Round-2 pattern additions: URI/MAC/IPV6/DATESTAMP/PATH resolve
    and extract."""
    from vector_spark.operators.grok import grok_parser

    df = spark.createDataFrame(
        [
            (
                "00:1a:2b:3c:4d:5e https://example.com:8080/a/b?x=1 "
                "/var/log/app.log 12/31/2020 23:59:59 com.example.Main",
            )
        ],
        "message string",
    )
    out = grok_parser(
        df,
        "%{MAC:mac} %{URI:uri} %{UNIXPATH:path} %{DATESTAMP:ts} %{JAVACLASS:cls}",
        drop_field=False,
    ).first()
    assert out.mac == "00:1a:2b:3c:4d:5e"
    assert out.uri == "https://example.com:8080/a/b?x=1"
    assert out.path == "/var/log/app.log"
    assert out.ts == "12/31/2020 23:59:59"
    assert out.cls == "com.example.Main"


def test_grok_round4_vocabulary(spark):
    """Round-4 families: SYSLOGLINE, SYSLOG5424LINE, HAPROXYHTTPBASE,
    CISCOTIMESTAMP, HTTPD_ERRORLOG, JAVASTACKTRACEPART all resolve and
    extract; every registry entry expands to a compilable regex."""
    import re as _re

    from vector_spark.operators.grok import (
        GROK_PATTERNS,
        grok_parser,
        grok_to_regex,
    )

    for name in GROK_PATTERNS:
        _re.compile(grok_to_regex("%{" + name + "}"))

    df = spark.createDataFrame(
        [("Oct 11 22:14:15 host123 sshd[345]: Failed password for root",)],
        "message string",
    )
    out = grok_parser(df, "%{SYSLOGLINE}", types={"pid": "int"}).first()
    assert (out.logsource, out.program, out.pid) == ("host123", "sshd", 345)
    assert out.message == "Failed password for root"

    df = spark.createDataFrame(
        [
            (
                '192.168.1.10:52341 [09/Feb/2024:10:00:01.123] ft_web '
                'bk_web/srv1 0/0/1/2/3 200 1024 - - ---- 10/10/5/5/0 0/0 '
                '"GET /index.html HTTP/1.1"',
            )
        ],
        "message string",
    )
    out = grok_parser(
        df, "%{HAPROXYHTTPBASE}", types={"http_status_code": "int"}
    ).first()
    assert out.client_ip == "192.168.1.10"
    assert (out.frontend_name, out.server_name) == ("ft_web", "srv1")
    assert (out.http_status_code, out.http_verb) == (200, "GET")

    df = spark.createDataFrame(
        [('<34>1 2024-02-09T10:00:00Z h.example app 12 ID47 - hello msg',)],
        "message string",
    )
    out = grok_parser(df, "%{SYSLOG5424LINE}").first()
    assert (out.syslog5424_ver, out.syslog5424_app) == ("1", "app")
    assert out.syslog5424_msg == "hello msg"

    df = spark.createDataFrame(
        [("[Wed Oct 11 14:32:52 2000] [error] [client 127.0.0.1] denied",)],
        "message string",
    )
    out = grok_parser(df, "%{HTTPD_ERRORLOG}").first()
    assert (out.loglevel, out.clientip, out.message) == (
        "error",
        "127.0.0.1",
        "denied",
    )


def test_infer_json_schema_drives_typed_parse(spark):
    """Bounded-sample schema inference → typed single-pass parse: the
    merged schema covers fields absent from some documents."""
    from vector_spark.operators.parsers import infer_json_schema, json_parser

    df = spark.createDataFrame(
        [('{"a": 1, "b": {"c": "x"}}',), ('{"a": 2, "d": 3.5}',)],
        "message string",
    )
    schema = infer_json_schema(df)
    names = set(schema.fieldNames())
    assert {"a", "b", "d"} <= names
    out = json_parser(df, schema=schema, drop_field=False)
    rows = sorted(out.collect(), key=lambda r: r.a)
    assert rows[0].a == 1 and rows[0].b.c == "x" and rows[0].d is None
    assert rows[1].a == 2 and rows[1].d == 3.5


def test_infer_schema_ignores_corrupt_sample_rows(spark):
    """Review r2c: a malformed document in the inference sample must
    not leak a synthetic _corrupt_record column into the output."""
    from vector_spark.operators.parsers import infer_json_schema, json_parser

    df = spark.createDataFrame(
        [('{"a":1,"b":"x"}',), ("not json at all",), ('{"a":2}',)],
        "message string",
    )
    schema = infer_json_schema(df)
    assert "_corrupt_record" not in schema.fieldNames()
    out = json_parser(df, schema="infer", drop_field=False)
    assert "_corrupt_record" not in out.columns
    assert out.count() == 3  # bad row kept with nulls


def test_key_value_parser_multichar_field_split(spark):
    """ADVICE r2: a multi-character field_split (key_value_parser.rs
    supports e.g. ':=') must split on the FULL string, not any one of
    its characters — keys/values containing ':' or '=' alone survive."""
    df = spark.createDataFrame(
        [("a:b := x=y, t := 10:30",)], "message string"
    )
    out = key_value_parser(
        df, field_split=":=", separator=",", fields=["a:b", "t"]
    )
    r = out.first()
    assert getattr(r, "a:b") == "x=y" and r.t == "10:30"


def test_regex_parser_single_pass_edges(spark):
    """The single-pass sentinel rewrite must agree with classic
    per-group extraction on: unmatched rows (null fields), optional
    non-participating groups ("" like RegExpExtract), rows containing
    the sentinel bytes (per-row fallback), and drop_failed."""
    rows = [
        ("123-abc",),          # full match
        ("456",),              # optional group does not participate
        ("nope",),             # no match
        ("789-x\x00\x1eyz",),  # sentinel bytes in the line → fallback
    ]
    df = spark.createDataFrame(rows, "message string")
    out = regex_parser(
        df, r"(?P<num>\d+)(?:-(?P<word>\S+))?", drop_field=False
    ).collect()
    assert (out[0].num, out[0].word) == ("123", "abc")
    assert (out[1].num, out[1].word) == ("456", "")
    assert (out[2].num, out[2].word) == (None, None)
    assert (out[3].num, out[3].word) == ("789", "x\x00\x1eyz")
    kept = regex_parser(
        df, r"(?P<num>\d+)(?:-(?P<word>\S+))?", drop_failed=True
    ).count()
    assert kept == 3


def test_grok_round5_vocabulary(spark):
    """Round-5 service families: POSTGRESQL, MONGO3_LOG, REDISLOG,
    REDISMONLOG, EXIM, RAILS3HEAD/RAILS3FOOT resolve and extract (the
    registry-wide expansion check lives in test_grok_round4)."""
    from vector_spark.operators.grok import grok_parser

    def one(pattern, line, types=None):
        df = spark.createDataFrame([(line,)], "line string")
        return grok_parser(df, pattern, field="line", types=types).first()

    r = one(
        "%{POSTGRESQL}",
        "12/24/2015 10:00:05 UTC user=pg,db=app conn42 995",
        types={"pid": "int"},
    )
    assert (r.timestamp, r.user_id, r.connection_id, r.pid) == (
        "12/24/2015 10:00:05", "user=pg,db=app", "conn42", 995,
    )

    r = one(
        "%{MONGO3_LOG}",
        "2015-01-24T10:00:05.000+0000 W NETWORK [initandlisten] waiting",
    )
    assert (r.severity, r.component, r.context, r.message) == (
        "W", "NETWORK", "initandlisten", "waiting",
    )

    r = one("%{REDISLOG}", "[4018] 14 Nov 07:01:22 * Background saving started")
    assert (r.pid, r.timestamp) == ("4018", "14 Nov 07:01:22")

    r = one(
        "%{REDISMONLOG}",
        '1424000000.123456 [5 10.2.3.4:61111] "SET" key value',
        types={"database": "int", "port": "int"},
    )
    assert (r.database, r.client, r.port, r.command) == (
        5, "10.2.3.4", 61111, "SET",
    )

    r = one(
        "%{EXIM}",
        "2015-03-02 11:22:33 1VxQaY-000EFZ-Kb == deferred@example.com T=smtp",
    )
    assert (r.msgid, r.flags) == ("1VxQaY-000EFZ-Kb", "==")
    assert r.message == "deferred@example.com T=smtp"

    r = one(
        "%{RAILS3HEAD}",
        'Started POST "/users/sign_in" for 127.0.0.1 at 2015-02-03 10:00:05 +0100',
    )
    assert (r.verb, r.request, r.clientip) == (
        "POST", "/users/sign_in", "127.0.0.1",
    )

    r = one(
        "%{RAILS3FOOT}",
        "Completed 200 OK in 14ms (Views: 9.2ms | ActiveRecord: 1.5ms)",
    )
    assert (r.response, r.totalms, r.viewms, r.activerecordms) == (
        "200", "14", "9.2", "1.5",
    )


def test_grok_round5_tranche2(spark):
    """Squid, bind, bacula, mongo slow query, nagios, ruby logger —
    one authentic line per family; registry-wide expansion is covered
    by test_grok_round4_vocabulary."""
    from vector_spark.operators.grok import grok_parser

    def one(pattern, line, types=None):
        df = spark.createDataFrame([(line,)], "line string")
        return grok_parser(df, pattern, field="line", types=types).first()

    r = one(
        "%{SQUID3}",
        "1426235101.111 1527 192.168.1.100 TCP_MISS/200 864 GET "
        "http://example.com/path - DIRECT/93.184.216.34 text/html",
        types={"status_code": "int", "bytes": "int"},
    )
    assert (r.cache_result, r.status_code, r.bytes) == ("TCP_MISS", 200, 864)
    assert (r.request_method, r.hierarchy_code) == ("GET", "DIRECT")

    r = one(
        "%{BIND9_QUERYLOG}",
        "17-Feb-2018 23:06:56.326 queries: info: client 172.26.0.1#12345 "
        "(test.example.com): query: test.example.com IN A (172.26.0.3)",
        types={"clientport": "int"},
    )
    assert (r.clientip, r.clientport, r.query, r.querytype, r.dns) == (
        "172.26.0.1", 12345, "test.example.com", "A", "172.26.0.3",
    )

    r = one(
        "%{BACULA_LOGLINE}",
        "01-Apr 18:30 backup-dir JobId 42: Bacula backup-dir 7.0.5: "
        "Backup OK",
        types={"jobid": "int"},
    )
    assert (r.hostname, r.jobid) == ("backup-dir", 42)
    assert r.message.startswith("Bacula")

    r = one(
        "%{MONGO_SLOWQUERY}",
        'query app.users query: { name: "x" } ntoreturn:1 ntoskip:0 '
        "nscanned:1000 keyUpdates:0 locks(micros) r:43 nreturned:1 "
        "reslen:123 120ms",
        types={"duration": "int", "nscanned": "int"},
    )
    assert (r.database, r.collection) == ("app", "users")
    assert (r.nscanned, r.nreturned, r.duration) == (1000, "1", 120)

    r = one(
        "%{NAGIOSLOGLINE}",
        "[1426235101] SERVICE ALERT: host;svc;CRITICAL;SOFT;1;failure",
    )
    assert r.nagios_type == "SERVICE ALERT"
    assert r.nagios_epoch == "1426235101"

    r = one(
        "%{RUBY_LOGGER}",
        "W, [2017-01-13T15:19:35.213941 #8] WARN -- app: slow request",
        types={"pid": "int"},
    )
    assert (r.pid, r.loglevel, r.progname, r.message) == (
        8, "WARN", "app", "slow request",
    )


def test_grok_round5_tranche3(spark):
    """cron/pam syslog, bro conn/http, junos RT_FLOW deny."""
    from vector_spark.operators.grok import grok_parser

    def one(pattern, line, types=None):
        df = spark.createDataFrame([(line,)], "line string")
        return grok_parser(df, pattern, field="line", types=types).first()

    r = one(
        "%{CRONLOG}",
        "Oct 11 22:14:15 host1 CRON[1234]: (root) CMD (/usr/bin/backup --all)",
    )
    assert (r.user, r.action, r.command) == (
        "root", "CMD", "/usr/bin/backup --all",
    )

    r = one(
        "%{SYSLOGPAMSESSION}",
        "Oct 11 22:14:15 host1 sshd[999]: pam_unix(sshd:session): "
        "session opened for user deploy by (uid=0)",
    )
    assert (r.pam_module, r.pam_session_state, r.username) == (
        "pam_unix", "opened", "deploy",
    )

    r = one(
        "%{BRO_CONN}",
        "1426235101.5\tCab1\t10.0.0.1\t51213\t10.0.0.2\t80\ttcp\thttp\t"
        "0.25\t512\t2048\tSF",
        types={"orig_p": "int", "resp_p": "int"},
    )
    assert (r.proto, r.orig_p, r.resp_p, r.conn_state) == ("tcp", 51213, 80, "SF")

    r = one(
        "%{BRO_HTTP}",
        "1426235101.5\tCab1\t10.0.0.1\t51213\t10.0.0.2\t80\t1\tGET\t"
        "example.com\t/index.html\t-\tcurl/7.1\t0\t1024\t200\tOK",
        types={"status_code": "int"},
    )
    assert (r.method, r.domain, r.status_code, r.status_msg) == (
        "GET", "example.com", 200, "OK",
    )

    r = one(
        "%{RT_FLOW3}",
        "RT_FLOW_SESSION_DENY: session denied 10.0.0.1/1234->10.0.0.2/443 "
        "junos-https 6(0) default-deny trust untrust extra",
        types={"src_port": "int", "dst_port": "int"},
    )
    assert (r.event, r.src_port, r.dst_port, r.policy_name) == (
        "RT_FLOW_SESSION_DENY", 1234, 443, "default-deny",
    )
