"""New VRL stdlib surface: parse_csv, percent encoding, match_any /
match_array, sha3, IP family conversions, ruby hash, encode_key_value,
parse_aws_alb_log, parse_aws_vpc_flow_log.

Expected values come from the reference's own test vectors
(lib/vrl/stdlib/src/<fn>.rs tests and the commented blocks in
tests/behavior/transforms/remap.toml).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.functions.logformats import parse_aws_alb_log, parse_aws_vpc_flow_log
from vector_spark.functions.vrl import (
    decode_percent,
    encode_key_value,
    encode_percent,
    get_env_var,
    get_hostname,
    ip_to_ipv6,
    ipv6_to_ipv4,
    match_any,
    match_array,
    parse_csv,
    parse_ruby_hash,
    sha3,
)

ALB_LINE = (
    'http 2018-11-30T22:23:00.186641Z app/my-loadbalancer/50dc6c495c0c9188 '
    '192.168.131.39:2817 - 0.000 0.001 0.000 200 200 34 366 '
    '"GET http://www.example.com:80/ HTTP/1.1" "curl/7.46.0" - - '
    'arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 '
    '"Root=1-58337364-23a8c76965a2ef7629b185e3" "-" "-" 0 '
    '2018-11-30T22:22:48.364000Z "forward" "-" "-" "-" "-" "-" "-"'
)


def test_parse_aws_alb_log_reference_vector(spark):
    df = spark.createDataFrame([(ALB_LINE,)], "message string")
    r = parse_aws_alb_log(df).first()
    assert r.type == "http"
    assert r.timestamp == "2018-11-30T22:23:00.186641Z"
    assert r.elb == "app/my-loadbalancer/50dc6c495c0c9188"
    assert r.client_host == "192.168.131.39:2817"
    assert r.target_host is None
    assert r.request_processing_time == 0.0
    assert r.target_processing_time == 0.001
    assert r.response_processing_time == 0.0
    assert r.elb_status_code == "200" and r.target_status_code == "200"
    assert r.received_bytes == 34 and r.sent_bytes == 366
    assert r.request_method == "GET"
    assert r.request_url == "http://www.example.com:80/"
    assert r.request_protocol == "HTTP/1.1"
    assert r.user_agent == "curl/7.46.0"
    assert r.ssl_cipher is None and r.ssl_protocol is None
    assert r.trace_id == "Root=1-58337364-23a8c76965a2ef7629b185e3"
    assert r.domain_name is None and r.chosen_cert_arn is None
    assert r.matched_rule_priority == "0"
    assert r.request_creation_time == "2018-11-30T22:22:48.364000Z"
    assert r.actions_executed == "forward"
    assert r.redirect_url is None and r.error_reason is None


def test_parse_aws_vpc_flow_log_reference_vectors(spark):
    df = spark.createDataFrame(
        [("2 123456789010 eni-1235b8ca123456789 - - - - - - - 1431280876 1431280934 - NODATA",)],
        "message string",
    )
    r = parse_aws_vpc_flow_log(df).first()
    assert r.version == 2 and r.account_id == 123456789010
    assert r.interface_id == "eni-1235b8ca123456789"
    assert r.srcaddr is None and r.protocol is None and r.action is None
    assert r.start == 1431280876 and r.end == 1431280934
    assert r.log_status == "NODATA"

    df2 = spark.createDataFrame(
        [("- eni-1235b8ca123456789 10.0.1.5 10.0.0.220 10.0.1.5 203.0.113.5",)],
        "message string",
    )
    r2 = parse_aws_vpc_flow_log(
        df2, format="instance_id interface_id srcaddr dstaddr pkt_srcaddr pkt_dstaddr"
    ).first()
    assert r2.instance_id is None
    assert r2.interface_id == "eni-1235b8ca123456789"
    assert r2.srcaddr == "10.0.1.5" and r2.dstaddr == "10.0.0.220"
    assert r2.pkt_srcaddr == "10.0.1.5" and r2.pkt_dstaddr == "203.0.113.5"


def test_parse_csv(spark):
    df = spark.createDataFrame(
        [('foo,"b,ar",baz,"say ""hi""",',)], "message string"
    )
    got = df.select(parse_csv(F.col("message")).alias("f")).first().f
    assert got == ["foo", "b,ar", "baz", 'say "hi"', ""]


def test_percent_encoding_roundtrip(spark):
    df = spark.createDataFrame([("foo bar?baz+qux/100%",)], "s string")
    enc = df.select(encode_percent(F.col("s")).alias("e")).first().e
    assert " " not in enc and "%20" in enc and "+" not in enc.replace("%2B", "")
    dec = df.select(
        decode_percent(encode_percent(F.col("s"))).alias("d")
    ).first().d
    assert dec == "foo bar?baz+qux/100%"


def test_match_any_and_match_array(spark):
    df = spark.createDataFrame([("error in module",)], "s string")
    assert df.select(match_any(F.col("s"), ["^warn", "err.r"]).alias("m")).first().m
    assert not df.select(match_any(F.col("s"), ["^warn", "^fatal"]).alias("m")).first().m
    df2 = spark.createDataFrame([(["foo", "bar123"],)], "a array<string>")
    assert df2.select(match_array(F.col("a"), r"\d+").alias("m")).first().m
    assert not df2.select(
        match_array(F.col("a"), r"\d+", all_items=True).alias("m")
    ).first().m


def test_sha3_reference_vector(spark):
    # sha3("foo") default SHA3-512 — remap.toml remap_function_sha3
    df = spark.createDataFrame([("foo",)], "s string")
    got = df.select(sha3(F.col("s")).alias("h")).first().h
    assert got == (
        "4bca2b137edc580fe50a88983ef860ebaca36c857b1f492839d6d7392452a63c"
        "82cbebc68e3b70a2a1480b4bb5d437a7cba6ecf9d89f9ff3ccd14cd6146ea7e7"
    )


def test_ip_family_conversions(spark):
    # remap.toml remap_function_ip_to_ipv6 / ipv6_to_ipv4 vectors
    df = spark.createDataFrame([("192.168.10.2", "::ffff:192.168.10.2", "2001:db8::1")],
                               "v4 string, mapped string, v6 string")
    r = df.select(
        ip_to_ipv6(F.col("v4")).alias("a"),
        ipv6_to_ipv4(F.col("mapped")).alias("b"),
        ipv6_to_ipv4(F.col("v4")).alias("c"),
        ipv6_to_ipv4(F.col("v6")).alias("d"),
    ).first()
    assert r.a == "::ffff:192.168.10.2"
    assert r.b == "192.168.10.2"
    assert r.c == "192.168.10.2"
    assert r.d is None


def test_parse_ruby_hash(spark):
    df = spark.createDataFrame(
        [('{ "test" => "value", "number" => 1, :sym => nil }',)], "s string"
    )
    got = df.select(parse_ruby_hash(F.col("s")).alias("m")).first().m
    assert got["test"] == "value" and got["number"] == "1"
    assert "sym" in got and got["sym"] is None


def test_encode_key_value(spark):
    df = spark.createDataFrame([({"lvl": "info", "app": "vector"},)], "m map<string,string>")
    got = df.select(encode_key_value(F.col("m")).alias("s")).first().s
    assert got == "app=vector lvl=info"  # sorted keys


def test_env_and_hostname_literals(spark):
    import socket

    r = spark.range(1).select(
        get_hostname().alias("h"), get_env_var("PATH").alias("p"),
        get_env_var("VS_NOT_SET_XYZ", "dflt").alias("d"),
    ).first()
    assert r.h == socket.gethostname()
    assert r.p and r.d == "dflt"


def test_parse_xml(spark):
    from vector_spark.functions.vrl import parse_xml

    df = spark.createDataFrame(
        [("<log><level>info</level><code>7</code></log>",)], "s string"
    )
    r = df.select(parse_xml(F.col("s"), "level string, code int").alias("x")).first().x
    assert r.level == "info" and r.code == 7


def test_parse_klog_and_linux_auth(spark):
    from vector_spark.functions.logformats import (
        parse_klog,
        parse_linux_authorization,
    )

    df = spark.createDataFrame(
        [("I0816 12:34:56.789012 1234 server.go:42] started",)], "message string"
    )
    r = parse_klog(df).first()
    assert r.level == "I" and r.thread_id == 1234 and r.file == "server.go"
    assert r.line == 42 and r.message_text == "started"

    df2 = spark.createDataFrame(
        [("Aug 16 12:00:01 host1 sshd[999]: Accepted publickey for root",)],
        "message string",
    )
    r2 = parse_linux_authorization(df2).first()
    assert r2.hostname == "host1" and r2.appname == "sshd" and r2.procid == 999
    assert r2.message_text == "Accepted publickey for root"


def test_parse_syslog5424_structured_data(spark):
    """RFC5424 with two SD elements (the reference's syslog source
    shape, src/sources/syslog.rs)."""
    from vector_spark.functions.logformats import parse_syslog5424

    line = (
        '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog '
        '1234 ID47 [exampleSDID@32473 iut="3" eventSource="Application"]'
        '[other@32473 class="high"] An application event log entry'
    )
    df = spark.createDataFrame([(line,)], "message string")
    r = parse_syslog5424(df).first()
    assert r.priority == 165 and r.version == 1
    assert r.facility == 20 and r.severity == 5
    assert r.hostname == "mymachine.example.com"
    assert r.appname == "evntslog" and r.procid == "1234" and r.msgid == "ID47"
    assert r.sd["iut"] == "3" and r.sd["eventSource"] == "Application"
    assert r.sd["class"] == "high"
    assert r.message_text == "An application event log entry"
    # nil SD + nil procid
    df2 = spark.createDataFrame(
        [("<34>1 2003-10-11T22:14:15.003Z host app - - - short",)], "message string"
    )
    r2 = parse_syslog5424(df2).first()
    assert r2.sd is None and r2.procid is None and r2.message_text == "short"


def test_to_syslog_facility_truncate_tokens_format_number(spark):
    """Reference vectors from the commented remap.toml corpus blocks:
    to_syslog_facility (3→daemon, 11→ftp, 23→local7), truncate
    ("foo"/"foob..."), parse_tokens (common-log line), format_number
    (1.234,56)."""
    from vector_spark.functions.vrl import (
        format_number,
        parse_tokens,
        to_syslog_facility,
        truncate,
    )

    df = spark.createDataFrame([(3, 11, 23)], "a int, b int, c int")
    r = df.select(
        to_syslog_facility(F.col("a")).alias("fa"),
        to_syslog_facility(F.col("b")).alias("fb"),
        to_syslog_facility(F.col("c")).alias("fc"),
        truncate(F.lit("foobar"), 3).alias("t1"),
        truncate(F.lit("foobar"), 4, ellipsis=True).alias("t2"),
        truncate(F.lit("foo"), 4, ellipsis=True).alias("t3"),
        format_number(F.lit(1234.567), 2, ",", ".").alias("fn"),
    ).first()
    assert (r.fa, r.fb, r.fc) == ("daemon", "ftp", "local7")
    assert r.t1 == "foo" and r.t2 == "foob..." and r.t3 == "foo"
    assert r.fn == "1.234,56"

    line = '217.250.207.207 - - [07/Sep/2020:16:38:00 -0400] "DELETE /x HTTP/1.1" 205 11881'
    toks = spark.createDataFrame([(line,)], "s string").select(
        parse_tokens(F.col("s")).alias("t")
    ).first().t
    assert toks == [
        "217.250.207.207", None, None, "07/Sep/2020:16:38:00 -0400",
        "DELETE /x HTTP/1.1", "205", "11881",
    ]


def test_malformed_log_lines_yield_nulls_not_job_abort(spark):
    """Review r2: one dirty line must never abort the job (ANSI mode).
    Short/garbage VPC lines, alphanumeric PROCID, out-of-range syslog
    facility, negative format_number — all per-event nulls/values."""
    from vector_spark.functions.logformats import (
        parse_aws_vpc_flow_log,
        parse_syslog5424,
    )
    from vector_spark.functions.vrl import format_number, to_syslog_facility

    # truncated + non-numeric VPC lines
    df = spark.createDataFrame(
        [("2 123 eni-1 10.0.0.1",), ("x y z notanum - - - - - - - - - -",)],
        "message string",
    )
    rows = parse_aws_vpc_flow_log(df).collect()
    assert rows[0].srcport is None and rows[0].log_status is None
    assert rows[1].srcaddr == "notanum"  # positional string survives
    # RFC5424 alphanumeric PROCID is legal → stays a string
    r = parse_syslog5424(
        spark.createDataFrame(
            [("<34>1 2003-10-11T22:14:15.003Z mymachine su ID47 MSG1 - hello",)],
            "message string",
        )
    ).first()
    assert r.procid == "ID47" and r.message_text == "hello"
    # facility out of range / negative → null
    g = spark.createDataFrame([(99, -1)], "a int, b int").select(
        to_syslog_facility(F.col("a")).alias("x"),
        to_syslog_facility(F.col("b")).alias("y"),
        format_number(F.lit(-1.239), 2).alias("n"),
    ).first()
    assert g.x is None and g.y is None
    assert g.n == "-1.23"  # truncation toward zero, not floor


def test_parse_ruby_hash_values_containing_arrows_and_nil(spark):
    """Review r2: `=>` / `nil` INSIDE quoted values must survive
    (structural pair extraction, not text rewriting)."""
    from vector_spark.functions.vrl import parse_ruby_hash

    df = spark.createDataFrame(
        [('{ "note" => "a => b", "v" => "nil", :sym => nil, "n" => 7 }',)],
        "s string",
    )
    m = df.select(parse_ruby_hash(F.col("s")).alias("m")).first().m
    assert m["note"] == "a => b"
    assert m["v"] == "nil"  # quoted literal string, NOT null
    assert m["sym"] is None  # bare nil IS null
    assert m["n"] == "7"


def test_review2_hardening(spark):
    """Second review round: dup ruby-hash keys last-win (no job
    abort), format_number with empty grouping separator, bare tokens
    keep stray quote/bracket chars, int! preserves > 2^53."""
    from vector_spark.conditions import compile_vrl_lite
    from vector_spark.functions.vrl import format_number, parse_ruby_hash, parse_tokens

    df = spark.createDataFrame(
        [('{ "a" => "1", "a" => "2" }', 'size 5" [partial rest', "9007199254740993")],
        "rh string, toks string, big string",
    )
    r = df.select(
        parse_ruby_hash(F.col("rh")).alias("m"),
        parse_tokens(F.col("toks")).alias("t"),
        format_number(F.lit(1234.56), 2, ".", "").alias("nogrp"),
        compile_vrl_lite("int!(.big)").alias("i"),
    ).first()
    assert dict(r.m) == {"a": "2"}  # last wins, no DUPLICATED_MAP_KEY abort
    assert r.t == ["size", '5"', "[partial", "rest"]  # bare chars kept
    assert r.nogrp == "1234.56"
    assert r.i == 9007199254740993  # no double round-trip corruption


def test_vrl_date_arithmetic_still_resolves(spark):
    """Promotion is scoped to * and %: adding an int to a DATE column
    must keep compiling (try_add(date, int) = date_add)."""
    from vector_spark.conditions import compile_vrl_lite

    df = spark.createDataFrame([("2020-01-01",)], "d string").select(
        F.col("d").cast("date").alias("d")
    )
    got = df.select(compile_vrl_lite(".d + 1").alias("d2")).first().d2
    assert str(got) == "2020-01-02"


def test_round4_stdlib_additions(spark):
    """Round-4 stdlib close-out: parse_regex_all (array<struct> of
    named captures), parse_grok (grok registry → object), is_* kind
    predicates (static fold on known kinds, typeof dispatch on
    unknown), parse_glog column form, parse_logfmt runtime map, and
    the boolean/integer coercion aliases."""
    from vector_spark.functions.vrl_program import compile_vrl_program

    df = spark.createDataFrame(
        [
            (
                "bananas and another ant",
                "I0816 12:34:56.789012 1234 file.cc:42] boot ok",
                'level=info msg="hi" n=3',
                7,
            )
        ],
        "message string, glog string, lf string, n long",
    )
    prog = compile_vrl_program(
        """
.hits = parse_regex_all!(.message, r'(?P<an>an.)')
.first = .hits[0].an
.grok = parse_grok!(.message, "%{WORD:w1} %{WORD:w2}")
.g = parse_glog!(.glog)
.lvl = .g.level
.kv = parse_logfmt!(.lf)
.is_s = is_string(.message)
.is_i = is_integer(.n)
.is_f = is_float(.n)
.b = boolean(true)
.i = integer(42)
""",
        columns=df.columns,
        schema={f.name: f.dataType.simpleString() for f in df.schema},
    )
    r = prog.apply(df).first()
    assert [h["an"] for h in r.hits] == ["ana", "and", "ano", "ant"]
    assert r.first == "ana"
    assert r.grok["w1"] == "bananas" and r.grok["w2"] == "and"
    assert r.lvl == "info" and r.g["line"] == 42 and r.g["message"] == "boot ok"
    assert dict(r.kv) == {"level": "info", "msg": "hi", "n": "3"}
    assert r.is_s is True and r.is_i is True and r.is_f is False
    assert r.b is True and r.i == 42


def test_is_kind_runtime_typeof_and_nulls(spark):
    """is_* on an untyped expression dispatches on F.typeof; null
    values are no kind (is_string(null) == false)."""
    from vector_spark.conditions import _FUNCS

    df = spark.createDataFrame([("x", None)], "s string, missing string")
    r = df.select(
        _FUNCS["is_string"](F.col("s")).alias("a"),
        _FUNCS["is_string"](F.col("missing")).alias("b"),
        _FUNCS["is_integer"](F.length(F.col("s")) + 0).alias("c"),
        _FUNCS["is_object"](F.create_map(F.lit("k"), F.lit("v"))).alias("d"),
    ).first()
    assert (r.a, r.b, r.d) == (True, False, True)
