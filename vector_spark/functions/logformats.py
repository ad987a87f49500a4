"""Named log-format parsers — the VRL ``parse_*`` family
(lib/vrl/stdlib/src/parse_syslog.rs, parse_apache_log.rs,
parse_common_log.rs, parse_nginx_log.rs, parse_glog.rs,
parse_klog.rs), built on the grok/regex machinery. All JVM regex —
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from vector_spark.operators.grok import grok_parser
from vector_spark.operators.parsers import regex_parser

# RFC3164-ish syslog: <PRI>Mmm dd HH:MM:SS host prog[pid]: msg
_SYSLOG_RE = (
    r"^(?:<(?P<priority>\d+)>)?"
    r"(?P<timestamp>[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(?P<hostname>\S+) "
    r"(?P<appname>[^\[\s:]+)(?:\[(?P<procid>\d+)\])?:? ?"
    r"(?P<message_text>.*)$"
)

# glog/klog: I0816 12:34:56.789012 1234 file.cc:42] msg
_GLOG_RE = (
    r"^(?P<level>[IWEF])(?P<date>\d{4}) "
    r"(?P<time>\d{2}:\d{2}:\d{2}\.\d+) +"
    r"(?P<thread_id>\d+) "
    r"(?P<file>[^:]+):(?P<line>\d+)\] "
    r"(?P<message_text>.*)$"
)

_SYSLOG_TYPES = {"priority": "int", "procid": "int"}
_GLOG_TYPES = {"line": "int", "thread_id": "int"}
_HTTPD_TYPES = {"response": "int", "bytes": "int"}


def parse_syslog(df: DataFrame, field: str = "message", drop_field: bool = True) -> DataFrame:
    """parse_syslog.rs (RFC3164 subset; RFC5424 structured data out of
    scope — documented divergence)."""
    return regex_parser(
        df, [_SYSLOG_RE], field=field, types=_SYSLOG_TYPES, drop_field=drop_field
    )


def parse_glog(df: DataFrame, field: str = "message", drop_field: bool = True) -> DataFrame:
    """parse_glog.rs / parse_klog.rs (same wire format)."""
    return regex_parser(
        df, [_GLOG_RE], field=field, types=_GLOG_TYPES, drop_field=drop_field
    )


def parse_common_log(df: DataFrame, field: str = "message", drop_field: bool = True) -> DataFrame:
    """parse_common_log.rs — Apache/HTTPD common log via grok."""
    return grok_parser(
        df, "%{HTTPD_COMMONLOG}", field=field, types=_HTTPD_TYPES, drop_field=drop_field
    )


def parse_apache_log(
    df: DataFrame, format: str = "common", field: str = "message", drop_field: bool = True
) -> DataFrame:
    """parse_apache_log.rs — common or combined format."""
    pattern = "%{HTTPD_COMMONLOG}" if format == "common" else "%{HTTPD_COMBINEDLOG}"
    return grok_parser(df, pattern, field=field, types=_HTTPD_TYPES, drop_field=drop_field)


def parse_nginx_log(df: DataFrame, field: str = "message", drop_field: bool = True) -> DataFrame:
    """parse_nginx_log.rs — nginx 'combined' default access-log format
    (same shape as HTTPD combined)."""
    return grok_parser(
        df, "%{HTTPD_COMBINEDLOG}", field=field, types=_HTTPD_TYPES, drop_field=drop_field
    )


# -- AWS formats (parse_aws_alb_log.rs, parse_aws_vpc_flow_log.rs) -----------

# ALB access log: 29 space-separated fields, quoted request/UA/actions.
# Field list per parse_aws_alb_log.rs:16-80 (type, timestamp, elb,
# client:port, target:port, 3 processing times, 2 status codes, bytes,
# "request", "user_agent", ssl_cipher, ssl_protocol, target_group_arn,
# "trace_id", "domain", "cert_arn", matched_rule_priority,
# request_creation_time, "actions", "redirect", "error", ...).
_ALB_RE = (
    r'^(?P<rtype>\S+) (?P<timestamp>\S+) (?P<elb>\S+) '
    r'(?P<clienthost>\S+) (?P<targethost>\S+) '
    r'(?P<requestprocessingtime>[\d.-]+) (?P<targetprocessingtime>[\d.-]+) '
    r'(?P<responseprocessingtime>[\d.-]+) '
    r'(?P<elbstatuscode>\S+) (?P<targetstatuscode>\S+) '
    r'(?P<receivedbytes>\d+) (?P<sentbytes>\d+) '
    r'"(?P<requestmethod>\S+) (?P<requesturl>\S+) (?P<requestprotocol>[^"]*)" '
    r'"(?P<useragent>[^"]*)" (?P<sslcipher>\S+) (?P<sslprotocol>\S+) '
    r'(?P<targetgrouparn>\S+) "(?P<traceid>[^"]*)" "(?P<domainname>[^"]*)" '
    r'"(?P<chosencertarn>[^"]*)" (?P<matchedrulepriority>\S+) '
    r'(?P<requestcreationtime>\S+) "(?P<actionsexecuted>[^"]*)" '
    r'"(?P<redirecturl>[^"]*)"(?: "(?P<errorreason>[^"]*)")?.*$'
)

# regex group name -> output field name (Java named groups allow only
# [A-Za-z0-9]; extraction is by index so names are placeholders)
_ALB_FIELDS = {
    "rtype": "type",
    "timestamp": "timestamp",
    "elb": "elb",
    "clienthost": "client_host",
    "targethost": "target_host",
    "requestprocessingtime": "request_processing_time",
    "targetprocessingtime": "target_processing_time",
    "responseprocessingtime": "response_processing_time",
    "elbstatuscode": "elb_status_code",
    "targetstatuscode": "target_status_code",
    "receivedbytes": "received_bytes",
    "sentbytes": "sent_bytes",
    "requestmethod": "request_method",
    "requesturl": "request_url",
    "requestprotocol": "request_protocol",
    "useragent": "user_agent",
    "sslcipher": "ssl_cipher",
    "sslprotocol": "ssl_protocol",
    "targetgrouparn": "target_group_arn",
    "traceid": "trace_id",
    "domainname": "domain_name",
    "chosencertarn": "chosen_cert_arn",
    "matchedrulepriority": "matched_rule_priority",
    "requestcreationtime": "request_creation_time",
    "actionsexecuted": "actions_executed",
    "redirecturl": "redirect_url",
    "errorreason": "error_reason",
}

_ALB_INT = {"received_bytes", "sent_bytes"}
_ALB_FLOAT = {
    "request_processing_time",
    "target_processing_time",
    "response_processing_time",
}


# ALB token positions (quote-aware whitespace tokenization of the
# documented field order; positions 12/13/17-19/22-24 are the quoted
# fields). The request token sub-splits into method/url/protocol.
_ALB_TOKEN_FIELDS: list[tuple[int, str]] = [
    (0, "type"),
    (1, "timestamp"),
    (2, "elb"),
    (3, "client_host"),
    (4, "target_host"),
    (5, "request_processing_time"),
    (6, "target_processing_time"),
    (7, "response_processing_time"),
    (8, "elb_status_code"),
    (9, "target_status_code"),
    (10, "received_bytes"),
    (11, "sent_bytes"),
    (13, "user_agent"),
    (14, "ssl_cipher"),
    (15, "ssl_protocol"),
    (16, "target_group_arn"),
    (17, "trace_id"),
    (18, "domain_name"),
    (19, "chosen_cert_arn"),
    (20, "matched_rule_priority"),
    (21, "request_creation_time"),
    (22, "actions_executed"),
    (23, "redirect_url"),
    (24, "error_reason"),
]


def parse_aws_alb_log(df: DataFrame, field: str = "message", drop_field: bool = True) -> DataFrame:
    """parse_aws_alb_log.rs — '-' fields → null; processing times
    FLOAT, byte counts BIGINT (reference type table).

    Strategy: ONE quote-aware tokenization pass
    (``regexp_extract_all('"[^"]*"|\\S+')``) + O(1) positional gets —
    measured 2.1× faster than even the single-pass 28-group regex on
    the sf0.1 bench (the trivial alternation beats 28 anchored capture
    groups), and the scan stays a narrow whole-stage-codegen
    projection. Lines with fewer than the 24 mandatory fields parse to
    all-null (the regex path's no-match behavior); ``error_reason`` and
    trailing additions are optional, extra tokens are ignored —
    mirroring the reference regex's ``(?: ...)?.*$`` tail."""
    from pyspark.sql import functions as F

    src = F.col(field).cast("string")
    toks = F.regexp_extract_all(src, F.lit(r'"[^"]*"|\S+'), F.lit(0))
    base = df.withColumn("_alb_t", toks)
    t = F.col("_alb_t")
    matched = F.size(t) >= 24

    # positions whose tokens are quoted in the ALB format — ONLY these
    # pay a quote-strip; a regexp_replace on all 27 fields costs more
    # than the tokenization pass itself (measured)
    quoted = {12, 13, 17, 18, 19, 22, 23, 24}

    def tok(i: int) -> Column:
        c = F.get(t, i)
        if i in quoted:
            c = F.regexp_replace(c, r'^"|"$', "")
        return F.when(matched & (c != "-"), c)

    cols: dict[str, Column] = {}
    for i, name in _ALB_TOKEN_FIELDS:
        c = tok(i)
        if name in _ALB_INT:
            c = c.try_cast("long")
        elif name in _ALB_FLOAT:
            c = c.try_cast("double")
        cols[name] = c
    # request token: '"METHOD url protocol"' → three fields (the
    # reference captures \S+ \S+ [^"]* inside the quotes). A failed
    # connection logs the request as '"- - -"' — each '-' component
    # maps to null, same as top-level '-' fields.
    req = F.split(tok(12), " ", 3)

    def req_part(i: int) -> Column:
        c = F.get(req, i)
        return F.when(c != "-", c)

    cols["request_method"] = req_part(0)
    cols["request_url"] = req_part(1)
    cols["request_protocol"] = req_part(2)
    out = base.withColumns(cols).drop("_alb_t")
    if drop_field:
        out = out.drop(field)
    return out


_VPC_DEFAULT_FORMAT = (
    "version account_id interface_id srcaddr dstaddr srcport dstport "
    "protocol packets bytes start end action log_status"
)

_VPC_INT_FIELDS = {
    "version",
    "account_id",
    "srcport",
    "dstport",
    "protocol",
    "packets",
    "bytes",
    "start",
    "end",
}


def parse_aws_vpc_flow_log(
    df: DataFrame,
    field: str = "message",
    format: str | None = None,
    drop_field: bool = True,
) -> DataFrame:
    """parse_aws_vpc_flow_log.rs — positional space-split per the
    (configurable) format string; '-' → null; numeric fields BIGINT."""
    from pyspark.sql import functions as F

    names = (format or _VPC_DEFAULT_FORMAT).split()
    parts = F.split(F.trim(F.col(field).cast("string")), r"\s+")
    cols = {}
    for i, name in enumerate(names):
        # try_*: a short or malformed line yields nulls for the missing
        # positions — one dirty log line must not abort the job (ANSI)
        c = F.try_element_at(parts, F.lit(i + 1))
        c = F.when(c == "-", F.lit(None)).otherwise(c)
        if name in _VPC_INT_FIELDS:
            c = c.try_cast("long")
        cols[name] = c
    out = df.withColumns(cols)
    if drop_field and field not in cols:
        out = out.drop(field)
    return out


def parse_klog(df: DataFrame, field: str = "message", drop_field: bool = True) -> DataFrame:
    """parse_klog.rs — kubernetes klog shares the glog wire format
    (Lmmdd HH:MM:SS.ffffff threadid file:line] msg)."""
    return parse_glog(df, field=field, drop_field=drop_field)


def parse_linux_authorization(
    df: DataFrame, field: str = "message", drop_field: bool = True
) -> DataFrame:
    """parse_linux_authorization.rs — /var/log/auth.log lines are
    RFC3164 syslog; the reference delegates to parse_syslog."""
    return parse_syslog(df, field=field, drop_field=drop_field)


# -- RFC5424 syslog (parse_syslog.rs full format; src/sources/syslog.rs) -----

_SYSLOG5424_RE = (
    r"^<(?P<priority>\d+)>(?P<version>\d+) "
    r"(?P<timestamp>\S+) (?P<hostname>\S+) (?P<appname>\S+) "
    r"(?P<procid>\S+) (?P<msgid>\S+) "
    r"(?P<sdraw>-|(?:\[[^\]]*\])+)"
    r"(?: (?P<messagetext>.*))?$"
)

_SD_TYPES = {"priority": "int", "version": "int"}


def parse_syslog5424(
    df: DataFrame, field: str = "message", drop_field: bool = True
) -> DataFrame:
    """RFC5424 syslog incl. STRUCTURED-DATA (closing the round-1
    "RFC5424 structured data out of scope" divergence;
    src/sources/syslog.rs). The SD elements parse into a
    map<string,string> column ``sd`` of param=value pairs; facility and
    severity derive from priority (pri = facility*8 + severity).
    Dialect: params from multiple SD elements share one map (flat
    schema) — duplicate param names across elements last-write-win."""
    from pyspark.sql import functions as F

    out = regex_parser(df, [_SYSLOG5424_RE], field=field, types=_SD_TYPES, drop_field=drop_field)
    pair = r'([A-Za-z0-9@._-]+)="([^"]*)"'
    sdcol = F.when(F.col("sdraw") == "-", F.lit(None)).otherwise(F.col("sdraw"))
    sd = F.map_from_arrays(
        F.regexp_extract_all(sdcol, F.lit(pair), F.lit(1)),
        F.regexp_extract_all(sdcol, F.lit(pair), F.lit(2)),
    )
    nullify = lambda c: F.when(F.col(c) == "-", F.lit(None)).otherwise(F.col(c))  # noqa: E731
    return (
        out.withColumn("sd", sd)
        .withColumn("facility", (F.col("priority") / 8).try_cast("int"))
        .withColumn("severity", F.pmod(F.col("priority"), F.lit(8)).try_cast("int"))
        # RFC5424 PROCID is PRINTUSASCII (often a pid, but names like
        # "ID47" are legal) — keep it a STRING; callers cast when they
        # know it is numeric
        .withColumn("procid", nullify("procid"))
        .withColumn("msgid", nullify("msgid"))
        .withColumnRenamed("messagetext", "message_text")
        .drop("sdraw")
    )
