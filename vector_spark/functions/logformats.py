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
