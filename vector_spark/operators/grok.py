"""Grok parsing: ``%{PATTERN:name}`` templates → Java regex → Column.

Reference: src/transforms/grok_parser.rs:25-147 (the reference uses the
`grok` crate with the standard pattern library). Here: a registry of
the standard grok base patterns (public grok pattern definitions, as
shipped by logstash/grok — reimplemented, not copied), recursive
expansion into a single named-group regex, then the same extraction
machinery as regex_parser. Everything stays a JVM regexp expression.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from vector_spark.operators.parsers import regex_parser

# Standard grok base patterns (public, from the grok/logstash pattern
# vocabulary), minimal set covering the reference's tests + common logs.
GROK_PATTERNS: dict[str, str] = {
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\d+",
    "NONNEGINT": r"\d+",
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r'"(?:[^"\\]*(?:\\.[^"\\]*)*)"|\'(?:[^\'\\]*(?:\\.[^\'\\]*)*)\'',
    "QS": r'"(?:[^"\\]*(?:\\.[^"\\]*)*)"',
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILADDRESS": r"[a-zA-Z0-9_.+-]+@[a-zA-Z0-9-]+\.[a-zA-Z0-9-.]+",
    "MONTH": r"\bJan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?\b",
    "MONTHDAY": r"(?:0[1-9]|[12]\d|3[01]|[1-9])",
    "YEAR": r"\d{4}",
    "TIME": r"\d{2}:\d{2}:\d{2}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{ISO8601_TIMEZONE}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]\d{2}:?\d{2})",
    "TIMESTAMP_ISO8601": r"%{YEAR}-\d{2}-\d{2}[T ]\d{2}:\d{2}(?::\d{2}(?:\.\d+)?)?%{ISO8601_TIMEZONE}?",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    # Apache/HTTPD common + combined log (the grok_parser.rs:192-230 test case)
    "HTTPD_COMMONLOG": (
        r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] '
        r'"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
        r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
    ),
    "COMMONAPACHELOG": r"%{HTTPD_COMMONLOG}",
    "HTTPD_COMBINEDLOG": r"%{HTTPD_COMMONLOG} %{QS:referrer} %{QS:agent}",
    "COMBINEDAPACHELOG": r"%{HTTPD_COMBINEDLOG}",
    # round-2 widening: the rest of the high-traffic logstash vocabulary
    "HOUR": r"(?:2[0123]|[01]?\d)",
    "MINUTE": r"(?:[0-5]\d)",
    "SECOND": r"(?:[0-5]\d|60)(?:[:.,]\d+)?",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "DATESTAMP": r"(?:%{DATE_US}|%{DATE_EU})[- ]%{TIME}",
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
    "IPV6": (
        r"(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
        r"|(?:[0-9A-Fa-f]{1,4}:)*::(?:[0-9A-Fa-f]{1,4}:?)*(?:%{IPV4})?"
    ),
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]*",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility}.%{NONNEGINT:priority}>",
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}",
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"(?:[A-Za-z0-9_. -]+)",
    "JAVALOGMESSAGE": r"(?:.*)",
    # round-4 widening: remaining high-traffic logstash families
    # (syslog line, RFC5424 line, cisco, haproxy, java stacks, extra
    # datestamps) — public pattern vocabulary, re-expressed
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "TZ": r"(?:[A-Z]{3,4}|[+-]\d{4})",
    "BASE16NUM": r"(?:0[xX])?[0-9A-Fa-f]+",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+=:-]+",
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+)",
    # syslog (RFC3164) full line
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    "SYSLOGLINE": r"%{SYSLOGBASE} %{GREEDYDATA:message}",
    # syslog (RFC5424) full line
    "SYSLOG5424PRINTASCII": r"[!-~]+",
    "SYSLOG5424PRI": r"<%{NONNEGINT}>",
    "SYSLOG5424SD": r"\[%{DATA}\]+",
    "SYSLOG5424BASE": (
        r"%{SYSLOG5424PRI}%{NONNEGINT:syslog5424_ver} +"
        r"(?:%{TIMESTAMP_ISO8601:syslog5424_ts}|-) +"
        r"(?:%{IPORHOST:syslog5424_host}|-) +"
        r"(?:%{SYSLOG5424PRINTASCII:syslog5424_app}|-) +"
        r"(?:%{SYSLOG5424PRINTASCII:syslog5424_proc}|-) +"
        r"(?:%{SYSLOG5424PRINTASCII:syslog5424_msgid}|-) +"
        r"(?:%{SYSLOG5424SD:syslog5424_sd}|-|)"
    ),
    "SYSLOG5424LINE": r"%{SYSLOG5424BASE} +%{GREEDYDATA:syslog5424_msg}",
    # cisco
    "CISCOTIMESTAMP": r"%{MONTH} +%{MONTHDAY}(?: %{YEAR})? %{TIME}",
    "CISCOTAG": r"[A-Z0-9]+-%{INT}-(?:[A-Z0-9_]+)",
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    # haproxy HTTP log (the standard captured-field layout)
    "HAPROXYTIME": r"%{HOUR}:%{MINUTE}:%{SECOND}",
    "HAPROXYDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{HAPROXYTIME}\.%{INT}",
    "HAPROXYHTTPBASE": (
        r"%{IP:client_ip}:%{INT:client_port} \[%{HAPROXYDATE:accept_date}\] "
        r"%{NOTSPACE:frontend_name} %{NOTSPACE:backend_name}/%{NOTSPACE:server_name} "
        r"%{INT:time_request}/%{INT:time_queue}/%{INT:time_backend_connect}/"
        r"%{INT:time_backend_response}/%{NOTSPACE:time_duration} "
        r"%{INT:http_status_code} %{NOTSPACE:bytes_read} "
        r"%{DATA:captured_request_cookie} %{DATA:captured_response_cookie} "
        r"%{NOTSPACE:termination_state} "
        r"%{INT:actconn}/%{INT:feconn}/%{INT:beconn}/%{INT:srvconn}/%{NOTSPACE:retries} "
        r"%{INT:srv_queue}/%{INT:backend_queue} "
        r'"(?:%{WORD:http_verb} %{NOTSPACE:http_request}(?: HTTP/%{NUMBER:http_version})?|<BADREQ>)"'
    ),
    "HAPROXYHTTP": r"%{SYSLOGTIMESTAMP:syslog_timestamp} %{IPORHOST:syslog_server} %{SYSLOGPROG}: %{HAPROXYHTTPBASE}",
    # java / tomcat
    "JAVATHREAD": r"(?:[A-Z]{2}-Processor\d+)",
    "JAVASTACKTRACEPART": r"\s+at %{JAVACLASS:class}\.%{WORD:method}\(%{JAVAFILE:file}(?::%{INT:line})?\)",
    "CATALINA_DATESTAMP": r"%{MONTH} %{MONTHDAY}, %{YEAR} %{HOUR}:%{MINUTE}:%{SECOND} (?:AM|PM)",
    "TOMCAT_DATESTAMP": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY} %{HOUR}:%{MINUTE}:%{SECOND}(?:[.,]\d+)? %{ISO8601_TIMEZONE}",
    # additional datestamps
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822": r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_EVENTLOG": r"%{YEAR}%{MONTHNUM}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    # apache error log
    "HTTPD_ERRORLOG": (
        r"\[%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}\] "
        r"\[%{LOGLEVEL:loglevel}\] (?:\[client %{IPORHOST:clientip}\] )?%{GREEDYDATA:message}"
    ),
    # round-5 widening: service-log families from the logstash base
    # library (postgres, mongo, redis, exim, rails) — public pattern
    # vocabulary, re-expressed
    "POSTGRESQL": (
        r"%{DATESTAMP:timestamp} %{TZ} %{DATA:user_id} "
        r"%{GREEDYDATA:connection_id} %{POSINT:pid}"
    ),
    "MONGO_WORDDASH": r"\b[\w-]+\b",
    "MONGO3_SEVERITY": r"\w",
    "MONGO3_COMPONENT": r"(?:%{WORD}|-)",
    "MONGO3_LOG": (
        r"%{TIMESTAMP_ISO8601:timestamp} %{MONGO3_SEVERITY:severity} "
        r"%{MONGO3_COMPONENT:component}%{SPACE}(?:\[%{DATA:context}\])? "
        r"%{GREEDYDATA:message}"
    ),
    "REDISTIMESTAMP": r"%{MONTHDAY} %{MONTH} %{TIME}",
    "REDISLOG": r"\[%{POSINT:pid}\] %{REDISTIMESTAMP:timestamp} \* ",
    "REDISMONLOG": (
        r"%{NUMBER:timestamp} \[%{INT:database} %{IP:client}:%{NUMBER:port}\] "
        r'"%{WORD:command}"\s?%{GREEDYDATA:params}'
    ),
    "EXIM_MSGID": r"[0-9A-Za-z]{6}-[0-9A-Za-z]{6}-[0-9A-Za-z]{2}",
    "EXIM_FLAGS": r"(?:<=|[-=>*]>|[*]{2}|==)",
    "EXIM_DATE": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY} %{TIME}",
    "EXIM_PID": r"\[%{POSINT:pid}\]",
    "EXIM": (
        r"%{EXIM_DATE:timestamp} (?:%{EXIM_PID} )?%{EXIM_MSGID:msgid} "
        r"%{EXIM_FLAGS:flags} %{GREEDYDATA:message}"
    ),
    "RUUID": r"[0-9a-fA-F]{32}",
    "RAILS3TS": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY} %{HOUR}:%{MINUTE}:%{SECOND} "
        r"%{ISO8601_TIMEZONE}"
    ),
    "RAILS3HEAD": (
        r'Started %{WORD:verb} "%{URIPATHPARAM:request}" for '
        r"%{IPORHOST:clientip} at %{RAILS3TS:timestamp}"
    ),
    # logstash writes this as an alternation that names
    # `activerecordms` twice; Java/Python regex forbid duplicate
    # group names, so the Views half is an optional prefix instead
    # (same accepted language, same captures)
    "RAILS3PROFILE": (
        r"\((?:Views: %{NUMBER:viewms}ms \| )?ActiveRecord: "
        r"%{NUMBER:activerecordms}ms\)"
    ),
    "RAILS3FOOT": (
        r"Completed %{NUMBER:response}%{DATA} in %{NUMBER:totalms}ms "
        r"%{RAILS3PROFILE}%{GREEDYDATA}"
    ),
    # round-5 tranche 2: squid, bind, bacula, mongo slow query, nagios,
    # ruby logger, mcollective (logstash base-library long tail)
    "SQUID3": (
        r"%{NUMBER:timestamp}\s+%{NUMBER:duration}\s%{IP:client_address}\s"
        r"%{WORD:cache_result}/%{POSINT:status_code}\s%{NUMBER:bytes}\s"
        r"%{WORD:request_method}\s%{NOTSPACE:url}\s(?:%{NOTSPACE:user}|-)\s"
        r"%{WORD:hierarchy_code}/%{IPORHOST:server}\s%{NOTSPACE:content_type}"
    ),
    "BIND9_TIMESTAMP": r"%{MONTHDAY}-%{MONTH}-%{YEAR} %{TIME}(?:\.\d+)?",
    # the logstash original names `query` twice (Oniguruma allows it;
    # Java regex does not) — the parenthesised echo is unnamed here
    "BIND9_QUERYLOG": (
        r"%{BIND9_TIMESTAMP:timestamp} queries: %{LOGLEVEL:loglevel}: "
        r"client %{IP:clientip}#%{POSINT:clientport} \(%{DATA}\): "
        r"query: %{NOTSPACE:query} IN %{WORD:querytype} \(%{IP:dns}\)"
    ),
    "BACULA_TIMESTAMP": r"%{MONTHDAY}-%{MONTH}(?:-%{YEAR})? %{HOUR}:%{MINUTE}",
    "BACULA_HOST": r"[a-zA-Z0-9-]+",
    "BACULA_DEVICE": r"%{USER}",
    "BACULA_VOLUME": r"%{USER}",
    "BACULA_JOB": r"%{USER}",
    "BACULA_LOGLINE": (
        r"%{BACULA_TIMESTAMP:timestamp} %{BACULA_HOST:hostname}"
        r"(?: JobId %{INT:jobid})?:? %{GREEDYDATA:message}"
    ),
    # mongo slow-query: the logstash MONGO_QUERY uses lookbehind; the
    # brace body is captured directly instead (same text)
    "MONGO_QUERY": r"\{(?:[^{}]|\{[^{}]*\})*\}",
    "MONGO_SLOWQUERY": (
        r"%{WORD} %{MONGO_WORDDASH:database}\.%{MONGO_WORDDASH:collection} "
        r"%{WORD}: %{MONGO_QUERY:query} %{WORD}:%{NONNEGINT:ntoreturn} "
        r"%{WORD}:%{NONNEGINT:ntoskip} %{WORD}:%{NONNEGINT:nscanned}.*"
        r"nreturned:%{NONNEGINT:nreturned}.* %{POSINT:duration}ms"
    ),
    "NAGIOSTIME": r"\[%{NUMBER:nagios_epoch}\]",
    "NAGIOSLOGLINE": (
        r"%{NAGIOSTIME} %{DATA:nagios_type}: %{GREEDYDATA:nagios_message}"
    ),
    "RUBY_LOGLEVEL": r"(?:DEBUG|FATAL|ERROR|WARN|INFO)",
    "RUBY_LOGGER": (
        r"[DFEWI], \[%{TIMESTAMP_ISO8601:timestamp} #%{POSINT:pid}\] "
        r"*%{RUBY_LOGLEVEL:loglevel} -- +%{DATA:progname}: "
        r"%{GREEDYDATA:message}"
    ),
    "MCOLLECTIVE": (
        r"., \[%{TIMESTAMP_ISO8601:timestamp} #%{POSINT:pid}\]"
        r"%{SPACE}%{LOGLEVEL:event_level}"
    ),
    "MCOLLECTIVEAUDIT": r"%{TIMESTAMP_ISO8601:timestamp}:",
    # round-5 tranche 3: cron/pam syslog lines, bro/zeek conn+http,
    # junos RT_FLOW deny (field names underscored — Java group names
    # cannot carry the logstash originals' dashes)
    # core grok-patterns completion (the base file's remaining entries)
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "BASE16FLOAT": (
        r"\b(?<![0-9.+-])(?>[+-]?(?:0x)?(?:(?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?)"
        r"|(?:\.[0-9A-Fa-f]+)))\b"
    ),
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "DATE": r"(?:%{DATE_US}|%{DATE_EU})",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "CRON_ACTION": r"[A-Z ]+",
    "CRONLOG": (
        r"%{SYSLOGBASE} \(%{USER:user}\) %{CRON_ACTION:action} "
        r"\(%{DATA:command}\)"
    ),
    "SYSLOGPAMSESSION": (
        r"%{SYSLOGBASE} %{WORD:pam_module}\(%{DATA:pam_caller}\): "
        r"session %{WORD:pam_session_state} for user %{USERNAME:username}"
        r"(?: by %{GREEDYDATA:pam_by})?"
    ),
    "BRO_CONN": (
        r"%{NUMBER:ts}\t%{NOTSPACE:uid}\t%{IP:orig_h}\t%{INT:orig_p}\t"
        r"%{IP:resp_h}\t%{INT:resp_p}\t%{WORD:proto}\t"
        r"%{NOTSPACE:service}\t%{NUMBER:duration}\t%{NUMBER:orig_bytes}\t"
        r"%{NUMBER:resp_bytes}\t%{NOTSPACE:conn_state}"
    ),
    "BRO_HTTP": (
        r"%{NUMBER:ts}\t%{NOTSPACE:uid}\t%{IP:orig_h}\t%{INT:orig_p}\t"
        r"%{IP:resp_h}\t%{INT:resp_p}\t%{INT:trans_depth}\t"
        r"%{WORD:method}\t%{NOTSPACE:domain}\t%{NOTSPACE:uri}\t"
        r"%{NOTSPACE:referrer}\t%{NOTSPACE:user_agent}\t"
        r"%{NUMBER:request_body_len}\t%{NUMBER:response_body_len}\t"
        r"%{INT:status_code}\t%{GREEDYDATA:status_msg}"
    ),
    "RT_FLOW_EVENT": (
        r"(?:RT_FLOW_SESSION_CREATE|RT_FLOW_SESSION_CLOSE"
        r"|RT_FLOW_SESSION_DENY)"
    ),
    "RT_FLOW3": (
        r"%{RT_FLOW_EVENT:event}: session denied "
        r"%{IP:src_ip}/%{INT:src_port}->%{IP:dst_ip}/%{INT:dst_port} "
        r"%{NOTSPACE:service} %{INT:protocol_id}\(\d\) "
        r"%{NOTSPACE:policy_name} %{NOTSPACE:from_zone} "
        r"%{NOTSPACE:to_zone} %{GREEDYDATA}"
    ),
}

_GROK_REF_RE = re.compile(r"%\{(?P<pat>[A-Z0-9_]+)(?::(?P<name>[^}:]+))?(?::[^}]+)?\}")


def grok_to_regex(pattern: str, _depth: int = 0) -> str:
    """Recursively expand ``%{PAT:name}`` refs into a named-group regex."""
    if _depth > 20:
        raise ValueError("grok expansion too deep (cycle?)")

    def sub(m: re.Match) -> str:
        pat, name = m.group("pat"), m.group("name")
        if pat not in GROK_PATTERNS:
            raise ValueError(f"unknown grok pattern %{{{pat}}}")
        body = grok_to_regex(GROK_PATTERNS[pat], _depth + 1)
        if name:
            safe = name.replace(".", "_").replace("-", "_")
            return f"(?P<{safe}>{body})"
        return f"(?:{body})"

    return _GROK_REF_RE.sub(sub, pattern)


def grok_parser(
    df: DataFrame,
    pattern: str,
    field: str = "message",
    types: dict[str, str] | None = None,
    drop_field: bool = True,
) -> DataFrame:
    """Match a grok pattern against ``field``; named captures become
    typed columns (grok_parser.rs:25-147). drop_field keeps the source
    if the pattern re-captures it, mirroring the reference."""
    regex = grok_to_regex(pattern)
    return regex_parser(
        df, [regex], field=field, types=types, drop_field=drop_field, drop_failed=False
    )
