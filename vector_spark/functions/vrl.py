"""VRL standard library (lib/vrl/stdlib/src/, 113 functions) — the
scalar-function surface as Column helpers (SURVEY.md §2.3 table).

The VRL-lite expression parser (vector_spark/conditions.py) maps the
most common ones inline; this module carries the fuller surface for
direct DataFrame use, still 100% JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.conditions import ip_aton, ip_cidr_contains  # noqa: F401 (re-export)

# -- parse_url (lib/vrl/stdlib/src/parse_url.rs) ----------------------------


def parse_url(col: Column) -> Column:
    """URL → struct(scheme, host, port, path, query, fragment) via the
    built-in parse_url SQL function (JVM-side)."""
    return F.struct(
        F.parse_url(col, F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(col, F.lit("HOST")).alias("host"),
        F.parse_url(col, F.lit("PATH")).alias("path"),
        F.parse_url(col, F.lit("QUERY")).alias("query"),
        F.parse_url(col, F.lit("REF")).alias("fragment"),
    )


def parse_query_string(col: Column) -> Column:
    """``a=1&b=2`` → map<string,string> (parse_query_string.rs)."""
    pair = r"([^&=]+)=([^&]*)"
    keys = F.regexp_extract_all(col, F.lit(pair), F.lit(1))
    vals = F.regexp_extract_all(col, F.lit(pair), F.lit(2))
    return F.map_from_arrays(keys, vals)


# -- parse_duration (parse_duration.rs): "1s"/"5m"/"300ms" → seconds --------

_DURATION_UNITS = {
    "ns": 1e-9,
    "us": 1e-6,
    "µs": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
}


def parse_duration_seconds(col: Column) -> Column:
    num = F.regexp_extract(col, r"^([\d.]+)", 1).cast("double")
    unit = F.regexp_extract(col, r"^[\d.]+\s*([a-zµ]+)$", 1)
    expr = F.lit(None).cast("double")
    chain = F
    first = True
    for u, mult in _DURATION_UNITS.items():
        cond = unit == u
        if first:
            expr = F.when(cond, num * mult)
            first = False
        else:
            expr = expr.when(cond, num * mult)
    return expr.otherwise(F.lit(None))


# -- syslog mappings (to_syslog_severity.rs / to_syslog_level.rs) -----------

SYSLOG_LEVELS = [
    "emerg",
    "alert",
    "crit",
    "err",
    "warning",
    "notice",
    "info",
    "debug",
]


def to_syslog_severity(level: Column) -> Column:
    """level keyword → numeric severity (to_syslog_severity.rs)."""
    m = F.create_map(
        *[x for i, lvl in enumerate(SYSLOG_LEVELS) for x in (F.lit(lvl), F.lit(i))]
    )
    return F.element_at(m, F.lower(level))


def to_syslog_level(severity: Column) -> Column:
    arr = F.array(*[F.lit(lvl) for lvl in SYSLOG_LEVELS])
    return F.element_at(arr, severity.cast("int") + 1)


# -- ip functions (ip_aton / ip_ntoa / ip_subnet / ip_to_ipv6) ---------------


def ip_ntoa(col: Column) -> Column:
    n = col.cast("long")
    return F.format_string(
        "%d.%d.%d.%d",
        (n / 16777216).cast("long") % 256,
        (n / 65536).cast("long") % 256,
        (n / 256).cast("long") % 256,
        n % 256,
    )


def ip_subnet(col: Column, prefix_len: int) -> Column:
    """Network address of ip at the given prefix length."""
    mask = (0xFFFFFFFF << (32 - prefix_len)) & 0xFFFFFFFF
    return ip_ntoa(ip_aton(col).bitwiseAND(F.lit(mask)))


# -- redact (redact.rs): mask pattern matches --------------------------------


def redact(col: Column, pattern: str, replacement: str = "[REDACTED]") -> Column:
    return F.regexp_replace(col, pattern, replacement)


# -- encode_logfmt / encode_key_value (encode_logfmt.rs) ---------------------


def encode_logfmt(m: Column) -> Column:
    """map<string,string> → ``k=v`` logfmt line (keys sorted — Vector
    tags are BTreeMaps, encode_logfmt.rs emits sorted keys; values
    with spaces quoted)."""
    return F.array_join(
        F.transform(
            F.sort_array(F.map_entries(m)),
            lambda e: F.concat(
                e["key"],
                F.lit("="),
                F.when(
                    e["value"].contains(" "), F.concat(F.lit('"'), e["value"], F.lit('"'))
                ).otherwise(e["value"]),
            ),
        ),
        " ",
    )


# -- misc ---------------------------------------------------------------------


def parse_int(col: Column, base: int = 10) -> Column:
    return F.conv(col, base, 10).cast("long")


def format_int(col: Column, base: int = 16) -> Column:
    return F.lower(F.conv(col.cast("string"), 10, base))


def to_unix_timestamp(col: Column, unit: str = "seconds") -> Column:
    s = F.unix_timestamp(col)
    if unit == "seconds":
        return s
    if unit == "milliseconds":
        return (s * 1000 + F.date_format(col, "SSS").cast("long")).cast("long")
    raise ValueError(f"unknown unit {unit!r}")
