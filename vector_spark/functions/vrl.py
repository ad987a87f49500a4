"""VRL standard library (lib/vrl/stdlib/src/, 113 functions) — the
scalar-function surface as Column helpers (SURVEY.md §2.3 table).

The VRL-lite expression parser (vector_spark/conditions.py) maps the
most common ones inline; this module carries the fuller surface for
direct DataFrame use, still 100% JVM-side expressions.
"""

from __future__ import annotations

import pandas as pd
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


# -- parse_csv (lib/vrl/stdlib/src/parse_csv.rs) ----------------------------

# one CSV field: quoted (with "" escapes) or bare; leading , or ^ anchor
_CSV_FIELD = r'(?:"(?:[^"]|"")*"|[^,]*)'


def parse_csv(col: Column) -> Column:
    """CSV line → array<string> of fields (RFC-4180-ish: double-quoted
    fields may contain commas; "" unescapes to "). JVM-side
    regexp_extract_all + transform — no UDF."""
    fields = F.regexp_extract_all(
        col.cast("string"), F.lit(f"(?:^|,)({_CSV_FIELD})"), F.lit(1)
    )
    return F.transform(
        fields,
        lambda x: F.when(
            x.rlike('^".*"$'),
            F.regexp_replace(F.regexp_replace(x, '^"|"$', ""), '""', '"'),
        ).otherwise(x),
    )


# -- percent encoding (encode_percent.rs / decode_percent.rs) ----------------


def encode_percent(col: Column) -> Column:
    """Percent-encode (space → %20, NOT the form-encoding '+')."""
    return F.replace(F.url_encode(col.cast("string")), F.lit("+"), F.lit("%20"))


def decode_percent(col: Column) -> Column:
    """Inverse of encode_percent; literal '+' stays '+' (VRL decodes
    percent sequences only, unlike form decoding)."""
    return F.url_decode(
        F.replace(col.cast("string"), F.lit("+"), F.lit("%2B"))
    )


# -- match_any / match_array (match_any.rs / match_array.rs) -----------------


def match_any(col: Column, patterns: list[str]) -> Column:
    """True if ANY regex matches (the reference compiles a RegexSet)."""
    out = None
    for p in patterns:
        c = col.rlike(p)
        out = c if out is None else (out | c)
    if out is None:
        raise ValueError("match_any needs at least one pattern")
    return out


def match_array(arr: Column, pattern: str, all_items: bool = False) -> Column:
    """True if any (or all, with ``all_items``) array element matches."""
    if all_items:
        return F.forall(arr, lambda x: x.rlike(pattern))
    return F.exists(arr, lambda x: x.rlike(pattern))


# -- sha3 (sha3.rs; default variant SHA3-512) --------------------------------


def sha3(col: Column, variant: str = "SHA3-512") -> Column:
    """SHA-3 digest hex. No JVM builtin — Arrow-batched pandas UDF
    (the one slow-path member of this module, clearly labeled)."""
    import hashlib

    algo = {
        "SHA3-224": hashlib.sha3_224,
        "SHA3-256": hashlib.sha3_256,
        "SHA3-384": hashlib.sha3_384,
        "SHA3-512": hashlib.sha3_512,
    }[variant]

    @F.pandas_udf("string")
    def _sha3(s: pd.Series) -> pd.Series:
        return s.map(lambda v: algo(str(v).encode()).hexdigest() if v is not None else None)

    return _sha3(col.cast("string"))


# -- IP family conversions (ip_to_ipv6.rs / ipv6_to_ipv4.rs) -----------------


def ip_to_ipv6(col: Column) -> Column:
    """IPv4 → IPv4-mapped IPv6 ("::ffff:a.b.c.d"); IPv6 passes through."""
    return F.when(col.contains(":"), col).otherwise(F.concat(F.lit("::ffff:"), col))


def ipv6_to_ipv4(col: Column) -> Column:
    """IPv4-mapped IPv6 → dotted quad; plain IPv4 passes through; other
    IPv6 → null (the reference errors — error value is null here)."""
    return (
        F.when(~col.contains(":"), col)
        .when(F.lower(col).startswith("::ffff:"), F.substring(col, 8, 64))
        .otherwise(F.lit(None).cast("string"))
    )


# -- environment introspection (get_env_var.rs / get_hostname.rs) ------------


def get_hostname() -> Column:
    """Driver hostname as a plan-time literal. Divergence note: the
    reference reads the hostname on each host at runtime; in a Spark
    plan a per-executor value would be non-deterministic under retry,
    so the driver's name is pinned at compile time."""
    import socket

    return F.lit(socket.gethostname())


def get_env_var(name: str, default: str | None = None) -> Column:
    """Driver-side environment variable as a plan-time literal."""
    import os

    return F.lit(os.environ.get(name, default))


# -- parse_ruby_hash (parse_ruby_hash.rs) -------------------------------------


def parse_ruby_hash(col: Column) -> Column:
    """Ruby hash literal ({"k" => "v", :sym => nil}) → map<string,string>.

    Structural extraction, not text rewriting: one PAIR regex matches
    ``"key" => value`` / ``:sym => value`` units, so ``=>`` or ``nil``
    INSIDE a quoted value never gets rewritten (the failure mode of the
    earlier replace-then-from_json approach). ``nil`` values → null.
    Limitation (documented): top-level flat hashes; nested hashes need
    the JSON path."""
    pair = (
        r'(?:"((?:[^"\\]|\\.)*)"|:([A-Za-z_]\w*))'  # key: quoted | :symbol
        r"\s*=>\s*"
        r'(?:"((?:[^"\\]|\\.)*)"|([^,}\s]+))'  # value: quoted | bare token
    )
    s = col.cast("string")
    qk = F.regexp_extract_all(s, F.lit(pair), F.lit(1))
    sk = F.regexp_extract_all(s, F.lit(pair), F.lit(2))
    qv = F.regexp_extract_all(s, F.lit(pair), F.lit(3))
    bv = F.regexp_extract_all(s, F.lit(pair), F.lit(4))
    keys = F.zip_with(qk, sk, lambda a, b: F.when(a == "", b).otherwise(a))
    vals = F.zip_with(
        qv,
        bv,
        lambda q, b: F.when(b == "nil", F.lit(None))
        .when(q != "", q)
        .when(b != "", b)
        .otherwise(q),  # empty quoted value ""
    )
    # fold entries LAST-WINS: map_from_arrays aborts the job on a
    # duplicate key (mapKeyDedupPolicy=EXCEPTION) — a dirty line with
    # {"a" => 1, "a" => 2} must yield a per-event value, not a crash
    entries = F.zip_with(keys, vals, lambda k, v: F.struct(k.alias("k"), v.alias("v")))
    folded = F.aggregate(
        entries,
        F.lit(None).cast("map<string,string>"),
        lambda acc, e: F.map_concat(
            F.map_filter(
                F.coalesce(acc, F.expr("map()").cast("map<string,string>")),
                lambda k, _: k != e["k"],
            ),
            F.create_map(e["k"], e["v"]),
        ),
    )
    return F.when(F.size(keys) > 0, folded).otherwise(
        F.lit(None).cast("map<string,string>")
    )


# -- encode_key_value (encode_key_value.rs) -----------------------------------


def encode_key_value(
    m: Column, field_delimiter: str = " ", key_value_delimiter: str = "="
) -> Column:
    """map → "k=v k2=v2" with keys sorted (deterministic field order;
    the reference sorts unless fields_ordering is given)."""
    entries = F.array_sort(F.map_entries(m))
    return F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(e["key"], F.lit(key_value_delimiter), e["value"]),
        ),
        field_delimiter,
    )


def parse_xml(col: Column, schema: str) -> Column:
    """parse_xml (lib/vrl/stdlib/src/parse_xml.rs) — XML → typed
    struct via Spark's built-in from_xml (JVM-side). The reference
    returns a dynamic map; fixed schemas are this engine's dialect, so
    the caller supplies the DDL (same contract as json_parser)."""
    return F.from_xml(col.cast("string"), schema)


# -- to_syslog_facility (to_syslog_facility.rs) -------------------------------

SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def to_syslog_facility(code: Column) -> Column:
    """facility code → keyword (reference vectors: 3→daemon, 11→ftp,
    23→local7). Out-of-range / non-numeric codes are per-event errors
    → null (the reference errors; an ANSI element_at would abort the
    job)."""
    arr = F.array(*[F.lit(x) for x in SYSLOG_FACILITIES])
    c = code.try_cast("int")
    return F.when(
        (c >= 0) & (c < len(SYSLOG_FACILITIES)), F.element_at(arr, c + 1)
    ).otherwise(F.lit(None))


# -- truncate with ellipsis (truncate.rs) -------------------------------------


def truncate(col: Column, limit: int, ellipsis: bool = False) -> Column:
    """Reference vectors: truncate("foobar", 3) == "foo";
    truncate("foobar", 4, ellipsis: true) == "foob..." (the ellipsis is
    APPENDED after the limit, not budgeted into it)."""
    cut = F.substring(col.cast("string"), 1, limit)
    if not ellipsis:
        return cut
    return F.when(F.length(col) > limit, F.concat(cut, F.lit("..."))).otherwise(cut)


# -- parse_tokens (parse_tokens.rs; lib/shared/src/tokenize.rs) ---------------


def parse_tokens(col: Column) -> Column:
    """Whitespace tokens respecting "quotes" and [brackets] →
    array<string>, '-' → null — the tokenizer transform's function
    form, sharing the operator's token machinery (one grammar, one
    place to fix)."""
    from vector_spark.operators.parsers import tokens_array

    return tokens_array(col.cast("string"))


# -- format_number (format_number.rs) -----------------------------------------


def format_number(
    col: Column,
    scale: int = 2,
    decimal_separator: str = ".",
    grouping_separator: str = ",",
) -> Column:
    """Reference vector: format_number(1234.567, scale: 2,
    decimal_separator: ",", grouping_separator: ".") == "1.234,56" —
    the scale TRUNCATES (not rounds), separators are configurable."""
    mult = float(10**scale)
    # truncation toward ZERO (floor would round -1.239 to -1.24);
    # try_cast: absurd magnitudes become null instead of aborting
    truncated = (col.cast("double") * mult).try_cast("long").cast("double") / mult
    base = F.format_number(truncated, scale)  # "1,234.56"
    if decimal_separator == "." and grouping_separator == ",":
        return base
    # rebuild from the integer/decimal halves: translate() would
    # corrupt output when a separator is empty (length mismatch
    # deletes the wrong char) or when the separators collide
    int_part = F.replace(
        F.substring_index(base, ".", 1), F.lit(","), F.lit(grouping_separator)
    )
    if scale <= 0:
        return int_part
    dec_part = F.substring_index(base, ".", -1)
    return F.concat(int_part, F.lit(decimal_separator), dec_part)
