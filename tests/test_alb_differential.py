"""Differential test: the quote-aware tokenization ALB parser must
agree field-for-field with the reference-shaped 28-group regex
(parse_aws_alb_log.rs semantics) across line variations — quoted
values with spaces, '-' null markers, missing optional error_reason,
trailing future fields, and unparseable garbage."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.functions.logformats import (
    _ALB_FIELDS,
    _ALB_FLOAT,
    _ALB_INT,
    _ALB_RE,
    parse_aws_alb_log,
)
from vector_spark.operators.parsers import regex_parser

BASE = (
    "{rtype} 2018-11-30T22:23:00.186641Z app/lb/1 192.168.131.39:2817 {target} "
    "0.000 {tpt} 0.000 200 {tsc} 34 {sent} "
    '"{method} http://example.com:80/path?q=1 HTTP/1.1" "{agent}" {cipher} - '
    'arn:aws:elasticloadbalancing:tg "Root=1-abc" "{domain}" "-" 0 '
    "2018-11-30T22:22:48.364000Z \"forward\" \"{redirect}\"{tail}"
)

LINES = [
    BASE.format(rtype="http", target="10.0.0.1:80", tpt="0.001", tsc="200",
                sent="366", method="GET", agent="curl/7.46.0", cipher="-",
                domain="www.example.com", redirect="-", tail=""),
    # '-' markers everywhere they are legal; no error_reason token
    BASE.format(rtype="https", target="-", tpt="-1", tsc="-", sent="0",
                method="POST", agent="Mozilla/5.0 (X11; Linux)", cipher="ECDHE-RSA-AES128",
                domain="-", redirect="https://ex.com/r", tail=""),
    # optional error_reason present
    BASE.format(rtype="h2", target="10.0.0.2:443", tpt="0.5", tsc="502",
                sent="12", method="PUT", agent="agent with spaces", cipher="-",
                domain="d.example", redirect="-", tail=' "LambdaInvalidResponse"'),
    # trailing future fields are ignored by both (.*$ / extra tokens)
    BASE.format(rtype="http", target="10.0.0.3:8080", tpt="0.002", tsc="301",
                sent="99", method="HEAD", agent="x", cipher="c1", domain="d2",
                redirect="-", tail=' "reason" "future1" future2'),
    # connection failed before a request was read: the request field is
    # the literal '"- - -"' and each component must map to null
    (
        "http 2018-11-30T22:23:00.186641Z app/lb/1 192.168.131.39:2817 - "
        "-1 -1 -1 503 - 0 0 "
        '"- - -" "-" - - '
        'arn:aws:elasticloadbalancing:tg "Root=1-abc" "-" "-" 0 '
        '2018-11-30T22:22:48.364000Z "forward" "-"'
    ),
    "completely unparseable garbage line",
    "",
]


def _regex_reference_parse(df):
    """The 28-group regex path + the original postprocess ('-' -> null,
    typed casts) — reference parity implementation kept for this
    differential check."""
    out = regex_parser(df, [_ALB_RE], field="message", drop_field=True)
    cols = {}
    for grp, name in _ALB_FIELDS.items():
        c = F.col(grp)
        c = F.when(c == "-", F.lit(None)).otherwise(c)
        if name in _ALB_INT:
            c = c.try_cast("long")
        elif name in _ALB_FLOAT:
            c = c.try_cast("double")
        cols[name] = c
    return out.withColumns(cols).drop(
        *[g for g in _ALB_FIELDS if g not in _ALB_FIELDS.values()]
    )


def test_tokenizer_matches_regex_reference(spark):
    df = spark.createDataFrame(
        [(i, line) for i, line in enumerate(LINES)], "id long, message string"
    )
    fields = sorted(set(_ALB_FIELDS.values()))
    new = {r.id: r for r in parse_aws_alb_log(df).select("id", *fields).collect()}
    ref = {r.id: r for r in _regex_reference_parse(df).select("id", *fields).collect()}
    for i in range(len(LINES)):
        for f in fields:
            got, want = new[i][f], ref[i][f]
            if f == "error_reason" and want == "":
                # non-participating optional group: the Rust reference
                # yields Option::None; the Spark sentinel-regex path
                # substitutes "" — the tokenizer's null is the closer
                # parity, so "" normalizes to null here
                want = None
            assert got == want, (
                f"line {i} field {f}: tokenizer={got!r} regex={want!r}"
            )
