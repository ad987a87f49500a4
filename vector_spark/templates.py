"""Vector template strings ``"{{field}}-literal"`` → Column exprs.

Reference: src/template.rs:24-120 — templates are pre-parsed into
field refs + literal chunks at config time; unresolvable fields render
an error. Here: compiled once at plan time into ``concat`` of
literals and column refs — Catalyst constant-folds adjacent literals.
A strftime-style ``%F``/``%Y`` chunk is also supported (src/template.rs
timestamp templates) against a ``timestamp`` column via date_format.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_FIELD_RE = re.compile(r"\{\{\s*(?P<name>[^}\s]+)\s*\}\}")
_STRFTIME_RE = re.compile(r"%[a-zA-Z]")

_STRFTIME_TO_SPARK = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%F": "yyyy-MM-dd",
    "%T": "HH:mm:ss",
}


def is_template(s: str) -> bool:
    return bool(_FIELD_RE.search(s) or _STRFTIME_RE.search(s))


def template_fields(s: str) -> list[str]:
    return _FIELD_RE.findall(s)


def compile_template(s: str, timestamp_key: str = "timestamp") -> Column:
    """Render a template to a string Column. Null field → null result
    (caller decides drop/error semantics, mirroring template render
    errors in the reference)."""
    parts: list[Column] = []
    pos = 0
    for m in _FIELD_RE.finditer(s):
        if m.start() > pos:
            parts.append(_literal_chunk(s[pos : m.start()], timestamp_key))
        parts.append(F.col(m.group("name")).cast("string"))
        pos = m.end()
    if pos < len(s):
        parts.append(_literal_chunk(s[pos:], timestamp_key))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)


def _literal_chunk(chunk: str, timestamp_key: str) -> Column:
    if not _STRFTIME_RE.search(chunk):
        return F.lit(chunk)
    # translate strftime directives against the timestamp column
    fmt = chunk
    for k, v in _STRFTIME_TO_SPARK.items():
        fmt = fmt.replace(k, v)
    return F.date_format(F.col(timestamp_key), fmt)
