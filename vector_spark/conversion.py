"""Type-coercion ``types = {field: spec}`` maps.

Reference: src/types.rs → lib/shared/src/conversion.rs:22-28 — specs
``bool | int | float | string | timestamp | timestamp|%FMT``. Vector
parses per event; here each spec is one ``cast``/``to_timestamp``
Column expr. Boolean coercion follows Conversion::Boolean semantics
(the strings "true"/"t"/"yes"/"1"→true, "false"/"f"/"no"/"0"→false,
conversion.rs parse_bool).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_STRFTIME_TO_SPARK = [
    # chrono %+ = RFC3339 (ISO 8601 with numeric offset)
    ("%+", "yyyy-MM-dd'T'HH:mm:ssXXX"),
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%z", "Z"),
    ("%:z", "XXX"),
    ("%F", "yyyy-MM-dd"),
    ("%T", "HH:mm:ss"),
    ("%f", "SSSSSS"),
    ("%b", "MMM"),
    ("%a", "EEE"),
    ("%e", "d"),
]


def strftime_to_spark(fmt: str) -> str:
    for k, v in _STRFTIME_TO_SPARK:
        fmt = fmt.replace(k, v)
    return fmt


_TRUE = ("true", "t", "yes", "y", "1")
_FALSE = ("false", "f", "no", "n", "0")


def coerce(col: Column, spec: str) -> Column:
    """All coercions are try_* / null-on-failure: Vector's Conversion
    yields a per-event error for a malformed value (conversion.rs) —
    under Spark ANSI mode a plain cast would abort the whole job on
    one bad row, the worst possible behavior at scale."""
    spec = spec.strip()
    if spec in ("string", "str"):
        return col.cast("string")
    if spec == "int":
        # Conversion::Integer (conversion.rs:121-126) does a strict i64
        # parse first; only strings that fail it (float-looking input)
        # fall back through a double parse with truncation. Long-first
        # keeps 18-digit integer ids exact — a double round-trip would
        # silently corrupt values above 2^53.
        return F.coalesce(
            col.try_cast("long"), col.try_cast("double").try_cast("long")
        )
    if spec == "float":
        return col.try_cast("double")
    if spec in ("bool", "boolean"):
        s = F.lower(F.trim(col.cast("string")))
        return (
            F.when(s.isin(*_TRUE), F.lit(True))
            .when(s.isin(*_FALSE), F.lit(False))
            .otherwise(F.lit(None).cast("boolean"))
        )
    m = re.match(r"timestamp(?:\|(?P<fmt>.+))?$", spec)
    if m:
        fmt = m.group("fmt")
        if fmt:
            return F.try_to_timestamp(col.cast("string"), F.lit(strftime_to_spark(fmt)))
        return F.try_to_timestamp(col.cast("string"))
    raise ValueError(f"unknown coercion spec {spec!r}")


def apply_types(df, types: dict[str, str]):
    """Apply a coercion map to existing columns (coercer transform core,
    src/transforms/coercer.rs:15-100)."""
    return df.withColumns({field: coerce(F.col(field), spec) for field, spec in types.items()})
