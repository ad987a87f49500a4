"""Field-shaping Function transforms (stateless 1→1).

Reference files: src/transforms/add_fields.rs:104, remove_fields.rs:63,
rename_fields.rs:67, concat.rs:136, ansi_stripper.rs:56,
coercer.rs:15-100. All compile to projection exprs — Catalyst prunes
any column a downstream stage doesn't read.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.conversion import apply_types
from vector_spark.templates import compile_template, is_template


_ARRAY_PATH_RE = re.compile(r"^(?P<name>.+)\[(?P<idx>\d+)\]$")


def add_fields(df: DataFrame, fields: dict[str, Any], overwrite: bool = True) -> DataFrame:
    """Insert literal or ``{{templated}}`` values (add_fields.rs:104).

    ``overwrite=False`` keeps an existing non-null value (the reference
    skips insertion if the path exists).

    Array-index paths ``"a[0]"`` assemble one array column per base
    name (behavior corpus add_fields.toml add_fields_array). Dialect:
    the reference's event arrays are heterogeneous ([0, "1", 2.0]);
    a fixed-schema column is not, so elements render as strings. Gaps
    below the max index are null, like the reference's null-padded
    array insertion."""
    # nested paths: TOML `x.y = 456`, quoted `"x.z" = 789`, and YAML
    # `x: {y: 456}` are all the same nested field (the reference's
    # tests/behavior/formats corpus pins the spellings) — dotted keys
    # and dict values unify into one nested tree per root, emitted as
    # a struct column so `.x.y` conditions resolve natively
    flat: dict[str, Any] = {}

    def _deep_set(d: dict, parts: list[str], v: Any) -> None:
        if len(parts) == 1:
            if isinstance(v, dict) and isinstance(d.get(parts[0]), dict):
                for k, sub in v.items():
                    _deep_set(d[parts[0]], [k], sub)
            else:
                d[parts[0]] = v
            return
        nxt = d.setdefault(parts[0], {})
        if not isinstance(nxt, dict):
            nxt = d[parts[0]] = {}
        _deep_set(nxt, parts[1:], v)

    nested: dict[str, Any] = {}
    for name, value in fields.items():
        if _ARRAY_PATH_RE.match(name) or "." not in name:
            flat[name] = value
        else:
            _deep_set(nested, name.split("."), value)
    for name, value in flat.items():
        if isinstance(value, dict):
            _deep_set(nested, [name], value)
    for name in nested:
        flat.pop(name, None)

    def _struct_lit(v: Any):
        if isinstance(v, dict):
            return F.struct(*[_struct_lit(x).alias(k) for k, x in v.items()])
        if isinstance(v, str) and is_template(v):
            return compile_template(v)
        return F.lit(v)

    from pyspark.sql.types import StructType

    def _merge_struct(parts: tuple[str, ...], dt: StructType, tree: dict):
        """Rebuild the struct at column path ``parts`` with ``tree``
        inserted leaf-by-leaf: existing sibling fields pass through
        untouched (the reference inserts at the path —
        add_fields.rs:104 — it never replaces the whole object).
        ``overwrite=False`` keeps an existing non-null leaf; a dict
        landing on a non-struct leaf replaces it (path-insert
        semantics: the parent is coerced to an object)."""
        out = []
        for f in dt.fields:
            if f.name not in tree:
                out.append(F.col(".".join(parts + (f.name,))).alias(f.name))
                continue
            v = tree[f.name]
            sub = parts + (f.name,)
            if isinstance(v, dict) and isinstance(f.dataType, StructType):
                out.append(_merge_struct(sub, f.dataType, v).alias(f.name))
            elif isinstance(v, dict):
                out.append(_struct_lit(v).alias(f.name))
            elif not overwrite and isinstance(f.dataType, StructType):
                # scalar onto an existing struct with keep-existing:
                # the path exists (as an object) — skip the insert
                out.append(F.col(".".join(sub)).alias(f.name))
            elif not overwrite:
                out.append(
                    F.coalesce(F.col(".".join(sub)), _struct_lit(v)).alias(f.name)
                )
            else:
                out.append(_struct_lit(v).alias(f.name))
        for k, v in tree.items():
            if k not in dt.fieldNames():
                out.append(_struct_lit(v).alias(k))
        return F.struct(*out)

    schema_by_name = {f.name: f.dataType for f in df.schema.fields}

    cols = {}
    arrays: dict[str, dict[int, Any]] = {}
    for name, value in nested.items():
        existing = schema_by_name.get(name)
        if isinstance(existing, StructType) and isinstance(value, dict):
            cols[name] = _merge_struct((name,), existing, value)
        else:
            cols[name] = _struct_lit(value)
    for name, value in flat.items():
        m = _ARRAY_PATH_RE.match(name)
        if m:
            arrays.setdefault(m.group("name"), {})[int(m.group("idx"))] = value
            continue
        if isinstance(value, str) and is_template(value):
            col = compile_template(value)
        else:
            col = F.lit(value)
        if not overwrite and name in df.columns:
            col = F.coalesce(F.col(name), col)
        cols[name] = col
    for name, elems in arrays.items():
        items = [
            (
                (
                    compile_template(elems[i])
                    if isinstance(elems[i], str) and is_template(elems[i])
                    else F.lit(str(elems[i]))
                )
                if i in elems
                else F.lit(None)
            ).cast("string")
            for i in range(max(elems) + 1)
        ]
        col = F.array(*items)
        if not overwrite and name in df.columns:
            col = F.coalesce(F.col(name), col)
        cols[name] = col
    return df.withColumns(cols)


def remove_fields(df: DataFrame, fields: list[str], drop_empty: bool = False) -> DataFrame:
    """Drop columns (remove_fields.rs:63). ``drop_empty`` (map-pruning
    in the reference) is a no-op on fixed schemas — columns vanish
    entirely."""
    return df.drop(*[f for f in fields if f in df.columns])


def rename_fields(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """old → new column name (rename_fields.rs:67). A rename onto an
    existing column REPLACES it (behavior corpus rename_fields.toml:
    'Replaced if conflict')."""
    for old, new in fields.items():
        if old not in df.columns:
            continue
        if new in df.columns:
            df = df.drop(new)
        df = df.withColumnRenamed(old, new)
    return df


def concat_fields(
    df: DataFrame, target: str, items: list[str], joiner: str = " "
) -> DataFrame:
    """``concat`` transform (concat.rs:69-136): each item is
    ``field[start..end]`` (byte-slice in the reference; char-slice
    here), joined with ``joiner`` into ``target``."""
    item_re = re.compile(r"^(?P<field>[^\[\]]+)(?:\[(?P<s>-?\d*)\.\.(?P<e>-?\d*)\])?$")
    cols = []
    for item in items:
        m = item_re.match(item.strip())
        if not m:
            raise ValueError(f"bad concat item {item!r}")
        col = F.col(m.group("field")).cast("string")
        s, e = m.group("s"), m.group("e")
        if s or e:
            start = int(s) if s else 0
            end = int(e) if e else None
            if start < 0:
                # negative start indexes from the end (concat.rs range
                # grammar, e.g. "second[-2..]" = last two chars)
                if end is not None:
                    raise ValueError(f"negative start with end not supported: {item!r}")
                col = F.substring(col, start, 2_000_000_000)
            elif end is None:
                col = F.substring(col, start + 1, 2_000_000_000)
            elif end < 0:
                # negative end counts from the end: [0..-1] = all but
                # the last char (length is dynamic per row)
                col = F.substring(col, start + 1, F.length(col) + end - start)
            else:
                col = F.substring(col, start + 1, end - start)
        cols.append(col)
    return df.withColumn(target, F.concat_ws(joiner, *cols))


#: CSI / OSC / single-char escapes, plus bare \r: the reference's
#: `strip-ansi-escapes` crate feeds bytes through a vte terminal parser
#: which consumes carriage returns as execute bytes — behavior test
#: tests/behavior/transforms/ansi_stripper.toml pins "hello\r123" →
#: "hello123".
_ANSI_RE = r"\x1b\[[0-9;]*[A-Za-z]|\x1b\][^\x07]*\x07|\x1b[@-Z\\-_]|\r"


def ansi_stripper(df: DataFrame, field: str = "message") -> DataFrame:
    """Strip ANSI escape sequences (ansi_stripper.rs:56; the reference
    uses the `strip-ansi-escapes` crate — CSI/OSC/single-char escapes)."""
    return df.withColumn(field, F.regexp_replace(F.col(field), _ANSI_RE, ""))


def coercer(
    df: DataFrame, types: dict[str, str], drop_unspecified: bool = False
) -> DataFrame:
    """Cast listed fields (coercer.rs:15-100); ``drop_unspecified``
    keeps only listed columns → explicit column pruning."""
    out = apply_types(df, types)
    if drop_unspecified:
        out = out.select(*types.keys())
    return out
