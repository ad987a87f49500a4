"""Parser Function transforms: regex, json, key-value, logfmt,
tokenizer, split.

References: src/transforms/regex_parser.rs:22-300,
json_parser.rs:13-130, key_value_parser.rs:16-200,
logfmt_parser.rs:15-120, tokenizer.rs:16-120 (+
lib/shared/src/tokenize.rs:11), split.rs:16-160.

All are pure Column-expression plans (regexp_extract / from_json /
map_from_arrays) — the reference compiles a regex once per process and
interprets per event; whole-stage codegen gives us the vectorized
version of the same thing. No Python in the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.conversion import coerce

_NAMED_GROUP_RE = re.compile(r"\(\?P?<(?P<name>[A-Za-z][A-Za-z0-9_]*)>")

# joins capture groups in the single-pass extraction rewrite; two
# control chars that never appear in textual log lines — and rows that
# DO contain them fall back to per-group extraction (see regex_parser)
_EXTRACT_SENTINEL = "\x00\x1e"


def named_groups(pattern: str) -> list[str]:
    """Named capture groups in order of appearance."""
    return _NAMED_GROUP_RE.findall(pattern)


def to_java_regex(pattern: str) -> str:
    """Python/Rust ``(?P<name>...)`` → Java named groups.

    Java group names allow only [A-Za-z0-9] — and extraction uses
    group INDICES, so the in-pattern names are just placeholders:
    rewrite each to a sanitized unique name."""
    counter = [0]

    def sub(m: re.Match) -> str:
        counter[0] += 1
        return f"(?<g{counter[0]}x>"

    return _NAMED_GROUP_RE.sub(sub, pattern)


def _group_count(pattern: str) -> int:
    """Total capture-group count (named + unnamed), via Python's own
    regex compiler when the pattern is Python-compatible; otherwise the
    same char-scanner rules as ``_group_index``."""
    normalized = re.sub(r"\(\?<([A-Za-z])", r"(?P<\1", pattern)
    try:
        return re.compile(normalized).groups
    except re.error:
        pass
    i, count, in_class = 0, 0, False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            in_class = ch != "]"
            i += 1
            continue
        if ch == "[":
            in_class = True
            i += 1
            continue
        if ch == "(":
            if re.match(r"\(\?P?<[A-Za-z]", pattern[i:]) or not (
                i + 1 < len(pattern) and pattern[i + 1] == "?"
            ):
                count += 1
        i += 1
    return count


def _group_index(pattern: str, name: str) -> int:
    """1-based index of a named group among ALL capture groups.

    Authoritative source: Python's own regex compiler (``groupindex``)
    — a hand scan miscounts escaped ``\\(`` literals and non-capturing
    ``(?<=`` / ``(?<!`` / ``(?i)`` / ``(?>`` constructs, shifting every
    index after them. Java-style ``(?<name>`` is normalized to
    ``(?P<name>`` first; a char-scanner fallback covers Java-only
    syntax Python cannot compile (possessive quantifiers, ``(?>``)."""
    normalized = re.sub(r"\(\?<([A-Za-z])", r"(?P<\1", pattern)
    try:
        compiled = re.compile(normalized)
    except re.error:
        compiled = None
    if compiled is not None:
        idx = compiled.groupindex.get(name)
        if idx is None:
            raise ValueError(f"group {name!r} not in pattern")
        return idx
    # fallback scanner: skip escapes and char classes; '(' opens a
    # capture group iff not followed by '?', except '(?P<name>'
    i, idx, in_class = 0, 0, False
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            in_class = ch != "]"
            i += 1
            continue
        if ch == "[":
            in_class = True
            i += 1
            continue
        if ch == "(":
            m = re.match(r"\(\?P?<(?P<nm>[A-Za-z][A-Za-z0-9_]*)>", pattern[i:])
            if m:
                idx += 1
                if m.group("nm") == name:
                    return idx
                i += m.end()
                continue
            if not (i + 1 < len(pattern) and pattern[i + 1] == "?"):
                idx += 1
        i += 1
    raise ValueError(f"group {name!r} not in pattern")


def regex_parser(
    df: DataFrame,
    patterns: list[str] | str,
    field: str = "message",
    types: dict[str, str] | None = None,
    target_field: str | None = None,
    drop_field: bool = True,
    drop_failed: bool = False,
) -> DataFrame:
    """Multi-pattern first-match named-capture extraction
    (regex_parser.rs:105-135 captures, :242-300 transform).

    The reference pre-filters with a RegexSet then runs the first
    matching pattern's captures — ONE regex execution per event
    (regex_parser.rs:242-260). The naive Spark translation
    (``regexp_extract(src, pat, i)`` per field) re-runs the full match
    k times for a k-group pattern, because Catalyst CSE does not merge
    extracts with different group indices — ~28× the necessary parse
    CPU on an AWS ALB line. Instead each pattern is executed ONCE per
    row: ``regexp_replace`` rewrites the whole line to its capture
    groups joined by a control-char sentinel, ``split`` recovers the
    group array, and every field is an O(1) array index. The group
    array (and the first-match index) are materialized as intermediate
    projected columns: codegen's subexpression elimination skips
    conditionally-evaluated (when-branch) trees, and CollapseProject
    deliberately keeps a projection whose non-cheap outputs are
    referenced more than once (SPARK-36718), so each pattern executes
    exactly once per row. Rows that contain the sentinel bytes
    themselves (pathological input) fall back per-row to classic
    per-group extracts. Unmatched rows keep null fields (or are
    dropped with ``drop_failed``).
    """
    if isinstance(patterns, str):
        patterns = [patterns]
    types = types or {}
    src = F.col(field).cast("string")
    all_fields: list[str] = []
    for p in patterns:
        for g in named_groups(p):
            if g not in all_fields:
                all_fields.append(g)

    sentinel_free = ~src.contains(_EXTRACT_SENTINEL)
    used = sorted(
        {i for i, p in enumerate(patterns) for g in named_groups(p) if g in all_fields}
    )

    def _split_expr(i: int) -> Column:
        # the anchored wrap consumes the whole line, the lazy (?s:.*?)
        # prefix reproduces find()'s leftmost-match position, and the
        # replacement emits every capture group sentinel-joined. A
        # non-participating group substitutes "" in both engines
        # (Matcher.appendReplacement and RegExpExtract agree), so fast
        # and fallback paths match. The any-char runs are SCOPED-DOTALL
        # dots, not [\s\S]: Java's engine compiles (?s:.*) to its
        # optimized all-chars loop but treats the char-class union
        # [\s\S]* as a generic Curly node with per-char state — measured
        # 0.1 s vs 16 s over 1 M rows when the tail is non-empty (a
        # pattern matching a mid-line span). (?s:) is scoped so a DATA /
        # GREEDYDATA dot inside the user pattern keeps its
        # no-newline semantics; the matched language is identical.
        jp = to_java_regex(patterns[i])
        n = _group_count(patterns[i])
        repl = _EXTRACT_SENTINEL.join(f"${g}" for g in range(1, n + 1))
        wrapped = r"\A(?s:.*?)(?:" + jp + r")(?s:.*)\z"
        return F.split(F.regexp_replace(src, wrapped, repl), _EXTRACT_SENTINEL, -1)

    def _uniq(name: str) -> str:
        while name in df.columns:
            name += "_"
        return name

    fidx_name = _uniq("_vs_rx_fidx")
    fidx = F.col(fidx_name)
    arr_names: dict[int, str] = {i: _uniq(f"_vs_rx_g{i}") for i in used}

    if len(patterns) == 1 and used and _group_count(patterns[0]) >= 2:
        # single-pattern fast path — ONE regex execution per row total:
        # the group array is computed unconditionally and match status
        # is read off its size (a fired replace yields exactly G
        # elements; an unmatched sentinel-free line has no sentinel →
        # size 1 ≠ G). rlike runs only for sentinel-carrying rows.
        g_count = _group_count(patterns[0])
        jp0 = to_java_regex(patterns[0])
        out = df.withColumn(arr_names[0], F.when(sentinel_free, _split_expr(0)))
        out = out.withColumn(
            fidx_name,
            F.when(F.size(F.col(arr_names[0])) == g_count, 0).when(
                (~sentinel_free) & src.rlike(jp0), 0
            ),
        )
    else:
        # FIRST-MATCH index (regex_parser.rs:242-260 RegexSet
        # semantics): only the first matching pattern's captures apply
        # — a field that exists solely in a later pattern stays null
        # even if that later pattern also matches the line.
        # Materialized as a projected column so every rlike runs once
        # per row (later patterns' rlikes sit in lazily-evaluated
        # when-branches, which codegen CSE skips); the CaseWhen stops
        # at the first matching pattern, like the reference RegexSet.
        first_idx: Column | None = None
        for i, p in enumerate(patterns):
            cond = src.rlike(to_java_regex(p))
            first_idx = (
                F.when(cond, i) if first_idx is None else first_idx.when(cond, i)
            )
        assert first_idx is not None
        out = df.withColumn(fidx_name, first_idx)
        # group arrays computed only for rows the pattern won
        out = out.withColumns(
            {
                arr_names[i]: F.when(sentinel_free & (fidx == i), _split_expr(i))
                for i in used
            }
        )

    cols = {}
    for name in all_fields:
        expr: Column | None = None
        for i, p in enumerate(patterns):
            if name not in named_groups(p):
                continue
            jp = to_java_regex(p)
            gidx = _group_index(p, name)
            arr = F.col(arr_names[i])
            extracted = F.when(arr.isNotNull(), arr.getItem(gidx - 1)).otherwise(
                # sentinel-containing row (arr null but pattern won)
                F.regexp_extract(src, jp, gidx)
            )
            cond = fidx == i
            expr = (
                F.when(cond, extracted) if expr is None else expr.when(cond, extracted)
            )
        assert expr is not None
        expr = expr.otherwise(F.lit(None))
        if name in types:
            expr = coerce(expr, types[name])
        out_name = f"{target_field}.{name}" if target_field else name
        cols[out_name] = expr
    out = out.withColumns(cols)
    if drop_failed:
        out = out.filter(fidx.isNotNull())
    out = out.drop(fidx_name, *arr_names.values())
    if drop_field and field not in cols:
        out = out.drop(field)
    return out


def json_parser(
    df: DataFrame,
    field: str = "message",
    schema: str | None = None,
    target_field: str | None = None,
    drop_invalid: bool = False,
    drop_field: bool = True,
    overwrite_target: bool = True,
) -> DataFrame:
    """Parse ``field`` as a JSON object (json_parser.rs:13-130).

    With ``schema`` (DDL string) → typed struct via ``from_json``;
    without → ``map<string,string>`` (Vector's dynamic shape). Root
    merge (``select parsed.*``) only with an explicit schema;
    map results land under ``target_field`` (default ``parsed``).
    """
    src = F.col(field).cast("string")
    if schema == "infer":
        # config convenience: bounded-sample schema inference at
        # compile time, then one typed pass (see infer_json_schema)
        schema = infer_json_schema(df, field)
    if schema:
        parsed = F.from_json(src, schema)
    else:
        parsed = F.from_json(src, "map<string,string>")
    tgt = target_field or ("" if schema else "parsed")
    out = df.withColumn("_vs_parsed", parsed)
    if drop_invalid:
        # PERMISSIVE struct parse yields an all-null struct for bad
        # JSON; a map-typed probe returns null exactly on malformed
        # input — use it as the validity predicate.
        out = out.filter(F.from_json(src, "map<string,string>").isNotNull())
    if schema and not target_field:
        # merge parsed keys into root
        keep = [c for c in out.columns if c != "_vs_parsed"]
        parsed_fields = out.select("_vs_parsed.*").columns
        if not overwrite_target:
            keep_set = set(keep)
            parsed_fields = [c for c in parsed_fields if c not in keep_set]
        else:
            keep = [c for c in keep if c not in set(parsed_fields)]
        out = out.select(*keep, *[F.col(f"_vs_parsed.{c}").alias(c) for c in parsed_fields])
    else:
        out = out.withColumnRenamed("_vs_parsed", tgt)
    if drop_field and field in out.columns:
        out = out.drop(field)
    return out


_KV_PAIR_TMPL = r'(%s)%s("(?:[^"\\]|\\.)*"|[^%s\s"]+)'


def _kv_map(src: Column, field_split: str, strip_quotes: bool = False) -> Column:
    """Quoted-value-aware k=v extraction for WHITESPACE pair separation
    → map<string,string>, JVM-side via regexp_extract_all +
    map_from_arrays (quoted values may contain spaces)."""
    key_pat = rf"[^\s{re.escape(field_split)}]+"
    pair = _KV_PAIR_TMPL % (key_pat, re.escape(field_split), re.escape(field_split))
    keys = F.regexp_extract_all(src, F.lit(pair), F.lit(1))
    vals = F.regexp_extract_all(src, F.lit(pair), F.lit(2))
    if strip_quotes:
        vals = F.transform(vals, lambda v: F.regexp_replace(v, r'^"|"$', ""))
    return F.map_from_arrays(keys, vals)


def _kv_map_separator(
    src: Column, field_split: str, separator: str, strip_quotes: bool = False
) -> Column:
    """k=v extraction for an arbitrary literal pair ``separator``
    (key_value_parser.rs:16-60 supports any separator string): split
    into segments, split each segment on the FIRST field_split,
    whitespace-trim both sides. All array-lambda expressions — stays
    in codegen, no UDF."""
    fs = re.escape(field_split)
    # split each segment on the FIRST literal occurrence of the FULL
    # field_split string — a character class ([^{fs}]) would mis-split
    # multi-char field_splits (key_value_parser.rs supports e.g. ':='),
    # matching any single one of their characters instead
    seg_pat = rf"(?s)^\s*(.*?)\s*{fs}\s*(.*?)\s*$"
    segs = F.split(src, re.escape(separator))
    pairs = F.transform(
        segs,
        lambda s: F.struct(
            F.regexp_extract(s, seg_pat, 1).alias("k"),
            F.regexp_extract(s, seg_pat, 2).alias("v"),
        ),
    )
    pairs = F.filter(pairs, lambda p: p["k"] != "")
    if strip_quotes:
        pairs = F.transform(
            pairs,
            lambda p: F.struct(
                p["k"].alias("k"),
                F.regexp_replace(p["v"], r'^"|"$', "").alias("v"),
            ),
        )
    # map_from_entries: ONE pass over the pairs array — separate
    # keys/vals projections would re-evaluate the whole
    # split+regex pipeline once per projection
    return F.map_from_entries(pairs)


def key_value_parser(
    df: DataFrame,
    field: str = "message",
    field_split: str = "=",
    separator: str = " ",
    types: dict[str, str] | None = None,
    fields: list[str] | None = None,
    target_field: str | None = None,
    drop_field: bool = True,
    trim_key: str | None = None,
    trim_value: str | None = None,
    strip_quotes: bool = False,
) -> DataFrame:
    """Split into k/v pairs (key_value_parser.rs:16-200). ``fields``
    materializes listed keys as typed columns (fixed-schema stage);
    otherwise the map lands at ``target_field``/``kv``.

    Reference parity: quotes are PART of the value unless trimmed via
    ``trim_value`` (tests/behavior key_value_parser.toml defaults
    case); ``strip_quotes=True`` is the logfmt-style convenience used
    by logfmt_parser."""
    src = F.col(field).cast("string")
    if separator.strip() == "":
        m = _kv_map(src, field_split, strip_quotes=strip_quotes)
    else:
        m = _kv_map_separator(src, field_split, separator, strip_quotes=strip_quotes)
    if trim_key:
        m = F.map_from_arrays(
            F.transform(F.map_keys(m), lambda k: F.btrim(k, F.lit(trim_key))),
            F.map_values(m),
        )
    if trim_value:
        m = F.map_from_arrays(
            F.map_keys(m),
            F.transform(F.map_values(m), lambda v: F.btrim(v, F.lit(trim_value))),
        )
    return _materialize_map(df, m, fields, types, target_field or "kv", field, drop_field)


def logfmt_parser(
    df: DataFrame,
    field: str = "message",
    types: dict[str, str] | None = None,
    fields: list[str] | None = None,
    target_field: str | None = None,
    drop_field: bool = True,
) -> DataFrame:
    """logfmt = key=value with double-quoted values
    (logfmt_parser.rs:15-120)."""
    return key_value_parser(
        df,
        field=field,
        field_split="=",
        types=types,
        fields=fields,
        target_field=target_field or "logfmt",
        drop_field=drop_field,
        strip_quotes=True,  # logfmt quoting: quotes delimit, not belong
    )


def _materialize_map(df, map_col, fields, types, map_name, src_field, drop_field):
    types = types or {}
    if fields:
        cols = {}
        for name in fields:
            c = F.element_at(map_col, name)
            if name in types:
                c = coerce(c, types[name])
            cols[name] = c
        out = df.withColumns(cols)
    else:
        out = df.withColumn(map_name, map_col)
    if drop_field and src_field in out.columns and (not fields or src_field not in fields):
        out = out.drop(src_field)
    return out


# token = "quoted" | [bracketed] | bare-nonspace (lib/shared/src/tokenize.rs:11)
_TOKEN_PATTERN = r'"(?:[^"\\]|\\.)*"|\[[^\]]*\]|\S+'


def tokens_array(src: Column) -> Column:
    """Tokenize into array<string>: ``-`` → null; delimiters stripped
    only from tokens that BOTH start and end with a matching pair — a
    bare token like ``5"`` or ``[partial`` keeps its characters (they
    were never delimiters)."""
    toks = F.regexp_extract_all(src, F.lit(_TOKEN_PATTERN), F.lit(0))
    return F.transform(
        toks,
        lambda t: F.when(t == "-", F.lit(None)).otherwise(
            F.regexp_replace(t, r'^"(.*)"$|^\[(.*)\]$', "$1$2")
        ),
    )


def tokenizer(
    df: DataFrame,
    field_names: list[str],
    field: str = "message",
    types: dict[str, str] | None = None,
    drop_field: bool = True,
) -> DataFrame:
    """Whitespace tokenize respecting quotes/brackets
    (tokenizer.rs:16-120); positional assignment to ``field_names``;
    ``-`` → null; strips matching quote/bracket delimiter pairs."""
    types = types or {}
    toks = tokens_array(F.col(field).cast("string"))
    cols = {}
    for i, name in enumerate(field_names):
        c = F.element_at(toks, i + 1)
        if name in types:
            c = coerce(c, types[name])
        cols[name] = c
    out = df.withColumns(cols)
    if drop_field and field not in field_names:
        out = out.drop(field)
    return out


def split_fields(
    df: DataFrame,
    field_names: list[str],
    field: str = "message",
    separator: str | None = None,
    types: dict[str, str] | None = None,
    drop_field: bool = True,
) -> DataFrame:
    """Split on a literal separator (default: whitespace runs) and
    assign positionally (split.rs:16-160)."""
    types = types or {}
    src = F.col(field).cast("string")
    if separator is None:
        parts = F.split(F.trim(src), r"\s+")
    else:
        parts = F.split(src, re.escape(separator))
    cols = {}
    for i, name in enumerate(field_names):
        c = F.element_at(parts, i + 1)
        if name in types:
            c = coerce(c, types[name])
        cols[name] = c
    out = df.withColumns(cols)
    if drop_field and field not in field_names:
        out = out.drop(field)
    return out


def json_array_parser(
    df: DataFrame,
    field: str = "message",
    element_schema: str = "message string",
    drop_field: bool = True,
) -> DataFrame:
    """1→N subscription-style parse: the field holds a JSON ARRAY of
    records; each element becomes one output event with the parent's
    other columns carried along.

    Reference: aws_cloudwatch_logs_subscription_parser.rs:19-120 (one
    event per contained log record) — from_json + explode."""
    parsed = F.from_json(F.col(field).cast("string"), f"array<struct<{element_schema}>>")
    out = df.withColumn("_vs_rec", F.explode(parsed))
    rec_fields = out.select("_vs_rec.*").columns
    keep = [c for c in out.columns if c not in ("_vs_rec",) and c not in rec_fields]
    out = out.select(*keep, *[F.col(f"_vs_rec.{c}").alias(c) for c in rec_fields])
    if drop_field and field in out.columns and field not in rec_fields:
        out = out.drop(field)
    return out


def infer_json_schema(df: DataFrame, field: str = "message", samples: int = 200):
    """Schema inference for Vector's schemaless JSON events: merge the
    schemas of up to ``samples`` documents (spark.read.json schema
    union — fields missing in some docs become nullable). The sample
    is BOUNDED; the inferred StructType then drives json_parser's
    typed from_json over the full table, so the 100 TB scan stays a
    single typed pass with no per-row inference."""
    if df.isStreaming:
        # inference runs a sample JOB — impossible on a streaming frame
        raise ValueError(
            "infer_json_schema needs a batch frame (inference runs a "
            "sample job); pass an explicit schema for streaming"
        )
    sample = (
        df.select(F.col(field).cast("string").alias("j"))
        .filter(F.col("j").isNotNull())
        .limit(samples)
    )
    spark = df.sparkSession
    # DROPMALFORMED: malformed documents are excluded from inference
    # itself, so no synthetic corrupt-record column is ever created
    # (robust to spark.sql.columnNameOfCorruptRecord and to data that
    # legitimately contains a "_corrupt_record" key) and the output
    # schema is deterministic regardless of which rows the sample hit
    inferred = (
        spark.read.option("mode", "DROPMALFORMED")
        .json(sample.rdd.map(lambda r: r.j))
        .schema
    )
    if not inferred.fields:
        raise ValueError(
            f"JSON schema inference found no parseable documents in the "
            f"first {samples} sampled rows of {field!r} — pass an "
            "explicit schema"
        )
    return inferred
