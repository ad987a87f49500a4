"""Metric operators: log_to_metric, aggregate, add/remove_tags,
tag_cardinality_limit, metric_to_log.

References: src/transforms/log_to_metric.rs:20-400,
aggregate.rs:18-130, add_tags.rs:68, remove_tags.rs:55,
tag_cardinality_limit.rs:25-300, metric_to_log.rs:17-180; metric data
model lib/vector-core/src/event/metric.rs:17-167.

Metrics frame schema (SURVEY.md §1.5 mapping of Metric):
``name string, namespace string, tags map<string,string>,
ts timestamp, kind string ('incremental'|'absolute'),
metric_type string ('counter'|'gauge'|'set'|'distribution'|
'histogram'|'summary'), value double, set_value string,
rate long``. ``rate`` mirrors Distribution's per-sample observation
weight (metric.rs:147-150 ``Sample{value, rate}``): log_to_metric
emits 1 (samples![value => 1], log_to_metric.rs:273), merged/
pre-aggregated distributions carry real weights, and the weighted
rollup is ``distribution_statistic`` (statistic.rs).

log_to_metric emits ONE metric row per (event, metric-config) — a
cheap narrow projection + union, no shuffle (faithful to the
reference's Function transform). ``aggregate_metrics`` is the Task
rollup (groupBy series + tumbling window) — that is where the single
shuffle happens, with map-side partial aggregation.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.templates import compile_template, is_template

TIMESTAMP_KEY = "timestamp"  # log_schema.rs:47-56 default


def _tmpl(value: str) -> Column:
    return compile_template(value) if is_template(value) else F.lit(value)


def _tags_col(tags: dict[str, str] | None) -> Column:
    """Render a tag-template map; tags whose template references a
    missing/null field are DROPPED (log_to_metric.rs:210-230 render
    error → skip tag). Built in sorted key order (BTreeMap parity)."""
    if not tags:
        return F.lit(None).cast("map<string,string>")
    entries = [
        F.when(
            _tmpl(v).isNotNull(), F.struct(F.lit(k).alias("key"), _tmpl(v).alias("value"))
        )
        for k, v in sorted(tags.items())
    ]
    return F.map_from_entries(F.filter(F.array(*entries), lambda e: e.isNotNull()))


def log_to_metric(
    df: DataFrame,
    metrics: list[dict[str, Any]],
    timestamp_field: str = TIMESTAMP_KEY,
) -> DataFrame:
    """Each config emits one metric row per event that HAS the field
    (missing field → no metric, counted as processing error by the
    caller — log_to_metric.rs:370-400).

    Config keys per spec (log_to_metric.rs:20-90): ``type``
    (counter|gauge|set|histogram|summary), ``field``, ``name``
    (template, default = field), ``namespace`` (template),
    ``tags`` (map of templates), ``increment_by_value`` (counter).
    """
    has_ts = timestamp_field in df.columns
    ts = F.col(timestamp_field) if has_ts else F.lit(None).cast("timestamp")
    parts: list[DataFrame] = []
    for m in metrics:
        mtype = m["type"]
        field = m["field"]
        name = _tmpl(m.get("name") or field)
        namespace = _tmpl(m["namespace"]) if m.get("namespace") else F.lit(None).cast("string")
        tags = _tags_col(m.get("tags"))
        fcol = F.col(field)
        if mtype == "counter":
            if m.get("increment_by_value"):
                value = fcol.cast("double")
                kind = F.lit("incremental")
            else:
                value = F.lit(1.0)
                kind = F.lit("incremental")
            set_value = F.lit(None).cast("string")
        elif mtype == "gauge":
            value = fcol.cast("double")
            kind = F.lit("absolute")
            set_value = F.lit(None).cast("string")
        elif mtype == "set":
            value = F.lit(None).cast("double")
            kind = F.lit("incremental")
            set_value = fcol.cast("string")
        elif mtype in ("histogram", "summary", "distribution"):
            value = fcol.cast("double")
            kind = F.lit("incremental")
            set_value = F.lit(None).cast("string")
        else:
            raise ValueError(f"unknown metric type {mtype!r}")
        row = df.filter(fcol.isNotNull()).select(
            name.alias("name"),
            namespace.alias("namespace"),
            tags.alias("tags"),
            ts.alias("ts"),
            kind.alias("kind"),
            F.lit(mtype).alias("metric_type"),
            value.alias("value"),
            set_value.alias("set_value"),
            # every log-derived sample is one observation
            # (samples![value => 1], log_to_metric.rs:273,304)
            F.lit(1).cast("long").alias("rate"),
        )
        # value-typed metrics with an unparseable value emit nothing
        if mtype in ("counter",) and m.get("increment_by_value"):
            row = row.filter(F.col("value").isNotNull())
        if mtype in ("gauge", "histogram", "summary", "distribution"):
            row = row.filter(F.col("value").isNotNull())
        parts.append(row)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # advertise which metric types this frame can contain so
    # aggregate_metrics can skip dead aggregation work (a pure-counter
    # stream never needs the set-collect or quantile sketch; at 100 TB
    # the sketch is most of the aggregate's CPU). The attribute rides
    # the Python DataFrame object — any transform in between drops it
    # and aggregate_metrics falls back to computing everything.
    out._vs_metric_types = frozenset(m["type"] for m in metrics)
    return out


def _series_key() -> list[Column]:
    # group key for a MetricSeries; tags map is grouped via its JSON
    # rendering (sorted construction order → stable)
    return [
        F.col("name"),
        F.col("namespace"),
        F.col("metric_type"),
        F.col("kind"),
        F.to_json(F.col("tags")).alias("_tags_key"),
    ]


def aggregate_metrics(
    metrics_df: DataFrame,
    interval: str | None = None,
    quantiles: list[float] = (0.5, 0.95, 0.99),
    types: frozenset[str] | None = None,
) -> DataFrame:
    """The ``aggregate`` Task transform (aggregate.rs:76-130):
    Incremental metrics ADD within a flush interval, Absolute metrics
    last-write-wins. ``interval`` is a tumbling-window duration (e.g.
    '10 seconds'); None = single global flush (batch).

    One shuffle; partial aggregation happens map-side for sum/count.
    Output: one row per (window, series) with type-appropriate value
    columns.

    ``types`` (default: the ``_vs_metric_types`` hint log_to_metric
    attaches, else all) declares which metric types the frame can
    contain: without ``set`` the collect_set is skipped, and without
    summary/distribution/histogram the percentile_approx sketch is
    skipped — those two are most of the aggregate's per-row CPU, and
    a counter-only stream (the common log_to_metric shape) pays for
    neither. Skipped columns come back as typed nulls so the output
    schema is identical either way.
    """
    if types is None:
        types = getattr(metrics_df, "_vs_metric_types", None)
    keys: list[Column] = [
        F.col("name"),
        F.col("namespace"),
        F.col("metric_type"),
        F.col("kind"),
        F.to_json(F.col("tags")).alias("_tags_key"),
    ]
    if interval:
        keys.append(F.window("ts", interval).alias("window"))
    is_inc = F.col("kind") == "incremental"
    # per-sample observation weight (Distribution Sample.rate,
    # metric.rs:147-150): sums/counts weight each row by its rate.
    # log_to_metric emits rate=1, so rate-free frames are unchanged.
    rate = (
        F.col("rate").cast("long")
        if "rate" in metrics_df.columns
        else F.lit(1).cast("long")
    )
    need_set = types is None or "set" in types
    need_quant = types is None or bool(
        types & {"summary", "distribution", "histogram"}
    )
    # tags is functionally determined by the _tags_key group key — a
    # from_json roundtrip after the aggregate instead of first(map):
    # a map-typed aggregation buffer is not hash-aggregable, and with
    # the sketch aggs gone it would demote the WHOLE aggregate from
    # HashAggregate to sort-based SortAggregate (measured in
    # test_plans; a per-partition sort is the opposite of the goal)
    aggs = [
        F.max("ts").alias("ts"),
        F.sum(F.when(is_inc, F.col("value") * rate)).alias("_sum_inc"),
        F.max_by("value", "ts").alias("_last_abs"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNotNull(), rate)), F.lit(0)
        ).alias("count"),
        F.sum(F.col("value") * rate).alias("sum"),
    ]
    if need_set:
        aggs.append(F.collect_set("set_value").alias("set_values"))
    if need_quant:
        # approx sketch is unweighted — the exact rate-weighted
        # quantile path is distribution_statistic()
        aggs.append(
            F.percentile_approx("value", list(quantiles)).alias("_quantiles")
        )
    agg = (
        metrics_df.groupBy(*keys)
        .agg(*aggs)
        .withColumn(
            "tags", F.from_json(F.col("_tags_key"), "map<string,string>")
        )
        .drop("_tags_key")
    )
    if not need_set:
        agg = agg.withColumn("set_values", F.lit(None).cast("array<string>"))
    if not need_quant:
        agg = agg.withColumn("_quantiles", F.lit(None).cast("array<double>"))
    value = (
        F.when(F.col("metric_type") == "counter", F.col("_sum_inc"))
        .when(F.col("metric_type") == "gauge", F.col("_last_abs"))
        .when(F.col("metric_type") == "set", F.size(F.col("set_values")).cast("double"))
        .otherwise(F.col("sum"))
    )
    return agg.withColumn("value", value).drop("_sum_inc", "_last_abs")


def distribution_statistic(
    df: DataFrame,
    value_col: str = "value",
    rate_col: str = "rate",
    quantiles: list[float] = (0.5, 0.95, 0.99),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Flatten a rate-weighted Distribution to its statistic set —
    min/max/median/avg/sum/count + quantiles
    (src/sinks/util/statistic.rs:23-85 DistributionStatistic):
    each sample counts ``rate`` times (sum = Σ value·rate,
    count = Σ rate), samples with rate <= 0 are dropped, and quantiles
    use the reference's R-3 rule — the i-th smallest observation with
    i = round(p·count) (i=0 ⇒ i=1), found by the first cumulative
    rate ≥ i (statistic.rs:92-105 binary search over the cumulative
    histogram).

    Scale shape: pre-aggregate rates per (series, value) — the only
    full-data shuffle — then a per-series cumulative window over
    DISTINCT values (bounded by value cardinality, not sample count;
    the reference sorts every sample of a series in one Vec, so this
    is strictly tighter). Statistic switch: Histogram-statistic
    distributions shape into buckets via ``histogram_buckets``;
    Summary-statistic ones are exactly this output (metric.rs:121-123
    StatisticKind).
    """
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    r = F.col(rate_col).cast("long")
    per_val = (
        df.filter(r > 0)
        .groupBy(*groups, v.alias("_v"))
        .agg(F.sum(r).alias("_w"))
    )
    wspec = Window.partitionBy(*groups).orderBy("_v")
    pv = per_val.withColumn(
        "_cum", F.sum("_w").over(wspec.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "_cnt",
        F.sum("_w").over(
            wspec.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ),
    )

    def q_at(p: float) -> Column:
        i = F.greatest(
            F.round(F.lit(float(p)) * F.col("_cnt")).cast("long"), F.lit(1)
        )
        return F.min(F.when(F.col("_cum") >= i, F.col("_v")))

    aggs = [
        F.min("_v").alias("min"),
        F.max("_v").alias("max"),
        q_at(0.5).alias("median"),
        F.sum(F.col("_v") * F.col("_w")).alias("sum"),
        F.sum("_w").alias("count"),
    ]
    aggs += [q_at(p).alias(f"q{str(p).replace('0.', '')}") for p in quantiles]
    out = pv.groupBy(*groups).agg(*aggs) if groups else pv.agg(*aggs)
    return out.withColumn("avg", F.col("sum") / F.col("count"))


def histogram_buckets(
    df: DataFrame,
    value_col: str,
    limits: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """AggregatedHistogram (metric.rs:126-133): cumulative bucket
    counts per upper_limit (+inf implied by ``count``), plus
    count/sum. Pure conditional aggregation — one shuffle, map-side
    combine, no UDF."""
    v = F.col(value_col).cast("double")
    aggs = [
        F.sum(F.when(v <= lim, 1).otherwise(0)).alias(f"le_{str(lim).replace('.', '_')}")
        for lim in limits
    ]
    aggs += [F.count(v).alias("count"), F.sum(v).alias("sum")]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def add_tags(df: DataFrame, tags: dict[str, str], overwrite: bool = True) -> DataFrame:
    """add_tags.rs:68 — insert tags; overwrite=False keeps existing."""
    new = F.map_from_arrays(
        F.array(*[F.lit(k) for k in sorted(tags)]),
        F.array(*[_tmpl(tags[k]) for k in sorted(tags)]),
    )
    cur = F.coalesce(F.col("tags"), F.lit(None).cast("map<string,string>"))
    merged = (
        F.map_concat(F.map_filter(cur, lambda k, _: ~k.isin(*tags.keys())), new)
        if overwrite
        else F.map_concat(cur, F.map_filter(new, lambda k, _: ~F.array_contains(F.map_keys(cur), k)))
    )
    merged = F.when(F.col("tags").isNull(), new).otherwise(merged)
    return df.withColumn("tags", merged)


def remove_tags(df: DataFrame, tags: list[str]) -> DataFrame:
    """remove_tags.rs:55 — drop tag keys."""
    return df.withColumn(
        "tags", F.map_filter(F.col("tags"), lambda k, _: ~k.isin(*tags))
    )


def tag_cardinality_limit(
    df: DataFrame,
    value_limit: int = 500,
    action: str = "drop_tag",
    order_by: str = "ts",
    tags_col: str = "tags",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Cap per-tag-key value cardinality
    (tag_cardinality_limit.rs:25-300): the reference admits the FIRST
    ``value_limit`` distinct values per key (arrival order) and then
    either strips the offending tag (``drop_tag``) or drops the event
    (``drop_event``).

    Batch determinism: "first seen" = min(``order_by``) per
    (key, value). Pass a FIXED-WIDTH orderable column (timestamp /
    long) — min() over a struct is not hash-aggregable and demotes the
    first-seen aggregate to a per-partition SortAggregate over every
    exploded tag row. Ranking is a two-phase salted top-K — the operator
    exists precisely for keys with RUNAWAY value cardinality, so no
    single task may ever sort a key's full distinct-value set. Phase 1
    ranks within (key, salt-of-value) buckets (each holds ~1/S of the
    key's values) and keeps its local first ``value_limit`` — the
    global first ``value_limit`` is necessarily a subset of that
    union. Phase 2 ranks the ≤ S×value_limit survivors exactly. At
    10⁹ distinct values the old single (key)-partition window put all
    10⁹ rows in one task; now the largest sort is
    max(n/S, S×value_limit) rows.

    Scale/retry design: the allowed set (bounded by keys ×
    value_limit) is aggregated into a SINGLE ``map<key, array<value>>``
    row and broadcast-cross-joined; each event rebuilds its tags with
    ``map_filter`` against it. The event frame is never shuffled and
    no synthetic row id exists — the previous implementation's
    ``monotonically_increasing_id`` join-back was not stable under
    task retry (a re-run stage can re-assign ids → wrong-row join).
    """
    entry = F.explode(F.col(tags_col))
    exploded = df.select(F.col(order_by).alias("_ord"), entry.alias("_k", "_v"))
    first_seen = exploded.groupBy("_k", "_v").agg(F.min("_ord").alias("_fs"))
    n_salt = 32
    w_local = Window.partitionBy("_k", "_salt").orderBy(F.col("_fs"), F.col("_v"))
    candidates = (
        first_seen.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("_v")), F.lit(n_salt))
        )
        .withColumn("_rank", F.row_number().over(w_local))
        .filter(F.col("_rank") <= value_limit)
        .drop("_salt", "_rank")
    )
    w = Window.partitionBy("_k").orderBy(F.col("_fs"), F.col("_v"))
    allowed = (
        candidates.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= value_limit)
        .select("_k", "_v")
    )
    # one row: map<tag key, array of admitted values>
    allowed_map = (
        allowed.groupBy("_k")
        .agg(F.sort_array(F.collect_list("_v")).alias("_vs"))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct(F.col("_k"), F.col("_vs"))))
            ).alias("_allowed")
        )
    )
    joined = df.crossJoin(F.broadcast(allowed_map))
    is_ok = lambda k, v: F.array_contains(  # noqa: E731
        F.coalesce(F.element_at(F.col("_allowed"), k), F.array().cast("array<string>")), v
    )
    if action == "drop_event":
        all_ok = F.forall(
            F.map_entries(F.col(tags_col)), lambda e: is_ok(e["key"], e["value"])
        )
        return joined.filter(F.coalesce(all_ok, F.lit(True))).drop("_allowed")
    new_tags = F.map_filter(F.col(tags_col), is_ok)
    # empty → null keeps parity with the previous join-based shape
    return joined.withColumn(
        tags_col, F.when(F.size(new_tags) > 0, new_tags)
    ).drop("_allowed")


def metric_to_log(metrics_df: DataFrame, host_tag: str | None = None) -> DataFrame:
    """metric_to_log.rs:112 — serialize each metric to a log-shaped
    row; the host tag is hoisted to the ``host`` column (host_key)."""
    out = metrics_df.select(
        F.col("name"),
        F.col("namespace"),
        F.col("ts").alias(TIMESTAMP_KEY),
        F.col("kind"),
        F.col("metric_type"),
        F.col("value"),
        F.to_json(F.col("tags")).alias("tags_json"),
        *(
            [F.element_at(F.col("tags"), host_tag).alias("host")]
            if host_tag
            else []
        ),
    )
    return out


def summary_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float] = (0.5, 0.95, 0.99),
    group_cols: list[str] | None = None,
    exact: bool = False,
    sum_decimal: str | None = "decimal(38,6)",
) -> DataFrame:
    """AggregatedSummary shape (metric.rs:135-142): per-quantile value
    columns + count + sum. ``exact=False`` (default, the scale path)
    uses percentile_approx — a single-pass sketch that merges map-side;
    ``exact=True`` uses the exact percentile (full sort per group) for
    cross-engine verification, since approx sketches are not
    reproducible across engines.

    ``sum_decimal`` routes the sum through a fixed-point decimal so it
    is addition-order-insensitive (deterministic across partitionings
    and engines) — the tradeoff is rounding each value to the decimal's
    scale (default 6 dp) and excluding values beyond its range via
    ``try_cast`` (null, never a job abort). ``sum_decimal=None`` gives
    the reference's plain f64 sum (metric.rs AggregatedSummary.sum),
    exact per-value but order-dependent."""
    v = F.col(value_col).cast("double")
    pfn = F.percentile if exact else F.percentile_approx
    aggs = [
        F.round(pfn(v, F.lit(float(q))), 6).alias(f"q{str(q).replace('0.', '')}")
        for q in quantiles
    ]
    sum_expr = (
        F.sum(v.try_cast(sum_decimal)).cast("double") if sum_decimal else F.sum(v)
    )
    aggs += [
        F.count(v).alias("count"),
        sum_expr.alias("sum"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def rollup_metrics(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "timestamp",
    series_cols: tuple[str, ...] = ("name",),
    tiers: dict[str, int] | None = None,
    sum_decimal: str | None = "decimal(38,6)",
) -> DataFrame:
    """Multi-resolution time rollup — every retention tier (5m/1h/1d
    continuous-aggregate style) computed in ONE pass via GROUPING SETS.

    The naive design scans once per tier (3 scans, 3 shuffles). With
    GROUPING SETS Catalyst plans a single scan + one Expand (each input
    row emitted once per tier) + one partial/final hash aggregate, so
    at 100 TB the input is read once and the shuffle carries per-tier
    partial aggregates bounded by series-cardinality x windows, not row
    count. ``tiers`` maps tier label -> window seconds (default
    5m/1h/1d). Sum routes through a fixed-point decimal by default
    (addition-order-insensitive — deterministic across partitionings
    and engines; same tradeoff as summary_quantiles).

    Output: tier, window_start, *series_cols, n, sum_value, min_value,
    max_value.
    """
    tiers = tiers or {"5m": 300, "1h": 3600, "1d": 86400}
    ts = F.col(ts_col).cast("timestamp")
    epoch = F.unix_timestamp(ts)
    work = df
    wcols = []
    for label, secs in tiers.items():
        wname = f"_w_{label}"
        work = work.withColumn(
            wname, F.timestamp_seconds(F.floor(epoch / secs) * secs)
        )
        wcols.append((label, wname))
    v = F.col(value_col)
    sum_expr = (
        F.sum(v.try_cast(sum_decimal)).cast("double")
        if sum_decimal
        else F.sum(v)
    )
    sets = [[*series_cols, wname] for _, wname in wcols]
    # grouping() flags must be computed INSIDE the aggregate; exactly
    # one window column is grouped per output row, and the flag (not
    # null-ness) identifies it, so NULL timestamps stay correct
    grouped = work.groupingSets(
        sets, *[F.col(c) for c in series_cols], *[F.col(w) for _, w in wcols]
    ).agg(
        F.count(v).alias("n"),
        sum_expr.alias("sum_value"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
        *[
            F.grouping(F.col(w)).alias(f"_g_{label}")
            for label, w in wcols
        ],
    )
    tier_expr = None
    for label, _ in wcols:
        cond = F.col(f"_g_{label}") == 0
        tier_expr = (
            F.when(cond, label) if tier_expr is None else tier_expr.when(cond, label)
        )
    return grouped.select(
        tier_expr.alias("tier"),
        F.coalesce(*[F.col(w) for _, w in wcols]).alias("window_start"),
        *series_cols,
        "n",
        "sum_value",
        "min_value",
        "max_value",
    )
