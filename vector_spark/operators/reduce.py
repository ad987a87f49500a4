"""reduce & merge — the stateful (Task) collapse transforms.

References: src/transforms/reduce/mod.rs:26-270 (+
reduce/merge_strategy.rs:8-16), src/transforms/merge.rs:18-200.

Vector reduces with processing-time staleness (Instant::now) and
per-event scans; arrival order is the implicit sequence. Batch
semantics here are defined on an explicit deterministic ordering
column (``order_by``) — SURVEY.md §7 "processing-time statefulness"
divergence note. The streaming variants live in
vector_spark/streaming/ops.py (session_window / watermark).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.conditions import compile_condition

MERGE_STRATEGIES = ("discard", "retain", "sum", "max", "min", "array", "concat", "concat_newline")


def _ordered_vals(ord_col: str, val: Column) -> Column:
    """collect values in deterministic order: sort (ord, val) structs
    then project the value — avoids collect_list's partition-order
    nondeterminism."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(F.col(ord_col).alias("o"), val.alias("v")))),
        lambda x: x["v"],
    )


def reduce_events(
    df: DataFrame,
    group_by: list[str],
    merge_strategies: dict[str, str] | None = None,
    ends_when: Any | None = None,
    starts_when: Any | None = None,
    order_by: str = "ts",
    expire_gap: float | None = None,
) -> DataFrame:
    """Collapse event runs per group (reduce/mod.rs:26-270).

    - ``group_by`` = the discriminant (reduce/mod.rs:72-90).
    - ``merge_strategies`` per field: discard (first) / retain (last)
      / sum / max / min / array (ordered collect) / concat (space
      join) / concat_newline (merge_strategy.rs:8-16). Unlisted
      fields default to discard-first (the reference keeps the first
      event's value).
    - ``ends_when``: a row matching the condition CLOSES its session
      (inclusive); ``starts_when``: a matching row OPENS a new one.
      Implemented as running-sum session ids over a window — one
      shuffle for the window + one for the final groupBy (same keys →
      Catalyst reuses the hash partitioning).
    """
    merge_strategies = merge_strategies or {}
    sess: Column | None = None
    w = Window.partitionBy(*group_by).orderBy(F.col(order_by))
    if expire_gap is not None:
        # staleness sessionization (reduce.expire_after_ms analogue):
        # a gap > expire_gap between consecutive events opens a new
        # session. order_by must be numeric/timestamp-difference-able.
        prev = F.lag(F.col(order_by)).over(w)
        new_sess = F.when(
            prev.isNull() | ((F.col(order_by) - prev) > expire_gap), F.lit(1)
        ).otherwise(F.lit(0))
        sess = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    if ends_when is not None:
        end_flag = F.coalesce(compile_condition(ends_when), F.lit(False)).cast("long")
        end_sess = F.coalesce(
            F.sum(end_flag).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        )
        sess = end_sess if sess is None else (sess * 1_000_000 + end_sess)
    if starts_when is not None:
        start_flag = F.coalesce(compile_condition(starts_when), F.lit(False)).cast("long")
        s2 = F.coalesce(
            F.sum(start_flag).over(w.rowsBetween(Window.unboundedPreceding, 0)), F.lit(0)
        )
        sess = s2 if sess is None else (sess * 1_000_000 + s2)

    work = df.withColumn("_sess", sess if sess is not None else F.lit(0))
    keys = [*group_by, "_sess"]

    aggs: list[Column] = []
    value_cols = [c for c in df.columns if c not in set(group_by) and c != order_by]
    dtypes = dict(df.dtypes)
    _numeric = ("int", "bigint", "smallint", "tinyint", "float", "double")
    for c in value_cols:
        # default merger mirrors reduce/mod.rs: numeric fields ADD,
        # everything else keeps the first event's value (behavior test
        # reduce_basic pins counter summing with no declared strategy)
        dt = dtypes.get(c, "")
        default = "sum" if (dt in _numeric or dt.startswith("decimal")) else "discard"
        strat = merge_strategies.get(c, default)
        col = F.col(c)
        if strat == "discard":
            aggs.append(F.min_by(col, F.col(order_by)).alias(c))
        elif strat == "retain":
            aggs.append(F.max_by(col, F.col(order_by)).alias(c))
        elif strat == "sum":
            aggs.append(F.sum(col).alias(c))
        elif strat == "max":
            aggs.append(F.max(col).alias(c))
        elif strat == "min":
            aggs.append(F.min(col).alias(c))
        elif strat == "array":
            aggs.append(_ordered_vals(order_by, col).alias(c))
        elif strat == "concat":
            aggs.append(F.array_join(_ordered_vals(order_by, col.cast("string")), " ").alias(c))
        elif strat == "concat_newline":
            aggs.append(F.array_join(_ordered_vals(order_by, col.cast("string")), "\n").alias(c))
        else:
            raise ValueError(f"unknown merge strategy {strat!r} for {c}")
    # reduce keeps the group's earliest timestamp as the event ts and
    # emits the latest as `<order_by>_end` (reduce/mod.rs timestamp_end
    # — behavior tests assert exists(.timestamp_end))
    aggs.append(F.min(F.col(order_by)).alias(order_by))
    aggs.append(F.max(F.col(order_by)).alias(f"{order_by}_end"))
    return work.groupBy(*keys).agg(*aggs).drop("_sess")


def merge_partial(
    df: DataFrame,
    fields: list[str] = ("message",),
    discriminant: list[str] | None = None,
    partial_field: str = "_partial",
    order_by: str = "ts",
    joiner: str = "",
) -> DataFrame:
    """Fold partial events into the next non-partial event
    (merge.rs:18-200; ``_partial`` marker const event/mod.rs:42).

    Partial rows concatenate their ``fields`` (in order) onto the
    closing non-partial row; all other columns come from the closing
    row. Trailing partials with no closer are dropped (the reference
    would hold them in memory forever — documented divergence).
    """
    discriminant = list(discriminant or [])
    w = Window.partitionBy(*discriminant or [F.lit(1)]).orderBy(F.col(order_by))
    non_partial = (~F.coalesce(F.col(partial_field), F.lit(False))).cast("long")
    # a partial row joins the NEXT non-partial: group id = count of
    # non-partials from current row to end (equal for the run + closer)
    grp = F.sum(non_partial).over(w.rowsBetween(0, Window.unboundedFollowing))
    work = df.withColumn("_grp", grp).filter(F.col("_grp") > 0)
    keys = [*discriminant, "_grp"]
    aggs = []
    for c in df.columns:
        if c in set(discriminant) or c == order_by or c == partial_field:
            continue
        if c in fields:
            aggs.append(F.array_join(_ordered_vals(order_by, F.col(c).cast("string")), joiner).alias(c))
        else:
            aggs.append(F.max_by(F.col(c), F.col(order_by)).alias(c))
    aggs.append(F.max(F.col(order_by)).alias(order_by))
    return work.groupBy(*keys).agg(*aggs).drop("_grp")
