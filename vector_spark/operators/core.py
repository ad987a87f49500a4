"""Core dataflow transforms: filter, route, sample, dedupe.

References: src/transforms/filter.rs:12-70, route.rs:15-121,
sample.rs:12-138, dedupe.rs:15-206.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.conditions import compile_condition

ROUTE_COL_PREFIX = "_route_"


def filter_events(df: DataFrame, condition: Any) -> DataFrame:
    """Keep events where condition is true (filter.rs:12-70).
    Null condition result = false (Vector treats non-Boolean(true) as
    false — conditions/vrl.rs:60-70)."""
    cond = compile_condition(condition)
    return df.filter(F.coalesce(cond, F.lit(False)))


def route_flags(df: DataFrame, routes: dict[str, Any]) -> DataFrame:
    """Add one boolean ``_route_<lane>`` column per named route.

    Vector's route expands to one Lane child per route at config time
    (route.rs:96-108) and an event goes to EVERY lane whose condition
    matches (non-exclusive). Flag columns + downstream filtered writes
    replicate that with a single scan; lanes that overlap duplicate
    rows only at the sink, never in the plan.
    """
    cols = {
        ROUTE_COL_PREFIX + name: F.coalesce(compile_condition(cond), F.lit(False))
        for name, cond in routes.items()
    }
    return df.withColumns(cols)


def route_split(df: DataFrame, routes: dict[str, Any]) -> dict[str, DataFrame]:
    """Materialize one DataFrame per lane from a flagged frame.
    Callers fan-out-writing multiple sinks should ``persist()`` the
    flagged frame first (see plans/pipeline.py) so the input is read
    once — the Spark analogue of Vector's channel fanout
    (src/topology/fanout.rs:31-46)."""
    flagged = route_flags(df, routes)
    drop_cols = [ROUTE_COL_PREFIX + n for n in routes]
    return {
        name: flagged.filter(F.col(ROUTE_COL_PREFIX + name)).drop(*drop_cols)
        for name in routes
    }


def sample(
    df: DataFrame,
    rate: int,
    key_field: str | None = None,
    exclude: Any | None = None,
    order_field: str | None = None,
    sample_rate_field: str = "sample_rate",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Keep 1-in-``rate`` events (sample.rs:12-138).

    - ``key_field`` set → deterministic hash sampling: the reference
      uses ``seahash(key) % rate == 0`` (sample.rs:84-100); we use
      ``xxhash64`` (JVM built-in) — same determinism contract
      (identical runs → identical survivor set), different hash
      function, documented divergence. ``hash_mode='md5'`` uses an
      md5-derived value instead (portable across engines for oracle
      checks).
    - no ``key_field`` → the reference counts events mod rate
      (arrival order); batch equivalent: deterministic ordering by
      ``order_field`` → ``row_number % rate == 0``. Requires
      ``order_field``.
    - ``exclude`` condition bypasses sampling entirely; excluded rows
      pass WITHOUT the ``sample_rate`` field (null here).
    - survivors gain ``sample_rate`` = rate (sample.rs:118-125).
    """
    if rate <= 0:
        raise ValueError("rate must be >= 1")
    if key_field is not None:
        key = F.col(key_field).cast("string")
        if hash_mode == "md5":
            bucket = F.pmod(
                F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"), F.lit(rate)
            )
        else:
            bucket = F.pmod(F.xxhash64(key), F.lit(rate))
        pass_cond = bucket == 0
        return _apply_sample_filter(df, pass_cond, exclude, rate, sample_rate_field)
    else:
        if order_field is None:
            raise ValueError("counter sampling needs order_field for deterministic batch order")
        # window fn can't live in a WHERE clause — materialize then filter.
        # NOTE: a global row_number is single-partition; counter mode is
        # for small/behavior-test inputs — hash mode is the scale path.
        w = Window.orderBy(F.col(order_field))
        work = df.withColumn("_vs_rn", F.row_number().over(w))
        pass_cond = F.pmod(F.col("_vs_rn"), F.lit(rate)) == 0
        work = _apply_sample_filter(work, pass_cond, exclude, rate, sample_rate_field)
        return work.drop("_vs_rn")


def _apply_sample_filter(df, pass_cond, exclude, rate, sample_rate_field):
    if exclude is not None:
        excl = F.coalesce(compile_condition(exclude), F.lit(False))
        keep = excl | pass_cond
        rate_col = F.when(~excl & pass_cond, F.lit(rate))
    else:
        keep = pass_cond
        rate_col = F.when(pass_cond, F.lit(rate))
    return df.filter(keep).withColumn(sample_rate_field, rate_col)


def dedupe(
    df: DataFrame,
    match: list[str] | None = None,
    ignore: list[str] | None = None,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Drop events whose match-field values were already seen
    (dedupe.rs:15-206).

    Semantics mapping:
    - ``match`` fields (or all-minus-``ignore``) form the dedupe key.
      The reference type-tags values so ``"123"`` ≠ ``123``
      (dedupe.rs:120-143) — free here: Spark columns are typed.
    - The reference keeps the FIRST event per key within an LRU cache
      of 5000 keys (arrival order). Batch semantics: exact, unbounded
      dedupe keeping the first row by ``order_by`` (deterministic);
      without ``order_by``, any row per key (``dropDuplicates`` —
      cheaper: partial aggregation map-side, no window sort).
      LRU-window eviction (a key re-admitted after 5000 distinct
      others) is a documented divergence — at batch scale exact
      dedupe is strictly stronger.
    """
    if match and ignore:
        raise ValueError("match and ignore are mutually exclusive (dedupe.rs FieldMatchConfig)")
    if ignore:
        keys = [c for c in df.columns if c not in set(ignore)]
    elif match:
        keys = match
    else:
        keys = list(df.columns)
    if not order_by:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(o) for o in order_by]
    )
    return (
        df.withColumn("_dd_rn", F.row_number().over(w))
        .filter(F.col("_dd_rn") == 1)
        .drop("_dd_rn")
    )


def field_filter(df: DataFrame, field: str, value) -> DataFrame:
    """Deprecated `field_filter` transform (field_filter.rs:10-90):
    keep events where field == value (string equality in the
    reference; typed equality here)."""
    return df.filter(F.col(field) == F.lit(value))
