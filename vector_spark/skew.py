"""Skew mitigation: salted keys + AQE, explicit per the north rule.

The fixture/reality: one hot ``source`` ("web-frontend") holds ~40% of
rows. Any groupBy/join keyed on ``source`` puts 40% of a 10^12-row
table into ONE reduce partition. Mitigations, in preference order:

1. **Partial (map-side) aggregation** — Spark already combines
   per-partition before the shuffle for algebraic aggs (sum/count/
   min/max); a hot GROUP key is then cheap because only per-partition
   partials shuffle. No action needed — verify with .explain
   (HashAggregate(partial) → Exchange → HashAggregate(final)).
2. **Two-phase salted aggregation** (``salted_agg``) — for aggs where
   partials don't collapse enough (collect_list/set, percentile) or
   extreme key skew: group on (key, salt) first, then re-aggregate.
3. **Salted join** (``salted_join``) — replicate the small side per
   salt so the hot key's rows spread over N reducers. Only needed
   when the dim is too big to broadcast; our enrichment dims
   broadcast, so this is the documented escape hatch.
4. **AQE skew-join splitting** — on by default in the session factory
   (spark.sql.adaptive.skewJoin.enabled) for sort-merge joins.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row-salt derived from a hash of the whole row id
    space (uses monotonically varying task/row info via xxhash64 of
    all columns — stable for a given input)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over skewed keys.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` combine the
    partials per keys. Example (count + sum):

        salted_agg(df, ["source"],
                   [F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")],
                   [F.sum("c").alias("cnt"), F.sum("s").alias("sum_v")])

    The hot key's rows fan out over ``n_salts`` reducers in phase 1;
    phase 2 only sees n_salts rows per key.
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs)


def explode_salted_join(
    big: DataFrame, small: DataFrame, on: str, n_salts: int = 16, how: str = "left"
) -> DataFrame:
    """True salted join: big side gets a RANDOM-ish (row-hash) salt and
    the small side is exploded n_salts× so every (key, salt) pair
    exists. Spreads a single hot key over n_salts reducers.

    (A key-hash salt on both sides would give every row of a hot key
    the SAME salt — zero mitigation. The salt must be derived from the
    whole row so the hot key's rows scatter across salts.)"""
    big_cols = big.columns
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")


# The only correct manual salted-join shape is the explode variant —
# the former key-hash-salt implementation was a no-op shuffle-widener
# and is gone. Kept as the canonical name.
salted_join = explode_salted_join
