"""Enrichment joins — Vector's enrichment-table/geoip lookups.

Reference: src/transforms/geoip.rs:13-220 (per-event MaxMind lookup)
and aws_ec2_metadata.rs:74-250 (constant enrichment). The Spark
translation for ALL of Vector's lookup transforms is a broadcast hash
join against a small dimension frame: the dimension ships once per
executor, the probe stays shuffle-free — the model scales to 100 TB
fact tables because the big side never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    df: DataFrame,
    table: DataFrame,
    on: str | list[str],
    prefix: str | None = None,
    miss_flag_field: str | None = None,
) -> DataFrame:
    """Broadcast left join. Unmatched rows keep nulls (geoip inserts
    nothing on lookup miss) and can be flagged for the error counter
    via ``miss_flag_field`` (FIXTURES.md F6)."""
    keys = [on] if isinstance(on, str) else list(on)
    right = table
    added = [c for c in table.columns if c not in keys]
    if prefix:
        for c in added:
            right = right.withColumnRenamed(c, f"{prefix}{c}")
        added = [f"{prefix}{c}" for c in added]
    out = df.join(F.broadcast(right), on=keys, how="left")
    if miss_flag_field:
        probe = added[0] if added else keys[0]
        out = out.withColumn(miss_flag_field, F.col(probe).isNull())
    return out


def enrich_constants(df: DataFrame, values: dict) -> DataFrame:
    """aws_ec2_metadata analogue: driver-side fetched constants become
    literal columns (no join at all — constant-folded)."""
    return df.withColumns({k: F.lit(v) for k, v in values.items()})
