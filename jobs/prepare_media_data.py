"""Cluster entrypoint: raw media table → decoded, normalized,
deduplicated media features — the multimodal curation analogue of
``prepare_training_data``.

    spark-submit --py-files vector_spark.zip jobs/prepare_media_data.py \\
        --input  /data/media          # parquet: MEDIA_SCHEMA columns \\
        --output /data/media_curated  # parquet: payload + features \\
        --synthetic-rows 300          # smoke mode: generate instead of read

Chain (each stage its own narrow mapInPandas or one hash shuffle):

  byte-aware repartition (media_repartition — file statistics, no
  extra scan) → payload normalization (transform_media: PPM
  nearest-neighbor resize, PCM16 decimation; video passes through
  transform_ok=false) → feature extraction (extract_features: REAL
  WAV/PPM decode) → exact payload dedup on sha256 (ONE hash shuffle,
  min media_id keeper — the binary analogue of exact_dedup) → write.

Scale notes: the sha dedup groupBy is keyed by the 64-hex digest —
uniform by construction, no salting needed; the wide payload column
rides through exactly two Python crossings (transform, decode), both
Arrow-batched.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_media(media: DataFrame) -> DataFrame:
    """The composed plan: normalize → decode → sha-dedup (keep min
    media_id per payload hash). Returns one row per DISTINCT payload
    with its features and duplicate count."""
    from vector_spark.dataops.multimodal import (
        extract_features,
        media_repartition,
        transform_media,
    )

    normalized = transform_media(media_repartition(media))
    feats = extract_features(normalized.drop("transform_ok"))
    w = F.col("media_id")
    # min_by keyed on the same keeper as the media_id column: the
    # surviving row's kind/feat/decode_ok are the KEEPER's values, so
    # byte-identical payloads with divergent labels resolve
    # deterministically across runs (F.first over an unordered group
    # does not)
    return (
        feats.groupBy("sha")
        .agg(
            F.min(w).alias("media_id"),
            F.count(F.lit(1)).alias("dup_count"),
            F.min_by("kind", w).alias("kind"),
            F.min_by("n_bytes", w).alias("n_bytes"),
            F.min_by("feat", w).alias("feat"),
            F.min_by("decode_ok", w).alias("decode_ok"),
        )
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--synthetic-rows", type=int, default=0)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("prepare_media_data").getOrCreate()
    if args.synthetic_rows:
        from vector_spark.dataops.multimodal import synthetic_media

        media = synthetic_media(spark, args.synthetic_rows)
    else:
        media = spark.read.parquet(args.input)
    out = curate_media(media)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"distinct_payloads": n, "output": args.output}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
