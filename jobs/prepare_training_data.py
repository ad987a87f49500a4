"""Cluster entrypoint: raw documents → curated fixed-length training
blocks, resumable per shard.

    spark-submit --py-files vector_spark.zip jobs/prepare_training_data.py \\
        --input  /data/documents        # parquet dir: (doc_id, text, source) \\
        --output /data/blocks           # shard= partitioned block parquet \\
        --checkpoint /data/ckpt_prep    # per-shard resume log \\
        --shards 64 \\
        --block-size 2048 \\
        --min-score 0.5 \\
        --weights /models/quality.parquet   # optional pre-trained weight table

The curation chain per shard (all DataFrame algebra, one pass per
stated shuffle — see SCALE.md):

  heuristic signals (map-only) → model-based quality score (broadcast
  weight join) → threshold filter → PII scrub (map-only) → exact
  dedup (one hash shuffle) → hash-tokenize → concat-and-chunk into
  exact ``--block-size`` token blocks (one window shuffle, reused by
  the block reassembly).

Quality weights: pass ``--weights`` (a (feature, weight) parquet from
``train_nb_classifier``, bias row under feature=-1) to score with a
frozen model — the production shape, where the classifier was trained
once on labeled data. Without ``--weights`` the job trains in-job on
heuristic pseudo-labels (quality_score >= 0.5), which is
self-distillation of the heuristic — fine for smoke runs, documented
as NOT a substitute for a real labeled model.

Sharding caveat (documented, not hidden): exact dedup runs WITHIN a
resumable shard. Global dedup across 100 TB is a separate
whole-corpus pass — ``jobs/dedup_corpus.py`` — run BEFORE this job; per-shard dedup here only catches intra-shard
repeats. The shard is the resume unit, so cross-shard state would
break replay idempotency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_to_blocks(
    docs: DataFrame,
    weights: DataFrame | None,
    min_score: float,
    block_size: int,
    n_window_shards: int,
    vocab_size: int = 32768,
) -> tuple[DataFrame, dict[str, object]]:
    """The per-shard curation plan. Returns (blocks, observations) —
    observations resolve after the write action, so stage counters
    cost no extra pass (the reference's events_in/events_out telemetry
    shape)."""
    from pyspark.sql import Observation

    from vector_spark.dataops.classify import (
        hash_features,
        score_classifier,
        train_nb_classifier,
    )
    from vector_spark.dataops.curation import pii_scrub
    from vector_spark.dataops.dedup import exact_dedup
    from vector_spark.dataops.textstats import quality_score
    from vector_spark.dataops.tokens import chunk_tokens, tokenize_words

    obs_in = Observation("events_in")
    docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n"))

    feats = docs.withColumn("features", hash_features(F.col("text")))
    if weights is None:
        # self-distilled smoke-run model (see module docstring)
        labeled = feats.withColumn(
            "label", quality_score(F.col("text")) >= F.lit(0.5)
        )
        weights = train_nb_classifier(labeled, "label")
    # score carries only (doc_id, score) through the explode — putting
    # text in the group key would copy it onto every exploded feature
    # row (~|features| ×) — then joins back by id for the kept rows
    scored = score_classifier(feats, weights).select("doc_id", "score")
    kept = docs.join(scored, "doc_id").filter(
        F.col("score") >= F.lit(min_score)
    )

    obs_kept = Observation("events_kept")
    kept = kept.observe(obs_kept, F.count(F.lit(1)).alias("n"))

    scrubbed = pii_scrub(kept, count_cols=False)
    keepers = exact_dedup(scrubbed, text_col="text").select(
        F.col("keep_id").alias("doc_id")
    )
    deduped = scrubbed.join(keepers, "doc_id")
    seqs = deduped.select(
        "source",
        "doc_id",
        tokenize_words(F.col("text"), vocab_size=vocab_size).alias("tokens"),
    )
    blocks = chunk_tokens(
        seqs,
        block_size,
        stream_cols=["source"],
        n_shards=n_window_shards,
    )
    obs_out = Observation("blocks_out")
    blocks = blocks.observe(
        obs_out,
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tok").alias("tokens"),
    )
    return blocks, {"in": obs_in, "kept": obs_kept, "out": obs_out}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=2048)
    ap.add_argument("--min-score", type=float, default=0.5)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--window-shards", type=int, default=8)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("vector_spark_prepare_training_data")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from vector_spark.checkpoint import resumable_run, shard_output_path

    wtab = spark.read.parquet(args.weights) if args.weights else None

    def process(df: DataFrame, shard_id: int):
        blocks, obs = curate_to_blocks(
            df,
            wtab,
            args.min_score,
            args.block_size,
            args.window_shards,
        )
        out = shard_output_path(args.output, shard_id)
        # shard-scoped overwrite: replayed shards are idempotent
        blocks.write.mode("overwrite").parquet(out)
        tele = {
            "events_in_total": obs["in"].get["n"] or 0,
            "events_kept_total": obs["kept"].get["n"] or 0,
            "blocks_out_total": obs["out"].get["n"] or 0,
            # sum() observes NULL (None) on an empty frame
            "tokens_out_total": obs["out"].get["tokens"] or 0,
        }
        return SimpleNamespace(
            telemetry=tele, sink_counts={"blocks": tele["blocks_out_total"]}
        )

    def cleanup(shard_id: int) -> None:
        import shutil

        shutil.rmtree(
            shard_output_path(args.output, shard_id), ignore_errors=True
        )

    results = resumable_run(
        spark,
        args.input,
        args.checkpoint,
        process,
        n_shards=args.shards,
        cleanup=cleanup,
    )
    done = [r for r in results if not r.skipped]
    print(
        json.dumps(
            {
                "shards_processed": len(done),
                "shards_skipped": len(results) - len(done),
                "events_in_total": sum(
                    r.telemetry.get("events_in_total", 0) for r in done
                ),
                "events_kept_total": sum(
                    r.telemetry.get("events_kept_total", 0) for r in done
                ),
                "blocks_out_total": sum(
                    r.telemetry.get("blocks_out_total", 0) for r in done
                ),
                "tokens_out_total": sum(
                    r.telemetry.get("tokens_out_total", 0) for r in done
                ),
                "wall_seconds": round(sum(r.wall_seconds for r in done), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
