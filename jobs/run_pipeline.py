"""Cluster entrypoint: run the flagship pipeline via spark-submit.

    spark-submit --py-files vector_spark.zip jobs/run_pipeline.py \
        --input  /data/sequences         # parquet dir or iceberg table \
        --output /data/routed            # fan-out root (lane= partitions) \
        --checkpoint /data/ckpt          # per-shard resume log \
        --shards 64

Packaging: ``python -m zipfile -c vector_spark.zip vector_spark/``.
On a real cluster the session master/memory come from spark-submit;
this script only sets semantic configs (AQE, shuffle partitions).

Resumability: the run is sharded over input file groups
(vector_spark/checkpoint.py); a killed job rerun with the same
--checkpoint dir skips committed shards. Telemetry per shard is in
the checkpoint JSON records.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/run_pipeline.py` runs (dev/test) need the repo
# root on sys.path; under spark-submit --py-files this is a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def build_config(output_root: str) -> dict:
    from vector_spark.fixtures import HOT_SOURCE

    return {
        "transforms": {
            "derive": {
                "type": "remap",
                "inputs": ["in"],
                "assignments": [
                    (
                        ".size_bucket",
                        'if_else(.n_tok < 128, "small", if_else(.n_tok < 1024, "medium", "large"))',
                    ),
                ],
            },
            "keep": {"type": "filter", "inputs": ["derive"], "condition": ".n_tok >= 4"},
            "enrich_src": {
                "type": "enrich",
                "inputs": ["keep"],
                "table": "sources",
                "on": "source",
            },
            "router": {
                "type": "route",
                "inputs": ["enrich_src"],
                "routes": {
                    "hot": f'.source == "{HOT_SOURCE}"',
                    "large": '.size_bucket == "large"',
                    "rest": f'.source != "{HOT_SOURCE}" && .size_bucket != "large"',
                },
            },
        },
        "sinks": {
            "hot": {"inputs": ["router.hot"]},
            "large": {"inputs": ["router.large"]},
            "rest": {"inputs": ["router.rest"]},
        },
        "fanout": {"strategy": "explode", "root": output_root, "mode": "append"},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--shards", type=int, default=64)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("vector_spark_pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from vector_spark.checkpoint import resumable_run, shard_output_path
    from vector_spark.fixtures import enrich_sources
    from vector_spark.plans import Pipeline

    dim = enrich_sources(spark)

    def process(df, shard_id):
        # shard-scoped OVERWRITE: a replayed shard (crash between sink
        # write and checkpoint commit) overwrites its own partial
        # output — exactly-once without a cleanup hook
        cfg = build_config(shard_output_path(args.output, shard_id))
        cfg["fanout"]["mode"] = "overwrite"
        return Pipeline(cfg, enrich_tables={"sources": dim}).run(df, write=True)

    def cleanup(shard_id: int) -> None:
        # crashed attempts and stale shards (n_shards shrink) are
        # scrubbed by deleting the shard-scoped output directory
        import shutil

        shutil.rmtree(shard_output_path(args.output, shard_id), ignore_errors=True)

    results = resumable_run(
        spark, args.input, args.checkpoint, process, n_shards=args.shards,
        cleanup=cleanup,
    )
    done = [r for r in results if not r.skipped]
    total_in = sum(r.telemetry.get("events_in_total", 0) for r in done)
    print(
        json.dumps(
            {
                "shards_processed": len(done),
                "shards_skipped": len(results) - len(done),
                "events_in_total": total_in,
                "wall_seconds": round(sum(r.wall_seconds for r in done), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
