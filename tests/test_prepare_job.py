"""End-to-end test of the prepare_training_data cluster job: curation
chain → exact blocks → shard-scoped write, resumable."""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.prepare_training_data import curate_to_blocks

SF = "/root/testdata/sf0.001"


def test_curate_to_blocks_exact_blocks_and_telemetry(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    blocks, obs = curate_to_blocks(
        docs, weights=None, min_score=0.4, block_size=256, n_window_shards=1
    )
    rows = blocks.collect()
    assert len(rows) > 0
    assert all(r.n_tok == 256 and len(r.tokens) == 256 for r in rows)
    # observations resolved by the action, no extra pass
    assert obs["in"].get["n"] == 500
    assert obs["kept"].get["n"] <= 500
    assert obs["out"].get["n"] == len(rows)
    assert obs["out"].get["tokens"] == 256 * len(rows)


def test_job_shard_resume(spark, tmp_path):
    """Second run over an unchanged checkpoint skips every shard."""
    from types import SimpleNamespace

    from vector_spark.checkpoint import resumable_run, shard_output_path

    out = str(tmp_path / "blocks")
    ckpt = str(tmp_path / "ckpt")

    def process(df, sid):
        blocks, obs = curate_to_blocks(
            df, weights=None, min_score=0.4, block_size=256, n_window_shards=1
        )
        blocks.write.mode("overwrite").parquet(shard_output_path(out, sid))
        return SimpleNamespace(telemetry={"n": obs["out"].get["n"] or 0},
                               sink_counts={})

    r1 = resumable_run(
        spark, f"{SF}/documents.parquet", ckpt, process, n_shards=1
    )
    assert [r.skipped for r in r1] == [False]
    n1 = spark.read.parquet(out).count()
    r2 = resumable_run(
        spark, f"{SF}/documents.parquet", ckpt, process, n_shards=1
    )
    assert [r.skipped for r in r2] == [True]
    assert spark.read.parquet(out).count() == n1


def test_frozen_weights_path(spark, tmp_path):
    """--weights production shape: train once, persist, score with the
    frozen table — scores must equal the in-job training run."""
    from vector_spark.dataops.classify import (
        hash_features,
        score_classifier,
        train_nb_classifier,
    )
    from vector_spark.dataops.textstats import quality_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    feats = docs.withColumn("features", hash_features(F.col("text")))
    labeled = feats.withColumn(
        "label", quality_score(F.col("text")) >= F.lit(0.5)
    )
    wpath = str(tmp_path / "weights.parquet")
    train_nb_classifier(labeled, "label").write.parquet(wpath)
    frozen = spark.read.parquet(wpath)
    live = {
        r.doc_id: r.score
        for r in score_classifier(
            feats, train_nb_classifier(labeled, "label")
        ).collect()
    }
    froz = {
        r.doc_id: r.score for r in score_classifier(feats, frozen).collect()
    }
    assert froz == live


def test_prepare_media_data_job(spark, tmp_path):
    """media job: normalize → decode → sha-dedup composes; every
    distinct payload appears once with decoded features; video rows
    survive with decode_ok=false."""
    from jobs.prepare_media_data import curate_media
    from vector_spark.dataops.multimodal import synthetic_media

    media = synthetic_media(spark, 30)
    out = curate_media(media).collect()
    assert len(out) == 30  # all synthetic payloads distinct
    kinds = {r.kind for r in out}
    assert kinds == {"image", "audio", "video"}
    assert all(r.dup_count == 1 for r in out)
    for r in out:
        if r.kind == "video":
            assert not r.decode_ok and r.feat is None
        else:
            assert r.decode_ok and len(r.feat) in (4, 5)
    # duplicate payloads collapse: double the table, counts become 2
    doubled = media.unionByName(
        media.withColumn("media_id", F.concat(F.col("media_id"), F.lit("-b")))
    )
    out2 = curate_media(doubled).collect()
    assert len(out2) == 30
    assert all(r.dup_count == 2 for r in out2)
    # keeper is min media_id (the originals, not the -b copies)
    assert all(not r.media_id.endswith("-b") for r in out2)
