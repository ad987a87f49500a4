"""Whole-corpus dedup job: exact + LSH near-dup evidence → clusters →
one keep/drop decision per document."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.dedup_corpus import dedup_decisions


def test_dedup_decisions_exact_near_and_unique(spark):
    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the sun sets slowly behind the quiet hills of summer"
    )
    near = base.replace("quiet hills", "silent hills")  # near-dup of 1/2
    rows = [
        (1, base),
        (2, base),                       # exact dup of 1
        (3, near),                       # near dup of 1/2
        (4, "a completely different document about spark physical plans"),
        (5, "another unrelated text concerning tokenizers and vocabularies"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    decisions, evidence = dedup_decisions(docs, threshold=0.5, minhash_k=16, bands=8)
    d = {r.doc_id: (r.cluster, r.keep) for r in decisions.collect()}
    assert len(d) == 5                       # one decision per document
    assert d[1] == (1, True)                 # cluster representative kept
    assert d[2] == (1, False)                # exact dup dropped
    assert d[3][1] is False and d[3][0] == 1  # near dup joins the cluster
    assert d[4] == (4, True) and d[5] == (5, True)  # uniques keep trivially
    ev = {(r.id_a, r.id_b) for r in evidence.collect()}
    assert (1, 2) in ev                      # exact pair evidence present


def test_dedup_decisions_deterministic(spark):
    # genuinely distinct texts — a shared template with one differing
    # word IS a legitimate near-dup and would (correctly) merge
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(20)
    ]
    rows += [(100, rows[0][1])]  # one exact dup
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dedup_decisions(docs)[0].collect()))
    b = sorted(map(tuple, dedup_decisions(docs)[0].collect()))
    assert a == b
    kept = [r for r in a if r[2]]
    assert len(kept) == 20  # 21 docs, one dropped


def test_dedup_then_prepare_composed(spark, tmp_path):
    """The deployment composition: global dedup decisions semi-join
    into the curation job's input — duplicates never reach the block
    writer, and the blocks are exact."""
    from pyspark.sql import functions as F

    from jobs.dedup_corpus import dedup_decisions
    from jobs.prepare_training_data import curate_to_blocks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    decisions, _ = dedup_decisions(docs)
    keepers = decisions.filter("keep").select("doc_id")
    kept_docs = docs.join(
        keepers.withColumn("doc_id", F.col("doc_id").cast(docs.schema["doc_id"].dataType)),
        "doc_id",
    )
    n_kept = kept_docs.count()
    assert n_kept < docs.count()  # the corpus contains duplicates
    blocks, obs = curate_to_blocks(
        kept_docs, weights=None, min_score=0.4, block_size=256,
        n_window_shards=1,
    )
    rows = blocks.collect()
    assert len(rows) > 0 and all(r.n_tok == 256 for r in rows)
    assert obs["in"].get["n"] == n_kept


def test_incremental_dedup_against_published_index(spark, tmp_path):
    """Cross-run dedup: run 1 publishes its keeper index; run 2's
    shard (disjoint ids, containing an exact copy and a near-copy of
    run-1 docs plus one fresh doc) dedups against the index without
    re-reading run 1's corpus."""
    from jobs.dedup_corpus import (
        dedup_decisions,
        incremental_dedup_decisions,
        publish_index,
    )

    run1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different content about spark pipelines here"),
        ],
        "doc_id long, text string",
    )
    d1, _ = dedup_decisions(run1, threshold=0.5)
    idx = str(tmp_path / "index")
    publish_index(run1, d1, idx)

    run2 = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog tonight"),  # exact copy of 1
            (101, "the quick brown fox jumps over the lazy dog today"),    # near copy of 1
            (102, "entirely novel text that matches nothing else at all"),
        ],
        "doc_id long, text string",
    )
    d2, cross = incremental_dedup_decisions(run2, idx, threshold=0.5)
    rows = {r.doc_id: r for r in d2.collect()}
    assert not rows[100].keep and rows[100].cluster == 1  # exact cross hit
    assert not rows[101].keep and rows[101].cluster == 1  # fuzzy cross hit
    assert rows[102].keep and rows[102].cluster == 102    # fresh doc survives
    # evidence pairs point prior -> new
    ev = {(r.id_a, r.id_b) for r in cross.collect()}
    assert (1, 100) in ev and (1, 101) in ev


def test_incremental_dedup_repoints_intra_cluster_members(spark, tmp_path):
    """If new doc A is the intra-shard keeper of {A, B} and A flips to
    keep=False against prior keeper P, B's cluster must follow A to P
    (cluster always names a KEPT representative) — LSH banding is not
    transitive, so B need not hit P itself."""
    from jobs.dedup_corpus import (
        dedup_decisions,
        incremental_dedup_decisions,
        publish_index,
    )

    base = (
        "the quick brown fox jumps over the lazy dog tonight while "
        "rain falls gently on the quiet empty streets of the town"
    )
    run1 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    d1, _ = dedup_decisions(run1, threshold=0.5)
    idx = str(tmp_path / "index")
    publish_index(run1, d1, idx)

    # 100 = exact copy of prior 1 (cross hit), 101 = exact copy of 100
    # (intra pair, keeper 100) — after the cross hit, 101 must point
    # to 1, not to the dropped 100
    run2 = spark.createDataFrame(
        [(100, base), (101, base)], "doc_id long, text string"
    )
    d2, _ = incremental_dedup_decisions(run2, idx, threshold=0.5)
    rows = {r.doc_id: r for r in d2.collect()}
    assert not rows[100].keep and rows[100].cluster == 1
    assert not rows[101].keep and rows[101].cluster == 1


def test_incremental_dedup_never_rebands_prior_signatures(spark, tmp_path):
    """Scale guard (round-6 fix): the incremental plan bands ONLY the
    new shard — the index's signatures feed the Jaccard estimate
    (one scan, candidate-restricted) and the stored ``buckets`` table
    feeds candidate generation. The prior signatures parquet must
    appear at most once in the plan, and the buckets parquet must
    appear."""
    from jobs.dedup_corpus import (
        dedup_decisions,
        incremental_dedup_decisions,
        publish_index,
    )

    run1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    d1, _ = dedup_decisions(run1, threshold=0.5)
    idx = str(tmp_path / "index")
    publish_index(run1, d1, idx)
    assert (tmp_path / "index" / "buckets").exists()

    run2 = spark.createDataFrame(
        [(100, "totally different words entirely here now")],
        "doc_id long, text string",
    )
    d2, _ = incremental_dedup_decisions(run2, idx, threshold=0.5)
    # formatted explain prints one "Location: ... [path]" per scan
    plan = d2._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # exactly the two Jaccard-estimate legs (id_a/id_b) may scan the
    # prior signatures; the old union-re-banding path added a third
    # scan feeding the banding aggregate
    assert plan.count(f"{idx}/signatures") <= 2, plan
    assert f"{idx}/buckets" in plan, plan


def test_publish_index_accumulates_prior_keepers(spark, tmp_path):
    """Chained incremental runs: run3 --against run2's index must
    still catch duplicates of run1's content — publish_index in
    incremental mode unions the prior index into the published one
    (including when publishing over the --against path itself)."""
    from jobs.dedup_corpus import (
        dedup_decisions,
        incremental_dedup_decisions,
        publish_index,
    )

    day1 = "the quick brown fox jumps over the lazy dog tonight"
    run1 = spark.createDataFrame([(1, day1)], "doc_id long, text string")
    d1, _ = dedup_decisions(run1, threshold=0.5)
    idx = str(tmp_path / "index")
    publish_index(run1, d1, idx)

    run2 = spark.createDataFrame(
        [(100, "fresh second day content about spark planning")],
        "doc_id long, text string",
    )
    d2, _ = incremental_dedup_decisions(run2, idx, threshold=0.5)
    # publish over the SAME path (tmp-swap) with accumulation
    publish_index(run2, d2, idx, accumulate_from=idx)

    # day 3 carries a duplicate of day-1 content
    run3 = spark.createDataFrame([(200, day1)], "doc_id long, text string")
    d3, _ = incremental_dedup_decisions(run3, idx, threshold=0.5)
    rows = {r.doc_id: r for r in d3.collect()}
    assert not rows[200].keep and rows[200].cluster == 1


def test_incremental_dedup_rejects_id_collision(spark, tmp_path):
    import pytest as _pytest

    from jobs.dedup_corpus import (
        dedup_decisions,
        incremental_dedup_decisions,
        publish_index,
    )

    run1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    d1, _ = dedup_decisions(run1)
    idx = str(tmp_path / "index")
    publish_index(run1, d1, idx)
    clash = spark.createDataFrame(
        [(1, "some other text entirely")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="disjoint id ranges"):
        incremental_dedup_decisions(clash, idx)
