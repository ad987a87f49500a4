"""Cluster entrypoint: whole-corpus deduplication — the global pass
`prepare_training_data.py` runs AFTER (its per-shard dedup only
catches intra-shard repeats; this job sees every document at once).

    spark-submit --py-files vector_spark.zip jobs/dedup_corpus.py \\
        --input  /data/documents        # parquet: (doc_id, text, ...) \\
        --output /data/dedup            # decisions/ + clusters/ parquet \\
        --threshold 0.7                 # est. Jaccard to call a near-dup \\
        --minhash-k 16 --bands 8        # LSH signature/banding shape \\
        --staging /data/dedup_staging   # optional shingle-frame staging

Pipeline (all composed from vector_spark.dataops.dedup — every stage
is the oracle-gated operator, see SCALE.md for the shuffle budget):

  1. exact dedup — one hash groupBy on the normalized-text md5;
  2. MinHash signatures → banded LSH buckets → candidate pairs
     (equi-join on (band, band_hash); the all-pairs join never
     materializes);
  3. Jaccard verification on the candidates from the signature table
     alone (documents are not re-read);
  4. connected components over exact + verified near-dup pairs
     (iterative min-label propagation, no driver-side graph);
  5. keeper resolution (min_id policy — join-free).

Output: ``<output>/decisions`` — one row PER DOCUMENT
(doc_id, cluster, keep boolean); downstream jobs semi-join keepers.
``<output>/clusters`` — the pair evidence (id_a, id_b, est_jaccard)
for audit. Deterministic: same input → same decisions (hash-seeded
minhash, no RNG).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dedup_decisions(
    docs: DataFrame,
    threshold: float = 0.7,
    minhash_k: int = 16,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Whole-corpus dedup plan. Returns (decisions, pair_evidence):
    decisions has one row per input document with its cluster id and a
    keep flag; documents in no duplicate relation keep trivially and
    carry their own id as cluster."""
    from vector_spark.dataops.dedup import (
        dup_clusters,
        exact_dedup,
        minhash_jaccard_estimate,
        minhash_lsh_candidates,
        minhash_signatures,
        normalize_text,
        resolve_keepers,
    )

    ids = docs.select(F.col(id_col).cast("long").alias(id_col))

    # exact duplicates: every doc sharing a fingerprint pairs with the
    # group's min id (star edges are enough for connected components)
    fp = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
    )
    exact_groups = exact_dedup(docs, text_col=text_col, id_col=id_col)
    exact_pairs = (
        fp.join(exact_groups, "fingerprint")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(
            F.col("keep_id").cast("long").alias("id_a"),
            F.col(id_col).cast("long").alias("id_b"),
            F.lit(1.0).alias("est_jaccard"),
        )
    )

    # near-duplicates: signatures → banded buckets → verified pairs
    sigs = minhash_signatures(
        docs.withColumn(id_col, F.col(id_col).cast("long")),
        k=minhash_k,
        text_col=text_col,
        id_col=id_col,
    )
    cands = minhash_lsh_candidates(
        sigs, bands=bands, rows_per_band=max(1, minhash_k // bands)
    )
    near_pairs = minhash_jaccard_estimate(sigs, cands, threshold=threshold)

    evidence = exact_pairs.unionByName(near_pairs)
    clusters = dup_clusters(evidence)
    keepers = resolve_keepers(clusters)

    # every input doc gets a decision row; docs outside any duplicate
    # relation are their own cluster and always keep
    decisions = (
        ids.join(keepers.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster"), F.col(id_col)).alias("cluster"),
            F.coalesce(F.col("keep"), F.lit(True)).alias("keep"),
        )
    )
    return decisions, evidence


def publish_index(
    docs: DataFrame,
    decisions: DataFrame,
    path: str,
    minhash_k: int = 16,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    accumulate_from: str | None = None,
) -> None:
    """Publish this run's dedup INDEX for future incremental runs:
    the keepers' exact fingerprints, minhash signatures AND banded
    LSH buckets (``(id, band, band_hash)``). Only keepers are
    indexed — a dropped doc's keeper already represents its
    neighborhood, so the index stays O(distinct content).

    The stored buckets are what keeps the incremental path
    O(new shard): a later run bands only ITS shard and equi-joins
    against these buckets — the accumulated corpus is never re-banded
    (round-5 finding: re-banding the whole prior index each nightly
    run was the one cost term that grew with index age).

    ``accumulate_from``: a prior index to UNION into the published one
    (incremental mode) — without it, chaining run3 --against run2's
    index silently loses run1's keepers. When the destination equals
    ``accumulate_from`` the write goes to a temp sibling first and is
    swapped in, so the lazily-read prior parquet is never overwritten
    mid-read."""
    import shutil

    from vector_spark.dataops.dedup import (
        minhash_lsh_bands,
        minhash_signatures,
        normalize_text,
    )

    spark = docs.sparkSession
    keep = decisions.filter("keep").select(F.col(id_col).cast("long").alias(id_col))
    kept_docs = docs.withColumn(id_col, F.col(id_col).cast("long")).join(
        keep, id_col, "left_semi"
    )
    fp = kept_docs.select(
        F.col(id_col).cast("long").alias("keep_id"),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
    )
    sigs = minhash_signatures(
        kept_docs, k=minhash_k, text_col=text_col, id_col=id_col
    )
    rows_per_band = max(1, minhash_k // bands)
    buckets = minhash_lsh_bands(sigs, bands=bands, rows_per_band=rows_per_band)
    if accumulate_from:
        fp = spark.read.parquet(f"{accumulate_from}/fingerprints").unionByName(fp)
        sigs = spark.read.parquet(f"{accumulate_from}/signatures").unionByName(sigs)
        prior_buckets = _read_index_buckets(
            spark, accumulate_from, minhash_k, bands
        )
        buckets = prior_buckets.unionByName(buckets)
    dest = path
    swap = accumulate_from and os.path.realpath(path) == os.path.realpath(
        accumulate_from
    )
    if swap:
        dest = path.rstrip("/") + ".tmp_publish"
        shutil.rmtree(dest, ignore_errors=True)
    fp.write.mode("overwrite").parquet(f"{dest}/fingerprints")
    sigs.write.mode("overwrite").parquet(f"{dest}/signatures")
    buckets.write.mode("overwrite").parquet(f"{dest}/buckets")
    with open(os.path.join(dest, "index_meta.json"), "w") as f:
        json.dump({"minhash_k": minhash_k, "bands": bands}, f)
    if swap:
        old = path.rstrip("/") + ".tmp_old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(dest, path)
        shutil.rmtree(old, ignore_errors=True)


def _read_index_buckets(
    spark: SparkSession, index_path: str, minhash_k: int, bands: int
) -> DataFrame:
    """The index's banded buckets — stored if published with a
    matching (minhash_k, bands) shape, else derived by banding the
    stored signatures (pre-round-6 indexes; pays the one-off banding
    but still never generates prior-vs-prior pairs)."""
    from vector_spark.dataops.dedup import minhash_lsh_bands

    meta_path = os.path.join(index_path, "index_meta.json")
    if os.path.exists(os.path.join(index_path, "buckets")) and os.path.exists(
        meta_path
    ):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("minhash_k") == minhash_k and meta.get("bands") == bands:
            return spark.read.parquet(f"{index_path}/buckets")
    sigs = spark.read.parquet(f"{index_path}/signatures")
    return minhash_lsh_bands(
        sigs, bands=bands, rows_per_band=max(1, minhash_k // bands)
    )


def incremental_dedup_decisions(
    new_docs: DataFrame,
    index_path: str,
    threshold: float = 0.7,
    minhash_k: int = 16,
    bands: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Cross-RUN dedup: decide the NEW shard against a previously
    published index WITHOUT re-reading the old corpus — the
    production arrival pattern (yesterday's 100 TB is indexed;
    today's shard dedups in one pass over itself plus the index).

    1. intra-shard decisions via the full ``dedup_decisions`` plan;
    2. exact cross hits: equi-join of new fingerprints against the
       index's fingerprint store (semi-join-sized — no text re-read);
    3. fuzzy cross hits: the NEW shard alone is banded and its buckets
       equi-join the index's STORED buckets (round 6 — previously the
       whole prior index's signatures were re-banded every run and
       prior-vs-prior candidate pairs were generated only to be
       anti-joined away, a cost that grew with index age; now per-run
       cost is O(new shard) regardless). The Jaccard estimate then
       reads the prior signatures only for candidate ids (semi-join);
    4. a new doc hit by either path flips to keep=False with the
       PRIOR keeper as its cluster (min over hits, deterministic),
       and any intra-shard cluster that pointed at a re-pointed
       keeper follows it to the prior keeper (cluster always names a
       KEPT representative).

    Returns (decisions for the new shard, cross-pair evidence).
    ASSUMES id spaces are disjoint across runs (the index stores raw
    ids) — enforced with a cheap max/min guard like
    contamination_fuzzy's OFFSET contract."""
    from vector_spark.dataops.dedup import (
        minhash_jaccard_estimate,
        minhash_lsh_bands,
        minhash_signatures,
        normalize_text,
    )

    spark = new_docs.sparkSession
    prior_fp = spark.read.parquet(f"{index_path}/fingerprints")
    prior_sigs = spark.read.parquet(f"{index_path}/signatures")

    new_ids = new_docs.select(F.col(id_col).cast("long").alias(id_col))
    overlap = (
        new_ids.join(
            prior_sigs.select(F.col("id").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        ).count()
    )
    if overlap:
        raise ValueError(
            f"incremental dedup: {overlap} new ids collide with the "
            "index's id space — runs must use disjoint id ranges"
        )

    decisions, evidence = dedup_decisions(
        new_docs,
        threshold=threshold,
        minhash_k=minhash_k,
        bands=bands,
        text_col=text_col,
        id_col=id_col,
    )

    # exact cross hits
    fp_new = new_docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
    )
    exact_cross = fp_new.join(prior_fp, "fingerprint").select(
        F.col("keep_id").alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.lit(1.0).alias("est_jaccard"),
    )

    # fuzzy cross hits: band ONLY the new shard, probe the stored
    # buckets — prior-vs-prior pairs can never form, and the prior
    # signatures are read once, restricted to candidate ids
    rows_per_band = max(1, minhash_k // bands)
    # staged (same lineage-cut as minhash_lsh_candidates' reuse): the
    # new shard's signatures feed banding AND both estimate legs; the
    # candidate pairs feed the estimate and the prior-sig semi-join —
    # without the cuts each consumer re-runs the shingle pipeline and
    # re-scans the index buckets
    sigs_new = minhash_signatures(
        new_docs.withColumn(id_col, F.col(id_col).cast("long")),
        k=minhash_k,
        text_col=text_col,
        id_col=id_col,
    ).persist()
    new_banded = minhash_lsh_bands(
        sigs_new, bands=bands, rows_per_band=rows_per_band
    )
    prior_banded = _read_index_buckets(
        spark, index_path, minhash_k, bands
    )
    fuzzy_cands = (
        prior_banded.select(
            F.col("id").alias("id_a"), "band", "band_hash"
        )
        .join(
            new_banded.select(F.col("id").alias("id_b"), "band", "band_hash"),
            ["band", "band_hash"],
        )
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    est_sigs = prior_sigs.join(
        fuzzy_cands.select(F.col("id_a").alias("id")).distinct(),
        "id",
        "left_semi",
    ).unionByName(sigs_new)
    fuzzy_cross = minhash_jaccard_estimate(
        est_sigs, fuzzy_cands, threshold=threshold
    )

    # staged: consumed by hits, the keeper re-pointing join, and the
    # returned evidence — bounded by the cross-pair count
    cross = exact_cross.unionByName(fuzzy_cross).persist()
    # one decision per hit new doc: drop it, cluster = min prior keeper
    hits = cross.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("_prior_cluster")
    )
    # intra-shard members whose cluster was a re-pointed keeper must
    # follow it: if new doc A (intra keeper of {A, B}) flips to prior
    # keeper P, B's cluster=A would name a DROPPED doc — LSH banding is
    # not transitive, so B need not hit P itself. Join the cluster
    # column against the hits and coalesce members through to P.
    keeper_moves = hits.select(
        F.col(id_col).alias("_moved_keeper"),
        F.col("_prior_cluster").alias("_keeper_prior"),
    )
    decisions = (
        decisions.join(hits, id_col, "left")
        .join(
            keeper_moves,
            F.col("cluster") == F.col("_moved_keeper"),
            "left",
        )
        .select(
            id_col,
            F.coalesce(
                F.col("_prior_cluster"), F.col("_keeper_prior"), F.col("cluster")
            ).alias("cluster"),
            (F.col("_prior_cluster").isNull() & F.col("keep")).alias("keep"),
        )
    )
    return decisions, cross


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--minhash-k", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    ap.add_argument("--against", default=None,
                    help="prior run's published index dir (incremental mode)")
    ap.add_argument("--publish-index", default=None,
                    help="publish this run's keeper index here for future runs")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("vector_spark_dedup_corpus")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    docs = spark.read.parquet(args.input)
    if args.against:
        decisions, evidence = incremental_dedup_decisions(
            docs,
            args.against,
            threshold=args.threshold,
            minhash_k=args.minhash_k,
            bands=args.bands,
        )
    else:
        decisions, evidence = dedup_decisions(
            docs,
            threshold=args.threshold,
            minhash_k=args.minhash_k,
            bands=args.bands,
        )
    evidence.write.mode("overwrite").parquet(f"{args.output}/clusters")
    decisions.write.mode("overwrite").parquet(f"{args.output}/decisions")
    if args.publish_index:
        publish_index(docs, decisions, args.publish_index,
                      minhash_k=args.minhash_k, bands=args.bands,
                      accumulate_from=args.against)
    d = spark.read.parquet(f"{args.output}/decisions")
    total = d.count()
    kept = d.filter("keep").count()
    print(
        json.dumps(
            {"documents": total, "kept": kept, "dropped": total - kept}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
