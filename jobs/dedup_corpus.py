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
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Publish this run's dedup INDEX for future incremental runs:
    the keepers' exact fingerprints and minhash signatures. Only
    keepers are indexed — a dropped doc's keeper already represents
    its neighborhood, so the index stays O(distinct content)."""
    from vector_spark.dataops.dedup import minhash_signatures, normalize_text

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
    fp.write.mode("overwrite").parquet(f"{path}/fingerprints")
    sigs.write.mode("overwrite").parquet(f"{path}/signatures")


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
    3. fuzzy cross hits: the index's SIGNATURES union the new shard's,
       through the same oracle-gated banding + estimate chain, kept
       only where exactly one side is new (prior-vs-prior pairs were
       settled when the index was published);
    4. a new doc hit by either path flips to keep=False with the
       PRIOR keeper as its cluster (min over hits, deterministic).

    Returns (decisions for the new shard, cross-pair evidence).
    ASSUMES id spaces are disjoint across runs (the index stores raw
    ids) — enforced with a cheap max/min guard like
    contamination_fuzzy's OFFSET contract."""
    from vector_spark.dataops.dedup import (
        minhash_jaccard_estimate,
        minhash_lsh_candidates,
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

    # fuzzy cross hits: union signatures, band, keep new-vs-prior pairs
    sigs_new = minhash_signatures(
        new_docs.withColumn(id_col, F.col(id_col).cast("long")),
        k=minhash_k,
        text_col=text_col,
        id_col=id_col,
    )
    all_sigs = prior_sigs.unionByName(sigs_new)
    cands = minhash_lsh_candidates(
        all_sigs, bands=bands, rows_per_band=max(1, minhash_k // bands)
    )
    est = minhash_jaccard_estimate(all_sigs, cands, threshold=threshold)
    new_only = new_ids.withColumnRenamed(id_col, "nid")
    fuzzy_cross = (
        est.join(new_only, est.id_b == F.col("nid"), "left_semi")
        .join(
            new_only,
            est.id_a == F.col("nid"),
            "left_anti",  # id_a must be PRIOR (a < b ordering puts smaller first)
        )
        .unionByName(
            est.join(new_only, est.id_a == F.col("nid"), "left_semi")
            .join(new_only, est.id_b == F.col("nid"), "left_anti")
            .select(
                F.col("id_b").alias("id_a"),
                F.col("id_a").alias("id_b"),
                "est_jaccard",
            )
        )
    )

    cross = exact_cross.unionByName(fuzzy_cross)
    # one decision per hit new doc: drop it, cluster = min prior keeper
    hits = cross.groupBy(F.col("id_b").alias(id_col)).agg(
        F.min("id_a").alias("_prior_cluster")
    )
    decisions = (
        decisions.join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_prior_cluster"), F.col("cluster")).alias("cluster"),
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
                      minhash_k=args.minhash_k)
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
