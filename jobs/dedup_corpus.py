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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--minhash-k", type=int, default=16)
    ap.add_argument("--bands", type=int, default=8)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("vector_spark_dedup_corpus")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    docs = spark.read.parquet(args.input)
    decisions, evidence = dedup_decisions(
        docs,
        threshold=args.threshold,
        minhash_k=args.minhash_k,
        bands=args.bands,
    )
    evidence.write.mode("overwrite").parquet(f"{args.output}/clusters")
    decisions.write.mode("overwrite").parquet(f"{args.output}/decisions")
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
