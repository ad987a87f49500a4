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
