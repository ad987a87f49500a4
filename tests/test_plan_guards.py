"""Plan-quality guard over the ENTIRE driver window: every one of the
50 artifact gates is analyzed (not executed) and its physical plan
checked for the scale anti-patterns this repo has individually
eliminated — sort-based aggregation where a hash table suffices, and
undocumented cartesian products. Catches regressions the per-operator
plan tests miss when a gate's composition changes."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# gates whose plan legitimately contains a cartesian product:
#   - ann_topk folds the brute-force cosine baseline (documented
#     cross-validation-only; the LSH/IVF paths are the scale path)
#   - broadcast of a 1-row scalar frame plans as BroadcastNestedLoopJoin,
#     which is fine (bounded side is 1 row) — only CartesianProduct
#     (shuffle-based all-pairs) is flagged
CARTESIAN_OK = {"ann_topk"}

# percentile_approx / collect_* are TypedImperativeAggregate →
# ObjectHashAggregate; none of the window gates should ever fall back
# to SortAggregate (see SCALE.md round-4 findings)
SORT_AGG_OK: set[str] = set()


def _window_gates():
    import __spark_entry__ as entrymod

    return list(entrymod.queries().items())


@pytest.mark.parametrize(
    "name,fn", _window_gates(), ids=[n for n, _ in _window_gates()]
)
def test_window_gate_plan_quality(spark, name, fn):
    if name.startswith("stream_"):
        pytest.skip("streaming gates exercise micro-batch plans")
    if name == "resumable_run":
        pytest.skip("writes through the checkpoint runner, not one plan")
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in SORT_AGG_OK:
        assert "SortAggregate" not in plan, f"{name}: sort-based aggregate"
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: all-pairs join"


def test_bigram_logprob_stages_tokenize_subtree(spark):
    """The tokenize/zip_with lineage feeding bigram_logprob is read by
    three consumers (bigram freq, unigram freq, scoring); the op must
    cut it with a persist so it executes once — the plan should read
    the staged frame (InMemoryTableScan) everywhere and never re-run
    the zip_with packing outside the cached subtree."""
    from pyspark.sql import functions as F

    from vector_spark.dataops.tokens import bigram_logprob

    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [2, 3]), (3, [7])], "doc_id long, tokens array<int>"
    )
    out = bigram_logprob(df, vocab_size=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("InMemoryTableScan")
    assert scans >= 2, f"expected >=2 cached reads, got {scans}:\n{plan}"
    # every zip_with mention must sit inside a cached-relation body —
    # i.e. no consumer recomputes the packing from the raw source
    # (the cached plan prints its child, so zip_with can APPEAR, but
    # only at/under an InMemoryRelation node)
    first_cache = plan.find("InMemoryRelation")
    assert first_cache != -1
    assert "zip_with" not in plan[:first_cache], (
        "tokenize subtree re-executed outside cache"
    )


def test_bigram_logprob_rejects_out_of_vocab_ids(spark):
    """Packed-key invariant guard: a token id >= vocab_size must fail
    loudly (silent prev*V+w collisions corrupt the transition model)."""
    import pyspark

    from vector_spark.dataops.tokens import bigram_logprob

    df = spark.createDataFrame(
        [(1, [1, 99]), (2, [2, 3])], "doc_id long, tokens array<int>"
    )
    out = bigram_logprob(df, vocab_size=16)
    with pytest.raises(Exception, match="vocab_size|assert"):
        out.collect()
