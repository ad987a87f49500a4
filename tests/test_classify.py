"""Model-based quality filtering: hashed features, closed-form NB
training, broadcast-join scoring."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.dataops.classify import (
    BIAS_FEATURE,
    hash_features,
    score_classifier,
    train_nb_classifier,
)


def _featurize(df, **kw):
    return df.withColumn("features", hash_features(F.col("text"), **kw))


def test_hash_features_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([("Hello  world again",), ("x",), ("",)], "text string")
    out = df.select(
        hash_features(F.col("text"), n_features=64, bigrams=True).alias("f")
    ).collect()
    # 3 unigrams + 2 bigrams; 1 unigram + 0 bigrams; empty
    assert len(out[0].f) == 5
    assert len(out[1].f) == 1
    assert out[2].f == []
    assert all(0 <= v < 64 for v in out[0].f)


def test_train_weights_separate_classes(spark):
    rows = [
        (True, "good clean prose here"),
        (True, "good thoughtful prose"),
        (False, "spam spam buy now"),
        (False, "buy spam now cheap"),
    ]
    df = _featurize(
        spark.createDataFrame(rows, "label boolean, text string"),
        n_features=4096, bigrams=False, hash_mode="portable",
    )
    w = {r.feature: r.weight for r in train_nb_classifier(
        df, "label", n_features=4096).collect()}
    good = df.filter("label").select(F.explode("features").alias("f")).collect()
    bad = df.filter("NOT label").select(F.explode("features").alias("f")).collect()
    good_only = {r.f for r in good} - {r.f for r in bad}
    bad_only = {r.f for r in bad} - {r.f for r in good}
    assert good_only and bad_only
    assert all(w[f] > 0 for f in good_only)
    assert all(w[f] < 0 for f in bad_only)
    assert BIAS_FEATURE in w and abs(w[BIAS_FEATURE]) < 1e-9  # balanced classes


def test_score_ranks_and_sigmoid_bounds(spark):
    rows = [
        (1, True, "good clean prose here today"),
        (2, True, "good thoughtful prose writing"),
        (3, False, "spam spam buy now cheap"),
        (4, False, "buy spam now cheap deal"),
    ]
    df = _featurize(
        spark.createDataFrame(rows, "doc_id long, label boolean, text string"),
        n_features=4096, bigrams=True, hash_mode="portable",
    )
    weights = train_nb_classifier(df, "label", n_features=4096)
    scored = {r.doc_id: r for r in score_classifier(df, weights).collect()}
    assert all(0.0 <= r.score <= 1.0 for r in scored.values())
    # training-set separation: every positive doc outscores every negative
    assert min(scored[1].score, scored[2].score) > max(
        scored[3].score, scored[4].score
    )
    # unseen features at score time contribute zero, not null
    extra = _featurize(
        spark.createDataFrame(
            [(9, "entirely novel vocabulary zzz qqq")], "doc_id long, text string"
        ),
        n_features=4096, bigrams=True, hash_mode="portable",
    )
    s9 = score_classifier(extra, weights).collect()[0]
    assert s9.logit is not None and 0.0 <= s9.score <= 1.0


def test_score_plan_broadcasts_weights(spark):
    df = _featurize(
        spark.createDataFrame(
            [(1, True, "a b c"), (2, False, "d e f")],
            "doc_id long, label boolean, text string",
        ),
        n_features=256, bigrams=False,
    )
    weights = train_nb_classifier(df, "label", n_features=256)
    plan = (
        score_classifier(df, weights)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
