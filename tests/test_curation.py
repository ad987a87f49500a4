"""Curation operators: PII scrubbing, contamination check, stratified
sampling — semantics + scale-shape invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.dataops.curation import (
    contamination_check,
    pii_scrub,
    stratified_sample,
)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex.co and 192.168.0.1 twice 10.0.0.255"),
            (2, "call 555-123-4567 card 4111111111111111"),
            (3, "clean text with number 42"),
        ],
        "id long, text string",
    )
    out = pii_scrub(df, "text").orderBy("id").collect()
    assert out[0].text == "mail <EMAIL> and <IP> twice <IP>"
    assert (out[0].n_email, out[0].n_ipv4) == (1, 2)
    assert out[1].text == "call <PHONE> card <NUM>"
    assert (out[1].n_phone, out[1].n_longnum) == (1, 1)
    assert out[2].text == "clean text with number 42"
    assert out[2].n_email == out[2].n_ipv4 == out[2].n_phone == out[2].n_longnum == 0


def test_pii_scrub_new_column_keeps_original(spark):
    df = spark.createDataFrame([(1, "x@y.io")], "id long, text string")
    out = pii_scrub(df, "text", out_col="clean").collect()[0]
    assert out.text == "x@y.io" and out.clean == "<EMAIL>"


def test_contamination_check(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox jumps high today"),  # overlap
            (2, "completely different words entirely here now"),  # none
            (3, "the quick brown fox jumps over the lazy dog"),  # full copy
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in contamination_check(docs, bench, n=5).collect()
    }
    assert 2 not in rows  # no shared 5-grams -> not reported
    assert rows[3].contamination == 1.0  # verbatim copy
    assert 0 < rows[1].contamination < 1.0
    # sanity: counts are per distinct gram
    assert rows[3].n_contaminated == rows[3].n_grams


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        F.element_at(
            F.array(F.lit("web"), F.lit("code"), F.lit("books"), F.lit("other")),
            (F.pmod(F.col("id"), F.lit(4)) + 1).cast("int"),
        ).alias("src"),
    )
    rates = {"web": 0.8, "code": 0.25, "books": 0.0}
    out = stratified_sample(
        df, "src", rates, key_col="k", default_rate=0.5, hash_mode="md5"
    )
    got = (
        out.groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), F.first("sample_rate").alias("r"))
        .collect()
    )
    by = {r.src: r for r in got}
    assert "books" not in by  # rate 0 -> nothing survives
    assert abs(by["web"].n / 1000 - 0.8) < 0.06 and by["web"].r == 0.8
    assert abs(by["code"].n / 1000 - 0.25) < 0.06 and by["code"].r == 0.25
    assert abs(by["other"].n / 1000 - 0.5) < 0.06 and by["other"].r == 0.5
    # determinism: same inputs -> identical survivor set
    again = stratified_sample(
        df, "src", rates, key_col="k", default_rate=0.5, hash_mode="md5"
    )
    assert out.select("k").subtract(again.select("k")).count() == 0
    assert again.select("k").subtract(out.select("k")).count() == 0


def test_stratified_sample_xxhash_mode(spark):
    df = spark.range(2000).select(
        F.col("id").alias("k"), F.lit("web").alias("src")
    )
    out = stratified_sample(
        df, "src", {"web": 0.3}, key_col="k", rate_field=None
    )
    n = out.count()
    assert abs(n / 2000 - 0.3) < 0.05
    assert "sample_rate" not in out.columns


def test_temperature_rates_math(spark):
    df = spark.createDataFrame(
        [("en",)] * 64 + [("fr",)] * 16 + [("zh",)] * 4, "lang string"
    )
    from vector_spark.dataops.curation import mix_sample, temperature_rates

    rates = temperature_rates(df.select("lang"), "lang", alpha=0.5)
    # closed form sqrt(min_c / c): power-of-two counts make it exact
    assert rates == {"en": 0.25, "fr": 0.5, "zh": 1.0}
    # alpha=1 -> proportional sampling = keep everything
    assert temperature_rates(df, "lang", alpha=1.0) == {
        "en": 1.0, "fr": 1.0, "zh": 1.0
    }
    # target_fraction scales total kept mass
    r = temperature_rates(df, "lang", alpha=0.5, target_fraction=0.25)
    exp_total = 64 * r["en"] + 16 * r["fr"] + 4 * r["zh"]
    assert abs(exp_total - 0.25 * 84) < 1e-6

    from pyspark.sql import functions as F

    keyed = df.withColumn("k", F.monotonically_increasing_id())
    out = mix_sample(keyed, "lang", key_col="k", alpha=0.5, hash_mode="md5")
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept.get("zh") == 4  # rate 1.0 keeps all


def test_null_inputs_never_abort(spark):
    """Engine-wide invariant: dirty rows (null text/key/strata/tokens)
    are per-row nulls or drops, never a job abort."""
    from vector_spark.dataops.curation import (
        contamination_check,
        pii_scrub,
        stratified_sample,
    )
    from vector_spark.dataops.textstats import repetition_signals, winnow_fingerprints
    from vector_spark.dataops.tokens import oov_rate, token_stats, tokenize_words

    docs = spark.createDataFrame(
        [(1, None, None), (2, "ok text here", "web")],
        "doc_id long, text string, source string",
    )
    assert pii_scrub(docs, "text").count() == 2
    assert contamination_check(docs, docs.limit(1), n=2).count() >= 0
    assert stratified_sample(
        docs, "source", {"web": 1.0}, key_col="doc_id"
    ).count() == 1  # null strata dropped, web kept
    assert repetition_signals(docs).count() == 2
    assert winnow_fingerprints(docs).count() >= 0
    toks = spark.createDataFrame(
        [(1, None), (2, [1, 2])], "doc_id long, tokens array<int>"
    )
    assert token_stats(toks).count() == 2
    assert oov_rate(toks, 10).count() == 1
    assert docs.select(tokenize_words(F.col("text"))).count() == 2


def test_contamination_fuzzy_catches_paraphrase(spark):
    """Near-dup decontamination flags a lightly-edited benchmark item
    that exact n-gram overlap would need a verbatim 8-gram to catch."""
    from vector_spark.dataops.curation import contamination_fuzzy

    bench_text = (
        "what is the capital of france the capital of france is paris "
        "which is located on the seine river in the north of the country"
    )
    leaked = bench_text.replace("located on", "situated on")  # paraphrased
    docs = spark.createDataFrame(
        [
            (1, leaked),
            (2, "a completely unrelated training document about spark plans "
                "and shuffle exchanges in distributed query engines"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(7, bench_text)], "doc_id long, text string"
    )
    out = contamination_fuzzy(docs, bench, threshold=0.4).collect()
    flagged = {(r.doc_id, r.bench_id) for r in out}
    assert (1, 7) in flagged
    assert all(r.doc_id != 2 for r in out)
    assert all(0.0 <= r.est_jaccard <= 1.0 for r in out)
