"""Fixture generator invariants (FIXTURES.md F1): determinism,
schema, skew shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.fixtures import HOT_SOURCE, VOCAB_SIZE, raw_logs, sequences


def test_sequences_schema_and_determinism(spark):
    df1 = sequences(spark, 500)
    df2 = sequences(spark, 500)
    assert df1.schema == df2.schema
    assert df1.columns == ["doc_id", "tokens", "n_tok", "source"]
    # identical across runs AND partitioning
    h1 = df1.select(F.md5(F.concat_ws(",", "doc_id", F.concat_ws("|", "tokens")))).collect()
    df3 = sequences(spark, 500, num_partitions=3)
    h3 = df3.select(F.md5(F.concat_ws(",", "doc_id", F.concat_ws("|", "tokens")))).collect()
    assert sorted(map(str, h1)) == sorted(map(str, h3))


def test_sequences_invariants(spark):
    df = sequences(spark, 2000)
    bad = df.filter(
        (F.size("tokens") != F.col("n_tok"))
        | (F.col("n_tok") < 1)
        | (F.col("n_tok") > 2048)
        | F.exists("tokens", lambda t: (t < 0) | (t >= VOCAB_SIZE))
    )
    assert bad.count() == 0


def test_sequences_skew(spark):
    df = sequences(spark, 5000)
    hot = df.filter(F.col("source") == HOT_SOURCE).count()
    assert 0.3 < hot / 5000 < 0.5  # ~40% hot source
    assert df.select("source").distinct().count() == 20


def test_raw_logs_families(spark):
    df = raw_logs(spark, 400)
    fams = {r.fmt for r in df.select("fmt").distinct().collect()}
    assert fams == {"apache", "kv", "json", "logfmt"}
    apache = df.filter(F.col("fmt") == "apache").first().message
    assert '"' in apache and "[" in apache
