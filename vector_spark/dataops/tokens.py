"""Token-array analytics — statistics over the pre-tokenized training
sequences the pipeline targets (doc_id, tokens array<int32>, n_tok,
source; BASELINE.json input_hint).

Per-sequence stats are pure array expressions (map-only, no shuffle);
corpus-level vocabulary aggregation is explode → hash-aggregate with
map-side partial combine, the canonical Spark shape for counting 10^14
token occurrences: each of the 10^12 sequences contributes its local
counts before anything shuffles, so the exchange carries at most
|vocab| rows per partition, not |tokens|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_stats(
    df: DataFrame,
    tokens_col: str = "tokens",
    keep_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Per-sequence token statistics: length, distinct count, unique
    ratio (type-token ratio), max token id (vocab-bound witness).
    One projection — no shuffle, no UDF."""
    t = F.col(tokens_col)
    n = F.size(t)
    n_unique = F.size(F.array_distinct(t))
    return df.select(
        *keep_cols,
        n.alias("n_tok"),
        n_unique.alias("n_unique"),
        F.round(n_unique / F.greatest(n, F.lit(1)), 6).alias("unique_ratio"),
        F.array_max(t).alias("max_token"),
        F.array_min(t).alias("min_token"),
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int,
    tokens_col: str = "tokens",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Fraction of token occurrences outside [0, vocab_size) —
    per group or corpus-wide. The per-row OOV count is computed
    array-side (size of a filter), so the aggregate sums two longs per
    sequence: no explode, no per-token rows anywhere."""
    t = F.col(tokens_col)
    oov = F.size(F.filter(t, lambda x: (x < 0) | (x >= vocab_size)))
    per_row = df.select(
        *group_cols, oov.alias("_oov"), F.size(t).alias("_n")
    )
    aggs = [
        F.sum("_oov").alias("n_oov"),
        F.sum("_n").alias("n_tok"),
        F.round(F.sum("_oov") / F.greatest(F.sum("_n"), F.lit(1)), 6).alias(
            "oov_rate"
        ),
    ]
    if group_cols:
        return per_row.groupBy(*group_cols).agg(*aggs)
    return per_row.agg(*aggs)


def vocab_histogram(
    df: DataFrame,
    tokens_col: str = "tokens",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus token-frequency table (token, freq), optionally top-K.

    Explode → groupBy(token): Catalyst plans a partial hash aggregate
    before the exchange, so the shuffle is bounded by vocabulary size
    per partition (vocabularies are ~10^5, trivially broadcastable)
    regardless of corpus token count. Top-K is TakeOrdered — per-
    partition heaps, no global sort."""
    freq = (
        df.select(F.explode(F.col(tokens_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if top_k is not None:
        freq = freq.orderBy(F.desc("freq"), "token").limit(top_k)
    return freq


def tokenize_words(
    text: Column, vocab_size: int = 32768, hash_mode: str = "xxhash64"
) -> Column:
    """Deterministic word→int32 'tokenizer' (hash mod vocab): the
    test/bench stand-in that turns the documents table into the
    pre-tokenized (tokens array<int32>) shape of the target Iceberg
    table. Real corpora arrive pre-tokenized; this exists so every
    token operator is exercised end-to-end on synthetic data.

    ``hash_mode='portable'`` uses a char-polynomial both DuckDB and
    Spark can evaluate identically (for oracle gates); xxhash64 is the
    JVM-fast default."""
    from vector_spark.dataops.dedup import normalize_text

    words = F.split(normalize_text(text), " ")
    if hash_mode == "portable":
        tok = lambda w: F.pmod(  # noqa: E731
            F.length(w) * 31
            + F.ascii(F.substring(w, 1, 1)) * 7
            + F.ascii(F.substring(w, -1, 1)),
            F.lit(vocab_size),
        ).cast("int")
    else:
        tok = lambda w: F.pmod(F.xxhash64(w), F.lit(vocab_size)).cast("int")  # noqa: E731
    return F.transform(F.filter(words, lambda w: w != ""), tok)


def unigram_logprob(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-sequence mean unigram negative log-probability under the
    corpus's own token distribution — the cheap perplexity-style
    quality signal (documents of improbable tokens score high;
    boilerplate scores low).

    Two-pass shape: (1) corpus frequency table via the partial-agg
    histogram (shuffle bounded by |vocab|); (2) explode → broadcast
    join tokens to their frequencies (vocab is ~10^5 rows → broadcast,
    the 10^14-token side never shuffles for the join) → one per-doc
    aggregate. ``alpha`` is add-alpha smoothing so unseen-in-corpus
    tokens (possible when scoring a subset) stay finite.

    Output: (id_col, n_tok, mean_neg_logprob).
    """
    freqs = vocab_histogram(df, tokens_col)
    # corpus total + vocab size as a broadcast 1-row frame: no driver
    # action serializes ahead of the scoring job (the old shape ran a
    # collect() and a count() as two blocking jobs first)
    scalars = freqs.agg(
        (
            F.coalesce(F.sum("freq"), F.lit(0)).cast("double")
            + F.lit(alpha) * F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double")
        ).alias("_denom")
    )
    occ = df.select(
        F.col(id_col), F.explode(F.col(tokens_col)).alias("token")
    )
    scored = (
        occ.join(F.broadcast(freqs), "token", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("freq"), F.lit(0)) + F.lit(alpha))
                    / F.col("_denom")
                )
            ).alias("_nlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.round(F.avg("_nlp"), 6).alias("mean_neg_logprob"),
    )
