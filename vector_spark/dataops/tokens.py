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

import os

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


def chunk_tokens(
    df: DataFrame,
    block_size: int,
    stream_cols: list[str] = ("source",),
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    n_shards: int | None = None,
    shard_expr: Column | None = None,
    drop_last: bool = True,
) -> DataFrame:
    """Concat-and-chunk MATERIALIZATION — the standard GPT-style
    training-data prep: concatenate each stream's token sequences in
    deterministic (stream, id) order and emit fixed-length blocks of
    exactly ``block_size`` tokens. Where ``pack_sequences`` computes
    the bin/offset ASSIGNMENT (metadata), this materializes the block
    token arrays themselves, so downstream exact token-array equality
    can be asserted per block.

    Distributed shape (no per-token rows, no UDF):

    1. one running-sum window per (stream[, shard]) gives each
       document its global start position ``cum_before``;
    2. each document is sliced array-side into the blocks it touches
       (``sequence(first_block, last_block)`` × ``slice`` — explode
       factor per document is ceil(n/B)+1, bounded and tiny);
    3. one hash-aggregate keyed by (stream[, shard], block) reorders
       the pieces by position (``array_sort`` on struct — collect_list
       order is nondeterministic under parallel merge) and flattens
       them into the block's token array.

    The only shuffles are the window exchange and the block
    hash-aggregate; block keys are fine-grained (10^15 tokens /
    block_size keys), so no skew. ``n_shards``/``shard_expr`` split a
    too-large stream into K parallel window sorts exactly as in
    ``pack_sequences`` (block ids then restart per shard and ``shard``
    is emitted).

    ``drop_last=True`` (trainer convention) drops each stream's final
    partial block, so every output row has exactly ``block_size``
    tokens. Sizing note: every (stream, shard) unit loses its tail —
    expected waste ≈ streams × n_shards × block_size/2 tokens — so
    pick ``n_shards`` for per-shard token mass ≫ block_size (at the
    10^12-sequence target any K does; on a small corpus K=1). A
    too-large K silently truncates a small corpus to zero blocks.

    Output: (*stream_cols[, shard], block, tokens, n_tok).
    """
    from pyspark.sql import Window

    parts = list(stream_cols)
    extra: list[str] = []
    if shard_expr is not None or (n_shards is not None and n_shards > 1):
        if shard_expr is None:
            shard_expr = F.pmod(
                F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards)
            )
        df = df.withColumn("shard", shard_expr)
        parts.append("shard")
        extra = ["shard"]
    w = (
        Window.partitionBy(*parts)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = F.col(tokens_col)
    n = F.size(t).cast("long")
    cum_before = F.coalesce(
        F.sum(F.size(t).cast("long")).over(w), F.lit(0).cast("long")
    )
    b = F.lit(int(block_size)).cast("long")
    bs = int(block_size)
    placed = df.select(
        *stream_cols,
        *extra,
        cum_before.alias("_cumb"),
        n.alias("_n"),
        t.alias("_t"),
    ).filter(F.col("_n") > 0)
    # slice the document into per-block pieces, array-side. Block ids
    # use integer `div`, NOT floor(x / B): `/` on longs is DOUBLE
    # division, which silently loses exactness past 2^53 — real at
    # 10^15-token per-shard running totals.
    pieces = placed.select(
        *stream_cols,
        *extra,
        F.explode(
            F.transform(
                F.sequence(
                    F.expr(f"_cumb div {bs}"),
                    F.expr(f"(_cumb + _n - 1) div {bs}"),
                ),
                lambda blk: F.struct(
                    blk.alias("block"),
                    # position of this piece inside its block — unique
                    # per (block, document), so the sort key below is
                    # total
                    F.greatest(
                        F.col("_cumb") - blk * b, F.lit(0).cast("long")
                    ).alias("pos"),
                    F.slice(
                        F.col("_t"),
                        (
                            F.greatest(
                                blk * b - F.col("_cumb"), F.lit(0).cast("long")
                            )
                            + 1
                        ).cast("int"),
                        (
                            F.least(
                                (blk + 1) * b - F.col("_cumb"), F.col("_n")
                            )
                            - F.greatest(
                                blk * b - F.col("_cumb"), F.lit(0).cast("long")
                            )
                        ).cast("int"),
                    ).alias("piece"),
                ),
            )
        ).alias("p"),
    )
    blocks = (
        pieces.groupBy(*stream_cols, *extra, F.col("p.block").alias("block"))
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("p.pos", "p.piece"))
                    ),
                    lambda x: x["piece"],
                )
            ).alias(tokens_col)
        )
        .withColumn("n_tok", F.size(F.col(tokens_col)))
    )
    if drop_last:
        blocks = blocks.filter(F.col("n_tok") == int(block_size))
    return blocks


def _bpe_train_from_histogram(
    hist: list[tuple[str, int]],
    n_merges: int,
    min_freq: int,
    us: str,
) -> list[tuple[str, str, int]]:
    """Driver-side BPE merge loop over a collected word histogram —
    exact replica of the distributed iteration's semantics: pair
    counts weighted by word freq, argmax with ties on the \\x1e-joined
    pair string ascending (the same total order ``orderBy(F.asc(pair))``
    applies), left-to-right non-overlapping merge application, early
    stop below ``min_freq``."""
    parts: list[list[str]] = [list(w) for w, _ in hist]
    freqs = [c for _, c in hist]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for ps, c in zip(parts, freqs):
            for i in range(len(ps) - 1):
                k = (ps[i], ps[i + 1])
                pc[k] = pc.get(k, 0) + c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + us + kv[0][1]))
        if c < min_freq:
            break
        merges.append((a, b, c))
        for wi, ps in enumerate(parts):
            if a not in ps:
                continue
            i, np_ = 0, []
            while i < len(ps):
                if i + 1 < len(ps) and ps[i] == a and ps[i + 1] == b:
                    np_.append(a + b)
                    i += 2
                else:
                    np_.append(ps[i])
                    i += 1
            parts[wi] = np_
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
    driver_max_words: int | None = None,
) -> list[tuple[str, str, int]]:
    """LEARN a BPE merge table from the corpus — the counterpart of
    ``bpe_encode`` (which applies one). Returns
    ``[(left, right, pair_freq), ...]`` in rank order; feed the
    ``(left, right)`` pairs to ``bpe_encode`` to tokenize.

    Scale shape (the classic Sennrich trick, distributed): the corpus
    collapses to its WORD HISTOGRAM first (one explode +
    partial-agg — the only pass whose exchange depends on corpus
    size; everything after is bounded by |distinct words|). Each of
    the ``n_merges`` iterations then:

    - counts adjacent symbol pairs weighted by word frequency
      (``zip_with`` on shifted slices → explode → hash-agg bounded by
      |distinct pairs|),
    - takes the argmax as a 1-row ``orderBy(...).limit(1)`` collect
      (TakeOrdered — no global sort materializes), ties broken
      lexicographically so the result is engine-portable,
    - applies the winning merge map-only via a string fold
      (``F.aggregate`` over the symbol array: the pending symbol is
      the tail of a \\x1f-joined accumulator; merging appends the
      right part with no separator). No Python UDF anywhere.

    The histogram persists once; each iteration re-persists the
    updated parts (O(n_merges) cached KB-to-MB frames, previous one
    unpersisted) so lineage stays flat. Stops early when the best
    pair's frequency drops below ``min_freq``.

    PRODUCTION MERGE COUNTS (hybrid path): a real 30k-merge tokenizer
    train would be 30k sequential Spark jobs (~hours of pure
    scheduling at ~0.4 s/round) while the per-iteration DATA is only
    the word histogram. So when the histogram has at most
    ``driver_max_words`` distinct words (default 500k, env
    ``SPARK_GRAFT_BPE_DRIVER_WORDS``; 0 disables) it is collected once
    and the merge loop runs driver-side in pure Python — identical
    counts, identical lexicographic tie-break (pairs compared as the
    same \\x1e-joined string Spark orders), identical left-to-right
    non-overlapping merge application, so the learned table is
    bit-identical to the distributed loop (pytest-pinned on a shared
    prefix). The ONE corpus-sized pass (the histogram) stays
    distributed either way; the distributed per-iteration loop remains
    the path for histograms past the threshold."""
    from vector_spark.dataops.dedup import normalize_text

    SEP = "\x1f"
    US = "\x1e"
    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(normalize_text(F.col(text_col)), " "),
                    lambda w: w != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if driver_max_words is None:
        driver_max_words = int(
            os.environ.get("SPARK_GRAFT_BPE_DRIVER_WORDS", "500000")
        )
    if driver_max_words > 0:
        # ONE job: limit(N+1) tells us whether the histogram fits AND
        # delivers it when it does (N+1 rows back == did not fit).
        hist = words.limit(driver_max_words + 1).collect()
        if len(hist) <= driver_max_words:
            return _bpe_train_from_histogram(
                [(r["word"], int(r["freq"])) for r in hist],
                int(n_merges),
                int(min_freq),
                US,
            )
    # initial parts: the word's chars joined on SEP
    cur = words.select(
        "word",
        "freq",
        F.array_join(
            F.filter(F.split(F.col("word"), ""), lambda c: c != ""), SEP
        ).alias("parts"),
    ).persist()
    merges: list[tuple[str, str, int]] = []
    prev = None
    try:
        for _ in range(int(n_merges)):
            arr = F.split(F.col("parts"), SEP)
            m = F.greatest(F.size(arr) - 1, F.lit(0))
            pair_col = F.zip_with(
                F.slice(arr, 1, m),
                F.slice(arr, 2, m),
                lambda x, y: F.concat(x, F.lit(US), y),
            )
            best = (
                cur.select(F.explode(pair_col).alias("pair"), "freq")
                .groupBy("pair")
                .agg(F.sum("freq").alias("c"))
                .orderBy(F.desc("c"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            # this collect materialized cur's cache, so its parent
            # (kept alive one extra round to avoid a dedicated
            # materialization job per iteration) can go now
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best or best[0]["c"] < min_freq:
                break
            a, b = best[0]["pair"].split(US)
            merges.append((a, b, int(best[0]["c"])))

            def _make_apply(a, b):
                def _apply(acc, x):
                    pending_is_a = (acc == a) | acc.endswith(SEP + a)
                    return F.when(
                        pending_is_a & (x == b), F.concat(acc, F.lit(b))
                    ).otherwise(F.concat(acc, F.lit(SEP), x))

                return _apply

            arr2 = F.split(F.col("parts"), SEP)
            nxt = cur.select(
                "word",
                "freq",
                F.aggregate(
                    F.slice(arr2, 2, F.greatest(F.size(arr2) - 1, F.lit(0))),
                    F.element_at(arr2, 1),
                    _make_apply(a, b),
                ).alias("parts"),
            ).persist()
            prev, cur = cur, nxt
    finally:
        cur.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def derive_bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic vocabulary from a BPE merge table: single chars of
    all merge parts first (order of first appearance), then merge
    outputs in table order; ids start at 1 (0 = unk). This is the
    exact derivation ``bpe_encode`` applies when ``vocab=None`` —
    exposed so oracles/tools can replicate it."""
    symbols: list[str] = []
    for a, b in merges:
        for ch in (*a, *b):
            if ch not in symbols:
                symbols.append(ch)
    for a, b in merges:
        if a + b not in symbols:
            symbols.append(a + b)
    return {s: i + 1 for i, s in enumerate(symbols)}


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int] | None = None,
    text_col: str = "text",
    out_col: str = "tokens",
    unk_id: int = 0,
) -> DataFrame:
    """Byte-pair-encoding tokenization over a merge table — raw text →
    ``array<int>`` token ids, so the engine can PRODUCE the
    pre-tokenized sequence shape, not just consume it.

    BPE's rank-greedy merge loop is inherently sequential per word —
    no Column expression can express it — so this is one of the
    engine's few sanctioned Python escape hatches: ``mapInPandas``
    (one Arrow crossing per batch, never per row), with two
    scale-critical properties:

    - the merge-rank dict and vocab ship ONCE per executor via the
      closure (broadcast pickling), not per batch;
    - per-batch WORD CACHING: a word's encoding depends only on the
      word, and natural-language batches repeat words heavily (Zipf),
      so each distinct word is merged once per batch — typically a
      5-20× cut in merge-loop work.

    ``vocab`` maps merged symbols to ids; ``None`` derives a
    deterministic vocabulary from the merge table (single chars of
    all merge parts first, then merge outputs, in table order).
    Unknown symbols map to ``unk_id``. Word boundaries are the
    pre-tokenizer: lowercase + whitespace split (``normalize_text``),
    matching the engine's other text ops.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    if vocab is None:
        vocab = derive_bpe_vocab(merges)  # 0 = unk

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema
        if f.name != out_col
    )
    schema = f"{out_fields}, {out_col} array<int>"

    def encode_word(word: str, cache: dict) -> list[int]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        parts = list(word)
        while len(parts) > 1:
            best, best_rank = None, None
            for j in range(len(parts) - 1):
                r = ranks.get((parts[j], parts[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = j, r
            if best is None:
                break
            parts[best:best + 2] = [parts[best] + parts[best + 1]]
        ids = [vocab.get(p, unk_id) for p in parts]
        cache[word] = ids
        return ids

    def op(batches):
        import re as _re

        for pdf in batches:
            cache: dict = {}
            toks = []
            for text in pdf[text_col]:
                if text is None:
                    toks.append([])
                    continue
                words = _re.sub(r"\s+", " ", str(text).lower()).strip().split(" ")
                ids: list[int] = []
                for w in words:
                    if w:
                        ids.extend(encode_word(w, cache))
                toks.append(ids)
            out = pdf.drop(columns=[out_col], errors="ignore")
            out[out_col] = toks
            yield out

    return df.mapInPandas(op, schema=schema)


def bigram_logprob(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    vocab_size: int = 32768,
    staging_path: str | None = None,
) -> DataFrame:
    """Per-sequence mean bigram negative log-probability under the
    corpus's own transition model — the stronger perplexity-style
    quality signal (unigram_logprob scores token rarity; this scores
    token ORDER: shuffled boilerplate that unigram statistics cannot
    distinguish scores high here).

    P(w | prev) = (c(prev,w) + α) / (c(prev) + α·V), add-α smoothed.

    Scale shape: bigram keys are packed into ONE long
    (prev · V + w) array-side via ``zip_with`` on shifted slices (the
    HOF-lambda-safe form — see SCALE.md on per-element re-evaluation),
    so the frequency tables come from the same explode →
    partial-hash-aggregate shape as ``vocab_histogram``: the exchange
    is bounded by DISTINCT bigrams per partition (sparse: ≪ V²),
    never corpus token count. Scoring joins both frequency tables
    back; the bigram table can exceed broadcast size at real vocab —
    it joins on the packed key (uniform), the unigram table
    broadcasts. Output: (id_col, n_bigrams, mean_neg_logprob).
    Sequences shorter than 2 tokens produce no bigrams and are absent
    from the output (no defined transition to score).
    """
    t = F.col(tokens_col)
    n = F.size(t)
    m = F.greatest(n - 1, F.lit(0))
    # Packed-key invariant: token ids MUST lie in [0, vocab_size) or
    # prev*V+w collides silently (a token from a larger vocab, e.g.
    # bpe_encode-derived ids, would corrupt the transition model, not
    # error). Enforced per element JVM-side — two comparisons inside
    # the same codegen stage, no extra pass or action.
    def _pack(a, b):
        ok = (
            (a >= 0) & (a < vocab_size) & (b >= 0) & (b < vocab_size)
        )
        return F.when(
            F.assert_true(
                ok,
                F.lit(
                    f"bigram_logprob: token id outside [0, {int(vocab_size)})"
                    " — raise vocab_size to cover the tokenizer's id space"
                ),
            ).isNull(),
            a.cast("long") * vocab_size + b.cast("long"),
        )

    pair_keys = F.zip_with(F.slice(t, 1, m), F.slice(t, 2, m), _pack)
    # Stage the tokenize/zip_with lineage ONCE: three consumers read
    # this frame (bigram freq table, unigram freq table, per-doc
    # scoring pass), so without a cut the upstream tokenization
    # executes 3×. Same rule as the dedup shingle frame: persist by
    # default, parquet-stage when the corpus exceeds cluster memory.
    base = df.select(F.col(id_col), t.alias("_toks"), pair_keys.alias("_pairs"))
    if staging_path is not None:
        base.write.mode("overwrite").parquet(staging_path)
        base = df.sparkSession.read.parquet(staging_path)
    else:
        base = base.persist()
    pairs = base.select(F.col(id_col), F.col("_pairs"))

    big_freq = (
        pairs.select(F.explode("_pairs").alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("big_freq"))
    )
    uni_freq = (
        base.select(F.explode("_toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("uni_freq"))
    )

    occ = pairs.select(
        F.col(id_col),
        F.explode("_pairs").alias("bigram"),
    ).withColumn("prev", F.expr(f"bigram div {int(vocab_size)}"))
    a = F.lit(float(alpha))
    av = F.lit(float(alpha) * float(vocab_size))
    scored = (
        occ.join(big_freq, "bigram", "left")
        .join(F.broadcast(uni_freq.withColumnRenamed("token", "prev")), "prev", "left")
        .select(
            F.col(id_col),
            (
                -F.log(
                    (F.coalesce(F.col("big_freq"), F.lit(0)) + a)
                    / (F.coalesce(F.col("uni_freq"), F.lit(0)) + av)
                )
            ).alias("_nlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_nlp"), 6).alias("mean_neg_logprob"),
    )
