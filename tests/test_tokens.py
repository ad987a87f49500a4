"""Token-array analytics over the pre-tokenized sequence shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.dataops.tokens import (
    oov_rate,
    token_stats,
    tokenize_words,
    vocab_histogram,
)


def test_token_stats_basic(spark):
    df = spark.createDataFrame(
        [(1, [5, 5, 9, 2]), (2, [7]), (3, [])],
        "doc_id long, tokens array<int>",
    )
    rows = {r.doc_id: r for r in token_stats(df).collect()}
    assert rows[1].n_tok == 4 and rows[1].n_unique == 3
    assert rows[1].unique_ratio == 0.75
    assert (rows[1].max_token, rows[1].min_token) == (9, 2)
    assert rows[2].unique_ratio == 1.0
    assert rows[3].n_tok == 0 and rows[3].max_token is None
    assert rows[3].unique_ratio == 0.0  # guarded denominator


def test_oov_rate_grouped_and_global(spark):
    df = spark.createDataFrame(
        [("a", [1, 2, 99]), ("a", [3]), ("b", [99, 100])],
        "src string, tokens array<int>",
    )
    by = {r.src: r for r in oov_rate(df, 50, group_cols=("src",)).collect()}
    assert by["a"].n_oov == 1 and by["a"].n_tok == 4 and by["a"].oov_rate == 0.25
    assert by["b"].oov_rate == 1.0
    g = oov_rate(df, 50).collect()[0]
    assert g.n_oov == 3 and g.n_tok == 6 and g.oov_rate == 0.5


def test_vocab_histogram_topk(spark):
    df = spark.createDataFrame(
        [(1, [7, 7, 7, 3, 3, 5])], "doc_id long, tokens array<int>"
    )
    top = vocab_histogram(df, top_k=2).collect()
    assert [(r.token, r.freq) for r in top] == [(7, 3), (3, 2)]


def test_tokenize_words_modes(spark):
    df = spark.createDataFrame([("Hello  world hello",)], "text string")
    fast = df.select(tokenize_words(F.col("text")).alias("t")).first().t
    port = df.select(
        tokenize_words(F.col("text"), hash_mode="portable").alias("t")
    ).first().t
    for toks in (fast, port):
        assert len(toks) == 3
        assert toks[0] == toks[2]  # case-normalized duplicates agree
        assert all(0 <= x < 32768 for x in toks)


def test_vocab_histogram_partial_agg_plan(spark):
    """The explode → count plan must contain a partial aggregate before
    the exchange (map-side combine) — the property that bounds the
    shuffle by |vocab| instead of corpus token count."""
    df = spark.createDataFrame([(1, [1, 2, 2])], "doc_id long, tokens array<int>")
    plan = vocab_histogram(df)._jdf.queryExecution().executedPlan().toString()
    # tree dump order is final agg → Exchange → partial agg (leaf-last):
    # the partial_count below the exchange IS the map-side combine
    assert "partial_count" in plan
    assert plan.index("Exchange") < plan.index("partial_count")


def test_unigram_logprob_ranks_rarity(spark):
    from vector_spark.dataops.tokens import unigram_logprob

    # doc 1 = all common tokens, doc 2 = all rare tokens
    rows = [(1, [7] * 10), (2, [99, 98]), (3, [7] * 5 + [99])]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert out[1].mean_neg_logprob < out[3].mean_neg_logprob < out[2].mean_neg_logprob
    assert out[1].n_tok == 10 and out[2].n_tok == 2
    # scores are positive, finite
    assert all(0 < r.mean_neg_logprob < 50 for r in out.values())


def test_chunk_tokens_exact_reassembly(spark):
    """Blocks must reassemble the stream's exact concatenation — the
    north-rule token-array-equality invariant, asserted per block."""
    from vector_spark.dataops.tokens import chunk_tokens

    rows = [
        ("a", 1, list(range(0, 5))),      # stream a: 5 + 3 + 6 = 14 tokens
        ("a", 2, list(range(5, 8))),
        ("a", 3, list(range(8, 14))),
        ("b", 1, list(range(100, 109))),  # stream b: 9 tokens
        ("b", 2, []),                     # empty doc contributes nothing
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, tokens array<int>")
    out = chunk_tokens(df, 4, stream_cols=["source"], drop_last=False)
    blocks = {
        (r.source, r.block): (r.tokens, r.n_tok) for r in out.collect()
    }
    # stream a concatenation = 0..13 → blocks of 4: [0-3][4-7][8-11][12-13]
    assert blocks[("a", 0)] == ([0, 1, 2, 3], 4)
    assert blocks[("a", 1)] == ([4, 5, 6, 7], 4)   # doc 1 tail + doc 2 + doc 3 head
    assert blocks[("a", 2)] == ([8, 9, 10, 11], 4)
    assert blocks[("a", 3)] == ([12, 13], 2)       # partial tail kept
    assert blocks[("b", 0)] == ([100, 101, 102, 103], 4)
    assert blocks[("b", 2)] == ([108], 1)
    assert len(blocks) == 7


def test_chunk_tokens_drop_last_and_block_alignment(spark):
    from vector_spark.dataops.tokens import chunk_tokens

    rows = [("s", i, [i * 10 + j for j in range(3)]) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "source string, doc_id long, tokens array<int>")
    out = chunk_tokens(df, 8, stream_cols=["source"]).collect()  # 21 tokens → 2 full blocks
    assert sorted(r.block for r in out) == [0, 1]
    assert all(r.n_tok == 8 for r in out)
    concat = []
    for r in sorted(out, key=lambda r: r.block):
        concat.extend(r.tokens)
    expect = [i * 10 + j for i in range(1, 8) for j in range(3)]
    assert concat == expect[:16]


def test_chunk_tokens_sharded_parallel_windows(spark):
    """n_shards splits the stream into K independent window sorts;
    block ids restart per shard and reassembly holds within a shard."""
    from vector_spark.dataops.tokens import chunk_tokens

    rows = [("s", i, [i] * 5) for i in range(20)]
    df = spark.createDataFrame(rows, "source string, doc_id long, tokens array<int>")
    out = chunk_tokens(df, 5, stream_cols=["source"], n_shards=4, drop_last=False)
    assert "shard" in out.columns
    got = out.collect()
    # every doc is 5 tokens = exactly one block; with block_size 5 each
    # block is one doc's tokens — verify per-shard block ids are dense 0..k-1
    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r)
    assert sum(len(v) for v in by_shard.values()) == 20
    for shard, rs in by_shard.items():
        assert sorted(r.block for r in rs) == list(range(len(rs)))
        for r in rs:
            assert r.n_tok == 5 and len(set(r.tokens)) == 1


def test_chunk_tokens_property_vs_reference(spark):
    """Property check against a pure-Python reference: for random doc
    shapes (empty docs, exact-block docs, giant docs), the emitted
    blocks must equal chunking the concatenation of each stream's docs
    in id order. Deterministic example set — hypothesis's per-example
    Spark jobs are too slow for its shrinking loop."""
    from vector_spark.dataops.tokens import chunk_tokens

    cases = [
        # (block_size, lengths per doc on one stream)
        (4, [0]),
        (4, [4]),
        (4, [3, 1]),
        (5, [2, 2, 2, 2, 2]),
        (8, [20]),
        (7, [1, 0, 13, 7, 2]),
        (3, [9, 9, 9]),
        (16, [5, 5, 5]),  # total < block -> zero blocks with drop_last
    ]
    for bs, lens in cases:
        rows, nxt = [], 0
        for i, ln in enumerate(lens):
            rows.append(("s", i, list(range(nxt, nxt + ln))))
            nxt += ln
        df = spark.createDataFrame(
            rows, "source string, doc_id long, tokens array<int>"
        )
        got = {
            r.block: list(r.tokens)
            for r in chunk_tokens(df, bs, stream_cols=["source"]).collect()
        }
        stream = list(range(nxt))
        want = {
            b: stream[b * bs:(b + 1) * bs]
            for b in range(len(stream) // bs)
        }
        assert got == want, f"bs={bs} lens={lens}"


def test_bpe_encode_greedy_merge_order(spark):
    """Rank-greedy BPE vs a hand-computed expectation: lower-rank
    merges apply first, unknown symbols map to unk."""
    from vector_spark.dataops.tokens import bpe_encode

    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    # derived vocab: chars l,o,w,e,r -> 1..5; merges lo=6, low=7, er=8
    df = spark.createDataFrame(
        [(1, "low lower"), (2, "wool"), (3, None), (4, "LOW")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.tokens for r in bpe_encode(df, merges).collect()}
    assert out[1] == [7, 7, 8]            # "low" -> low; "lower" -> low+er
    assert out[2] == [3, 2, 2, 1]         # w o o l — no merges apply
    assert out[3] == []                   # null text -> empty
    assert out[4] == [7]                  # lowercased pre-tokenizer


def test_bpe_encode_explicit_vocab_and_unk(spark):
    from vector_spark.dataops.tokens import bpe_encode

    merges = [("a", "b")]
    vocab = {"ab": 10, "a": 11, "b": 12}
    df = spark.createDataFrame([(1, "ab ba xq")], "doc_id long, text string")
    out = bpe_encode(df, merges, vocab=vocab, unk_id=99).collect()[0].tokens
    assert out == [10, 12, 11, 99, 99]    # ab; b,a; x,q -> unk


def test_bpe_encode_feeds_token_ops(spark):
    """Raw text -> BPE tokens -> the existing token analytics — the
    full produce-then-consume path over the real documents table."""
    from vector_spark.dataops.tokens import bpe_encode, token_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d")]
    toks = bpe_encode(docs.select("doc_id", "text"), merges)
    stats = token_stats(toks.withColumn("doc_id", toks["doc_id"].cast("long")))
    rows = stats.collect()
    assert len(rows) == 500
    assert all(r.n_tok > 0 for r in rows)
    assert all(r.max_token is not None for r in rows)


def test_bigram_logprob_scores_order(spark):
    """Bigram LM distinguishes token ORDER where unigram stats cannot:
    a doc repeating the corpus's dominant transition scores lower
    (more probable) than the same multiset shuffled."""
    from vector_spark.dataops.tokens import bigram_logprob

    rows = [
        (1, [1, 2] * 10),          # follows the dominant 1->2 transition
        (2, [2, 1] * 10),          # same multiset, reversed transitions
        (3, [1, 2] * 10),
        (4, [1, 2, 1, 2, 1, 2]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    out = {r.doc_id: r for r in bigram_logprob(df, vocab_size=64).collect()}
    assert out[1].mean_neg_logprob < out[2].mean_neg_logprob
    assert out[1].n_bigrams == 19
    # single-token / empty docs produce no bigrams
    df2 = spark.createDataFrame(
        [(9, [5]), (10, [])], "doc_id long, tokens array<int>"
    )
    assert bigram_logprob(df2, vocab_size=64).count() == 0


def test_new_token_ops_survive_nulls(spark):
    """Engine invariant: malformed/null input is a per-row null or an
    absent row, never a job abort (ANSI mode semantics)."""
    from vector_spark.dataops.tokens import (
        bigram_logprob,
        bpe_encode,
        chunk_tokens,
    )

    df = spark.createDataFrame(
        [("s", 1, None), ("s", 2, [1, 2, 3]), (None, 3, [4, 5])],
        "source string, doc_id long, tokens array<int>",
    )
    # null tokens row contributes nothing; null stream key is its own group
    blocks = chunk_tokens(df, 2, stream_cols=["source"]).collect()
    assert all(r.n_tok == 2 for r in blocks)
    lm = bigram_logprob(df, vocab_size=64).collect()
    assert {r.doc_id for r in lm} == {2, 3}
    txt = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab")], "doc_id long, text string"
    )
    enc = {r.doc_id: r.tokens for r in bpe_encode(txt, [("a", "b")]).collect()}
    assert enc[1] == [] and enc[2] == [] and len(enc[3]) == 1


def test_bpe_train_learns_reference_merges(spark):
    """Weighted pair counting on the word histogram with lexicographic
    tie-break: hand-computed merge sequence on a tiny corpus (the×4,
    table×3, fast×3, slow×1, fable×1)."""
    from vector_spark.dataops.tokens import bpe_train

    df = spark.createDataFrame(
        [
            ("the table the table fast",),
            ("fast fast table the",),
            ("slow the fable",),
        ],
        "text string",
    )
    merges = bpe_train(df, 6, min_freq=1)
    # round 1: six pairs tie at 4 — lexicographic min is (a,b);
    # rounds 2-3 extend it through table/fable; round 4 ties resolve
    # to (h,e) because f-a dropped to 3 once fable became f+able
    assert merges == [
        ("a", "b", 4), ("ab", "l", 4), ("abl", "e", 4),
        ("h", "e", 4), ("t", "he", 4), ("a", "s", 3),
    ]


def test_bpe_train_overlapping_run_merges_left_to_right(spark):
    """'aaaa' under pair (a,a) must become [aa, aa] — the fold merges
    left-to-right non-overlapping (the merged symbol is never eligible
    as the left side of the same pair again)."""
    from vector_spark.dataops.tokens import bpe_encode, bpe_train

    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    merges = bpe_train(df, 1, min_freq=1)
    assert merges[0][:2] == ("a", "a")
    enc = bpe_encode(df, [("a", "a")], vocab={"a": 1, "aa": 2})
    assert enc.first().tokens == [2, 2, 2, 2]


def test_bpe_train_min_freq_stops_early(spark):
    """Every pair unique -> best freq 1 < min_freq=2 -> no merges."""
    from vector_spark.dataops.tokens import bpe_train

    df = spark.createDataFrame([("abc def",)], "text string")
    assert bpe_train(df, 4, min_freq=2) == []


def test_bpe_train_roundtrip_encode(spark):
    """Learned merges feed bpe_encode: frequent words collapse to
    single tokens, so the token count drops vs char count."""
    from pyspark.sql import functions as F

    from vector_spark.dataops.tokens import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [("data data data table table",), ("data table data",)],
        "text string",
    )
    merges = bpe_train(df, 8, min_freq=2)
    enc = bpe_encode(df, [(a, b) for a, b, _ in merges])
    n = enc.select(F.sum(F.size("tokens")).alias("n")).first().n
    # 8 merges cover 'data' (3 merges) and 'table' (4 merges):
    # every word is one token -> 8 tokens total
    assert n == 8


def test_bpe_train_property_vs_reference(spark):
    """Property check against a pure-Python BPE learner (count pairs
    weighted by word freq → lexicographic-tie argmax → left-to-right
    non-overlapping merge): deterministic corpus set covering runs,
    ties, shared prefixes/suffixes, and single-char words."""
    from collections import Counter

    from vector_spark.dataops.tokens import bpe_train

    def py_bpe(texts, n_merges, min_freq):
        words = Counter()
        for t in texts:
            for w in " ".join(t.lower().split()).split(" "):
                if w:
                    words[w] += 1
        parts = {w: list(w) for w in words}
        out = []
        for _ in range(n_merges):
            pc = Counter()
            for w, ps in parts.items():
                for i in range(len(ps) - 1):
                    pc[(ps[i], ps[i + 1])] += words[w]
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < min_freq:
                break
            (a, b), c = best
            out.append((a, b, c))
            for w, ps in parts.items():
                i, np_ = 0, []
                while i < len(ps):
                    if i + 1 < len(ps) and ps[i] == a and ps[i + 1] == b:
                        np_.append(a + b)
                        i += 2
                    else:
                        np_.append(ps[i])
                        i += 1
                parts[w] = np_
        return out

    corpora = [
        ["aaa aaaa a", "aa aaa"],
        ["abab abab", "baba ab"],
        ["xy xy yx", "xyxy yxyx xy"],
        ["the quick brown fox", "the lazy dog the fox"],
        ["mississippi mississippi", "missive kiss"],
    ]
    for texts in corpora:
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = bpe_train(df, 5, min_freq=1)
        want = py_bpe(texts, 5, 1)
        assert got == want, f"{texts}: {got} != {want}"


def test_bpe_train_driver_path_matches_distributed(spark):
    """Hybrid-path pin: the driver-side merge loop (histogram under
    SPARK_GRAFT_BPE_DRIVER_WORDS) and the distributed per-iteration
    loop (forced via driver_max_words=0) must learn the IDENTICAL
    merge table — counts, tie-breaks, merge application, early stop."""
    from vector_spark.dataops.tokens import bpe_train

    corpora = [
        ["the table the table fast", "fast fast table the", "slow the fable"],
        ["aaaa aaa aa", "abab baba"],
        ["mississippi mississippi kiss", "missive kiss kiss"],
    ]
    for texts in corpora:
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        local = bpe_train(df, 6, min_freq=1)  # default: driver path
        dist = bpe_train(df, 6, min_freq=1, driver_max_words=0)
        assert local == dist, f"{texts}: {local} != {dist}"
