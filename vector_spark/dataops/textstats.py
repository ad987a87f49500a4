"""Text analysis for training-data curation: language ID heuristic,
quality scoring, token counting, document fingerprinting.

All pure Column expressions (portable to the DuckDB oracle); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.dataops.dedup import normalize_text

EN_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that"]

# BPE-ish pre-tokenization: letter runs, digit runs, single non-space
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def word_count(col: Column) -> Column:
    return F.size(F.split(normalize_text(col), " "))


def stopword_ratio(col: Column, stopwords: list[str] = EN_STOPWORDS) -> Column:
    words = F.split(normalize_text(col), " ")
    sw = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return F.round(sw / F.greatest(F.size(words), F.lit(1)), 6)


def punct_ratio(col: Column) -> Column:
    total = F.greatest(F.length(col), F.lit(1))
    punct = F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", ""))
    return F.round(punct / total, 6)


def lang_id(col: Column, threshold: float = 0.03) -> Column:
    """n-gram/stopword heuristic: enough English stopwords → 'en'."""
    return F.when(stopword_ratio(col) >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def quality_score(col: Column) -> Column:
    """[0,1] heuristic: length, mean word length sanity, low punct."""
    words = word_count(col)
    mean_wlen = F.length(col) / F.greatest(words, F.lit(1))
    len_ok = F.least(words / F.lit(50.0), F.lit(1.0))
    wlen_ok = F.when((mean_wlen >= 3) & (mean_wlen <= 12), F.lit(1.0)).otherwise(F.lit(0.3))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    return F.round((len_ok + wlen_ok + punct_ok) / 3.0, 6)


def token_count(col: Column, pattern: str = TOKEN_REGEX) -> Column:
    """BPE-ish pre-token count via regexp extraction."""
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint (md5 of canonical form)."""
    return F.md5(normalize_text(col))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        word_count(c).alias("n_words"),
        token_count(c).alias("n_tokens"),
        stopword_ratio(c).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        lang_id(c).alias("lang_guess"),
        quality_score(c).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the standard rolling-hash fingerprint for plagiarism/
    near-dup detection): hash every k-gram of words, slide a window of
    ``window`` positions, keep each window's MINIMUM hash, distinct.
    Two documents sharing text of length >= k + window - 1 words are
    GUARANTEED to share a fingerprint.

    Shape at scale: the per-window minima are computed ARRAY-SIDE —
    ``grams`` is already a per-doc array, so each window min is
    ``array_min(slice(...))`` over a materialized gram-hash column and
    the ONLY shuffle in the plan is the final ``distinct`` (the
    explode → Window-exchange shape this replaces shuffled every
    (doc, pos, hash) row once more just to order it per doc). Hashes
    are md5-hex prefixes (portable to the DuckDB oracle verbatim).
    Output (id, fingerprint) distinct pairs.
    """
    from vector_spark.dataops.dedup import kgram_positions

    # materialize the word array BEFORE the gram lambda references it:
    # an expression referenced inside a higher-order-function lambda is
    # re-evaluated per element (no CSE across lambda scopes), so an
    # inline split(normalize(text)) re-splits the whole document for
    # every gram — O(n²) characters. As a projected attribute it is
    # computed once per row (measured 4.5× on the sf0.1 bench).
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
    )
    words = F.col("_w")
    # indexed transform, not posexplode: generator pos columns have
    # proven unreliable over scan sources (see sources/readers.py note);
    # kgram_positions guards the shorter-than-k case (empty, no crash)
    grams = F.transform(
        kgram_positions(words, k),
        lambda i: F.substring(F.md5(F.concat_ws(" ", F.slice(words, i, k))), 1, 16),
    )
    # same reasoning for the gram-hash array: as an attribute it is
    # computed once per row and CollapseProject keeps the projection
    # (non-cheap, multi-ref)
    tmp = base.select("id", grams.alias("_gh"))
    n = F.size(F.col("_gh"))
    # one window START per gram position — windows past the last full
    # one are partial (slice truncates); the guarantee needs only full
    # windows, but partial tails keep short docs fingerprintable —
    # same choice on both engines. sequence(1,0) DESCENDS: guard empty.
    starts = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    wmins = F.array_distinct(
        F.transform(starts, lambda j: F.array_min(F.slice(F.col("_gh"), j, window)))
    )
    return (
        tmp.select("id", F.explode(wmins).alias("fingerprint"))
        # array_distinct above pre-shrinks per-doc (consecutive windows
        # usually share a min — the winnowing density property), so the
        # global distinct shuffles far fewer rows
        .distinct()
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style quality/repetition signals (Rae et al. 2021 §A1.1,
    public): per-document duplicate n-gram fractions, mean word length,
    symbol-to-word ratio, bullet/ellipsis line ratios. One map-only
    projection — every signal is an array/string expression over the
    materialized word array (no explode, no shuffle, no UDF), so the
    filter runs at scan speed on 10^12 documents.

    Columns: n_words, mean_word_len, symbol_word_ratio, bullet_ratio,
    ellipsis_ratio, dup_2gram_frac, dup_3gram_frac (1 - distinct/total
    n-grams; high values = templated/repetitive text).

    FILTERING ON THESE COLUMNS: persist (or stage) this frame before a
    ``filter`` that references the signal columns — PushDownPredicate
    substitutes each referenced alias's DEFINITION into the predicate,
    re-evaluating the gram subtree once per reference (measured ~5×,
    0.5 s → 17.9 s at sf0.1). The persist is the same lineage cut the
    dedup ops use (``reuse_shingles``/``staging_path``).
    """
    from vector_spark.dataops.dedup import kgram_positions, normalize_text

    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    )
    w = F.col("_w")
    n_words = F.size(w)

    def dup_frac(n: int) -> Column:
        grams = F.transform(
            kgram_positions(w, n), lambda i: F.concat_ws(" ", F.slice(w, i, n))
        )
        total = F.size(grams)
        return F.when(
            total > 0,
            F.round(
                (total - F.size(F.array_distinct(grams))) / total, 6
            ),
        ).otherwise(F.lit(0.0))

    lines = F.col("_lines")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]"))
    )
    ellipsis = F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("...")))
    symbols = F.length(F.regexp_replace(F.col("_txt"), r"[A-Za-z0-9\s]", ""))
    return base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(
            F.length(F.concat_ws("", w)) / F.greatest(n_words, F.lit(1)), 6
        ).alias("mean_word_len"),
        F.round(symbols / F.greatest(n_words, F.lit(1)), 6).alias(
            "symbol_word_ratio"
        ),
        F.round(bullet / n_lines, 6).alias("bullet_ratio"),
        F.round(ellipsis / n_lines, 6).alias("ellipsis_ratio"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
    )


def winnow_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_fingerprint_df: int = 50,
) -> DataFrame:
    """MOSS-style near-duplicate PAIRS from winnowing fingerprints:
    documents sharing ≥ ``min_shared`` fingerprints (each fingerprint
    witnesses a shared passage of ≥ k + window - 1 words).

    Scale shape: self-equi-join on the fingerprint — a fingerprint in
    d documents fans out d² candidate rows, so BOILERPLATE fingerprints
    (license headers, navigation chrome) are pruned first via a
    document-frequency cap (the stop-shingle strategy from
    ngram_jaccard, same reasoning). The pair counts then aggregate with
    map-side partials keyed by (id_a, id_b) — uniform unless the corpus
    is one giant template, which the cap bounds.
    """
    fp = winnow_fingerprints(df, text_col, id_col, k, window)
    fp = fp.persist()
    rare = (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_fingerprint_df)
        .select("fingerprint")
    )
    pruned = fp.join(rare, "fingerprint")
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    stream_cols: list[str] = ("source",),
    id_col: str = "doc_id",
    n_col: str = "n_tok",
    n_shards: int | None = None,
    shard_expr: Column | None = None,
) -> DataFrame:
    """Concat-and-chunk example packing — the LLM-training step that
    lays variable-length tokenized documents into fixed-capacity
    training bins: documents are concatenated in deterministic
    (stream, id) order and split every ``max_tokens`` tokens, so a
    document straddling a boundary continues into the next bin
    (GPT-style packing; zero padding waste, exact by construction).

    Output: one row per document — (stream cols, id, n, ``bin`` =
    floor(cum_before / max_tokens), ``offset`` = cum_before %
    max_tokens) where cum_before is the running token total of all
    earlier documents in the stream. A trainer shards bins directly;
    ``offset`` says where the document's tokens start inside its
    first bin.

    Scale shape: ONE window (running sum) per stream, ordered by id —
    streams are the parallel unit. When one logical source is too
    large for a single task's sort, pass ``n_shards=K``: a
    deterministic ``shard = pmod(xxhash64(id), K)`` column is derived
    and added to the window partition, giving K parallel window sorts
    per stream. Bins are then identified by (*stream_cols, shard,
    bin) — bin ids restart per shard, and ``shard`` is emitted so the
    mapping stays explicit. Packing remains deterministic: the same
    (input, K) always yields the same bins.
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
    cum_before = F.coalesce(
        F.sum(F.col(n_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    # integer `div`, not floor(x / N): `/` on longs is DOUBLE division,
    # which loses exactness past 2^53 (reachable by a per-stream
    # running token total at the 10^12-sequence target)
    return df.select(
        *stream_cols,
        *extra,
        id_col,
        F.col(n_col),
        cum_before.alias("_cumb"),
    ).select(
        *stream_cols,
        *extra,
        id_col,
        F.col(n_col),
        F.expr(f"_cumb div {int(max_tokens)}").alias("bin"),
        (F.col("_cumb") % max_tokens).cast("long").alias("offset"),
    )


# Character-trigram profiles for n-gram language ID (Cavnar-Trenkle
# style, public method): hand-ranked high-frequency trigrams per
# language; weight = rank score (higher = more characteristic).
# Trigrams include word-boundary spaces (text is normalized to
# single-space separators first).
LANG_TRIGRAM_PROFILES: dict[str, dict[str, int]] = {
    "en": {" th": 10, "the": 10, "he ": 8, "ing": 8, "ng ": 6, "and": 8,
           " an": 6, " of": 7, "of ": 6, "ion": 5, " to": 6, "ed ": 5,
           "er ": 4, " in": 5, "ent": 3},
    "de": {"en ": 10, "er ": 8, "der": 9, " de": 7, "ein": 8, " ei": 6,
           "ich": 9, "sch": 9, "ch ": 7, "und": 9, " un": 6, "die": 8,
           "ung": 8, "ie ": 6, "cht": 7},
    "fr": {" de": 9, "de ": 8, "es ": 8, " le": 9, "le ": 8, "ent": 7,
           "la ": 7, " la": 7, "que": 8, " qu": 6, "ait": 7, "les": 7,
           "ais": 7, "eur": 6, "tio": 5},
    "es": {" de": 9, "de ": 8, "os ": 9, "la ": 8, " la": 8, "ión": 9,
           "ció": 9, "que": 8, " qu": 6, "ado": 8, "ar ": 7, " el": 8,
           "el ": 7, "as ": 7, "nte": 6},
}

#: CJK unified ideographs — unsegmented scripts bypass trigram scoring
_CJK_RE = r"[一-鿿]"


def lang_id_ngram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_score: int = 8,
) -> DataFrame:
    """Profile-based n-gram language ID (Cavnar-Trenkle style) —
    upgrades the stopword-threshold ``lang_id`` heuristic to scored
    classification over character-trigram profiles.

    Plan shape: trigrams are extracted ARRAY-SIDE from the normalized
    text (sequence + substring over an attribute — no per-element
    re-evaluation), exploded, and joined to the broadcast profile
    table (|profiles| ≈ dozens of rows); one per-doc aggregate computes
    each language's score as a conditional sum (fixed small language
    set — no pivot), and the winner is a chained greatest/when. CJK
    text bypasses trigram scoring via a codepoint-ratio check
    (unsegmented script; trigram profiles assume space-delimited
    words). Docs scoring below ``min_score`` on every profile → 'unk'.

    Output: (id_col, lang, lang_score). Deterministic; ties break by
    language name order (documented).
    """
    from vector_spark.dataops.dedup import normalize_text

    spark = df.sparkSession
    prof_rows = [
        (lang, tri, w)
        for lang, prof in sorted(LANG_TRIGRAM_PROFILES.items())
        for tri, w in sorted(prof.items())
    ]
    profiles = spark.createDataFrame(
        prof_rows, "lang string, trigram string, w int"
    )

    norm = normalize_text(F.col(text_col))
    base = df.select(
        F.col(id_col),
        norm.alias("_t"),
        F.regexp_count(F.col(text_col), F.lit(_CJK_RE)).alias("_cjk"),
        F.length(F.col(text_col)).alias("_len"),
    )
    # trigrams array-side over the MATERIALIZED _t attribute (per the
    # HOF-lambda rule, an attribute reference inside the lambda is
    # cheap; substr needs the expr form for a column start index)
    tris = F.expr(
        "transform(sequence(1, greatest(length(_t) - 2, 0)),"
        " i -> substr(_t, i, 3))"
    )
    occ = base.select(
        id_col, "_cjk", "_len", F.explode(tris).alias("trigram")
    )
    langs = sorted(LANG_TRIGRAM_PROFILES)
    scored = (
        occ.join(F.broadcast(profiles), "trigram", "left")
        .groupBy(id_col)
        .agg(
            F.first("_cjk").alias("_cjk"),
            F.first("_len").alias("_len"),
            *[
                F.sum(
                    F.when(F.col("lang") == lg, F.col("w")).otherwise(0)
                ).alias(f"_s_{lg}")
                for lg in langs
            ],
        )
    )
    best_score = F.greatest(*[F.col(f"_s_{lg}") for lg in langs])
    winner = F.lit("unk")
    for lg in reversed(langs):  # earlier name wins ties (last when wins)
        winner = F.when(F.col(f"_s_{lg}") == best_score, F.lit(lg)).otherwise(winner)
    winner = F.when(best_score < min_score, F.lit("unk")).otherwise(winner)
    is_cjk = (F.col("_cjk") * 3) >= F.col("_len")
    return scored.select(
        id_col,
        F.when(is_cjk, F.lit("zh")).otherwise(winner).alias("lang"),
        F.when(is_cjk, F.lit(None).cast("long")).otherwise(
            best_score.cast("long")
        ).alias("lang_score"),
    )


def tf_idf_keywords(
    df: DataFrame,
    top_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction by TF-IDF: the standard
    curation signal for topic tagging / boilerplate spotting.

    Output: (id_col, rank 1..top_k, word, tfidf) — ties broken
    lexicographically, scores rounded to 6 digits BEFORE ranking so
    the ordering is engine-portable (ln() may differ in the last ULP
    across engines).

    Scale shape: one explode → (doc, word) partial-hash-agg (exchange
    bounded by per-doc distinct words), one word-level document-
    frequency aggregate (bounded by |vocab|), an equi-join back on
    word (uniform: hot stopwords carry low idf but their df rows are
    single rows, not row explosions), and a per-doc row_number window
    — partitioned by doc id, so no single-task sort. The corpus size
    N arrives as a broadcast 1-row frame (the repo's scalar-frame
    pattern), never a driver constant baked into the plan lineage."""
    words = (
        df.select(
            F.col(id_col),
            F.explode(
                F.filter(
                    F.split(normalize_text(F.col(text_col)), " "),
                    lambda w: w != "",
                )
            ).alias("word"),
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = words.select(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    from pyspark.sql import Window

    scored = (
        words.join(docfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "word",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n_docs") + F.lit(1.0))
                    / (F.col("df") + F.lit(1.0))
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_k))
        .select(id_col, "rank", "word", "tfidf")
    )
