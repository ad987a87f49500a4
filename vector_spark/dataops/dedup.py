"""Deduplication at scale: exact, n-gram Jaccard, MinHash/LSH, SimHash,
embedding-cosine near-dup.

Design for 100 TB:
- exact: one hash-groupBy (map-side partial agg), keep min(doc_id).
- MinHash: per-doc signature = k independent min-hashes over shingles
  (one explode + groupBy — shuffle bounded by docs×k); LSH banding
  buckets signatures so the candidate join is an equi-join on
  (band, band_hash), NEVER an all-pairs cross join.
- SimHash: bit-majority over token hashes; near-dup = equal simhash
  (or small hamming distance via band equi-join).
- n-gram Jaccard: shingle explode + self equi-join on shingle →
  per-pair intersection counts; |A∪B| from per-doc counts. The join
  key is the shingle, so common-shingle skew is the hot spot — cap
  via distinct-shingle filtering (df documents with huge fan-out are
  near-dups of everything; AQE skew-join handles the residual).

Hashes are md5-hex-string based (portable: identical in Spark and
DuckDB) rather than xxhash64 — determinism and cross-engine
verifiability outweigh the few extra bytes per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def normalize_text(col: Column) -> Column:
    """lower + collapse whitespace — the canonical form for hashing."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative per exact (normalized) text.
    Returns (fingerprint, keep_id, dup_count)."""
    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col))).alias("fingerprint"))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def kgram_positions(words: Column, k: int) -> Column:
    """1-based start positions of all k-grams — EMPTY for texts
    shorter than k words. (Spark's sequence(1, 0) DESCENDS, unlike
    DuckDB's empty generate_series; unguarded it feeds slice a start
    of 0 and one short document aborts the whole job.)"""
    n_pos = F.size(words) - (k - 1)
    return F.when(n_pos >= 1, F.sequence(F.lit(1), n_pos)).otherwise(
        F.array().cast("array<int>")
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (space-joined);
    empty array for texts shorter than n words.

    NOTE: ``col`` is referenced inside the transform lambda, so pass a
    plain attribute (a projected column), NOT an inline expression —
    expressions inside higher-order-function lambdas are re-evaluated
    per element (no CSE across lambda scopes), turning an inline
    split(...) into O(n²) work. ``shingle_frame`` does this correctly.
    """
    words = F.split(col, " ")
    return F.transform(
        kgram_positions(words, n),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )


def shingle_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) distinct pairs — the base for Jaccard/MinHash.

    The word array is materialized as its own projection before the
    shingle lambda references it (per-element re-evaluation otherwise —
    see ``word_shingles`` note; measured ~2× on the sf0.1 bench)."""
    base = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_w")
    )
    w = F.col("_w")
    grams = F.transform(
        kgram_positions(w, n), lambda i: F.concat_ws(" ", F.slice(w, i, n))
    )
    return base.select("id", F.explode(grams).alias("shingle")).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    reuse_shingles: bool = True,
    max_shingle_df: int | None = None,
    staging_path: str | None = None,
) -> DataFrame:
    """All pairs (a < b) with shingle-set Jaccard >= threshold.

    Self equi-join on shingle → intersection counts; union via
    per-doc set sizes. Output (id_a, id_b, jaccard).

    Scale controls (the two 100 TB levers, both CODE not advice):

    - ``max_shingle_df``: STOP-SHINGLE PRUNING. A shingle appearing in
      more than this many documents is removed from the universe
      before the self-join (both intersection AND per-doc sizes — the
      Jaccard is over the reduced universe). The hot-shingle set is
      tiny by construction (few shingles exceed the cap), so it ships
      as a broadcast LEFT ANTI join — the skewed join key never
      reaches the shuffle. A shingle in k docs generates k² candidate
      rows; capping k bounds the worst key's fan-out.
    - ``staging_path``: materialize the (id, shingle) frame to parquet
      instead of memory ``persist()`` — the shingle frame is O(total
      tokens) rows and will not fit in cluster memory at 100 TB.

    ``reuse_shingles`` persists the (id, shingle) frame: without it
    Catalyst re-derives the scan+explode+distinct FOUR times (both
    join sides + both size lookups — measured 10 exchanges → 4).
    """
    sh = shingle_frame(df, text_col, id_col, n)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    if staging_path is not None:
        sh.write.mode("overwrite").parquet(staging_path)
        sh = df.sparkSession.read.parquet(staging_path)
    elif reuse_shingles:
        sh = sh.persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Long-format minhash: one row per (id, seed) with the min 60-bit
    numeric hash of ``seed:shingle`` (top 15 hex chars of the md5 —
    portable across engines; DuckDB: CAST('0x'||substr(md5,1,15) AS
    BIGINT)). k seeds via a literal seed array explode (no UDF, no
    RNG).

    The hash is NUMERIC, not the md5 hex string, so the min() buffer is
    a fixed-width long and the aggregate plans as HashAggregate with
    map-side partials — min over a var-length string demotes the whole
    aggregate to SortAggregate (a per-partition sort of every exploded
    (doc, seed, shingle) row; at 10^12 docs that sort IS the job)."""
    sh = shingle_frame(df, text_col, id_col, n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (
        sh.select("id", "shingle", seeds)
        .groupBy("id", "seed")
        .agg(F.min(h).alias("minhash"))
    )


def minhash_lsh_bands(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """The LSH banding projection alone: (id, band, band_hash) — one
    row per document band. Factored out of ``minhash_lsh_candidates``
    so an incremental-dedup index can PERSIST the banded buckets and
    later runs band only their new shard (the prior corpus is never
    re-banded)."""
    return (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.sort_array(F.collect_list("minhash")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("band_hash")
        )
    )


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 2, reuse: bool = True
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs sharing a
    (band, band_hash) bucket are candidates. Equi-join on the bucket —
    the all-pairs comparison never materializes. Output distinct
    (id_a, id_b) candidate pairs (a < b). ``reuse`` persists the
    banded frame so the self-join doesn't recompute the signature
    pipeline twice."""
    banded = minhash_lsh_bands(signatures, bands=bands, rows_per_band=rows_per_band)
    if reuse:
        banded = banded.persist()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _hex_char_val(c: Column) -> Column:
    # portable hex digit -> 0..15 (instr is 1-based, 0 = not found)
    return F.instr(F.lit(HEX), c) - 1


def simhash16(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """16-bit SimHash over word tokens, md5-derived bits (portable).

    For bit j (0..15): take hex digit j/4 of md5(word), extract bit
    (3 - j%4); majority vote over words decides the output bit.
    Output (id, simhash int).

    Scale shape: all 16 bit-majorities are SIXTEEN AGGREGATE COLUMNS
    over the word rows — one shuffle of the word frame. (The previous
    version exploded a j=0..15 sequence per word, multiplying the
    shuffled row count 16×.) The bit formula is plain arithmetic so
    the identical expression runs on any SQL engine (oracle parity).
    """
    words = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
    base = df.select(F.col(id_col).alias("id"), words).select(
        "id", F.substring(F.md5(F.col("w")), 1, 4).alias("h4")
    )

    def bit(j: int) -> Column:
        # bit j of the 16-bit prefix: hex digit j//4, bit (3 - j%4)
        hexval = _hex_char_val(F.substring(F.col("h4"), j // 4 + 1, 1))
        return F.floor(hexval / F.lit(float(2 ** (3 - j % 4)))) % 2

    maj = base.groupBy("id").agg(
        *[
            (F.sum(bit(j) * 2 - 1) >= 0).cast("long").alias(f"_b{j}")
            for j in range(16)
        ]
    )
    simhash = None
    for j in range(16):
        term = F.col(f"_b{j}") * F.lit(1 << j).cast("long")
        simhash = term if simhash is None else (simhash + term)
    return maj.select("id", simhash.alias("simhash"))


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash as FOUR 16-bit limbs (portable, bandable).

    Limb k (k=0..3) is a 16-bit simhash whose bit source is md5 hex
    digits 4k+1..4k+4 of each word — together the four limbs are a
    64-bit simhash of the document. Keeping the hash as limbs (instead
    of one bigint) sidesteps signed-64 overflow on bit 63 AND makes
    the LSH band keys free: each limb IS a 16-bit band, so banding has
    2^16-way key cardinality (the 16-bit version's nibble bands had
    only 2^4 = 16 distinct values per band — bucket sizes ~N/16, a
    disguised all-pairs join at corpus scale).

    Output (id, s0, s1, s2, s3) — limbs as longs in [0, 65536).

    Scale shape: all 64 bit-majorities are aggregate columns over the
    word rows — ONE shuffle of the word frame, map-side partials. The
    bit formula is plain arithmetic (portable to the DuckDB oracle).
    """
    words = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
    base = df.select(F.col(id_col).alias("id"), words).select(
        "id", F.substring(F.md5(F.col("w")), 1, 16).alias("h16")
    )

    def bit(k: int, j: int) -> Column:
        # bit j of limb k: hex digit 4k + j//4, bit (3 - j%4)
        hexval = _hex_char_val(F.substring(F.col("h16"), 4 * k + j // 4 + 1, 1))
        return F.floor(hexval / F.lit(float(2 ** (3 - j % 4)))) % 2

    maj = base.groupBy("id").agg(
        *[
            (F.sum(bit(k, j) * 2 - 1) >= 0).cast("long").alias(f"_b{k}_{j}")
            for k in range(4)
            for j in range(16)
        ]
    )
    limbs = []
    for k in range(4):
        s = None
        for j in range(16):
            term = F.col(f"_b{k}_{j}") * F.lit(1 << j).cast("long")
            s = term if s is None else (s + term)
        limbs.append(s.alias(f"s{k}"))
    return maj.select("id", *limbs)


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket the
    corpus, compare pairs only WITHIN a bucket (equi-join — never an
    all-pairs cross join), keep cosine >= threshold.

    Recall note: true near-dups (cos→1) almost surely share sign
    buckets; at lower thresholds add band rotations. Output
    (id_a, id_b, cos)."""
    from vector_spark.dataops.similarity import cosine, sign_lsh_bucket

    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(cosine(F.col("a.vec"), F.col("b.vec")), 4).alias("cos"),
    )
    # the threshold predicate substitutes the cosine definition into
    # the filter (PushDownPredicate), so cosine evaluates ~2× per pair;
    # acceptable here — persisting/staging the pairs frame halves it at
    # the cost of materializing O(pairs) rows
    return pairs.filter(F.col("cos") >= threshold)


def minhash_jaccard_estimate(
    signatures: DataFrame, candidates: DataFrame, threshold: float = 0.0
) -> DataFrame:
    """LSH verification stage: estimate Jaccard for candidate pairs as
    the fraction of agreeing minhash coordinates (an unbiased
    estimator — P[minhash match] = J). Join the long-format signature
    table onto the candidate pairs twice on (id, seed); the estimate
    never touches the documents again. Output (id_a, id_b, est_jaccard
    rounded 6) filtered to >= threshold.

    Scale shape: candidates are the (small) LSH survivors; both joins
    are equi-joins on (id, seed) — no all-pairs anything.
    """
    a = signatures.select(
        F.col("id").alias("id_a"), "seed", F.col("minhash").alias("mh_a")
    )
    b = signatures.select(
        F.col("id").alias("id_b"), "seed", F.col("minhash").alias("mh_b")
    )
    joined = candidates.join(a, "id_a").join(b, ["id_b", "seed"])
    est = (
        joined.groupBy("id_a", "id_b")
        .agg(
            F.round(
                F.avg((F.col("mh_a") == F.col("mh_b")).cast("double")), 6
            ).alias("est_jaccard")
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold)


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve candidate duplicate PAIRS (from LSH/SimHash/Jaccard)
    into duplicate CLUSTERS: connected components with the component's
    minimum id as the canonical representative — the step that turns
    pair lists into an actionable keep/drop set for a training-data
    dedup pass.

    Algorithm: iterative min-label propagation. Every node starts
    labeled with itself; each round every node takes the min label in
    its neighborhood (both edge directions); converged when no label
    changes. Rounds needed = component diameter — for near-dup
    clusters this is small (most are cliques or short chains from
    banded LSH), so 3-5 rounds is typical; ``max_iter`` bounds
    adversarial chains.

    Scale shape: each round is two shuffle joins on node id (uniform
    key) + one groupBy min — no collect, no driver-side graph; the
    convergence check is a count of changed labels (one scalar action
    per round). Label frames are cached per round and unpersisted
    after the next round materializes (bounded memory lineage).
    Output: (id, cluster) with cluster = min id of the component;
    singleton nodes never in ``pairs`` are absent by construction.
    """
    edges = (
        pairs.select(
            F.col(id_a).alias("src"), F.col(id_b).alias("dst")
        )
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    labels.cache()
    prev = None
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["src"] == labels["id"])
            .select(F.col("dst").alias("id"), "label")
        )
        new_labels = (
            neigh.unionByName(labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        new_labels.cache()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        if prev is not None:
            prev.unpersist()
        prev = labels
        labels = new_labels
        if changed == 0:
            break
    out = labels.select("id", F.col("label").alias("cluster"))
    if prev is not None:
        prev.unpersist()
    return out


def resolve_keepers(
    clusters: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    length_col: str | None = None,
    policy: str = "min_id",
) -> DataFrame:
    """Pick ONE keeper per duplicate cluster — the keep/drop decision
    that ends a dedup pass. Input: ``dup_clusters`` output
    (id, cluster). Output: (id, cluster, keep).

    ``policy='min_id'`` (default) keeps the canonical representative —
    a pure column comparison, no extra join or shuffle.
    ``policy='longest'`` keeps the longest document (ties break to the
    smaller id): one join to fetch ``length_col`` + a per-cluster
    row_number window. Clusters from banded LSH are small (near-dup
    groups), so the window partitions stay tiny; a corpus where one
    cluster holds millions of copies should pre-aggregate with max
    instead — or use min_id, which never shuffles by cluster.
    """
    if policy == "min_id":
        return clusters.withColumn("keep", F.col("id") == F.col("cluster"))
    if policy != "longest":
        raise ValueError(f"unknown keeper policy {policy!r}")
    if docs is None or length_col is None:
        raise ValueError("policy='longest' needs docs and length_col")
    from pyspark.sql import Window

    joined = clusters.join(
        docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(length_col).alias("_len"),
        ),
        "id",
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("_len"), F.asc("id"))
    return joined.withColumn("keep", F.row_number().over(w) == 1).drop("_len")


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash Hamming distance <= ``max_hamming``.

    Pigeonhole banding over the four 16-bit limbs of ``simhash64``:
    two 64-bit hashes within Hamming distance 3 differ in at most 3 of
    the 4 limbs, so they share at least one intact limb — candidates
    come from a BAND EQUI-JOIN on (band, limb value), then the exact
    ``bit_count(xor)`` distance over all four limbs filters. Band-key
    cardinality is 2^16 per band (the earlier 16-bit/nibble variant
    had 2^4 = 16 — bucket sizes ~N/16 ⇒ ~N²/256 candidate pairs per
    band, an all-pairs join in disguise at corpus scale). For
    max_hamming >= 4 the pigeonhole guarantee weakens (recall
    tradeoff — widen the hash or add bands).

    Output: (id_a, id_b, hamming) distinct pairs, a < b.
    """
    assert max_hamming < 4, (
        "pigeonhole guarantee holds for max_hamming <= 3 with 4 bands; "
        "widen the hash for larger radii"
    )
    sims = simhash64(df, text_col, id_col)
    sims = sims.persist()
    limbs = [F.col(f"s{k}") for k in range(4)]
    banded = sims.select(
        "id", "s0", "s1", "s2", "s3",
        F.posexplode(F.array(*limbs)).alias("band", "band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = None
    for k in range(4):
        h = F.bit_count(F.col(f"a.s{k}").bitwiseXOR(F.col(f"b.s{k}")))
        hamming = h if hamming is None else (hamming + h)
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs
