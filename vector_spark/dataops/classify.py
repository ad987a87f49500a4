"""Model-based quality filtering — the fasttext-style linear
classifier pass (hashed bag-of-ngrams → linear model → sigmoid) that
large-scale training-data pipelines run after heuristic signals
(the CCNet / GPT-3-reported "quality classifier" stage, re-expressed
as pure DataFrame algebra).

Both halves are distributed and deterministic, with no MLlib
dependency and no driver-side math:

- TRAIN: Naive-Bayes log-odds weights in closed form — one explode +
  one (feature × class) hash-aggregate, shuffle bounded by
  ``n_features``, never by corpus size. Deterministic: same input →
  bit-same weights (no SGD, no seed).
- SCORE: explode features → broadcast-join the weight table (|W| ≤
  n_features rows ≈ MBs) → one per-doc sum. The corpus side never
  shuffles for the join; the per-doc aggregate is keyed by doc id
  (uniform).

Everything is portable to the DuckDB oracle (same hash polynomial as
``tokenize_words``'s portable mode), so train→score runs under the
driver's value-equality gate end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bias rides the weight table under this reserved feature id, so
#: scoring needs no driver-side scalar plumbing.
BIAS_FEATURE = -1


def _hash_word(w: Column, n_features: int, hash_mode: str) -> Column:
    if hash_mode == "portable":
        return F.pmod(
            F.length(w) * 31
            + F.ascii(F.substring(w, 1, 1)) * 7
            + F.ascii(F.substring(w, -1, 1)),
            F.lit(n_features),
        ).cast("int")
    return F.pmod(F.xxhash64(w), F.lit(n_features)).cast("int")


def hash_features(
    text: Column,
    n_features: int = 1 << 18,
    bigrams: bool = True,
    hash_mode: str = "xxhash64",
) -> Column:
    """Hashed bag-of-ngrams feature ids (unigrams + optional bigrams)
    as ``array<int>`` — the fasttext input representation. Array-side
    (one projection, no explode here); multiset semantics (repeated
    n-grams repeat their feature id, multinomial counts downstream).

    ``hash_mode='portable'`` uses the same char-polynomial as
    ``tokenize_words`` so the DuckDB oracle derives identical ids;
    xxhash64 is the JVM-fast default (collision-poorer polynomial
    hashing is acceptable for tests, not for a production filter).
    """
    from vector_spark.dataops.dedup import normalize_text

    words = F.filter(F.split(normalize_text(text), " "), lambda w: w != "")
    uni = F.transform(words, lambda w: _hash_word(w, n_features, hash_mode))
    if not bigrams:
        return uni
    # bigrams via zip_with over two shifted slices — NOT a lambda that
    # reads `element_at(words, i+1)`: an outer expression referenced
    # inside a HOF lambda is re-evaluated PER ELEMENT (no CSE across
    # the lambda boundary), turning the normalize+split+filter chain
    # into O(words²) regex work per document (measured 45× on the
    # sf0.1 gate; same pathology class as the winnowing fix, SCALE.md)
    n = F.size(words)
    m = F.greatest(n - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(words, 1, m),
        F.slice(words, 2, m),
        lambda a, b: _hash_word(
            F.concat(a, F.lit(" "), b), n_features, hash_mode
        ),
    )
    return F.concat(uni, bi)


def train_nb_classifier(
    df: DataFrame,
    label_col: str,
    features_col: str = "features",
    n_features: int = 1 << 18,
    alpha: float = 1.0,
) -> DataFrame:
    """Closed-form multinomial Naive-Bayes log-odds training.

    Input: (features array<int>, label boolean). Output: one weight
    table (feature int, weight double) with the class-prior bias under
    ``BIAS_FEATURE`` — exactly what ``score_classifier`` joins.
    Contract: feature ids must be NON-NEGATIVE (``hash_features``
    guarantees it); negative ids are reserved for the bias row (−1)
    and the internal per-document sentinel (−2) below.

    w_f = ln((c_pos(f)+α)/(T_pos+α·V)) − ln((c_neg(f)+α)/(T_neg+α·V)),
    bias = ln(n_pos_docs / n_neg_docs); V = ``n_features``.

    Plan shape: ONE pass over the input — a per-document sentinel
    feature (−2) rides along in the explode, so the single
    feature-keyed hash-aggregate yields the per-feature conditional
    counts AND the per-class document counts; the class totals then
    derive from the (≤ n_features)-row aggregate table, never from a
    second corpus scan. (Previously the input executed 3× — explode
    pass + two totals passes — which tripled the upstream
    hash_features projection for any un-persisted caller; measured as
    the r5 curation_pipeline bench regression.) The aggregate table
    persists (bounded by n_features rows) for its two consumers.
    Weights are rounded to 12 dp so cross-engine float formatting
    agrees.
    """
    DOC_MARK = -2  # hashed features are non-negative; -1 is the bias
    lab = F.col(label_col).cast("boolean")
    feats = F.coalesce(
        F.col(features_col), F.array().cast("array<int>")
    )
    occ = df.select(
        lab.alias("_y"),
        F.explode(
            F.concat(feats, F.array(F.lit(DOC_MARK).cast("int")))
        ).alias("feature"),
    )
    per_feat = (
        occ.groupBy("feature")
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("c_pos"),
            F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("c_neg"),
        )
        .persist()
    )
    is_doc = F.col("feature") == DOC_MARK
    totals = per_feat.agg(
        F.sum(F.when(~is_doc, F.col("c_pos")).otherwise(0)).alias("t_pos"),
        F.sum(F.when(~is_doc, F.col("c_neg")).otherwise(0)).alias("t_neg"),
        F.sum(F.when(is_doc, F.col("c_pos")).otherwise(0)).alias("d_pos"),
        F.sum(F.when(is_doc, F.col("c_neg")).otherwise(0)).alias("d_neg"),
    )
    av = F.lit(float(alpha)) * F.lit(float(n_features))
    a = F.lit(float(alpha))
    weights = per_feat.filter(~is_doc).crossJoin(F.broadcast(totals)).select(
        "feature",
        F.round(
            F.log((F.col("c_pos") + a) / (F.col("t_pos") + av))
            - F.log((F.col("c_neg") + a) / (F.col("t_neg") + av)),
            12,
        ).alias("weight"),
    )
    # Laplace-smoothed prior: ln((d_pos+α)/(d_neg+α)) — an integer
    # ratio would divide by zero (ANSI mode) when a shard's labels
    # collapse to one class, a real occurrence under pseudo-labeling;
    # smoothing keeps the bias finite and the model usable
    bias = totals.select(
        F.lit(BIAS_FEATURE).alias("feature"),
        F.round(
            F.log((F.col("d_pos") + a) / (F.col("d_neg") + a)), 12
        ).alias("weight"),
    )
    return weights.unionByName(bias)


def score_classifier(
    df: DataFrame,
    weights: DataFrame,
    features_col: str = "features",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply a linear weight table: logit = bias + Σ w(feature) over
    the document's feature multiset; score = sigmoid(logit).

    Broadcast hash join (weight table ≤ n_features rows) — the corpus
    side never shuffles for the join; unseen features contribute 0.
    The bias is folded into the SAME join by appending the reserved
    ``BIAS_FEATURE`` to every document's feature multiset (real
    feature ids are non-negative, so it never collides) — one weight
    join, one per-doc aggregate, and the training DAG behind
    ``weights`` executes exactly once instead of once per
    weights/bias branch. Output: (id[, keep], n_feat, logit, score),
    rounded for cross-engine comparison; ``n_feat`` counts the
    document's real features only.
    """
    # NULL features (e.g. a null-text document) count as empty —
    # concat(NULL, array(bias)) is NULL and the explode would silently
    # drop the document; coalescing guarantees a bias-only score row
    occ = df.select(
        F.col(id_col),
        *keep_cols,
        F.explode(
            F.concat(
                F.coalesce(
                    F.col(features_col), F.array().cast("array<int>")
                ),
                F.array(F.lit(BIAS_FEATURE).cast("int")),
            )
        ).alias("feature"),
    )
    summed = (
        occ.join(F.broadcast(weights), "feature", "left")
        .groupBy(id_col, *keep_cols)
        .agg(
            (F.count(F.lit(1)) - 1).alias("n_feat"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_acc"),
        )
    )
    logit = F.col("_acc")
    return summed.select(
        id_col,
        *keep_cols,
        "n_feat",
        F.round(logit, 6).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
    )
