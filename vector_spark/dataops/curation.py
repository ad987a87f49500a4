"""Training-data curation operators: PII scrubbing, benchmark
contamination checks, stratified (per-source) sampling.

These extend the engine beyond the reference's transform inventory with
the curation passes a 100 TB token pipeline runs before training
(BASELINE.json north rule). All pure Column expressions — one scan, no
UDFs, no shuffle except where noted — and every operator is portable to
the DuckDB oracle for the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Engine-portable regexes (no lookaround: run on Java regex AND RE2).
# Order matters: emails before phones (emails can embed digit runs),
# IPs before bare numbers.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "longnum": (r"\b\d{13,19}\b", "<NUM>"),
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone", "longnum"),
    out_col: str | None = None,
    count_cols: bool = True,
) -> DataFrame:
    """Redact PII-shaped spans with typed placeholder tokens.

    One projection: k chained ``regexp_replace`` calls (all JVM-side,
    whole-stage codegen) plus optional per-kind match counts for
    curation stats. Each ``n_<kind>`` is counted against the text
    AFTER kinds earlier in the chain were already redacted, so the
    counts agree with what the replace chain actually consumed (a
    digit run inside an email does not double-count as longnum).
    Scale shape: map-only — no shuffle, no UDF; at 100 TB this is
    bounded by scan + regex CPU, and codegen subexpression elimination
    shares the replace chain between the counts and the output column.
    """
    out_col = out_col or text_col
    scrubbed = F.col(text_col)
    counts = []
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        if count_cols:
            counts.append(F.regexp_count(scrubbed, F.lit(pat)).alias(f"n_{kind}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    keep = [
        c
        for c in df.columns
        if c != out_col and (c != text_col or out_col != text_col)
    ]
    return df.select(*keep, scrubbed.alias(out_col), *counts)


# ---------------------------------------------------------------------------
# Benchmark contamination
# ---------------------------------------------------------------------------


def _gram_frame(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram_hash) pairs — word n-grams of the normalized text,
    distinct within document, hashed to 64-bit for equi-join."""
    from vector_spark.dataops.dedup import normalize_text

    # words materialized as a projected attribute BEFORE the lambda
    # references it — inline expressions inside HOF lambdas are
    # re-evaluated per element (see dedup.word_shingles note)
    base = df.select(
        F.col(id_col).alias("_cid"),
        F.split(normalize_text(F.col(text_col)), " ").alias("_w"),
    )
    w = F.col("_w")
    # documents shorter than n words emit NO grams (same convention as
    # dedup's shingles) — a truncated partial gram would let short docs
    # flag as contaminated on trivially common word runs
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.array_join(F.slice(w, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        base.select("_cid", F.explode(grams).alias("_g"))
        .filter(F.length("_g") > 0)
        .select("_cid", F.xxhash64("_g").alias("_gh"))
        .distinct()
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Flag training documents sharing word ``n``-grams with a
    held-out benchmark set (decontamination pass).

    Returns (id_col, n_grams, n_contaminated, contamination) per doc
    with at least one gram overlap. Scale shape: the benchmark gram
    set is small (eval suites are MBs) → broadcast semi-join against
    the exploded doc grams; the 100 TB side shuffles once for the
    per-doc groupBy with map-side partial counts. With
    ``broadcast_benchmark=False`` it's a plain shuffled equi-join on
    the 64-bit gram hash (for giant benchmark unions).
    """
    doc_grams = _gram_frame(docs, id_col, text_col, n)
    bench_grams = (
        _gram_frame(benchmark, id_col, text_col, n)
        .select("_gh")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    # ONE pass over the corpus-sized gram explode: a LEFT join against
    # the (distinct, broadcast) benchmark grams marks each gram, and a
    # single per-doc hash aggregate yields the total AND hit counts.
    # (Previously `totals` and `hits` each re-executed the explode +
    # hash subtree — the corpus pays its shingling twice — and a third
    # aggregate-to-aggregate join recombined them; identical output,
    # plan-tested.) The left join preserves cardinality because the
    # bench side is distinct on the join key.
    per_doc = (
        doc_grams.join(bench_grams, "_gh", "left")
        .groupBy("_cid")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.col("_hit")).alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") > 0)
    )
    return per_doc.select(
        F.col("_cid").alias(id_col),
        "n_grams",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_grams"), 6).alias(
            "contamination"
        ),
    )


def contamination_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    minhash_k: int = 16,
    bands: int = 8,
    check_ids: bool = True,
) -> DataFrame:
    """NEAR-DUP decontamination: flag training documents whose content
    is a MinHash near-duplicate of a benchmark item — catches
    paraphrased / lightly-edited leakage that ``contamination_check``'s
    exact n-gram overlap misses (and that real eval leakage usually
    is).

    Pure composition of the oracle-gated dedup machinery pointed
    across two frames: signatures for docs ∪ benchmark (benchmark ids
    offset into a disjoint key space), banded LSH candidates, Jaccard
    verification on the signature table, then only doc↔benchmark
    pairs kept. Scale shape inherits from the dedup ops — band
    equi-join, no all-pairs; the benchmark side is tiny so its
    signatures are a rounding error.

    Output: (id_col, bench_id, est_jaccard) — one row per
    (document, benchmark item) near-dup relation at or above
    ``threshold``.
    """
    from vector_spark.dataops.dedup import (
        minhash_jaccard_estimate,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    OFFSET = 1 << 40  # benchmark ids land in a disjoint id space
    d = docs.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    )
    b = benchmark.select(
        (F.col(id_col).cast("long") + OFFSET).alias(id_col), F.col(text_col)
    )
    if check_ids:
        # id-range contract: doc ids must sit below OFFSET and bench
        # ids must be non-negative, or the doc/benchmark orientation
        # silently flips. Two bounded aggregates (column-pruned min/max
        # scans — trivial next to the minhash pass itself); disable
        # with check_ids=False when the caller owns the contract.
        dmax = d.agg(F.max(id_col).alias("m")).first()["m"]
        if dmax is not None and dmax >= OFFSET:
            raise ValueError(
                f"contamination_fuzzy: doc {id_col} {dmax} >= 2^40; the "
                "benchmark id offset would collide — remap ids first"
            )
        bmin = benchmark.agg(F.min(F.col(id_col).cast("long")).alias("m")).first()["m"]
        if bmin is not None and bmin < 0:
            raise ValueError(
                f"contamination_fuzzy: benchmark {id_col} {bmin} < 0 — "
                "negative ids break the disjoint id-space mapping"
            )
    sigs = minhash_signatures(
        d.unionByName(b), k=minhash_k, text_col=text_col, id_col=id_col
    )
    cands = minhash_lsh_candidates(
        sigs, bands=bands, rows_per_band=max(1, minhash_k // bands)
    )
    pairs = minhash_jaccard_estimate(sigs, cands, threshold=threshold)
    # keep only doc-vs-benchmark relations (either orientation)
    doc_a = (F.col("id_a") < OFFSET) & (F.col("id_b") >= OFFSET)
    doc_b = (F.col("id_b") < OFFSET) & (F.col("id_a") >= OFFSET)
    return pairs.filter(doc_a | doc_b).select(
        F.when(doc_a, F.col("id_a")).otherwise(F.col("id_b")).alias(id_col),
        (
            F.when(doc_a, F.col("id_b")).otherwise(F.col("id_a")) - OFFSET
        ).alias("bench_id"),
        "est_jaccard",
    )


# ---------------------------------------------------------------------------
# Stratified sampling
# ---------------------------------------------------------------------------


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.7,
    target_fraction: float | None = None,
) -> dict[str, float]:
    """Per-stratum keep rates for temperature-based domain mixing:
    kept mass ∝ count^alpha (alpha<1 upsamples small domains relative
    to their share — the standard multilingual/multi-domain mixing
    rule). Rates are capped at 1.0 (sampling can only downsample;
    upweighting beyond that is a repeat-epochs decision).

    The per-stratum count aggregate collects |strata| rows to the
    driver (domains are tens-to-hundreds) — bounded, not data-sized.
    ``target_fraction`` additionally scales to keep ~that fraction of
    all rows.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("c")).collect()
        if r[0] is not None
    }
    if not counts:
        return {}
    w = {k: float(c) ** alpha for k, c in counts.items()}
    base = {k: w[k] / counts[k] for k in counts}
    if target_fraction is None:
        s = 1.0 / max(base.values())
    else:
        s = min(
            target_fraction * sum(counts.values()) / sum(w.values()),
            1.0 / max(base.values()),
        )
    return {k: min(1.0, round(s * base[k], 9)) for k in counts}


def mix_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.7,
    target_fraction: float | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Temperature-mixed corpus sample: ``temperature_rates`` +
    ``stratified_sample`` in one call. Deterministic, map-only after
    the one bounded count aggregate."""
    rates = temperature_rates(df, strata_col, alpha, target_fraction)
    return stratified_sample(
        df, strata_col, rates, key_col=key_col, hash_mode=hash_mode
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    rate_field: str | None = "sample_rate",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum sampling — domain mixing for training
    corpora (keep X% of web, Y% of code, ...).

    Keep decision = uniform hash of ``key_col`` compared against the
    stratum's rate. Deterministic (same input → same survivors, no RNG
    state), map-only, no shuffle. ``hash_mode='xxhash64'`` is the fast
    JVM path; ``'md5'`` quantizes the rate to 1/65536 via the first 4
    hex chars — bit-identical across engines (the oracle mode, same
    contract as ``operators.core.sample``).
    """
    if hash_mode == "md5":
        # lowercase fixed-width hex compares lexicographically == numerically;
        # r >= 1 must short-circuit to True — its cutoff would be the
        # 5-char "10000", which sorts BELOW every 4-char hash
        u = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
        keep_for = lambda r: (  # noqa: E731
            F.lit(True)
            if r >= 1.0
            else u < F.lit(format(max(int(r * 65536), 0), "04x"))
        )
    else:
        u = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(1_000_000))
        keep_for = lambda r: (  # noqa: E731
            F.lit(True) if r >= 1.0 else u < F.lit(max(int(r * 1_000_000), 0))
        )

    keep = F.lit(False)
    rate_col = F.lit(default_rate)
    strata = F.col(strata_col)
    for value, r in rates.items():
        keep = F.when(strata == value, keep_for(r)).otherwise(keep)
        rate_col = F.when(strata == value, F.lit(r)).otherwise(rate_col)
    if default_rate > 0:
        keep = F.when(
            ~strata.isin(*rates.keys()) if rates else F.lit(True),
            keep_for(default_rate),
        ).otherwise(keep)
    out = df.filter(keep)
    if rate_field:
        out = out.withColumn(rate_field, rate_col)
    return out
