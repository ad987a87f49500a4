"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: JVM-side ``F.zip_with`` + ``F.aggregate``
  dot products against a broadcast query vector — correct baseline,
  O(N·d) per query, fine for cross-validation and small k·q.
- LSH-bucketed variant (the scale path): sign-random-projection
  buckets as an equi-join key so candidate generation is a hash join,
  not a cross join. With B buckets and roughly uniform vectors, probe
  cost drops ~B× at small recall loss; at 100 TB you'd persist the
  bucketed table sorted/bucketed by (bucket) so probes prune files.
- IVF-style variant: coarse centroids (driver-sampled k-means of a
  small sample) → assign by nearest centroid (broadcast) → probe only
  matching cells.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors for each query row.

    ``query_df``: (query_id, embedding). The query side is broadcast;
    the corpus is scanned once. Scores are rounded before ranking so
    the ordering is reproducible across engines/float orders.
    Output (query_id, neighbor_id, cos).
    """
    from pyspark.sql import Window

    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cvec"),
    )
    scored = corpus.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        F.round(
            cosine(F.col("_cvec"), F.transform(F.col("_qvec"), lambda x: x.cast("double"))),
            round_digits,
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def sign_lsh_bucket(vec: Column, dims: int = 8) -> Column:
    """Sign-projection bucket: concat of sign bits of the first
    ``dims`` coordinates (deterministic, engine-portable; a production
    variant uses random hyperplanes shipped as literals)."""
    return F.concat_ws(
        "",
        *[(F.element_at(vec, i + 1) > 0).cast("int").cast("string") for i in range(dims)],
    )


def lsh_bucketed(
    df: DataFrame, dims: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Assign every vector to its sign bucket. Candidate pairs for ANN
    are generated per-bucket (equi-join on bucket), shrinking the
    search space ~2^dims."""
    return df.select(F.col(id_col), sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"))


def lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN via bucket-restricted brute force: score only corpus rows in
    the query's bucket."""
    from pyspark.sql import Window

    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cvec"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    q = query_df.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qvec"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    scored = corpus.join(F.broadcast(q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_cvec"), F.col("_qvec")), 4).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse quantization via driver-side k-means
# ---------------------------------------------------------------------------


def ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    sample_rows: int = 2048,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train coarse centroids on a driver-side sample (numpy k-means,
    deterministic: evenly-spaced seed points, fixed iterations). The
    sample is bounded (default 2048 rows) — the 100 TB corpus never
    moves; only the centroid list (n_cells × d floats) ships back as
    plan literals / broadcast.
    """
    import numpy as np

    rows = (
        df.orderBy(id_col).limit(sample_rows).select(vec_col).collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    n = len(x)
    cents = x[np.linspace(0, n - 1, n_cells).astype(int)].copy()
    for _ in range(iters):
        d = x @ cents.T  # cosine-ish assignment on normalized-ish data
        norm_x = np.linalg.norm(x, axis=1, keepdims=True)
        norm_c = np.linalg.norm(cents, axis=1, keepdims=True).T
        sim = d / (norm_x * norm_c + 1e-12)
        assign = sim.argmax(axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [c.tolist() for c in cents]


def ivf_assign(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Assign each vector to its nearest centroid cell — vectorized
    pandas UDF (Arrow batches; numpy matmul per batch, no per-row
    Python). ``round_digits`` rounds similarities before the argmax
    (ties break to the lowest cell) so the assignment is reproducible
    across engines/float-summation orders — used by the oracle-gated
    refinement path."""
    import numpy as np
    from pyspark.sql import types as T

    cents = np.array(centroids, dtype=np.float64)
    cnorm = np.linalg.norm(cents, axis=1)

    @F.pandas_udf(T.IntegerType())
    def cell_of(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64)
        sim = (x @ cents.T) / (
            np.linalg.norm(x, axis=1, keepdims=True) * cnorm[None, :] + 1e-12
        )
        if round_digits is not None:
            sim = np.round(sim, round_digits)
        return pd.Series(sim.argmax(axis=1).astype("int32"))

    return df.withColumn("cell", cell_of(F.col(vec_col)))


def ivf_assign_multi(df: DataFrame, centroids, nprobe: int, vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its ``nprobe`` NEAREST cells (query-side
    multi-probe: recall grows with nprobe at probe cost ∝ nprobe).
    One row per (vector, probed cell)."""
    import numpy as np
    from pyspark.sql import types as T

    cents = np.array(centroids, dtype=np.float64)
    cnorm = np.linalg.norm(cents, axis=1)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def cells_of(v: pd.Series) -> pd.Series:
        x = np.array(v.tolist(), dtype=np.float64)
        sim = (x @ cents.T) / (
            np.linalg.norm(x, axis=1, keepdims=True) * cnorm[None, :] + 1e-12
        )
        # top-nprobe cells, best first (stable: argsort on -sim)
        top = np.argsort(-sim, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return df.withColumn("cell", F.explode(cells_of(F.col(vec_col))))


def ivf_topk(
    df: DataFrame,
    query_df: DataFrame,
    centroids,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """ANN probe: score only corpus vectors in the query's ``nprobe``
    nearest IVF cells. Equi-join on cell — candidate generation is a
    hash join keyed by the coarse quantizer, never a cross join; the
    corpus is assigned ONCE (nprobe multiplies only the query side)."""
    from pyspark.sql import Window

    corpus = ivf_assign(
        df.select(
            F.col(id_col).alias("neighbor_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cvec"),
        ).withColumn("embedding", F.col("_cvec")),
        centroids,
    ).drop("embedding")
    q_base = query_df.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qvec"),
    ).withColumn("embedding", F.col("_qvec"))
    if nprobe <= 1:
        q = ivf_assign(q_base, centroids).drop("embedding")
    else:
        q = ivf_assign_multi(q_base, centroids, nprobe).drop("embedding")
    scored = corpus.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_cvec"), F.col("_qvec")), 4).alias("cos"),
    )
    # no dedup needed even at nprobe>1: each corpus vector lives in
    # exactly ONE cell (argmax assignment) and a query's probed cells
    # are distinct, so a (query, neighbor) pair appears at most once —
    # a distinct() here would shuffle the largest frame for nothing
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def ivf_refine_centroids(
    df: DataFrame,
    centroids,
    iters: int = 2,
    vec_col: str = "embedding",
    round_digits: int | None = None,
):
    """DISTRIBUTED Lloyd refinement of the IVF coarse quantizer —
    upgrades ``ivf_centroids``'s bounded driver-side sample (2048
    rows; fine for seeding, weak as the final quantizer at 10^9+
    vectors) by iterating assignment + per-cell means over the FULL
    corpus:

    - assign: the existing vectorized pandas-UDF cell assignment
      (Arrow batches, numpy matmul — no per-row Python);
    - recompute: posexplode each vector into (cell, dim, value) rows
      and hash-aggregate means keyed by (cell, dim) — map-side
      partials make the exchange O(n_cells × d) per partition,
      never corpus-sized; the collect is the n_cells × d mean table
      (a few KB), not data.

    Per iteration: one map pass + one partial-agg pass. Empty cells
    keep their previous centroid (no collapse). Deterministic — same
    input and seed centroids give the same refined centroids;
    ``round_digits`` additionally rounds assignment similarities and
    the per-(cell, dim) means each iteration so the whole refinement
    is bit-reproducible across engines (the DuckDB oracle replays it).
    """
    cents = [list(map(float, c)) for c in centroids]
    d = len(cents[0])
    for _ in range(iters):
        assigned = ivf_assign(
            df.select(F.col(vec_col)), cents, vec_col=vec_col,
            round_digits=round_digits,
        )
        m_expr = F.avg("v")
        if round_digits is not None:
            m_expr = F.round(m_expr, round_digits)
        means = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(m_expr.alias("m"))
            .collect()
        )
        by_cell: dict[int, list[float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, [0.0] * d)[r.dim] = float(r.m)
        cents = [by_cell.get(c, cents[c]) for c in range(len(cents))]
    return cents


# ---------------------------------------------------------------------------
# Product quantization: subspace codebooks + 1-byte codes + ADC scoring —
# the memory-bound scale path for ANN (a 64-d float vector becomes m
# small ints; scoring never touches the original vectors).
# ---------------------------------------------------------------------------


def _pq_dot(sv: Column, cent: list[float]) -> Column:
    """Dot product of an array-column subvector with a LITERAL
    centroid — one zip_with + ordered fold, JVM-side."""
    lit_cent = F.array(*[F.lit(float(v)) for v in cent])
    return F.aggregate(
        F.zip_with(sv, lit_cent, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_best_cell(
    vec_col: str, j: int, sub: int, cb_j: list[list[float]], round_digits: int
) -> Column:
    """argmin_cell ||x_j − c||² as a PURE PROJECTION: ||c||² − 2·x_j·c
    per cell (||x_j||² is constant across cells), rounded, then
    array_min over (dist, cell) structs — lexicographic struct
    ordering gives ties → lowest cell with no shuffle and no UDF.

    Built as ONE SQL expression string (round 6): the previous
    per-cell unrolled Column tree (k × (zip_with + aggregate + round +
    struct) + F.least) cost hundreds of py4j round-trips PER SUBSPACE
    to construct and a matching analysis bill per job — measured as
    the dominant share of pq walls at 20k vectors, where the actual
    row work is microseconds. Semantics are identical: ||c||² is the
    same Python-summed double embedded via repr (exact round-trip),
    the dot is the same left-to-right zip_with fold, round/struct
    orderings unchanged, ties → lowest cell."""
    cells = ",".join(
        "array(" + ",".join(f"{float(v)!r}D" for v in c) + ")" for c in cb_j
    )
    n2s = ",".join(f"{float(sum(v * v for v in c))!r}D" for c in cb_j)
    sv = f"slice(`{vec_col}`, {j * sub + 1}, {sub})"
    return F.expr(
        f"array_min(transform(array({cells}), (c, i) -> named_struct("
        f"'d', round(element_at(array({n2s}), i + 1) - 2.0D * "
        f"aggregate(zip_with({sv}, c, (a, b) -> a * b), 0.0D, "
        f"(acc, x) -> acc + x), {int(round_digits)}), "
        f"'c', cast(i as int))))"
    )


def pq_train(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    seeds: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """Train per-subspace PQ codebooks with distributed Lloyd:
    ``codebook[j][cell]`` is the centroid of subspace ``j``.

    Seeds are the subvectors of the ``k`` smallest ids (deterministic,
    engine-portable — same convention as the ivf_refine gate); a
    caller that already holds them (e.g. it shares one TakeOrdered
    collect between seeds and queries) passes ``seeds`` to skip the
    collect job. Each iteration: assignment is a map-only projection
    (per-cell distance literals + array_min — no shuffle, no UDF),
    then per-(j, cell, dim) means via ONE explode + hash-aggregate
    whose exchange is bounded by d × k rows per partition, never
    corpus size; the collect is the KB-sized codebook. Empty cells
    keep their previous centroid. Distances and means round to
    ``round_digits`` so the DuckDB oracle replays training
    bit-for-bit."""
    if seeds is None:
        seeds = [
            [float(v) for v in r[vec_col]]
            for r in df.orderBy(id_col).limit(k).collect()
        ]
    else:
        seeds = [[float(v) for v in s] for s in seeds[:k]]
    d = len(seeds[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    codebook = [
        [seeds[c][j * sub : (j + 1) * sub] for c in range(k)] for j in range(m)
    ]
    vec = F.col(vec_col)
    for _ in range(int(iters)):
        arms = [
            F.struct(
                F.lit(j).alias("j"),
                _pq_best_cell(vec_col, j, sub, codebook[j], round_digits)[
                    "c"
                ].alias("cell"),
                F.slice(vec, j * sub + 1, sub).alias("sv"),
            )
            for j in range(m)
        ]
        assigned = df.select(F.explode(F.array(*arms)).alias("x")).select(
            "x.j", "x.cell", F.posexplode("x.sv").alias("dim", "v")
        )
        means = (
            assigned.groupBy("j", "cell", "dim")
            .agg(F.round(F.avg("v"), round_digits).alias("m"))
            .collect()
        )
        upd: dict[tuple[int, int], list[float]] = {}
        for r in means:
            upd.setdefault((r.j, r.cell), [0.0] * sub)[r.dim] = float(r.m)
        codebook = [
            [upd.get((j, c), codebook[j][c]) for c in range(k)] for j in range(m)
        ]
    return codebook


def pq_encode(
    df: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Encode every vector to its m PQ codes — ONE map-only
    projection (m × k literal distances + F.least per subspace), no
    shuffle, no UDF. Output (id_col, codes array<int>)."""
    m = len(codebook)
    sub = len(codebook[0][0])
    codes = F.array(
        *[
            _pq_best_cell(vec_col, j, sub, codebook[j], round_digits)["c"]
            for j in range(m)
        ]
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def pq_topk(
    df: DataFrame,
    query_df: DataFrame | None,
    codebook: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    queries: list[tuple] | None = None,
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per query a LUT of
    round(dot(q_j, c_{j,cell})) literals ships in the plan (queries
    are few by contract — the collect here is |queries| rows), scoring
    is ONE element_at per subspace summed left-to-right j=0..m-1
    (fixed fp order, matching the oracle's list_sum replay), and the
    per-query top-k uses the same rounded window rank as
    brute_force_topk. The corpus side touches only the m-int codes —
    never the original vectors: the memory-bound 10^9-vector shape.

    ``queries`` (pre-collected ``(id, vector)`` pairs) skips the
    |queries|-row collect job; ``codes_df`` reuses an already-encoded
    (id, codes) frame (e.g. one the caller also materializes for its
    own output) instead of re-deriving the encode projection."""
    from pyspark.sql import Window

    m = len(codebook)
    sub = len(codebook[0][0])
    if queries is None:
        queries = [
            (r["query_id"], [float(v) for v in r["_qvec"]])
            for r in query_df.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
            ).collect()
        ]
    else:
        queries = [(qid, [float(v) for v in vec]) for qid, vec in queries]
    codes = (
        codes_df.select(F.col(id_col), "codes")
        if codes_df is not None
        else pq_encode(df, codebook, id_col=id_col, vec_col=vec_col,
                       round_digits=round_digits)
    )
    per_query = []
    for qid, qv in queries:
        score = None
        for j in range(m):
            qsub = qv[j * sub : (j + 1) * sub]
            lut = F.array(
                *[
                    F.lit(
                        round(
                            sum(a * b for a, b in zip(qsub, codebook[j][c])),
                            round_digits,
                        )
                    )
                    for c in range(len(codebook[j]))
                ]
            )
            part = F.element_at(lut, F.element_at("codes", j + 1) + 1)
            score = part if score is None else score + part
        per_query.append(
            F.struct(
                F.lit(qid).alias("query_id"),
                F.round(score, round_digits).alias("score"),
            )
        )
    scored = codes.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(F.array(*per_query)).alias("q"),
    ).select("q.query_id", "neighbor_id", "q.score")
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
