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
