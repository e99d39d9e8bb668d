"""Embedding-matrix statistics — covariance and PCA.

The dimensionality-reduction / whitening preprocessing of an embedding
pipeline (dedup thresholds, ANN cell training, and drift monitoring all
consume these). The data matrix is tall-and-skinny (N rows × d dims,
d ≤ a few hundred), so the right distributed plan is the classic
one-pass partial-sum reduction:

* each Arrow batch contributes (n, Σx, ΣxxT) computed by a float64 GEMM
  over the batch — zero per-row Python, no N×d shuffle;
* partials flatten to at most d² + d + 1 rows PER PARTITION, combined
  by one tiny hash aggregate (the same constant-size-state shape as the
  Count-Min sketch build);
* covariance C = ΣxxT/n − mean·meanT is a projection over d² rows.

The d×d eigenproblem is driver-side numpy ``eigh`` — d² doubles, the
one part of PCA that is NOT data-sized. Signs are canonicalized (first
nonzero component of each eigenvector made positive) so results are
engine- and LAPACK-order-deterministic. Projection back over the data
is one broadcast d×k matmul per Arrow batch.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _batch_matrix(tab, vec_col: str):
    """(n, d) float64 matrix from an Arrow list<float> column — buffer
    flatten + reshape, NO per-row ``as_py()`` (which would dominate the
    one data pass with Python object churn). Assumes the module-wide
    uniform-dimension, no-null embedding contract; a non-divisible
    ragged column fails loudly."""
    import numpy as np

    arr = tab.column(vec_col).combine_chunks()
    n = len(arr)
    if n == 0:
        return None
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    if flat.size % n:
        raise ValueError(f"ragged {vec_col} column: {flat.size} values / {n} rows")
    return flat.reshape(n, flat.size // n)


def _moment_sums(emb: DataFrame, vec_col: str) -> DataFrame:
    """One-pass raw moments as [i, j, v]: (i>=0, j>=0) = Σ x_i x_j;
    (i>=0, j=-1) = Σ x_i; (-1, -1) = row count. d² + d + 1 rows."""

    def partials(batches):
        import numpy as np
        import pyarrow as pa

        n = 0
        s = None
        c = None
        for b in batches:
            tab = pa.Table.from_batches([b])
            x = _batch_matrix(tab, vec_col)
            if x is None:
                continue
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            c = g if c is None else c + g
        if n == 0:
            return
        d = s.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pa.RecordBatch.from_pydict(
            {
                "i": ii.ravel().tolist() + list(range(d)) + [-1],
                "j": jj.ravel().tolist() + [-1] * d + [-1],
                "v": c.ravel().tolist() + s.tolist() + [float(n)],
            }
        )

    return (
        emb.select(vec_col)
        .mapInArrow(partials, "i long, j long, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
    )


def embedding_covariance(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Population covariance of the embedding column: [i, j, cov] with
    d² rows, C_ij = E[x_i x_j] − E[x_i]E[x_j] in float64. One pass over
    the data, one d²-keyed combine."""
    sums = _moment_sums(emb, vec_col)
    n_row = sums.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("v").alias("n")
    )
    means = (
        sums.filter((F.col("i") >= 0) & (F.col("j") == -1))
        .crossJoin(n_row)
        .select("i", (F.col("v") / F.col("n")).alias("mean"))
    )
    return (
        sums.filter((F.col("i") >= 0) & (F.col("j") >= 0))
        .crossJoin(n_row)
        .join(means.select(F.col("i").alias("i"), F.col("mean").alias("mi")), "i")
        .join(means.select(F.col("i").alias("j"), F.col("mean").alias("mj")), "j")
        .select(
            "i",
            "j",
            (F.col("v") / F.col("n") - F.col("mi") * F.col("mj")).alias("cov"),
        )
    )


@dataclass
class PCAResult:
    projected: DataFrame  # [id, proj: array<double>] — k-dim scores
    components: list  # k rows of d floats (sign-canonical eigenvectors)
    explained_variance: list  # k eigenvalues, descending


def embedding_pca(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PCAResult:
    """Top-k principal components of the embedding column. One
    distributed pass collects the d² + d + 1 moment sums; the d×d
    ``eigh`` runs on the driver (data-size-independent); projection is
    a broadcast matmul per Arrow batch: proj = (x − mean) @ Vk."""
    import numpy as np

    rows = _moment_sums(emb, vec_col).collect()
    if not rows:
        raise ValueError("embedding_pca: empty input")
    d = max(r["i"] for r in rows) + 1
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}]")
    n = 0.0
    s = np.zeros(d)
    G = np.zeros((d, d))
    for r in rows:
        if r["i"] == -1:
            n = r["v"]
        elif r["j"] == -1:
            s[r["i"]] = r["v"]
        else:
            G[r["i"], r["j"]] = r["v"]
    mean = s / n
    C = G / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(vals)[::-1][:k]
    evals = vals[order]
    V = vecs[:, order]
    # canonical signs: first component with |v| > 1e-12 made positive
    for c in range(k):
        nz = np.nonzero(np.abs(V[:, c]) > 1e-12)[0]
        if nz.size and V[nz[0], c] < 0:
            V[:, c] = -V[:, c]

    Vb = V.copy()
    mb = mean.copy()

    def project(batches):
        import pyarrow as pa

        for b in batches:
            tab = pa.Table.from_batches([b])
            x = _batch_matrix(tab, vec_col)
            if x is None:
                continue
            ids = tab.column(id_col).to_pylist()
            p = (x - mb) @ Vb
            yield pa.RecordBatch.from_pydict(
                {"id": ids, "proj": [row.tolist() for row in p]}
            )

    projected = emb.select(id_col, vec_col).mapInArrow(
        project, "id long, proj array<double>"
    )
    return PCAResult(
        projected=projected,
        components=[V[:, c].tolist() for c in range(k)],
        explained_variance=evals.tolist(),
    )


@dataclass
class KMeansResult:
    assignments: DataFrame  # [id, cell, dist2]
    centroids: list  # k rows of d floats (final)
    inertia: float
    iterations: int


def kmeans_assign(
    emb: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared euclidean,
    ties -> smaller cell index). ``centroids`` is a python list of
    d-float lists — broadcast as a k-row literal table (k·d doubles).
    Returns [id, cell, dist2]. One crossJoin against the tiny centroid
    table + a min_by struct argmax — no N×k shuffle."""
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, center array<double>",
    )
    scored = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(cdf))
        .select(
            "id",
            "cell",
            F.aggregate(
                F.zip_with(
                    F.col("v").cast("array<double>"),
                    F.col("center"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist2"),
        )
    )
    return scored.groupBy("id").agg(
        F.expr("min_by(struct(cell, dist2), struct(dist2, cell))").alias("s")
    ).select("id", F.col("s.cell").alias("cell"), F.col("s.dist2").alias("dist2"))


def kmeans_lloyd(
    emb: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KMeansResult:
    """Deterministic Lloyd k-means over the embedding column.

    Init: the k vectors with the SMALLEST ids (rand()-free, documented,
    reproducible — the repo-wide determinism rule; k-means++ trades
    this for seeding quality). Per iteration: one broadcast assignment
    pass (``kmeans_assign``) and one per-cell mean — posexplode to
    (cell, pos) partial+final averages, k·d rows collected to the
    driver (constant-sized, like the PCA eigh). Empty cells keep their
    previous centroid. Lloyd monotonicity (inertia never increases) and
    python-replica assignment parity are pinned in
    tests/test_embeddings.py."""
    if k < 1:
        raise ValueError("k must be >= 1")
    init_rows = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} exceeds the {len(init_rows)} input rows")
    cents = [[float(x) for x in r["v"]] for r in init_rows]
    d = len(cents[0])
    assigned = None
    for _ in range(n_iter):
        assigned = kmeans_assign(emb, cents, id_col, vec_col)
        base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        means = (
            assigned.join(base, "id")
            .select("cell", F.posexplode(F.col("v").cast("array<double>")))
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty cells keep previous
        for r in means:
            new_cents[r["cell"]][r["pos"]] = r["m"]
        cents = new_cents
    assigned = kmeans_assign(emb, cents, id_col, vec_col).localCheckpoint(
        eager=True
    )
    inertia = assigned.agg(F.sum("dist2")).first()[0] or 0.0
    return KMeansResult(
        assignments=assigned,
        centroids=cents,
        inertia=float(inertia),
        iterations=n_iter,
    )
