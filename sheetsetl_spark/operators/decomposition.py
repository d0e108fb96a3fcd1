"""Distributed PCA for embedding columns (C3/C5 tier).

The 100 TB shape: the corpus contributes ONLY its first and second
moments — a d-vector mean and a d x d covariance, reduced as exact-DECIMAL
sums in one map-side-combined aggregation (the same moment pipeline the
oracle-checked ``c42_embedding_covariance`` query uses). The
eigendecomposition then runs driver-side on the d x d matrix (numpy —
microseconds for embedding-sized d), and the top-k components return to
the executors as PLAN LITERALS, so the projection pass is a zero-shuffle
codegen'd expression over the corpus. Vectors never leave the executors;
the only driver-side materialization is the d*(d+1)/2-row moment table
(guarded: d <= 512).

Determinism: moments are decimal-exact (partitioning-proof), numpy's
``eigh`` is deterministic for a given matrix, and each component's sign
is canonicalized (largest-|loading| coordinate made positive), so the
projection is a pure function of the data — same output on any cluster,
any partitioning. Verified by tests (repartition-invariance) and by the
planted-anisotropy recovery test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sheetsetl_spark.functions.lits import lit_double_array

_MAX_DIM = 512  # driver materializes d*(d+1)/2 moment rows — keep it scalar-sized


def pca_moments(vectors: DataFrame, dim: int, vec_col: str = "embedding") -> DataFrame:
    """(i, j, n, sx, sy, sxy) for the upper triangle i <= j — one corpus
    scan, one (i, j)-keyed aggregation with map-side partials; pairs
    replicate via a broadcast d*(d+1)/2-row index.

    The moments are exact-DECIMAL partials, so they compose with
    ``operators.incremental.merge_aggregates(old, delta, ["i","j"], "n",
    ["sx","sy","sxy"])``: an incremental covariance/PCA refresh over a
    stored moment table costs O(delta + d²) instead of re-scanning the
    100 TB history, and the merged fit is bit-identical to a full
    recompute (tested)."""
    spark = vectors.sparkSession
    dims = spark.createDataFrame(
        [(i, j) for i in range(1, dim + 1) for j in range(i, dim + 1)], "i int, j int"
    )
    # Fail loudly on width mismatches INLINE (no extra corpus scan): a
    # vector shorter than `dim` (or a NULL entry) would make element_at
    # yield NULL, which the decimal sums SKIP while count(*) still counts
    # the row — silently biasing every mean/covariance cell (ADVICE r4).
    # The guard rides the same projection, so validation is free.
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == F.lit(dim))
    checked = F.when(ok, F.col(vec_col)).otherwise(
        F.raise_error(
            F.lit(
                f"pca_moments: column {vec_col!r} has a NULL or "
                f"non-{dim}-wide vector; filter or pad first"
            )
        )
    )
    xi = F.element_at(checked, F.col("i")).cast("double")
    xj = F.element_at(checked, F.col("j")).cast("double")
    pairs = vectors.crossJoin(F.broadcast(dims)).select(
        "i", "j", xi.alias("xi"), xj.alias("xj")
    )
    return pairs.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.sum(F.col("xi").cast("decimal(38,9)")).alias("sx"),
        F.sum(F.col("xj").cast("decimal(38,9)")).alias("sy"),
        F.sum((F.col("xi") * F.col("xj")).cast("decimal(38,9)")).alias("sxy"),
    )


def fit_pca(
    vectors: DataFrame,
    k: int,
    dim: int,
    vec_col: str = "embedding",
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit PCA on an embedding column: returns (mean, components,
    explained_variance) with ``components`` as k rows of d loadings,
    ordered by descending eigenvalue."""
    _validate(k, dim)
    return fit_pca_from_moments(pca_moments(vectors, dim, vec_col), k, dim)


def _validate(k: int, dim: int) -> None:
    if dim > _MAX_DIM:
        raise ValueError(
            f"dim={dim} > {_MAX_DIM}: the driver-side moment table is "
            "d*(d+1)/2 rows — reduce dims first (e.g. slice or hash-project)"
        )
    if not 1 <= k <= dim:
        raise ValueError(f"k={k} outside [1, dim={dim}]")


def fit_pca_from_moments(
    moments: DataFrame, k: int, dim: int
) -> tuple[list[float], list[list[float]], list[float]]:
    """Fit from a (possibly merged) moment table — the incremental-refresh
    entry point. Requires numpy (driver only — executors never see it)."""
    import numpy as np

    _validate(k, dim)
    pdf = moments.toPandas()
    if len(pdf) == 0:
        raise ValueError(
            "fit_pca_from_moments: empty moment table (no input vectors?)"
        )
    n = int(pdf["n"].iloc[0])
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    mean = np.zeros(dim)
    cov = np.zeros((dim, dim))
    for row in pdf.itertuples(index=False):
        i, j = row.i - 1, row.j - 1
        sx, sy, sxy = float(row.sx), float(row.sy), float(row.sxy)
        cov[i, j] = cov[j, i] = (sxy - sx * sy / n) / n
        if i == j:
            mean[i] = sx / n
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps, var = [], []
    for idx in order:
        v = evecs[:, idx]
        # canonical sign: the largest-|loading| coordinate is positive
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        var.append(max(float(evals[idx]), 0.0))
    return [float(m) for m in mean], comps, var


def pca_project(
    vectors: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    whiten: bool = False,
    round_to: int = 6,
) -> DataFrame:
    """Project every vector onto the top-k principal components:
    (id, proj array<double>[k]).

    The fitted mean/components enter the projection plan as literals, so
    this pass is a zero-shuffle narrow projection — at 100 TB the fit
    costs one moment aggregation and the transform streams the corpus
    once with no exchange. ``whiten=True`` scales each score by
    1/sqrt(eigenvalue) (unit-variance scores; zero-variance components
    yield 0.0, not inf)."""
    mean, comps, var = fit_pca(vectors, k, dim, vec_col=vec_col)
    centered = F.zip_with(
        F.slice(F.col(vec_col).cast("array<double>"), 1, dim),
        lit_double_array(mean),
        lambda x, m: x - m,
    )
    # center ONCE into a named column: expressions captured inside lambdas
    # re-evaluate per element (the tokenize-once lesson, SCALE.md), and k
    # score expressions would otherwise each re-center the vector
    base = vectors.select(F.col(id_col), centered.alias("__centered"))
    scores = []
    for c, ev in zip(comps, var):
        dot = F.aggregate(
            F.zip_with(
                F.col("__centered"), lit_double_array(c), lambda x, w: x * w
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if whiten:
            dot = dot / F.lit(ev**0.5) if ev > 0 else F.lit(0.0)
        scores.append(F.round(dot, round_to))
    return base.select(F.col(id_col), F.array(*scores).alias("proj"))
