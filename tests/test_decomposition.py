"""PCA operator tests: planted-anisotropy recovery, whitening, sign/
partitioning determinism, and the driver-side dim guard."""

from __future__ import annotations

import math

import pytest

from sheetsetl_spark.operators.decomposition import _MAX_DIM, fit_pca, pca_project


def _planted(spark, n=60, dim=6):
    """Vectors = t * direction + small deterministic jitter: variance is
    dominated by one known axis."""
    direction = [1.0, 2.0, -1.0, 0.5, 0.0, 3.0][:dim]
    nrm = math.sqrt(sum(x * x for x in direction))
    unit = [x / nrm for x in direction]
    rows = []
    for i in range(n):
        t = (i - n / 2) / 4.0  # spread along the planted axis
        jitter = [((i * 7 + d * 13) % 11 - 5) / 50.0 for d in range(dim)]
        rows.append((i, [t * u + j for u, j in zip(unit, jitter)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), unit


def test_first_component_recovers_planted_axis(spark):
    df, unit = _planted(spark)
    _, comps, var = fit_pca(df, k=2, dim=6)
    cos = abs(sum(a * b for a, b in zip(comps[0], unit)))
    assert cos > 0.99, (comps[0], unit)
    assert var[0] > 10 * var[1]  # planted axis dominates
    assert var[0] >= var[1] >= 0


def test_projection_shape_and_variance_ordering(spark):
    df, _ = _planted(spark)
    proj = pca_project(df, k=3, dim=6).collect()
    assert len(proj) == 60 and all(len(r.proj) == 3 for r in proj)
    n = len(proj)
    by_comp = list(zip(*[r.proj for r in proj]))
    variances = [
        sum(v * v for v in col) / n - (sum(col) / n) ** 2 for col in by_comp
    ]
    assert variances[0] >= variances[1] >= variances[2]


def test_whitened_scores_have_unit_variance(spark):
    df, _ = _planted(spark)
    proj = pca_project(df, k=2, dim=6, whiten=True).collect()
    n = len(proj)
    for c in range(2):
        col = [r.proj[c] for r in proj]
        var = sum(v * v for v in col) / n - (sum(col) / n) ** 2
        assert abs(var - 1.0) < 0.05, var


def test_projection_is_partitioning_invariant(spark):
    df, _ = _planted(spark)
    a = {r.vec_id: tuple(r.proj) for r in pca_project(df, k=2, dim=6).collect()}
    b = {
        r.vec_id: tuple(r.proj)
        for r in pca_project(df.repartition(7), k=2, dim=6).collect()
    }
    assert a == b  # decimal moments + canonical sign => bit-stable


def test_dim_guard_and_small_input(spark):
    df, _ = _planted(spark, n=1)
    with pytest.raises(ValueError, match="at least 2"):
        fit_pca(df, k=1, dim=6)
    df2, _ = _planted(spark)
    with pytest.raises(ValueError, match=str(_MAX_DIM)):
        fit_pca(df2, k=1, dim=_MAX_DIM + 1)
    with pytest.raises(ValueError, match="outside"):
        fit_pca(df2, k=0, dim=6)


def test_incremental_moments_merge_equals_full_fit(spark):
    """Split the corpus, aggregate moments per half, merge with the
    generic partial-merge operator, refit: decimal partials make the
    merged fit BIT-identical to the full-corpus fit — the O(delta + d^2)
    covariance/PCA refresh path."""
    from sheetsetl_spark.operators.decomposition import (
        fit_pca_from_moments,
        pca_moments,
    )
    from sheetsetl_spark.operators.incremental import merge_aggregates

    df, _ = _planted(spark, n=50)
    old = df.filter("vec_id < 30")
    delta = df.filter("vec_id >= 30")
    merged = merge_aggregates(
        pca_moments(old, 6),
        pca_moments(delta, 6),
        ["i", "j"],
        count_col="n",
        sum_cols=["sx", "sy", "sxy"],
    )
    got = fit_pca_from_moments(merged, k=2, dim=6)
    want = fit_pca(df, k=2, dim=6)
    assert got == want  # exact, not approximately
