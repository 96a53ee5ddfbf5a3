"""Distributed PCA / whitening (operators/projection.py)."""

import numpy as np
import pytest

from tests.conftest import SF_DIR

from iceberg_rust_archive_spark.operators.projection import (
    fit_pca, pca_summary, project,
)


@pytest.fixture(scope="module")
def synth(spark):
    """200 points in d=6: dominant axis u (var≈9), secondary axis w
    (var≈1), tiny isotropic noise — a known ground truth."""
    rng = np.random.default_rng(7)
    u = np.array([1, 1, 0, 0, 0, 0]) / np.sqrt(2)
    w = np.array([0, 0, 1, -1, 0, 0]) / np.sqrt(2)
    x = (rng.normal(0, 3, 200)[:, None] * u
         + rng.normal(0, 1, 200)[:, None] * w
         + rng.normal(0, 0.05, (200, 6)) + 5.0)
    rows = [(i, v.astype(np.float32).tolist()) for i, v in enumerate(x)]
    return x, spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_fit_recovers_known_axes_and_matches_numpy(synth):
    x, df = synth
    mean, comps, evals = fit_pca(df, k=3)
    # driver-side ground truth on the same data
    ref_cov = np.cov(x.T, bias=True)
    ref_evals = np.sort(np.linalg.eigvalsh(ref_cov))[::-1][:3]
    assert np.allclose(mean, x.mean(axis=0), atol=1e-6)
    assert np.allclose(evals, ref_evals, rtol=1e-6)
    # descending eigenvalues, orthonormal rows
    assert evals[0] > evals[1] > evals[2]
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-8)
    # top component aligns with the dominant planted axis (up to sign)
    u = np.array([1, 1, 0, 0, 0, 0]) / np.sqrt(2)
    assert abs(float(comps[0] @ u)) > 0.99


def test_projection_variances_and_whitening(synth):
    x, df = synth
    mean, comps, evals = fit_pca(df, k=2)
    proj = project(df, mean, comps, out_col="p")
    y = np.vstack([r.p for r in proj.select("p").collect()])
    # per-dim variance of the projection == the eigenvalues
    assert np.allclose(y.var(axis=0), evals, rtol=1e-4)
    # whitened projection has ~unit variance per dim
    white = project(df, mean, comps, out_col="p", whiten=True,
                    eigenvalues=evals)
    yw = np.vstack([r.p for r in white.select("p").collect()])
    assert np.allclose(yw.var(axis=0), np.ones(2), rtol=1e-3)
    # original columns ride along untouched
    assert proj.columns == ["vec_id", "embedding", "p"]


def test_partials_are_partition_count_sized(synth):
    """The reduce pass collects ONE partial row per non-empty partition
    (the 100 TB contract: driver traffic ∝ partitions, not rows)."""
    from iceberg_rust_archive_spark.operators.projection import (
        _moment_partials,
    )
    _, df = synth
    df8 = df.repartition(8)
    parts = _moment_partials(df8, "embedding").collect()
    assert 1 <= len(parts) <= 8
    assert sum(r["n"] for r in parts) == 200


def test_pca_summary_on_testdata(spark):
    rows = pca_summary(spark, SF_DIR, k=6).collect()
    assert len(rows) == 6
    evs = [r.eigenvalue for r in rows]
    cums = [r.cum_explained for r in rows]
    assert all(a >= b - 1e-12 for a, b in zip(evs, evs[1:]))
    assert all(0 < c <= 1 + 1e-9 for c in cums)
    assert all(a <= b + 1e-12 for a, b in zip(cums, cums[1:]))
