"""Closed-form linear probe (operators/probe.py)."""

import numpy as np
import pytest

from tests.conftest import SF_DIR

from iceberg_rust_archive_spark.operators.probe import (
    fit_linear_probe, predict, probe_summary,
)


@pytest.fixture(scope="module")
def separable(spark):
    """Three linearly-separable Gaussian blobs in d=5."""
    rng = np.random.default_rng(11)
    centers = np.array([[4, 0, 0, 0, 0],
                        [0, 4, 0, 0, 0],
                        [0, 0, 4, 0, 0]], dtype=float)
    rows = []
    for i in range(300):
        c = i % 3
        v = centers[c] + rng.normal(0, 0.4, 5)
        rows.append((i, v.astype(np.float32).tolist(), c))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_probe_matches_driver_side_ridge(separable):
    """The distributed Gram-partial fit must equal the same ridge solved
    in one numpy shot on the collected data."""
    classes, w = fit_linear_probe(separable, l2=1e-3)
    rows = separable.orderBy("vec_id").collect()
    x = np.vstack([r.embedding for r in rows]).astype(np.float64)
    x = np.hstack([x, np.ones((len(rows), 1))])
    y = np.zeros((len(rows), 3))
    for i, r in enumerate(rows):
        y[i, r.label] = 1.0
    reg = 1e-3 * np.eye(x.shape[1])
    reg[-1, -1] = 0.0
    w_ref = np.linalg.solve(x.T @ x + reg, x.T @ y)
    assert classes == [0, 1, 2]
    assert np.allclose(w, w_ref, rtol=1e-8, atol=1e-10)


def test_probe_separates_blobs(separable):
    classes, w = fit_linear_probe(separable)
    scored = predict(separable, classes, w)
    acc = scored.filter("predicted = label").count() / scored.count()
    assert acc > 0.99
    assert scored.columns[-1] == "predicted"


def test_probe_partition_invariance(separable):
    """Same weights at any parallelism — the partial-sum reduction is
    exact, not an SGD approximation."""
    _, w1 = fit_linear_probe(separable.repartition(1))
    _, w8 = fit_linear_probe(separable.repartition(8))
    assert np.allclose(w1, w8, rtol=1e-9)


def test_probe_summary_on_testdata(spark):
    rows = probe_summary(spark, SF_DIR).collect()
    assert rows, "held-out fold must be non-empty"
    n = sum(r.n for r in rows)
    correct = sum(r.n_correct for r in rows)
    assert 0 < n and all(0 <= r.n_correct <= r.n for r in rows)
    # testdata labels carry no embedding signal, so the honest probe
    # readout is chance-level accuracy — assert it does NOT fabricate
    # separation (≪ 60%) while still producing a full accounting
    assert correct / n < 0.6
    assert len(rows) == 10  # every class present in the held-out fold
