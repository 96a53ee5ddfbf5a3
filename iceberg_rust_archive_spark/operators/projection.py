"""Distributed PCA / whitening over an embedding column.

The standard preprocessing step before embedding dedup or ANN at corpus
scale (center, rotate onto principal axes, optionally whiten) — reduces
dimension ahead of the O(d) per-pair work every downstream similarity
operator pays.

Decomposition strategy for 100 TB: PCA needs only the d×d second-moment
matrix, and d (embedding width, 64 here) is tiny — so the heavy pass is
one Arrow-batched ``mapInPandas`` that reduces each partition to a
SINGLE partial ``(n, Σx, ΣxᵀX)`` row (d + d² floats). The driver sums
the per-partition partials (constant-size collect — #partitions rows,
NOT data rows) and runs ``numpy.linalg.eigh`` on the d×d covariance.
The projection pass broadcasts the k×d component matrix and applies one
numpy GEMM per Arrow batch — the same kernel discipline as
operators/similarity.py. Two scans total, zero shuffles.

The reference engine has no linear-algebra surface; this extends the
training-data operator set the north-star brief asks for.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, DoubleType, FloatType, LongType, StructField, StructType,
)


def _moment_partials(df: DataFrame, vec_col: str):
    """Per-partition (n, Σx, flat ΣXᵀX) — constant size per partition."""
    d_holder = {}

    out_schema = StructType([
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("ss", ArrayType(DoubleType()))])

    def part(batches):
        import pandas as pd
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "ss": [ss.ravel().tolist()]})

    return df.select(vec_col).mapInPandas(part, schema=out_schema)


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Fit PCA on the embedding column. Returns
    ``(mean d-vec, components k×d, eigenvalues k)`` —
    eigenvalues sorted descending; components rows are orthonormal."""
    rows = _moment_partials(df, vec_col).collect()
    if not rows:
        raise ValueError("empty input")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    return mean, evecs[:, order].T.copy(), np.maximum(evals[order], 0.0)


def project(df: DataFrame, mean: np.ndarray, components: np.ndarray,
            vec_col: str = "embedding", out_col: str = "pca",
            whiten: bool = False,
            eigenvalues: np.ndarray | None = None) -> DataFrame:
    """Append the k-dim projection ``(x - mean) @ componentsᵀ`` (scaled
    by 1/√λ when whitening). Broadcast-closure matrices, one GEMM per
    Arrow batch, no shuffle."""
    comp = components.astype(np.float64)
    if whiten:
        if eigenvalues is None:
            raise ValueError("whiten=True needs eigenvalues")
        comp = comp / np.sqrt(np.maximum(eigenvalues, 1e-12))[:, None]
    mu = mean.astype(np.float64)

    fields = list(df.schema.fields) + [
        StructField(out_col, ArrayType(FloatType()))]

    def proj(batches):
        for pdf in batches:
            if len(pdf):
                x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                y = (x - mu) @ comp.T
                pdf = pdf.copy()
                pdf[out_col] = [r.astype(np.float32) for r in y]
            yield pdf

    return df.mapInPandas(proj, schema=StructType(fields))


def pca_summary(spark, sf_dir: str, k: int = 8) -> DataFrame:
    """Variance accounting per principal component — the evidence table
    (component rank, eigenvalue, cumulative explained-variance share)."""
    import os

    from pyspark.sql import functions as F  # noqa: F401

    from iceberg_rust_archive_spark.session import read_parallel
    e = read_parallel(spark, os.path.join(sf_dir, "embeddings.parquet"))
    mean, comps, evals = fit_pca(e, k=k)
    total = float(np.sum(evals)) or 1.0
    # total variance needs ALL eigenvalues; refit trick: trace(cov)
    rows = _moment_partials(e, "embedding").collect()
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    tr = 0.0
    for r in rows:
        s += np.asarray(r["s"])
    mu = s / n
    for r in rows:
        ss = np.asarray(r["ss"]).reshape(d, d)
        tr += np.trace(ss)
    tr = tr / n - float(mu @ mu)
    cum = np.cumsum(evals) / (tr or 1.0)
    data = [(i + 1, float(evals[i]), float(cum[i]))
            for i in range(len(evals))]
    return spark.createDataFrame(
        data, ["component", "eigenvalue", "cum_explained"])
