"""Closed-form linear probe over an embedding column.

The standard "is this representation any good / which docs look like
class X" tool in a training-data pipeline: a ridge-regularized linear
classifier trained one-vs-all on frozen embeddings. fastText-style
quality filters are exactly this shape (a linear head over pooled
features), so the same operator doubles as a quality-classifier
trainer once labels are weak (wiki-vs-crawl, kept-vs-flagged, ...).

Scale design — no SGD, no iterations: ridge has the closed form
``W = (XᵀX + λI)⁻¹ XᵀY`` and both Gram matrices are (d+1)-sized, so
training is ONE Arrow-batched ``mapInPandas`` pass reducing every
partition to a single ``(n, XᵀX, XᵀY)`` partial (same discipline as
operators/projection.py — driver traffic ∝ partitions, never rows),
plus a (d+1)² solve on the driver. Evaluation broadcasts W and scores
each Arrow batch with one GEMM; the only shuffle anywhere is the final
per-class accuracy groupBy over #classes rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
)


def fit_linear_probe(df: DataFrame, vec_col: str = "embedding",
                     label_col: str = "label", l2: float = 1e-3):
    """Train one-vs-all ridge on (embedding, int label). Returns
    ``(classes, W)`` with W of shape (d+1, C) — last row is the bias."""
    classes_rows = (df.select(label_col).distinct()
                    .orderBy(label_col).collect())
    classes = [int(r[0]) for r in classes_rows]
    cls_index = {c: i for i, c in enumerate(classes)}
    n_cls = len(classes)

    out_schema = StructType([
        StructField("n", LongType()),
        StructField("xtx", ArrayType(DoubleType())),
        StructField("xty", ArrayType(DoubleType()))])

    def part(batches):
        import pandas as pd
        n = 0
        xtx = None
        xty = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            x = np.hstack([x, np.ones((x.shape[0], 1))])  # bias column
            y = np.zeros((x.shape[0], n_cls))
            for r, lab in enumerate(pdf[label_col].to_numpy()):
                y[r, cls_index[int(lab)]] = 1.0
            n += x.shape[0]
            g = x.T @ x
            h = x.T @ y
            xtx = g if xtx is None else xtx + g
            xty = h if xty is None else xty + h
        if n:
            yield pd.DataFrame({"n": [n], "xtx": [xtx.ravel().tolist()],
                                "xty": [xty.ravel().tolist()]})

    rows = (df.select(vec_col, label_col)
            .mapInPandas(part, schema=out_schema).collect())
    if not rows:
        raise ValueError("empty training input")
    d1 = int(round(len(rows[0]["xtx"]) ** 0.5))
    xtx = np.zeros((d1, d1))
    xty = np.zeros((d1, n_cls))
    for r in rows:
        xtx += np.asarray(r["xtx"]).reshape(d1, d1)
        xty += np.asarray(r["xty"]).reshape(d1, n_cls)
    reg = l2 * np.eye(d1)
    reg[-1, -1] = 0.0  # don't penalize the bias
    w = np.linalg.solve(xtx + reg, xty)
    return classes, w


def predict(df: DataFrame, classes: list[int], w: np.ndarray,
            vec_col: str = "embedding",
            out_col: str = "predicted") -> DataFrame:
    """Append argmax-scored class: broadcast W, one GEMM per batch."""
    w_ = w.astype(np.float64)
    cls = np.asarray(classes)
    fields = list(df.schema.fields) + [
        StructField(out_col, IntegerType())]

    def score(batches):
        for pdf in batches:
            if len(pdf):
                x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                x = np.hstack([x, np.ones((x.shape[0], 1))])
                pred = cls[np.argmax(x @ w_, axis=1)]
                pdf = pdf.copy()
                pdf[out_col] = pred.astype(np.int32)
            yield pdf

    return df.mapInPandas(score, schema=StructType(fields))


def probe_summary(spark, sf_dir: str, l2: float = 1e-3) -> DataFrame:
    """Train on the deterministic hash-split train fold, evaluate on
    the held-out fold: per-class (n, n_correct) — the probe-accuracy
    evidence table."""
    import os

    from iceberg_rust_archive_spark.operators.sampling import (
        _hash_bucket,
    )
    from iceberg_rust_archive_spark.session import read_parallel
    e = read_parallel(spark, os.path.join(sf_dir, "embeddings.parquet"))
    b = _hash_bucket(F.col("vec_id"))
    train = e.filter(b >= 20)
    test = e.filter(b < 20)
    classes, w = fit_linear_probe(train, l2=l2)
    scored = predict(test, classes, w)
    return (scored.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("predicted") == F.col("label"), 1)
                       .otherwise(0)).alias("n_correct"))
            .orderBy("label"))
