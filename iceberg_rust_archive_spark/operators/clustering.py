"""Distributed k-means (Lloyd's) + SemDeDup-style semantic dedup over
the embeddings table.

Reference parity note: the reference engine (JanKaul/iceberg-rust_archive)
has no vector operators — this module belongs to the
training-data-pipeline extension surface, layered on the same scan
machinery as operators/similarity.py.

100 TB shape:

- ``fit_kmeans`` — assignment is a numpy GEMM per Arrow batch inside
  one ``mapInPandas`` (no shuffle); each PARTITION contributes exactly
  one (k × dim) sum matrix + k counts, so driver traffic per Lloyd
  iteration is O(partitions × k × dim) and independent of row count —
  the same Gram-partial pattern as operators/projection.py (PCA). The
  result is partition-invariant because partials are added in float64
  and means are taken once on the driver.
- ``assign_clusters`` — stateless broadcast-centroids map; composes
  with the IVF coarse quantizer in operators/similarity.py (a trained
  centroid set drops in where IVF uses its deterministic one).
- ``semantic_dedup_pairs`` — SemDeDup: pairwise cosine confined WITHIN
  clusters. Scale story: k grows with the corpus (k ≈ √N keeps
  expected cluster size √N), so the per-cluster pair explosion is
  bounded by construction and the only shuffle is the equi-join on
  ``cid``. The pairwise join itself is JVM-side (aggregate-over-
  zip_with dot products, no Python in the hot path).

Float discipline (oracle parity): cosines are rounded to 4 decimals
BEFORE any argmax/threshold on BOTH engines, with ties broken by the
smaller centroid id, so Spark's GEMM and DuckDB's sequential fold agree
exactly — the same convention ann_ivf_topk established.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_rust_archive_spark.operators.similarity import _vectors

KMEANS_K = 8
SEMDEDUP_THRESHOLD = 0.4
# Above this corpus size the default k switches from the pinned
# KMEANS_K to ⌈√N⌉ — the same axis (and value) as similarity.py's
# IVF_AUTO_SWITCH_N, keeping the oracle-graded entries deterministic
# at their small fixed SFs while the 1B-row default stays sane.
KMEANS_AUTO_SWITCH_N = 1_000_000
# Hard per-task bound for SemDeDup's within-cluster quadratic: a
# cluster larger than this is recursively sub-split inside its task,
# so pair work is ≤ m·cap per cluster even under skewed assignment.
SEMDEDUP_MAX_CLUSTER = 4096


def kmeans_k(n: int) -> int:
    """Corpus-adaptive default cluster count (the contract the
    SemDeDup docstring promises): pinned at KMEANS_K for small corpora,
    ``⌈√N⌉`` above KMEANS_AUTO_SWITCH_N so the EXPECTED cluster size is
    √N and the per-cluster pairwise GEMM stays one-task-sized — mirrors
    ``ivf_num_centroids`` (similarity.py)."""
    if n <= KMEANS_AUTO_SWITCH_N:
        return KMEANS_K
    return math.isqrt(n - 1) + 1


def _init_centroids(vecs: DataFrame, k: int) -> np.ndarray:
    """Deterministic init: the vectors with the k smallest vec_id.
    (k rows — constant-size collect; a k-means++ sampler could replace
    this without touching the iteration kernel.)"""
    rows = (vecs.orderBy("vec_id").limit(k).select("v").collect())
    return np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])


def _assign_ids(vecs: DataFrame, cents: np.ndarray,
                out_col: str = "cid") -> DataFrame:
    """(vec_id, cid): nearest centroid by ROUNDED cosine, ties → smaller
    cid. One Arrow-batched GEMM per batch; centroids ride the closure
    (k × dim float64 — broadcast-small by construction)."""
    c = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True),
                           1e-300)

    def kernel(batches):
        import pandas as pd
        for pdf in batches:
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nrm = np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                             1e-300)
            cs = np.round((x / nrm) @ c.T, 4)
            # argmax with smaller-cid tie-break: argmax returns the
            # FIRST maximal index, which is the smallest cid
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                out_col: cs.argmax(axis=1)})

    return vecs.mapInPandas(kernel, f"vec_id long, {out_col} int")


def fit_kmeans(vecs: DataFrame, k: int | None = None, iters: int = 2,
               init: np.ndarray | None = None):
    """Lloyd's algorithm over (vec_id, v) with cosine assignment.
    Returns ``(centroids, sizes)`` — centroids are plain member means
    (un-normalized), sizes the final cluster populations. Empty
    clusters keep their previous centroid. ``k`` defaults to the
    corpus-adaptive ``kmeans_k(N)`` (⌈√N⌉ past the switch); an explicit
    ``init`` pins k to its row count."""
    if init is not None:
        k = len(init)
    elif k is None:
        k = kmeans_k(vecs.count())
    cents = _init_centroids(vecs, k) if init is None else init
    sizes = np.zeros(k, dtype=np.int64)
    for _ in range(max(1, iters)):
        c = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)
        dim = c.shape[1]

        def partials(batches, c=c, k=k, dim=dim):
            import pandas as pd
            counts = np.zeros(k, dtype=np.int64)
            sums = np.zeros((k, dim), dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
                nrm = np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                                 1e-300)
                a = np.round((x / nrm) @ c.T, 4).argmax(axis=1)
                np.add.at(counts, a, 1)
                np.add.at(sums, a, x)
            nz = np.nonzero(counts)[0]
            yield pd.DataFrame({
                "cid": nz.astype("int32"),
                "n": counts[nz],
                "vsum": [sums[i].tolist() for i in nz]})

        rows = vecs.mapInPandas(
            partials, "cid int, n long, vsum array<double>").collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        for r in rows:
            counts[r["cid"]] += r["n"]
            sums[r["cid"]] += np.asarray(r["vsum"], dtype=np.float64)
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None]
        sizes = counts
    return cents, sizes


def assign_clusters(vecs: DataFrame, cents: np.ndarray,
                    out_col: str = "cid") -> DataFrame:
    """vecs plus an ``out_col`` cluster-id column (equi-join on vec_id —
    the GEMM kernel only ships ids back, never the vectors)."""
    return vecs.join(_assign_ids(vecs, cents, out_col), "vec_id")


def kmeans_summary(spark: SparkSession, sf_dir: str,
                   k: int | None = None,
                   cents: np.ndarray | None = None) -> DataFrame:
    """One oracle-visible Lloyd step: assign every vector to its
    nearest deterministic init centroid (vec_id < k), then report the
    UPDATED cluster means as (cid, n, centroid_norm). SQL-expressible
    (unnest + per-position avg), so the distributed kernel is graded
    end-to-end by the DuckDB twin."""
    vecs = _vectors(spark, sf_dir)
    if cents is None and k is None:
        k = kmeans_k(vecs.count())
    cents, sizes = fit_kmeans(vecs, k=k, iters=1, init=cents)
    rows = [(int(cid), int(n),
             float(np.round(np.linalg.norm(cents[cid]), 4)))
            for cid, n in enumerate(sizes) if n > 0]
    return spark.createDataFrame(
        rows, "cid int, n long, centroid_norm double").orderBy("cid")


def _bounded_cluster_pairs(ids, x, nrm, threshold, cap):
    """Thresholded pairwise cosine within ONE cluster, recursively
    sub-splitting clusters larger than ``cap``: over-cap members
    re-assign to ⌈m/cap⌉ sub-centroids (the first rows in vec_id order
    — the `_init_centroids` rule applied locally), and each sub-cluster
    recurses. A degenerate split (every member lands on one
    sub-centroid, e.g. identical vectors) falls back to positional
    chunks so progress is guaranteed. Either way total pair work per
    original cluster is O(m·cap), never O(m²) — the guard that keeps a
    skewed assignment from handing one task an unbounded quadratic.
    Cross-sub-cluster pairs are not scored — the same approximation
    SemDeDup already makes at cluster boundaries.

    Iterative worklist, not recursion: a near-degenerate assignment can
    shrink the largest sub-cluster by only one member per level, so a
    recursive formulation is O(m) deep and RecursionErrors inside the
    executor task on a large skewed cluster. The chunk fallback also
    triggers whenever the largest sub-cluster fails to shrink below
    90% of its parent, so every worklist item strictly shrinks."""
    out_a, out_b, out_c = [], [], []
    stack = [np.arange(len(ids))]
    while stack:
        idx = stack.pop()
        m = len(idx)
        if m <= cap:
            if m < 2:
                continue
            xs, ns = x[idx], nrm[idx]
            cs = np.round((xs @ xs.T) / np.outer(ns, ns), 4)
            ia, ib = np.triu_indices(m, 1)
            keep = cs[ia, ib] >= threshold
            out_a.extend(ids[idx[ia[keep]]])
            out_b.extend(ids[idx[ib[keep]]])
            out_c.extend(cs[ia[keep], ib[keep]])
            continue
        s = -(-m // cap)  # ⌈m/cap⌉ ≥ 2 sub-centroids
        c = x[idx[:s]]
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True),
                           1e-300)
        a = np.round((x[idx] / nrm[idx, None]) @ c.T, 4).argmax(axis=1)
        subs = [idx[a == j] for j in range(s)]
        if max(len(sub) for sub in subs) > 0.9 * m:
            subs = [idx[j::s] for j in range(s)]  # degenerate → chunks
        stack.extend(subs)
    return out_a, out_b, out_c


def semantic_dedup_pairs(spark: SparkSession, sf_dir: str,
                         k: int | None = None,
                         threshold: float = SEMDEDUP_THRESHOLD,
                         cents: np.ndarray | None = None,
                         max_cluster: int = SEMDEDUP_MAX_CLUSTER
                         ) -> DataFrame:
    """SemDeDup near-duplicate pairs: cluster on the (deterministic
    init, or caller-trained) centroids, then within-cluster pairwise
    rounded cosine ≥ threshold. Returns (id_a, id_b, cosine) with
    id_a < id_b.

    Physical shape: ONE shuffle — the assignment kernel tags each row
    with its cid without any join (v/nrm pass through the same Arrow
    batch), then ``groupBy(cid).applyInPandas`` does the pairwise
    cosine as a per-cluster float64 GEMM. The default k is the
    corpus-adaptive ``kmeans_k(N)`` (⌈√N⌉ past the switch) so the
    EXPECTED cluster is one-task-sized, and ``max_cluster`` bounds the
    worst case: an over-cap cluster (skewed assignment) sub-splits
    recursively inside its task (``_bounded_cluster_pairs``), so no
    task ever runs an unbounded quadratic."""
    vecs = _vectors(spark, sf_dir)
    if cents is None:
        if k is None:
            k = kmeans_k(vecs.count())
        cents = _init_centroids(vecs, k)
    c = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True),
                           1e-300)

    def tag(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            nrm = np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                             1e-300)
            pdf = pdf.copy()
            pdf["cid"] = np.round((x / nrm) @ c.T, 4).argmax(axis=1)
            yield pdf

    members = vecs.mapInPandas(
        tag, "vec_id long, v array<double>, nrm double, cid int")

    def pairwise(pdf):
        import pandas as pd
        pdf = pdf.sort_values("vec_id", ignore_index=True)
        ids = pdf["vec_id"].to_numpy()
        x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        nrm = pdf["nrm"].to_numpy()
        a, b, cos = _bounded_cluster_pairs(ids, x, nrm, threshold,
                                           max_cluster)
        return pd.DataFrame({"id_a": np.asarray(a, dtype=np.int64),
                             "id_b": np.asarray(b, dtype=np.int64),
                             "cosine": np.asarray(cos)})

    pairs = members.groupBy("cid").applyInPandas(
        pairwise, "id_a long, id_b long, cosine double")
    return pairs.orderBy("id_a", "id_b")


# DuckDB twins (same fold order + rounding discipline as similarity.py)
_N = """
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * x))) AS nrm
  FROM embeddings
"""
_ASSIGN = f"""
  SELECT vec_id, v, nrm, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cs DESC, cid) AS rn
  FROM (SELECT n.vec_id, n.v, n.nrm, c.cid,
               round(list_sum(list_transform(generate_series(1, len(n.v)),
                     i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 4) AS cs
        FROM n CROSS JOIN c)
"""

ORACLE_SQL = {
    "kmeans_summary": f"""
        WITH n AS ({_N}),
        c AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
              WHERE vec_id < {KMEANS_K}),
        assign AS ({_ASSIGN}),
        members AS (SELECT vec_id, v, cid FROM assign WHERE rn = 1),
        sizes AS (SELECT cid, count(*) AS n FROM members GROUP BY cid),
        upd AS (
          SELECT cid, pos, avg(val) AS m FROM (
            SELECT cid, unnest(v) AS val,
                   generate_subscripts(v, 1) AS pos
            FROM members) GROUP BY cid, pos)
        SELECT CAST(u.cid AS INT) AS cid, s.n,
               round(sqrt(sum(m * m)), 4) AS centroid_norm
        FROM upd u JOIN sizes s USING (cid)
        GROUP BY u.cid, s.n
    """,
    "semantic_dedup_pairs": f"""
        WITH n AS ({_N}),
        c AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
              WHERE vec_id < {KMEANS_K}),
        assign AS ({_ASSIGN}),
        members AS (SELECT vec_id, v, nrm, cid FROM assign WHERE rn = 1)
        SELECT id_a, id_b, cosine FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_sum(list_transform(
                       generate_series(1, len(a.v)),
                       i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4)
                 AS cosine
          FROM members a JOIN members b
            ON a.cid = b.cid AND a.vec_id < b.vec_id)
        WHERE cosine >= {SEMDEDUP_THRESHOLD}
    """,
}


def cluster_topics(spark: SparkSession, sf_dir: str,
                   k: int | None = None, top_n: int = 3) -> DataFrame:
    """Cluster-then-describe: assign document embeddings to the
    deterministic init centroids, then label each cluster with its
    top-``top_n`` TF-IDF terms (tf within the cluster's concatenated
    docs; idf over clusters). The cross-modal curation view — "what IS
    cluster 3" — pairing SemDeDup's geometry with the text surface.

    Shape: assignment is the join-free Arrow kernel; the text side is
    the same explode→(cid, word) aggregate as text_tfidf_top_terms with
    source replaced by cid, so everything after assignment is JVM-side
    and partially aggregates map-side."""
    import os

    from pyspark.sql.window import Window

    from iceberg_rust_archive_spark.operators.text import _WORDS
    from iceberg_rust_archive_spark.session import read_parallel

    vecs = _vectors(spark, sf_dir)
    if k is None:
        k = kmeans_k(vecs.count())
    cents = _init_centroids(vecs, k)
    assign = _assign_ids(vecs, cents)
    docs = read_parallel(
        spark, os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    tagged = docs.join(assign.withColumnRenamed("vec_id", "doc_id"),
                       "doc_id")
    words = (tagged.withColumn("ws", F.expr(_WORDS))
             .select("cid", F.explode("ws").alias("w")))
    tf = words.groupBy("cid", "w").agg(F.count(F.lit(1)).alias("tf"))
    # the IDF denominator rides the SAME lazy DAG as a broadcast
    # one-row scalar instead of a separate eager .count() job — the
    # whole operator then materializes in one action
    ncl = tagged.select(
        F.countDistinct("cid").cast("double").alias("__n_clusters"))
    dfc = tf.groupBy("w").agg(F.countDistinct("cid").alias("n_c"))
    scored = (tf.join(dfc, "w")
              .crossJoin(F.broadcast(ncl))
              .withColumn("tfidf", F.round(
                  F.col("tf") * F.log(F.col("__n_clusters")
                                      / F.col("n_c")), 6)))
    win = Window.partitionBy("cid").orderBy(
        F.col("tfidf").desc(), F.col("w"))
    return (scored.withColumn("rank", F.row_number().over(win))
            .filter(F.col("rank") <= top_n)
            .select("cid", "w", "tfidf", "rank")
            .orderBy("cid", "rank"))


_TOPIC_WORDS = ("list_filter(string_split_regex(lower(text), '\\s+'), "
                "w -> w != '')")
ORACLE_SQL["cluster_topics"] = f"""
    WITH n AS ({_N}),
    c AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n
          WHERE vec_id < {KMEANS_K}),
    assign AS ({_ASSIGN}),
    members AS (SELECT vec_id, cid FROM assign WHERE rn = 1),
    tagged AS (
      SELECT m.cid, d.text FROM documents d
      JOIN members m ON d.doc_id = m.vec_id),
    words AS (SELECT cid, unnest({_TOPIC_WORDS}) AS w FROM tagged),
    tf AS (SELECT cid, w, count(*) AS tf FROM words GROUP BY 1, 2),
    dfc AS (SELECT w, count(DISTINCT cid) AS n_c FROM tf GROUP BY w),
    nc AS (SELECT count(DISTINCT cid) AS n FROM tagged),
    scored AS (
      SELECT cid, w, round(tf * ln(nc.n::DOUBLE / n_c), 6) AS tfidf
      FROM tf JOIN dfc USING (w) CROSS JOIN nc)
    SELECT cid, w, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY cid
                 ORDER BY tfidf DESC, w) AS rank FROM scored
    ) WHERE rank <= 3
"""
