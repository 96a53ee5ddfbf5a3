"""Distributed k-means + SemDeDup (operators/clustering.py).

Ground truth is a plain-numpy Lloyd's run on the collected vectors —
the distributed kernel must reproduce it exactly (same rounding/
tie-break discipline) and be partition-count invariant."""

import numpy as np
import pytest

from iceberg_rust_archive_spark.operators import clustering
from iceberg_rust_archive_spark.operators.similarity import _vectors

SF_DIR = "/root/testdata/sf0.001"


def _numpy_lloyd(x, k, iters):
    cents = x[:k].copy()
    sizes = np.zeros(k, dtype=np.int64)
    for _ in range(iters):
        c = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)
        xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                            1e-300)
        a = np.round(xn @ c.T, 4).argmax(axis=1)
        new = cents.copy()
        for i in range(k):
            m = a == i
            sizes[i] = m.sum()
            if sizes[i]:
                new[i] = x[m].mean(axis=0)
        cents = new
    return cents, sizes


@pytest.fixture(scope="module")
def xs(spark):
    rows = (_vectors(spark, SF_DIR).orderBy("vec_id")
            .select("vec_id", "v").collect())
    ids = np.array([r[0] for r in rows])
    x = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    assert (ids == np.arange(len(ids))).all()  # init = x[:k]
    return x


def test_fit_kmeans_matches_numpy(spark, xs):
    vecs = _vectors(spark, SF_DIR)
    for iters in (1, 3):
        cents, sizes = clustering.fit_kmeans(vecs, k=4, iters=iters)
        ref_c, ref_s = _numpy_lloyd(xs, 4, iters)
        assert (sizes == ref_s).all()
        np.testing.assert_allclose(cents, ref_c, rtol=0, atol=1e-9)


def test_fit_kmeans_partition_invariant(spark):
    vecs = _vectors(spark, SF_DIR)
    c1, s1 = clustering.fit_kmeans(vecs.coalesce(1), k=4, iters=2)
    c32, s32 = clustering.fit_kmeans(vecs.repartition(32), k=4, iters=2)
    assert (s1 == s32).all()
    # partials are float64 sums; reduce order differs → near-equal only
    np.testing.assert_allclose(c1, c32, rtol=0, atol=1e-9)


def test_assign_clusters_covers_all_rows(spark, xs):
    vecs = _vectors(spark, SF_DIR)
    cents, _ = clustering.fit_kmeans(vecs, k=4, iters=2)
    out = clustering.assign_clusters(vecs, cents)
    assert out.count() == len(xs)
    cids = [r[0] for r in out.select("cid").distinct().collect()]
    assert set(cids) <= set(range(4))


def test_empty_cluster_keeps_centroid(spark):
    vecs = _vectors(spark, SF_DIR)
    # adversarial init: two identical centroids — the duplicate (higher
    # cid) can never win the smaller-cid tie-break, so it goes empty
    # and must keep its init vector instead of collapsing to NaN
    init = clustering._init_centroids(vecs, 2)
    init = np.stack([init[0], init[0]])
    cents, sizes = clustering.fit_kmeans(vecs, k=2, iters=1, init=init)
    assert sizes[1] == 0
    np.testing.assert_array_equal(cents[1], init[1])
    assert np.isfinite(cents).all()


def test_semdedup_pairs_are_within_cluster_and_thresholded(spark):
    vecs = _vectors(spark, SF_DIR)
    cents = clustering._init_centroids(vecs, clustering.KMEANS_K)
    members = {r["vec_id"]: r["cid"] for r in
               clustering._assign_ids(vecs, cents).collect()}
    pairs = clustering.semantic_dedup_pairs(spark, SF_DIR).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert members[r["id_a"]] == members[r["id_b"]]
        assert r["cosine"] >= clustering.SEMDEDUP_THRESHOLD


def test_trained_centroids_drop_into_ivf_shape(spark):
    """A trained quantizer composes with assign_clusters the way the
    IVF coarse quantizer does: every vector lands in exactly one cell."""
    vecs = _vectors(spark, SF_DIR)
    cents, _ = clustering.fit_kmeans(vecs, k=8, iters=2)
    cells = clustering.assign_clusters(vecs, cents, out_col="cell")
    n = vecs.count()
    assert cells.count() == n
    assert cells.select("vec_id").distinct().count() == n


def test_cluster_topics_labels_every_cluster(spark):
    """cluster_topics yields ≤ top_n ranked terms per populated
    cluster with distinct terms per cluster and ranks 1..n."""
    out = clustering.cluster_topics(spark, SF_DIR, top_n=3).collect()
    assert out
    by_cid = {}
    for r in out:
        by_cid.setdefault(r["cid"], []).append(r)
    for cid, rows in by_cid.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        terms = [r["w"] for r in rows]
        assert len(terms) == len(set(terms))
        # ordered by tfidf desc
        tfidfs = [r["tfidf"] for r in sorted(rows,
                                             key=lambda r: r["rank"])]
        assert tfidfs == sorted(tfidfs, reverse=True)


def test_kmeans_k_scales_with_corpus():
    """The default cluster count follows the ⌈√N⌉ contract past the
    switch (mirrors ivf_num_centroids), keeping expected cluster size
    √N — so the per-cluster quadratic does NOT grow linearly with the
    corpus when callers use defaults on a 1B-row table."""
    from iceberg_rust_archive_spark.operators.clustering import (
        KMEANS_AUTO_SWITCH_N, KMEANS_K, kmeans_k,
    )
    assert kmeans_k(500) == KMEANS_K
    assert kmeans_k(KMEANS_AUTO_SWITCH_N) == KMEANS_K
    assert kmeans_k(KMEANS_AUTO_SWITCH_N + 1) > KMEANS_K
    assert kmeans_k(4_000_000) == 2000
    assert kmeans_k(1_000_000_000) == 31623  # ⌈√1e9⌉
    # expected cluster size stays ≈ √N, not N/8
    for n in (4_000_000, 100_000_000, 10**9):
        assert n / kmeans_k(n) <= (n ** 0.5) + 1


def test_bounded_cluster_pairs_caps_quadratic():
    """An over-cap cluster sub-splits recursively: pair work is
    O(m·cap) not O(m²), every emitted pair is still a real
    above-threshold cosine with id_a < id_b, and identical-vector
    (degenerate) clusters fall back to positional chunks instead of
    recursing forever."""
    from iceberg_rust_archive_spark.operators.clustering import (
        _bounded_cluster_pairs,
    )
    rng = np.random.default_rng(7)
    m, cap = 2000, 100
    x = rng.normal(size=(m, 16))
    nrm = np.linalg.norm(x, axis=1)
    ids = np.arange(m, dtype=np.int64)
    a, b, cos = _bounded_cluster_pairs(ids, x, nrm, -1.1, cap)
    # threshold -1.1 keeps every scored pair → the count IS the work.
    # uncapped would be m(m-1)/2 = 1_999_000; the cap bounds it hard
    assert 0 < len(a) <= m * cap
    assert all(ai < bi for ai, bi in zip(a, b))
    # emitted cosines are exact
    for ai, bi, ci in list(zip(a, b, cos))[:50]:
        want = np.round(x[ai] @ x[bi] / (nrm[ai] * nrm[bi]), 4)
        assert ci == want
    # under the cap the result is the FULL quadratic (no approximation)
    a2, b2, _ = _bounded_cluster_pairs(ids[:80], x[:80], nrm[:80],
                                       -1.1, cap)
    assert len(a2) == 80 * 79 // 2
    # degenerate: identical vectors can't split by cosine — positional
    # chunk fallback still terminates and stays bounded
    xi = np.tile(x[:1], (500, 1))
    a3, b3, _ = _bounded_cluster_pairs(np.arange(500, dtype=np.int64),
                                       xi, np.linalg.norm(xi, axis=1),
                                       0.99, 50)
    assert 0 < len(a3) <= 500 * 50


def test_semantic_dedup_max_cluster_guard_end_to_end(spark):
    """semantic_dedup_pairs with a tiny max_cluster still runs (one
    cluster → forced sub-splits) and every pair it emits is above
    threshold with correct cosine values."""
    one = np.ones((1, 64))  # single centroid → ALL rows in cluster 0
    out = clustering.semantic_dedup_pairs(
        spark, SF_DIR, cents=one, threshold=0.9,
        max_cluster=40).collect()
    full = clustering.semantic_dedup_pairs(
        spark, SF_DIR, cents=one, threshold=0.9).collect()
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in out}
    want = {(r["id_a"], r["id_b"]): r["cosine"] for r in full}
    # sub-splitting only DROPS cross-sub pairs; everything kept is exact
    assert set(got) <= set(want)
    assert all(want[k] == v for k, v in got.items())
    # at threshold 0.9 near-dups co-locate: the guard keeps most pairs
    if want:
        assert len(got) >= len(want) * 0.5
