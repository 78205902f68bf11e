"""Unit tests for distance / top-k / knn / k-means primitives, asserted
against numpy brute force (the reference's test style: synthetic data vs
IndexFlatL2 oracle, tests/test_index_accuracy.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.ops import (
    pairwise_l2sqr, pairwise_ip, topk_scores, merge_topk, knn)
from auncel_tpu.ops.kmeans import kmeans, KmeansParams


def test_pairwise_l2sqr_matches_numpy(rng):
    x = rng.randn(33, 24).astype(np.float32)
    y = rng.randn(57, 24).astype(np.float32)
    got = np.asarray(pairwise_l2sqr(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-2)


def test_pairwise_ip_matches_numpy(rng):
    x = rng.randn(17, 48).astype(np.float32)
    y = rng.randn(29, 48).astype(np.float32)
    got = np.asarray(pairwise_ip(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, x @ y.T, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
def test_topk_scores_order_and_padding(rng, metric):
    s = rng.randn(5, 40).astype(np.float32)
    ids = np.tile(np.arange(40, dtype=np.int32), (5, 1))
    vals, got_ids = topk_scores(jnp.asarray(s), jnp.asarray(ids), 10, metric)
    vals, got_ids = np.asarray(vals), np.asarray(got_ids)
    order = np.sort(s, axis=1)
    want = order[:, :10] if metric is Metric.L2 else order[:, -10:][:, ::-1]
    np.testing.assert_allclose(vals, want, rtol=1e-6)
    # ids consistent with values
    np.testing.assert_allclose(
        np.take_along_axis(s, got_ids, 1), vals, rtol=1e-6)


def test_topk_pads_when_short(rng):
    s = rng.randn(3, 4).astype(np.float32)
    ids = np.tile(np.arange(4, dtype=np.int32), (3, 1))
    vals, got_ids = topk_scores(jnp.asarray(s), jnp.asarray(ids), 8, Metric.L2)
    assert np.all(np.isinf(np.asarray(vals)[:, 4:]))
    assert np.all(np.asarray(got_ids)[:, 4:] == -1)


def test_merge_topk(rng):
    a = np.sort(rng.randn(2, 6).astype(np.float32), 1)
    b = np.sort(rng.randn(2, 6).astype(np.float32), 1)
    ia = np.tile(np.arange(6, dtype=np.int32), (2, 1))
    ib = ia + 100
    vals, ids = merge_topk(jnp.asarray(a), jnp.asarray(ia),
                           jnp.asarray(b), jnp.asarray(ib), 6, Metric.L2)
    want = np.sort(np.concatenate([a, b], 1), 1)[:, :6]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-6)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
def test_knn_exact_vs_numpy(rng, metric):
    nb, nq, d, k = 2000, 37, 32, 10
    xb = rng.randn(nb, d).astype(np.float32)
    xq = rng.randn(nq, d).astype(np.float32)
    res = knn(xq, xb, k, metric, q_block=16, db_block=512)
    if metric is Metric.L2:
        dmat = ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)
        want_ids = np.argsort(dmat, axis=1)[:, :k]
    else:
        dmat = xq @ xb.T
        want_ids = np.argsort(-dmat, axis=1)[:, :k]
    # compare by distance values (ties can permute ids)
    want_vals = np.take_along_axis(dmat, want_ids, 1)
    np.testing.assert_allclose(res.vals, want_vals, rtol=2e-4, atol=1e-2)
    assert (res.ids == want_ids).mean() > 0.99


def test_kmeans_clusters_synthetic(rng):
    # 4 well-separated blobs -> kmeans must place one centroid per blob
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    x = np.concatenate(
        [c + 0.1 * rng.randn(200, 2).astype(np.float32) for c in centers])
    res = kmeans(x, 4, KmeansParams(niter=10, seed=3))
    # each true center has a centroid within 0.5
    dist = ((res.centroids[:, None, :] - centers[None]) ** 2).sum(-1)
    assert np.all(dist.min(axis=0) < 0.25)


def test_kmeans_no_empty_clusters(rng):
    x = rng.randn(512, 8).astype(np.float32)
    res = kmeans(x, 64, KmeansParams(niter=8))
    d = ((x[:, None, :] - res.centroids[None]) ** 2).sum(-1)
    assign = d.argmin(1)
    sizes = np.bincount(assign, minlength=64)
    assert (sizes == 0).sum() <= 2  # empty-split keeps clusters populated


def test_kmeans_convenience_class(rng):
    from auncel_tpu.ops.kmeans import Kmeans
    x = rng.randn(2000, 8).astype(np.float32)
    km = Kmeans(8, 16, niter=5)
    err = km.train(x)
    assert np.isfinite(err) and km.centroids.shape == (16, 8)
    a = km.assign(x[:100])
    assert a.shape == (100,) and a.max() < 16


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
def test_knn_by_idx_reranks_candidate_lists(rng, metric):
    """reference knn_L2sqr_by_idx / knn_inner_products_by_idx
    (utils.cpp:729-823): top-k restricted to per-query id lists."""
    from auncel_tpu.ops.knn import knn_by_idx, compute_distance_subset
    q = rng.randn(6, 24).astype(np.float32)
    db = rng.randn(200, 24).astype(np.float32)
    labels = np.stack([rng.choice(200, 20, replace=False)
                       for _ in range(6)]).astype(np.int64)
    labels[0, 15:] = -1            # excluded slots
    labels[1, 18:] = -7            # ANY negative id is excluded...
    res = knn_by_idx(q, db, labels, 5, metric)
    # ...and excluded slots surface as the heap's -1 sentinel, never the
    # raw negative input label
    wide0 = knn_by_idx(q, db, labels, 20, metric)
    assert (wide0.ids[0, 15:] == -1).all()
    assert (wide0.ids[1, 18:] == -1).all()
    # numpy oracle over the same candidate sets
    for i in range(6):
        cand = labels[i][labels[i] >= 0]
        if metric is Metric.L2:
            d = ((q[i][None] - db[cand]) ** 2).sum(1)
            order = np.argsort(d)
        else:
            d = db[cand] @ q[i]
            order = np.argsort(-d)
        np.testing.assert_array_equal(res.ids[i], cand[order[:5]])
        np.testing.assert_allclose(res.vals[i], d[order[:5]], rtol=1e-5)
    # subset distances come back in label order
    sub = compute_distance_subset(q, db, labels, metric)
    assert sub.shape == labels.shape
    j = labels[2, 3]
    want = (((q[2] - db[j]) ** 2).sum() if metric is Metric.L2
            else db[j] @ q[2])
    np.testing.assert_allclose(sub[2, 3], want, rtol=1e-5)
    # k > n_candidates pads with worst/-1 like the heap contract
    wide = knn_by_idx(q, db, labels, 30, metric)
    assert (wide.ids[:, 25:] == -1).all()


def test_knn_by_idx_values_match_main_driver(rng):
    """Value-consistency: the subset scorer and the blocked kNN driver
    compute identical f32 distances for shared (query, id) pairs."""
    from auncel_tpu.ops.knn import knn_by_idx
    q = rng.randn(4, 32).astype(np.float32)
    db = rng.randn(100, 32).astype(np.float32)
    full = knn(q, db, 10, Metric.L2)
    res = knn_by_idx(q, db, full.ids.astype(np.int64), 10, Metric.L2)
    np.testing.assert_array_equal(res.ids, full.ids)
    np.testing.assert_allclose(res.vals, full.vals, rtol=1e-5)


def test_imbalance_factor():
    from auncel_tpu.ops.kmeans import imbalance_factor
    assert imbalance_factor(np.repeat(np.arange(8), 10), 8) == 1.0
    assert imbalance_factor(np.zeros(100, np.int64), 8) == 8.0
    skew = imbalance_factor(np.repeat([0, 1], [90, 10]), 2)
    assert 1.0 < skew < 2.0


def test_flat_compute_distance_subset(rng):
    from auncel_tpu.index.flat import FlatIndex
    idx = FlatIndex(16)
    xb = rng.randn(50, 16).astype(np.float32)
    idx.add(xb)
    q = rng.randn(3, 16).astype(np.float32)
    labels = np.array([[0, 5, -1], [7, 7, 2], [49, 0, 1]], np.int64)
    out = idx.compute_distance_subset(q, labels)
    np.testing.assert_allclose(
        out[1, 0], ((q[1] - xb[7]) ** 2).sum(), rtol=1e-5)
    assert out[0, 2] == np.float32(np.inf) or out[0, 2] >= 1e30
