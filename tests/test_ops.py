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
