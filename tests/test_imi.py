"""IMI (multi-index) coarse quantizer: factory cell, assignment
decomposition, recall, and bounded-search compatibility over product
cells (boundary geometry works because product centroids are
materialized)."""

import numpy as np
import pytest

import auncel_tpu as at
from auncel_tpu.types import Metric
from auncel_tpu.index.imi import train_imi_centroids, imi_assign
from auncel_tpu.data.synthetic import make_clustered_dataset


@pytest.fixture(scope="module")
def ds():
    return make_clustered_dataset(nb=12_000, nq=120, d=32, n_clusters=48,
                                  seed=11)


def test_imi_factory_and_recall(ds):
    idx = at.index_factory(ds.d, "IMI2x4,Flat")   # 256 product cells
    assert idx.nlist == 256 and idx.coarse == "imi"
    idx.train(ds.xb[:8000])
    idx.add(ds.xb)
    flat = at.FlatIndex(ds.d)
    flat.add(ds.xb)
    _, gti = flat.search(ds.xq, 10)
    _, i64 = idx.search(ds.xq, 10, nprobe=64)
    rec = np.mean([len(set(a) & set(b)) / 10
                   for a, b in zip(i64.tolist(), gti.tolist())])
    assert rec >= 0.9, rec
    _, iall = idx.search(ds.xq, 10, nprobe=256)
    rec_all = np.mean([len(set(a) & set(b)) / 10
                       for a, b in zip(iall.tolist(), gti.tolist())])
    assert rec_all >= 0.999


def test_imi_assignment_decomposes(ds):
    cents = train_imi_centroids(ds.xb[:8000], 64, Metric.L2)
    assert cents.shape == (64, ds.d)
    # per-subspace argmin == argmin over the materialized product
    cells = imi_assign(ds.xq, cents)
    d = ((ds.xq[:, None, :] - cents[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(cells, d.argmin(1))


def test_imi_bounded_search(ds):
    """The error-profile engine runs over IMI cells unchanged (the
    reference's grammar keeps IMI out of tuned mode; materializing the
    product centroids makes the boundary geometry available here)."""
    idx = at.index_factory(ds.d, "IMI2x3,Flat")   # 64 cells
    idx.train(ds.xb[:8000])
    idx.add(ds.xb)
    gt_D, gt_I = idx.exact_search(ds.xq, 40)
    es = at.ErrorSys(idx, train_num=120, max_topk=40)
    es.set_gt(gt_D, gt_I)
    es.sys_train(80, ds.xq)
    es.set_topk(10)
    acc = np.full(120, 0.9, np.float32)
    es.set_queries(40, ds.xq[80:], acc)
    es.set_hyper(4.0, 1.0)
    D, I = es.search(0, 40)
    rec = np.array([len(set(a) & set(b)) / 10 for a, b in
                    zip(I[:, :10].tolist(), gt_I[80:, :10].tolist())])
    assert rec.mean() >= 0.9


def test_imi_lazy_interdis():
    """Very large product nlist defers the O(nlist^2) matrix until the
    profile engine asks for it."""
    from auncel_tpu.index.ivf import IVFFlatIndex
    rng = np.random.RandomState(0)
    idx = IVFFlatIndex(16, 2 ** 14, coarse="imi")
    cents = train_imi_centroids(
        rng.rand(4000, 16).astype(np.float32), 2 ** 14, Metric.L2)
    idx.set_centroids(cents)
    assert idx.interdis is None         # deferred: 16k x 16k
    assert idx.is_trained
