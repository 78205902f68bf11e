"""IVFlib utility tests (reference IVFlib capability, SURVEY.md §2 #22)."""

import numpy as np
import pytest

from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index import ivflib


@pytest.fixture(scope="module")
def ds():
    return make_clustered_dataset(nb=8000, nq=20, d=16, n_clusters=32,
                                  seed=23)


@pytest.fixture()
def idx(ds):
    i = IVFFlatIndex(ds.d, nlist=16)
    i.train(ds.xb[:4000])
    i.add(ds.xb[:4000])
    return i


def test_search_centroid(ds, idx):
    c = ivflib.search_centroid(idx, ds.xb[:10])
    assert c.shape == (10,) and np.all((c >= 0) & (c < 16))


def test_search_and_return_centroids(ds, idx):
    vals, ids, cent = ivflib.search_and_return_centroids(
        idx, ds.xq, 5, nprobe=16)
    assign = ivflib.search_centroid(idx, ds.xb[:4000])
    for qi in range(len(ds.xq)):
        for j in range(5):
            if ids[qi, j] >= 0:
                assert cent[qi, j] == assign[ids[qi, j]]


def test_merge_into(ds):
    a = IVFFlatIndex(ds.d, nlist=16)
    a.train(ds.xb[:4000])
    a.add(ds.xb[:2000])
    b = IVFFlatIndex(ds.d, nlist=16)
    b.train(ds.xb[:4000])
    b.add(ds.xb[2000:4000], ids=np.arange(2000, 4000))
    ivflib.merge_into(a, b)
    assert a.ntotal == 4000 and b.ntotal == 0
    _, ids = a.exact_search(ds.xb[3000:3003], 1)
    np.testing.assert_array_equal(ids[:, 0], [3000, 3001, 3002])


def test_copy_subset_to(ds, idx):
    dst = IVFFlatIndex(ds.d, nlist=16)
    dst.set_centroids(idx.centroids)
    n = ivflib.copy_subset_to(idx, dst, 100, 200)
    assert n == 100 and dst.ntotal == 100
    _, ids = dst.exact_search(ds.xb[150:152], 1)
    np.testing.assert_array_equal(ids[:, 0], [150, 151])


def test_sliding_window(ds):
    idx = IVFFlatIndex(ds.d, nlist=16)
    idx.train(ds.xb[:4000])
    win = ivflib.SlidingIndexWindow(idx, nw=2)
    for b in range(3):
        sl = slice(b * 1000, (b + 1) * 1000)
        win.step(ds.xb[sl], np.arange(b * 1000, (b + 1) * 1000))
    assert idx.ntotal == 2000  # oldest batch dropped
    _, ids = idx.exact_search(ds.xb[2500:2502], 1)
    np.testing.assert_array_equal(ids[:, 0], [2500, 2501])
    _, ids0 = idx.exact_search(ds.xb[500:501], 1)
    assert ids0[0, 0] != 500  # batch 0 evicted


def test_extract_vectors_residual_pq():
    """Regression: extract_vectors must return reconstructions, not raw
    residuals, for residual-PQ storage (merge_into re-adds them)."""
    import numpy as np
    from auncel_tpu.index.ivf import IVFFlatIndex
    from auncel_tpu.index.ivflib import extract_vectors
    rng = np.random.RandomState(8)
    xb = rng.randn(2000, 16).astype(np.float32) + 5.0
    idx = IVFFlatIndex(16, 8, storage="pq4")
    idx.train(xb)
    idx.add(xb)
    vecs, ids = extract_vectors(idx)
    order = np.argsort(ids)
    err = np.square(vecs[order] - xb[ids[order]]).mean()
    # reconstruction error must be far below the data's second moment
    # (residuals alone would leave the whole centroid component ~ |x|^2)
    assert err < 0.25 * np.square(xb).mean(), err
