"""IVF-Flat index tests: recall vs brute force, exactness of full scan,
serialization round-trip (reference style: tests/test_index.py asserting
recall against IndexFlatL2)."""

import numpy as np
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.factory import index_factory
from auncel_tpu.index.io import save_index, load_index


def recall_at_k(ids, gt_ids, k):
    hits = 0
    for a, b in zip(ids[:, :k], gt_ids[:, :k]):
        hits += len(set(a.tolist()) & set(b.tolist()))
    return hits / (ids.shape[0] * k)


@pytest.fixture(scope="module")
def small_ds():
    return make_clustered_dataset(nb=20000, nq=50, d=32, n_clusters=64,
                                  seed=7)


@pytest.fixture(scope="module")
def built_index(small_ds):
    idx = IVFFlatIndex(small_ds.d, nlist=64)
    idx.train(small_ds.xt[:10000])
    idx.add(small_ds.xb)
    return idx


def test_flat_index_exact(small_ds):
    flat = FlatIndex(small_ds.d)
    flat.add(small_ds.xb[:5000])
    vals, ids = flat.search(small_ds.xq, 10)
    d = ((small_ds.xq[:, None, :] - small_ds.xb[None, :5000, :]) ** 2).sum(-1)
    want = np.sort(d, 1)[:, :10]
    np.testing.assert_allclose(vals, want, rtol=2e-4, atol=0.5)


def test_ivf_full_scan_is_exact(small_ds, built_index):
    flat = FlatIndex(small_ds.d)
    flat.add(small_ds.xb)
    gt_vals, gt_ids = flat.search(small_ds.xq, 10)
    vals, ids = built_index.exact_search(small_ds.xq, 10)
    assert recall_at_k(ids, gt_ids, 10) > 0.999
    np.testing.assert_allclose(vals, gt_vals, rtol=1e-4, atol=1.0)


def test_ivf_recall_grows_with_nprobe(small_ds, built_index):
    flat = FlatIndex(small_ds.d)
    flat.add(small_ds.xb)
    _, gt_ids = flat.search(small_ds.xq, 10)
    recalls = []
    for nprobe in (1, 4, 16, 64):
        _, ids = built_index.search(small_ds.xq, 10, nprobe=nprobe)
        recalls.append(recall_at_k(ids, gt_ids, 10))
    assert recalls == sorted(recalls)
    assert recalls[-1] > 0.999  # nprobe=nlist == exact
    assert recalls[0] < recalls[-1]


def test_ivf_partial_scan_distances_match_full_scan(small_ds, built_index):
    """Value-consistency invariant the profile trainer relies on: a vector's
    distance from a 4-probe scan equals its distance from the full scan
    (reference kscaling matches values at 1e-5 rel, IVF_pro.cpp:72-82)."""
    vals4, ids4 = built_index.search(small_ds.xq, 10, nprobe=4)
    valsf, idsf = built_index.exact_search(small_ds.xq, 10)
    lut = {}
    for q in range(len(small_ds.xq)):
        for v, i in zip(valsf[q], idsf[q]):
            lut[(q, int(i))] = v
    checked = 0
    for q in range(len(small_ds.xq)):
        for v, i in zip(vals4[q], ids4[q]):
            if (q, int(i)) in lut:
                assert abs(lut[(q, int(i))] - v) <= 1e-5 * max(abs(v), 1.0)
                checked += 1
    assert checked > 100


def test_ivf_ip_metric(small_ds):
    ds = make_clustered_dataset(nb=8000, nq=30, d=32, n_clusters=32,
                                seed=9, metric=Metric.IP)
    idx = IVFFlatIndex(ds.d, nlist=32, metric=Metric.IP)
    idx.train(ds.xt[:4000])
    idx.add(ds.xb)
    flat = FlatIndex(ds.d, Metric.IP)
    flat.add(ds.xb)
    _, gt_ids = flat.search(ds.xq, 10)
    _, ids = idx.exact_search(ds.xq, 10)
    assert recall_at_k(ids, gt_ids, 10) > 0.99


def test_factory():
    idx = index_factory(64, "IVF128,Flat")
    assert isinstance(idx, IVFFlatIndex) and idx.nlist == 128
    flat = index_factory(32, "Flat", Metric.IP)
    assert isinstance(flat, FlatIndex) and flat.metric is Metric.IP
    with pytest.raises(NotImplementedError):
        index_factory(64, "IVF128,HNSW32")


def test_serialization_roundtrip(tmp_path, small_ds, built_index):
    p = str(tmp_path / "ivf.npz")
    save_index(built_index, p)
    loaded = load_index(p)
    v1, i1 = built_index.search(small_ds.xq[:8], 5, nprobe=8)
    v2, i2 = loaded.search(small_ds.xq[:8], 5, nprobe=8)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    assert np.array_equal(i1, i2)


def test_add_with_custom_ids(small_ds):
    idx = IVFFlatIndex(small_ds.d, nlist=16)
    idx.train(small_ds.xb[:4000])
    custom = np.arange(1000, dtype=np.int64) * 7 + 3
    idx.add(small_ds.xb[:1000], ids=custom)
    _, ids = idx.exact_search(small_ds.xb[:5], 1)
    np.testing.assert_array_equal(ids[:, 0], custom[:5])


def test_ondisk_roundtrip(tmp_path, small_ds, built_index):
    from auncel_tpu.index.io import save_index_ondisk, load_index_ondisk
    p = str(tmp_path / "ondisk")
    save_index_ondisk(built_index, p)
    loaded = load_index_ondisk(p)
    v1, i1 = built_index.search(small_ds.xq[:6], 5, nprobe=8)
    v2, i2 = loaded.search(small_ds.xq[:6], 5, nprobe=8)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    assert np.array_equal(i1, i2)


def test_update_vectors(small_ds):
    idx = IVFFlatIndex(small_ds.d, nlist=16)
    idx.train(small_ds.xb[:4000])
    idx.add(small_ds.xb[:1000])
    # move vector 7 onto vector 500's position; it must now be 500's NN
    idx.update_vectors(np.asarray([7]), small_ds.xb[500:501])
    v, ids = idx.exact_search(small_ds.xb[500:501], 2)
    assert set(ids[0].tolist()) == {7, 500}
    np.testing.assert_allclose(v[0], [v[0][0], v[0][0]], atol=1e-3)


def test_full_scan_ragged_nlist():
    """Regression: exact_search must handle nlist not divisible by the
    full-scan list chunk (e.g. IVF100)."""
    import numpy as np
    from auncel_tpu.index.ivf import IVFFlatIndex
    from auncel_tpu.ops.knn import knn
    from auncel_tpu.types import Metric
    rng = np.random.RandomState(0)
    xb = rng.randn(2000, 16).astype(np.float32)
    idx = IVFFlatIndex(16, 100)
    idx.train(xb)
    idx.add(xb)
    v, i = idx.exact_search(xb[:8], 5)
    gt = knn(xb[:8], xb, 5, Metric.L2)
    assert np.array_equal(i, gt.ids.astype(np.int64))


def test_dedup_across_batches_and_reset():
    """Regression: dedup must hold ACROSS add batches (reference checks
    stored lists) and reset must clear the duplicate maps."""
    import numpy as np
    from auncel_tpu.index.ivf import IVFFlatDedupIndex
    rng = np.random.RandomState(0)
    xb = rng.randn(200, 8).astype(np.float32)
    idx = IVFFlatDedupIndex(8, 4)
    idx.train(xb)
    idx.add(xb[:1])
    idx.add(xb[:1])          # same vector, second batch
    assert idx.ntotal == 1   # stored once
    v, i = idx.search(xb[:1], 2, nprobe=4)
    assert set(i[0].tolist()) == {0, 1}      # expanded duplicate id
    idx.reset()
    idx.add(xb[:5])
    v, i = idx.search(xb[:1], 2, nprobe=4)
    assert 1 not in idx._dup and i[0, 0] == 0


def test_int64_id_guard():
    import numpy as np
    import pytest
    from auncel_tpu.index.ivf import IVFFlatIndex
    rng = np.random.RandomState(0)
    xb = rng.randn(100, 8).astype(np.float32)
    idx = IVFFlatIndex(8, 4)
    idx.train(xb)
    with pytest.raises(ValueError, match="int32"):
        idx.add(xb[:1], ids=np.array([2 ** 31], np.int64))


def test_sq_range_override_roundtrip(tmp_path):
    """Regression: SQ save/load must reuse the saved affine range so
    codes (and therefore distances) round-trip exactly even with
    rangestat margins wider than the data."""
    import numpy as np
    from auncel_tpu.index.ivf import IVFFlatIndex
    from auncel_tpu.index.io import save_index, load_index
    rng = np.random.RandomState(5)
    xb = rng.randn(1000, 8).astype(np.float32)
    idx = IVFFlatIndex(8, 4, storage="sq8", sq_rangestat="minmax",
                       sq_rangestat_arg=0.1)
    idx.train(xb)
    idx.add(xb)
    v0, i0 = idx.search(xb[:8], 5, nprobe=4)
    p = str(tmp_path / "sq.npz")
    save_index(idx, p)
    back = load_index(p)
    v1, i1 = back.search(xb[:8], 5, nprobe=4)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(np.asarray(back.arrays.db),
                                  np.asarray(idx.arrays.db))


def test_kmeans_more_clusters_than_points():
    import numpy as np
    from auncel_tpu.ops.kmeans import kmeans, KmeansParams
    rng = np.random.RandomState(1)
    x = rng.randn(50, 8).astype(np.float32) + 3.0
    res = kmeans(x, 128, KmeansParams(niter=5))
    # empty clusters steal perturbed copies of REAL clusters — none may
    # collapse to the origin (the old donor pick drew empty donors)
    norms = np.linalg.norm(res.centroids, axis=1)
    assert (norms > 0.5).all(), norms.min()
