"""IVFPQR / Index2Layer / IndexHNSW2Level / remaining transforms.

Parity targets: reference IndexIVFPQ.h:155-260 (IndexIVFPQR,
Index2Layer), IndexHNSW.cpp:1054-1100 (IndexHNSW2Level),
VectorTransform.h:213-266 (RemapDimensionsTransform,
CenteringTransform), AutoTune.cpp:854-899 (factory cells).
"""

import numpy as np
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.index.factory import index_factory
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.ivfpqr import IndexIVFPQR
from auncel_tpu.index.twolayer import Index2Layer
from auncel_tpu.index.hnsw import IndexHNSW2Level
from auncel_tpu.ops.knn import knn


def _recall(ids, gt_ids):
    hits = 0
    for r, g in zip(ids, gt_ids):
        hits += len(set(r.tolist()) & set(g.tolist()))
    return hits / gt_ids.size


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    xb = rng.randn(4000, 32).astype(np.float32)
    xq = rng.randn(64, 32).astype(np.float32)
    gt = knn(xq, xb, 10, Metric.L2)
    return xb, xq, gt.ids.astype(np.int64)


def test_ivfpqr_beats_base_ivfpq(data):
    xb, xq, gt = data
    base = IVFFlatIndex(32, 8, storage="pq4")
    base.train(xb)
    base.add(xb)
    pqr = IndexIVFPQR(32, 8, M=4, M_refine=16, k_factor=4.0)
    pqr.train(xb)
    pqr.add(xb)
    _, i_base = base.search(xq, 10, nprobe=4)
    _, i_pqr = pqr.search(xq, 10, nprobe=4)
    r_base, r_pqr = _recall(i_base, gt), _recall(i_pqr, gt)
    # the refine PQ restores ordering information the 4-byte code lost
    assert r_pqr > r_base + 0.05, (r_pqr, r_base)
    # two-stage reconstruction strictly tightens the first stage
    keys = np.arange(50, dtype=np.int64)
    from auncel_tpu.index.ivf import _ivf_reconstruct
    e1 = np.square(_ivf_reconstruct(pqr, keys) - xb[:50]).sum()
    e2 = np.square(pqr.reconstruct_batch(keys) - xb[:50]).sum()
    assert e2 < 0.5 * e1, (e2, e1)


def test_ivfpqr_k_factor_knob(data):
    xb, xq, gt = data
    pqr = IndexIVFPQR(32, 8, M=4, M_refine=8, k_factor=1.0)
    pqr.train(xb)
    pqr.add(xb)
    from auncel_tpu.autotune import set_index_parameter, ParameterSpace
    set_index_parameter(pqr, "k_factor", 8)
    assert pqr.k_factor == 8.0
    dims = dict(ParameterSpace(pqr).parameter_ranges())
    assert "k_factor" in dims and 64 in dims["k_factor"]
    _, i8 = pqr.search(xq, 10, nprobe=8)
    set_index_parameter(pqr, "k_factor", 1)
    _, i1 = pqr.search(xq, 10, nprobe=8)
    assert _recall(i8, gt) >= _recall(i1, gt)


def test_ivfpqr_rejects_ip():
    with pytest.raises(AssertionError):
        IndexIVFPQR(32, 8, metric=Metric.IP)


def test_index2layer_roundtrip_and_transfer(data):
    xb, xq, gt = data
    tl = Index2Layer(32, 16, M=8)
    tl.train(xb)
    tl.add(xb)
    assert tl.ntotal == len(xb)
    assert tl.code_size == tl.code_size_1 + tl.code_size_2
    # reconstruction error well under the data norm
    rec = tl.reconstruct_n(0, 200)
    rel = np.square(rec - xb[:200]).sum() / np.square(xb[:200]).sum()
    assert rel < 0.35, rel
    # decoded exact search finds most true neighbors
    _, ids = tl.search(xq, 10)
    assert _recall(ids, gt) > 0.5
    # transfer_to_IVFPQ: reconstructions bit-identical, search works
    ivf = tl.transfer_to_ivfpq()
    assert ivf.ntotal == tl.ntotal
    got = ivf.reconstruct_n(0, 200)
    np.testing.assert_array_equal(got, rec)
    _, ivf_ids = ivf.search(xq, 10, nprobe=16)
    assert _recall(ivf_ids, gt) > 0.5


def test_hnsw2level_recall_and_decode(data):
    xb, xq, gt = data
    idx = IndexHNSW2Level(32, nlist=16, pq_m=8, M=16)
    idx.train(xb)
    idx.add(xb)
    idx.build()
    # device codec decode == host Index2Layer reconstruction
    import jax.numpy as jnp
    from auncel_tpu.index.hnsw import storage_decode
    dec = np.asarray(storage_decode(jnp.asarray(idx._codes[:100]),
                                    idx._codec))
    np.testing.assert_allclose(dec, idx.storage.reconstruct_n(0, 100),
                               rtol=1e-5, atol=1e-5)
    _, ids = idx.search(xq, 10, ef=96)
    # recall is capped by the 8-byte code, not the graph: compare to the
    # exact scan over the SAME reconstructions
    _, code_gt = idx.storage.search(xq, 10)
    r = _recall(ids, code_gt.astype(np.int64))
    assert r > 0.75, r


def test_remaining_transforms_roundtrip():
    from auncel_tpu.index.transform import (CenteringTransform,
                                            RemapDimensionsTransform)
    rng = np.random.RandomState(3)
    x = rng.randn(100, 16).astype(np.float32)
    ct = CenteringTransform(16)
    ct.train(x)
    out = ct.apply(x)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(ct.reverse(out), x, rtol=1e-5, atol=1e-6)
    # uniform down-map
    rm = RemapDimensionsTransform(16, 8)
    assert rm.apply(x).shape == (100, 8)
    np.testing.assert_array_equal(rm.apply(x), x[:, rm.dim_map])
    # pad-up (non-uniform): zeros beyond d_in
    rm_up = RemapDimensionsTransform(16, 20, uniform=False)
    up = rm_up.apply(x)
    np.testing.assert_array_equal(up[:, :16], x)
    assert np.all(up[:, 16:] == 0.0)
    # permutation reverse roundtrip
    perm = rng.permutation(16).astype(np.int64)
    rp = RemapDimensionsTransform(16, 16, dim_map=perm)
    np.testing.assert_array_equal(rp.reverse(rp.apply(x)), x)


def test_factory_cells(data):
    xb, xq, gt = data
    idx = index_factory(32, "IVF8,PQ4+8")
    assert isinstance(idx, IndexIVFPQR)
    assert idx.M_refine == 8
    h = index_factory(32, "HNSW16_16+PQ8")
    assert isinstance(h, IndexHNSW2Level)
    assert h.storage.nlist == 16
    h2 = index_factory(32, "HNSW16_2x2+PQ8")
    assert isinstance(h2, IndexHNSW2Level)
    assert h2.storage.nlist == 16 and h2.storage.quantizer is not None
    # the IMI-coarse cell trains end to end
    h2.train(xb)
    h2.add(xb[:1000])
    h2.build()
    _, ids = h2.search(xq, 5, ef=32)
    assert ids.shape == (64, 5)


def test_reconstruct_from_neighbors(data):
    """Reference ReconstructFromNeighbors (IndexHNSW.h:25-63): the
    neighbor-weighted codebook reconstruction tightens compressed
    storage, and the k_reorder search hook re-sorts through it."""
    from auncel_tpu.index.hnsw import IndexHNSWPQ
    from auncel_tpu.index.hnsw_recons import ReconstructFromNeighbors
    rng = np.random.RandomState(5)
    C = rng.randn(50, 32).astype(np.float32) * 3
    xb = C[rng.randint(0, 50, 2000)] + rng.randn(2000, 32).astype(
        np.float32)
    idx = IndexHNSWPQ(32, pq_m=4, M=8)
    idx.train(xb)
    idx.add(xb)
    idx.build()
    rfn = ReconstructFromNeighbors(idx, k=64, nsq=2)
    rfn.train_codebook(xb[:1500], np.arange(1500))
    rfn.add_codes(xb)
    assert rfn.codes.shape == (2000, 2)
    err_storage = np.square(idx._xb - xb).sum()
    err_rfn = np.square(rfn.reconstruct_n() - xb).sum()
    # the neighbor combination must beat storage-only reconstruction
    assert err_rfn < 0.95 * err_storage, (err_rfn, err_storage)
    # compute_distances consistency with reconstruct_n
    sl = np.arange(8).reshape(2, 4)
    d = rfn.compute_distances(xb[:2], sl)
    rec = rfn.reconstruct_n(0, 8).reshape(2, 4, 32)
    np.testing.assert_allclose(
        d, np.sum(np.square(xb[:2, None, :] - rec), -1), rtol=1e-4)
    # the search hook re-sorts the top-k by refined distances
    xq = C[rng.randint(0, 50, 16)] + rng.randn(16, 32).astype(np.float32)
    rfn.k_reorder = -1
    idx.reconstruct_from_neighbors = rfn
    v1, i1 = idx.search(xq, 10, ef=64)
    assert np.all(np.diff(v1, axis=1) >= -1e-6)   # still sorted
    idx.reconstruct_from_neighbors = None
    v0, i0 = idx.search(xq, 10, ef=64)
    assert np.array_equal(np.sort(i0, 1), np.sort(i1, 1))  # same members


def test_io_roundtrip_new_families(data, tmp_path):
    """Exact serialization for IndexIVFPQR and Index2Layer
    (reference index_io.cpp writes codes for both)."""
    from auncel_tpu.index.io import save_index, load_index
    xb, xq, gt = data
    pqr = IndexIVFPQR(32, 8, M=4, M_refine=8, k_factor=4.0)
    pqr.train(xb)
    pqr.add(xb)
    v0, i0 = pqr.search(xq, 10, nprobe=4)
    p = str(tmp_path / "pqr.npz")
    save_index(pqr, p)
    back = load_index(p)
    v1, i1 = back.search(xq, 10, nprobe=4)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    np.testing.assert_array_equal(back.reconstruct_batch(
        np.arange(20, dtype=np.int64)),
        pqr.reconstruct_batch(np.arange(20, dtype=np.int64)))
    with pytest.raises(RuntimeError):
        back.add(xb[:1])

    tl = Index2Layer(32, 16, M=8)
    tl.train(xb)
    tl.add(xb)
    p2 = str(tmp_path / "tl.npz")
    save_index(tl, p2)
    tl2 = load_index(p2)
    np.testing.assert_array_equal(tl2.codes, tl.codes)
    np.testing.assert_array_equal(tl2.list_ids, tl.list_ids)
    np.testing.assert_array_equal(tl2.reconstruct_n(0, 100),
                                  tl.reconstruct_n(0, 100))
    # a loaded 2Layer can still grow (codebooks travel with it)
    tl2.add(xb[:10])
    assert tl2.ntotal == tl.ntotal + 10


def test_hnsw_compressed_save_load(data, tmp_path):
    """Compressed-storage HNSW variants round-trip through save/load
    with their codecs (reference write_index serializes IndexHNSW*
    storage alongside the graph, index_io.cpp)."""
    from auncel_tpu.index.hnsw import (HNSWIndex, IndexHNSWSQ,
                                       IndexHNSWPQ)
    xb, xq, gt = data
    for cls, kw in ((IndexHNSWSQ, {}), (IndexHNSWPQ, dict(pq_m=4)),
                    (IndexHNSW2Level, dict(nlist=8, pq_m=4))):
        idx = cls(32, M=8, **kw)
        idx.train(xb[:2000])
        idx.add(xb[:2000])
        idx.build()
        v0, i0 = idx.search(xq, 5, ef=48)
        p = str(tmp_path / f"{cls.__name__}.npz")
        idx.save(p)
        back = HNSWIndex.load(p)
        assert type(back) is cls
        v1, i1 = back.search(xq, 5, ef=48)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(v0, v1, rtol=1e-6)


def test_ivfpqr_tiny_and_empty(data):
    """Regression: ntotal < k and ntotal == 0 follow the base index's
    padding contract instead of crashing."""
    xb, xq, gt = data
    pqr = IndexIVFPQR(32, 4, M=4, M_refine=4)
    pqr.train(xb)
    v, i = pqr.search(xq[:4], 10)            # empty index
    assert (i == -1).all() and np.isinf(v).all()
    pqr.add(xb[:6])
    v, i = pqr.search(xq[:4], 10, nprobe=4)  # fewer vectors than k
    assert i.shape == (4, 10)
    assert ((i >= 0).sum(1) <= 6).all() and (i[:, 0] >= 0).all()
    # reset clears the frozen-codes guard from exact-code loads
    pqr._frozen_codes = True
    pqr.reset()
    pqr.add(xb[:10])
    assert pqr.ntotal == 10


def test_hnsw_untrained_save_load(tmp_path):
    """Regression: saving an untrained compressed variant must produce a
    loadable file (no pickled None payloads)."""
    from auncel_tpu.index.hnsw import HNSWIndex, IndexHNSWSQ
    sq = IndexHNSWSQ(16)
    p = str(tmp_path / "untrained.npz")
    sq.save(p)
    back = HNSWIndex.load(p)
    assert type(back) is IndexHNSWSQ and not back.is_trained


def test_rfn_hook_rejects_ip(data):
    from auncel_tpu.index.hnsw import HNSWIndex
    xb, xq, gt = data
    idx = HNSWIndex(32, M=8, metric=Metric.IP)
    idx.add(xb[:500])
    idx.build()
    class _FakeRfn:
        k_reorder = -1
    idx.reconstruct_from_neighbors = _FakeRfn()
    with pytest.raises(AssertionError):
        idx.search(xq[:2], 5)
