"""Stock flat-index variants + InterruptCallback (SURVEY #5/#13 minor
pieces: IndexFlatL2BaseShift, IndexFlat1D, interruption hook)."""

import numpy as np
import pytest

from auncel_tpu.index.flat import (FlatIndex, IndexFlatL2BaseShift,
                                   IndexFlat1D)
from auncel_tpu.index.aux import InterruptCallback


def test_base_shift_changes_ranking():
    rng = np.random.RandomState(0)
    xb = rng.rand(500, 8).astype(np.float32)
    q = rng.rand(4, 8).astype(np.float32)
    plain = IndexFlatL2BaseShift(8)
    plain.add(xb)
    v0, i0 = plain.search(q, 5)
    flat = FlatIndex(8)
    flat.add(xb)
    vf, if_ = flat.search(q, 5)
    np.testing.assert_array_equal(i0, if_)       # zero shift == flat
    np.testing.assert_allclose(v0, vf, rtol=1e-5)
    # a huge shift on the winners pushes them out of the top-k
    shift = np.zeros(500, np.float32)
    shift[i0[0]] = 1e6
    shifted = IndexFlatL2BaseShift(8)
    shifted.add(xb, shift=shift)
    _, i1 = shifted.search(q[:1], 5)
    assert not set(i1[0].tolist()) & set(i0[0].tolist())


def test_flat1d_matches_bruteforce():
    rng = np.random.RandomState(1)
    vals = rng.rand(300).astype(np.float32)
    idx = IndexFlat1D()
    idx.add(vals)
    q = np.asarray([0.0, 0.5, 0.999, vals[7]], np.float32)
    v, i = idx.search(q, 5)
    d = (vals[None, :] - q[:, None]) ** 2
    want = np.sort(d, axis=1)[:, :5]
    np.testing.assert_allclose(np.sort(v, axis=1), want, rtol=1e-5)
    # no duplicate ids at the boundary (q=0 clips the window)
    for row in i:
        real = row[row >= 0]
        assert len(set(real.tolist())) == real.size


def test_flat1d_k_exceeds_n():
    idx = IndexFlat1D()
    idx.add(np.asarray([1.0, 2.0], np.float32))
    v, i = idx.search(np.asarray([1.1], np.float32), 4)
    assert (i[0, 2:] == -1).all()
    assert np.isinf(v[0, 2:]).all()


def test_interrupt_callback_aborts_kmeans():
    from auncel_tpu.ops.kmeans import kmeans, KmeansParams
    rng = np.random.RandomState(2)
    x = rng.rand(2000, 8).astype(np.float32)
    calls = {"n": 0}

    def fire():
        calls["n"] += 1
        return calls["n"] > 2

    InterruptCallback.install(fire)
    try:
        with pytest.raises(InterruptedError):
            kmeans(x, 16, KmeansParams(niter=10))
    finally:
        InterruptCallback.clear()
    assert calls["n"] > 0
    # cleared: runs fine
    kmeans(x, 16, KmeansParams(niter=2))


def test_reconstruct_flat_and_ivf():
    from auncel_tpu.index.ivf import IVFFlatIndex
    rng = np.random.RandomState(6)
    xb = rng.rand(2000, 16).astype(np.float32)
    flat = FlatIndex(16)
    flat.add(xb)
    np.testing.assert_array_equal(flat.reconstruct(7), xb[7])
    np.testing.assert_array_equal(flat.reconstruct_n(10, 5), xb[10:15])
    ivf = IVFFlatIndex(16, 8)
    ivf.train(xb)
    ivf.add(xb)
    np.testing.assert_allclose(ivf.reconstruct(123), xb[123], rtol=1e-6)
    np.testing.assert_allclose(ivf.reconstruct_n(0, 50), xb[:50], rtol=1e-6)
    # quantized index reconstructs its DECODED stored values
    sq = IVFFlatIndex(16, 8, storage="sq8")
    sq.train(xb)
    sq.add(xb)
    rec = sq.reconstruct(123)
    assert np.abs(rec - xb[123]).max() < 0.01  # 8-bit quantization error
    import pytest
    with pytest.raises(KeyError):
        ivf.reconstruct(999_999)
