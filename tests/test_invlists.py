"""Composite inverted-list views (reference InvertedLists.h:211-325)."""

import numpy as np
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.scan import ivf_search_fixed
from auncel_tpu.index.invlists import (hstack_invlists, vstack_invlists,
                                       slice_invlists, masked_invlists)


@pytest.fixture(scope="module")
def split_indexes():
    rng = np.random.RandomState(11)
    xb = rng.randn(3000, 16).astype(np.float32)
    full = IVFFlatIndex(16, 8)
    full.train(xb)
    full.add(xb)
    a = IVFFlatIndex(16, 8)
    a.set_centroids(full.centroids)
    a.add(xb[:1500], np.arange(1500, dtype=np.int64))
    b = IVFFlatIndex(16, 8)
    b.set_centroids(full.centroids)
    b.add(xb[1500:], np.arange(1500, 3000, dtype=np.int64))
    xq = rng.randn(32, 16).astype(np.float32)
    return full, a, b, xq


def _search(arrays, xq, k=10, nprobe=8):
    import jax.numpy as jnp
    v, i = ivf_search_fixed(arrays, jnp.asarray(xq), k, nprobe, Metric.L2)
    return np.asarray(v), np.asarray(i)


def test_hstack_equals_union(split_indexes):
    full, a, b, xq = split_indexes
    st = hstack_invlists([a.arrays, b.arrays])
    v1, i1 = _search(st, xq)
    v2, i2 = _search(full.arrays, xq)
    np.testing.assert_allclose(np.sort(v1, 1), np.sort(v2, 1), rtol=1e-5)
    assert np.array_equal(np.sort(i1, 1), np.sort(i2, 1))


def test_hstack_rejects_quantizer_mismatch(split_indexes):
    full, a, b, xq = split_indexes
    other = IVFFlatIndex(16, 8)
    other.train(np.random.RandomState(0).randn(500, 16).astype(np.float32))
    other.add(np.zeros((4, 16), np.float32))
    with pytest.raises(AssertionError):
        hstack_invlists([a.arrays, other.arrays])


def test_vstack_and_slice_roundtrip(split_indexes):
    full, a, b, xq = split_indexes
    st = vstack_invlists([a.arrays, b.arrays])
    assert np.asarray(st.db).shape[0] == 16
    # slicing the vstack back apart recovers each source's contents
    back = slice_invlists(st, 0, 8)
    ids_src = np.sort(np.asarray(a.arrays.vec_ids)[
        np.asarray(a.arrays.vec_ids) >= 0])
    ids_back = np.sort(np.asarray(back.vec_ids)[
        np.asarray(back.vec_ids) >= 0])
    assert np.array_equal(ids_src, ids_back)
    # a full-probe search over the stacked layout still finds everything
    v, i = _search(st, xq, nprobe=16)
    v2, i2 = _search(full.arrays, xq)
    np.testing.assert_allclose(np.sort(v, 1), np.sort(v2, 1), rtol=1e-5)


def test_masked_override(split_indexes):
    full, a, b, xq = split_indexes
    # il1 = b: its non-empty lists replace a's; empty lists fall through
    st = masked_invlists(a.arrays, b.arrays)
    sizes_a = np.asarray(a.arrays.list_sizes)
    sizes_b = np.asarray(b.arrays.list_sizes)
    sizes_m = np.asarray(st.list_sizes)
    expect = np.where(sizes_b > 0, sizes_b, sizes_a)
    assert np.array_equal(sizes_m, expect)


def test_views_value_consistent_on_compressed_storage():
    """Regression: a composed view of residual-PQ or bf16 storage must
    return the SAME distances/ids as the source index (db_sq must be the
    residual norm in f32, not centroid-added or storage-dtype)."""
    rng = np.random.RandomState(3)
    xb = rng.randn(2000, 16).astype(np.float32)
    xq = rng.randn(16, 16).astype(np.float32)
    for storage in ("pq4", "bf16"):
        idx = IVFFlatIndex(16, 4, storage=storage)
        idx.train(xb)
        idx.add(xb)
        view = hstack_invlists([idx.arrays])   # identity re-pack
        v0, i0 = _search(idx.arrays, xq, nprobe=4)
        v1, i1 = _search(view, xq, nprobe=4)
        np.testing.assert_array_equal(i0, i1)
        np.testing.assert_allclose(v0, v1, rtol=1e-6, atol=1e-6)
