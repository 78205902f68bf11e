"""Meta-index (IDMap/Shards/Replicas) and vector-transform tests."""

import numpy as np
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.meta import IndexIDMap, IndexShards, IndexReplicas
from auncel_tpu.index.transform import (
    PCAMatrix, RandomRotationMatrix, NormalizationTransform,
    IndexPreTransform)
from auncel_tpu.index.factory import index_factory


@pytest.fixture(scope="module")
def ds():
    return make_clustered_dataset(nb=6000, nq=20, d=32, n_clusters=32,
                                  seed=31)


def test_idmap(ds):
    idx = IndexIDMap(FlatIndex(ds.d))
    custom = np.arange(1000, dtype=np.int64) * 11 + 5
    idx.add(ds.xb[:1000], ids=custom)
    _, ids = idx.search(ds.xb[:4], 1)
    np.testing.assert_array_equal(ids[:, 0], custom[:4])


def test_index_shards_matches_flat(ds):
    sh = IndexShards(ds.d)
    for _ in range(4):
        sh.add_shard(FlatIndex(ds.d))
    sh.add(ds.xb)
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    gv, gi = flat.search(ds.xq, 10)
    v, i = sh.search(ds.xq, 10)
    np.testing.assert_allclose(v, gv, rtol=1e-5, atol=1e-2)
    hit = np.mean([len(set(a) & set(b)) / 10
                   for a, b in zip(i.tolist(), gi.tolist())])
    assert hit > 0.99


def test_index_shards_ivf(ds):
    sh = IndexShards(ds.d)
    for _ in range(2):
        sh.add_shard(IVFFlatIndex(ds.d, nlist=16))
    sh.train(ds.xb[:3000])
    sh.add(ds.xb)
    for s in sh.shards:
        s.nprobe = 16  # full scan per shard
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    _, gi = flat.search(ds.xq, 5)
    _, i = sh.search(ds.xq, 5)
    hit = np.mean([len(set(a) & set(b)) / 5
                   for a, b in zip(i.tolist(), gi.tolist())])
    assert hit > 0.99


def test_index_replicas(ds):
    rep = IndexReplicas(ds.d)
    for _ in range(3):
        f = FlatIndex(ds.d)
        f.add(ds.xb[:500])
        rep.add_replica(f)
    v1, i1 = rep.search(ds.xq, 5)
    v2, i2 = rep.search(ds.xq, 5)  # different replica, same answer
    np.testing.assert_array_equal(i1, i2)


def test_pca_reduces_and_preserves_neighbors(ds):
    pca = PCAMatrix(ds.d, 16)
    pca.train(ds.xb)
    y = pca.apply(ds.xb[:100])
    assert y.shape == (100, 16)
    # PCA onto 16 dims of clustered data keeps most variance
    var_ratio = y.var() * 16 / (ds.xb[:100].var() * ds.d)
    assert var_ratio > 0.5


def test_random_rotation_preserves_distances(ds):
    rr = RandomRotationMatrix(ds.d)
    x = ds.xb[:50]
    y = rr.apply(x)
    d0 = ((x[:1] - x) ** 2).sum(-1)
    d1 = ((y[:1] - y) ** 2).sum(-1)
    np.testing.assert_allclose(d0, d1, rtol=1e-3)


def test_normalization():
    x = np.random.RandomState(0).randn(10, 8).astype(np.float32) * 5
    y = NormalizationTransform(8).apply(x)
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, rtol=1e-5)


def test_pretransform_index_end_to_end(ds):
    idx = IndexPreTransform(FlatIndex(16), [PCAMatrix(ds.d, 16)])
    idx.train(ds.xb)
    idx.add(ds.xb)
    # a stored vector must find itself (transform applied consistently on
    # both add and search paths)
    _, self_ids = idx.search(ds.xb[:5], 1)
    np.testing.assert_array_equal(self_ids[:, 0], np.arange(5))
    # and neighbor structure survives better than chance
    v, i = idx.search(ds.xq, 10)
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    _, gi = flat.search(ds.xq, 10)
    hit = np.mean([len(set(a) & set(b)) / 10
                   for a, b in zip(i.tolist(), gi.tolist())])
    assert hit > 50.0 / ds.xb.shape[0]  # >> random-hit rate


def test_factory_transform_grammar(ds):
    idx = index_factory(32, "PCA16,IVF64,Flat")
    assert isinstance(idx, IndexPreTransform)
    idx.train(ds.xb)
    idx.add(ds.xb)
    assert idx.ntotal == ds.xb.shape[0]
    idx2 = index_factory(32, "L2norm,Flat", Metric.IP)
    idx2.add(ds.xb)
    v, _ = idx2.search(ds.xq[:2], 3)
    assert np.all(v <= 1.0 + 1e-5)


def test_index_split_vectors(ds):
    """Dimension-sliced composition (MetaIndexes.cpp:224-297): the
    composite label encodes per-slice nearest cells mixed-radix, and the
    composite distance is the sum of slice distances."""
    from auncel_tpu.index.meta import IndexSplitVectors
    d0 = 16
    sub1 = FlatIndex(d0)
    sub2 = FlatIndex(ds.d - d0)
    cells = ds.xb[:50]
    sub1.add(cells[:, :d0])
    sub2.add(cells[:, d0:])
    sp = IndexSplitVectors(ds.d)
    sp.add_sub_index(sub1)
    sp.add_sub_index(sub2)
    assert sp.ntotal == 50 * 50
    v, i = sp.search(ds.xq, 1)
    # reproduce by brute force on each slice
    for r in range(4):
        q = ds.xq[r]
        d1 = ((cells[:, :d0] - q[:d0]) ** 2).sum(1)
        d2 = ((cells[:, d0:] - q[d0:]) ** 2).sum(1)
        lab = int(np.argmin(d1)) + int(np.argmin(d2)) * 50
        assert i[r, 0] == lab
        np.testing.assert_allclose(v[r, 0], d1.min() + d2.min(), rtol=1e-4)
    with pytest.raises(NotImplementedError):
        sp.add(ds.xb[:1])
    with pytest.raises(AssertionError):
        sp.search(ds.xq, 2)


def test_matrix_stats(ds):
    from auncel_tpu.autotune import MatrixStats
    x = ds.xb[:500].copy()
    x[7] = x[3]
    st = MatrixStats(x)
    assert st.n_distinct == 499
    assert "499 vectors are distinct" in st.comments
    assert "vector 3 has 2 copies" in st.comments
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    assert "vectors are normalized" in MatrixStats(xn).comments
    bad = x.copy()
    bad[0, 0] = np.nan
    assert "NaN or Inf" in MatrixStats(bad).comments


def test_shards_uneven_adds_ids():
    """Regression: round-robin position-keyed shards must return correct
    global ids when add sizes are not multiples of nshards."""
    import numpy as np
    from auncel_tpu.index.meta import IndexShards
    from auncel_tpu.index.flat import FlatIndex
    rng = np.random.RandomState(4)
    xb = rng.randn(6, 8).astype(np.float32)
    sh = IndexShards(8)
    sh.add_shard(FlatIndex(8))
    sh.add_shard(FlatIndex(8))
    sh.add(xb[:3])
    sh.add(xb[3:])
    v, i = sh.search(xb, 1)
    assert np.array_equal(i[:, 0], np.arange(6)), i[:, 0]
