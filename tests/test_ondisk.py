"""On-disk serving: result parity with the resident index plus a
structural proof that a search touches only the probed lists (no full
materialization)."""

import numpy as np
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.io import save_index_ondisk
from auncel_tpu.index.ondisk import OnDiskIVFIndex
from auncel_tpu.data.synthetic import make_clustered_dataset


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    ds = make_clustered_dataset(nb=12_000, nq=16, d=32, n_clusters=48,
                                seed=9)
    idx = IVFFlatIndex(ds.d, 48)
    idx.train(ds.xb[:6000])
    idx.add(ds.xb)
    path = str(tmp_path_factory.mktemp("ondisk") / "idx")
    save_index_ondisk(idx, path)
    return ds, idx, path


class _CountingMmap:
    """Wraps the mmap'd db: records which list rows get paged in."""

    def __init__(self, arr):
        self._arr = arr
        self.touched = set()
        self.shape = arr.shape

    def __getitem__(self, key):
        idx = key[0] if isinstance(key, tuple) else key
        self.touched.update(np.atleast_1d(np.asarray(idx)).tolist())
        return self._arr[key]


def test_ondisk_matches_resident(saved):
    ds, idx, path = saved
    od = OnDiskIVFIndex(path)
    for nprobe in (2, 8, 48):
        v1, i1 = idx.search(ds.xq, 10, nprobe=nprobe)
        v2, i2 = od.search(ds.xq, 10, nprobe=nprobe)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(v1, v2, rtol=1e-5)


def test_ondisk_touches_only_probed_lists(saved):
    ds, idx, path = saved
    od = OnDiskIVFIndex(path)
    counter = _CountingMmap(od.db)
    od.db = counter
    nprobe = 3
    od.search(ds.xq[:8], 10, nprobe=nprobe)
    # at most nprobe lists per query were paged in — nothing ever
    # materializes the rest of the corpus
    assert len(counter.touched) <= 8 * nprobe
    assert len(counter.touched) < od.nlist


def test_ondisk_ip_metric(tmp_path):
    ds = make_clustered_dataset(nb=6_000, nq=8, d=32, n_clusters=24,
                                seed=10, metric=Metric.IP)
    idx = IVFFlatIndex(ds.d, 24, Metric.IP)
    idx.train(ds.xb[:3000])
    idx.add(ds.xb)
    path = str(tmp_path / "ip")
    save_index_ondisk(idx, path)
    od = OnDiskIVFIndex(path)
    v1, i1 = idx.search(ds.xq, 5, nprobe=8)
    v2, i2 = od.search(ds.xq, 5, nprobe=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5)


@pytest.fixture(scope="module")
def profiled(saved):
    """Trained error profile on the resident index (shared by the bounded
    on-disk tests)."""
    from auncel_tpu.profile.error_sys import ErrorSys
    ds, idx, path = saved
    gt_D, gt_I = idx.exact_search(ds.xq[:10], 50)
    es = ErrorSys(idx, train_num=10, max_topk=50)
    es.set_gt(gt_D, gt_I)
    es.sys_train(10, ds.xq[:10])
    es.set_hyper(multipler=8.0, std_m=1.0)
    return es


def test_ondisk_bounded_matches_resident(saved, profiled):
    """Error-bounded search from disk returns the RESIDENT engine's exact
    decisions and results (reference: OnDiskInvertedLists plugs into the
    tune branch transparently, IndexIVF.cpp:497-673)."""
    import jax.numpy as jnp
    from auncel_tpu.profile.bounded import bounded_search
    ds, idx, path = saved
    es = profiled
    od = OnDiskIVFIndex(path)
    od.attach_profile(es.traces, multipler=es.multipler, std_m=es.std_m,
                      max_topk=es.max_topk)
    acc = np.full(len(ds.xq), 0.9, np.float32)
    v2, i2, np2 = od.search_bounded(ds.xq, acc, query_k=10)
    rv, ri, r_np, r_scan, _ = bounded_search(
        idx.arrays, es.traces, jnp.asarray(ds.xq), jnp.asarray(acc),
        jnp.float32(es.multipler), jnp.float32(es.std_m),
        jnp.zeros(len(ds.xq), jnp.float32), 10, es.max_topk, idx.metric)
    np.testing.assert_array_equal(np2, np.asarray(r_scan))
    np.testing.assert_array_equal(i2, np.asarray(ri)[:, :10])
    # distances agree within the framework's value-consistency band
    # (different scan chunk shapes reorder the f32 reduction by ~1 ulp)
    np.testing.assert_allclose(v2, np.asarray(rv)[:, :10], rtol=1e-5)


def test_ondisk_bounded_touches_only_needed_lists(saved, profiled):
    """Structural proof: the bounded path pages at most the decision
    prefix plus each query's decided budget — never the whole corpus."""
    ds, idx, path = saved
    es = profiled
    od = OnDiskIVFIndex(path)
    od.attach_profile(es.traces, multipler=2.0, std_m=1.0,
                      max_topk=es.max_topk)
    counter = _CountingMmap(od.db)
    od.db = counter
    acc = np.full(8, 0.9, np.float32)
    _, _, my_np = od.search_bounded(ds.xq[:8], acc, query_k=10)
    nlist = od.nlist
    from auncel_tpu.profile.geometry import n_boundaries
    rank_k = max(min(nlist, n_boundaries(nlist) + 1), nlist // 8)
    # phase A: <= 8 * rank_k decision lists; phase B: <= sum of budgets
    bound = 8 * rank_k + int(np.maximum(my_np - nlist // 8, 0).sum())
    assert len(counter.touched) <= bound
    assert len(counter.touched) < nlist


def test_ondisk_header_roundtrip(saved):
    ds, idx, path = saved
    od = OnDiskIVFIndex(path)
    assert od.ntotal == idx.ntotal
    assert od.nlist == idx.nlist
    assert od.metric is idx.metric
