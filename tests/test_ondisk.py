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


def test_ondisk_header_roundtrip(saved):
    ds, idx, path = saved
    od = OnDiskIVFIndex(path)
    assert od.ntotal == idx.ntotal
    assert od.nlist == idx.nlist
    assert od.metric is idx.metric
