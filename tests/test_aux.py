"""Range search, ID selectors, remove_ids tests (reference
AuxIndexStructures + IndexIVF::range_search capabilities)."""

import numpy as np
import pytest

from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.aux import (
    range_search, remove_ids, IDSelectorRange, IDSelectorBatch)


@pytest.fixture(scope="module")
def built():
    ds = make_clustered_dataset(nb=8000, nq=10, d=16, n_clusters=32, seed=5)
    idx = IVFFlatIndex(ds.d, nlist=32)
    idx.train(ds.xb[:4000])
    idx.add(ds.xb)
    return ds, idx


def test_range_search_matches_bruteforce(built):
    ds, idx = built
    d2 = ((ds.xq[:, None, :] - ds.xb[None]) ** 2).sum(-1)
    radius = float(np.quantile(d2.min(1), 0.5) * 4.0)
    res = range_search(idx, ds.xq, radius, nprobe=32)  # full scan
    for i in range(len(ds.xq)):
        got = set(res.labels[res.lims[i]:res.lims[i + 1]].tolist())
        want = set(np.where(d2[i] < radius)[0].tolist())
        # tolerance band: distances within float error of the radius
        border = set(np.where(np.abs(d2[i] - radius) < 1.0)[0].tolist())
        assert got - border == want - border


def test_range_search_partial_probe_is_subset(built):
    ds, idx = built
    d2 = ((ds.xq[:, None, :] - ds.xb[None]) ** 2).sum(-1)
    radius = float(np.quantile(d2.min(1), 0.5) * 4.0)
    full = range_search(idx, ds.xq, radius, nprobe=32)
    part = range_search(idx, ds.xq, radius, nprobe=2)
    for i in range(len(ds.xq)):
        g_full = set(full.labels[full.lims[i]:full.lims[i + 1]].tolist())
        g_part = set(part.labels[part.lims[i]:part.lims[i + 1]].tolist())
        assert g_part <= g_full


def test_id_selectors():
    r = IDSelectorRange(10, 20)
    np.testing.assert_array_equal(
        r.is_member(np.asarray([5, 10, 19, 20])),
        [False, True, True, False])
    b = IDSelectorBatch([3, 7, 11])
    np.testing.assert_array_equal(
        b.is_member(np.asarray([3, 4, 7, 12])), [True, False, True, False])


@pytest.mark.parametrize("storage", ["sq8", "sq4", "sq6", "bf16", "pq4"])
def test_remove_ids_quantized_storage(built, storage):
    """remove_ids must decode through the codec (nibble-packed SQ4 and PQ
    codes are NOT vectors; residual PQ needs the list centroid added back)
    — the same route update_vectors takes."""
    ds, _ = built
    idx = IVFFlatIndex(ds.d, nlist=16, storage=storage)
    idx.train(ds.xb[:4000])
    idx.add(ds.xb[:1000])
    removed = remove_ids(idx, IDSelectorRange(0, 100))
    assert removed == 100
    assert idx.ntotal == 900
    _, ids = idx.exact_search(ds.xb[200:210], 1)
    # surviving vectors must still round-trip to themselves (quantization
    # noise is far smaller than inter-point distances in this dataset)
    np.testing.assert_array_equal(ids[:, 0], np.arange(200, 210))
    _, ids0 = idx.exact_search(ds.xb[:5], 1)
    assert np.all(ids0[:, 0] >= 100)


def test_reconstruct_residual_pq_adds_centroid(built):
    """Residual-PQ reconstruction = centroid + decoded residual; decoding
    the codes alone returns residuals (near zero), not vectors."""
    ds, _ = built
    idx = IVFFlatIndex(ds.d, nlist=16, storage="pq4")
    idx.train(ds.xb[:4000])
    idx.add(ds.xb[:1000])
    rec = idx.reconstruct_n(0, 50)
    orig = ds.xb[:50]
    rel = np.linalg.norm(rec - orig, axis=1) / np.linalg.norm(orig, axis=1)
    assert np.median(rel) < 0.25, "reconstruction should approximate x"


def test_remove_ids(built):
    ds, _ = built
    idx = IVFFlatIndex(ds.d, nlist=16)
    idx.train(ds.xb[:4000])
    idx.add(ds.xb[:1000])
    removed = remove_ids(idx, IDSelectorRange(0, 100))
    assert removed == 100
    assert idx.ntotal == 900
    _, ids = idx.exact_search(ds.xb[:5], 1)
    assert np.all(ids[:, 0] >= 100)  # the removed rows are gone
    _, ids2 = idx.exact_search(ds.xb[500:505], 1)
    np.testing.assert_array_equal(ids2[:, 0], np.arange(500, 505))


def test_range_search_residual_pq_storage():
    """Regression: range_search must apply the residual-PQ centroid
    correction like the main scan (it scored ||q-r||^2, returning 0 hits
    inside a radius holding the true top-5)."""
    import numpy as np
    from auncel_tpu.index.ivf import IVFFlatIndex
    from auncel_tpu.index.aux import range_search
    from auncel_tpu.ops.knn import knn
    from auncel_tpu.types import Metric
    rng = np.random.RandomState(6)
    xb = rng.randn(3000, 16).astype(np.float32)
    xq = rng.randn(4, 16).astype(np.float32)
    idx = IVFFlatIndex(16, 8, storage="pq4")
    idx.train(xb)
    idx.add(xb)
    # radius that covers each query's decoded top-5
    v5, _ = idx.search(xq, 5, nprobe=8)
    res = range_search(idx, xq, float(v5[:, 4].max()) * 1.001, nprobe=8)
    lims = np.asarray(res.lims)
    counts = lims[1:] - lims[:-1]
    assert (counts >= 5).all(), counts


def test_empty_id_selector_batch():
    import numpy as np
    from auncel_tpu.index.aux import IDSelectorBatch
    sel = IDSelectorBatch([])
    got = sel.is_member(np.array([1, 2, 3]))
    assert got.shape == (3,) and not got.any()
