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


def test_extract_index_ivf_unwraps_wrappers(ds, idx):
    from auncel_tpu.index.meta import IndexIDMap
    from auncel_tpu.index.transform import IndexPreTransform
    from auncel_tpu.index.flat import FlatIndex
    assert ivflib.extract_index_ivf(idx) is idx
    assert ivflib.extract_index_ivf(IndexIDMap(idx)) is idx
    assert ivflib.extract_index_ivf(
        IndexPreTransform(idx, [])) is idx
    with pytest.raises(TypeError):
        ivflib.extract_index_ivf(FlatIndex(ds.d))


def test_check_compatible_for_merge(ds, idx):
    ok = IVFFlatIndex(ds.d, nlist=16)
    ok.set_centroids(idx.centroids)
    ivflib.check_compatible_for_merge(idx, ok)  # no raise
    other = IVFFlatIndex(ds.d, nlist=16)
    other.train(ds.xb[4000:])  # different quantizer
    with pytest.raises(ValueError, match="quantizer|centroids"):
        ivflib.check_compatible_for_merge(idx, other)
    sq = IVFFlatIndex(ds.d, nlist=16, storage="sq8")
    sq.set_centroids(idx.centroids)
    with pytest.raises(ValueError, match="codec"):
        ivflib.check_compatible_for_merge(idx, sq)


def test_search_with_parameters_stateless(ds, idx):
    # reference ivflib::search_with_parameters: explicit params for one
    # call, persistent settings untouched
    idx.nprobe = 1
    v_ref, i_ref = idx.search(ds.xq, 5, nprobe=16)
    v, i = ivflib.search_with_parameters(idx, ds.xq, 5, nprobe=16)
    np.testing.assert_array_equal(i, i_ref)
    np.testing.assert_allclose(v, v_ref, rtol=1e-6)
    assert idx.nprobe == 1 and idx.max_codes == 0
    # max_codes override throttles work without sticking
    v2, _ = ivflib.search_with_parameters(idx, ds.xq, 5, nprobe=16,
                                          max_codes=8)
    assert idx.max_codes == 0
    assert (v2 >= v_ref - 1e-6).all()  # budgeted scan can only be worse


def test_invlist_range_roundtrip(ds, idx):
    """get_invlist_range -> set_invlist_range is an identity splice, and
    a cross-index splice transplants the donor's contents for that range
    (reference IVFlib.h:111-117)."""
    before_v, before_i = idx.search(ds.xq, 5, nprobe=16)
    sl = ivflib.get_invlist_range(idx, 3, 9)
    ivflib.set_invlist_range(idx, 3, 9, sl)     # identity
    after_v, after_i = idx.search(ds.xq, 5, nprobe=16)
    np.testing.assert_array_equal(after_i, before_i)
    np.testing.assert_allclose(after_v, before_v, rtol=1e-5)

    # donor trained with the SAME quantizer holds different vectors
    donor = IVFFlatIndex(ds.d, nlist=16)
    donor.set_centroids(idx.centroids)
    donor.add(ds.xb[4000:8000], ids=np.arange(4000, 8000))
    ivflib.set_invlist_range(idx, 3, 9,
                             ivflib.get_invlist_range(donor, 3, 9))
    # lists outside [3, 9) keep the original contents; inside, only donor
    # ids (>= 4000) remain
    a = idx.arrays
    ids_np = np.asarray(a.vec_ids)
    sizes = np.asarray(a.list_sizes)
    for l in range(3, 9):
        got = ids_np[l, : sizes[l]]
        assert (got >= 4000).all(), f"list {l} kept stale entries"
    outside = np.concatenate([ids_np[l, : sizes[l]]
                              for l in list(range(3)) + list(range(9, 16))])
    assert (outside < 4000).all()

    with pytest.raises(ValueError, match="quantizer|centroid"):
        bad = IVFFlatIndex(ds.d, nlist=16)
        bad.train(ds.xb[4000:])
        bad.add(ds.xb[4000:5000])
        ivflib.set_invlist_range(idx, 3, 9,
                                 ivflib.get_invlist_range(bad, 3, 9))


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
