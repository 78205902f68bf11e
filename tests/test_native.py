"""Native C++ runtime tests: build, then verify each entry point against its
numpy fallback."""

import numpy as np
import pytest

from auncel_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native lib failed to build")
    return True


def test_vecs_strip_headers(lib_ok, rng):
    n, d = 100, 17
    x = (rng.randn(n, d) * 100).astype(np.float32)
    raw = np.empty((n, d + 1), np.int32)
    raw[:, 0] = d
    raw[:, 1:] = x.view(np.int32)
    out = native.vecs_strip_headers(raw.ravel(), d)
    assert out is not None
    np.testing.assert_array_equal(out.view(np.float32), x)


def test_vecs_strip_headers_bad_dim(lib_ok, rng):
    raw = np.zeros((3, 5), np.int32)
    raw[:, 0] = 4
    raw[1, 0] = 7  # corrupt row
    assert native.vecs_strip_headers(raw.ravel(), 4) is None


@pytest.mark.parametrize("lower", [True, False])
def test_kway_merge_matches_numpy(lib_ok, rng, lower):
    S, B, k = 5, 13, 10
    vals = rng.randn(S, B, k).astype(np.float32)
    vals = np.sort(vals, axis=2)
    if not lower:
        vals = vals[:, :, ::-1].copy()
    ids = rng.randint(0, 10**6, size=(S, B, k)).astype(np.int64)
    got_v, got_i = native.kway_merge_topk(vals, ids, lower)
    # numpy fallback path
    flat_v = np.transpose(vals, (1, 0, 2)).reshape(B, S * k)
    flat_i = np.transpose(ids, (1, 0, 2)).reshape(B, S * k)
    order = np.argsort(flat_v if lower else -flat_v, axis=1)[:, :k]
    np.testing.assert_allclose(got_v, np.take_along_axis(flat_v, order, 1))
    np.testing.assert_array_equal(got_i, np.take_along_axis(flat_i, order, 1))


def test_pack_lists_matches_python(lib_ok, rng):
    n, d, nlist, cap = 500, 8, 16, 48
    x = rng.randn(n, d).astype(np.float32)
    vid = np.arange(n, dtype=np.int64) * 3
    assign = rng.randint(0, nlist, size=n)
    sizes = np.bincount(assign, minlength=nlist)
    assert sizes.max() <= cap
    order = np.argsort(assign, kind="stable").astype(np.int64)
    starts = np.zeros(nlist + 1, np.int64)
    np.cumsum(sizes, out=starts[1:])
    res = native.pack_lists(x, vid, order, starts, nlist, cap)
    assert res is not None
    db, ids = res
    sorted_x, sorted_ids = x[order], vid[order]
    for l in range(nlist):
        s, e = starts[l], starts[l + 1]
        np.testing.assert_array_equal(db[l, : e - s], sorted_x[s:e])
        np.testing.assert_array_equal(ids[l, : e - s], sorted_ids[s:e])
        assert np.all(ids[l, e - s:] == -1)
        assert np.all(db[l, e - s:] == 0)


def test_gather_rows_matches_fancy_index(tmp_path):
    """Threaded row gather (reference prefetch_lists capability) ==
    numpy fancy index, on both in-memory and mmap'd sources."""
    from auncel_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(3)
    src = rng.randn(500, 17, 8).astype(np.float32)
    rows = rng.choice(500, 160, replace=False)
    out = native.gather_rows(src, rows)
    np.testing.assert_array_equal(out, src[rows])
    # int32 source + preallocated destination
    isrc = rng.randint(0, 1 << 30, (300, 9)).astype(np.int32)
    rows2 = rng.choice(300, 10, replace=False)
    dst = np.empty((10, 9), np.int32)
    got = native.gather_rows(isrc, rows2, out=dst)
    assert got is dst
    np.testing.assert_array_equal(dst, isrc[rows2])
    # mmap'd npy source (the on-disk pager's case)
    p = str(tmp_path / "src.npy")
    np.save(p, src)
    mm = np.load(p, mmap_mode="r")
    np.testing.assert_array_equal(native.gather_rows(mm, rows), src[rows])
    # empty row set
    assert native.gather_rows(src, np.zeros(0, np.int64)).shape[0] == 0
