"""SQ8 / bf16 storage codec tests (reference ScalarQuantizer capability,
SURVEY.md §2 #17): recall close to f32, decoded-value consistency, and the
full bounded-search path running on quantized storage."""

import numpy as np
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.factory import index_factory
from auncel_tpu.profile.error_sys import ErrorSys


@pytest.fixture(scope="module")
def ds():
    return make_clustered_dataset(nb=20000, nq=60, d=32, n_clusters=64,
                                  seed=17)


@pytest.fixture(scope="module")
def gt(ds):
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    return flat.search(ds.xq, 10)


def _recall(ids, gt_ids, k=10):
    return np.mean([len(set(a) & set(b)) / k
                    for a, b in zip(ids[:, :k].tolist(),
                                    gt_ids[:, :k].tolist())])


@pytest.mark.parametrize("storage", ["sq8", "bf16"])
def test_quantized_full_scan_recall(ds, gt, storage):
    idx = index_factory(ds.d, "IVF64,SQ8" if storage == "sq8"
                        else "IVF64,SQbf16")
    idx.train(ds.xt[:10000])
    idx.add(ds.xb)
    _, ids = idx.exact_search(ds.xq, 10)
    assert _recall(ids, gt[1]) > 0.97  # quantization barely moves top-10


def test_sq8_memory_is_uint8(ds):
    idx = IVFFlatIndex(ds.d, 64, storage="sq8")
    idx.train(ds.xt[:10000])
    idx.add(ds.xb)
    assert idx.arrays.db.dtype == np.uint8
    assert idx.arrays.sq_scale.shape == (ds.d,)


def test_sq8_partial_scan_value_consistency(ds):
    """Distances from partial scans must match full-scan values exactly
    (both computed on decoded codes) — the profile invariant."""
    idx = IVFFlatIndex(ds.d, 64, storage="sq8")
    idx.train(ds.xt[:10000])
    idx.add(ds.xb)
    v4, i4 = idx.search(ds.xq, 10, nprobe=4)
    vf, iff = idx.exact_search(ds.xq, 10)
    lut = {(q, int(i)): v for q in range(len(ds.xq))
           for v, i in zip(vf[q], iff[q])}
    for q in range(len(ds.xq)):
        for v, i in zip(v4[q], i4[q]):
            if (q, int(i)) in lut:
                assert abs(lut[(q, int(i))] - v) <= 1e-5 * max(abs(v), 1.0)


@pytest.mark.parametrize("storage", ["sq8", "sq6", "pq8"])
def test_bounded_search_on_sq8(ds, storage):
    """Error-bounded search over compressed storage — the reference's
    tune branch lives in the shared IndexIVF::search_preassigned
    (IndexIVF.cpp:497-673) and therefore serves every IVF storage codec;
    here the codec is a decode hook under the same wave engine."""
    idx = IVFFlatIndex(ds.d, 64, storage=storage)
    idx.train(ds.xt[:10000])
    idx.add(ds.xb)
    gt_D, gt_I = idx.exact_search(ds.xq, 50)
    es = ErrorSys(idx, train_num=60, max_topk=50)
    es.set_gt(gt_D, gt_I)
    es.sys_train(40, ds.xq)
    es.set_topk(10)
    es.set_hyper(8.0, 1.0)
    acc = np.full(60, 0.9, np.float32)
    es.set_queries(20, ds.xq, acc)
    D, I = es.search(40, 20)
    from auncel_tpu.autotune import recall_counts
    cnt = recall_counts(D, gt_D[40:60], 10, Metric.L2)
    assert cnt.min() / 10 >= 0.9


def test_sq4_recall_and_consistency(ds, gt):
    idx = index_factory(ds.d, "IVF64,SQ4")
    idx.train(ds.xt[:10000])
    idx.add(ds.xb)
    assert idx.arrays.db.shape[-1] == ds.d // 2  # nibble-packed
    _, ids = idx.exact_search(ds.xq, 10)
    assert _recall(ids, gt[1]) > 0.7  # 4-bit: coarse (16 levels) but usable
    # partial vs full scan value consistency on decoded values
    v4, i4 = idx.search(ds.xq, 10, nprobe=4)
    vf, iff = idx.exact_search(ds.xq, 10)
    lut = {(q, int(i)): v for q in range(len(ds.xq))
           for v, i in zip(vf[q], iff[q])}
    for q in range(len(ds.xq)):
        for v, i in zip(v4[q], i4[q]):
            if (q, int(i)) in lut:
                assert abs(lut[(q, int(i))] - v) <= 1e-4 * max(abs(v), 1.0)


def test_uniform_sq_variants():
    """QT_8bit_uniform / QT_4bit_uniform (IndexScalarQuantizer.h:37-38):
    one shared range across dimensions; decode stays value-consistent
    (same codec), recall close to per-dim SQ on well-scaled data."""
    import numpy as np
    from auncel_tpu.index.ivf import IVFFlatIndex
    from auncel_tpu.index.flat import IndexScalarQuantizer
    from auncel_tpu.ops.knn import knn
    from auncel_tpu.types import Metric
    rng = np.random.RandomState(2)
    xb = rng.randn(3000, 16).astype(np.float32)
    xq = rng.randn(32, 16).astype(np.float32)
    gt = knn(xq, xb, 10, Metric.L2).ids
    for storage in ("sq8u", "sq4u"):
        idx = IVFFlatIndex(16, 8, storage=storage)
        idx.train(xb)
        idx.add(xb)
        a = idx.arrays
        # uniform: every dimension shares one (scale, bias)
        assert np.unique(np.asarray(a.sq_scale)).size == 1
        assert np.unique(np.asarray(a.sq_bias)).size == 1
        _, ids = idx.search(xq, 10, nprobe=8)
        rec = np.mean([len(set(r.tolist()) & set(g.tolist())) / 10
                       for r, g in zip(ids, gt)])
        assert rec > (0.85 if storage == "sq8u" else 0.5), (storage, rec)
    flat = IndexScalarQuantizer(16, qtype="sq8u")
    flat.train(xb)
    flat.add(xb)
    _, ids = flat.search(xq, 10)
    rec = np.mean([len(set(r.tolist()) & set(g.tolist())) / 10
                   for r, g in zip(ids, gt)])
    assert rec > 0.9, rec


def test_sq_rangestat_modes():
    """ScalarQuantizer range-training statistics (RangeStat,
    IndexScalarQuantizer.h:51-56): with heavy-tailed data, a quantile or
    mean/std range ignores outliers and quantizes the bulk finer than
    min/max."""
    import numpy as np
    from auncel_tpu.index.flat import IndexScalarQuantizer
    rng = np.random.RandomState(4)
    x = rng.randn(4000, 16).astype(np.float32)
    x[:8] *= 100.0                       # a few extreme outliers
    bulk = x[8:]

    def recon_mse(rangestat, arg=0.0):
        sq = IndexScalarQuantizer(16, qtype="sq4", rangestat=rangestat,
                                  rangestat_arg=arg)
        sq.train(x)
        codes = sq._encode(bulk)
        lo = (codes & 0xF).astype(np.float32)
        hi = (codes >> 4).astype(np.float32)
        dec = np.stack([lo, hi], -1).reshape(-1, 16) * sq._scale + sq._vmin
        return float(np.square(dec - bulk).mean())

    e_minmax = recon_mse("minmax")
    e_quant = recon_mse("quantiles", 0.01)
    e_meanstd = recon_mse("meanstd", 3.0)
    assert e_quant < 0.25 * e_minmax, (e_quant, e_minmax)
    assert e_meanstd < 0.25 * e_minmax, (e_meanstd, e_minmax)
    # the trained index still searches end to end
    sq = IndexScalarQuantizer(16, qtype="sq8", rangestat="quantiles",
                              rangestat_arg=0.01)
    sq.train(x)
    sq.add(x)
    v, i = sq.search(x[:4], 3)
    assert (i[:, 0] == np.arange(4)).all()


def test_sq6_multirow_matches_padded(ds):
    """The row layout must stay value-identical over the SQ6 codec too
    (rows gather packed codes; both layouts decode through decode_block)."""
    idx = IVFFlatIndex(ds.d, 64, storage="sq6")
    idx.train(ds.xt[:10000])
    idx.add(ds.xb)
    v0, i0 = idx.search(ds.xq, 10, nprobe=8)
    idx.enable_multirow()
    v1, i1 = idx.search(ds.xq, 10, nprobe=8)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
