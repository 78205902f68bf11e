"""Product-quantization tests (reference ProductQuantizer/IVFPQ capability,
SURVEY.md §2 #16)."""

import numpy as np
import jax.numpy as jnp
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.factory import index_factory
from auncel_tpu.ops.pq import train_pq, encode_pq, decode_pq
from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.autotune import recall_counts


@pytest.fixture(scope="module")
def ds():
    return make_clustered_dataset(nb=16000, nq=60, d=32, n_clusters=64,
                                  seed=19)


def test_pq_reconstruction_improves_with_M(ds):
    errs = []
    for M in (2, 8):
        pq = train_pq(ds.xb[:6000], M, niter=8)
        codes = encode_pq(pq, jnp.asarray(ds.xb[:500]))
        rec = np.asarray(decode_pq(pq, codes))
        errs.append(((rec - ds.xb[:500]) ** 2).sum(-1).mean())
    assert errs[1] < errs[0]  # more subspaces -> lower distortion
    # and reconstruction is far better than the trivial mean predictor
    base = ((ds.xb[:500] - ds.xb[:6000].mean(0)) ** 2).sum(-1).mean()
    assert errs[1] < 0.35 * base


def test_ivfpq_recall(ds):
    idx = index_factory(ds.d, "IVF64,PQ8")
    idx.train(ds.xt[:8000])
    idx.add(ds.xb)
    assert idx.arrays.db.dtype == np.uint8
    assert idx.arrays.db.shape[-1] == 8  # M codes per vector
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    _, gt_ids = flat.search(ds.xq, 10)
    _, ids = idx.exact_search(ds.xq, 10)
    hit = np.mean([len(set(a) & set(b)) / 10
                   for a, b in zip(ids.tolist(), gt_ids.tolist())])
    assert hit > 0.5  # PQ8 on 32d clustered data keeps most neighbors


def test_ivfpq_partial_scan_value_consistency(ds):
    idx = index_factory(ds.d, "IVF64,PQ8")
    idx.train(ds.xt[:8000])
    idx.add(ds.xb)
    v4, i4 = idx.search(ds.xq, 10, nprobe=4)
    vf, iff = idx.exact_search(ds.xq, 10)
    lut = {(q, int(i)): v for q in range(len(ds.xq))
           for v, i in zip(vf[q], iff[q])}
    for q in range(len(ds.xq)):
        for v, i in zip(v4[q], i4[q]):
            if (q, int(i)) in lut:
                assert abs(lut[(q, int(i))] - v) <= 1e-4 * max(abs(v), 1.0)


def test_bounded_search_on_pq(ds):
    idx = index_factory(ds.d, "IVF64,PQ8")
    idx.train(ds.xt[:8000])
    idx.add(ds.xb)
    gt_D, gt_I = idx.exact_search(ds.xq, 50)  # PQ-space GT (consistent)
    es = ErrorSys(idx, train_num=60, max_topk=50)
    es.set_gt(gt_D, gt_I)
    es.sys_train(40, ds.xq)
    es.set_topk(10)
    es.set_hyper(8.0, 1.0)
    acc = np.full(60, 0.9, np.float32)
    es.set_queries(20, ds.xq, acc)
    D, I = es.search(40, 20)
    cnt = recall_counts(D, gt_D[40:60], 10, Metric.L2)
    assert cnt.min() / 10 >= 0.9


def test_residual_pq_beats_plain_pq(ds):
    from auncel_tpu.index.ivf import IVFFlatIndex
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    _, gt_ids = flat.search(ds.xq, 10)

    def recall(residual):
        idx = IVFFlatIndex(ds.d, 64, storage="pq4", pq_residual=residual)
        idx.train(ds.xt[:8000])
        idx.add(ds.xb)
        _, ids = idx.exact_search(ds.xq, 10)
        return np.mean([len(set(a) & set(b)) / 10
                        for a, b in zip(ids.tolist(), gt_ids.tolist())])

    r_res, r_plain = recall(True), recall(False)
    # residual coding quantizes a much smaller range -> better recall
    assert r_res > r_plain


def test_opq_reduces_pq_distortion(rng):
    """OPQ must beat plain PQ on dimension-correlated data (its raison
    d'etre): build data where adjacent dims are strongly correlated so the
    default subspace split is bad, and check the learned rotation lowers
    reconstruction error."""
    import jax.numpy as jnp
    from auncel_tpu.index.transform import OPQMatrix
    n, d, M = 4000, 16, 4
    z = rng.randn(n, d // 2).astype(np.float32)
    x = np.concatenate([z, z * 0.9 + 0.1 * rng.randn(n, d // 2)], 1)

    def pq_err(y):
        pq = train_pq(y[:3000], M, niter=6)
        rec = np.asarray(decode_pq(pq, encode_pq(pq, jnp.asarray(y))))
        return ((rec - y) ** 2).sum(-1).mean()

    base = pq_err(x)
    opq = OPQMatrix(d, M, niter=5)
    opq.train(x)
    rotated = pq_err(opq.apply(x))
    assert rotated < base


def test_factory_opq_chain(ds):
    from auncel_tpu.index.transform import IndexPreTransform
    from auncel_tpu.index.factory import index_factory
    idx = index_factory(ds.d, "OPQ4,IVF32,PQ4")
    assert isinstance(idx, IndexPreTransform)
    idx.train(ds.xb[:4000])
    idx.add(ds.xb[:2000])
    v, i = idx.search(ds.xq[:5], 3)
    assert v.shape == (5, 3)
