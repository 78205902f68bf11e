"""Stock completeness tail: IndexIDMap2, standalone IndexScalarQuantizer,
MultiIndexQuantizer(2), IndexBinaryFromFloat (reference MetaIndexes.h:59,
IndexScalarQuantizer.h:92, IndexPQ.h:135/160, IndexBinaryFromFloat.h:28).
"""

import numpy as np
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.index.flat import FlatIndex, IndexScalarQuantizer
from auncel_tpu.index.meta import IndexIDMap2
from auncel_tpu.index.imi import MultiIndexQuantizer, MultiIndexQuantizer2
from auncel_tpu.index.binary import (
    IndexBinaryFromFloat, BinaryFlatIndex, pack_bits)
from auncel_tpu.ops.knn import knn


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(3)
    xb = rng.randn(2000, 32).astype(np.float32)
    xq = rng.randn(30, 32).astype(np.float32)
    return xb, xq


def test_idmap2_reconstruct(data):
    xb, xq = data
    ids = np.arange(100, 100 + len(xb)) * 7
    idx = IndexIDMap2(FlatIndex(32))
    idx.add(xb, ids=ids)
    # search returns user ids
    _, I = idx.search(xq, 5)
    assert set(np.unique(I % 7)) == {0}
    # reconstruct by user id returns the stored vector
    np.testing.assert_array_equal(idx.reconstruct(int(ids[42])), xb[42])
    with pytest.raises(KeyError):
        idx.reconstruct(1)  # not a user id
    # rebuildable from scratch (MetaIndexes.cpp construct_rev_map)
    idx._rev = {}
    idx.construct_rev_map()
    np.testing.assert_array_equal(idx.reconstruct(int(ids[7])), xb[7])


@pytest.mark.parametrize("qtype", ["sq8", "sq4", "bf16"])
def test_sq_flat_recall_and_codec(data, qtype):
    xb, xq = data
    idx = IndexScalarQuantizer(32, qtype=qtype)
    idx.train(xb)
    idx.add(xb)
    D, I = idx.search(xq, 10)
    # sorted best-first, exact over the DECODED corpus: compare against
    # host-decoded brute force
    dec = np.stack([idx.reconstruct(i) for i in range(64)])
    np.testing.assert_allclose(
        dec, np.asarray(
            idx._pack().decode_block(idx._pack().db)).reshape(
                -1, 32)[:64], rtol=1e-6)
    gt = knn(xq, np.asarray(
        idx._pack().decode_block(idx._pack().db), np.float32).reshape(
            -1, 32)[:len(xb)], 10, Metric.L2)
    if qtype == "bf16":
        # bf16 storage contracts in bf16 on the MXU; the f32 host oracle
        # can swap near-ties (the documented bf16 ordering caveat) — the
        # candidate SET and distances still match
        hit = np.mean([len(set(I[i]) & set(gt.ids[i])) / 10
                       for i in range(len(xq))])
        assert hit >= 0.95
        np.testing.assert_allclose(np.sort(D, 1), np.sort(gt.vals, 1),
                                   rtol=2e-2)
    else:
        np.testing.assert_array_equal(I, gt.ids)
        np.testing.assert_allclose(D, gt.vals, rtol=1e-4, atol=1e-4)
    # quantization is close to the raw corpus (codec sanity)
    exact = knn(xq, xb, 10, Metric.L2)
    overlap = np.mean([
        len(set(I[i]) & set(exact.ids[i])) / 10 for i in range(len(xq))])
    assert overlap > (0.5 if qtype == "sq4" else 0.9)


def test_sq_flat_factory():
    import auncel_tpu as at
    idx = at.index_factory(16, "SQ8")
    assert isinstance(idx, IndexScalarQuantizer) and idx.qtype == "sq8"
    idx = at.index_factory(16, "SQfp16")
    assert idx.qtype == "bf16"


def test_miq_exact_product_ranking(data):
    xb, xq = data
    miq = MultiIndexQuantizer(32, M=2, nbits=4)
    miq.train(xb)
    assert miq.ntotal == 256
    D, I = miq.search(xq, 8)
    # oracle: exact distances to all materialized product centroids
    cents = np.stack([miq.reconstruct(i) for i in range(256)])
    gt = knn(xq, cents, 8, Metric.L2)
    np.testing.assert_array_equal(I, gt.ids)
    np.testing.assert_allclose(D, gt.vals, rtol=1e-4, atol=1e-4)
    with pytest.raises(RuntimeError):
        miq.add(xb)


def test_miq2_matches_miq_with_exact_assign(data):
    xb, xq = data
    miq = MultiIndexQuantizer(32, M=2, nbits=4)
    miq.train(xb)
    m2 = MultiIndexQuantizer2(32, 2, 4, [FlatIndex(16), FlatIndex(16)])
    m2.codebooks = miq.codebooks          # same cells
    m2.is_trained = True
    for m, sub in enumerate(m2.assign_indexes):
        sub.add(miq.codebooks[m])
    D1, I1 = miq.search(xq, 5)
    D2, I2 = m2.search(xq, 5)
    np.testing.assert_array_equal(I1, I2)  # exact assign => same ranking
    np.testing.assert_allclose(D1, D2, rtol=1e-4, atol=1e-4)


def test_binary_from_float_matches_binary_flat():
    rng = np.random.RandomState(11)
    d = 64
    codes = pack_bits(rng.randint(0, 2, size=(500, d)))
    qcodes = pack_bits(rng.randint(0, 2, size=(20, d)))
    bf = BinaryFlatIndex(d)
    bf.add(codes)
    D_ref, _ = bf.search(qcodes, 10)
    wrapped = IndexBinaryFromFloat(FlatIndex(d), d)
    wrapped.train(codes)
    wrapped.add(codes)
    D, I = wrapped.search(qcodes, 10)
    # distances are integer Hamming and match the native binary index
    np.testing.assert_array_equal(np.sort(D, 1), np.sort(D_ref, 1))
    assert D.dtype == np.int32
