"""Binary factory / serialization / meta-wrapper parity tests.

Mirrors the reference behaviors of tests/test_binary_factory.py (grammar
BFlat | BIVF%d | BHNSW%d | BIVF%d_HNSW%d), tests/test_binary_io.py
(write_index_binary round-trips for flat/IVF/HNSW) and
tests/test_index_binary.py:254-324 (replicas/shards over binary indexes).
"""

import numpy as np
import pytest

from auncel_tpu.index.binary import (
    BinaryFlatIndex, BinaryIVFIndex, BinaryHNSWIndex, index_binary_factory)
from auncel_tpu.index.io import save_index, load_index
from auncel_tpu.index.meta import IndexShards, IndexReplicas


@pytest.fixture(scope="module")
def bds():
    rng = np.random.RandomState(7)
    # clustered bitstrings: centers + bit flips
    centers = rng.randint(0, 2, size=(8, 64))
    xb = np.empty((1500, 64), np.uint8)
    for i in range(1500):
        c = centers[i % 8].copy()
        flip = rng.choice(64, 6, replace=False)
        c[flip] ^= 1
        xb[i] = c
    codes = np.packbits(xb, axis=1, bitorder="little")
    xq = codes[:20]
    return codes, xq


def test_binary_factory_grammar():
    i1 = index_binary_factory(16, "BIVF10")
    assert isinstance(i1, BinaryIVFIndex) and i1.nlist == 10
    assert i1.d // 8 == 2                       # code_size parity
    i2 = index_binary_factory(16, "BFlat")
    assert isinstance(i2, BinaryFlatIndex)
    i3 = index_binary_factory(256, "BHNSW32")
    assert isinstance(i3, BinaryHNSWIndex)
    i4 = index_binary_factory(256, "BIVF1024_BHNSW32")
    assert isinstance(i4, BinaryIVFIndex) and i4.nlist == 1024
    assert i4.coarse_hnsw_m == 32
    i5 = index_binary_factory(256, "BIVF64_HNSW16")  # reference spelling
    assert i5.coarse_hnsw_m == 16
    with pytest.raises(NotImplementedError):
        index_binary_factory(16, "BWhatever")


def test_binary_flat_io_roundtrip(bds, tmp_path):
    codes, xq = bds
    idx = BinaryFlatIndex(64)
    idx.add(codes)
    D0, I0 = idx.search(xq, 5)
    p = str(tmp_path / "bflat.npz")
    save_index(idx, p)
    idx2 = load_index(p)
    D1, I1 = idx2.search(xq, 5)
    np.testing.assert_array_equal(D0, D1)
    np.testing.assert_array_equal(I0, I1)


def test_binary_ivf_io_roundtrip(bds, tmp_path):
    codes, xq = bds
    idx = BinaryIVFIndex(64, nlist=8)
    idx.train(codes)
    idx.add(codes)
    idx.nprobe = 4
    D0, I0 = idx.search(xq, 5)
    p = str(tmp_path / "bivf.npz")
    save_index(idx, p)
    idx2 = load_index(p)
    assert idx2.nprobe == 4 and idx2.nlist == 8
    D1, I1 = idx2.search(xq, 5)
    np.testing.assert_array_equal(D0, D1)
    np.testing.assert_array_equal(I0, I1)


def test_binary_hnsw_io_roundtrip(bds, tmp_path):
    codes, xq = bds
    idx = BinaryHNSWIndex(64, M=8)
    idx.add(codes)
    idx.build()
    D0, I0 = idx.search(xq, 5)
    p = str(tmp_path / "bhnsw.npz")
    save_index(idx, p)
    idx2 = load_index(p)
    D1, I1 = idx2.search(xq, 5)   # same graph tables -> same walk
    np.testing.assert_array_equal(D0, D1)
    np.testing.assert_array_equal(I0, I1)


def test_bivf_hnsw_coarse_recall(bds):
    """The BIVF%d_HNSW%d cell: approximate coarse probing stays close to
    the exact Hamming cell ranking."""
    codes, xq = bds
    exact = BinaryIVFIndex(64, nlist=8)
    exact.train(codes)
    exact.add(codes)
    approx = BinaryIVFIndex(64, nlist=8, coarse_hnsw_m=8)
    approx.centroid_bits = exact.centroid_bits   # same cells
    approx.is_trained = True
    approx.add(codes)
    _, Ie = exact.search(xq, 5, nprobe=4)
    _, Ia = approx.search(xq, 5, nprobe=4)
    agree = np.mean([len(set(a.tolist()) & set(b.tolist())) / 5
                     for a, b in zip(Ie, Ia)])
    assert agree > 0.9, agree


def test_binary_shards_match_flat(bds):
    """Reference test_index_binary.py test_shards: sharded result ==
    single flat result (ids translated back to global)."""
    codes, xq = bds
    ref = BinaryFlatIndex(64)
    ref.add(codes)
    Dr, Ir = ref.search(xq, 5)

    sh = IndexShards(64)
    for _ in range(3):
        sh.add_shard(BinaryFlatIndex(64))
    sh.add(codes)
    Ds, Is = sh.search(xq, 5)
    np.testing.assert_array_equal(np.sort(Dr, 1), np.sort(
        np.asarray(Ds, Dr.dtype), 1))
    # distances of retrieved ids must match the flat oracle's values
    bits = np.unpackbits(codes, axis=1, count=64, bitorder="little")
    qbits = np.unpackbits(xq, axis=1, count=64, bitorder="little")
    for qi in range(len(xq)):
        ham = (bits[Is[qi]] != qbits[qi]).sum(1)
        np.testing.assert_array_equal(ham, np.asarray(Ds[qi], ham.dtype))


def test_binary_replicas(bds):
    codes, xq = bds
    rep = IndexReplicas(64)
    for _ in range(2):
        r = BinaryFlatIndex(64)
        r.add(codes)
        rep.add_replica(r)
    ref = BinaryFlatIndex(64)
    ref.add(codes)
    Dr, _ = ref.search(xq, 5)
    Dp, _ = rep.search(xq, 5)
    np.testing.assert_array_equal(Dr, np.asarray(Dp, Dr.dtype))


def test_binary_hnsw_pad_distances_are_worst(bds):
    """k > ntotal pads must carry the int32 max (not INT32_MIN from an
    inf cast), so merges rank them last."""
    codes, _ = bds
    idx = BinaryHNSWIndex(64, M=4)
    idx.add(codes[:3])
    idx.build()
    D, I = idx.search(codes[:2], 8)
    pad = I < 0
    assert pad.any()
    assert np.all(D[pad] == np.iinfo(np.int32).max)
    real = ~pad
    assert np.all(D[real] < np.iinfo(np.int32).max)
