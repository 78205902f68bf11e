"""Binary index family tests (reference IndexBinaryFlat/IVF + hamming.cpp,
SURVEY.md §2 #19)."""

import numpy as np
import pytest

from auncel_tpu.index.binary import (
    BinaryFlatIndex, BinaryIVFIndex, pack_bits, unpack_bits)


@pytest.fixture(scope="module")
def bds(rng):
    d = 128  # bits
    # clustered bitstrings: flip a few bits around 32 prototypes
    protos = rng.randint(0, 2, (32, d)).astype(np.uint8)
    which = rng.randint(0, 32, 4000)
    bits = protos[which]
    flips = rng.rand(4000, d) < 0.05
    bits = bits ^ flips.astype(np.uint8)
    q_which = rng.randint(0, 32, 20)
    qbits = protos[q_which] ^ (rng.rand(20, d) < 0.08).astype(np.uint8)
    return pack_bits(bits), pack_bits(qbits), bits, qbits


def _gt_hamming(qbits, bits, k):
    ham = (qbits[:, None, :] ^ bits[None, :, :]).sum(-1)
    idx = np.argsort(ham, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(ham, idx, 1), idx


def test_pack_unpack_roundtrip(rng):
    bits = rng.randint(0, 2, (10, 64)).astype(np.uint8)
    np.testing.assert_array_equal(unpack_bits(pack_bits(bits), 64), bits)


def test_binary_flat_exact(bds):
    codes, qcodes, bits, qbits = bds
    idx = BinaryFlatIndex(128)
    idx.add(codes)
    vals, ids = idx.search(qcodes, 5)
    gt_vals, _ = _gt_hamming(qbits, bits, 5)
    np.testing.assert_array_equal(vals, gt_vals)  # exact Hamming distances


def test_binary_ivf_recall(bds):
    codes, qcodes, bits, qbits = bds
    idx = BinaryIVFIndex(128, nlist=16)
    idx.train(codes)
    idx.add(codes)
    gt_vals, gt_ids = _gt_hamming(qbits, bits, 5)
    vals, ids = idx.search(qcodes, 5, nprobe=16)  # full probe == exact
    np.testing.assert_array_equal(vals, gt_vals)
    vals1, _ = idx.search(qcodes, 5, nprobe=2)
    # partial probes: distances can only be >= exact
    assert np.all(vals1 >= gt_vals)
    # and on clustered bit data, 2 probes find most true neighbors
    assert (vals1 == gt_vals).mean() > 0.8


def test_binary_from_float_padding_is_worst():
    """Regression: +inf padding from the float sub-index must not wrap
    to INT32_MIN (which ranked better than every real hit)."""
    import numpy as np
    from auncel_tpu.index.binary import IndexBinaryFromFloat
    from auncel_tpu.index.flat import FlatIndex
    idx = IndexBinaryFromFloat(FlatIndex(32), 32)
    codes = np.array([[0x0F, 0xF0, 0x00, 0xFF]], np.uint8)
    idx.add(codes)
    d, i = idx.search(codes, 4)            # k > ntotal: 3 padded slots
    assert i[0, 0] == 0 and d[0, 0] == 0
    assert (d[0, 1:] == np.iinfo(np.int32).max).all(), d
