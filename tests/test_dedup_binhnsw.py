"""IVFFlatDedup + binary HNSW (minor stock-parity pieces)."""

import numpy as np

from auncel_tpu.index.ivf import IVFFlatDedupIndex
from auncel_tpu.index.binary import (BinaryFlatIndex, BinaryHNSWIndex,
                                     pack_bits)


def test_ivf_flat_dedup_stores_once_expands_results():
    rng = np.random.RandomState(4)
    base = rng.rand(500, 16).astype(np.float32)
    x = np.concatenate([base, base[:100]])      # 100 exact duplicates
    idx = IVFFlatDedupIndex(16, 8)
    idx.train(base)
    idx.add(x)
    assert idx.ntotal == 500                    # duplicates stored once
    q = base[:5] + 1e-4
    vals, ids = idx.search(q, 4, nprobe=8)
    for r in range(5):
        # the duplicated nearest vector contributes BOTH its ids, at the
        # same distance (reference IndexIVFFlatDedup semantics)
        assert r in ids[r] and (500 + r) in ids[r]
        a, b = np.where(ids[r] == r)[0][0], np.where(ids[r] == 500 + r)[0][0]
        assert vals[r, a] == vals[r, b]


def test_binary_hnsw_matches_binary_flat():
    rng = np.random.RandomState(5)
    d = 64
    codes = pack_bits(rng.randint(0, 2, (5000, d)).astype(np.uint8))
    flat = BinaryFlatIndex(d)
    flat.add(codes)
    q = codes[:32]
    gtv, gti = flat.search(q, 5)
    g = BinaryHNSWIndex(d, M=16, ef_search=64)
    g.add(codes)
    g.build()
    v, i = g.search(q, 5, ef=64)
    rec = np.mean([len(set(a) & set(b)) / 5
                   for a, b in zip(i.tolist(), gti.tolist())])
    assert rec >= 0.85, rec
    # distances are integer Hamming values
    assert v.dtype == np.int32
    assert (v[:, 0] == 0).all()                 # query is a corpus row
