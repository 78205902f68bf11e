"""Standalone IndexPQ + polysemous reordering + RefineFlat + the widened
ParameterSpace (ht / k_factor / efSearch knobs)."""

import numpy as np
import pytest

import auncel_tpu as at
from auncel_tpu.types import Metric
from auncel_tpu.index.pq_index import IndexPQ
from auncel_tpu.index.flat import FlatIndex, IndexRefineFlat
from auncel_tpu.ops.polysemous import reorder_codebook, hamming_fit
from auncel_tpu.data.synthetic import make_clustered_dataset


@pytest.fixture(scope="module")
def ds():
    return make_clustered_dataset(nb=8_000, nq=48, d=32, n_clusters=32,
                                  seed=13)


@pytest.fixture(scope="module")
def gt(ds):
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    return flat.search(ds.xq, 10)


def _recall(I, gt_I, k=10):
    return np.mean([len(set(a[:k]) & set(b[:k])) / k
                    for a, b in zip(I.tolist(), gt_I.tolist())])


def test_index_pq_recall(ds, gt):
    _, gti = gt
    idx = at.index_factory(ds.d, "PQ8")
    assert isinstance(idx, IndexPQ) and idx.M == 8
    idx.train(ds.xb[:4000])
    idx.add(ds.xb)
    _, i = idx.search(ds.xq, 10)
    assert _recall(i, gti) >= 0.5   # 4 bytes/vec lossy codes


def test_polysemous_reorder_improves_hamming_fit(ds):
    from auncel_tpu.ops.pq import train_pq
    books = np.asarray(train_pq(ds.xb[:4000], 4).codebooks)
    ident = np.arange(256)
    base = hamming_fit(books[0], ident)
    perm = reorder_codebook(books[0], n_iter=15_000)
    assert sorted(perm.tolist()) == list(range(256))  # a real permutation
    improved = hamming_fit(books[0], perm)
    assert improved > base + 0.1, (base, improved)


def test_polysemous_filter_semantics(ds, gt):
    _, gti = gt
    idx = IndexPQ(ds.d, M=8, polysemous=True)
    idx.train(ds.xb[:4000], sa_iters=10_000)
    idx.add(ds.xb)
    # generous threshold ~= unfiltered
    v_all, i_all = idx.search(ds.xq, 10, ht=64)
    v_off, i_off = idx.search(ds.xq, 10, ht=0)
    np.testing.assert_array_equal(i_all, i_off)
    # tight threshold filters: every returned candidate is within ht
    ht = 20
    v_f, i_f = idx.search(ds.xq, 10, ht=ht)
    from auncel_tpu.ops.pq import encode_pq
    from auncel_tpu.ops.polysemous import POPCOUNT8
    import jax.numpy as jnp
    qc = np.asarray(encode_pq(idx.pq, jnp.asarray(ds.xq)))
    for b in range(8):
        for r, vid in enumerate(i_f[b]):
            if vid < 0:
                continue
            hd = POPCOUNT8[qc[b] ^ idx._codes[vid]].sum()
            assert hd <= ht
    # recall grows monotonically as the filter loosens
    _, i_mid = idx.search(ds.xq, 10, ht=32)
    assert (_recall(i_f, gti) <= _recall(i_mid, gti)
            <= _recall(i_all, gti))


def test_refine_flat_improves_pq(ds, gt):
    _, gti = gt
    base = IndexPQ(ds.d, M=4)
    idx = IndexRefineFlat(base, k_factor=8)
    idx.train(ds.xb[:4000])
    idx.add(ds.xb)
    _, i_base = base.search(ds.xq, 10)
    _, i_ref = idx.search(ds.xq, 10)
    assert _recall(i_ref, gti) > _recall(i_base, gti)
    assert _recall(i_ref, gti) >= 0.8


def test_parameter_space_multi_knob(ds, gt):
    from auncel_tpu.autotune import (ParameterSpace, set_index_parameters)
    gtv, gti = gt
    base = IndexPQ(ds.d, M=8, polysemous=True)
    idx = IndexRefineFlat(base, k_factor=2)
    idx.train(ds.xb[:4000], )
    idx.add(ds.xb)
    ps = ParameterSpace(idx)
    dims = ps.parameter_ranges()
    assert [n for n, _ in dims] == ["k_factor", "ht"]
    ops = ps.explore(ds.xq, gtv, k=10, reps=1)
    assert len(ops.all_pts) == len(dims[0][1]) * len(dims[1][1])
    # the string grammar sets both knobs (AutoTune.cpp:429-460)
    set_index_parameters(idx, "k_factor=4,ht=64")
    assert idx.k_factor == 4.0 and base.polysemous_ht == 64


def test_parameter_space_efsearch(ds, gt):
    from auncel_tpu.autotune import ParameterSpace
    idx = at.HNSWIndex(ds.d, M=16, ef_search=16)
    idx.add(ds.xb)
    ps = ParameterSpace(idx)
    assert ps.parameter_ranges()[0][0] == "efSearch"


def test_ivfpq_polysemous_ht():
    """The ht knob on the IVFPQ path (reference applies it there too,
    AutoTune.cpp:353-408): ht = full code width == unfiltered results;
    recall grows monotonically with ht; small ht really filters."""
    from auncel_tpu.data.synthetic import make_clustered_dataset
    from auncel_tpu.index.ivf import IVFFlatIndex
    from auncel_tpu.autotune import ParameterSpace
    ds = make_clustered_dataset(nb=6000, nq=16, d=32, n_clusters=16,
                                seed=13)
    idx = IVFFlatIndex(ds.d, nlist=16, storage="pq8", polysemous=True)
    idx.train(ds.xb[:3000])
    idx.add(ds.xb)
    v0, i0 = idx.search(ds.xq, 10, nprobe=16)      # ht=0: filter off
    idx.polysemous_ht = 64                          # 8 codes * 8 bits
    v1, i1 = idx.search(ds.xq, 10, nprobe=16)
    np.testing.assert_array_equal(i0, i1)           # max ht == no filter
    hits = []
    for ht in (8, 24, 64):
        idx.polysemous_ht = ht
        _, ih = idx.search(ds.xq, 10, nprobe=16)
        hits.append(np.mean([len(set(a) & set(b)) / 10
                             for a, b in zip(ih.tolist(), i0.tolist())]))
    assert hits == sorted(hits)
    assert hits[0] < 1.0                            # small ht filters
    # autotune sweeps (nprobe x ht) on this index family
    ps = ParameterSpace(idx)
    dims = dict(ps.parameter_ranges())
    assert "ht" in dims and "nprobe" in dims
    idx.polysemous_ht = 0


def test_search_types_he_ghe_sdc(ds, gt):
    """The code-domain search types (reference IndexPQ.h:75-82): each is
    verified against a numpy oracle on the stored codes; SDC recall must
    land near ADC's (both rank by codeword geometry)."""
    _, gti = gt
    idx = IndexPQ(ds.d, M=8, polysemous=True)
    idx.train(ds.xb[:4000], sa_iters=10_000)
    idx.add(ds.xb)
    from auncel_tpu.ops.pq import encode_pq
    import jax.numpy as jnp
    codes = idx._codes
    qcodes = np.asarray(encode_pq(idx.pq, jnp.asarray(ds.xq)))
    POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(1)

    # ST_HE: bit-Hamming over code bytes
    v, i = idx.search(ds.xq, 5, search_type="he")
    for qi in range(0, len(ds.xq), 7):
        ham = POP[codes ^ qcodes[qi]].sum(1)
        assert v[qi, 0] == ham.min()
        assert ham[i[qi, 0]] == ham.min()
        # returned list is ascending and matches the oracle multiset
        np.testing.assert_array_equal(np.sort(v[qi]), v[qi])
        np.testing.assert_array_equal(v[qi], np.sort(ham)[:5])

    # ST_generalized_HE: differing sub-code count
    v, i = idx.search(ds.xq, 5, search_type="ghe")
    for qi in range(0, len(ds.xq), 7):
        g = (codes != qcodes[qi]).sum(1)
        np.testing.assert_array_equal(v[qi], np.sort(g)[:5])

    # ST_SDC: symmetric distance via codeword tables
    v, i = idx.search(ds.xq, 10, search_type="sdc")
    sdc = np.asarray(idx._sdc_table())
    for qi in range(0, len(ds.xq), 11):
        d = sdc[np.arange(8)[None, :], qcodes[qi][None, :],
                codes].sum(1)
        np.testing.assert_allclose(v[qi, 0], d.min(), rtol=1e-4)
        assert abs(d[i[qi, 0]] - d.min()) < 1e-3
    rec_sdc = _recall(i, gti)
    _, i_adc = idx.search(ds.xq, 10, search_type="pq")
    rec_adc = _recall(i_adc, gti)
    assert rec_sdc >= rec_adc - 0.15, (rec_sdc, rec_adc)

    with pytest.raises(ValueError, match="SDC"):
        ip = IndexPQ(ds.d, M=8, metric=Metric.IP, search_type="sdc")
        ip.train(ds.xb[:2000])
        ip.add(ds.xb[:2000])
        ip.search(ds.xq, 5)
