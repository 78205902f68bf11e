"""max_codes (code-visit budget, reference IndexIVF.h:69).

Semantics oracle: the reference scans ranked lists in order and breaks once
the running code count reaches max_codes (after finishing the crossing
list), so each query's effective probe count is
1 + #(strict prefix sums < max_codes), capped at nprobe
(IndexIVF.cpp:539-541). Verified against a per-query reference loop, and
the padded vs multirow paths against each other.
"""

import numpy as np
import pytest

from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.ops.knn import knn
from auncel_tpu.types import Metric


@pytest.fixture(scope="module")
def setup(request):
    rng = np.random.RandomState(7)
    nb, d, nlist = 4000, 32, 32
    xb = rng.randn(nb, d).astype(np.float32)
    xq = rng.randn(20, d).astype(np.float32)
    idx = IVFFlatIndex(d, nlist)
    idx.train(xb)
    idx.add(xb)
    return idx, xq


def _expected_limits(idx, xq, nprobe, max_codes):
    """Host replay of the reference's break rule."""
    _, cids = knn(xq, idx.centroids, nprobe, Metric.L2)
    sizes = np.asarray(idx.arrays.list_sizes)[cids]
    cum = np.cumsum(sizes, axis=1)
    return np.minimum(nprobe, (cum < max_codes).sum(axis=1) + 1), cids


def test_max_codes_matches_per_query_nprobe(setup):
    idx, xq = setup
    nprobe, k, max_codes = 16, 5, 600
    g, _ = _expected_limits(idx, xq, nprobe, max_codes)
    assert g.min() < nprobe  # the budget actually binds for this workload

    idx.max_codes = max_codes
    D_mc, I_mc = idx.search(xq, k, nprobe=nprobe)
    idx.max_codes = 0

    # oracle: per-query fixed-nprobe search at that query's own limit
    for i in range(xq.shape[0]):
        D_i, I_i = idx.search(xq[i:i + 1], k, nprobe=int(g[i]))
        np.testing.assert_allclose(D_mc[i], D_i[0], rtol=1e-5)
        np.testing.assert_array_equal(I_mc[i], I_i[0])


def test_max_codes_multirow_matches_padded(setup):
    idx, xq = setup
    nprobe, k, max_codes = 16, 5, 600
    idx.max_codes = max_codes
    D_pad, I_pad = idx.search(xq, k, nprobe=nprobe)
    idx.enable_multirow(row_cap=32)
    D_mr, I_mr = idx.search(xq, k, nprobe=nprobe)
    idx.max_codes = 0
    idx._multirow = None
    idx._multirow_row_cap = None
    np.testing.assert_allclose(D_pad, D_mr, rtol=1e-5)
    np.testing.assert_array_equal(I_pad, I_mr)


def test_max_codes_zero_is_unlimited(setup):
    idx, xq = setup
    D_a, I_a = idx.search(xq, 5, nprobe=8)
    idx.max_codes = 10 ** 9  # budget never binds
    D_b, I_b = idx.search(xq, 5, nprobe=8)
    idx.max_codes = 0
    np.testing.assert_allclose(D_a, D_b, rtol=1e-5)
    np.testing.assert_array_equal(I_a, I_b)


def test_max_codes_parameter_space():
    from auncel_tpu.autotune import set_index_parameter, ParameterSpace
    idx = IVFFlatIndex(16, 16, coarse="imi")
    set_index_parameter(idx, "max_codes", 4096.0)
    assert idx.max_codes == 4096
    set_index_parameter(idx, "max_codes", np.inf)
    assert idx.max_codes == 0
    dims = dict(ParameterSpace(idx).parameter_ranges())
    assert "max_codes" in dims and 256 in dims["max_codes"]
