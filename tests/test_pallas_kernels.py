"""Pallas fused-scan kernel tests (interpret mode on CPU; the real-TPU path
is exercised by bench/verify runs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.pallas_kernels.scan_scores import scan_scores_pallas, CHUNK


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
def test_scan_scores_matches_reference(rng, metric):
    nlist, cap, d, B, W = 16, 32, 8, 4, 2 * CHUNK
    db = rng.randn(nlist, cap, d).astype(np.float32)
    ids = np.arange(nlist * cap, dtype=np.int32).reshape(nlist, cap)
    ids[:, -5:] = -1
    q = rng.randn(B, d).astype(np.float32)
    lists = rng.randint(0, nlist, (B, W)).astype(np.int32)
    db[ids < 0] = 0.0  # pad rows are zero (pack invariant)
    out = np.asarray(scan_scores_pallas(
        jnp.asarray(db), jnp.asarray(q), jnp.asarray(lists), W, metric,
        interpret=True)).reshape(B, W, cap)
    for b in range(B):
        for s in range(W):
            l = lists[b, s]
            if metric is Metric.L2:
                want = ((q[b][None] - db[l]) ** 2).sum(-1)
                want[ids[l] < 0] = np.inf
            else:
                want = db[l] @ q[b]
                want[ids[l] < 0] = -np.inf
            got = out[b, s]
            mask = np.isfinite(want)
            np.testing.assert_allclose(got[mask], want[mask],
                                       rtol=1e-4, atol=1e-3)
            assert np.array_equal(np.isinf(got), np.isinf(want))
