"""merge_topk_verified: exact top-k merging through the ApproxTopK
candidate selector + exactness certificate (ops/topk.py).

The certificate must make the fast path safe in every regime the dense
pass produces: full incumbents, not-yet-full incumbents (worst-value
pads), masked windows (mostly worst), and heavy value ties across the
selection boundary. Values must equal the exact merge everywhere; ids
must match wherever values are untied.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from auncel_tpu.ops.topk import (topk_scores, merge_topk_verified,
                                 init_topk, worst_value)
from auncel_tpu.types import Metric


def _exact(rv, ri, s, si, k, metric):
    return topk_scores(jnp.concatenate([rv, s], axis=-1),
                       jnp.concatenate([ri, si], axis=-1), k, metric)


def _check(rv, ri, s, si, k, metric):
    ev, ei = _exact(rv, ri, s, si, k, metric)
    vv, vi = merge_topk_verified(rv, ri, jnp.asarray(s), jnp.asarray(si),
                                 k, metric)
    ev, vv = np.asarray(ev), np.asarray(vv)
    np.testing.assert_allclose(vv, ev, rtol=0, atol=0)
    # ids must agree wherever the value is untied within its row
    ei, vi = np.asarray(ei), np.asarray(vi)
    for b in range(ev.shape[0]):
        vals, cnt = np.unique(ev[b], return_counts=True)
        untied = np.isin(ev[b], vals[cnt == 1])
        np.testing.assert_array_equal(vi[b][untied], ei[b][untied])
    # output must be sorted best-first (inf-pad runs diff to nan: a nan
    # is not a violation, only a strictly negative diff is)
    key = vv if metric.lower_is_better else -vv
    assert not (np.diff(key, axis=-1) < 0).any()


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
def test_random_wide_windows(metric):
    rng = np.random.RandomState(0)
    B, k, W = 16, 10, 4096
    rv, ri = init_topk((B,), k, metric)
    for it in range(3):
        s = rng.rand(B, W).astype(np.float32) * 100
        si = rng.randint(0, 1 << 20, (B, W)).astype(np.int32)
        _check(rv, ri, s, si, k, metric)
        rv, ri = merge_topk_verified(rv, ri, jnp.asarray(s),
                                     jnp.asarray(si), k, metric)


@pytest.mark.parametrize("metric", [Metric.L2, Metric.IP])
def test_mostly_masked_window_and_not_full_incumbent(metric):
    """A query with fewer real candidates than k (pads at worst value)
    must merge exactly — the certificate counts only real candidates."""
    rng = np.random.RandomState(1)
    B, k, W = 8, 10, 4096
    w = worst_value(metric)
    rv, ri = init_topk((B,), k, metric)
    s = np.full((B, W), w, np.float32)
    si = np.full((B, W), -1, np.int32)
    # query 0: only 3 real candidates; query 1: exactly k; rest: many
    for b, n_real in enumerate([3, 10] + [200] * (B - 2)):
        pos = rng.choice(W, n_real, replace=False)
        s[b, pos] = rng.rand(n_real) * 10
        si[b, pos] = pos
    _check(rv, ri, s, si, k, metric)


def test_tie_heavy_values_stay_exact():
    """Ties across the selection boundary either pass the certificate
    (all tied candidates selected) or fall back — values exact both
    ways."""
    B, k, W = 4, 10, 4096
    rv, ri = init_topk((B,), k, Metric.L2)
    s = np.ones((B, W), np.float32)            # everything tied
    si = np.arange(W, dtype=np.int32)[None].repeat(B, 0)
    ev, _ = _exact(rv, ri, jnp.asarray(s), jnp.asarray(si), k, Metric.L2)
    vv, _ = merge_topk_verified(rv, ri, jnp.asarray(s), jnp.asarray(si),
                                k, Metric.L2)
    np.testing.assert_allclose(np.asarray(vv), np.asarray(ev))


def test_narrow_window_short_circuits_to_exact():
    B, k = 4, 10
    rng = np.random.RandomState(2)
    rv, ri = init_topk((B,), k, Metric.L2)
    s = rng.rand(B, 32).astype(np.float32)
    si = rng.randint(0, 100, (B, 32)).astype(np.int32)
    _check(rv, ri, s, si, k, Metric.L2)


def test_incremental_equals_oneshot():
    """Folding many windows through the verified merge equals one exact
    top-k over the whole candidate stream (the dense-pass contract)."""
    rng = np.random.RandomState(3)
    B, k, W, n_win = 8, 10, 4096, 6
    metric = Metric.L2
    rv, ri = init_topk((B,), k, metric)
    all_s, all_i = [], []
    for win in range(n_win):
        s = rng.rand(B, W).astype(np.float32) * 100
        si = (win * W + np.arange(W, dtype=np.int32))[None].repeat(B, 0)
        all_s.append(s)
        all_i.append(si)
        rv, ri = merge_topk_verified(rv, ri, jnp.asarray(s),
                                     jnp.asarray(si), k, metric)
    ev, ei = topk_scores(jnp.asarray(np.concatenate(all_s, -1)),
                         jnp.asarray(np.concatenate(all_i, -1)), k, metric)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(ev),
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(ei))
