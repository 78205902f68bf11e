"""Multirow bounded engine: exactness vs the padded engine, two-phase
equality, and conservativeness under forced catch-up (tiny-width) plans."""

import numpy as np
import jax.numpy as jnp
import pytest

import auncel_tpu as at
from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.profile.bounded import bounded_search
from auncel_tpu.profile.bounded_mr import (
    bounded_search_mr, bounded_oneshot_mr, plan_mr_waves, plan_oneshot)


@pytest.fixture(scope="module")
def trained():
    """Skewed index + trained profile + queries (the regime multirow is
    for: mega-cells forcing cap >> mean list size)."""
    rng = np.random.RandomState(7)
    d, nlist, nb = 32, 32, 30000
    centers = rng.rand(nlist, d).astype(np.float32) * 10
    pops = 1.0 / np.arange(1, nlist + 1)
    pops /= pops.sum()
    which = rng.choice(nlist, size=nb, p=pops)
    xb = (centers[which] + 0.5 * rng.randn(nb, d)).astype(np.float32)
    n_train, n_test, max_topk = 200, 60, 40
    xq = (centers[rng.choice(nlist, n_train + n_test)]
          + 0.7 * rng.randn(n_train + n_test, d)).astype(np.float32)
    idx = IVFFlatIndex(d, nlist)
    idx.set_centroids(centers)
    idx.add(xb)
    gt_D, gt_I = idx.exact_search(xq, max_topk)
    es = at.ErrorSys(idx, train_num=n_train + n_test, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_train, xq)
    es.set_topk(10)
    acc = np.full(n_train + n_test, 0.9, np.float32)
    es.set_queries(n_test, xq, acc)
    es.set_hyper(2.0, 1.0)
    return idx, es, xq, gt_D, n_train, n_test


def _run_padded(idx, es, q, acc):
    out = bounded_search(
        idx.arrays, es.traces, jnp.asarray(q), jnp.asarray(acc),
        jnp.float32(es.multipler), jnp.float32(es.std_m),
        jnp.zeros(q.shape[0], jnp.float32), es.query_topk, es.max_topk,
        idx.metric)
    return [np.asarray(x) for x in out]


def _run_mr(idx, es, q, acc, plan=None):
    mr = idx.multirow
    if plan is None:
        plan = plan_mr_waves(np.asarray(mr.rows_per_list), idx.nlist,
                             decide_only=False)
    out = bounded_search_mr(
        idx.arrays, mr, es.traces, jnp.asarray(q), jnp.asarray(acc),
        jnp.float32(es.multipler), jnp.float32(es.std_m),
        jnp.zeros(q.shape[0], jnp.float32), es.query_topk, es.max_topk,
        idx.metric, plan)
    return [np.asarray(x) for x in out]


def test_mr_single_phase_matches_padded(trained):
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    q = xq[n_train:n_train + n_test]
    acc = np.full(n_test, 0.9, np.float32)
    v1, i1, np1, ns1, _ = _run_padded(idx, es, q, acc)
    v2, i2, np2, ns2, _ = _run_mr(idx, es, q, acc)
    # same decisions (list units), bitwise-same distances, same results
    np.testing.assert_array_equal(np1, np2)
    np.testing.assert_array_equal(ns1, ns2)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(i1, i2)


def test_mr_tiny_widths_still_exact(trained):
    """A starved plan (min width, no slack) fragments every stage into
    catch-up waves — yet decisions stay EXACTLY the padded engine's:
    per-group worst-case coverage guarantees stage completion, completion
    lands on a catch-up wave of the SAME stage, and the stagnation counter
    advances by the per-query list gap, so nothing drifts."""
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    mr = idx.multirow
    q = xq[n_train:n_train + n_test]
    acc = np.full(n_test, 0.9, np.float32)
    starved = plan_mr_waves(np.asarray(mr.rows_per_list), idx.nlist,
                            decide_only=False, slack=0.4, min_width=1)
    # the plan really does get fragmented into catch-up waves
    assert len(starved.waves) > len(plan_mr_waves(
        np.asarray(mr.rows_per_list), idx.nlist, False).waves)
    v1, i1, np1, ns1, _ = _run_padded(idx, es, q, acc)
    v2, i2, np2, ns2, _ = _run_mr(idx, es, q, acc, plan=starved)
    assert (np2 > 0).all()             # forced decision always fires
    np.testing.assert_array_equal(np1, np2)
    np.testing.assert_array_equal(ns1, ns2)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(i1, i2)


def test_mr_oneshot_equals_wave_engine(trained):
    """The single-dispatch engine (device-side compaction while-loops)
    produces exactly the wave engine's decisions and results — including
    under starved capacities that force MANY compaction rounds."""
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    mr = idx.multirow
    q = xq[n_train:n_train + n_test]
    acc = np.full(n_test, 0.9, np.float32)
    v1, i1, np1, ns1, _ = _run_mr(idx, es, q, acc)
    rpl = np.asarray(mr.rows_per_list)
    for kwargs in (dict(), dict(split=1, a2_cap=4, tail_cap=4,
                               tail_waves=3)):
        plan = plan_oneshot(rpl, idx.nlist, **kwargs)
        out = bounded_oneshot_mr(
            idx.arrays, mr, es.traces, jnp.asarray(q), jnp.asarray(acc),
            jnp.float32(es.multipler), jnp.float32(es.std_m),
            jnp.zeros(n_test, jnp.float32), es.query_topk, es.max_topk,
            idx.metric, plan)
        v2, i2, np2, ns2, _ = [np.asarray(x) for x in out]
        np.testing.assert_array_equal(np1, np2)
        np.testing.assert_array_equal(ns1, ns2)
        np.testing.assert_array_equal(v1, v2)
        np.testing.assert_array_equal(i1, i2)


def test_mr_errsys_matches_padded_engine(trained):
    """ErrorSys produces identical results with and without the multirow
    layout enabled (default plans, both two-phase)."""
    idx, es, xq, gt_D, n_train, n_test = trained
    idx._multirow = None               # force padded path
    idx._multirow_row_cap = None
    D1, I1 = es.search(n_train, n_test)
    np1 = es.my_nprobe[n_train:n_train + n_test].copy()
    idx.enable_multirow(row_cap=128)
    D2, I2 = es.search(n_train, n_test)
    np2 = es.my_nprobe[n_train:n_train + n_test].copy()
    np.testing.assert_array_equal(np1, np2)
    np.testing.assert_array_equal(D1, D2)
    np.testing.assert_array_equal(I1, I2)


def test_tiny_multipler_forced_floor_is_full_scan(trained):
    """Regression: when floor(stage*multipler) == 0 at every stage (a
    multipler below 8/nlist), the forced decision must fall back to a
    FULL scan like the reference/padded control flow — flooring to 1
    probe would terminate far earlier than the reference."""
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    q = xq[n_train:n_train + 8]
    acc = np.full(8, 0.999999, np.float32)  # nothing decides early
    old_m = es.multipler
    try:
        es.set_hyper(multipler=1e-4, std_m=es.std_m)
        D, I = es.search(n_train, 8)
        assert (es.n_scanned[n_train:n_train + 8] == idx.nlist).all(), \
            es.n_scanned[n_train:n_train + 8]
        # full scan -> exact results
        gtv, gti = idx.exact_search(q, es.query_topk)
        np.testing.assert_array_equal(I, gti)
    finally:
        es.set_hyper(multipler=old_m, std_m=es.std_m)


def test_min_decide_stage_is_conservative(trained):
    """Coalescing early decision stages (min_decide_stage) must terminate
    every query at the SAME stage or LATER (never earlier) — the
    bound-conservativeness contract of the merge-block-reduction knob.
    Scanning strictly more lists can also only improve the exact top-k."""
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    mr = idx.multirow
    q = xq[n_train:n_train + n_test]
    acc = np.full(n_test, 0.9, np.float32)
    v1, i1, np1, ns1, _ = _run_mr(idx, es, q, acc)  # full ladder
    rpl = np.asarray(mr.rows_per_list)
    cap_stage = max(idx.nlist // 8, 1)
    for mds in (2, 4, idx.nlist):  # nlist over-asks; clamps to cap_stage
        plan = plan_mr_waves(rpl, idx.nlist, decide_only=False,
                             min_decide_stage=mds)
        stages = sorted({s for (s, w, dec, main) in plan.waves if dec})
        assert stages[0] >= min(mds, cap_stage)
        assert cap_stage in stages     # forced stage never dropped
        v2, i2, np2, ns2, _ = _run_mr(idx, es, q, acc, plan=plan)
        assert (np2 >= np1).all(), (mds, np1[np2 < np1], np2[np2 < np1])
        assert (ns2 >= ns1).all()
        # more lists scanned -> exact top-k over a superset prefix
        assert (v2[:, :es.query_topk] <= v1[:, :es.query_topk] + 1e-6).all()
        assert (np2 > 0).all()         # everyone still decides


def test_min_decide_stage_oneshot_matches_wave_engine(trained):
    """The single-dispatch engine under a coalesced plan equals the wave
    engine under the same coalescing — the knob composes with the
    device-side compaction phases."""
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    mr = idx.multirow
    q = xq[n_train:n_train + n_test]
    acc = np.full(n_test, 0.9, np.float32)
    rpl = np.asarray(mr.rows_per_list)
    wave_plan = plan_mr_waves(rpl, idx.nlist, decide_only=False,
                              min_decide_stage=4)
    v1, i1, np1, ns1, _ = _run_mr(idx, es, q, acc, plan=wave_plan)
    plan = plan_oneshot(rpl, idx.nlist, min_decide_stage=4)
    out = bounded_oneshot_mr(
        idx.arrays, mr, es.traces, jnp.asarray(q), jnp.asarray(acc),
        jnp.float32(es.multipler), jnp.float32(es.std_m),
        jnp.zeros(n_test, jnp.float32), es.query_topk, es.max_topk,
        idx.metric, plan)
    v2, i2, np2, ns2, _ = [np.asarray(x) for x in out]
    np.testing.assert_array_equal(np1, np2)
    np.testing.assert_array_equal(ns1, ns2)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(i1, i2)


def test_min_decide_stage_errsys_bound_holds(trained):
    """ErrorSys with the knob on: every query scans at least as much and
    the achieved worst-case recall never drops below the full ladder's."""
    from auncel_tpu.autotune import recall_counts
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    D1, I1 = es.search(n_train, n_test)
    ns1 = es.n_scanned[n_train:n_train + n_test].copy()
    rec1 = recall_counts(D1, gt_D[n_train:n_train + n_test],
                         es.query_topk, idx.metric)
    try:
        es.min_decide_stage = 4
        D2, I2 = es.search(n_train, n_test)
        ns2 = es.n_scanned[n_train:n_train + n_test].copy()
        rec2 = recall_counts(D2, gt_D[n_train:n_train + n_test],
                             es.query_topk, idx.metric)
        assert (ns2 >= ns1).all()
        assert rec2.min() >= rec1.min()
        assert (rec2 >= rec1).all()    # superset prefix per query
    finally:
        es.min_decide_stage = 1


def test_degenerate_trace_never_terminates():
    """Regression: a stage whose trace collected no training pairs must
    keep the conservative EMPTY_TRACE_U for every phi (the above-range
    scaling used to collapse U to ~0 and fire the predicate on an
    untrained stage)."""
    import jax.numpy as jnp
    from auncel_tpu.profile.trace import (build_trace, make_trace_set,
                                          trace_lookup, EMPTY_TRACE_U)
    empty = build_trace(np.zeros((0, 4), np.float32),
                        np.zeros((0, 4), np.float32),
                        np.zeros((0, 4), bool))
    ts = make_trace_set([empty])
    phi = jnp.asarray([[0.0, 1e-9, 0.5, 100.0]])
    u = np.asarray(trace_lookup(ts, 0, phi, jnp.float32(1.0)))
    assert (u >= EMPTY_TRACE_U * 0.99).all(), u


def test_plan_latency_is_conservative_and_exact(trained):
    """The batch-1-shaped plan (thinned decide ladder + geometric serve
    tail, round-5) terminates every query at the same or a later stage
    than the full ladder, and its results are exactly the full-ladder
    engine's results at its own (>=) budgets."""
    from auncel_tpu.profile.bounded_mr import plan_latency
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    mr = idx.multirow
    q = xq[n_train:n_train + n_test]
    acc = np.full(n_test, 0.9, np.float32)
    v1, i1, np1, ns1, _ = _run_mr(idx, es, q, acc)  # full ladder
    rpl = np.asarray(mr.rows_per_list)
    cap_stage = max(idx.nlist // 8, 1)
    plan = plan_latency(rpl, idx.nlist, decide_stages=(2,), serve_base=8)
    stages = sorted({s for (s, w, dec, main) in plan.waves if dec})
    assert stages == [2, cap_stage]
    v2, i2, np2, ns2, _ = _run_mr(idx, es, q, acc, plan=plan)
    assert (np2 > 0).all()             # everyone decides
    assert (np2 >= np1).all(), np2[np2 < np1]
    assert (ns2 >= ns1).all()
    # a superset prefix can only improve the exact top-k
    assert (v2[:, :es.query_topk] <= v1[:, :es.query_topk] + 1e-6).all()
    # exactness: queries whose decision matched the full ladder must
    # return bitwise the full ladder's results
    same = np2 == np1
    np.testing.assert_array_equal(v2[same], v1[same])
    np.testing.assert_array_equal(i2[same], i1[same])


def test_plan_latency_rejects_untrained_stage(trained):
    from auncel_tpu.profile.bounded_mr import plan_latency
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    rpl = np.asarray(idx.multirow.rows_per_list)
    with pytest.raises(ValueError):
        plan_latency(rpl, idx.nlist, decide_stages=(3,))
    # stages at/above the forced cap are dropped, not rejected
    plan = plan_latency(rpl, idx.nlist, decide_stages=(idx.nlist,))
    stages = sorted({s for (s, w, dec, main) in plan.waves if dec})
    assert stages == [max(idx.nlist // 8, 1)]


def test_errsys_tiny_bucket_rides_latency_plan(trained):
    """ErrorSys routes batch-1 searches through the latency plan: the
    per-query budget is conservative (>= the batched decision) and the
    served top-k is exact for that budget."""
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    D1, I1 = es.search(n_train, n_test)            # batched oneshot
    np1 = es.my_nprobe[n_train:n_train + n_test].copy()
    assert es.lat_bucket_max >= 1                  # default on
    lat_np = np.zeros(n_test, np.int64)
    D2 = np.zeros_like(D1)
    for j in range(n_test):
        Dq, Iq = es.search(n_train + j, 1)
        D2[j] = Dq[0]
        lat_np[j] = es.my_nprobe[n_train + j]
    assert (lat_np >= np1).all()
    # Exactness at the query's own budget: the batch-1 result must equal
    # the exact fixed-count replay BITWISE (same batch shape, same gather
    # kernels). Cross-BATCH-SHAPE value comparison is deliberately absent:
    # q_sq + db_sq - 2*dot reassociates per shape, and its fp error scales
    # with the norms, not the distance.
    from auncel_tpu.profile.bounded_mr import nprobe_search_mr, plan_oneshot
    mr = idx.multirow
    oplan = plan_oneshot(np.asarray(mr.rows_per_list), idx.nlist)
    for j in range(0, n_test, 9):
        rv, ri, _ = nprobe_search_mr(
            idx.arrays, mr, jnp.asarray(xq[n_train + j:n_train + j + 1]),
            jnp.asarray([int(lat_np[j])]), es.max_topk, idx.metric, oplan)
        np.testing.assert_array_equal(
            np.asarray(rv)[0, :es.query_topk], D2[j])
    # disabled -> the batched engine's decisions
    try:
        es.lat_bucket_max = 0
        Dq, Iq = es.search(n_train, 1)
        assert es.my_nprobe[n_train] == np1[0]
    finally:
        es.lat_bucket_max = 1


def test_decide_margin_is_conservative(trained):
    """The k+1 exact-top-k margin: marked queries terminate at the same
    stage or later (min() with the base predicate), unmarked queries are
    untouched, and ErrorSys's auto flag keys on ceil(acc*k) == k."""
    idx, es, xq, gt_D, n_train, n_test = trained
    idx.enable_multirow(row_cap=128)
    mr = idx.multirow
    q = xq[n_train:n_train + n_test]
    plan = plan_mr_waves(np.asarray(mr.rows_per_list), idx.nlist,
                         decide_only=False)

    def run(acc, margin):
        out = bounded_search_mr(
            idx.arrays, mr, es.traces, jnp.asarray(q), jnp.asarray(acc),
            jnp.float32(es.multipler), jnp.float32(es.std_m),
            jnp.zeros(n_test, jnp.float32), es.query_topk, es.max_topk,
            idx.metric, plan, decide_margin=margin)
        return [np.asarray(x) for x in out]

    acc95 = np.full(n_test, 0.95, np.float32)   # ceil(.95*10)=10: exact
    v1, i1, np1, ns1, _ = run(acc95, False)
    v2, i2, np2, ns2, _ = run(acc95, True)
    assert (np2 >= np1).all(), np2[np2 < np1]
    assert (v2[:, :es.query_topk] <= v1[:, :es.query_topk] + 1e-6).all()
    acc90 = np.full(n_test, 0.9, np.float32)    # ceil(.9*10)=9: unmarked
    v3, i3, np3, ns3, _ = run(acc90, True)
    v4, i4, np4, ns4, _ = run(acc90, False)
    np.testing.assert_array_equal(np3, np4)
    np.testing.assert_array_equal(v3, v4)
    # ErrorSys auto flag
    old_acc = es.require_acc
    try:
        es.set_queries(n_test, xq, np.full(n_train + n_test, 0.9,
                                           np.float32))
        assert es._decide_margin_flag() is False
        es.set_queries(n_test, xq, np.full(n_train + n_test, 0.95,
                                           np.float32))
        assert es._decide_margin_flag() is True
        es.decide_margin = False
        assert es._decide_margin_flag() is False
    finally:
        es.decide_margin = "auto"
        es.set_queries(n_test, xq, old_acc)
