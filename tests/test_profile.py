"""Error-profile engine tests: geometry units, trace SB/lookup golden
checks, cur_num binary-search parity, and the end-to-end bound guarantee
(the reference validates the bound empirically via eval/bound.cpp:404-414;
here it's a CI assertion)."""

import numpy as np
import jax.numpy as jnp
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.profile.geometry import (
    boundary_distances, sum_angle, n_boundaries)
from auncel_tpu.profile.trace import (
    build_trace, make_trace_set, trace_lookup)
from auncel_tpu.profile.bounded import _simulate_cur_num, wave_boundaries
from auncel_tpu.profile.error_sys import ErrorSys


# ------------------------------------------------------------------ geometry

def test_boundary_distance_collinear():
    """Query on the segment between two centroids: boundary distance must be
    (signed) distance to the midpoint hyperplane, in the reference's
    squared-distance convention: dtb = c/2 - (a^2+c^2-b^2)/(2c) with a, b, c
    all squared L2 values."""
    d = 4
    c0 = np.zeros(d, np.float32)
    c1 = np.zeros(d, np.float32)
    c1[0] = 10.0
    q = np.zeros(d, np.float32)
    q[0] = 3.0  # closer to c0
    a = 9.0     # sq dist to c0
    b = 49.0    # sq dist to c1
    c = 100.0   # sq dist between centroids
    want = c / 2 - (a * a + c * c - b * b) / (2 * c)
    cdis = jnp.asarray([[a, b] + [1e9] * 62])
    cids = jnp.asarray([[0, 1] + list(range(2, 64))], jnp.int32)
    inter = np.full((64, 64), 1e9, np.float32)
    inter[0, 1] = inter[1, 0] = c
    dtb = boundary_distances(cdis, cids, jnp.asarray(inter), Metric.L2)
    assert dtb.shape == (1, n_boundaries(64))
    np.testing.assert_allclose(float(dtb[0, 0]), want, rtol=1e-6)


def test_sum_angle_skip_rule():
    """Boundaries with dtb >= kdis contribute 0; others arccos(dtb/kdis)."""
    B, K = 1, 2
    dtb = np.zeros((B, 20), np.float32)
    dtb[0, :15] = [0.5] * 5 + [2.0] * 10  # 5 near boundaries, 10 far
    kdis = np.asarray([[1.0, 0.0]], np.float32)
    phi = np.asarray(sum_angle(jnp.asarray(kdis), jnp.asarray(dtb), 0))
    want0 = 5 * np.arccos(0.5)
    np.testing.assert_allclose(phi[0, 0], want0, rtol=1e-5)
    assert phi[0, 1] == 0.0  # kdis=0: everything skipped (dtb >= kdis)


# -------------------------------------------------------------------- traces

def test_build_trace_sb_golden():
    phi = np.asarray([5.0, 1.0, 3.0, 2.0, 4.0])
    u = np.asarray([50.0, 10.0, 30.0, 20.0, 40.0])
    valid = np.ones(5, bool)
    pb, ub, sb = build_trace(phi, u, valid, bs=2)
    # sorted desc by phi: (5,50),(4,40),(3,30),(2,20),(1,10); batches of 2:
    # [(4.5,45),(2.5,25),(1,10)] then reversed ascending.
    np.testing.assert_allclose(pb, [1.0, 2.5, 4.5])
    np.testing.assert_allclose(ub, [10.0, 25.0, 45.0])
    # each full batch: deviations +-5 -> sqrt(50/bs) = 5; ragged last batch
    # [10]: zero deviation (ref divides by bs regardless)
    np.testing.assert_allclose(sb, [0.0, 5.0, 5.0])


def test_trace_lookup_semantics():
    ts = make_trace_set([(np.asarray([1.0, 2.0, 4.0], np.float32),
                          np.asarray([10.0, 20.0, 40.0], np.float32),
                          np.asarray([1.0, 1.0, 2.0], np.float32))])
    std_m = jnp.float32(2.0)
    q = jnp.asarray([[0.5, 1.0, 2.5, 4.0, 8.0]])
    got = np.asarray(trace_lookup(ts, 0, q, std_m))[0]
    # below range -> first bin + 2*std
    assert got[0] == 12.0
    assert got[1] == 12.0          # phi == first bin
    assert got[2] == 22.0          # staircase: last bin <= 2.5 is bin 1
    # at/above last bin: (u+sc*std) * phi/last_phi
    np.testing.assert_allclose(got[3], 44.0)
    np.testing.assert_allclose(got[4], 44.0 * 2.0)


def test_empty_trace_is_conservative():
    pb, ub, sb = build_trace(np.zeros(0), np.zeros(0), np.zeros(0, bool))
    assert ub[0] >= 1e8  # huge U -> never predicts candidates inside top-k


# ------------------------------------------------------------------- cur_num

def _ref_cur_num(p, first_ok, query_k):
    """Direct Python replica of error_pro::cur_num's control flow
    (IVF_pro.cpp:258-291)."""
    if first_ok:
        return query_k
    low, high = 0, query_k - 1
    while low <= high:
        middle = (low + high) // 2
        if middle <= 0:
            return 0
        if p[middle]:
            low = middle + 1
        else:
            high = middle - 1
    return low + 1


@pytest.mark.parametrize("query_k", [3, 10, 100])
def test_simulate_cur_num_matches_reference_logic(rng, query_k):
    B = 64
    p = rng.rand(B, query_k) < 0.5
    first_ok = rng.rand(B) < 0.2
    got = np.asarray(_simulate_cur_num(jnp.asarray(p), jnp.asarray(first_ok),
                                       query_k))
    want = [_ref_cur_num(p[i], first_ok[i], query_k) for i in range(B)]
    np.testing.assert_array_equal(got, want)


def test_wave_boundaries():
    assert wave_boundaries(1024)[:8] == [1, 2, 4, 8, 16, 32, 64, 128]
    assert wave_boundaries(1024)[-1] == 1024
    assert wave_boundaries(64) == [1, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64]


# --------------------------------------------------------------- end-to-end

@pytest.fixture(scope="module")
def trained_sys():
    ds = make_clustered_dataset(nb=30000, nq=400, d=32, n_clusters=128,
                                seed=11)
    idx = IVFFlatIndex(ds.d, nlist=64)
    idx.train(ds.xt[:15000])
    idx.add(ds.xb)
    max_topk = 100
    gt_D, gt_I = idx.exact_search(ds.xq, max_topk)
    es = ErrorSys(idx, train_num=400, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(200, ds.xq)  # first 200 queries train the profile
    return ds, idx, es, gt_D, gt_I


def test_bound_guarantee_worst_case(trained_sys):
    """The product guarantee: min over queries of the distance-threshold
    intersection must meet 1 - eps (bound.cpp:404-414 check)."""
    ds, idx, es, gt_D, gt_I = trained_sys
    eps = 0.10
    k = 10
    es.set_topk(k)
    n_test = 200
    acc = np.full(400, 1.0 - eps, np.float32)
    es.set_queries(n_test, ds.xq, acc, alloc_size=400)
    # calibration margin, as the reference ships per-workload in
    # hyperparameter.txt (e.g. 9.3 for SIFT10M at eps=10%)
    es.set_hyper(multipler=12.0, std_m=1.0)
    D, I = es.search(200, n_test)
    from auncel_tpu.autotune import recall_counts
    cnt = recall_counts(D, gt_D[200:400], k, Metric.L2)
    min_recall = cnt.min() / k
    assert min_recall >= 1.0 - eps, f"bound violated: {min_recall}"
    # and it must not degenerate to always-full-scan
    assert np.mean(es.n_scanned[200:400]) < 64
    assert es.n_scanned[200:400].min() < 32  # some queries stop early


def test_adaptive_nprobe_varies(trained_sys):
    ds, idx, es, gt_D, gt_I = trained_sys
    es.set_topk(10)
    acc = np.full(400, 0.9, np.float32)
    es.set_queries(200, ds.xq, acc, alloc_size=400)
    es.set_hyper(4.0, 1.0)
    es.search(200, 200)
    nscan = es.n_scanned[200:400]
    assert nscan.min() >= 1
    assert nscan.max() > nscan.min()  # per-query adaptivity


def test_lower_bound_costs_less(trained_sys):
    ds, idx, es, gt_D, gt_I = trained_sys
    es.set_topk(10)
    es.set_hyper(4.0, 1.0)
    avg = {}
    for bound in (0.5, 0.95):
        acc = np.full(400, bound, np.float32)
        es.set_queries(200, ds.xq, acc, alloc_size=400)
        es.search(200, 200)
        avg[bound] = es.n_scanned[200:400].mean()
    assert avg[0.5] <= avg[0.95]


def test_profile_mode_records_true_recall(trained_sys):
    ds, idx, es, gt_D, gt_I = trained_sys
    es.set_topk(10)
    es.set_hyper(4.0, 1.0)
    es.profile = True
    acc = np.full(400, 0.9, np.float32)
    es.set_queries(50, ds.xq, acc, alloc_size=400)
    es.search(200, 50)
    es.profile = False
    got = es.t_recalls[200:250]
    assert np.all(got >= 0) and np.all(got <= 10.0)
    assert got.mean() >= 0.9  # achieved recall should clear the bound


def test_time_budget_mode(trained_sys):
    ds, idx, es, gt_D, gt_I = trained_sys
    es.per_probe_ms = 0.05  # synthetic cost model: avoid timing on CPU
    es._time_cost_table = None  # force the linear fallback path
    budgets = np.zeros(400, np.float32)
    budgets[200:400] = np.tile([0.5, 3.0], 100)  # alternate tight/loose ms
    es.set_queries(200, ds.xq, budgets, alloc_size=400)
    D, I = es.time_search(200, 200)
    n = es.n_scanned[200:400]
    assert n[::2].mean() < n[1::2].mean()  # bigger budget -> more probes
    assert n.max() <= 64 and n.min() >= 1


def test_time_budget_cost_table(trained_sys):
    """Round-5 table model (VERDICT r4 #2): budgets invert through the
    MEASURED monotone cost curve — each budget maps to the largest probe
    count whose cost fits 0.95x of it, whatever the curve's shape."""
    ds, idx, es, gt_D, gt_I = trained_sys
    nlist = idx.nlist
    # synthetic nonlinear staircase (the regime that broke the linear
    # model at 10M): big jumps where a new wave starts
    steps = np.where(np.arange(nlist) % 7 == 0, 0.5, 0.02)
    tbl = np.cumsum(steps)
    es._time_cost_table = np.maximum.accumulate(tbl)
    es.per_probe_ms = 999.0  # must be ignored when the table exists
    budgets = np.linspace(0.3, float(tbl[-1]) * 1.2, 400).astype(np.float32)
    n = es._budget_to_probes(budgets)
    assert n.min() >= 1 and n.max() <= nlist
    m = 0.95 * budgets.astype(np.float64)
    cost_n = es.time_cost_ms(n)
    # fits the margined budget wherever any count does...
    fits = m >= es._time_cost_table[0]
    assert (cost_n[fits] <= m[fits]).all()
    # ...and is maximal: one more probe would overshoot
    room = n < nlist
    nxt = np.clip(n + 1, 1, nlist)
    assert (es.time_cost_ms(nxt)[fits & room] > m[fits & room]).all()
    # end to end: time_search spends exactly these counts
    es.set_queries(200, ds.xq, budgets, alloc_size=400)
    D, I = es.time_search(200, 64)
    np.testing.assert_array_equal(es.n_scanned[200:264],
                                  es._budget_to_probes(budgets[200:264]))
    es._time_cost_table = None
    es.per_probe_ms = None


def test_profile_save_load(tmp_path, trained_sys):
    ds, idx, es, gt_D, gt_I = trained_sys
    p = str(tmp_path / "profile.npz")
    es.save_profile(p)
    es2 = ErrorSys(idx, 400, 100)
    es2.load_profile(p)
    es2.set_topk(10)
    es2.set_hyper(4.0, 1.0)
    acc = np.full(400, 0.9, np.float32)
    for sys_ in (es, es2):
        sys_.set_topk(10)
        sys_.set_hyper(4.0, 1.0)
        sys_.set_queries(20, ds.xq, acc, alloc_size=400)
    D1, I1 = es.search(200, 20)
    D2, I2 = es2.search(200, 20)
    np.testing.assert_array_equal(I1, I2)


def test_calibrate_meets_bound(trained_sys):
    ds, idx, es, gt_D, gt_I = trained_sys
    es.set_topk(10)
    acc = np.full(400, 0.9, np.float32)
    es.set_queries(200, ds.xq, acc, alloc_size=400)
    m = es.calibrate(200, 100, target_bound=0.9)
    assert 1.0 <= m <= 64.0
    D, I = es.search(300, 100)
    from auncel_tpu.autotune import recall_counts
    cnt = recall_counts(D, gt_D[300:400], 10, Metric.L2)
    # calibrated on held-out 200-300; check generalization loosely on 300-400
    assert cnt.min() / 10 >= 0.8


def test_two_phase_equals_single_phase(trained_sys):
    """The two-phase bucketed execution is an optimization, not a
    semantics change: results and probe counts must match the single-phase
    masked-wave engine exactly."""
    ds, idx, es, gt_D, gt_I = trained_sys
    es.set_topk(10)
    es.set_hyper(6.0, 1.0)
    acc = np.full(400, 0.9, np.float32)
    es.set_queries(100, ds.xq, acc, alloc_size=400)
    D1, I1 = es.search(200, 100, two_phase=False)
    n1 = es.n_scanned[200:300].copy()
    D2, I2 = es.search(200, 100, two_phase=True)
    n2 = es.n_scanned[200:300].copy()
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(D1, D2)
    np.testing.assert_array_equal(n1, n2)


def test_bounded_search_ip_metric():
    """End-to-end bounded search under inner product (the reference's
    TEXT10M path: L2-normalized vectors, arccos angle space throughout)."""
    from auncel_tpu.autotune import recall_counts
    ds = make_clustered_dataset(nb=20000, nq=200, d=32, n_clusters=64,
                                seed=29, metric=Metric.IP)
    idx = IVFFlatIndex(ds.d, nlist=64, metric=Metric.IP)
    idx.train(ds.xt[:10000])
    idx.add(ds.xb)
    gt_D, gt_I = idx.exact_search(ds.xq, 50)
    es = ErrorSys(idx, train_num=200, max_topk=50)
    es.set_gt(gt_D, gt_I)
    es.sys_train(100, ds.xq)
    es.set_topk(10)
    es.set_hyper(8.0, 1.0)
    acc = np.full(200, 0.9, np.float32)
    es.set_queries(100, ds.xq, acc)
    D, I = es.search(100, 100)
    cnt = recall_counts(D, gt_D[100:200], 10, Metric.IP)
    assert cnt.min() / 10 >= 0.9
    assert es.n_scanned[100:200].mean() < 64  # early termination happens
