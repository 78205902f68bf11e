"""Dense-scan crossover: the shared masked corpus pass must produce the
same results as the per-query gather tail (same candidate set -> same
top-k), for bounded search and exact-nprobe replay, across storage codecs.

The crossover is the TPU recast of the reference's
``distance_compute_blas_threshold`` switch (utils.cpp:538-622): at high
decided budgets one corpus read shared by the whole batch replaces B
private gathers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import auncel_tpu as at
from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.profile.bounded_mr import (
    nprobe_search_mr, bounded_oneshot_mr, plan_oneshot)


def _mk(storage="f32", seed=3, d=32, nlist=32, nb=20000):
    # Unit-scale clusters: keeps the |q.x| / dist^2 ratio small so the
    # L2-via-GEMM cancellation envelope (eps * dots / dist^2 relative
    # error, inherent to BOTH engines' kernels) stays under the 1e-5
    # comparison tolerance. At 10x center scale the envelope alone is
    # ~5e-5 rel between any two differently-shaped exact kernels.
    rng = np.random.RandomState(seed)
    centers = rng.rand(nlist, d).astype(np.float32)
    pops = 1.0 / np.arange(1, nlist + 1)
    pops /= pops.sum()
    which = rng.choice(nlist, size=nb, p=pops)
    xb = (centers[which] + 0.5 * rng.randn(nb, d)).astype(np.float32)
    idx = IVFFlatIndex(d, nlist, storage=storage)
    idx.set_centroids(centers)
    idx.add(xb)
    idx.enable_multirow(row_cap=64)
    xq = (centers[rng.choice(nlist, 48)]
          + 0.7 * rng.randn(48, d)).astype(np.float32)
    return idx, xq


def _assert_same_results(vg, ig, vd, idn, k):
    """Gather vs dense top-k: values match to fp-reassociation tolerance;
    ids match except where equal distances permit tie reordering."""
    np.testing.assert_allclose(vd[:, :k], vg[:, :k], rtol=1e-5, atol=1e-5)
    mism = idn[:, :k] != ig[:, :k]
    if mism.any():
        # every mismatch must be a distance tie
        b, j = np.nonzero(mism)
        np.testing.assert_allclose(vd[b, j], vg[b, j], rtol=1e-6,
                                   atol=1e-6)


@pytest.mark.parametrize("storage", ["f32", "sq8"])
def test_nprobe_dense_matches_gather(storage):
    idx, xq = _mk(storage)
    mr = idx.multirow
    rpl = np.asarray(mr.rows_per_list)
    k = 20
    rng = np.random.RandomState(0)
    probes = rng.randint(1, idx.nlist + 1, size=xq.shape[0])
    p_gather = plan_oneshot(rpl, idx.nlist)                 # xover off
    p_dense = plan_oneshot(rpl, idx.nlist, dense_cut=0.0)  # always dense
    q = jnp.asarray(xq)
    npb = jnp.asarray(probes, jnp.int32)
    vg, ig, _ = [np.asarray(x) for x in nprobe_search_mr(
        idx.arrays, mr, q, npb, k, idx.metric, p_gather)]
    vd, idn, _ = [np.asarray(x) for x in nprobe_search_mr(
        idx.arrays, mr, q, npb, k, idx.metric, p_dense)]
    _assert_same_results(vg, ig, vd, idn, k)
    assert (ig[:, :10] >= 0).all()


def test_bounded_oneshot_dense_matches_gather():
    idx, xq = _mk("f32")
    n_train, n_test, max_topk = 122, 48, 40  # train_num % 10 == 0
    allq = np.concatenate([
        xq, xq[np.random.RandomState(1).permutation(48)]
        + 0.1 * np.random.RandomState(2).randn(48, idx.d).astype(
            np.float32)])
    allq = np.concatenate([allq, allq, allq])[: n_train + n_test]
    gt_D, gt_I = idx.exact_search(allq, max_topk)
    es = at.ErrorSys(idx, train_num=n_train + n_test, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_train, allq)
    es.set_topk(10)
    acc = np.full(n_train + n_test, 0.9, np.float32)
    es.set_queries(n_test, allq, acc)
    es.set_hyper(4.0, 1.0)

    es.dense_cut = None
    Dg, Ig = es.search(n_train, n_test)
    nsg = es.n_scanned[n_train:n_train + n_test].copy()
    es.dense_cut = 0.0          # force the dense branch
    Dd, Id = es.search(n_train, n_test)
    nsd = es.n_scanned[n_train:n_train + n_test].copy()

    _assert_same_results(Dg, Ig, Dd, Id, es.query_topk)
    # decisions are made BEFORE the tail: identical budgets either way
    np.testing.assert_array_equal(nsg, nsd)


def test_xover_threshold_picks_gather_for_small_budgets():
    """Below the traffic threshold the cond must take the gather branch:
    same plan (crossover compiled in), tiny budgets, results identical to
    the crossover-free plan."""
    idx, xq = _mk("f32")
    mr = idx.multirow
    rpl = np.asarray(mr.rows_per_list)
    k = 10
    probes = np.full(xq.shape[0], 2)
    p_off = plan_oneshot(rpl, idx.nlist)
    p_hi = plan_oneshot(rpl, idx.nlist, dense_cut=1e6)  # never trips
    q = jnp.asarray(xq)
    npb = jnp.asarray(probes, jnp.int32)
    vg, ig, _ = [np.asarray(x) for x in nprobe_search_mr(
        idx.arrays, mr, q, npb, k, idx.metric, p_off)]
    vh, ih, _ = [np.asarray(x) for x in nprobe_search_mr(
        idx.arrays, mr, q, npb, k, idx.metric, p_hi)]
    np.testing.assert_array_equal(vg, vh)
    np.testing.assert_array_equal(ig, ih)


def test_dense_merge_buffering_matches_single():
    """merge_blocks > 1 (wider, fewer exact merges) is value-identical."""
    idx, xq = _mk("sq8")
    mr = idx.multirow
    rpl = np.asarray(mr.rows_per_list)
    k = 15
    probes = np.full(xq.shape[0], idx.nlist)
    q = jnp.asarray(xq)
    npb = jnp.asarray(probes, jnp.int32)
    outs = []
    for dm, db in [(1, 16), (4, 16), (1, 64)]:
        p = plan_oneshot(rpl, idx.nlist, dense_cut=0.0,
                         dense_block=db, dense_merge=dm)
        v, i, _ = nprobe_search_mr(idx.arrays, mr, q, npb, k, idx.metric,
                                   p)
        outs.append((np.asarray(v), np.asarray(i)))
    for v, i in outs[1:]:
        np.testing.assert_allclose(v, outs[0][0], rtol=1e-5, atol=1e-5)


def test_index_search_dense_matches_gather():
    """IVFFlatIndex.search's host-decided crossover: same results as the
    gather engine at the same nprobe."""
    idx, xq = _mk("sq8")
    k = 10
    idx.dense_cut = None
    vg, ig = idx.search(xq, k, nprobe=idx.nlist)
    idx.dense_cut = 0.0          # force dense for any batch
    vd, idn = idx.search(xq, k, nprobe=idx.nlist)
    _assert_same_results(vg, ig, vd, idn, k)
    idx.dense_cut = 1e9          # never
    vh, ih = idx.search(xq, k, nprobe=idx.nlist)
    np.testing.assert_array_equal(vg, vh)


@pytest.mark.parametrize("storage", ["f32", "sq8"])
def test_dense_stage_snapshots_exact(storage):
    """One shared corpus pass must reproduce, for every decision stage,
    the exact top-k values over each query's first `stage` ranked lists
    (numpy brute force on the decoded corpus, kernel-envelope rtol)."""
    import jax
    from auncel_tpu.index.scan import dense_stage_snapshots, coarse_rank
    from auncel_tpu.ops.distance import sqnorms

    idx, xq = _mk(storage, nb=6000)
    mr = idx.multirow
    nlist = idx.nlist
    stages = (1, 2, 4)                    # cap_stage = 32 // 8
    k = 25
    q = jnp.asarray(xq)
    q_sq = sqnorms(q)
    _, cids = coarse_rank(idx.arrays, q, idx.metric, q_sq=q_sq)
    cids = np.asarray(cids)
    B = xq.shape[0]
    cap_stage = stages[-1]
    inv_rank = np.full((B, nlist), nlist, np.int32)
    for b in range(B):
        inv_rank[b, cids[b, :cap_stage]] = np.arange(cap_stage)
    snaps = np.asarray(dense_stage_snapshots(
        mr.rows, mr.row_list, jnp.asarray(inv_rank), q, q_sq, stages, k,
        idx.metric, block_rows=7))       # odd block size: clamp/dedup path

    # brute force on the decoded rows (same codec the kernel reads)
    rows = np.asarray(mr.rows.decode_block(mr.rows.db))
    vec_ids = np.asarray(mr.rows.vec_ids)
    row_list = np.asarray(mr.row_list)
    flat = rows.reshape(-1, idx.d)
    flat_list = np.repeat(row_list, rows.shape[1])
    flat_ok = (vec_ids.reshape(-1) >= 0) & (flat_list >= 0)
    for b in range(min(B, 12)):
        d2 = ((flat - xq[b]) ** 2).sum(axis=1)
        ranks = np.where(flat_list >= 0, inv_rank[b][np.maximum(
            flat_list, 0)], nlist)
        for j, s in enumerate(stages):
            cand = np.sort(d2[flat_ok & (ranks < s)])[:k]
            got = snaps[b, j, : cand.size]
            np.testing.assert_allclose(got, cand, rtol=1e-4, atol=1e-4)
            assert np.isinf(snaps[b, j, cand.size:]).all()


@pytest.mark.parametrize("storage", ["f32", "sq8"])
def test_dense_decide_matches_wave_engine(storage):
    """dense_decide serves the decision ladder from one shared pass: on
    this fixed seed every decision (n_scanned) matches the gather waves,
    and results match to the dense kernel envelope."""
    idx, xq = _mk(storage)
    n_train, n_test, max_topk = 122, 48, 40
    allq = np.concatenate([
        xq, xq[np.random.RandomState(1).permutation(48)]
        + 0.1 * np.random.RandomState(2).randn(48, idx.d).astype(
            np.float32)])
    allq = np.concatenate([allq, allq, allq])[: n_train + n_test]
    gt_D, gt_I = idx.exact_search(allq, max_topk)
    es = at.ErrorSys(idx, train_num=n_train + n_test, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_train, allq)
    es.set_topk(10)
    acc = np.full(n_train + n_test, 0.9, np.float32)
    es.set_queries(n_test, allq, acc)
    es.set_hyper(4.0, 1.0)

    es.dense_cut = 0.0            # keep the serve path identical (dense)
    Dg, Ig = es.search(n_train, n_test)
    nsg = es.n_scanned[n_train:n_train + n_test].copy()
    es.dense_decide = True        # flip ONLY the decide phase
    Dd, Id = es.search(n_train, n_test)
    nsd = es.n_scanned[n_train:n_train + n_test].copy()

    np.testing.assert_array_equal(nsg, nsd)
    _assert_same_results(Dg, Ig, Dd, Id, es.query_topk)


def test_dense_stage_snapshots_ip_metric():
    """IP ordering (higher is better, -inf padding) through the snapshot
    kernel: brute force per stage on normalized vectors."""
    from auncel_tpu.index.scan import dense_stage_snapshots, coarse_rank
    from auncel_tpu.ops.distance import sqnorms

    rng = np.random.RandomState(11)
    d, nlist, nb = 16, 32, 4000
    xb = rng.randn(nb, d).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    idx = IVFFlatIndex(d, nlist, metric=Metric.IP)
    idx.train(xb)
    idx.add(xb)
    idx.enable_multirow(row_cap=32)
    mr = idx.multirow
    xq = xb[rng.choice(nb, 8)] + 0.05 * rng.randn(8, d).astype(np.float32)
    xq = (xq / np.linalg.norm(xq, axis=1, keepdims=True)).astype(
        np.float32)
    stages, k = (1, 2, 4), 12
    q = jnp.asarray(xq)
    q_sq = sqnorms(q)
    _, cids = coarse_rank(idx.arrays, q, idx.metric, q_sq=q_sq)
    cids = np.asarray(cids)
    B = xq.shape[0]
    inv_rank = np.full((B, nlist), nlist, np.int32)
    for b in range(B):
        inv_rank[b, cids[b, : stages[-1]]] = np.arange(stages[-1])
    snaps = np.asarray(dense_stage_snapshots(
        mr.rows, mr.row_list, jnp.asarray(inv_rank), q, q_sq, stages, k,
        idx.metric, block_rows=9))
    rows = np.asarray(mr.rows.decode_block(mr.rows.db))
    vec_ids = np.asarray(mr.rows.vec_ids)
    row_list = np.asarray(mr.row_list)
    flat = rows.reshape(-1, d)
    flat_list = np.repeat(row_list, rows.shape[1])
    flat_ok = (vec_ids.reshape(-1) >= 0) & (flat_list >= 0)
    for b in range(B):
        ips = flat @ xq[b]
        ranks = np.where(flat_list >= 0,
                         inv_rank[b][np.maximum(flat_list, 0)], nlist)
        for j, s in enumerate(stages):
            cand = np.sort(ips[flat_ok & (ranks < s)])[::-1][:k]
            got = snaps[b, j, : cand.size]
            np.testing.assert_allclose(got, cand, rtol=1e-4, atol=1e-5)
            assert np.isneginf(snaps[b, j, cand.size:]).all()


def test_dense_decide_stream_matches_oneshot():
    """search_stream over dense_decide windows == looping search() over
    the SAME windows (the documented stream contract). NOTE the dense
    kernels' einsum values are stable only per window SHAPE — unlike the
    gather engine, different paddings can move values within the fp
    envelope (and flip a knife-edge decision), so the comparison pins the
    window size on both sides."""
    idx, xq = _mk("f32")
    n_train, n_test, max_topk = 122, 48, 40
    allq = np.concatenate([xq, xq, xq, xq])[: n_train + n_test]
    gt_D, gt_I = idx.exact_search(allq, max_topk)
    es = at.ErrorSys(idx, train_num=n_train + n_test, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_train, allq)
    es.set_topk(10)
    acc = np.full(n_train + n_test, 0.9, np.float32)
    es.set_queries(n_test, allq, acc)
    es.set_hyper(4.0, 1.0)
    es.dense_cut = 0.0
    es.dense_decide = True
    w = 16
    outs = [es.search(n_train + o, min(w, n_test - o))
            for o in range(0, n_test, w)]
    D1 = np.concatenate([o[0] for o in outs])
    I1 = np.concatenate([o[1] for o in outs])
    ns1 = es.n_scanned[n_train:n_train + n_test].copy()
    D2, I2 = es.search_stream(n_train, n_test, window=w)
    ns2 = es.n_scanned[n_train:n_train + n_test].copy()
    np.testing.assert_array_equal(D1, D2)
    np.testing.assert_array_equal(I1, I2)
    np.testing.assert_array_equal(ns1, ns2)


def test_dense_decide_forced_floor_is_full_scan():
    """A tiny multipler floors every forced decision to a FULL scan in the
    gather engine (terminate-later invariant); the dense replay must keep
    that floor."""
    idx, xq = _mk("f32")
    mr = idx.multirow
    rpl = np.asarray(mr.rows_per_list)
    n_train, n_test, max_topk = 122, 48, 40
    allq = np.concatenate([xq, xq, xq, xq])[: n_train + n_test]
    gt_D, gt_I = idx.exact_search(allq, max_topk)
    es = at.ErrorSys(idx, train_num=n_train + n_test, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_train, allq)
    es.set_topk(10)
    # an impossible bound + vanishing multipler: every query reaches the
    # forced stage and must floor to nlist, not to floor(stage * m) == 0
    acc = np.full(n_train + n_test, 0.999999, np.float32)
    es.set_queries(n_test, allq, acc)
    es.set_hyper(1e-6, 12.0)
    plan = plan_oneshot(rpl, idx.nlist, dense_cut=0.0, dense_decide=True)
    out = bounded_oneshot_mr(
        idx.arrays, mr, es.traces, jnp.asarray(allq[n_train:]),
        jnp.asarray(acc[n_train:]), jnp.float32(es.multipler),
        jnp.float32(es.std_m), jnp.zeros(n_test, jnp.float32),
        es.query_topk, es.max_topk, idx.metric, plan)
    my_np, n_scanned = np.asarray(out[2]), np.asarray(out[3])
    assert (n_scanned[my_np == idx.nlist] == idx.nlist).all()
    assert (n_scanned >= 1).all()


def test_mixed_routing_matches_gather():
    """Per-query routing: a batch where only SOME queries cross the cut
    must return, for every query, the same results as the all-gather
    plan (dense-served and gather-served queries coexist in one batch)."""
    idx, xq = _mk("f32")
    mr = idx.multirow
    rpl = np.asarray(mr.rows_per_list)
    k = 10
    probes = np.where(np.arange(xq.shape[0]) % 3 == 0, idx.nlist, 2)
    p_off = plan_oneshot(rpl, idx.nlist)
    p_mix = plan_oneshot(rpl, idx.nlist, dense_cut=0.5)   # only monsters
    q = jnp.asarray(xq)
    npb = jnp.asarray(probes, jnp.int32)
    vg, ig, _ = [np.asarray(x) for x in nprobe_search_mr(
        idx.arrays, mr, q, npb, k, idx.metric, p_off)]
    vm, im, _ = [np.asarray(x) for x in nprobe_search_mr(
        idx.arrays, mr, q, npb, k, idx.metric, p_mix)]
    # gather-routed queries (budget 2 lists) must be BITWISE identical;
    # dense-routed ones match to the kernel envelope
    small = probes == 2
    np.testing.assert_array_equal(vm[small], vg[small])
    np.testing.assert_array_equal(im[small], ig[small])
    _assert_same_results(vg[~small], ig[~small], vm[~small], im[~small],
                         k)
