"""Profile the bounded-search hot path on the TPU: which stage dominates?

Reuses the bench cache (dataset + centroids) so setup is fast. Axon's
block_until_ready is a no-op and every fetch pays ~40 ms tunnel RTT, so
timings queue ``reps`` async dispatches and fetch ONE tiny result at the
end — the device queue serializes execution, so elapsed/reps is the real
per-call device time (+RTT/reps).
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import auncel_tpu as at
from auncel_tpu.types import Metric
from auncel_tpu.index.scan import coarse_rank, scan_probe_range
from auncel_tpu.index.multirow import expand_probes
from auncel_tpu.ops.topk import init_topk, topk_scores
from auncel_tpu.ops.distance import sqnorms
from auncel_tpu.profile.bounded_mr import (
    bounded_search_decide_mr, plan_mr_waves)
from auncel_tpu.profile.bounded import bounded_search_decide

NB, D, NLIST = 1_000_000, 128, 1024
B = 1024


def timed(fn, reps=8):
    out = fn()                      # warm / compile
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for o in outs:
        np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cache = os.environ.get("BENCH_CACHE", ".bench_cache")
    with np.load(os.path.join(cache, f"ds_{NB}_{D}_v3.npz")) as z:
        xb, xq = z["xb"], z["xq"]
    idx = at.IVFFlatIndex(D, NLIST)
    idx.set_centroids(np.load(
        os.path.join(cache, f"centroids_{NB}_{D}_{NLIST}_v4.npy")))
    idx.add(xb)
    _ = idx.arrays
    mr = idx.enable_multirow()
    arrays = idx.arrays
    print(f"cap={arrays.cap} rows={mr.rows.db.shape}", flush=True)

    gt_D, gt_I = idx.exact_search(xq[:500], 100, batch=500)
    es = at.ErrorSys(idx, train_num=2000, max_topk=100)
    es.set_gt(gt_D, gt_I)
    es.sys_train(500, xq[:500])
    es.set_topk(10)

    q = jnp.asarray(xq[:B].astype(np.float32))
    acc = jnp.full((B,), 0.9, jnp.float32)
    q_sq = sqnorms(q)
    rpl = np.asarray(mr.rows_per_list)
    plan = plan_mr_waves(rpl, NLIST, decide_only=True)
    print(f"decide plan: {len(plan.waves)} waves, S={plan.S}, "
          f"out_slots={plan.out_slots}", flush=True)

    mult, sm = jnp.float32(3.71), jnp.float32(1.0)

    t = timed(lambda: bounded_search_decide_mr(
        arrays, mr, es.traces, q, acc, mult, sm, 10, 100, Metric.L2, plan))
    print(f"A. decide-only mr total:      {t:8.1f} ms", flush=True)

    t = timed(lambda: bounded_search_decide(
        arrays, es.traces, q, acc, mult, sm, 10, 100, Metric.L2))
    print(f"B. decide-only padded total:  {t:8.1f} ms", flush=True)

    rank_k = 147
    cr = jax.jit(lambda a, qq, qs: coarse_rank(a, qq, Metric.L2, q_sq=qs,
                                               rank_k=rank_k))
    t = timed(lambda: cr(arrays, q, q_sq))
    print(f"C. coarse_rank(147):          {t:8.1f} ms", flush=True)
    cdis, cids = cr(arrays, q, q_sq)

    # the pieces of coarse_rank
    from auncel_tpu.ops.distance import pairwise_scores
    ps = jax.jit(lambda a, qq, qs: pairwise_scores(
        qq, a.centroids, Metric.L2, y_sqnorms=a.cent_sq, x_sqnorms=qs))
    t = timed(lambda: ps(arrays, q, q_sq))
    print(f"C1. pairwise [1024,1024]:     {t:8.1f} ms", flush=True)
    sc = ps(arrays, q, q_sq)
    ii = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
    tk = jax.jit(lambda s, i: topk_scores(s, i, rank_k, Metric.L2))
    t = timed(lambda: tk(sc, ii))
    print(f"C2. topk(147 of 1024):        {t:8.1f} ms", flush=True)

    exp = jax.jit(lambda m, c: expand_probes(m, c, plan.S, plan.out_slots))
    t = timed(lambda: exp(mr, cids))
    print(f"D. expand_probes:             {t:8.1f} ms", flush=True)
    row_slots, offsets = exp(mr, cids)
    safe_rows = jnp.maximum(row_slots, 0)

    vals, ids = init_topk((B,), 100, Metric.L2)
    frontier = jnp.zeros((B,), jnp.int32)

    def mk_scan(rows_arr, slots, width, start):
        return jax.jit(lambda a, qq, qs, sl, v, i, lim, st: scan_probe_range(
            a, qq, qs, sl, v, i, lim, st, width, Metric.L2))

    for width in (8, 64, 357):
        limit = jnp.full((B,), width, jnp.int32)
        f = mk_scan(mr.rows, safe_rows, width, frontier)
        t = timed(lambda: f(mr.rows, q, q_sq, safe_rows, vals, ids, limit,
                            frontier))
        gb = B * width * mr.rows.db.shape[1] * D * 4 / 1e9
        print(f"E. mr scan width={width:4d}:      {t:8.1f} ms "
              f"({gb / (t / 1e3):6.1f} GB/s eff)", flush=True)

    cids_full = coarse_rank(arrays, q, Metric.L2, q_sq=q_sq)[1]
    zero = jnp.zeros((B,), jnp.int32)
    for width in (8, 64):
        limit = jnp.full((B,), width, jnp.int32)
        f = mk_scan(arrays, cids_full, width, zero)
        t = timed(lambda: f(arrays, q, q_sq, cids_full, vals, ids, limit,
                            zero))
        gb = B * width * arrays.cap * D * 4 / 1e9
        print(f"F. padded scan width={width:4d}:  {t:8.1f} ms "
              f"({gb / (t / 1e3):6.1f} GB/s eff)", flush=True)

    big = jnp.asarray(
        np.random.RandomState(0).rand(B, 100 + 8 * 256).astype(np.float32))
    bigi = jnp.broadcast_to(
        jnp.arange(big.shape[1], dtype=jnp.int32)[None], big.shape)
    f = jax.jit(lambda x, i: topk_scores(x, i, 100, Metric.L2))
    t = timed(lambda: f(big, bigi))
    print(f"G. one topk merge (2148->100):{t:8.1f} ms", flush=True)

    from auncel_tpu.profile.trace import trace_lookup
    from auncel_tpu.profile.bounded import _simulate_cur_num
    from auncel_tpu.profile.geometry import boundary_distances, sum_angle

    @jax.jit
    def decision(tr, inter, vals, cdis, cids):
        dtb = boundary_distances(cdis, cids, inter, Metric.L2)
        phi = sum_angle(vals[:, :10], dtb, 7)
        U = trace_lookup(tr, 3, phi, sm)
        p = (jnp.arange(1, 11, dtype=jnp.float32)[None] * U) <= 10.0
        return _simulate_cur_num(p, p[:, -1], 10)

    t = timed(lambda: decision(es.traces, arrays.interdis, vals, cdis, cids))
    print(f"H. decision logic (1 wave):   {t:8.1f} ms", flush=True)

    # RTT floor: a no-op dispatch + fetch
    f = jax.jit(lambda x: x + 1.0)
    t = timed(lambda: f(q_sq))
    print(f"I. noop dispatch floor:       {t:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
