"""Component timings with scalar (sum-reduced) outputs: compute cannot be
DCE'd (full reduction) and the fetch is 4 bytes, so per-call time =
dispatch overhead + device compute."""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import auncel_tpu as at
from auncel_tpu.types import Metric
from auncel_tpu.index.scan import coarse_rank, scan_probe_range
from auncel_tpu.index.multirow import expand_probes
from auncel_tpu.ops.topk import init_topk, topk_scores
from auncel_tpu.ops.distance import sqnorms, pairwise_scores
from auncel_tpu.profile.bounded_mr import bounded_search_decide_mr, plan_mr_waves
from auncel_tpu.profile.bounded import bounded_search_decide

NB, D, NLIST, B = 1_000_000, 128, 1024, 1024

def timed(fn, reps=8):
    fn(); t0=time.perf_counter()
    outs=[fn() for _ in range(reps)]
    for o in outs: np.asarray(o)
    return (time.perf_counter()-t0)/reps*1e3

def main():
    cache = os.environ.get("BENCH_CACHE", ".bench_cache")
    with np.load(os.path.join(cache, f"ds_{NB}_{D}_v3.npz")) as z:
        xb, xq = z["xb"], z["xq"]
    idx = at.IVFFlatIndex(D, NLIST)
    idx.set_centroids(np.load(os.path.join(cache, f"centroids_{NB}_{D}_{NLIST}_v4.npy")))
    idx.add(xb); _ = idx.arrays
    mr = idx.enable_multirow(); arrays = idx.arrays
    gt_D, gt_I = idx.exact_search(xq[:500], 100, batch=500)
    es = at.ErrorSys(idx, train_num=2000, max_topk=100)
    es.set_gt(gt_D, gt_I); es.sys_train(500, xq[:500]); es.set_topk(10)
    q = jnp.asarray(xq[:B].astype(np.float32))
    acc = jnp.full((B,), 0.9, jnp.float32); q_sq = sqnorms(q)
    rpl = np.asarray(mr.rows_per_list)
    plan = plan_mr_waves(rpl, NLIST, decide_only=True)
    mult, sm = jnp.float32(3.71), jnp.float32(1.0)

    noop = jax.jit(lambda x: (x*1.0001).sum())
    print(f"I. dispatch+fetch floor:     {timed(lambda: noop(q_sq)):8.1f} ms", flush=True)

    f = jax.jit(lambda *a: sum(x.sum() for x in bounded_search_decide_mr(*a, 10, 100, Metric.L2, plan)[:4]))
    print(f"A. decide-only mr:           {timed(lambda: f(arrays, mr, es.traces, q, acc, mult, sm)):8.1f} ms", flush=True)
    f = jax.jit(lambda *a: sum(x.sum() for x in bounded_search_decide(*a, 10, 100, Metric.L2)[:4]))
    print(f"B. decide-only padded:       {timed(lambda: f(arrays, es.traces, q, acc, mult, sm)):8.1f} ms", flush=True)

    f = jax.jit(lambda a, qq, qs: sum(x.sum() for x in coarse_rank(a, qq, Metric.L2, q_sq=qs, rank_k=147)))
    print(f"C. coarse_rank(147):         {timed(lambda: f(arrays, q, q_sq)):8.1f} ms", flush=True)
    cdis, cids = coarse_rank(arrays, q, Metric.L2, q_sq=q_sq, rank_k=147)

    f = jax.jit(lambda a, qq, qs: pairwise_scores(qq, a.centroids, Metric.L2, y_sqnorms=a.cent_sq, x_sqnorms=qs).sum())
    print(f"C1. pairwise 1024x1024:      {timed(lambda: f(arrays, q, q_sq)):8.1f} ms", flush=True)

    f = jax.jit(lambda m, c: sum(x.sum() for x in expand_probes(m, c, plan.S, plan.out_slots)))
    print(f"D. expand_probes:            {timed(lambda: f(mr, cids)):8.1f} ms", flush=True)
    row_slots, offsets = expand_probes(mr, cids, plan.S, plan.out_slots)
    safe_rows = jnp.maximum(row_slots, 0)
    vals, ids = init_topk((B,), 100, Metric.L2)
    frontier = jnp.zeros((B,), jnp.int32)

    for width in (8, 64, 357):
        limit = jnp.full((B,), width, jnp.int32)
        f = jax.jit(lambda a, qq, qs, sl, v, i, lim, st, w=width: sum(
            x.sum() for x in scan_probe_range(a, qq, qs, sl, v, i, lim, st, w, Metric.L2)))
        t = timed(lambda: f(mr.rows, q, q_sq, safe_rows, vals, ids, limit, frontier))
        gb = B*width*256*D*4/1e9
        print(f"E. mr scan w={width:4d}:          {t:8.1f} ms ({gb/(t/1e3):6.1f} GB/s)", flush=True)

    cids_full = coarse_rank(arrays, q, Metric.L2, q_sq=q_sq)[1]
    zero = jnp.zeros((B,), jnp.int32)
    for width in (8, 64):
        limit = jnp.full((B,), width, jnp.int32)
        f = jax.jit(lambda a, qq, qs, sl, v, i, lim, st, w=width: sum(
            x.sum() for x in scan_probe_range(a, qq, qs, sl, v, i, lim, st, w, Metric.L2)))
        t = timed(lambda: f(arrays, q, q_sq, cids_full, vals, ids, limit, zero))
        gb = B*width*arrays.cap*D*4/1e9
        print(f"F. padded scan w={width:4d}:      {t:8.1f} ms ({gb/(t/1e3):6.1f} GB/s)", flush=True)

    big = jnp.asarray(np.random.RandomState(0).rand(B, 100+8*256).astype(np.float32))
    bigi = jnp.broadcast_to(jnp.arange(big.shape[1], dtype=jnp.int32)[None], big.shape)
    f = jax.jit(lambda x, i: sum(y.sum() for y in topk_scores(x, i, 100, Metric.L2)))
    print(f"G. topk merge 2148->100:     {timed(lambda: f(big, bigi)):8.1f} ms", flush=True)
    f = jax.jit(lambda x, i: sum(y.sum() for y in topk_scores(x, i, 100, Metric.L2)))
    big2 = big[:, :100+357]; bigi2 = bigi[:, :100+357]
    print(f"G2. topk merge 457->100:     {timed(lambda: f(big2, bigi2)):8.1f} ms", flush=True)
if __name__ == "__main__":
    main()
