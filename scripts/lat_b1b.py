"""Batch-1 device-cost BREAKDOWN at 10M (round-5, follow-up to lat_b1).

lat_b1 showed the thinned-ladder plan still ~5 ms device behind ELP at
10M despite scanning ~5x fewer rows — so the gap is machinery, not scan.
This times the jitted sub-programs separately at batch 1:

  coarse        coarse_rank over all 1024 centroids
  expandFull    + expand_probes over S=nlist (out_slots = all rows)
  expandCap     + expand_probes over S=nlist/8 only (decide window)
  decideOnly    the decide phase alone (plan_mr_waves decide_only)
  fixed34       multirow_search_fixed at nprobe=34 (the mean decided
                budget — the "serve if the budget were known" floor)
  fixed256      the ELP arm for reference
  latency       the full plan_latency program

Every number includes the ~31.6 ms dispatch floor; compare DIFFERENCES.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.eval_harness import common
from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.profile.bounded_mr import (
    plan_latency, plan_mr_waves, bounded_search_mr, bounded_search_decide_mr)
from auncel_tpu.index.scan import coarse_rank
from auncel_tpu.index.multirow import expand_probes, multirow_search_fixed
from auncel_tpu.ops.distance import sqnorms

T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:8.1f} s] {m}", file=sys.stderr, flush=True)


def timed(fn, n=15):
    fn()  # warm/compile
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main(db="synthDeep10M", ts=3000, storage="sq8", mult=8.14, std_m=12.0):
    data = common.load_dataset(db, nq=int(ts) + 1000)
    idx = common.build_or_load_index(data, nlist=1024, storage=storage)
    idx.enable_multirow()
    gt_D, gt_I = common.ensure_gt(data, idx, 100)
    es = ErrorSys(idx, train_num=int(ts) + 1000, max_topk=100)
    es.set_gt(gt_D, gt_I)
    es.sys_train(1000, data.xq)
    es.set_topk(10)
    log("setup done")
    mr = idx.multirow
    arrays = idx.arrays
    metric = idx.metric
    nlist = idx.nlist
    rpl = np.asarray(jax.device_get(mr.rows_per_list))
    q = jnp.asarray(data.xq[ts:ts + 1])
    acc = jnp.full((1,), 0.9, jnp.float32)
    z = jnp.zeros((1,), jnp.float32)

    @jax.jit
    def coarse(q):
        return coarse_rank(arrays, q, metric, q_sq=sqnorms(q))

    n_rows = int(rpl.sum())
    top = np.sort(rpl)[::-1]
    cap_out = int(top[: nlist // 8].sum())

    @jax.jit
    def expand_full(q):
        _, cids = coarse_rank(arrays, q, metric, q_sq=sqnorms(q))
        return expand_probes(mr, cids, nlist, n_rows)

    @jax.jit
    def expand_cap(q):
        _, cids = coarse_rank(arrays, q, metric, q_sq=sqnorms(q))
        return expand_probes(mr, cids, nlist // 8, cap_out)

    dec_plan = plan_mr_waves(rpl, nlist, decide_only=True, exact_cover=True,
                             min_decide_stage=4)

    def decide_only():
        out, _ = bounded_search_decide_mr(
            arrays, mr, es.traces, q, acc, jnp.float32(mult),
            jnp.float32(std_m), 10, 100, metric, dec_plan)
        jax.device_get(out[2])

    lat_plan = plan_latency(rpl, nlist, decide_stages=(4, 16, 64),
                            serve_base=64)

    def lat():
        out = bounded_search_mr(
            arrays, mr, es.traces, q, acc, jnp.float32(mult),
            jnp.float32(std_m), z, 10, 100, metric, lat_plan)
        jax.device_get(out[0])

    def fixed(nprobe):
        out_slots = idx._mr_out_slots(nprobe)
        out = multirow_search_fixed(mr, q, 10, nprobe, out_slots, metric)
        jax.device_get(out[0])

    log(f"coarse       {timed(lambda: jax.device_get(coarse(q)[0])):7.2f} ms")
    log(f"expandFull   {timed(lambda: jax.device_get(expand_full(q)[0])):7.2f} ms")
    log(f"expandCap    {timed(lambda: jax.device_get(expand_cap(q)[0])):7.2f} ms")
    log(f"decideOnly   {timed(decide_only):7.2f} ms")
    log(f"fixed34      {timed(lambda: fixed(34)):7.2f} ms")
    log(f"fixed128     {timed(lambda: fixed(128)):7.2f} ms")
    log(f"fixed256     {timed(lambda: fixed(256)):7.2f} ms")
    log(f"latencyPlan  {timed(lat):7.2f} ms")


if __name__ == "__main__":
    main(*sys.argv[1:])
