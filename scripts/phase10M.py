"""Phase-split timing + dense-decide measurement on the unprunable 10M
corpus (round-4 VERDICT #2 follow-through).

Xover_synthDeep10Mw showed the dense TAIL crossover lifts the r3 gather
engine 30.8 -> 116.5 qps with the block/merge sweep flat — evidence the
residual cost is the DECIDE phase (A1/A2 gather up to nlist/8 ranked
lists per query, full batch) rather than the dense pass. This script
measures that directly on the real chip:

  1. decide-only wall clock of the gather wave ladder
     (bounded_search_decide_mr over the full decide window),
  2. one shared masked_full_scan pass at target=nlist (the dense-serve
     unit cost),
  3. one dense_stage_snapshots pass (the dense-decide unit cost) at
     several block sizes,
  4. end-to-end bounded serving with dense_decide OFF vs ON (bound
     re-checked held-out, disjoint P0 protocol),
  5. the raw MXU einsum ceiling at the same contraction shape
     (scripts/mxu_sol.py inline) — the speed-of-light denominator.

Writes PhaseSplit_synthDeep10Mw.log (one JSON row per measurement).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.profile.bounded_mr import (
    plan_mr_waves, bounded_search_decide_mr)
from auncel_tpu.index.scan import masked_full_scan, dense_stage_snapshots
from auncel_tpu.index.scan import coarse_rank
from auncel_tpu.ops.distance import sqnorms
from auncel_tpu.profile.bounded import wave_boundaries
from auncel_tpu.profile.geometry import n_boundaries
from auncel_tpu.eval_harness import common

T0 = time.time()
LOG = "PhaseSplit_synthDeep10Mw.log"


def log(m):
    print(f"[{time.time() - T0:8.1f} s] {m}", file=sys.stderr, flush=True)


def emit(row):
    log(json.dumps(row))
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.tree_util.tree_map(np.asarray, out)   # axon: force a real sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.perf_counter() - t0) / reps


def main():
    db, k, eps = "synthDeep10Mw", 10, 0.10
    n_prof, n_cal, n_eval = 1000, 2000, 1000
    nq = n_prof + n_cal + n_eval
    ts, ses = n_prof + n_cal, n_eval
    data = common.load_dataset(db, nq=nq)
    idx = common.build_or_load_index(data, nlist=1024, storage="sq8")
    idx.enable_multirow()
    gt_D, gt_I = common.ensure_gt(data, idx, 100)
    log("index + gt ready")
    es = ErrorSys(idx, train_num=nq, max_topk=100)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_prof, data.xq)
    es.set_topk(k)
    acc = np.full(nq, 1.0 - eps, np.float32)
    es.set_queries(nq, data.xq, acc)
    es.calibrate(n_prof, n_cal, target_bound=1.0 - eps)
    log(f"calibrated ({es.multipler:.2f}, {es.std_m:g})")
    open(LOG, "w").close()

    mr = idx.multirow
    nlist = idx.nlist
    B = 1024
    # Unit-cost phases (1-3) are timing-only: the eval slice has just
    # n_eval=1000 queries (< B), so time on the head of the query set —
    # phase cost is shape-, not value-, determined.
    q = jnp.asarray(data.xq[:B])
    q_sq = sqnorms(q)
    accB = jnp.asarray(acc[:B])          # uniform 1-eps; must match q's B
    rpl = np.asarray(mr.rows_per_list)
    R, cap = np.asarray(mr.rows.vec_ids).shape

    # --- 1. gather decide ladder, full batch -------------------------
    dplan = plan_mr_waves(rpl, nlist, decide_only=True, exact_cover=True)
    t = timed(bounded_search_decide_mr, idx.arrays, mr, es.traces, q,
              accB, jnp.float32(es.multipler), jnp.float32(es.std_m),
              k, es.max_topk, idx.metric, dplan, reps=2)
    emit(dict(what="gather_decide_full_batch", B=B, seconds=round(t, 3)))

    # --- 2. one dense SERVE pass (masked_full_scan, target = nlist) --
    sub = 256
    _, cids_full = coarse_rank(idx.arrays, q[:sub], idx.metric,
                               q_sq=q_sq[:sub])
    inv_full = jnp.argsort(cids_full, axis=1).astype(jnp.int32)
    tgt = jnp.full((sub,), nlist, jnp.int32)
    mfs = jax.jit(masked_full_scan,
                  static_argnames=("k", "metric", "block_rows",
                                   "merge_blocks"))
    for blk in (256, 512):
        t = timed(mfs, mr.rows, mr.row_list, inv_full, tgt, q[:sub],
                  q_sq[:sub], es.max_topk, idx.metric, blk, 1, reps=3)
        emit(dict(what="dense_serve_pass", B=sub, block=blk,
                  seconds=round(t, 3),
                  corpus_GBps=round(R * cap * idx.d / t / 1e9, 1)))

    # --- 3. one dense DECIDE pass (dense_stage_snapshots) ------------
    cap_stage = max(nlist // 8, 1)
    stages = tuple(b for b in wave_boundaries(nlist) if b <= cap_stage)
    rank_k = min(nlist, max(cap_stage, n_boundaries(nlist) + 1))
    _, cids = coarse_rank(idx.arrays, q, idx.metric, q_sq=q_sq,
                          rank_k=rank_k)
    binx = jnp.arange(B, dtype=jnp.int32)[:, None]
    win = jnp.broadcast_to(
        jnp.arange(cap_stage, dtype=jnp.int32)[None], (B, cap_stage))
    inv_rank = jnp.full((B, nlist), nlist, jnp.int32).at[
        binx, cids[:, :cap_stage]].set(win)
    dss = jax.jit(dense_stage_snapshots,
                  static_argnames=("stages", "k", "metric", "block_rows"))
    for blk in (128, 256, 512):
        t = timed(dss, mr.rows, mr.row_list, inv_rank, q, q_sq, stages,
                  es.max_topk, idx.metric, blk, reps=3)
        emit(dict(what="dense_decide_pass", B=B, block=blk,
                  seconds=round(t, 3),
                  corpus_GBps=round(R * cap * idx.d / t / 1e9, 1)))

    # --- 4. end-to-end serving, bound re-checked held-out ------------
    def cell(tag, dd, decide_block=128):
        es.dense_auto = False   # sweep measures EXPLICIT routings only
        es.dense_cut = 0.25
        es.dense_decide = dd
        es.plan_overrides = (dict(decide_block=decide_block)
                             if decide_block != 128 else {})
        es.search(ts, ses)                # compile + warm
        t1 = time.perf_counter()
        D, I = es.search(ts, ses)
        one = ses / (time.perf_counter() - t1)
        t1 = time.perf_counter()
        es.search_stream(ts, ses)
        st = ses / (time.perf_counter() - t1)
        ok, minf = common.check_bound(D, gt_D[ts:], k, eps, data.metric)
        emit(dict(what="serve", config=tag, dense_decide=dd,
                  decide_block=decide_block, oneshot_qps=round(one, 1),
                  stream_qps=round(st, 1), min_recall=round(minf, 4),
                  bound_ok=bool(ok),
                  mean_scan=round(float(es.n_scanned[ts:nq].mean()), 1)))

    cell("gather decide (r4 engine)", False)
    cell("dense decide b128", True, 128)
    cell("dense decide b256", True, 256)
    cell("dense decide b512", True, 512)

    # --- 5. MXU speed of light at the dense contraction shape --------
    rng = np.random.RandomState(0)
    for (bb, C) in ((1024, 128), (256, 512)):
        blk = jnp.asarray(rng.randn(C, cap, idx.d).astype(np.float32))
        qq = jnp.asarray(rng.randn(bb, idx.d).astype(np.float32))
        f = jax.jit(lambda blk, qq: jnp.einsum(
            "rcd,bd->brc", blk, qq,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
        t = timed(f, blk, qq, reps=20)
        flops = 2.0 * bb * C * cap * idx.d
        emit(dict(what="mxu_sol_highest", B=bb, block=C,
                  ms=round(t * 1e3, 3),
                  tflops=round(flops / t / 1e12, 1)))

    log("wrote " + LOG)


if __name__ == "__main__":
    main()
