"""Dense serving sweep at the headline 1M scale (round 4).

bench.py's bounded_search_qps rides the gather engine at synth1M-class
shapes (r3: ~10.4k qps stream). The bytes model says a shared corpus
pass should win at batch 1024 whenever the mean decided scan exceeds
nlist/B (~1 list; synth1M means are ~5-10): per-batch gather traffic is
B x mean_scan lists vs ONE corpus read for the dense pass. This sweeps
the dense serve/decide cells on the eval-harness synth1M dataset with
the bound re-checked per cell (disjoint P0 protocol), mirroring
scripts/tune10M.py's dense section at the scale the driver benchmarks.

Writes Dense_synth1M.log (one JSON row per cell).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.eval_harness import common

T0 = time.time()
LOG = "Dense_synth1M.log"


def log(m):
    print(f"[{time.time() - T0:8.1f} s] {m}", file=sys.stderr, flush=True)


def main(db="synth1M"):
    k, eps = 10, 0.10
    n_prof, n_cal, n_eval = 1000, 2000, 1000
    nq = n_prof + n_cal + n_eval
    ts, ses = n_prof + n_cal, n_eval
    data = common.load_dataset(db, nq=nq)
    idx = common.build_or_load_index(data, nlist=1024)
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

    base_ns = None

    def cell(tag, cut, dd, ov):
        nonlocal base_ns
        es.dense_cut = cut
        es.dense_decide = dd
        es.plan_overrides = ov
        try:
            es.search(ts, ses)              # compile + warm
            t1 = time.perf_counter()
            D, I = es.search(ts, ses)
            one = ses / (time.perf_counter() - t1)
            ns = es.n_scanned[ts:nq].copy()
            t1 = time.perf_counter()
            es.search_stream(ts, ses)
            st = ses / (time.perf_counter() - t1)
            ok, minf = common.check_bound(D, gt_D[ts:], k, eps,
                                          data.metric)
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {e}")
            return
        if base_ns is None:
            base_ns = ns
        same = bool((ns == base_ns).all()) if not dd else None
        row = dict(config=tag, dense_cut=cut, dense_decide=dd, plan=ov,
                   oneshot_qps=round(one, 1), stream_qps=round(st, 1),
                   min_recall=round(minf, 4), bound_ok=bool(ok),
                   mean_scan=round(float(ns.mean()), 1),
                   decisions_invariant=same)
        log(json.dumps(row))
        with open(LOG, "a") as f:
            f.write(json.dumps(row) + "\n")

    cell("gather (shipped default)", 0.25, False, {})
    cell("dense serve cap1024", 0.0, False, dict(dense_cap=1024))
    cell("dense serve cap1024 blk512", 0.0, False,
         dict(dense_cap=1024, dense_block=512))
    cell("dense serve+decide cap1024", 0.0, True, dict(dense_cap=1024))
    cell("dense decide only", 0.25, True, {})
    log("wrote " + LOG)


if __name__ == "__main__":
    main(*sys.argv[1:])
