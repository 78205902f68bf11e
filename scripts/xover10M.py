"""Dense-scan crossover measurement on the unprunable 10M corpus
(round-4 VERDICT #2).

synthDeep10Mw is round-3's p1 proxy: 39k overlapping clusters at d=96,
where the bound forces a mean decided scan of ~948/1024 lists — the
worst case for per-query gathers (30.7 qps in round 3, ~27 GB/s
effective vs the rowscan kernel's ~776 GB/s). The dense-scan crossover
serves the tail as ONE shared masked corpus pass; this script measures
the same bounded workload with the crossover off vs on (and sweeps the
dense block/merge shape), bound-checked every cell.

Writes Xover_synthDeep10Mw.log (one JSON row per cell).
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


def log(m):
    print(f"[{time.time() - T0:8.1f} s] {m}", file=sys.stderr, flush=True)


def main():
    db, k, eps = "synthDeep10Mw", 10, 0.10
    # Disjoint P0 protocol (same as bound10M / matrix10M): profile
    # [0:1000], calibrate [1000:3000], held-out eval [3000:4000] — the
    # first run of this script calibrated on profile-seen queries and
    # read min_recall 0.8 on every cell (traces are optimistic on the
    # queries they were fit to; Recal_synthDeep10M).
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

    results = []

    def cell(tag, xover, block=256, merge=1):
        es.dense_cut = xover
        es.plan_overrides = ({} if (block, merge) == (256, 1) else
                             dict(dense_block=block, dense_merge=merge))
        try:
            es.search(ts, ses)          # compile + warm
            t1 = time.perf_counter()
            D, I = es.search(ts, ses)
            one = ses / (time.perf_counter() - t1)
            t1 = time.perf_counter()
            es.search_stream(ts, ses)
            st = ses / (time.perf_counter() - t1)
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {e}")
            return
        ok, minf = common.check_bound(D, gt_D[ts:], k, eps, data.metric)
        row = dict(config=tag, dense_cut=xover, dense_block=block,
                   dense_merge=merge, oneshot_qps=round(one, 1),
                   stream_qps=round(st, 1), min_recall=round(minf, 4),
                   bound_ok=bool(ok),
                   mean_scan=round(float(es.n_scanned[ts:nq].mean()), 1))
        log(json.dumps(row))
        results.append(row)
        with open("Xover_synthDeep10Mw.log", "a") as f:
            f.write(json.dumps(row) + "\n")

    open("Xover_synthDeep10Mw.log", "w").close()
    cell("gather (r3 engine)", None)
    cell("dense default", 0.25)
    cell("dense block512", 0.25, block=512)
    cell("dense merge2", 0.25, block=256, merge=2)
    cell("dense block512 merge2", 0.25, block=512, merge=2)
    if results:
        base = results[0]["oneshot_qps"]
        best = max(r["oneshot_qps"] for r in results)
        log(f"speedup vs gather: {best / base:.1f}x "
            f"({base} -> {best} qps)")
    log("wrote Xover_synthDeep10Mw.log")


if __name__ == "__main__":
    main()
