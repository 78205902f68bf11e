"""Full k x eps evaluation matrix at 10M scale (round-4 VERDICT #4).

The reference runs k in {10,50,100} x eps in {1%,5%,10%} per dataset
(/root/reference/Auncel/eval/run.sh:3-17). One process, one index, one
profile: each cell re-binds topk, calibrates on the 2000-query DISJOINT
calibration slice with the shipped calibrate() defaults (the P0 protocol
the round-4 recal study validated at 10M), then bound-checks 1000
held-out queries.

Writes Matrix_synthDeep10M.log (one JSON row per cell).
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


def main(db="synthDeep10M", storage="sq8"):
    n_prof, n_cal, n_eval = 1000, 2000, 1000
    nq = n_prof + n_cal + n_eval
    data = common.load_dataset(db, nq=nq)
    idx = common.build_or_load_index(data, nlist=1024, storage=storage)
    idx.enable_multirow()
    gt_D, gt_I = common.ensure_gt(data, idx, 100)
    log("index + gt ready")
    es = ErrorSys(idx, train_num=nq, max_topk=100)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_prof, data.xq)
    log("profile trained")
    e0 = n_prof + n_cal
    acc = np.zeros(nq, np.float32)
    results = []
    open(f"Matrix_{db}.log", "w").close()  # fresh log; rows append below
    for k in (10, 50, 100):
        es.set_topk(k)
        for eps in (0.10, 0.05, 0.01):
            target = 1.0 - eps
            acc[:] = target
            es.set_queries(nq, data.xq, acc)
            # P0 protocol (Recal_synthDeep10M: holds at 10M): 2000
            # DISJOINT calibration queries, shipped calibrate defaults
            es.calibrate(n_prof, n_cal, target_bound=target)
            es.search(e0, n_eval)       # warm
            t1 = time.perf_counter()
            D, I = es.search(e0, n_eval)
            dt = time.perf_counter() - t1
            ok, minf = common.check_bound(D, gt_D[e0:nq], k, eps,
                                          data.metric)
            row = dict(k=k, eps=eps,
                       multipler=round(float(es.multipler), 3),
                       std_m=float(es.std_m),
                       min_recall=round(minf, 4), bound_ok=bool(ok),
                       mean_scan=round(float(es.n_scanned[e0:nq].mean()),
                                       1),
                       qps=round(n_eval / dt, 1))
            log(json.dumps(row))
            results.append(row)
            # append incrementally: a timeout mid-matrix must not lose
            # finished cells
            with open(f"Matrix_{db}.log", "a") as f:
                f.write(json.dumps(row) + "\n")
    held = sum(r["bound_ok"] for r in results)
    log(f"wrote Matrix_{db}.log ({held}/{len(results)} cells hold)")


if __name__ == "__main__":
    main(*sys.argv[1:])
