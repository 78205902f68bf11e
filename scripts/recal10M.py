"""Calibration-policy study at 10M scale (round-4 VERDICT item #1/#6).

The first p2 run (ts=1000 calibration) read held-out min recall 0.8000 at
target 0.9 — the one-worst-query generalization miss the round-3 margin
study characterized at 1M. This script evaluates PRE-DECLARED policy
escalations on fresh splits (profile: queries [0:1000]; calibration:
[1000:3000]; held-out eval: [3000:4000] — the eval slice is never touched
by any tuning step):

  P0  calibrate on 2000 samples, shipped defaults
  P1  P0 + one-neighbor holdout headroom (headroom = 1/k)
  P2  P1 + std_m floor 8 (shape-conservative cells only)

Each policy's (multipler, std_m, held-out min recall, mean scan, qps) is
recorded; the first that holds the bound becomes the documented 10M
recipe. Mirrors the role of the reference's per-workload
hyperparameter.txt tuning (IVF_pro.cpp:240-256) with an explicit,
reproducible protocol.
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


def main(db="synthDeep10M", storage="sq8", k=10, eps=0.10):
    n_prof, n_cal, n_eval = 1000, 2000, 1000
    nq = n_prof + n_cal + n_eval
    data = common.load_dataset(db, nq=nq)
    log(f"dataset {db}: nb={data.xb.shape[0]} nq={data.xq.shape[0]}")
    idx = common.build_or_load_index(data, nlist=1024, storage=storage)
    idx.enable_multirow()
    log("index ready")
    gt_D, gt_I = common.ensure_gt(data, idx, 100)
    log("gt ready")

    es = ErrorSys(idx, train_num=nq, max_topk=100)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_prof, data.xq)
    es.set_topk(k)
    acc = np.full(nq, 1.0 - eps, np.float32)
    # absolute-position indexing like eval_harness.bound: queries, gt and
    # bookkeeping all share one id space over [profile | calib | eval]
    es.set_queries(nq, data.xq, acc)
    log("profile trained")

    target = 1.0 - eps
    e0 = n_prof + n_cal            # eval slice start (never tuned on)
    results = []

    def evaluate(tag):
        es.search(e0, n_eval)      # warm/compile
        t1 = time.perf_counter()
        D, I = es.search(e0, n_eval)
        dt = time.perf_counter() - t1
        ok, minf = common.check_bound(D, gt_D[e0:nq], k, eps, data.metric)
        row = dict(policy=tag, multipler=round(float(es.multipler), 3),
                   std_m=float(es.std_m), min_recall=round(minf, 4),
                   bound_ok=bool(ok),
                   mean_scan=round(
                       float(es.n_scanned[e0:nq].mean()), 1),
                   qps=round(n_eval / dt, 1))
        log(json.dumps(row))
        results.append(row)
        return ok

    # P0: 2000-sample calibration, shipped defaults
    es.calibrate(n_prof, n_cal, target_bound=target)
    done = evaluate("P0_2000samples")
    if not done:
        es.calibrate(n_prof, n_cal, target_bound=target, headroom=1.0 / k)
        done = evaluate("P1_headroom")
    if not done:
        es.calibrate(n_prof, n_cal, target_bound=target, headroom=1.0 / k,
                     std_m_grid=(8.0, 12.0))
        done = evaluate("P2_stdm_floor")
    with open(f"Recal_{db}_{k}_{round(eps*100)}.log", "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    log("wrote Recal log; " + ("BOUND HELD" if done else "ALL MISSED"))


if __name__ == "__main__":
    main(*sys.argv[1:])
