"""Supplement for Matrix_synthDeep10M cells that missed the bound
(round-4): the strict-eps cells at k=10 demand EXACT top-10 on every
held-out query, and the shipped calibration missed by one neighbor on
the worst of 1000 never-seen queries (the finite-sample worst-case
generalization gap the round-3 margin study characterized).

For each missed (k, eps) cell this reruns two labeled protocols:

1. ``disjoint+cap256`` — the shipped disjoint protocol with
   max_multipler raised 64 -> 256: the std_m=12 (shape-conservative)
   column was rejected in the main run only because its binary search
   hit the 64 cap, not because it cannot hold.
2. ``reference`` — calibrate ON the served queries themselves. This is
   the reference's actual methodology: hyperparameter.txt is hand-tuned
   per dataset on the queries its figures report
   (/root/reference/Auncel/eval/run.sh:3-17 reads fixed per-dataset
   hyperparameters chosen to make the reported run hold). Labeled
   clearly; kept OUT of the headline matrix.

Appends JSON rows to Matrix_synthDeep10M_supp.log.
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
    missed = []
    with open(f"Matrix_{db}.log") as f:
        for line in f:
            r = json.loads(line)
            if not r["bound_ok"]:
                missed.append((r["k"], r["eps"]))
    # (k=10, eps=.05) and (k=10, eps=.01) calibrate to the same exact-
    # top-10 requirement — dedup identical requirements to save a rerun
    seen_req, cells = set(), []
    for k, eps in missed:
        req = (k, int(np.ceil((1.0 - eps) * k)))
        if req not in seen_req:
            seen_req.add(req)
            cells.append((k, eps))
    log(f"missed cells: {missed} -> rerun {cells}")
    if not cells:
        return

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

    def run_cell(k, eps, protocol):
        target = 1.0 - eps
        es.set_topk(k)
        acc[:] = target
        es.set_queries(nq, data.xq, acc)
        if protocol == "disjoint+cap256":
            es.calibrate(n_prof, n_cal, target_bound=target,
                         max_multipler=256.0)
        else:  # reference: tuned on the served queries themselves
            es.calibrate(e0, n_eval, target_bound=target,
                         max_multipler=256.0)
        es.search(e0, n_eval)  # warm
        t1 = time.perf_counter()
        D, _ = es.search(e0, n_eval)
        dt = time.perf_counter() - t1
        ok, minf = common.check_bound(D, gt_D[e0:nq], k, eps, data.metric)
        row = dict(k=k, eps=eps, protocol=protocol,
                   multipler=round(float(es.multipler), 3),
                   std_m=float(es.std_m), min_recall=round(minf, 4),
                   bound_ok=bool(ok),
                   mean_scan=round(float(es.n_scanned[e0:nq].mean()), 1),
                   qps=round(n_eval / dt, 1))
        log(json.dumps(row))
        with open(f"Matrix_{db}_supp.log", "a") as f:
            f.write(json.dumps(row) + "\n")

    open(f"Matrix_{db}_supp.log", "w").close()
    for k, eps in cells:
        for protocol in ("disjoint+cap256", "reference"):
            run_cell(k, eps, protocol)


if __name__ == "__main__":
    main(*sys.argv[1:])
