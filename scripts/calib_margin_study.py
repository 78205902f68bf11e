"""Calibration-margin study (round-3 item: the empirical bound's
train->test generalization at the 1M hard tail).

Sweeps calibration sample size x safety margin on a hard-tail workload and
measures, per cell: the calibrated multipler, the held-out worst-case
recall@k, and the mean scan cost. The reference sidesteps this by
hand-tuning (multipler, std_m) per workload into hyperparameter.txt; an
auto-calibrated system must instead pick a (sample, margin) default that
HOLDS on held-out data and document the cost of that safety.

Usage:  python scripts/calib_margin_study.py [db] [k] [eps]
        (defaults: synthHard1M 10 0.10)
Writes Calib_margin_<db>.log: one row
        "samples safety multipler heldout_min_recall mean_scan" per cell.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.autotune import recall_counts
from auncel_tpu.eval_harness import common

T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:8.1f}s] {m}", file=sys.stderr, flush=True)


def run(db="synthHard1M", input_k=10, eps=0.10, nlist=1024, max_topk=100,
        sample_sizes=(250, 500, 1000, 2000), safeties=(1.0, 1.25, 1.5, 2.0),
        holdout=2000):
    target = 1.0 - eps
    n_train = max(sample_sizes)
    nq = n_train + holdout
    data = common.load_dataset(db, nq=nq)
    idx = common.build_or_load_index(data, nlist=nlist)
    idx.enable_multirow()
    gt_D, gt_I = common.ensure_gt(data, idx, max_topk)
    log(f"{db} loaded, index built, GT ready")

    es = ErrorSys(idx, train_num=nq, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_train, data.xq)
    es.set_topk(input_k)
    acc = np.full(nq, target, np.float32)
    es.set_queries(nq, data.xq, acc)
    log("profile trained")

    rows = []
    for n_cal in sample_sizes:
        # calibrate WITHOUT the built-in safety (safety=1.0) so the sweep
        # isolates the margin's effect, then scale the multipler manually.
        es.calibrate(0, n_cal, target_bound=target, safety=1.0)
        base_mult, std_m = es.multipler, es.std_m
        log(f"samples={n_cal}: base multipler {base_mult:.2f} "
            f"std_m {std_m}")
        for safety in safeties:
            es.multipler = min(base_mult * safety, 64.0)
            es.std_m = std_m
            D, _ = es.search(n_train, holdout)
            cnt = recall_counts(D, gt_D[n_train:n_train + holdout],
                                input_k, data.metric)
            min_rec = float(cnt.min() / input_k)
            cost = float(es.n_scanned[n_train:n_train + holdout].mean())
            rows.append((n_cal, safety, es.multipler, min_rec, cost))
            log(f"  safety={safety}: multipler {es.multipler:.2f} "
                f"heldout_min={min_rec:.3f} mean_scan={cost:.1f}")

    fn = f"Calib_margin_{db}.log"
    with open(fn, "w") as f:
        for r in rows:
            f.write(f"{r[0]} {r[1]} {r[2]:.3f} {r[3]:.4f} {r[4]:.2f}\n")
    log(f"wrote {fn}")
    # recommend the cheapest cell that holds the bound on held-out
    ok = [r for r in rows if r[3] >= target]
    if ok:
        best = min(ok, key=lambda r: r[4])
        log(f"RECOMMENDED: samples={best[0]} safety={best[1]} "
            f"(mean_scan {best[4]:.1f})")
    else:
        log("NO cell held the bound — raise sample ceiling or margins")
    return rows


if __name__ == "__main__":
    a = sys.argv[1:]
    run(a[0] if a else "synthHard1M",
        int(a[1]) if len(a) > 1 else 10,
        float(a[2]) if len(a) > 2 else 0.10)
