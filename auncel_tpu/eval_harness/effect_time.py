"""Latency-budget effectiveness experiment.

Parity with ``/root/reference/Auncel/eval/effect_time.cpp``: queries carry
mixed per-query latency budgets (5..50 ms); time-budgeted search must come
in under each budget; (budget, actual) pairs go to
``Effective_time_<db>.log`` for figure 14.

"Actual" per query is the cost-model estimate (probes x calibrated
per-probe time): under XLA a batched search has no per-query wall clock.
A separate batch-level wall-clock check validates the model end to end.
"""

import argparse
import sys
import time

import numpy as np

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.eval_harness import common

MIXED_BUDGETS_MS = [5.0, 10.0, 20.0, 30.0, 40.0, 50.0]  # effect_time.cpp:279


def run(db: str = "synth100K", ts: int = 1000, ses: int = 1000,
        input_k: int = 10, nlist: int = 1024, max_topk: int = 100,
        log_dir: str = "."):
    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:8.3f} s] {m}", file=sys.stderr, flush=True)

    data = common.load_dataset(db, nq=ts + ses)
    idx = common.build_or_load_index(data, nlist=nlist)
    gt_D, gt_I = common.ensure_gt(data, idx, max_topk)
    es = ErrorSys(idx, train_num=ts + ses, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(ts, data.xq)
    es.set_topk(input_k)

    budgets = np.asarray([MIXED_BUDGETS_MS[i % len(MIXED_BUDGETS_MS)]
                          for i in range(ts + ses)], np.float32)
    es.set_queries(ses, data.xq, budgets)
    per_probe = es.calibrate_time()
    log(f"calibrated per-probe cost: {per_probe * 1e3:.1f} us")

    D, I = es.time_search(ts, ses)
    actual_ms = es.n_scanned[ts:ts + ses] * per_probe
    within = float(np.mean(actual_ms <= budgets[ts:ts + ses]))
    log(f"within-budget rate (cost model): {within:.4f}")

    fn = f"{log_dir}/Effective_time_{db}.log"
    common.write_log(fn, list(zip(budgets[ts:ts + ses].tolist(),
                                  actual_ms.tolist())))
    log(f"wrote {fn}")
    return dict(within_budget=within, budgets=budgets[ts:ts + ses],
                actual_ms=actual_ms)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("db", nargs="?", default="synth100K")
    ap.add_argument("train_size", nargs="?", type=int, default=1000)
    ap.add_argument("query_size", nargs="?", type=int, default=1000)
    ap.add_argument("topk", nargs="?", type=int, default=10)
    args = ap.parse_args()
    run(args.db, args.train_size, args.query_size, args.topk)


if __name__ == "__main__":
    main()
