"""Measure the min_decide_stage (merge-block coalescing) knob on the TPU.

Reuses the headline bench setup (1M x 128, IVF1024, k=10, eps=10%) from
the bench cache, then sweeps min_decide_stage over {1, 2, 4, 8}: for each
setting it reports one-shot and pipelined-stream qps, mean lists scanned,
and the worst-case bound check over the unseen test half. The knob drops
early decision boundaries (fewer exact top-k merges + decide blocks per
window) in exchange for larger budgets on early-deciding queries — this
script decides whether that trade pays on the merge-dominated easy
workload (bench mean ~4.6 probes).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import auncel_tpu as at
from auncel_tpu.types import Metric
from auncel_tpu.autotune import recall_counts

NB, D, NLIST = 1_000_000, 128, 1024
N_TRAIN_Q, N_TEST_Q, K, MAX_TOPK, EPS = 1000, 1000, 10, 100, 0.10


def main():
    cache = os.environ.get("BENCH_CACHE", ".bench_cache")
    with np.load(os.path.join(cache, f"ds_{NB}_{D}_v3.npz")) as z:
        xb, xq = z["xb"], z["xq"]
    idx = at.IVFFlatIndex(D, NLIST)
    idx.set_centroids(np.load(
        os.path.join(cache, f"centroids_{NB}_{D}_{NLIST}_v4.npy")))
    idx.add(xb)
    _ = idx.arrays
    idx.enable_multirow()
    print("index ready", flush=True)

    gt_D, gt_I = idx.exact_search(xq, MAX_TOPK, batch=N_TRAIN_Q)
    es = at.ErrorSys(idx, train_num=N_TRAIN_Q + N_TEST_Q, max_topk=MAX_TOPK)
    es.set_gt(gt_D, gt_I)
    es.sys_train(N_TRAIN_Q, xq)
    es.set_topk(K)
    acc = np.full(N_TRAIN_Q + N_TEST_Q, 1.0 - EPS, np.float32)
    es.set_queries(N_TEST_Q, xq, acc)
    mult = es.calibrate(0, N_TRAIN_Q, target_bound=1.0 - EPS)
    print(f"calibrated multipler={mult:.2f} std_m={es.std_m}", flush=True)

    for mds in (1, 2, 4, 8):
        es.min_decide_stage = mds
        plan = es._mr_oneshot_plan()
        n_dec = sum(1 for w in plan.a1.waves + plan.a2.waves if w[2])
        D_out, I_out = es.search(N_TRAIN_Q, N_TEST_Q)   # warm/compile
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            D_out, I_out = es.search(N_TRAIN_Q, N_TEST_Q)
        one_qps = reps * N_TEST_Q / (time.perf_counter() - t0)
        cnt = recall_counts(D_out, gt_D[N_TRAIN_Q:], K, Metric.L2)
        nscan = es.n_scanned[N_TRAIN_Q:].mean()

        pending, outs = [], []
        t0 = time.perf_counter()
        for _ in range(8):
            pending.append(es.dispatch_bounded(N_TRAIN_Q, N_TEST_Q))
            if len(pending) > 1:
                outs.append(es.finish_bounded(pending.pop(0)))
        while pending:
            outs.append(es.finish_bounded(pending.pop(0)))
        stream_qps = 8 * N_TEST_Q / (time.perf_counter() - t0)
        worst = min(float(recall_counts(dd, gt_D[N_TRAIN_Q:], K,
                                        Metric.L2).min()) / K
                    for dd, _ in outs)
        print(f"mds={mds}: decide_blocks={n_dec:2d} "
              f"oneshot={one_qps:7.1f} qps stream={stream_qps:7.1f} qps "
              f"mean_nscan={nscan:6.1f} min_recall={cnt.min() / K:.3f} "
              f"stream_min={worst:.3f}", flush=True)
    es.min_decide_stage = 1


if __name__ == "__main__":
    main()
