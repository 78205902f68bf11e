"""Batch-1 decide-plan A/B at the headline scale (round-5, VERDICT r4 #1).

Times per-query batch-1 wall-clock on the SAME sampled queries for:
  * ELP fixed-nprobe on the production engine (idx.search), the baseline
    the round-4 head-to-head lost to at 10M (41.75 ms vs 58.98 ms,
    logs_r4/latfig10M.err);
  * the one-shot bounded engine (round-4 default at every batch size);
  * plan_latency variants (thinned decide ladder + geometric serve tail)
    across decide_stages / serve_base configs.

Uses fixed (multipler, std_m) from the round-4 calibration (8.14 / 12 at
synthDeep10M) so iteration skips the ~4 min calibrate step; the winner
then reruns under scripts/latency_fig.py with full calibration for the
committed head-to-head. Reports mean/p50/p95 per arm plus bound check of
the winner's served results.
"""

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


def timed_loop(fn, ids, reps=1):
    fn(int(ids[0]))  # warm + compile
    lat = []
    for qi in ids:
        t0 = time.perf_counter()
        for _ in range(reps):
            fn(int(qi))
        lat.append((time.perf_counter() - t0) / reps)
    return np.asarray(lat) * 1e3


def stats(lat):
    return (f"mean {lat.mean():7.2f}  p50 {np.percentile(lat, 50):7.2f}  "
            f"p95 {np.percentile(lat, 95):7.2f}  max {lat.max():7.2f} ms")


def main(db="synthDeep10M", ts=3000, ses=1000, k=10, eps=0.10,
         storage="sq8", n_lat=40, mult=8.14, std_m=12.0, nprobe_elp=256,
         psz=1000):
    ts, ses, k, eps, n_lat = int(ts), int(ses), int(k), float(eps), \
        int(n_lat)
    data = common.load_dataset(db, nq=ts + ses)
    idx = common.build_or_load_index(data, nlist=1024, storage=storage)
    idx.enable_multirow()
    gt_D, gt_I = common.ensure_gt(data, idx, 100)
    log("index + gt ready")
    es = ErrorSys(idx, train_num=ts + ses, max_topk=100)
    es.set_gt(gt_D, gt_I)
    es.sys_train(int(psz), data.xq)
    es.set_topk(k)
    acc = np.full(ts + ses, 1.0 - eps, np.float32)
    es.set_queries(ses, data.xq, acc)
    es.set_hyper(float(mult), float(std_m))
    log(f"profile ready (mult={mult} std_m={std_m})")

    qids = ts + np.arange(n_lat)
    xq_test = data.xq[ts:ts + ses]

    # --- ELP fixed-nprobe batch-1 (the baseline to beat)
    e_lat = timed_loop(
        lambda qi: idx.search(xq_test[qi - ts:qi - ts + 1], k,
                              nprobe=int(nprobe_elp)), qids)
    log(f"ELP nprobe={nprobe_elp:4}:  {stats(e_lat)}")

    # --- one-shot engine at batch 1 (round-4 default)
    es.lat_bucket_max = 0
    o_lat = timed_loop(lambda qi: es.search(qi, 1), qids)
    scans_o = es.my_nprobe[qids].copy()
    log(f"oneshot B=1       :  {stats(o_lat)}  (mean my_np "
        f"{scans_o.mean():.0f})")

    # --- latency-plan variants
    configs = [((4, 16, 64), 64), ((4, 16, 64), 256), ((8, 32), 128),
               ((16,), 256), ((4, 16, 64), 1024)]
    best = None
    for stages, base in configs:
        es.lat_bucket_max = 1
        es.lat_decide_stages = stages
        es.lat_serve_base = base
        l_lat = timed_loop(lambda qi: es.search(qi, 1), qids)
        scans = es.my_nprobe[qids].copy()
        log(f"lat {str(stages):12}/{base:4}:  {stats(l_lat)}  (mean my_np "
            f"{scans.mean():.0f})")
        if best is None or l_lat.mean() < best[0]:
            best = (l_lat.mean(), stages, base)

    log(f"best latency plan: stages={best[1]} base={best[2]} "
        f"({best[0]:.2f} ms vs ELP {e_lat.mean():.2f} ms -> slowdown "
        f"ELP/Auncel {e_lat.mean() / best[0]:.2f})")

    # bound check of the winning config over the full served set
    es.lat_decide_stages, es.lat_serve_base = best[1], best[2]
    D = np.concatenate([es.search(int(q), 1)[0] for q in qids])
    ok, minf = common.check_bound(D, gt_D[qids], k, eps, data.metric)
    log(f"winner bound over the {n_lat} timed queries: ok={ok} "
        f"({minf:.3f})")


if __name__ == "__main__":
    main(*sys.argv[1:])
