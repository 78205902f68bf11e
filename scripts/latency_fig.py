"""Per-query latency comparison + figure generation (round-4 VERDICT #3).

Measures batch-1 per-query wall-clock latencies on the SAME sampled
queries for (a) Auncel bounded search at the calibrated config and (b)
the ELP worst-case-tuned fixed-nprobe baseline on the same engine, writes
the reference-format logs

    Auncel_Latency_<db>_<k>_<eps>.log
    ELP_Latency_<db>_<k>_<eps>.log

and renders the figure-10/11 style latency CDF + per-query slowdown CDF
PNGs from them (figures/overall parity: the reference computes
baseline[i]/auncel[i] per query, figure10-1.py:36-80). Every latency
includes the ~40 ms axon host<->device round trip on this stack; the
figures compare systems measured identically, so the RTT cancels in the
slowdown ratio's ordering (it compresses ratios toward 1, noted on the
figure).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.autotune import ParameterSpace
from auncel_tpu.eval_harness import common
from auncel_tpu.figures import plots

T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:8.1f} s] {m}", file=sys.stderr, flush=True)


def main(db="synth1M", ts=1000, ses=1000, k=10, eps=0.10, storage="f32",
         n_lat=200, profile_size=0):
    ts, ses, k, eps, n_lat = int(ts), int(ses), int(k), float(eps), \
        int(n_lat)
    data = common.load_dataset(db, nq=ts + ses)
    idx = common.build_or_load_index(data, nlist=1024, storage=storage)
    idx.enable_multirow()
    gt_D, gt_I = common.ensure_gt(data, idx, 100)
    log("index + gt ready")

    # Disjoint protocol (shipped default since round 4): profile on the
    # first profile_size (default: half) of the train slice, calibrate
    # on the rest — at 10M the measured floor is 2000 calibration
    # samples, so pass ts=3000 profile_size=1000 there.
    psz = int(profile_size) or max(ts // 2, 1)
    es = ErrorSys(idx, train_num=ts + ses, max_topk=100)
    es.set_gt(gt_D, gt_I)
    es.sys_train(psz, data.xq)
    es.set_topk(k)
    acc = np.full(ts + ses, 1.0 - eps, np.float32)
    es.set_queries(ses, data.xq, acc)
    es.calibrate(psz, min(ts - psz, 2000), target_bound=1.0 - eps)
    log(f"calibrated multipler={es.multipler:.2f} std_m={es.std_m:g}")

    n_lat = min(n_lat, ses)
    qids = ts + np.arange(n_lat)

    # --- Auncel batch-1 ladder
    es.search(int(qids[0]), 1)  # compile
    a_lat = []
    for qi in qids:
        t1 = time.perf_counter()
        es.search(int(qi), 1)
        a_lat.append(time.perf_counter() - t1)
    a_lat = np.asarray(a_lat)
    D, _ = es.search(ts, ses)
    ok, minf = common.check_bound(D, gt_D[ts:], k, eps, data.metric)
    log(f"auncel: mean {a_lat.mean()*1e3:.2f} ms, bound_ok={ok} "
        f"({minf:.3f})")

    # --- ELP fixed-nprobe on the same engine, same queries
    ps = ParameterSpace(idx)
    nprobe = ps.tune_for_bound(data.xq[:ts], gt_D[:ts], k, eps,
                               headroom=1.0 / k)
    log(f"ELP tuned nprobe={nprobe}")
    xq_test = data.xq[ts:ts + ses]
    idx.search(xq_test[:1], k, nprobe=nprobe)  # compile
    e_lat = []
    for qi in qids - ts:
        t1 = time.perf_counter()
        idx.search(xq_test[qi:qi + 1], k, nprobe=nprobe)
        e_lat.append(time.perf_counter() - t1)
    e_lat = np.asarray(e_lat)
    De, _ = idx.search(xq_test, k, nprobe=nprobe)
    ok_e, minf_e = common.check_bound(De, gt_D[ts:], k, eps, data.metric)
    log(f"elp: mean {e_lat.mean()*1e3:.2f} ms, bound_ok={ok_e} "
        f"({minf_e:.3f})")

    tag = f"{db}_{k}_{round(eps * 100)}"
    common.write_log(f"Auncel_Latency_{tag}.log", a_lat.tolist())
    common.write_log(f"ELP_Latency_{tag}.log", e_lat.tolist())
    os.makedirs("figures_out", exist_ok=True)
    plots.latency_cdf(
        {"Auncel": f"Auncel_Latency_{tag}.log",
         f"ELP nprobe={nprobe}": f"ELP_Latency_{tag}.log"},
        f"figures_out/latency_cdf_{tag}.png",
        title=f"{db} k={k} eps={eps:g} (incl. ~40ms tunnel RTT)")
    sl = plots.latency_slowdown(
        f"ELP_Latency_{tag}.log", f"Auncel_Latency_{tag}.log",
        f"figures_out/slowdown_{tag}.png", label="ELP / Auncel")
    log(f"mean slowdown ELP/Auncel = {sl:.2f}; figures written")


if __name__ == "__main__":
    main(*sys.argv[1:])
