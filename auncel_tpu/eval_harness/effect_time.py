"""Latency-budget effectiveness experiment.

Parity with ``/root/reference/Auncel/eval/effect_time.cpp``: queries carry
mixed per-query latency budgets (5..50 ms); time-budgeted search must come
in under each budget; (budget, actual) pairs go to
``Effective_time_<db>.log`` for figure 14.

Two actuals are produced, and the log carries the MEASURED one (the
reference logs measured wall-clock, effect_time.cpp:274-312):

  * measured: per-query batch-1 wall-clock over a sample of the test
    queries, reference-style one-query-at-a-time loop. The fixed dispatch
    floor (an empty-work search measured the same way) is reported
    alongside, because on this stack a dispatch pays a ~30-40 ms host<->TPU
    tunnel round trip that is not device time; ``measured_device`` =
    measured - floor is the hardware-apples comparison.
  * model: the calibrated batch-1 cost table evaluated at n_scanned for
    every query (what the budget->probe-count conversion believed; round-5
    table model, ErrorSys.calibrate_time). The model is validated against
    the measured sample (correlation + relative error), instead of
    validating itself as it did before round 2.
"""

import argparse
import sys
import time

import numpy as np

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.eval_harness import common

MIXED_BUDGETS_MS = [5.0, 10.0, 20.0, 30.0, 40.0, 50.0]  # effect_time.cpp:279


def _measure_batch1(es: ErrorSys, qids, reps: int = 5) -> np.ndarray:
    """Reference-style per-query timed loop: one query per dispatch,
    wall-clock forced by materializing the result (block_until_ready is a
    no-op through the axon tunnel). MIN of reps per query: the tunnel
    adds strictly-positive jitter of several ms per dispatch, so the mean
    measures the tunnel, not the device — the reference times a dedicated
    CPU where the two coincide (effect_time.cpp:274-312); min-of-reps is
    the closest analog of its per-query device cost on this stack (the
    same estimator calibrate_time uses, so model and measurement ask the
    same question)."""
    out = np.zeros(len(qids), np.float64)
    # warm-up compiles the batch-1 program
    es.time_search(int(qids[0]), 1)
    for j, qi in enumerate(qids):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            D, I = es.time_search(int(qi), 1)
            np.asarray(D)
            best = min(best, time.perf_counter() - t0)
        out[j] = best * 1e3
    return out


def run(db: str = "synth100K", ts: int = 1000, ses: int = 1000,
        input_k: int = 10, nlist: int = 1024, max_topk: int = 100,
        log_dir: str = ".", n_measure: int = 48, storage: str = "f32"):
    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:8.3f} s] {m}", file=sys.stderr, flush=True)

    data = common.load_dataset(db, nq=ts + ses)
    idx = common.build_or_load_index(data, nlist=nlist, storage=storage)
    idx.enable_multirow()  # production scan layout
    gt_D, gt_I = common.ensure_gt(data, idx, max_topk)
    es = ErrorSys(idx, train_num=ts + ses, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(ts, data.xq)
    es.set_topk(input_k)

    budgets = np.asarray([MIXED_BUDGETS_MS[i % len(MIXED_BUDGETS_MS)]
                          for i in range(ts + ses)], np.float32)
    es.set_queries(ses, data.xq, budgets)
    per_probe = es.calibrate_time()
    tbl = es._time_cost_table
    log(f"calibrated cost table: cost(1)={tbl[0]:.2f} ms, "
        f"cost(nlist)={tbl[-1]:.2f} ms; tail slope {per_probe * 1e3:.1f} "
        f"us/probe")

    # full batched pass: budget -> probe budget -> results + model cost
    D, I = es.time_search(ts, ses)
    model_ms = es.time_cost_ms(es.n_scanned[ts:ts + ses])
    within_model = float(np.mean(model_ms <= budgets[ts:ts + ses]))
    log(f"within-budget rate (cost model): {within_model:.4f}")

    # measured batch-1 sample, stratified across the budget classes
    n_measure = min(n_measure, ses)
    qids = ts + (np.arange(n_measure) * (ses // max(n_measure, 1)))
    measured = _measure_batch1(es, qids)
    # snapshot BEFORE the floor run below overwrites these slots with ~1
    # (time_search writes n_scanned on every call, error_sys.py)
    probes_sample = es.n_scanned[qids].astype(np.float64).copy()
    model_sample = es.time_cost_ms(probes_sample)
    # dispatch floor: the same timed loop with the minimum possible work
    # (budget below one probe's cost -> n_budget clamps to 1 probe)
    saved = es.require_acc
    es.require_acc = es.require_acc.copy()
    es.require_acc[qids] = 1e-6
    floor = float(np.median(_measure_batch1(es, qids[:8])))
    es.require_acc = saved
    measured_dev = np.maximum(measured - floor, 0.0)
    b = budgets[qids]
    within_measured = float(np.mean(measured_dev <= b))
    # cost-model validation on the measured sample
    denom = np.maximum(measured_dev, 1e-3)
    rel_err = float(np.median(np.abs(model_sample - measured_dev) / denom))
    corr = float(np.corrcoef(model_sample, measured_dev)[0, 1]) \
        if np.std(model_sample) > 0 and np.std(measured_dev) > 0 else 1.0
    log(f"measured batch-1 sample n={n_measure}: dispatch floor "
        f"{floor:.1f} ms, within-budget (device time) {within_measured:.3f}")
    log(f"cost model vs measured: median rel err {rel_err:.2f}, "
        f"corr {corr:.2f}")
    # refit the per-probe slope on the measurement (least squares through
    # the origin): the honest cost model this data supports
    probes = probes_sample
    denom2 = float((probes * probes).sum())
    slope = float((probes * measured_dev).sum() / denom2) if denom2 else 0.0
    refit = probes * slope
    refit_err = float(np.median(
        np.abs(refit - measured_dev) / np.maximum(measured_dev, 1e-3)))
    log(f"refit per-probe cost {slope * 1e3:.1f} us -> median rel err "
        f"{refit_err:.2f}")

    fn = f"{log_dir}/Effective_time_{db}.log"
    common.write_log(fn, list(zip(b.tolist(), measured_dev.tolist())))
    log(f"wrote {fn} (measured device-side ms)")
    return dict(within_budget=within_model,
                within_budget_measured=within_measured,
                budgets=budgets[ts:ts + ses], model_ms=model_ms,
                measured_ms=measured, measured_device_ms=measured_dev,
                dispatch_floor_ms=floor, model_rel_err=rel_err,
                model_corr=corr, refit_per_probe_ms=slope,
                refit_rel_err=refit_err, sample_qids=qids)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("db", nargs="?", default="synth100K")
    ap.add_argument("train_size", nargs="?", type=int, default=1000)
    ap.add_argument("query_size", nargs="?", type=int, default=1000)
    ap.add_argument("topk", nargs="?", type=int, default=10)
    ap.add_argument("--storage", default="f32")
    args = ap.parse_args()
    run(args.db, args.train_size, args.query_size, args.topk,
        storage=args.storage)


if __name__ == "__main__":
    main()
