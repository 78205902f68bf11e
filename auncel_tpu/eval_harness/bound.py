"""Overall bounded-search latency experiment.

Parity with the reference's main eval binary
(``/root/reference/Auncel/eval/bound.cpp``): build IVF1024,Flat; train the
error profile on the first ``ts`` queries; run per-query bounded search over
the next ``ses`` queries; verify the worst-case bound; write per-query
latencies to ``Auncel_Latency_<db>_<k>_<eps>.log`` (same format the
``figures/overall`` scripts consume).

Per-query latency on TPU: each sampled query is timed as ONE synchronous
single-query dispatch, wall clock, host round-trip included (~40 ms of the
reported number is the axon tunnel RTT — the log line says so). Throughput
is measured batched. Both are reported; the sustained-stream number in
bench.py additionally overlaps dispatch/fetch across windows.
"""

import argparse
import sys
import time

import numpy as np

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.eval_harness import common


def run(db: str = "synth100K", ts: int = 1000, ses: int = 1000,
        input_k: int = 10, error_bound: float = 0.10,
        figure_id: int | None = None, nlist: int = 1024,
        max_topk: int = 100, calibrate: bool = True,
        batch_latency: int = 100, log_dir: str = ".",
        storage: str = "f32", profile_size: int | None = None,
        dense_cut: float | None = 0.25, dense_decide: bool = False,
        dense_auto: bool = True, stream: bool = False,
        stream_window: int | None = None):
    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:8.3f} s] {m}", file=sys.stderr, flush=True)

    data = common.load_dataset(db, nq=ts + ses)
    assert data.xq.shape[0] >= ts + ses
    log(f"loaded {db}: nb={data.xb.shape[0]} d={data.xb.shape[1]}")
    idx = common.build_or_load_index(data, nlist=nlist, storage=storage)
    mr = idx.enable_multirow()  # production row layout (every other eval
    # driver and bench.py already serve it; the bounded engine's decide +
    # tail phases ride the one-shot multirow program)
    log(f"index built (multirow {mr.rows.db.shape[0]} rows x "
        f"{mr.rows.db.shape[1]})")
    gt_D, gt_I = common.ensure_gt(data, idx, max_topk)
    log("ground truth ready")

    # ``profile_size`` < ts splits the train slice: the profile trains on
    # the first profile_size queries and calibration runs on the REST —
    # disjoint slices. Measured at 10M (Recal_synthDeep10M log, round 4):
    # calibrating on profile-seen queries under-estimates the multipler
    # (traces are optimistic on the queries they were fit to) and missed
    # the held-out bound; profile 1000 + disjoint calibrate 2000 holds it.
    psz = min(profile_size or ts, ts)
    es = ErrorSys(idx, train_num=ts + ses, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(psz, data.xq)
    es.set_topk(input_k)
    log(f"error profile trained (on {psz} queries)")

    acc = np.full(ts + ses, 1.0 - error_bound, np.float32)
    es.set_queries(ses, data.xq, acc)
    # Dense-routing knobs (scripts/tune10M measured dense serving 1.8x
    # over gathers on the prunable 10M corpus at B=1000 — one shared
    # corpus pass reads fewer bytes than per-query gathers whenever the
    # batch's total decided budget exceeds the corpus).
    es.dense_cut = dense_cut
    es.dense_decide = dense_decide
    es.dense_auto = dense_auto
    if figure_id is not None:
        es.setparam(figure_id)
    elif calibrate:
        # margin-study floor (RESULTS_r3/r4): >= 1000 calibration queries
        # at 1M, 2000 at 10M — smaller samples were measured to miss the
        # held-out worst case; calibrate() itself warns below the floor.
        c0, csz = (psz, min(ts - psz, 2000)) if psz < ts \
            else (0, min(ts, 2000))
        m = es.calibrate(c0, csz, target_bound=1.0 - error_bound)
        log(f"auto-calibrated multipler={m:.2f} std_m={es.std_m:g} "
            f"(on {csz} queries at [{c0}:{c0 + csz}])")
        log(f"dense auto-routing probe: cal_mean_scan="
            f"{es._cal_mean_scan:.1f} dense_min_bsz={es._dense_min_bsz} "
            f"(windows >= that size serve dense; None = gather always)")

    # Throughput (batched) measurement.
    D, I = es.search(ts, ses)  # warm + compile
    t1 = time.perf_counter()
    D, I = es.search(ts, ses)
    batch_dt = time.perf_counter() - t1
    qps = ses / batch_dt

    # Sustained-stream throughput (round-5 VERDICT #7: demonstrate the
    # pipelined serving mode at the headline scale, not only at 1M).
    # Results/bookkeeping are identical to looping search() — the bound
    # check below runs on the STREAM results when stream mode is on.
    stream_qps = None
    if stream:
        Ds, Is = es.search_stream(ts, ses, window=stream_window)  # warm
        t1 = time.perf_counter()
        Ds, Is = es.search_stream(ts, ses, window=stream_window)
        stream_qps = ses / (time.perf_counter() - t1)
        D, I = Ds, Is
        log(f"sustained-stream throughput: {stream_qps:.1f} qps "
            f"(window {stream_window or es.BATCH_BUCKETS[-1]})")

    # Per-query latency: pipelined single-query dispatches.
    # batch_latency=0 skips this phase (and its B=1 program compiles) —
    # useful when only throughput + bound are wanted on a cold cache.
    nlat = min(batch_latency, ses)
    if nlat:
        es.search(ts, 1)  # compile B=1
    lat = []
    for i in range(nlat):
        tt0 = time.perf_counter()
        es.search(ts + i, 1)
        lat.append(time.perf_counter() - tt0)
    lat = np.asarray(lat)

    ok, minf = common.check_bound(D, gt_D[ts:ts + ses], input_k,
                                  error_bound, data.metric)
    if ok:
        log("Error bound is guaranteed")
    else:
        log("WARNING: error bound NOT guaranteed — enlarge multipler")
    log(f"Error Bound : {minf:.4f}")
    lat_msg = (f"batch-1 latency mean={lat.mean() * 1e3:.2f} ms "
               f"p99={np.quantile(lat, .99) * 1e3:.2f} ms (incl. host RTT)"
               if nlat else "batch-1 latency not measured")
    log(f"throughput: {qps:.1f} qps (batch {ses}); {lat_msg}; "
        f"mean scanned lists={es.n_scanned[ts:ts + ses].mean():.1f}")

    mean_lat = None
    if nlat:
        # only write the figures-facing log when latency was actually
        # measured — a 'nan' placeholder poisons the latency CDF /
        # slowdown plots downstream (figures/plots.py)
        fn = (f"{log_dir}/Auncel_Latency_{db}_{input_k}_"
              f"{round(error_bound * 100)}.log")
        common.write_log(fn, lat.tolist())
        log(f"wrote {fn}")
        mean_lat = float(lat.mean() * 1e3)
    return dict(qps=qps, stream_qps=stream_qps, min_recall=minf,
                bound_ok=ok, mean_latency_ms=mean_lat,
                multipler=float(es.multipler), std_m=float(es.std_m),
                mean_nscan=float(es.n_scanned[ts:ts + ses].mean()),
                multirow_rows=int(mr.rows.db.shape[0]))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("db", nargs="?", default="synth100K")
    ap.add_argument("train_size", nargs="?", type=int, default=1000)
    ap.add_argument("query_size", nargs="?", type=int, default=1000)
    ap.add_argument("topk", nargs="?", type=int, default=10)
    ap.add_argument("error_bound", nargs="?", type=float, default=0.10)
    ap.add_argument("figure_id", nargs="?", type=int, default=None)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--storage", default="f32")
    ap.add_argument("--batch-latency", type=int, default=100)
    ap.add_argument("--profile-size", type=int, default=None,
                    help="train the profile on the first N train queries "
                         "and calibrate on the rest (disjoint slices)")
    ap.add_argument("--dense-cut", type=float, default=0.25,
                    help="per-query dense-routing threshold as a corpus "
                         "fraction (0.0 = serve every query via the "
                         "shared corpus pass; negative = disable)")
    ap.add_argument("--dense-decide", action="store_true",
                    help="serve the decision ladder from shared corpus "
                         "passes too (wins when decided budgets are "
                         "large; scripts/tune10M measures both)")
    ap.add_argument("--no-dense-auto", action="store_true",
                    help="disable the batch-amortized auto dense routing "
                         "(measure the explicit dense-cut config only)")
    ap.add_argument("--stream", action="store_true",
                    help="also measure sustained-stream throughput "
                         "(pipelined windows; bound checked on the "
                         "stream results)")
    ap.add_argument("--stream-window", type=int, default=None)
    args = ap.parse_args()
    run(args.db, args.train_size, args.query_size, args.topk,
        args.error_bound, args.figure_id, nlist=args.nlist,
        storage=args.storage, batch_latency=args.batch_latency,
        profile_size=args.profile_size,
        dense_cut=None if args.dense_cut < 0 else args.dense_cut,
        dense_decide=args.dense_decide,
        dense_auto=not args.no_dense_auto, stream=args.stream,
        stream_window=args.stream_window)


if __name__ == "__main__":
    main()
