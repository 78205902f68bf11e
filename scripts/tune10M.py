"""One-shot engine plan sweep at 10M (round-4 perf: the p2 headline read
251 qps at mean decided scan 9.9/1024 — ~30x below the 1M engine's
per-window economics, so fixed per-window costs dominate at 10M shapes).

Sweeps the plan constants that set those fixed costs (compaction
sub-batch widths, the A1/A2 split, decide-stage coalescing) on the cached
p2 dataset + profile, measuring one-shot qps and stream qps at the
calibrated config WITH the bound re-checked per cell (a plan change must
never alter decisions — n_scanned is asserted invariant).

Usage: python scripts/tune10M.py [multipler] [std_m]
       (defaults read the shipped calibration from Recal_*.log's last
        bound-holding row if present, else calibrate fresh)
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


def pick_calibration(path="Recal_synthDeep10M_10_10.log"):
    if not os.path.exists(path):
        return None
    rows = [json.loads(x) for x in open(path)]
    held = [r for r in rows if r.get("bound_ok")]
    return held[-1] if held else None


def main(multipler=None, std_m=None):
    db, k, eps = "synthDeep10M", 10, 0.10
    n_prof, n_cal, n_eval = 1000, 2000, 1000
    nq = n_prof + n_cal + n_eval
    data = common.load_dataset(db, nq=nq)
    idx = common.build_or_load_index(data, nlist=1024, storage="sq8")
    idx.enable_multirow()
    gt_D, gt_I = common.ensure_gt(data, idx, 100)
    log("index + gt ready")
    es = ErrorSys(idx, train_num=nq, max_topk=100)
    es.set_gt(gt_D, gt_I)
    es.sys_train(n_prof, data.xq)
    es.set_topk(k)
    acc = np.full(nq, 1.0 - eps, np.float32)
    es.set_queries(nq, data.xq, acc)
    if multipler is not None:
        es.set_hyper(float(multipler), float(std_m))
    else:
        cal = pick_calibration()
        if cal:
            es.set_hyper(cal["multipler"], cal["std_m"])
            log(f"using recal policy {cal['policy']}: "
                f"({cal['multipler']}, {cal['std_m']})")
        else:
            es.calibrate(n_prof, n_cal, target_bound=1.0 - eps,
                         headroom=1.0 / k)
            log(f"calibrated ({es.multipler:.2f}, {es.std_m:g})")
    e0 = n_prof + n_cal
    open("Tune10M.log", "w").close()  # fresh log; rows append below

    grids = [
        dict(),                                     # shipped defaults
        dict(a2_cap=256),
        dict(tail_cap=1024),
        dict(a2_cap=256, tail_cap=1024),
        dict(a2_cap=256, tail_cap=1024, split=16),
        dict(a2_cap=1024, tail_cap=1024),
    ]
    mds = [1, 2]
    base_ns = None
    results = []
    for ov in grids:
        for md in mds:
            es.plan_overrides = ov
            es.min_decide_stage = md
            tag = json.dumps(ov) + f" md={md}"
            try:
                es.search(e0, n_eval)          # compile + warm
                t1 = time.perf_counter()
                D, I = es.search(e0, n_eval)
                one = n_eval / (time.perf_counter() - t1)
                ns = es.n_scanned[e0:nq].copy()
                t1 = time.perf_counter()
                es.search_stream(e0, n_eval)
                st = n_eval / (time.perf_counter() - t1)
                ok, minf = common.check_bound(D, gt_D[e0:nq], k, eps,
                                              data.metric)
            except Exception as e:   # OOM at wide sub-batches etc.
                log(f"{tag}: FAILED {type(e).__name__}: {e}")
                continue
            if base_ns is None:
                base_ns = ns
                same = True
            else:
                # md>1 legitimately coalesces decisions upward; only
                # same-md cells must match exactly
                same = bool((ns == base_ns).all()) if md == 1 else None
            row = dict(plan=ov, min_decide_stage=md,
                       oneshot_qps=round(one, 1), stream_qps=round(st, 1),
                       min_recall=round(minf, 4), bound_ok=bool(ok),
                       mean_scan=round(float(ns.mean()), 1),
                       decisions_invariant=same)
            log(json.dumps(row))
            results.append(row)
            # append incrementally: a timeout mid-sweep (compile lottery
            # is per distinct plan shape) must not lose finished cells
            with open("Tune10M.log", "a") as f:
                f.write(json.dumps(row) + "\n")

    # --- dense serving on the PRUNABLE corpus -------------------------
    # At B=1024 a shared corpus pass reads fewer bytes than per-query
    # gathers whenever the mean decided scan exceeds nlist/B (~1 list);
    # p2's mean scan is ~34, i.e. gathers move ~34x the corpus bytes per
    # batch. dense_cut=0.0 serves EVERY query through masked_full_scan
    # (routing never alters decisions, so n_scanned must stay invariant);
    # dense_decide additionally replaces the decide-phase gathers (may
    # flip knife-edge queries within the kernel envelope, so its
    # mean_scan is reported, not asserted).
    es.min_decide_stage = 1
    dense_cells = [
        ("dense serve cap256", 0.0, False, {}),
        ("dense serve cap1024", 0.0, False, dict(dense_cap=1024)),
        ("dense serve cap1024 blk512", 0.0, False,
         dict(dense_cap=1024, dense_block=512)),
        ("dense serve+decide cap1024", 0.0, True, dict(dense_cap=1024)),
        ("dense decide only", 0.25, True, {}),
    ]
    for tag, cut, dd, ov in dense_cells:
        es.dense_cut = cut
        es.dense_decide = dd
        es.plan_overrides = ov
        try:
            es.search(e0, n_eval)          # compile + warm
            t1 = time.perf_counter()
            D, I = es.search(e0, n_eval)
            one = n_eval / (time.perf_counter() - t1)
            ns = es.n_scanned[e0:nq].copy()
            t1 = time.perf_counter()
            es.search_stream(e0, n_eval)
            st = n_eval / (time.perf_counter() - t1)
            ok, minf = common.check_bound(D, gt_D[e0:nq], k, eps,
                                          data.metric)
        except Exception as e:
            log(f"{tag}: FAILED {type(e).__name__}: {e}")
            continue
        same = (bool((ns == base_ns).all())
                if (base_ns is not None and not dd) else None)
        row = dict(config=tag, dense_cut=cut, dense_decide=dd, plan=ov,
                   oneshot_qps=round(one, 1), stream_qps=round(st, 1),
                   min_recall=round(minf, 4), bound_ok=bool(ok),
                   mean_scan=round(float(ns.mean()), 1),
                   decisions_invariant=same)
        log(json.dumps(row))
        results.append(row)
        with open("Tune10M.log", "a") as f:
            f.write(json.dumps(row) + "\n")
    log(f"wrote Tune10M.log ({len(results)} cells)")


if __name__ == "__main__":
    main(*sys.argv[1:])
