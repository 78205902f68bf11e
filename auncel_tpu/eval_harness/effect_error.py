"""Bound-satisfaction effectiveness experiment.

Parity with ``/root/reference/Auncel/eval/effect_error.cpp``: queries carry
*mixed* per-query bounds cycling through {0.9, 0.8, ..., 0.3}; profile mode
records the achieved true recall per query; the (required, achieved) pairs
go to ``Effective_error_<db>.log`` for figure 13.
"""

import argparse
import sys
import time

import numpy as np

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.eval_harness import common

MIXED_BOUNDS = [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3]  # effect_error.cpp:281


def run(db: str = "synth100K", ts: int = 1000, ses: int = 1000,
        input_k: int = 10, figure_id: int | None = None,
        nlist: int = 1024, max_topk: int = 100, log_dir: str = ".",
        storage: str = "f32", calibrate: bool = False,
        profile_size: int | None = None):
    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:8.3f} s] {m}", file=sys.stderr, flush=True)

    data = common.load_dataset(db, nq=ts + ses)
    idx = common.build_or_load_index(data, nlist=nlist, storage=storage)
    idx.enable_multirow()  # production scan layout
    gt_D, gt_I = common.ensure_gt(data, idx, max_topk)
    # when auto-calibrating, train the profile on the first half of the
    # train slice so calibration runs on DISJOINT queries (the shipped
    # round-4 protocol; profile-seen calibration under-estimates)
    # --profile-size lets 10M runs match the P0 protocol exactly (1000
    # profile + 2000 calibration; Recal_synthDeep10M floor)
    psz = (min(profile_size or max(ts // 2, 1), ts) if calibrate else ts)
    es = ErrorSys(idx, train_num=ts + ses, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(psz, data.xq)
    es.set_topk(input_k)
    log(f"trained (profile on {psz} queries)")

    acc = np.asarray([MIXED_BOUNDS[i % len(MIXED_BOUNDS)]
                      for i in range(ts + ses)], np.float32)
    # train-slice positions carry the strictest bound uniformly: only the
    # test slice needs the reference's mixed cycle (effect_error.cpp:281),
    # and calibrate() searches train positions against ONE target
    acc[:ts] = MIXED_BOUNDS[0]
    es.set_queries(ses, data.xq, acc)
    if figure_id is not None:
        es.setparam(figure_id)
    elif calibrate:
        # calibrate against the STRICTEST mixed bound (0.9) on the
        # disjoint half of the train slice: per-query decisions at looser
        # bounds only terminate earlier. --profile-size >= ts leaves no
        # disjoint queries — fall back to profile-seen calibration like
        # compare.py rather than calibrating on zero queries.
        c0, csz = (psz, min(ts - psz, 2000)) if psz < ts \
            else (0, min(ts, 2000))
        m = es.calibrate(c0, csz, target_bound=MIXED_BOUNDS[0])
        log(f"auto-calibrated multipler={m:.2f} std_m={es.std_m:g}")
    else:
        es.set_hyper(8.0, 1.0)
    es.profile = True  # record achieved true recalls (effect_error.cpp:283)
    D, I = es.search(ts, ses)
    es.profile = False

    required = acc[ts:ts + ses]
    achieved = es.t_recalls[ts:ts + ses]
    sat = float(np.mean(achieved >= required - 1e-6))
    log(f"bound satisfaction rate: {sat:.4f}")
    fn = f"{log_dir}/Effective_error_{db}.log"
    common.write_log(fn, list(zip(required.tolist(), achieved.tolist())))
    log(f"wrote {fn}")
    return dict(satisfaction=sat, required=required, achieved=achieved)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("db", nargs="?", default="synth100K")
    ap.add_argument("train_size", nargs="?", type=int, default=1000)
    ap.add_argument("query_size", nargs="?", type=int, default=1000)
    ap.add_argument("topk", nargs="?", type=int, default=10)
    ap.add_argument("figure_id", nargs="?", type=int, default=None)
    ap.add_argument("--storage", default="f32")
    ap.add_argument("--calibrate", action="store_true")
    ap.add_argument("--profile-size", type=int, default=None,
                    help="train the profile on the first N train queries "
                         "and calibrate on the rest (default: ts // 2)")
    args = ap.parse_args()
    run(args.db, args.train_size, args.query_size, args.topk,
        args.figure_id, storage=args.storage, calibrate=args.calibrate,
        profile_size=args.profile_size)


if __name__ == "__main__":
    main()
