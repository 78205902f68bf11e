"""Distributed scaling experiment.

Parity with the reference's dist/ evaluation (figure 16: avg bounded-search
latency vs worker count, ``figures/dist/figure16.py`` — which hardcodes its
numbers; ours measures). Runs the SPMD sharded bounded search over meshes of
growing size and writes ``Dist_scaling.log`` (shards, avg-latency-ms) rows
plus the figure.

On a single-chip/CPU host this runs on the simulated device mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``): the *scaling
shape* (per-shard work drops ~1/S, merge cost grows logarithmically) is
what's being validated; absolute numbers come from real pods.
"""

import argparse
import sys
import time

import numpy as np

from auncel_tpu.eval_harness import common
from auncel_tpu.parallel.sharded import ShardedIVF, make_mesh


def run(db: str = "synth10K", shard_counts=(1, 2, 4, 8), nq: int = 64,
        nlist: int = 64, max_topk: int = 50, input_k: int = 10,
        bound: float = 0.9, reps: int = 3, log_dir: str = "."):
    import jax
    t0 = time.time()

    def log(m):
        print(f"[{time.time() - t0:8.3f} s] {m}", file=sys.stderr, flush=True)

    data = common.load_dataset(db, nq=nq)
    acc = np.full(nq, bound, np.float32)
    rows = []
    for S in shard_counts:
        if S > len(jax.devices()):
            log(f"skipping {S} shards (only {len(jax.devices())} devices)")
            continue
        s = ShardedIVF(data.xb.shape[1], nlist, S, data.metric,
                       mesh=make_mesh(S))
        s.build(data.xb)
        s.train_profiles(data.xq[: nq // 2], max_topk=max_topk)
        s.enable_multirow()  # production engine per shard
        s.multipler = 8.0
        s.search_bounded(data.xq, acc, query_k=input_k)  # warm/compile
        t1 = time.perf_counter()
        for _ in range(reps):
            vals, ids, nscan = s.search_bounded(data.xq, acc,
                                                query_k=input_k)
        dt = (time.perf_counter() - t1) / reps / nq * 1e3
        rows.append((S, dt))
        log(f"shards={S}: {dt:.3f} ms/query (mean per-shard scanned "
            f"lists {nscan.mean():.1f})")

    fn = f"{log_dir}/Dist_scaling.log"
    common.write_log(fn, rows)
    try:
        from auncel_tpu.figures import plots
        plots.dist_scaling([r[0] for r in rows], [r[1] for r in rows],
                           f"{log_dir}/fig16.png")
    except Exception as e:  # matplotlib optional
        log(f"figure skipped: {e}")
    return rows


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("db", nargs="?", default="synth10K")
    ap.add_argument("--shards", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()
    run(args.db, shard_counts=tuple(args.shards))


if __name__ == "__main__":
    main()
