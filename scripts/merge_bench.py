"""Microbench: exact vs verified top-k merge at the engine's dense-window
shapes (round-4 verified-ApproxTopK work; extends the RESULTS_r3 top-k
frontier table with the certificate path).

Writes Merge_bench.log (one JSON row per cell).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from auncel_tpu.ops.topk import topk_scores, merge_topk_verified, init_topk
from auncel_tpu.types import Metric

LOG = "Merge_bench.log"
T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:7.1f} s] {m}", file=sys.stderr, flush=True)


def timed(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(out[0])          # axon: force a real sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / reps


def main():
    open(LOG, "w").close()
    B, k = 1024, 100
    metric = Metric.L2
    rng = np.random.RandomState(0)
    exact = jax.jit(lambda rv, ri, s, si: topk_scores(
        jnp.concatenate([rv, s], -1), jnp.concatenate([ri, si], -1),
        k, metric), static_argnames=())
    verified = jax.jit(lambda rv, ri, s, si: merge_topk_verified(
        rv, ri, s, si, k, metric))
    for W in (2048, 8192, 33280, 65536, 131072):
        rv, ri = init_topk((B,), k, metric)
        rv = jnp.asarray(rng.rand(B, k).astype(np.float32).cumsum(-1))
        s = jnp.asarray((rng.rand(B, W) * 100).astype(np.float32))
        si = jnp.asarray(rng.randint(0, 1 << 20, (B, W)).astype(np.int32))
        te = timed(exact, rv, ri, s, si)
        tv = timed(verified, rv, ri, s, si)
        # exactness spot-check on the same inputs
        ev = np.asarray(exact(rv, ri, s, si)[0])
        vv = np.asarray(verified(rv, ri, s, si)[0])
        row = dict(W=W, B=B, k=k, exact_ms=round(te * 1e3, 2),
                   verified_ms=round(tv * 1e3, 2),
                   speedup=round(te / tv, 2),
                   values_equal=bool(np.array_equal(ev, vv)))
        log(json.dumps(row))
        with open(LOG, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
