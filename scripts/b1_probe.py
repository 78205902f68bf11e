"""Micro-probe: WHERE do batch-1 milliseconds go on this TPU?

Times toy jitted programs shaped like the bounded engine's machinery —
no corpus needed, the costs under test are per-kernel/per-cond overheads:

  conds16     16 sequential lax.conds over engine-sized carried state
  conds16run  same but the branch bodies actually run (predicate true)
  decide4     4 decision blocks back-to-back (sum_angle+lookup+cur_num)
  scan4       4 tiny scan_probe_range waves (256 rows each) on a fake
              multirow corpus (4096 rows x 256 x 96 sq8)
  merge4      4 merge_topk_verified calls over [1, 65536]
  gather8k    one 8192-row gather+decode+dot (the raw scan floor)

Every number includes the ~25 ms dispatch floor; read DIFFERENCES vs
``empty``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric

T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:8.1f} s] {m}", file=sys.stderr, flush=True)


def timed(fn, n=20):
    fn(); fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from auncel_tpu.profile.trace import TraceSet
    from auncel_tpu.profile.bounded import _recall_estimate
    from auncel_tpu.profile.geometry import n_boundaries

    B, K, nlist = 1, 100, 1024
    rng = np.random.RandomState(0)
    vals = jnp.asarray(np.sort(rng.rand(B, K)).astype(np.float32))
    dtb = jnp.asarray(rng.rand(B, n_boundaries(nlist)).astype(np.float32))
    nb_tr = 8
    traces = TraceSet(
        jnp.asarray(np.sort(rng.rand(nb_tr, 500), 1).astype(np.float32)),
        jnp.asarray(rng.rand(nb_tr, 500).astype(np.float32)),
        jnp.asarray(rng.rand(nb_tr, 500).astype(np.float32) * .1),
        jnp.full((nb_tr,), 500, jnp.int32))
    big = jnp.asarray(rng.randint(0, 100, (B, 40960)).astype(np.int32))

    @jax.jit
    def empty(x):
        return x + 1

    @jax.jit
    def conds16(x, big):
        st = (x, big)
        for i in range(16):
            st = jax.lax.cond(st[0][0, 0] < -1.0,
                              lambda s: (s[0] + 1, s[1] + 1),
                              lambda s: s, st)
        return st[0]

    @jax.jit
    def conds16run(x, big):
        st = (x, big)
        for i in range(16):
            st = jax.lax.cond(st[0][0, 0] > -1.0,
                              lambda s: (s[0] * 1.0000001, s[1]),
                              lambda s: s, st)
        return st[0]

    @jax.jit
    def decide4(vals, dtb, std_m):
        out = 0.0
        for ind in range(4):
            out = out + _recall_estimate(traces, dtb, vals, ind, 10, std_m)
        return out

    # fake multirow corpus: 4096 rows x 256 x 96 sq8
    db = jnp.asarray(rng.randint(0, 255, (4096, 256, 96)).astype(np.uint8))
    db_sq = jnp.asarray(rng.rand(4096, 256).astype(np.float32))
    vec_ids = jnp.asarray(
        rng.randint(0, 10_000_000, (4096, 256)).astype(np.int32))
    from auncel_tpu.index.scan import IVFArrays, scan_probe_range
    from auncel_tpu.ops.topk import init_topk, merge_topk_verified
    fake = IVFArrays(
        centroids=jnp.zeros((nlist, 96), jnp.float32),
        cent_sq=jnp.zeros((nlist,), jnp.float32),
        db=db, db_sq=db_sq, vec_ids=vec_ids,
        list_sizes=jnp.full((4096,), 256, jnp.int32),
        interdis=jnp.zeros((1, 1), jnp.float32),
        sq_scale=jnp.full((96,), 1e-2, jnp.float32),
        sq_bias=jnp.zeros((96,), jnp.float32))
    q = jnp.asarray(rng.rand(B, 96).astype(np.float32))
    q_sq = jnp.sum(q * q, -1)
    slots = jnp.asarray(
        rng.permutation(4096)[None, :].astype(np.int32))

    @jax.jit
    def scan4(q, q_sq):
        v, i = init_topk((B,), K, Metric.L2)
        f = jnp.zeros((B,), jnp.int32)
        lim = jnp.full((B,), 4096, jnp.int32)
        for w in range(4):
            v, i = scan_probe_range(fake, q, q_sq, slots, v, i, lim,
                                    f, 256, Metric.L2)
            f = f + 256
        return v

    @jax.jit
    def gather8k(q, q_sq):
        v, i = init_topk((B,), K, Metric.L2)
        lim = jnp.full((B,), 4096, jnp.int32)
        v, i = scan_probe_range(fake, q, q_sq, slots, v, i, lim, 0,
                                4096, Metric.L2)
        return v

    cand = jnp.asarray(rng.rand(B, 65536).astype(np.float32))
    cids = jnp.asarray(rng.randint(0, 1 << 30, (B, 65536)).astype(np.int32))

    @jax.jit
    def merge4(v0, i0):
        v, i = v0, i0
        for _ in range(4):
            v, i = merge_topk_verified(v, i, cand, cids, K, Metric.L2)
        return v

    x = jnp.zeros((1, 8), jnp.float32)
    v0, i0 = init_topk((B,), K, Metric.L2)
    log(f"empty       {timed(lambda: jax.device_get(empty(x))):7.2f} ms")
    log(f"conds16     {timed(lambda: jax.device_get(conds16(x, big))):7.2f} ms")
    log(f"conds16run  {timed(lambda: jax.device_get(conds16run(x, big))):7.2f} ms")
    log(f"decide4     {timed(lambda: jax.device_get(decide4(vals, dtb, jnp.float32(1.0)))):7.2f} ms")
    log(f"scan4       {timed(lambda: jax.device_get(scan4(q, q_sq))):7.2f} ms")
    log(f"gather8k    {timed(lambda: jax.device_get(gather8k(q, q_sq))):7.2f} ms")
    log(f"merge4      {timed(lambda: jax.device_get(merge4(v0, i0))):7.2f} ms")


if __name__ == "__main__":
    main()
