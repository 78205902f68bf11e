"""MXU speed-of-light microbench for the dense-scan contraction.

Measures sustained FLOP/s of the exact einsum shape masked_full_scan
executes (``[C, cap, d] x [B, d] -> [B, C, cap]``, f32 inputs) at
Precision.HIGHEST (the value-consistency requirement for the distance
path) and DEFAULT (bf16 passes) — the denominator for any claim about
how close the dense-scan crossover runs to the hardware ceiling
(RESULTS_r4 dense-scan section).

Usage: python scripts/mxu_sol.py [B] [C] [cap] [d]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np
import jax
import jax.numpy as jnp

import auncel_tpu  # noqa: F401  (enables the persistent compile cache)


def main(B=256, C=256, cap=256, d=96, reps=30):
    B, C, cap, d = int(B), int(C), int(cap), int(d)
    rng = np.random.RandomState(0)
    blk = jnp.asarray(rng.randn(C, cap, d).astype(np.float32))
    q = jnp.asarray(rng.randn(B, d).astype(np.float32))
    flops = 2.0 * B * C * cap * d

    for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("DEFAULT", jax.lax.Precision.DEFAULT)):
        @jax.jit
        def f(blk, q, prec=prec):
            return jnp.einsum("rcd,bd->brc", blk, q,
                              preferred_element_type=jnp.float32,
                              precision=prec)

        out = f(blk, q)
        np.asarray(out)  # force full sync (block_until_ready lies on axon)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(blk, q)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"einsum[{B},{C}x{cap},{d}] {name}: {dt * 1e3:.3f} ms "
              f"= {flops / dt / 1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main(*sys.argv[1:])
