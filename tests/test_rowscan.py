"""Worklist row-scan kernel: interpret-mode correctness vs the XLA path."""

import numpy as np
import jax.numpy as jnp

from auncel_tpu.pallas_kernels.rowscan import rowscan_dots, TCHUNK


def test_rowscan_matches_xla_interpret():
    rng = np.random.RandomState(3)
    n_rows, row_cap, d = 24, 8, 16
    db = rng.randn(n_rows, row_cap, d).astype(np.float32)
    T = 2 * TCHUNK
    work = rng.randint(0, n_rows, T).astype(np.int32)
    qs = rng.randn(T, d).astype(np.float32)
    got = np.asarray(rowscan_dots(jnp.asarray(db), jnp.asarray(work),
                                  jnp.asarray(qs), interpret=True))
    want = np.einsum("tcd,td->tc", db[work], qs)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
