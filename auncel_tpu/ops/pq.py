"""Product quantization.

Capability parity with the reference's ``ProductQuantizer``
(SURVEY.md §2 #16, ``Auncel/ProductQuantizer.{h,cpp}``): the vector space is
split into M subspaces of d/M dims, each trained to its own 256-centroid
codebook; a vector is stored as M uint8 codes (d*4 -> M bytes). ADC distance
to a code equals the exact L2 distance to the code's reconstruction (the
subspaces partition the dimensions), so on TPU the scan path simply
*decodes in-VMEM* and reuses the dense distance kernel — no per-element
LUT gathers, the MXU does the work on reconstructions.

Residual encoding (the reference's IVFPQ ``by_residual`` default) is
implemented in the IVF layer: codes approximate ``x - centroid[list]`` and
the scan threads the per-probe centroid shift through the distance
(``index/ivf.py`` storage="pqM" with ``pq_residual=True``,
``index/scan.py`` pq_residual branches).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.ops.kmeans import kmeans, KmeansParams

KSUB = 256  # codes per subspace (uint8)


class PQCodebooks(NamedTuple):
    codebooks: jax.Array  # [M, KSUB, dsub] float32

    @property
    def M(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]


def train_pq(x: np.ndarray, M: int, niter: int = 15,
             seed: int = 1234) -> PQCodebooks:
    """Train M per-subspace codebooks (reference ProductQuantizer::train:
    k-means per subspace)."""
    n, d = x.shape
    assert d % M == 0, f"d={d} must be divisible by M={M}"
    dsub = d // M
    books = np.empty((M, KSUB, dsub), np.float32)
    for m in range(M):
        sub = np.ascontiguousarray(x[:, m * dsub:(m + 1) * dsub])
        res = kmeans(sub, KSUB,
                     KmeansParams(niter=niter, seed=seed + m,
                                  balance_iters=0))
        books[m] = res.centroids
    return PQCodebooks(jnp.asarray(books))


@jax.jit
def encode_pq(pq: PQCodebooks, x: jax.Array) -> jax.Array:
    """[n, d] -> [n, M] uint8 codes (argmin per subspace)."""
    n, d = x.shape
    M, _, dsub = pq.codebooks.shape
    xs = x.reshape(n, M, dsub)
    # [n, M, KSUB] distances via batched matmul over subspaces
    dots = jnp.einsum("nmd,mkd->nmk", xs, pq.codebooks,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    c_sq = jnp.sum(jnp.square(pq.codebooks), -1)  # [M, KSUB]
    dist = c_sq[None] - 2.0 * dots                # + ||x||^2 (rank-invariant)
    return jnp.argmin(dist, axis=-1).astype(jnp.uint8)


def decode_pq(pq: PQCodebooks, codes: jax.Array) -> jax.Array:
    """[..., M] uint8 -> [..., d] reconstructions."""
    M, _, dsub = pq.codebooks.shape
    flat = pq.codebooks.reshape(M * KSUB, dsub)
    offs = jnp.arange(M, dtype=jnp.int32) * KSUB
    idx = codes.astype(jnp.int32) + offs  # [..., M]
    rec = flat[idx]                       # [..., M, dsub]
    return rec.reshape(codes.shape[:-1] + (M * dsub,))
