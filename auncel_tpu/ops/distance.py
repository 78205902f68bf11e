"""Pairwise distance primitives.

Capability parity with the reference's L0 kernels
(``/root/reference/Auncel/utils_simd.cpp`` ``fvec_L2sqr``/``fvec_inner_product``
and the blocked SGEMM path ``knn_L2sqr_blas``, ``utils.cpp:538-614``) — but
expressed as single MXU matmuls: L2sqr uses the ``|x|^2 + |y|^2 - 2 x.y``
expansion so the whole pairwise block is one ``dot_general`` plus rank-1
updates, which XLA fuses.

All functions return *actual* metric values (not rank-equivalent surrogates):
the error-profile engine matches intermediate distances against ground-truth
distances by value (reference ``kscaling``, ``IVF_pro.cpp:72-82``), so every
search path in this framework must produce the same distance for the same
(query, vector) pair. Keep inputs float32 and accumulate in float32.
"""

import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric


def sqnorms(x: jax.Array) -> jax.Array:
    """Squared L2 norms over the last axis. [..., d] -> [...]."""
    return jnp.sum(jnp.square(x), axis=-1)


# TPU MXU matmuls on float32 inputs default to bfloat16 passes; distance
# values feed the error-profile's value matching and the user-visible bound
# check, so the distance path pins full float32 precision explicitly.
# (The optional bf16-storage fast path controls precision via its own dtype.)
_PRECISION = jax.lax.Precision.HIGHEST


def pairwise_ip(x: jax.Array, y: jax.Array) -> jax.Array:
    """Inner products. x: [n, d], y: [m, d] -> [n, m]."""
    return jax.lax.dot_general(
        x, y,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PRECISION,
    )


def pairwise_l2sqr(
    x: jax.Array,
    y: jax.Array,
    y_sqnorms: jax.Array | None = None,
    x_sqnorms: jax.Array | None = None,
) -> jax.Array:
    """Squared L2 distances. x: [n, d], y: [m, d] -> [n, m].

    Pass precomputed ``y_sqnorms`` when y is a stored corpus: reusing one
    norm vector across the brute-force and IVF paths keeps distance values
    bit-stable between them (required for the profile trainer's value
    matching).
    """
    xn = sqnorms(x) if x_sqnorms is None else x_sqnorms
    yn = sqnorms(y) if y_sqnorms is None else y_sqnorms
    d = xn[:, None] + yn[None, :] - 2.0 * pairwise_ip(x, y)
    # identical vectors can go epsilon-negative through the expansion;
    # the reference clamps the same way (utils.cpp:592-595) and EVERY
    # L2 path here clamps identically, so value consistency holds
    return jnp.maximum(d, 0.0)


def pairwise_scores(
    x: jax.Array,
    y: jax.Array,
    metric: Metric,
    y_sqnorms: jax.Array | None = None,
    x_sqnorms: jax.Array | None = None,
) -> jax.Array:
    """Metric values: L2 -> squared distances (smaller better), IP -> dot
    products (larger better)."""
    if metric is Metric.L2:
        return pairwise_l2sqr(x, y, y_sqnorms=y_sqnorms, x_sqnorms=x_sqnorms)
    return pairwise_ip(x, y)
