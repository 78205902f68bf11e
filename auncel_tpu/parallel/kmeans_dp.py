"""Data-parallel k-means over a device mesh.

The reference trains its coarse quantizer single-node (Clustering.cpp); at
pod scale the assignment matmul dominates, so this shards the *points* over
the mesh and reduces per-cluster sums/counts with ``psum`` over ICI — the
classic DP training step for this framework (index construction is our
"training").
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from auncel_tpu.ops.distance import pairwise_l2sqr, sqnorms

AXIS = "shard"


def make_dp_kmeans_step(mesh: Mesh, k: int):
    """Returns a jitted SPMD step: (x_sharded [N, d], centroids [k, d]) ->
    (new_centroids [k, d], err scalar). Points sharded over AXIS,
    centroids replicated; cluster sums/counts psum-reduced."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(AXIS), P(None)),
        out_specs=(P(None, None), P()))  # centroids replicated, scalar err
    def step(x_local, centroids):
        dist = pairwise_l2sqr(x_local, centroids,
                              y_sqnorms=sqnorms(centroids))
        assign = jnp.argmin(dist, axis=-1)
        err_local = jnp.sum(jnp.min(dist, axis=-1))
        counts = jnp.zeros((k,), jnp.float32).at[assign].add(1.0)
        sums = jax.ops.segment_sum(x_local, assign, num_segments=k)
        counts = jax.lax.psum(counts, AXIS)
        sums = jax.lax.psum(sums, AXIS)
        err = jax.lax.psum(err_local, AXIS)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep empty clusters where they were (single-device k-means handles
        # splitting; the DP step is the scale-out inner loop)
        new_c = jnp.where((counts > 0)[:, None], new_c, centroids)
        return new_c, err

    return step


def dp_kmeans(x: np.ndarray, k: int, mesh: Mesh, niter: int = 25,
              seed: int = 1234):
    """Full DP k-means driver: shard points once, iterate the SPMD step.

    The last ``n % n_dev`` points (at most n_dev - 1) are excluded from
    the fit so the shard split is even — statistically negligible for
    clustering, but centroids/err are therefore not bit-identical to a
    single-device run on the same data."""
    n = x.shape[0]
    n_dev = mesh.shape[AXIS]
    n_fit = (n // n_dev) * n_dev
    xs = jax.device_put(
        jnp.asarray(x[:n_fit]),
        jax.sharding.NamedSharding(mesh, P(AXIS)))
    rng = np.random.RandomState(seed)
    centroids = jnp.asarray(x[rng.permutation(n)[:k]])
    step = make_dp_kmeans_step(mesh, k)
    err = None
    for _ in range(niter):
        centroids, err = step(xs, centroids)
    return np.asarray(centroids), float(err)
