"""Batched Lloyd's k-means for IVF coarse quantizer training.

Capability parity with the reference's ``Clustering::train``
(``/root/reference/Auncel/Clustering.cpp:77-244``) and
``km_update_centroids`` (``utils.cpp:1078``):

  * subsample to ``k * max_points_per_centroid`` training points,
  * random-permutation centroid init,
  * ``niter`` rounds of {assign -> mean update -> empty-cluster split},
  * optional spherical renormalization for inner-product metrics
    (``Clustering.cpp:63-74``),
  * ``nredo`` restarts keeping the lowest-error run.

TPU-first recast: assignment is a blocked pairwise-distance matmul + argmin
(one MXU pass per block); the centroid update is a ``segment_sum`` scatter;
the empty-cluster split is a deterministic "largest donor" rule instead of
the reference's RNG-weighted pick (same capability — no cluster stays empty —
without host RNG state in the loop).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from auncel_tpu.types import Metric
from auncel_tpu.ops.distance import pairwise_l2sqr, sqnorms


def imbalance_factor(assign: np.ndarray, k: int) -> float:
    """Cluster-size imbalance diagnostic (reference imbalance_factor,
    utils.cpp:1056-1076): k * sum(hist^2) / n^2 — 1.0 for perfectly
    balanced clusters, k when everything lands in one cell. The
    reference's Clustering prints it per iteration; here it is the
    layout-skew statistic callers use to pick between the padded and
    multirow scan layouts."""
    hist = np.bincount(np.asarray(assign, np.int64), minlength=k)
    n = float(hist.sum())
    if n == 0:
        return 0.0
    return float((hist.astype(np.float64) ** 2).sum() * k / (n * n))


class KmeansParams(NamedTuple):
    niter: int = 25                      # Clustering.h:22 (IVF sets 25)
    nredo: int = 1
    max_points_per_centroid: int = 256   # Clustering.h:22
    spherical: bool = False
    seed: int = 1234                     # ClusteringParameters seed
    verbose: bool = False
    assign_block: int = 65536
    init: str = "kmeans++"               # "kmeans++" | "random"
    # kmeans++ D^2-sampled init is an upgrade over the reference's random
    # permutation init (Clustering.cpp:150-155): better-balanced clusters
    # mean less padding waste in the dense [nlist, cap, d] IVF layout.
    balance_iters: int = 6
    # In the last `balance_iters` Lloyd rounds, clusters starved below
    # `starve_frac` x mean size are teleported as +/-eps splits of the
    # largest clusters (a generalization of the reference's empty-cluster
    # split). The padded dense layout's memory AND scan bandwidth scale
    # with the max list size, so taming 4-5x mega-cells matters more here
    # than the tiny quantization-error increase.
    starve_frac: float = 0.25


class KmeansResult(NamedTuple):
    centroids: np.ndarray  # [k, d] float32
    error: float           # sum of squared distances to assigned centroid


@functools.partial(jax.jit, static_argnames=("block",))
def _assign(x, centroids, c_sq, block):
    """[n, d] points -> (assignment [n] int32, sqdist to assigned [n])."""
    n = x.shape[0]
    nsteps = n // block

    def body(i, carry):
        a, e = carry
        xb = jax.lax.dynamic_slice_in_dim(x, i * block, block, 0)
        d = pairwise_l2sqr(xb, centroids, y_sqnorms=c_sq)
        idx = jnp.argmin(d, axis=-1).astype(jnp.int32)
        dmin = jnp.min(d, axis=-1)
        a = jax.lax.dynamic_update_slice_in_dim(a, idx, i * block, 0)
        e = jax.lax.dynamic_update_slice_in_dim(e, dmin, i * block, 0)
        return a, e

    init = (jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.float32))
    return jax.lax.fori_loop(0, nsteps, body, init)


@functools.partial(jax.jit, static_argnames=("k", "spherical"))
def _update(x, assign, k, spherical, starve_threshold=0.0):
    """Mean update + deterministic empty/starved-cluster split
    (km_update_centroids semantics, utils.cpp:1078: an empty cluster steals
    a perturbed copy of a big cluster's centroid; we optionally extend
    "empty" to "starved" to balance list sizes for the padded layout)."""
    n, d = x.shape
    counts = jnp.zeros((k,), jnp.float32).at[assign].add(1.0)
    sums = jax.ops.segment_sum(x, assign, num_segments=k)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]

    # Empty-cluster split: the i-th empty cluster copies the i-th largest
    # cluster's centroid with a +/- eps symmetric perturbation (eps = 1/1024,
    # alternating sign by dimension — reference utils.cpp:1118-1133).
    eps = 1.0 / 1024.0
    is_empty = counts <= starve_threshold
    donor_order = jnp.argsort(-counts)            # largest first
    empty_rank = jnp.cumsum(is_empty.astype(jnp.int32)) - 1  # rank among empties
    # donors must be NON-empty: when empties outnumber donors (k >> n),
    # ranks past the non-empty prefix would draw empty donors whose mean
    # is the origin, freezing those centroids at 0 forever — cycle
    # through the real clusters instead
    n_donors = jnp.maximum(jnp.sum(~is_empty), 1)
    donor = donor_order[jnp.clip(empty_rank, 0, k - 1) % n_donors]
    sign = jnp.where(jnp.arange(d) % 2 == 0, 1.0, -1.0)[None, :]
    stolen = centroids[donor] * (1.0 + eps * sign)
    centroids = jnp.where(is_empty[:, None], stolen, centroids)
    # The donor itself gets the opposite perturbation so the pair splits.
    perturbed_donor = centroids * (1.0 - eps * sign)
    donor_hit = jnp.zeros((k,), bool).at[donor].max(is_empty, mode="drop")
    centroids = jnp.where(donor_hit[:, None], perturbed_donor, centroids)

    if spherical:
        norms = jnp.sqrt(jnp.maximum(sqnorms(centroids), 1e-20))
        centroids = centroids / norms[:, None]
    return centroids, counts


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(x, key, k):
    """k-means++ seeding: each next centroid sampled proportional to squared
    distance from the nearest already-chosen centroid."""
    n, d = x.shape
    key0, key = jax.random.split(key)
    first = jax.random.randint(key0, (), 0, n)
    cents = jnp.zeros((k, d), x.dtype).at[0].set(x[first])
    x_sq = sqnorms(x)
    dmin0 = jnp.full((n,), jnp.inf, jnp.float32)

    def body(i, carry):
        cents, dmin, key = carry
        c = cents[i - 1]
        dist = x_sq + jnp.sum(jnp.square(c)) - 2.0 * (x @ c)
        dmin = jnp.minimum(dmin, jnp.maximum(dist, 0.0))
        key, sub = jax.random.split(key)
        # D^2 sampling via the Gumbel-max trick: argmax(log w + Gumbel) is an
        # exact categorical draw, with a far cheaper lowering than
        # jax.random.choice(p=...) inside a fori_loop.
        idx = jnp.argmax(jnp.log(jnp.maximum(dmin, 1e-30)) +
                         jax.random.gumbel(sub, dmin.shape))
        cents = cents.at[i].set(x[idx])
        return cents, dmin, key

    cents, _, _ = jax.lax.fori_loop(1, k, body, (cents, dmin0, key))
    return cents


class Kmeans:
    """Convenience wrapper mirroring the reference Python API
    (``python/faiss.py`` Kmeans class, SURVEY.md §2 #28): train + assign."""

    def __init__(self, d: int, k: int, niter: int = 25, seed: int = 1234,
                 spherical: bool = False, verbose: bool = False):
        self.d, self.k = d, k
        self.params = KmeansParams(niter=niter, seed=seed,
                                   spherical=spherical, verbose=verbose)
        self.centroids: np.ndarray | None = None
        self.obj: float | None = None

    def train(self, x) -> float:
        res = kmeans(x, self.k, self.params)
        self.centroids = res.centroids
        self.obj = res.error
        return res.error

    def assign(self, x) -> np.ndarray:
        from auncel_tpu.ops.knn import knn
        return knn(x, self.centroids, 1, Metric.L2).ids[:, 0]


def kmeans(
    x,
    k: int,
    params: KmeansParams = KmeansParams(),
    metric: Metric = Metric.L2,
) -> KmeansResult:
    """Train k centroids on x [n, d] (numpy in / numpy out)."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    rng = np.random.RandomState(params.seed)
    spherical = params.spherical or metric is Metric.IP

    # Subsample (Clustering.cpp:91-103).
    max_n = k * params.max_points_per_centroid
    if n > max_n:
        sel = rng.permutation(n)[:max_n]
        x = x[sel]
        n = max_n

    block = min(params.assign_block, n)
    n_fit = (n // block) * block
    if n_fit == 0:
        block, n_fit = n, n
    xd_full = jnp.asarray(x)
    xd = xd_full[:n_fit]

    best: KmeansResult | None = None
    for redo in range(params.nredo):
        if params.init == "kmeans++":
            key = jax.random.PRNGKey(params.seed + 7919 * redo)
            centroids = _kmeanspp_init(xd_full, key, k)
        else:
            perm = rng.permutation(n)[:k]
            centroids = jnp.asarray(x[perm])
        if spherical:
            centroids = centroids / jnp.sqrt(
                jnp.maximum(sqnorms(centroids), 1e-20))[:, None]
        err_dev = None
        for it in range(params.niter):
            from auncel_tpu.index.aux import InterruptCallback
            InterruptCallback.check()  # AuxIndexStructures.h:250 hook
            c_sq = sqnorms(centroids)
            assign, dists = _assign(xd, centroids, c_sq, block)
            err_dev = jnp.sum(dists)  # fetched once after the loop:
            # balance in late-but-not-last rounds so every teleported
            # centroid still gets Lloyd-refined afterwards
            balancing = (params.niter - 1 - params.balance_iters <= it
                         < params.niter - 1)
            thr = (params.starve_frac * n_fit / k) if balancing else 0.0
            centroids, _ = _update(xd, assign, k, spherical,
                                   starve_threshold=jnp.float32(thr))
            if params.verbose:  # verbose forces a 40ms+ host sync per iter
                print(f"  kmeans redo {redo} iter {it}: "
                      f"err={float(err_dev):.4g}")
        err = float(err_dev) if err_dev is not None else np.inf
        if best is None or err < best.error:
            best = KmeansResult(np.asarray(centroids), err)
    assert best is not None
    return best
