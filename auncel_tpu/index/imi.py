"""IMI (inverted multi-index) coarse quantizer.

Capability parity with the reference's ``IMI2x%d`` factory cell
(``/root/reference/Auncel/AutoTune.cpp:807``) backed by
``MultiIndexQuantizer`` (``IndexPQ.cpp``): the coarse quantizer is a
2-subspace product quantizer — each half of the vector gets its own
2^nbit-centroid codebook, and a coarse cell is a PAIR of sub-centroids,
giving nlist = 4^nbit cells from 2*2^nbit trained centroids.

TPU-first recast: the reference ranks product cells with a heap-based
multi-sequence walk over d1[i]+d2[j] (a CPU workaround for never
materializing the product). Here the product centroids ARE materialized
([K^2, d] = concat(c1[i], c2[j])) and ranking is the standard exact MXU
matmul over all cells — so the whole IVF stack downstream (inter-centroid
boundary geometry, error profiles, bounded search) works over IMI cells
unchanged. Assignment decomposes exactly: argmin over the product equals
the per-subspace argmin pair (L2 splits across disjoint dims), so corpus
assignment never touches the materialized product.
"""

import numpy as np

from auncel_tpu.types import Metric
from auncel_tpu.ops.kmeans import kmeans, KmeansParams


def train_imi_centroids(x: np.ndarray, nlist: int, metric: Metric,
                        params: KmeansParams | None = None) -> np.ndarray:
    """Train the two subspace codebooks and materialize the product
    centroids [nlist, d]. ``nlist`` must be a square (4^nbit)."""
    x = np.asarray(x, np.float32)
    d = x.shape[1]
    K = int(round(np.sqrt(nlist)))
    if K * K != nlist:
        raise ValueError(f"IMI nlist must be a perfect square, got {nlist}")
    if d % 2 != 0:
        raise ValueError("IMI needs an even dimension (2 subspaces)")
    h = d // 2
    params = params or KmeansParams()
    # subspace metric is always L2 (the reference's MultiIndexQuantizer
    # trains plain k-means per subspace); IP indexes L2-normalize upstream
    c1 = kmeans(x[:, :h], K, params, Metric.L2).centroids
    c2 = kmeans(x[:, h:], K, params, Metric.L2).centroids
    prod = np.empty((K * K, d), np.float32)
    prod[:, :h] = np.repeat(c1, K, axis=0)
    prod[:, h:] = np.tile(c2, (K, 1))
    return prod


def imi_assign(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Exact cell assignment via per-subspace argmin (= argmin over the
    product for L2, since the squared distance splits across halves)."""
    from auncel_tpu.ops.knn import knn
    n = centroids.shape[0]
    K = int(round(np.sqrt(n)))
    d = centroids.shape[1]
    h = d // 2
    c1 = centroids[::K, :h]            # unique first-half codebook
    c2 = centroids[:K, h:]             # unique second-half codebook
    i1 = knn(np.ascontiguousarray(x[:, :h]), c1, 1, Metric.L2,
             q_block=65536).ids[:, 0]
    i2 = knn(np.ascontiguousarray(x[:, h:]), c2, 1, Metric.L2,
             q_block=65536).ids[:, 0]
    return (i1 * K + i2).astype(np.int64)
