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


class MultiIndexQuantizer:
    """Standalone product-cell quantizer index (reference
    ``MultiIndexQuantizer``, IndexPQ.h:135 / IndexPQ.cpp): ``search``
    returns the k nearest PRODUCT cells (id = mixed-radix code over the
    per-subspace codebooks); ``add`` is unsupported, exactly like the
    reference (it quantizes, it does not store vectors).

    TPU recast of the reference's exact multi-sequence heap walk: the
    per-subspace distance tables are combined by progressive broadcast
    addition into the full [B, ksub^M] product and ranked with one exact
    ``lax.top_k`` — exact for ksub^M up to ~1M cells (every IMI2x%d
    configuration in the factory grammar); beyond that the walk would be
    needed and we raise rather than silently approximate."""

    MAX_CELLS = 1 << 20

    def __init__(self, d: int, M: int = 2, nbits: int = 8):
        assert d % M == 0, "d must divide into M subspaces"
        self.d = d
        self.M = M
        self.nbits = nbits
        self.ksub = 1 << nbits
        if self.ksub ** M > self.MAX_CELLS:
            raise NotImplementedError(
                f"MultiIndexQuantizer product {self.ksub}^{M} exceeds the "
                f"exact-ranking cap {self.MAX_CELLS}")
        self.metric = Metric.L2  # reference MIQ is L2-only
        self.is_trained = False
        self.codebooks: list[np.ndarray] = []   # M x [ksub, d/M]

    @property
    def ntotal(self) -> int:
        # the "stored set" is the product-cell grid (IndexPQ.cpp sets
        # ntotal = ksub^M after train)
        return self.ksub ** self.M if self.is_trained else 0

    def train(self, x: np.ndarray) -> None:
        from auncel_tpu.ops.kmeans import kmeans, KmeansParams
        x = np.asarray(x, np.float32)
        dsub = self.d // self.M
        self.codebooks = [
            kmeans(np.ascontiguousarray(x[:, m * dsub:(m + 1) * dsub]),
                   self.ksub, KmeansParams(), Metric.L2).centroids
            for m in range(self.M)]
        self.is_trained = True

    def add(self, x, ids=None):
        raise RuntimeError(
            "MultiIndexQuantizer: add does not make sense (IndexPQ.cpp)")

    def search(self, q: np.ndarray, k: int):
        """k nearest product cells: exact distances (the L2 square splits
        across disjoint subspaces, so the product distance is the sum of
        per-subspace table entries)."""
        import jax
        import jax.numpy as jnp
        from auncel_tpu.ops.distance import pairwise_l2sqr
        assert self.is_trained
        q = np.asarray(q, np.float32)
        dsub = self.d // self.M
        tabs = []
        for m in range(self.M):
            sub = jnp.asarray(np.ascontiguousarray(
                q[:, m * dsub:(m + 1) * dsub]))
            tabs.append(pairwise_l2sqr(sub, jnp.asarray(self.codebooks[m])))
        total = tabs[0]
        for t in tabs[1:]:
            total = (total[:, :, None] + t[:, None, :]).reshape(
                q.shape[0], -1)
        vals, ids = jax.lax.top_k(-total, min(k, total.shape[1]))
        vals, ids = jax.device_get((-vals, ids))
        if k > total.shape[1]:
            pad = k - total.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)),
                          constant_values=np.inf)
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return vals.astype(np.float32), ids.astype(np.int64)

    def reconstruct(self, key: int) -> np.ndarray:
        """Product centroid of cell ``key`` (mixed-radix decode, matching
        the reference's code layout: the FIRST subspace is the most
        significant digit, IndexPQ.cpp MultiIndexQuantizer::reconstruct)."""
        out = np.empty(self.d, np.float32)
        dsub = self.d // self.M
        for m in reversed(range(self.M)):
            out[m * dsub:(m + 1) * dsub] = self.codebooks[m][key % self.ksub]
            key //= self.ksub
        return out

    def reset(self):
        pass  # nothing stored


class MultiIndexQuantizer2(MultiIndexQuantizer):
    """MIQ whose sub-quantizer assignment runs through arbitrary
    sub-indexes (reference ``MultiIndexQuantizer2``, IndexPQ.h:160):
    each subspace is ranked by its assign-index (typically approximate,
    e.g. HNSW over the sub-centroids) instead of exhaustively; the
    combined product ranking then uses the sub-indexes' shortlists only.
    Exact when the assign indexes are exact."""

    def __init__(self, d: int, M: int, nbits: int, assign_indexes: list):
        super().__init__(d, M, nbits)
        assert len(assign_indexes) == M
        self.assign_indexes = assign_indexes

    def train(self, x: np.ndarray) -> None:
        super().train(x)
        for m, sub in enumerate(self.assign_indexes):
            sub.reset()
            if not sub.is_trained:
                sub.train(self.codebooks[m])
            sub.add(self.codebooks[m])

    def search(self, q: np.ndarray, k: int):
        """Per-subspace shortlist via the assign indexes, then exact
        combination over the shortlist product (k' = max(k, 32) per
        subspace covers the true top-k unless the assign index itself
        misses)."""
        assert self.is_trained
        q = np.asarray(q, np.float32)
        B = q.shape[0]
        dsub = self.d // self.M
        kp = min(self.ksub, max(k, 32))
        dists, idxs = [], []
        for m, sub in enumerate(self.assign_indexes):
            dm, im = sub.search(
                np.ascontiguousarray(q[:, m * dsub:(m + 1) * dsub]), kp)
            dists.append(np.asarray(dm, np.float32))
            idxs.append(np.asarray(im, np.int64))
        total = dists[0]
        code = idxs[0]
        for dm, im in zip(dists[1:], idxs[1:]):
            total = (total[:, :, None] + dm[:, None, :]).reshape(B, -1)
            code = (code[:, :, None] * self.ksub
                    + im[:, None, :]).reshape(B, -1)
        order = np.argsort(total, axis=1, kind="stable")[:, :k]
        vals = np.take_along_axis(total, order, 1)
        ids = np.take_along_axis(code, order, 1)
        if k > vals.shape[1]:
            pad = k - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=np.inf)
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return vals, ids
