"""Reconstruct-from-neighbors refinement for HNSW storage.

Parity target: reference ``ReconstructFromNeighbors``
(IndexHNSW.h:25-63, IndexHNSW.cpp:635-870): vector i is re-estimated as
a weighted combination of the storage reconstructions of i itself and
its M level-0 graph neighbors; the weight vector beta (length M+1) is
chosen per ``nsq`` subvector segment from a k-row codebook, storing only
``nsq`` bytes per vector. With compressed graph storage (HNSWSQ/PQ/
2Level) this tightens reconstructions — the neighbors carry information
the per-vector code lost.

TPU-first deviations:
  * the reference LOADS an externally trained codebook; here
    ``train_codebook`` fits one — per-node least-squares betas (batched
    normal-equation solve) clustered by k-means per segment.
  * estimate/reconstruct/distance paths are batched device programs
    (one einsum over [n, k, M+1, dsub]), not per-node loops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.ops.kmeans import kmeans, KmeansParams
from auncel_tpu.types import Metric


class ReconstructFromNeighbors:
    def __init__(self, index, k: int = 256, nsq: int = 1):
        assert index.d % nsq == 0
        assert 1 <= k <= 256, "codes are one byte per segment"
        self.index = index
        self.k = int(k)
        self.nsq = int(nsq)
        self.M = 2 * index.M          # level-0 neighbor cap
        self.dsub = index.d // nsq
        self.code_size = nsq
        self.codebook: np.ndarray | None = None  # [nsq, k, M+1]
        self.codes = np.zeros((0, nsq), np.uint8)

    @property
    def ntotal(self) -> int:
        return int(self.codes.shape[0])

    # ---------------------------------------------------------- tables

    def get_neighbor_table(self, ids: np.ndarray) -> np.ndarray:
        """[n, M+1, d]: row 0 = storage reconstruction of the node, rows
        1..M = its level-0 neighbors (absent links repeat the node, as
        the reference does: ``if (ji < 0) ji = i``)."""
        idx = self.index
        assert idx._built, "build the graph before reconstructing"
        ids = np.asarray(ids, np.int64)
        rows = idx.g2u[0][ids]
        nbrs = idx.nb_tables[0][rows]              # [n, M] global ids
        nbrs = np.where(nbrs < 0, ids[:, None], nbrs)
        xb = idx._xb   # host mirror == decoded storage reconstructions
        return np.concatenate([xb[ids][:, None, :], xb[nbrs]], 1)

    # ----------------------------------------------------------- train

    def train_codebook(self, x: np.ndarray,
                       ids: np.ndarray | None = None) -> None:
        """Fit the per-segment beta codebook on true vectors ``x`` for
        stored nodes ``ids`` (default: the first len(x) nodes)."""
        x = np.asarray(x, np.float32)
        ids = (np.arange(len(x)) if ids is None
               else np.asarray(ids, np.int64))
        T = self.get_neighbor_table(ids)           # [n, M+1, d]
        n = len(ids)
        books = np.empty((self.nsq, self.k, self.M + 1), np.float32)
        for s in range(self.nsq):
            seg = slice(s * self.dsub, (s + 1) * self.dsub)
            A = T[:, :, seg]                        # [n, M+1, dsub]
            G = np.einsum("nid,njd->nij", A, A)
            G += 1e-4 * np.trace(G, axis1=1, axis2=2)[:, None, None] \
                * np.eye(self.M + 1)[None] / (self.M + 1)
            b = np.einsum("nid,nd->ni", A, x[:, seg])
            betas = np.linalg.solve(G, b[..., None])[..., 0] \
                .astype(np.float32)
            kk = min(self.k, n)
            cents = kmeans(betas, kk, KmeansParams(niter=10),
                           Metric.L2).centroids
            if kk < self.k:                          # pad duplicate rows
                cents = np.concatenate(
                    [cents, np.repeat(cents[:1], self.k - kk, 0)], 0)
            books[s] = cents
        self.codebook = books

    # ------------------------------------------------------- add_codes

    def add_codes(self, x: np.ndarray, ids: np.ndarray | None = None,
                  chunk: int = 8192) -> None:
        """Pick the best codebook row per (node, segment)
        (reference estimate_code: argmin reconstruction error)."""
        assert self.codebook is not None, "train_codebook first"
        x = np.asarray(x, np.float32)
        ids = (np.arange(self.ntotal, self.ntotal + len(x))
               if ids is None else np.asarray(ids, np.int64))
        books = jnp.asarray(self.codebook)
        out = np.empty((len(x), self.nsq), np.uint8)
        for c0 in range(0, len(x), chunk):
            c1 = min(c0 + chunk, len(x))
            T = jnp.asarray(self.get_neighbor_table(ids[c0:c1]))
            out[c0:c1] = np.asarray(
                _estimate(books, T, jnp.asarray(x[c0:c1]), self.nsq))
        self.codes = np.concatenate([self.codes, out], 0)

    # ----------------------------------------------------- reconstruct

    def reconstruct_n(self, i0: int = 0, n: int | None = None,
                      chunk: int = 8192) -> np.ndarray:
        assert self.codebook is not None
        n = self.ntotal - i0 if n is None else n
        books = jnp.asarray(self.codebook)
        out = np.empty((n, self.index.d), np.float32)
        for c0 in range(0, n, chunk):
            c1 = min(c0 + chunk, n)
            ids = np.arange(i0 + c0, i0 + c1)
            T = jnp.asarray(self.get_neighbor_table(ids))
            out[c0:c1] = np.asarray(_reconstruct(
                books, T, jnp.asarray(self.codes[i0 + c0:i0 + c1]),
                self.nsq))
        return out

    def reconstruct(self, i: int) -> np.ndarray:
        return self.reconstruct_n(int(i), 1)[0]

    def compute_distances(self, q: np.ndarray,
                          shortlist: np.ndarray) -> np.ndarray:
        """L2 distances of each query to its shortlist's refined
        reconstructions (reference compute_distances — the re-rank hook
        IndexHNSW::search uses when reconstruct_from_neighbors is set)."""
        q = np.asarray(q, np.float32)
        shortlist = np.asarray(shortlist, np.int64)
        B, K = shortlist.shape
        flat = shortlist.reshape(-1)
        ok = flat >= 0
        recon = np.zeros((flat.size, self.index.d), np.float32)
        if ok.any():
            books = jnp.asarray(self.codebook)
            T = jnp.asarray(self.get_neighbor_table(flat[ok]))
            recon[ok] = np.asarray(_reconstruct(
                books, T, jnp.asarray(self.codes[flat[ok]]), self.nsq))
        recon = recon.reshape(B, K, -1)
        d = np.sum(np.square(q[:, None, :] - recon), -1)
        return np.where(ok.reshape(B, K), d, np.inf).astype(np.float32)


import functools


@functools.partial(jax.jit, static_argnames=("nsq",))
def _estimate(books, T, x, nsq: int):
    """argmin_k ||beta_k @ T_seg - x_seg||^2 per segment -> uint8 codes."""
    n, Mp1, d = T.shape
    dsub = d // nsq
    Ts = T.reshape(n, Mp1, nsq, dsub)
    xs = x.reshape(n, nsq, dsub)
    # [n, nsq, k, dsub] = [nsq, k, M+1] @ [n, M+1, nsq, dsub]
    rec = jnp.einsum("ski,nisd->nskd", books, Ts,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    err = jnp.sum(jnp.square(rec - xs[:, :, None, :]), -1)
    return jnp.argmin(err, -1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("nsq",))
def _reconstruct(books, T, codes, nsq: int):
    n, Mp1, d = T.shape
    dsub = d // nsq
    Ts = T.reshape(n, Mp1, nsq, dsub)
    beta = books[jnp.arange(nsq)[None, :], codes.astype(jnp.int32)]
    rec = jnp.einsum("nsi,nisd->nsd", beta, Ts,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return rec.reshape(n, d)
