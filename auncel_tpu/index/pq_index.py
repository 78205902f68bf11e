"""Standalone product-quantizer index.

Capability parity with the reference's ``IndexPQ`` (``IndexPQ.{h,cpp}``):
vectors stored as M-byte PQ codes, searched by asymmetric distance, with
the optional POLYSEMOUS filter (``IndexPQ.h:24`` ``search_type
ST_polysemous`` + ``polysemous_ht``): codebooks are reordered offline so
code Hamming distance tracks centroid distance, and at query time
candidates whose code is more than ``ht`` Hamming away from the query's
code are excluded before exact evaluation.

TPU recast: ADC becomes decode-and-contract on the MXU (exact same values
as a table-based ADC: the subspaces partition the dimensions), computed
block-wise over the code array; the Hamming filter is a popcount-table
gather + mask fused into the same scan. On a TPU the filter does not skip
FLOPs the way the reference's scalar loop does (the block is computed
anyway and masked) — the CAPABILITY (identical filtered result sets) is
what carries over, and the Hamming side costs ~M bytes/vector of extra
traffic.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric, worst_value
from auncel_tpu.index.base import Index
from auncel_tpu.ops.pq import PQCodebooks, train_pq, encode_pq, decode_pq
from auncel_tpu.ops.topk import topk_scores, init_topk
from auncel_tpu.ops.polysemous import reorder_codebook, POPCOUNT8


@functools.partial(jax.jit, static_argnames=("k", "metric", "block"))
def _pq_scan(pq_books, codes, q, qcodes, ht, n_real, k, metric, block):
    """Blocked ADC scan with optional Hamming filter. ``ht < 0`` disables
    the filter (one compiled program serves both modes)."""
    n = codes.shape[0]
    B = q.shape[0]
    pq = PQCodebooks(pq_books)
    worst = worst_value(metric)
    pop = jnp.asarray(POPCOUNT8)
    n_blocks = n // block
    q_sq = jnp.sum(jnp.square(q), -1)

    def body(bi, carry):
        rvals, rids = carry
        blk = jax.lax.dynamic_slice_in_dim(codes, bi * block, block, 0)
        rec = decode_pq(pq, blk)                       # [block, d]
        dots = jnp.einsum("nd,bd->bn", rec, q,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        if metric is Metric.L2:
            scores = jnp.maximum(
                q_sq[:, None] + jnp.sum(jnp.square(rec), -1)[None]
                - 2.0 * dots, 0.0)
        else:
            scores = dots
        # polysemous filter: Hamming(query code, db code) <= ht
        ham = jnp.sum(pop[(blk[None, :, :] ^ qcodes[:, None, :]).astype(
            jnp.int32)], axis=-1)                      # [B, block]
        ids = bi * block + jax.lax.broadcasted_iota(
            jnp.int32, (B, block), 1)
        ok = ((ht < 0) | (ham <= ht)) & (ids < n_real)  # n_real: padding out
        scores = jnp.where(ok, scores, worst)
        ids = jnp.where(ok, ids, -1)
        allv = jnp.concatenate([rvals, scores], -1)
        alli = jnp.concatenate([rids, ids], -1)
        return topk_scores(allv, alli, k, metric)

    return jax.lax.fori_loop(0, n_blocks, body, init_topk((B,), k, metric))


class IndexPQ(Index):
    def __init__(self, d: int, M: int = 8, metric: Metric = Metric.L2,
                 polysemous: bool = False, polysemous_ht: int = 0):
        self.d = d
        self.M = M
        self.metric = Metric.parse(metric)
        self.polysemous = polysemous
        self.polysemous_ht = polysemous_ht  # 0 = filter off (IndexPQ.h:24)
        self.pq: PQCodebooks | None = None
        self.is_trained = False
        self._codes = np.zeros((0, M), np.uint8)

    @property
    def ntotal(self) -> int:
        return self._codes.shape[0]

    def train(self, x: np.ndarray, sa_iters: int = 30_000) -> None:
        x = np.asarray(x, np.float32)
        self.pq = train_pq(x, self.M)
        if self.polysemous:
            # reorder each subquantizer so Hamming ~ centroid distance
            # (PolysemousTraining::optimize_pq_for_hamming)
            books = np.asarray(self.pq.codebooks)
            out = np.empty_like(books)
            for m in range(self.M):
                perm = reorder_codebook(books[m], n_iter=sa_iters,
                                        seed=123 + m)
                out[m, perm] = books[m]
            self.pq = PQCodebooks(jnp.asarray(out))
        self.is_trained = True

    def add(self, x: np.ndarray, ids=None) -> None:
        assert ids is None, "IndexPQ stores sequential ids"
        assert self.is_trained, "train before add"
        codes = np.asarray(encode_pq(self.pq, jnp.asarray(
            np.asarray(x, np.float32))))
        self._codes = np.concatenate([self._codes, codes], 0)
        self._dev = None

    def reset(self) -> None:
        self._codes = np.zeros((0, self.M), np.uint8)
        self._dev = None

    def search(self, q: np.ndarray, k: int, ht: int | None = None):
        """ADC search; ``ht`` > 0 applies the polysemous Hamming filter
        (reference search_core_polysemous)."""
        q = np.asarray(q, np.float32)
        ht = self.polysemous_ht if ht is None else ht
        n = self.ntotal
        block = min(4096, max(n, 1))
        # cache the padded device code table across searches (rebuilding
        # + re-uploading n*M bytes per call costs the ~40 ms tunnel RTT
        # every search on a static corpus); invalidated by add/reset
        if getattr(self, "_dev", None) is None:
            n_pad = ((n + block - 1) // block) * block
            codes = np.full((n_pad, self.M), 255, np.uint8)
            codes[:n] = self._codes
            self._dev = jnp.asarray(codes)
        qd = jnp.asarray(q)
        qcodes = encode_pq(self.pq, qd)
        vals, ids = _pq_scan(
            self.pq.codebooks, self._dev, qd, qcodes,
            jnp.int32(ht if ht and ht > 0 else -1), jnp.int32(n), k,
            self.metric, block)
        return np.asarray(vals), np.asarray(ids).astype(np.int64)
