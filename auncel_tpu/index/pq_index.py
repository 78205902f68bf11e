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


@functools.partial(jax.jit, static_argnames=("k", "mode", "block"))
def _code_scan(codes, qcodes, qrows, n_real, k, mode, block):
    """Blocked CODE-DOMAIN scan (reference IndexPQ.h:75-82 search types
    beyond ADC): ``he`` = bit-Hamming over the M code bytes (ST_HE),
    ``ghe`` = count of differing sub-codes (ST_generalized_HE ranks by
    most MATCHING codes — equivalent ascending order), ``sdc`` = symmetric
    PQ distance summed from per-subspace codebook tables (ST_SDC). All
    rank ascending; sdc scores come from ``qrows`` [B, M, 256] (the
    query-code rows of the SDC table) contracted against one-hot stored
    codes on the MXU."""
    n = codes.shape[0]
    B = qcodes.shape[0]
    pop = jnp.asarray(POPCOUNT8)
    n_blocks = n // block

    def body(bi, carry):
        rvals, rids = carry
        blk = jax.lax.dynamic_slice_in_dim(codes, bi * block, block, 0)
        diff = blk[None, :, :] ^ qcodes[:, None, :]     # [B, block, M]
        if mode == "he":
            scores = jnp.sum(pop[diff.astype(jnp.int32)],
                             axis=-1).astype(jnp.float32)
        elif mode == "ghe":
            scores = jnp.sum((diff != 0).astype(jnp.float32), axis=-1)
        else:  # sdc
            onehot = jax.nn.one_hot(blk, 256, dtype=jnp.float32)
            scores = jnp.einsum("bmc,nmc->bn", qrows, onehot,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        ids = bi * block + jax.lax.broadcasted_iota(
            jnp.int32, (B, block), 1)
        ok = ids < n_real
        scores = jnp.where(ok, scores, jnp.inf)
        ids = jnp.where(ok, ids, -1)
        allv = jnp.concatenate([rvals, scores], -1)
        alli = jnp.concatenate([rids, ids], -1)
        return topk_scores(allv, alli, k, Metric.L2)

    return jax.lax.fori_loop(0, n_blocks, body,
                             init_topk((B,), k, Metric.L2))


class IndexPQ(Index):
    """search_type mirrors the reference enum (IndexPQ.h:75-82):
    "pq" = ADC (default), "he" / "ghe" = (generalized) Hamming over
    codes, "sdc" = symmetric PQ distance, "polysemous" = ADC with the
    Hamming prefilter (requires polysemous=True training + ht > 0)."""

    SEARCH_TYPES = ("pq", "he", "ghe", "sdc", "polysemous")

    def __init__(self, d: int, M: int = 8, metric: Metric = Metric.L2,
                 polysemous: bool = False, polysemous_ht: int = 0,
                 search_type: str = "pq"):
        assert search_type in self.SEARCH_TYPES, search_type
        self.search_type = search_type
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
        self._sdc = None  # SDC tables follow the codebooks
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

    def _sdc_table(self) -> jnp.ndarray:
        """[M, 256, 256] per-subspace squared-L2 codeword tables
        (reference ProductQuantizer::compute_sdc_table). Built lazily
        once per trained codebook."""
        if getattr(self, "_sdc", None) is None:
            cb = self.pq.codebooks                     # [M, 256, d/M]
            sq = jnp.sum(jnp.square(cb), -1)
            dots = jnp.einsum("mid,mjd->mij", cb, cb,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            self._sdc = jnp.maximum(
                sq[:, :, None] + sq[:, None, :] - 2.0 * dots, 0.0)
        return self._sdc

    def search(self, q: np.ndarray, k: int, ht: int | None = None,
               search_type: str | None = None):
        """Search under ``search_type`` (default: the constructor's).
        For "pq"/"polysemous", ``ht`` > 0 applies the Hamming prefilter
        (reference search_core_polysemous)."""
        st = search_type or self.search_type
        assert st in self.SEARCH_TYPES, st
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
        if st in ("he", "ghe", "sdc"):
            if st == "sdc":
                if self.metric is not Metric.L2:
                    raise ValueError("ST_SDC is an L2 capability "
                                     "(IndexPQ.cpp search_core_sdc)")
                qrows = self._sdc_table()[
                    jnp.arange(self.M)[None, :], qcodes]   # [B, M, 256]
            else:
                # mode is a static argname, so the he/ghe trace never
                # reads qrows — a [1,1,1] dummy satisfies the signature
                # without materializing a [B, M, 256] f32 buffer per call
                qrows = jnp.zeros((1, 1, 1), jnp.float32)
            vals, ids = _code_scan(self._dev, qcodes, qrows, jnp.int32(n),
                                   k, st, block)
        else:
            vals, ids = _pq_scan(
                self.pq.codebooks, self._dev, qd, qcodes,
                jnp.int32(ht if ht and ht > 0 else -1), jnp.int32(n), k,
                self.metric, block)
        return np.asarray(vals), np.asarray(ids).astype(np.int64)
