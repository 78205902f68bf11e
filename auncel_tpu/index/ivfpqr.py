"""IVFPQ with a refinement product quantizer.

Parity target: reference ``IndexIVFPQR`` (IndexIVFPQ.h:155-195,
IndexIVFPQ.cpp ``IndexIVFPQR::search_preassigned``): the base IVFPQ
search retrieves ``k_factor * k`` candidates, then each candidate is
re-ranked against a finer two-stage reconstruction

    recon(x) = centroid[list(x)] + pq_decode(code(x)) + refine_decode(x)

and the top-k of the re-ranked distances is returned. The refine PQ
(``M_refine`` subquantizers) is trained on the residual the first PQ
leaves behind (``train_residual``, IndexIVFPQ.cpp:1194-1214).

TPU shape: the base search is the standard one-dispatch IVFPQ scan; the
re-rank is ONE additional jitted program — a flat gather of the
candidates' first-stage codes + refine codes, a codebook decode, and an
exact ``lax.top_k`` over [B, k_factor*k] distances. No per-candidate
host loop (the reference's refine loop is per (query, candidate),
IndexIVFPQ.cpp:1311-1338).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex, decoded_db


class IndexIVFPQR(IVFFlatIndex):
    """Reference IndexIVFPQ.h:155 (L2 only there: the factory rejects
    "PQ%d+%d" under inner product, AutoTune.cpp:854-859; we mirror
    that restriction)."""

    def __init__(self, d: int, nlist: int, M: int = 8, M_refine: int = 8,
                 k_factor: float = 4.0, **kw):
        metric = Metric.parse(kw.pop("metric", Metric.L2))
        assert metric is Metric.L2, \
            "IVFPQR not implemented for inner product search " \
            "(AutoTune.cpp:858)"
        assert d % M == 0 and d % M_refine == 0
        super().__init__(d, nlist, metric=metric, storage=f"pq{M}", **kw)
        self.M_refine = int(M_refine)
        self.k_factor = float(k_factor)
        # raw vectors are needed to (re)train the refine PQ whenever the
        # lists repack (our first-stage PQ trains at pack time, unlike the
        # reference's train-once train_residual); kept host-side, keyed by
        # user id. Dropped from save() payloads.
        self._raw_x = np.zeros((0, d), np.float32)
        self._raw_ids = np.zeros((0,), np.int64)
        self._refine = None          # (sorted_ids, pos, codes, books)
        self._refine_of = None       # arrays object the refine belongs to

    # ------------------------------------------------------------ add

    def add(self, x: np.ndarray, ids: np.ndarray | None = None) -> None:
        if getattr(self, "_frozen_codes", False):
            raise RuntimeError(
                "this IndexIVFPQR was loaded from exact codes; growing it "
                "requires the original vectors (re-add to a fresh index)")
        x = np.asarray(x, np.float32)
        if ids is None:
            ids = np.arange(self._ntotal, self._ntotal + x.shape[0],
                            dtype=np.int64)
        ids = np.asarray(ids, np.int64)
        self._raw_x = np.concatenate([self._raw_x, x], 0)
        self._raw_ids = np.concatenate([self._raw_ids, ids], 0)
        super().add(x, ids)

    def reset(self) -> None:
        super().reset()
        self._raw_x = np.zeros((0, self.d), np.float32)
        self._raw_ids = np.zeros((0,), np.int64)
        self._refine = None
        self._refine_of = None
        # an emptied index holds no frozen codes: growing it again is
        # exactly the fresh-index case
        self._frozen_codes = False

    # --------------------------------------------------------- refine PQ

    def _ensure_refine(self):
        """Train/encode the refine PQ against the CURRENT packed layout.

        The refine target is the residual the first stage leaves:
        r2 = x - (centroid + pq_decode(code)) — the reference's
        train_residual trains refine_pq on exactly this
        (IndexIVFPQ.cpp:1194-1214). Decoding goes through decoded_db so
        the first-stage reconstruction is value-consistent with every
        scan path."""
        a = self.arrays  # packs if needed
        if self._refine is not None and self._refine_of is a:
            return self._refine
        from auncel_tpu.ops.pq import train_pq, encode_pq

        ids_flat = np.asarray(a.vec_ids).reshape(-1)
        valid = ids_flat >= 0
        pos_valid = np.nonzero(valid)[0]
        stored_ids = ids_flat[pos_valid]
        order = np.argsort(stored_ids, kind="stable")
        sorted_ids = stored_ids[order]
        pos = pos_valid[order].astype(np.int32)     # flat [nlist*cap] slot

        # first-stage reconstructions for the stored order
        recon1 = decoded_db(a).reshape(-1, self.d)[pos]
        # align raw vectors to sorted_ids
        raw_order = np.argsort(self._raw_ids, kind="stable")
        raw_sorted = self._raw_ids[raw_order]
        idx = np.searchsorted(raw_sorted, sorted_ids)
        if not np.array_equal(raw_sorted[idx], sorted_ids):
            raise RuntimeError("refine PQ: stored ids missing raw vectors")
        x = self._raw_x[raw_order[idx]]
        r2 = x - recon1

        nt = min(len(r2), 200_000)
        books = train_pq(r2[:nt], self.M_refine)
        codes = np.asarray(encode_pq(books, jnp.asarray(r2)))
        self._refine = (sorted_ids, jnp.asarray(pos), jnp.asarray(codes),
                        books.codebooks)
        self._refine_of = a
        return self._refine

    # ------------------------------------------------------------ search

    def search(self, q: np.ndarray, k: int, nprobe: int | None = None):
        """k_factor*k IVFPQ candidates -> one-device-program re-rank
        (IndexIVFPQ.cpp IndexIVFPQR::search_preassigned)."""
        q = np.asarray(q, np.float32)
        if self.ntotal == 0:
            # match the base index's empty-index padding contract
            return (np.full((q.shape[0], k), np.inf, np.float32),
                    np.full((q.shape[0], k), -1, np.int64))
        sorted_ids, pos_d, codes_d, books = self._ensure_refine()
        # k2 >= k always: the base search pads beyond ntotal with -1
        # (masked to inf below), so top_k's width stays >= k
        k2 = max(int(round(self.k_factor * k)), k)
        base_v, base_i = super().search(q, k2, nprobe)

        # map candidate user ids -> refine rows (host; ids are already on
        # the host after the base fetch). Missing slots (-1 pads) map to
        # row 0 and are masked out on device.
        rows = np.searchsorted(sorted_ids, np.maximum(base_i, 0))
        rows = np.clip(rows, 0, len(sorted_ids) - 1)
        ok = (base_i >= 0) & (sorted_ids[rows] == np.maximum(base_i, 0))
        qd = jnp.asarray(q)
        vals, sel = _rerank(self.arrays, qd, jnp.asarray(rows.astype(
            np.int32)), pos_d, codes_d, books, jnp.asarray(ok), k)
        sel = np.asarray(sel)
        ids = np.take_along_axis(base_i, sel, axis=1)
        ids = np.where(np.take_along_axis(ok, sel, axis=1), ids, -1)
        return np.asarray(vals), ids

    # ------------------------------------------------------- reconstruct

    def reconstruct(self, key: int) -> np.ndarray:
        return self.reconstruct_batch(np.asarray([key], np.int64))[0]

    def reconstruct_batch(self, keys: np.ndarray) -> np.ndarray:
        """Two-stage reconstruction (reference reconstruct_from_offset,
        IndexIVFPQ.cpp:1273-1282: base recon + refine_pq decode)."""
        from auncel_tpu.ops.pq import decode_pq, PQCodebooks
        sorted_ids, pos_d, codes_d, books = self._ensure_refine()
        from auncel_tpu.index.ivf import _ivf_reconstruct
        recon1 = _ivf_reconstruct(self, np.asarray(keys, np.int64))
        rows = np.searchsorted(sorted_ids, keys)
        if not np.array_equal(sorted_ids[np.clip(rows, 0,
                                                 len(sorted_ids) - 1)],
                              keys):
            raise KeyError("ids not stored")
        r2 = np.asarray(decode_pq(PQCodebooks(books),
                                  codes_d[jnp.asarray(rows)]))
        return recon1 + r2


import functools


@functools.partial(jax.jit, static_argnames=("k",))
def _rerank(arrays, q, rows, pos, codes, books, ok, k: int):
    """One program: gather both code stages for every candidate, decode,
    exact L2 against the query, top-k. Distances use the same HIGHEST-f32
    discipline as the scan kernels."""
    from auncel_tpu.ops.pq import decode_pq, PQCodebooks
    B, K2 = rows.shape
    cap = arrays.db.shape[1]
    flat_codes = arrays.db.reshape(-1, arrays.db.shape[-1])
    cand_pos = pos[rows]                          # [B, K2] flat slots
    c1 = flat_codes[cand_pos]                     # [B, K2, M] uint8
    recon = arrays.decode_block(c1)
    if arrays.pq_residual is not None:            # residual PQ storage
        lists = cand_pos // cap
        recon = recon + arrays.centroids[lists]
    recon = recon + decode_pq(PQCodebooks(books), codes[rows])
    diff = q[:, None, :] - recon
    dist = jnp.einsum("bkd,bkd->bk", diff, diff,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    dist = jnp.where(ok, dist, jnp.inf)
    neg, sel = jax.lax.top_k(-dist, k)
    return -neg, sel
