"""Auxiliary search structures: range search, ID selectors, stats.

Capability parity with the reference's ``AuxIndexStructures``
(SURVEY.md §2 #13: ``RangeSearchResult``, ``IDSelectorRange``,
``IDSelectorBatch``) and the IVF ``range_search`` path
(``IndexIVF.cpp:741-860``), plus the global search counters
(``IndexIVFStats``, IndexIVF.h:361-374).

Range search returns a variable number of hits per query — hostile to fixed
shapes — so the TPU recast scans probe chunks on device (same masked-scan
primitive as top-k search) and compacts hits host-side per chunk: the device
does all the distance work, the host only boolean-indexes.
"""

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.ops.distance import sqnorms


@dataclass
class RangeSearchResult:
    """CSR-style container (reference AuxIndexStructures.h:31):
    query i's hits are labels[lims[i]:lims[i+1]] / distances[...]."""
    lims: np.ndarray        # [nq + 1] int64
    labels: np.ndarray      # [nres] int64
    distances: np.ndarray   # [nres] float32


class IDSelector:
    def is_member(self, ids: np.ndarray) -> np.ndarray:
        raise NotImplementedError


@dataclass
class IDSelectorRange(IDSelector):
    imin: int
    imax: int

    def is_member(self, ids):
        return (ids >= self.imin) & (ids < self.imax)


class IDSelectorBatch(IDSelector):
    def __init__(self, ids):
        self._set = np.asarray(sorted(set(np.asarray(ids).tolist())),
                               np.int64)

    def is_member(self, ids):
        ids = np.asarray(ids)
        if len(self._set) == 0:     # empty selector: legal no-op
            return np.zeros(ids.shape, bool)
        pos = np.clip(np.searchsorted(self._set, ids), 0,
                      len(self._set) - 1)
        return self._set[pos] == ids


@dataclass
class SearchStats:
    """Per-process counters (reference indexIVF_stats; updated by the
    search entry points that opt in)."""
    nq: int = 0
    nlist_scanned: int = 0
    ndis: int = 0
    quantization_time_ms: float = 0.0
    search_time_ms: float = 0.0

    def reset(self):
        self.nq = self.nlist_scanned = self.ndis = 0
        self.quantization_time_ms = self.search_time_ms = 0.0


ivf_stats = SearchStats()


def range_search(index, q: np.ndarray, radius: float,
                 nprobe: int | None = None) -> RangeSearchResult:
    """All stored vectors within ``radius`` of each query (L2: squared
    distance < radius, matching the reference's convention,
    IndexIVF.cpp:741; IP: score > radius)."""
    metric = index.metric
    arrays = index.arrays
    nprobe = min(nprobe or index.nprobe, index.nlist)
    q = np.asarray(q, np.float32)
    nq = q.shape[0]
    cdis, cids = index.coarse_rank_np(q)
    qd = jnp.asarray(q)
    q_sq = sqnorms(qd)

    # ONE device program scans every probe (fori over probe chunks inside
    # the jit) and ONE fetch brings back scores+ids — the per-probe
    # dispatch+sync loop this replaces cost O(nprobe) tunnel round trips
    scores, vids = _range_scan_all(
        arrays, qd, q_sq, jnp.asarray(cids[:, :nprobe].astype(np.int32)),
        nprobe, metric)
    scores, vids = np.asarray(scores), np.asarray(vids)
    if metric is Metric.L2:
        mask = (scores < radius) & (vids >= 0)
    else:
        mask = (scores > radius) & (vids >= 0)

    counts = mask.sum(axis=1)
    lims = np.zeros(nq + 1, np.int64)
    np.cumsum(counts, out=lims[1:])
    labels = vids[mask].astype(np.int64)
    dists = scores[mask].astype(np.float32)
    return RangeSearchResult(lims, labels, dists)


@functools.partial(jax.jit, static_argnames=("nprobe", "metric"))
def _range_scan_all(arrays, qd, q_sq, cids, nprobe, metric):
    """Scores/ids for all (query, probe) pairs: [B, nprobe*cap] each."""
    B = qd.shape[0]
    cap = arrays.cap
    C = max(1, min(8, nprobe))
    n_steps = -(-nprobe // C)
    buf_s = jnp.zeros((B, n_steps * C * cap), jnp.float32)
    buf_i = jnp.full((B, n_steps * C * cap), -1, jnp.int32)

    def body(step, bufs):
        bs, bi = bufs
        iks = step * C + jnp.arange(C, dtype=jnp.int32)
        ok = iks < nprobe
        lists = jnp.take_along_axis(
            cids, jnp.broadcast_to(jnp.minimum(iks, nprobe - 1)[None, :],
                                   (B, C)), axis=1)
        sub = arrays.decode_block(arrays.db[lists])
        sub_sq = arrays.db_sq[lists]
        sub_ids = arrays.vec_ids[lists]
        if arrays.pq_residual is not None:
            # residual PQ: stored r approximates x - c_list, same
            # correction as the main scan path (scan.py:191-211)
            cl = arrays.centroids[lists]                 # [B, C, d]
            if metric is Metric.L2:
                qc = qd[:, None, :] - cl
                dots = jnp.einsum("bpcd,bpd->bpc", sub, qc,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                sc = jnp.maximum(jnp.sum(jnp.square(qc), -1)[:, :, None]
                                 + sub_sq - 2.0 * dots, 0.0)
            else:
                qcl = jnp.einsum("bpd,bd->bp", cl, qd,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                qr = jnp.einsum("bpcd,bd->bpc", sub, qd,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                sc = qcl[:, :, None] + qr
        else:
            dots = jnp.einsum("bpcd,bd->bpc", sub, qd,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            if metric is Metric.L2:
                sc = jnp.maximum(
                    q_sq[:, None, None] + sub_sq - 2.0 * dots, 0.0)
            else:
                sc = dots
        sub_ids = jnp.where(ok[None, :, None], sub_ids, -1)
        off = step * C * cap
        bs = jax.lax.dynamic_update_slice(
            bs, sc.reshape(B, C * cap), (0, off))
        bi = jax.lax.dynamic_update_slice(
            bi, sub_ids.reshape(B, C * cap), (0, off))
        return bs, bi

    return jax.lax.fori_loop(0, n_steps, body, (buf_s, buf_i))


def remove_ids(index, selector: IDSelector) -> int:
    """Drop all stored vectors matched by the selector and repack
    (reference Index::remove_ids / IDSelector capability)."""
    from auncel_tpu.index.ivf import decoded_db
    arrays = index.arrays
    # Decode through the storage codec (sq8/sq4-nibble/bf16/pq all decode
    # via decoded_db — same route update_vectors takes): slicing raw codes
    # here would re-add nibble-packed or PQ codes as "vectors".
    db = decoded_db(arrays)
    ids = np.asarray(arrays.vec_ids)
    keep = (ids >= 0) & ~selector.is_member(ids)
    flat_x = db[keep]
    flat_ids = ids[keep].astype(np.int64)
    removed = index.ntotal - flat_x.shape[0]
    from auncel_tpu.index.ivf import preserve_sq_range
    preserve_sq_range(index)   # surviving SQ codes re-encode identically
    index.reset()
    if flat_x.shape[0]:
        index.add(flat_x, ids=flat_ids)
    return removed


class InterruptCallback:
    """Cooperative interruption of long host-driven loops (reference
    ``InterruptCallback``, AuxIndexStructures.h:250: a global hook polled
    by long-running operations). Long auncel_tpu loops (k-means
    iterations, blocked kNN, eval sweeps) call ``check()`` between device
    steps; install a callback returning True to abort with
    InterruptedError."""

    _instance = None

    def __init__(self, fn=None):
        self.fn = fn

    def want_interrupt(self) -> bool:
        return bool(self.fn()) if self.fn is not None else False

    @classmethod
    def install(cls, fn) -> None:
        cls._instance = cls(fn)

    @classmethod
    def clear(cls) -> None:
        cls._instance = None

    @classmethod
    def check(cls) -> None:
        if cls._instance is not None and cls._instance.want_interrupt():
            raise InterruptedError("interrupted by InterruptCallback")

    @classmethod
    def is_interrupted(cls) -> bool:
        return (cls._instance is not None
                and cls._instance.want_interrupt())
