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

import time
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.ops.distance import sqnorms, pairwise_scores


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
        pos = np.searchsorted(self._set, ids)
        pos = np.clip(pos, 0, len(self._set) - 1)
        return (len(self._set) > 0) & (self._set[pos] == ids)


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


@jax.jit
def _chunk_scores(db_chunk, db_sq_chunk, ids_chunk, q, q_sq, sq_scale,
                  sq_bias):
    if sq_scale is not None:
        db_chunk = db_chunk.astype(jnp.float32) * sq_scale + sq_bias
    dots = jnp.einsum("bcd,bd->bc", db_chunk, q,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return q_sq[:, None] + db_sq_chunk - 2.0 * dots


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

    hits_l: list[list] = [[] for _ in range(nq)]
    hits_d: list[list] = [[] for _ in range(nq)]
    for p in range(nprobe):
        lists = cids[:, p]
        db_chunk = arrays.db[jnp.asarray(lists)]
        sq_chunk = arrays.db_sq[jnp.asarray(lists)]
        id_chunk = np.asarray(arrays.vec_ids)[lists]
        if metric is Metric.L2:
            scores = np.asarray(_chunk_scores(
                db_chunk, sq_chunk, None, qd, q_sq,
                arrays.sq_scale, arrays.sq_bias))
            mask = (scores < radius) & (id_chunk >= 0)
        else:
            dots = np.asarray(jnp.einsum(
                "bcd,bd->bc",
                (db_chunk.astype(jnp.float32) * arrays.sq_scale
                 + arrays.sq_bias) if arrays.sq_scale is not None
                else db_chunk,
                qd, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))
            scores = dots
            mask = (scores > radius) & (id_chunk >= 0)
        for i in range(nq):
            sel = mask[i]
            if sel.any():
                hits_l[i].extend(id_chunk[i][sel].tolist())
                hits_d[i].extend(scores[i][sel].tolist())

    lims = np.zeros(nq + 1, np.int64)
    for i in range(nq):
        lims[i + 1] = lims[i] + len(hits_l[i])
    labels = np.asarray([x for h in hits_l for x in h], np.int64)
    dists = np.asarray([x for h in hits_d for x in h], np.float32)
    return RangeSearchResult(lims, labels, dists)


def remove_ids(index, selector: IDSelector) -> int:
    """Drop all stored vectors matched by the selector and repack
    (reference Index::remove_ids / IDSelector capability)."""
    arrays = index.arrays
    db = np.asarray(arrays.db)
    if arrays.sq_scale is not None:
        db = (db.astype(np.float32) * np.asarray(arrays.sq_scale)
              + np.asarray(arrays.sq_bias))
    ids = np.asarray(arrays.vec_ids)
    keep = (ids >= 0) & ~selector.is_member(ids)
    flat_x = db[keep]
    flat_ids = ids[keep].astype(np.int64)
    removed = index.ntotal - flat_x.shape[0]
    index.reset()
    if flat_x.shape[0]:
        index.add(flat_x, ids=flat_ids)
    return removed
