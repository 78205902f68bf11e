"""Flat two-level codes: coarse centroid id + PQ(residual).

Parity target: reference ``Index2Layer`` (IndexIVFPQ.h:199-260) — "same
as an IndexIVFPQ without the inverted lists: codes are stored
sequentially". Each stored vector is (list id, pq code of the residual
to that centroid); reconstruction is ``centroid[id] + pq_decode(code)``.
The reference uses it as the compressed storage behind
``IndexHNSW2Level`` (IndexHNSW.cpp:1054-1100, the Distance2Level
computer) and can transfer its codes into a real IVFPQ
(``transfer_to_IVFPQ``, IndexIVFPQ.h:248).

Deviation noted: the reference's ``Index2Layer::search`` is
intentionally not implemented (IndexIVFPQ.h:233); here a decoded exact
MXU scan is provided instead — strictly more capable, same storage.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.base import Index
from auncel_tpu.ops.kmeans import kmeans, KmeansParams


class Index2Layer(Index):
    def __init__(self, d: int, nlist: int, M: int = 8,
                 metric: Metric = Metric.L2,
                 kmeans_params: KmeansParams | None = None,
                 quantizer=None):
        """``quantizer``: optional pre-built coarse index exposing
        ``assign(x)`` and ``centroids`` (the reference takes any Index*
        first-level quantizer, e.g. a MultiIndexQuantizer for the
        "HNSW%d_2x%d+PQ%d" factory cell, AutoTune.cpp:893-899)."""
        assert d % M == 0
        self.d = d
        self.nlist = int(nlist)
        self.M = int(M)
        self.metric = Metric.parse(metric)
        self.kmeans_params = kmeans_params or KmeansParams()
        self.quantizer = quantizer
        self.centroids: np.ndarray | None = None
        self._pq = None
        self.list_ids = np.zeros((0,), np.int32)   # code_size_1 payload
        self.codes = np.zeros((0, M), np.uint8)    # code_size_2 payload
        self.is_trained = False

    @property
    def ntotal(self) -> int:
        return int(self.list_ids.shape[0])

    # code_size parity fields (IndexIVFPQ.h:215-221)
    @property
    def code_size_1(self) -> int:
        size = 1
        while self.nlist > (1 << (8 * size)):
            size += 1
        return size

    @property
    def code_size_2(self) -> int:
        return self.M

    @property
    def code_size(self) -> int:
        return self.code_size_1 + self.code_size_2

    def train(self, x: np.ndarray) -> None:
        from auncel_tpu.ops.pq import train_pq
        x = np.asarray(x, np.float32)
        if self.quantizer is not None:
            if getattr(self.quantizer, "centroids", None) is None:
                self.quantizer.train(x)
            cents = np.asarray(self.quantizer.centroids, np.float32)
            assert cents.shape[0] == self.nlist
            self.centroids = cents
        else:
            self.centroids = kmeans(x, self.nlist, self.kmeans_params,
                                    self.metric).centroids
        assign = self._assign(x)
        resid = x - self.centroids[assign]
        self._pq = train_pq(resid[:200_000], self.M)
        self.is_trained = True

    def _assign(self, x: np.ndarray) -> np.ndarray:
        if self.quantizer is not None:
            return np.asarray(self.quantizer.assign(x), np.int64)
        from auncel_tpu.ops.knn import knn
        res = knn(x, self.centroids, 1, self.metric, q_block=65536)
        return res.ids[:, 0].astype(np.int64)

    def add(self, x: np.ndarray, ids=None) -> None:
        from auncel_tpu.ops.pq import encode_pq
        assert self.is_trained, "train before add"
        x = np.asarray(x, np.float32)
        assign = self._assign(x)
        resid = x - self.centroids[assign]
        codes = np.asarray(encode_pq(self._pq, jnp.asarray(resid)))
        self.list_ids = np.concatenate(
            [self.list_ids, assign.astype(np.int32)], 0)
        self.codes = np.concatenate([self.codes, codes], 0)

    def reset(self) -> None:
        self.list_ids = np.zeros((0,), np.int32)
        self.codes = np.zeros((0, self.M), np.uint8)

    # ------------------------------------------------------- reconstruct

    def reconstruct_n(self, i0: int = 0, n: int | None = None) -> np.ndarray:
        from auncel_tpu.ops.pq import decode_pq
        n = self.ntotal - i0 if n is None else n
        sl = slice(i0, i0 + n)
        dec = np.asarray(decode_pq(self._pq, jnp.asarray(self.codes[sl])))
        return self.centroids[self.list_ids[sl]] + dec

    def reconstruct(self, key: int) -> np.ndarray:
        return self.reconstruct_n(int(key), 1)[0]

    # ------------------------------------------------------------ search

    def search(self, q: np.ndarray, k: int):
        """Exact scan over the decoded reconstructions (deviation from the
        reference's FAISS_THROW — see module docstring)."""
        from auncel_tpu.ops.knn import knn
        res = knn(np.asarray(q, np.float32), self.reconstruct_n(), k,
                  self.metric)
        return res.vals, res.ids.astype(np.int64)

    # ------------------------------------------------- transfer_to_IVFPQ

    def transfer_to_ivfpq(self):
        """Move the flat codes into inverted lists without re-encoding
        (reference transfer_to_IVFPQ, IndexIVFPQ.cpp: the standard recipe
        for building a big IVFPQ through an HNSW2Level build). Returns an
        IVFFlatIndex with pq storage whose packed arrays hold EXACTLY
        these codes, so reconstructions are bit-identical."""
        from auncel_tpu.index.ivf import IVFFlatIndex
        from auncel_tpu.index.scan import IVFArrays
        from auncel_tpu.ops.pq import decode_pq
        from auncel_tpu.ops.distance import sqnorms

        idx = IVFFlatIndex(self.d, self.nlist, metric=self.metric,
                           storage=f"pq{self.M}", pq_residual=True)
        idx.set_centroids(self.centroids)
        n = self.ntotal
        assign = self.list_ids.astype(np.int64)
        sizes = np.bincount(assign, minlength=self.nlist).astype(np.int64)
        cap = max(int(sizes.max()), 1)
        order = np.argsort(assign, kind="stable")
        starts = np.zeros(self.nlist + 1, np.int64)
        np.cumsum(sizes, out=starts[1:])
        slot = np.empty(n, np.int64)
        slot[order] = np.arange(n) - starts[assign[order]]
        db = np.zeros((self.nlist, cap, self.M), np.uint8)
        vec_ids = np.full((self.nlist, cap), -1, np.int32)
        db[assign, slot] = self.codes
        vec_ids[assign, slot] = np.arange(n, dtype=np.int32)
        db_d = jnp.asarray(db)
        dec = decode_pq(self._pq, db_d)
        db_sq = jnp.sum(jnp.square(dec), -1) * (jnp.asarray(vec_ids) >= 0)
        cents = jnp.asarray(self.centroids)
        idx._arrays = IVFArrays(
            centroids=cents, cent_sq=sqnorms(cents), db=db_d,
            db_sq=db_sq, vec_ids=jnp.asarray(vec_ids),
            list_sizes=jnp.asarray(sizes.astype(np.int32)),
            interdis=(jnp.asarray(idx.interdis) if idx.interdis is not None
                      else jnp.zeros((1, 1), jnp.float32)),
            sq_scale=None, sq_bias=None,
            pq_codebooks=self._pq.codebooks, pq_residual=())
        idx._ntotal = n
        return idx


class IMICoarseQuantizer:
    """Adapter: inverted-multi-index product cells as an Index2Layer
    first-level quantizer (the reference's "HNSW%d_2x%d+PQ%d" factory
    cell builds Index2Layer over a MultiIndexQuantizer,
    AutoTune.cpp:893-899). Product centroids are materialized once
    (nlist = 4^nbit rows) — the TPU trade from index/imi.py."""

    def __init__(self, d: int, nbit: int, metric: Metric = Metric.L2):
        self.d = d
        self.nbit = int(nbit)
        self.nlist = (1 << nbit) ** 2
        self.metric = Metric.parse(metric)
        self.centroids: np.ndarray | None = None

    def train(self, x: np.ndarray) -> None:
        from auncel_tpu.index.imi import train_imi_centroids
        self.centroids = train_imi_centroids(
            np.asarray(x, np.float32), self.nlist, self.metric)

    def assign(self, x: np.ndarray) -> np.ndarray:
        from auncel_tpu.index.imi import imi_assign
        return imi_assign(np.asarray(x, np.float32), self.centroids)
