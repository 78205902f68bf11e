"""Brute-force flat index.

Capability parity with the reference ``IndexFlat``
(``/root/reference/Auncel/IndexFlat.cpp:41-55``): exact k-NN over a dense
corpus. Used as the coarse-quantizer building block, for ground-truth
generation (the reference's ``dist/gt.cpp``), and as the accuracy oracle in
tests.
"""

import numpy as np

from auncel_tpu.types import Metric
from auncel_tpu.index.base import Index
from auncel_tpu.ops.knn import knn


class FlatIndex(Index):
    # ids are storage positions; callers that remap ids (IndexShards,
    # IndexIDMap) translate instead of passing explicit ids
    position_keyed_ids = True

    def __init__(self, d: int, metric: Metric = Metric.L2):
        self.d = d
        self.metric = Metric.parse(metric)
        self.is_trained = True
        self._xb = np.zeros((0, d), np.float32)

    @property
    def ntotal(self) -> int:
        return self._xb.shape[0]

    @property
    def xb(self) -> np.ndarray:
        return self._xb

    def train(self, x: np.ndarray) -> None:
        pass  # flat index needs no training (IndexFlat.h:21)

    def add(self, x: np.ndarray, ids=None) -> None:
        assert ids is None, "FlatIndex stores sequential ids"
        x = np.asarray(x, np.float32)
        assert x.shape[1] == self.d
        self._xb = np.concatenate([self._xb, x], axis=0)

    def search(self, q: np.ndarray, k: int):
        res = knn(q, self._xb, k, self.metric)
        return res.vals, res.ids.astype(np.int64)

    def reset(self) -> None:
        self._xb = np.zeros((0, self.d), np.float32)


class IndexRefineFlat(Index):
    """Re-rank a base index's shortlist with exact distances over raw
    vectors (reference ``IndexRefineFlat``, IndexFlat.h:105-130): search
    the base for k * k_factor candidates, then rescore them exactly."""

    def __init__(self, base: Index, k_factor: float = 1.0):
        self.base = base
        self.d = base.d
        self.metric = base.metric
        self.k_factor = k_factor
        self._xb = np.zeros((0, self.d), np.float32)

    @property
    def ntotal(self) -> int:
        return self._xb.shape[0]

    @property
    def is_trained(self) -> bool:
        return self.base.is_trained

    @is_trained.setter
    def is_trained(self, v):  # base owns training state
        pass

    def train(self, x):
        self.base.train(x)

    def add(self, x, ids=None):
        assert ids is None, "IndexRefineFlat keeps sequential ids"
        x = np.asarray(x, np.float32)
        self.base.add(x)
        self._xb = np.concatenate([self._xb, x], 0)

    def reset(self):
        self.base.reset()
        self._xb = np.zeros((0, self.d), np.float32)

    def search(self, q: np.ndarray, k: int, k_factor: float | None = None,
               **base_kwargs):
        q = np.asarray(q, np.float32)
        kf = k_factor if k_factor is not None else self.k_factor
        k_base = min(max(int(round(k * kf)), k), max(self.ntotal, k))
        _, ids = self.base.search(q, k_base, **base_kwargs)
        safe = np.maximum(ids, 0)
        cand = self._xb[safe]                          # [B, k_base, d]
        if self.metric.lower_is_better:
            dist = ((q[:, None, :] - cand) ** 2).sum(-1)
            dist = np.where(ids >= 0, dist, np.inf)
            order = np.argsort(dist, axis=1)[:, :k]
        else:
            dist = np.einsum("bkd,bd->bk", cand, q)
            dist = np.where(ids >= 0, dist, -np.inf)
            order = np.argsort(-dist, axis=1)[:, :k]
        return (np.take_along_axis(dist, order, 1),
                np.take_along_axis(ids, order, 1))
