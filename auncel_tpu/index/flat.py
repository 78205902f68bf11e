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
