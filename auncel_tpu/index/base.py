"""Abstract index interface.

Mirrors the reference's ``Index`` base capability surface
(``/root/reference/Auncel/Index.h:66``: d / ntotal / metric_type /
train / add / search / reset) without its mutable tune-flag machinery:
in this framework "tuned" (bounded) search is a separate entry point on
``ErrorSys`` rather than a mode bit flipped on the index.
"""

import abc

import numpy as np

from auncel_tpu.types import Metric


class Index(abc.ABC):
    d: int
    metric: Metric
    ntotal: int
    is_trained: bool

    @abc.abstractmethod
    def train(self, x: np.ndarray) -> None:
        ...

    @abc.abstractmethod
    def add(self, x: np.ndarray, ids: np.ndarray | None = None) -> None:
        ...

    @abc.abstractmethod
    def search(self, q: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Returns (vals [nq, k], ids [nq, k]) best-first."""
        ...

    @abc.abstractmethod
    def reset(self) -> None:
        ...

    # ---- reconstruction (reference Index::reconstruct/reconstruct_n;
    # implemented by index families that store recoverable vectors) ----

    def reconstruct(self, key: int) -> "np.ndarray":
        raise NotImplementedError(
            f"{type(self).__name__} does not support reconstruction")

    def reconstruct_n(self, i0: int, n: int) -> "np.ndarray":
        import numpy as _np
        return _np.stack([self.reconstruct(i) for i in range(i0, i0 + n)])
