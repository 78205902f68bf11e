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

    def reconstruct_batch(self, keys: "np.ndarray") -> "np.ndarray":
        """Vectors for an arbitrary id array (negative keys -> zeros).
        Index families with a packed id layout override this with one
        batched gather; the fallback loops ``reconstruct``."""
        import numpy as _np
        keys = _np.asarray(keys, _np.int64).reshape(-1)
        out = _np.zeros((keys.size, self.d), _np.float32)
        uniq = _np.unique(keys[keys >= 0])
        lut = {int(i): self.reconstruct(int(i)) for i in uniq}
        for j, kk in enumerate(keys):
            if kk >= 0:
                out[j] = lut[int(kk)]
        return out

    def compute_residual(self, x: "np.ndarray", key: int) -> "np.ndarray":
        """x - reconstruct(key) (reference Index::compute_residual,
        Index.cpp — the quantization residual of x wrt a stored code)."""
        import numpy as _np
        return _np.asarray(x, _np.float32) - self.reconstruct(key)

    def search_and_reconstruct(
            self, q: "np.ndarray", k: int, **kwargs
    ) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
        """Search plus the stored (codec-decoded) vector of every result
        (reference ``Index::search_and_reconstruct``, Index.cpp — the
        tests/test_index.py:295 contract: D/I identical to ``search``,
        R[i, j] == reconstruct(I[i, j])). Missing slots (id == -1)
        reconstruct to zero vectors."""
        import numpy as _np
        D, I = self.search(q, k, **kwargs)
        R = self.reconstruct_batch(_np.asarray(I).reshape(-1))
        return D, I, R.reshape(I.shape[0], I.shape[1], -1)
