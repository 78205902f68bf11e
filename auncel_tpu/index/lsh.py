"""Locality-sensitive hashing index families.

Capability parity with the reference's ``IndexLSH`` (IndexLSH.h:21: the
sign of each — optionally rotated, optionally thresholded — component
becomes one bit of a binary signature; search is Hamming over signatures)
and ``IndexIVFSpectralHash`` (IndexIVFSpectralHash.h:30: IVF whose codes
are period-quantized parity bits of a rotated vector relative to a
per-list threshold; binarize_with_freq at IndexIVFSpectralHash.cpp:143:
bit_j = floor((x_j - c_j) * 2/period) & 1).

TPU recast: bits are kept as unpacked {0,1} int8 planes on device (the
packed uint8 form is the serialization format only), and Hamming distance
is computed as an MXU contraction over the planes:
Ham(q, c) = sum(q) + sum(c) - 2 * <q, c>. The SpectralHash scan computes
the query's code PER PROBED LIST (each list has its own threshold vector)
inside the same batched program.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.base import Index
from auncel_tpu.index.binary import pack_bits, unpack_bits
from auncel_tpu.ops.topk import topk_scores
from auncel_tpu.ops.kmeans import kmeans, KmeansParams


def _assign_lists(x: np.ndarray, centroids: np.ndarray,
                  chunk: int = 8192) -> np.ndarray:
    """Nearest-centroid assignment, chunked (never materializes
    [n, nlist, d])."""
    out = np.empty(x.shape[0], np.int64)
    c_sq = (centroids ** 2).sum(1)
    for i0 in range(0, x.shape[0], chunk):
        xb = x[i0:i0 + chunk]
        d2 = (xb ** 2).sum(1)[:, None] + c_sq[None] - 2.0 * xb @ centroids.T
        out[i0:i0 + chunk] = np.argmin(d2, axis=1)
    return out


def random_rotation(d: int, nbits: int, seed: int = 1234) -> np.ndarray:
    """[d, nbits] projection with orthonormal d-blocks (the reference's
    RandomRotationMatrix(d, nbits): random orthogonal, repeated blockwise
    when nbits > d)."""
    rng = np.random.RandomState(seed)
    cols = []
    got = 0
    while got < nbits:
        q, _ = np.linalg.qr(rng.randn(d, d))
        take = min(d, nbits - got)
        cols.append(q[:, :take])
        got += take
    return np.concatenate(cols, axis=1).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("k",))
def _hamming_topk_lsh(qbits, dbbits, db_pop, n_real, k):
    """q [B, nb] {0,1} f32 vs db [N, nb] planes: exact smallest-Hamming
    top-k; padding rows (>= n_real) excluded."""
    dots = jnp.einsum("bn,cn->bc", qbits, dbbits,
                      preferred_element_type=jnp.float32)
    ham = jnp.sum(qbits, axis=1)[:, None] + db_pop[None, :] - 2.0 * dots
    ids = jax.lax.broadcasted_iota(jnp.int32, ham.shape, 1)
    ham = jnp.where(ids < n_real, ham, jnp.inf)
    ids = jnp.where(ids < n_real, ids, -1)
    return topk_scores(ham, ids, k, Metric.L2)


class IndexLSH(Index):
    """Sign-bit signatures over (rotated, thresholded) inputs; Hamming
    search (reference IndexLSH.cpp:29-130)."""

    def __init__(self, d: int, nbits: int, rotate_data: bool = True,
                 train_thresholds: bool = False, seed: int = 1234):
        self.d = d
        self.nbits = int(nbits)
        self.rotate_data = rotate_data
        self.train_thresholds = train_thresholds
        self.metric = Metric.L2  # Hamming reported like the reference
        self.rrot = (random_rotation(d, self.nbits, seed)
                     if rotate_data else None)
        if not rotate_data:
            assert self.nbits <= d, "without rotation, nbits <= d"
        self.thresholds = np.zeros(self.nbits, np.float32)
        self.is_trained = not train_thresholds
        self._bits = np.zeros((0, self.nbits), np.int8)
        self._dev = None

    @property
    def ntotal(self) -> int:
        return self._bits.shape[0]

    @property
    def codes(self) -> np.ndarray:
        """Packed uint8 signatures (serialization parity)."""
        return pack_bits(self._bits.astype(np.uint8))

    def _project(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)
        if self.rrot is not None:
            return x @ self.rrot
        return x[:, : self.nbits]

    def train(self, x: np.ndarray) -> None:
        if self.train_thresholds:
            # per-bit median (IndexLSH.cpp:85-110)
            self.thresholds = np.median(self._project(x),
                                        axis=0).astype(np.float32)
        self.is_trained = True

    def _encode(self, x: np.ndarray) -> np.ndarray:
        return (self._project(x) > self.thresholds).astype(np.int8)

    def add(self, x: np.ndarray, ids=None) -> None:
        assert ids is None and self.is_trained
        self._bits = np.concatenate([self._bits, self._encode(x)], 0)
        self._dev = None

    def search(self, q: np.ndarray, k: int):
        if self._dev is None:
            b = jnp.asarray(self._bits.astype(np.float32))
            self._dev = (b, jnp.sum(b, axis=1))
        db, pop = self._dev
        qb = jnp.asarray(self._encode(q).astype(np.float32))
        vals, ids = _hamming_topk_lsh(qb, db, pop, jnp.int32(self.ntotal),
                                      k)
        return np.asarray(vals), np.asarray(ids).astype(np.int64)

    def reset(self) -> None:
        self._bits = np.zeros((0, self.nbits), np.int8)
        self._dev = None


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _sh_search(cents, cent_sq, xproj_db, db_ids, trained, q, qproj, freq,
               k, nprobe):
    """SpectralHash scan: rank float centroids, then per (query, probed
    list) binarize the query's projection against the LIST's threshold
    vector and Hamming-score the list's stored bits."""
    B = q.shape[0]
    # coarse rank (float L2 over centroids, like the reference quantizer)
    dots = jnp.einsum("bd,cd->bc", q, cents,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    scores = jnp.sum(jnp.square(q), 1)[:, None] + cent_sq[None] - 2 * dots
    ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    _, cids = topk_scores(scores, ids, nprobe, Metric.L2)
    lists = cids[:, :nprobe]                      # [B, P]
    # per-list query bits: floor((proj - c) * freq) & 1 (binarize_with_freq)
    c = trained[lists]                            # [B, P, nbit]
    qb = (jnp.floor((qproj[:, None, :] - c) * freq)
          .astype(jnp.int32) & 1).astype(jnp.float32)
    db = xproj_db[lists]                          # [B, P, cap, nbit] {0,1}
    sid = db_ids[lists]                           # [B, P, cap]
    dots2 = jnp.einsum("bpcn,bpn->bpc", db, qb,
                       preferred_element_type=jnp.float32)
    ham = (jnp.sum(qb, -1)[:, :, None] + jnp.sum(db, -1) - 2.0 * dots2)
    ham = jnp.where(sid >= 0, ham, jnp.inf)
    P, cap = lists.shape[1], db.shape[2]
    return topk_scores(ham.reshape(B, P * cap),
                       sid.reshape(B, P * cap), k, Metric.L2)


class IVFSpectralHashIndex(Index):
    """IVF over period-quantized spectral-hash codes (reference
    IndexIVFSpectralHash.{h,cpp}). threshold_type: "global" (0),
    "centroid", "centroid_half" (reference default), "median"."""

    def __init__(self, d: int, nlist: int, nbit: int,
                 period: float | None = None,
                 threshold_type: str = "centroid_half", seed: int = 1234):
        self.d = d
        self.nlist = nlist
        self.nbit = int(nbit)
        # period must match the data's LOCAL scale (per-coordinate spread
        # of projected residuals): too small and parity bits decorrelate
        # into noise, too large and whole lists share one code. None =
        # estimate 8x the per-list projected residual std at train time —
        # the measured recall peak of a 0.25x..8x sweep (the reference
        # leaves this to the caller; period is its constructor argument).
        self.period = None if period is None else float(period)
        self.threshold_type = threshold_type
        self.metric = Metric.L2
        self.rrot = random_rotation(d, self.nbit, seed)
        self.centroids: np.ndarray | None = None
        self.trained: np.ndarray | None = None   # [nlist, nbit]
        self.is_trained = False
        self._pending: list = []
        self._packed = None
        self.nprobe = 1

    @property
    def ntotal(self) -> int:
        return sum(x.shape[0] for x, _ in self._pending)

    def train(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float32)
        res = kmeans(x, self.nlist, KmeansParams())
        self.centroids = np.asarray(res.centroids, np.float32)
        proj_c = self.centroids @ self.rrot
        if self.period is None:
            assign = _assign_lists(x, self.centroids)
            resid = (x - self.centroids[assign]) @ self.rrot
            self.period = float(8.0 * max(resid.std(), 1e-6))
        if self.threshold_type == "global":
            self.trained = np.zeros((self.nlist, self.nbit), np.float32)
        elif self.threshold_type in ("centroid", "centroid_half"):
            self.trained = proj_c.astype(np.float32)
            if self.threshold_type == "centroid_half":
                self.trained = self.trained - 0.25 * self.period
        elif self.threshold_type == "median":
            # per-list median of the projected training points
            assign = _assign_lists(x, self.centroids)
            proj = x @ self.rrot
            self.trained = np.array(proj_c, np.float32)
            for l in range(self.nlist):
                sel = proj[assign == l]
                if sel.shape[0]:
                    self.trained[l] = np.median(sel, axis=0)
        else:
            raise ValueError(self.threshold_type)
        self.is_trained = True

    def add(self, x: np.ndarray, ids=None) -> None:
        assert self.is_trained
        x = np.asarray(x, np.float32)
        base = self.ntotal
        vid = (np.arange(base, base + x.shape[0], dtype=np.int64)
               if ids is None else np.asarray(ids, np.int64))
        self._pending.append((x, vid))
        self._packed = None

    def _encode(self, proj: np.ndarray, lists: np.ndarray) -> np.ndarray:
        freq = 2.0 / self.period
        c = self.trained[lists]
        return (np.floor((proj - c) * freq).astype(np.int64) & 1
                ).astype(np.int8)

    def _build(self):
        if self._packed is not None:
            return
        if not self._pending:
            # empty trained index: one all-padding list so search honors
            # the (-1, worst) contract instead of crashing in concatenate
            self._pending.append((np.zeros((0, self.d), np.float32),
                                  np.zeros((0,), np.int64)))
        x = np.concatenate([p for p, _ in self._pending], 0)
        vids = np.concatenate([v for _, v in self._pending], 0)
        assign = _assign_lists(x, self.centroids)
        proj = x @ self.rrot
        bits = self._encode(proj, assign)
        sizes = np.bincount(assign, minlength=self.nlist)
        cap = max(int(sizes.max()), 1)
        db = np.zeros((self.nlist, cap, self.nbit), np.int8)
        dbi = np.full((self.nlist, cap), -1, np.int32)
        slot = np.zeros(self.nlist, np.int64)
        for i, l in enumerate(assign):
            db[l, slot[l]] = bits[i]
            dbi[l, slot[l]] = vids[i]
            slot[l] += 1
        cents = jnp.asarray(self.centroids)
        self._packed = (cents, jnp.sum(jnp.square(cents), 1),
                        jnp.asarray(db.astype(np.float32)),
                        jnp.asarray(dbi), jnp.asarray(self.trained))

    def search(self, q: np.ndarray, k: int, nprobe: int | None = None):
        self._build()
        nprobe = min(int(nprobe or self.nprobe), self.nlist)
        cents, cent_sq, db, dbi, trained = self._packed
        q = np.asarray(q, np.float32)
        vals, ids = _sh_search(cents, cent_sq, db, dbi, trained,
                               jnp.asarray(q), jnp.asarray(q @ self.rrot),
                               jnp.float32(2.0 / self.period), k, nprobe)
        return np.asarray(vals), np.asarray(ids).astype(np.int64)

    def reset(self) -> None:
        self._pending = []
        self._packed = None
