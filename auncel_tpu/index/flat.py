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


def _xb_reconstruct(xb: np.ndarray, key: int) -> np.ndarray:
    """Single stored row with validation (Python negative indexing would
    silently return the LAST vector; the reference raises)."""
    if not 0 <= key < xb.shape[0]:
        raise KeyError(f"id {key} not stored (ntotal={xb.shape[0]})")
    return xb[key].copy()


def _xb_reconstruct_batch(xb: np.ndarray, d: int,
                          keys: np.ndarray) -> np.ndarray:
    """Batched gather over a raw row store; negative keys -> zeros
    (the search_and_reconstruct pad contract)."""
    keys = np.asarray(keys, np.int64).reshape(-1)
    if xb.shape[0] == 0:
        return np.zeros((keys.size, d), np.float32)
    out = xb[np.maximum(keys, 0)].copy()
    out[keys < 0] = 0.0
    return out


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

    def reconstruct(self, key: int) -> np.ndarray:
        return _xb_reconstruct(self._xb, key)

    def reconstruct_n(self, i0: int, n: int) -> np.ndarray:
        return self._xb[i0:i0 + n].copy()

    def reconstruct_batch(self, keys: np.ndarray) -> np.ndarray:
        return _xb_reconstruct_batch(self._xb, self.d, keys)

    def compute_distance_subset(self, q: np.ndarray,
                                labels: np.ndarray) -> np.ndarray:
        """Distances to per-query candidate rows, in label order
        (reference IndexFlat::compute_distance_subset,
        IndexFlat.cpp:60-96); labels < 0 give the metric's worst."""
        from auncel_tpu.ops.knn import compute_distance_subset
        return compute_distance_subset(q, self._xb, labels, self.metric)

    def range_search(self, q: np.ndarray, radius: float):
        """All stored vectors within ``radius`` (reference
        IndexFlat::range_search, IndexFlat.cpp — L2: squared distance <
        radius, IP: score > radius). Returns the same RangeSearchResult
        as the IVF path."""
        import jax.numpy as jnp
        from auncel_tpu.index.aux import RangeSearchResult
        from auncel_tpu.ops.distance import pairwise_scores
        q = np.asarray(q, np.float32)
        nq = q.shape[0]
        block = 65536
        all_q, all_l, all_d = [], [], []
        for j0 in range(0, max(self.ntotal, 1), block):
            yb = self._xb[j0:j0 + block]
            if yb.shape[0] == 0:
                break
            n_real = yb.shape[0]
            if n_real != block and self.ntotal > block:
                # pad the ragged tail to the full block: one compiled
                # shape for every corpus size (axon compile-lottery rule)
                yb = np.concatenate(
                    [yb, np.zeros((block - n_real, self.d), np.float32)])
            s = np.asarray(pairwise_scores(jnp.asarray(q), jnp.asarray(yb),
                                           self.metric))
            hit = (s < radius) if self.metric.lower_is_better \
                else (s > radius)
            hit[:, n_real:] = False
            qi, ji = np.nonzero(hit)   # qi is sorted (row-major nonzero)
            all_q.append(qi)
            all_l.append(j0 + ji)
            all_d.append(s[qi, ji])
        qi = np.concatenate(all_q) if all_q else np.zeros(0, np.int64)
        labels = (np.concatenate(all_l) if all_l
                  else np.zeros(0, np.int64)).astype(np.int64)
        dists = (np.concatenate(all_d) if all_d
                 else np.zeros(0, np.float32)).astype(np.float32)
        order = np.argsort(qi, kind="stable")  # group hits per query
        lims = np.zeros(nq + 1, np.int64)
        np.cumsum(np.bincount(qi, minlength=nq), out=lims[1:])
        return RangeSearchResult(lims=lims, labels=labels[order],
                                 distances=dists[order])


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

    def reconstruct(self, key: int) -> np.ndarray:
        return _xb_reconstruct(self._xb, key)

    def reconstruct_n(self, i0: int, n: int) -> np.ndarray:
        return self._xb[i0:i0 + n].copy()

    def reconstruct_batch(self, keys: np.ndarray) -> np.ndarray:
        return _xb_reconstruct_batch(self._xb, self.d, keys)

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


class IndexFlatL2BaseShift(FlatIndex):
    """Flat L2 index whose distances carry a per-stored-row additive shift
    (reference IndexFlatL2BaseShift, IndexFlat.h:53-66)."""

    def __init__(self, d: int, shift: np.ndarray | None = None):
        super().__init__(d, Metric.L2)
        self.shift = (np.asarray(shift, np.float32)
                      if shift is not None else np.zeros(0, np.float32))

    def add(self, x, ids=None, shift: np.ndarray | None = None):
        n = np.asarray(x).shape[0]
        super().add(x, ids)
        s = (np.asarray(shift, np.float32) if shift is not None
             else np.zeros(n, np.float32))
        assert s.shape[0] == n
        self.shift = np.concatenate([self.shift, s])

    def search(self, q, k: int):
        from auncel_tpu.ops.knn import knn_l2sqr_base_shift
        res = knn_l2sqr_base_shift(q, self._xb, k, self.shift)
        return res.vals, res.ids.astype(np.int64)


class IndexFlat1D(Index):
    """Optimized 1-d flat index (reference IndexFlat1D, IndexFlat.h:134):
    values kept sorted, search is a binary probe + two-pointer expansion —
    here one vectorized searchsorted + window top-k."""

    def __init__(self):
        self.d = 1
        self.metric = Metric.L2
        self.is_trained = True
        self._vals = np.zeros(0, np.float32)
        self._ids = np.zeros(0, np.int64)
        self._sorted = False

    @property
    def ntotal(self) -> int:
        return self._vals.shape[0]

    def train(self, x):
        pass

    def add(self, x, ids=None):
        x = np.asarray(x, np.float32).reshape(-1)
        if ids is None:
            ids = np.arange(self.ntotal, self.ntotal + x.size,
                            dtype=np.int64)
        self._vals = np.concatenate([self._vals, x])
        self._ids = np.concatenate([self._ids, np.asarray(ids, np.int64)])
        self._sorted = False

    def update_permutation(self):
        order = np.argsort(self._vals, kind="stable")
        self._vals = self._vals[order]
        self._ids = self._ids[order]
        self._sorted = True

    def search(self, q, k: int):
        if not self._sorted:
            self.update_permutation()
        q = np.asarray(q, np.float32).reshape(-1)
        n = self.ntotal
        k_eff = min(k, n)
        pos = np.searchsorted(self._vals, q)
        # candidate window of 2k around the insertion point covers the
        # true top-k (values are sorted)
        offs = np.arange(-k_eff, k_eff)
        raw = pos[:, None] + offs[None, :]
        valid = (raw >= 0) & (raw < n)   # clipped slots would duplicate
        win = np.clip(raw, 0, max(n - 1, 0))
        cand = self._vals[win]
        d = np.where(valid, (cand - q[:, None]) ** 2, np.inf)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
        vals = np.take_along_axis(d, order, 1)
        ids = np.where(np.isinf(vals), -1,
                       self._ids[np.take_along_axis(win, order, 1)])
        if k > n:
            pad = k - n
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=np.inf)
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return vals.astype(np.float32), ids

    def reset(self):
        self._vals = np.zeros(0, np.float32)
        self._ids = np.zeros(0, np.int64)
        self._sorted = False


def sq_levels(qtype: str) -> float:
    """Code levels per scalar-quantizer type (reference ScalarQuantizer
    QT_* families, IndexScalarQuantizer.h:34-41): sq8* -> 255, sq6 -> 63,
    sq4* -> 15."""
    if qtype.startswith("sq8"):
        return 255.0
    if qtype.startswith("sq6"):
        return 63.0
    return 15.0


def sq_code_width(d: int, qtype: str) -> int:
    """Packed byte width per vector: sq4 = d/2, sq6 = 3d/4, else d."""
    if qtype.startswith("sq4"):
        assert d % 2 == 0, "SQ4 needs an even dimension"
        return d // 2
    if qtype.startswith("sq6"):
        assert d % 4 == 0, "SQ6 needs d % 4 == 0"
        return d * 3 // 4
    return d


def sq_pack(codes: np.ndarray, qtype: str) -> np.ndarray:
    """uint8 per-dimension codes [n, d] -> packed storage bytes.
    sq4: two dims per byte (low nibble first). sq6: four dims per three
    bytes, little-endian 24-bit group (the reference's QT_6bit bit
    packing in spirit; the layout only needs to round-trip through
    ``IVFArrays.decode_block``, which implements the inverse)."""
    if qtype.startswith("sq4"):
        return codes[:, 0::2] | (codes[:, 1::2] << 4)
    if qtype.startswith("sq6"):
        d = codes.shape[1]
        g = codes.reshape(-1, d // 4, 4).astype(np.uint32)
        w = g[..., 0] | (g[..., 1] << 6) | (g[..., 2] << 12) \
            | (g[..., 3] << 18)
        out = np.stack([w & 255, (w >> 8) & 255, (w >> 16) & 255], -1)
        return out.reshape(-1, d // 4 * 3).astype(np.uint8)
    return codes


def sq_train_range(x: np.ndarray, qtype: str, rangestat: str = "minmax",
                   rangestat_arg: float = 0.0):
    """Affine SQ range from a training set -> (vmin [d], scale [d]) f32.

    One trainer for both the standalone IndexScalarQuantizer and the IVF
    storage codecs. ``rangestat`` follows the reference ScalarQuantizer::
    RangeStat (IndexScalarQuantizer.h:51-56): "minmax" = [min-rs*(max-min),
    max+rs*(max-min)], "meanstd" = [mean-rs*std, mean+rs*std],
    "quantiles" = [Q(rs), Q(1-rs)]. Uniform qtypes ("sq8u"/"sq4u")
    compute the statistic over the flattened set (one shared range)."""
    assert rangestat in ("minmax", "meanstd", "quantiles"), rangestat
    x = np.asarray(x, np.float32)
    d = x.shape[1]
    levels = sq_levels(qtype)
    xs = x.reshape(-1, 1) if qtype.endswith("u") else x
    rs = float(rangestat_arg)
    if rangestat == "meanstd":
        mu, sd = xs.mean(0), xs.std(0)
        rs = rs if rs > 0 else 1.0   # reference uses rs*std directly
        vmin, vmax = mu - sd * rs, mu + sd * rs
    elif rangestat == "quantiles":
        q = rs if rs > 0 else 0.01
        vmin = np.quantile(xs, q, axis=0)
        vmax = np.quantile(xs, 1.0 - q, axis=0)
    else:
        vmin, vmax = xs.min(0), xs.max(0)
        vmin, vmax = vmin - rs * (vmax - vmin), vmax + rs * (vmax - vmin)
    if qtype.endswith("u"):
        vmin = np.full(d, vmin[0], np.float32)
        vmax = np.full(d, vmax[0], np.float32)
    vmin = vmin.astype(np.float32)
    scale = np.maximum((vmax - vmin) / levels, 1e-10).astype(np.float32)
    return vmin, scale


class IndexScalarQuantizer(Index):
    """Standalone (non-IVF) scalar-quantized flat index — the reference's
    ``IndexScalarQuantizer`` (IndexScalarQuantizer.h:92): corpus stored as
    SQ codes, searched by exhaustive decode+compare.

    TPU recast: codes are packed into fixed ``row_cap``-wide rows of an
    ``IVFArrays`` (rows play the role of lists, like the multirow layout)
    and searched with the existing blocked full-scan — each code block is
    read from HBM once per batch, decoded in-scan through the shared
    ``decode_block`` codec, and contracted on the MXU. ``qtype``:
    "sq8"/"sq4" (per-dim affine, trained min/max like the IVF storage
    path), "sq8u"/"sq4u" (ONE shared range for all dimensions — the
    reference's QT_8bit_uniform / QT_4bit_uniform,
    IndexScalarQuantizer.h:37-38), "sq6" (QT_6bit: 64 levels packed four
    dims per three bytes, IndexScalarQuantizer.h:41), "sq8d" (QT_8bit_direct:
    codes ARE the uint8 values, decode is the identity affine —
    IndexScalarQuantizer.h:40) or "bf16" (the reference's QT_fp16
    capability in the TPU-native 16-bit float format)."""

    position_keyed_ids = True
    ROW_CAP = 512

    def __init__(self, d: int, qtype: str = "sq8",
                 metric: Metric = Metric.L2,
                 rangestat: str = "minmax", rangestat_arg: float = 0.0):
        assert qtype in ("sq8", "sq4", "sq8u", "sq4u", "sq6", "sq8d",
                         "bf16"), qtype
        sq_code_width(d, qtype)  # validates the d divisibility constraint
        # range-training statistic (reference ScalarQuantizer::RangeStat,
        # IndexScalarQuantizer.h:51-56): "minmax" = [min-rs*(max-min),
        # max+rs*(max-min)], "meanstd" = [mean-rs*std, mean+rs*std],
        # "quantiles" = [Q(rs), Q(1-rs)]. RS_optim (alternate optimization)
        # is a CPU-side refinement of minmax the reference itself defaults
        # away from; "minmax" is its starting point here.
        assert rangestat in ("minmax", "meanstd", "quantiles"), rangestat
        self.rangestat = rangestat
        self.rangestat_arg = float(rangestat_arg)
        self.d = d
        self.qtype = qtype
        self.metric = Metric.parse(metric)
        # bf16 and 8bit_direct are training-free (direct: identity affine)
        self.is_trained = qtype in ("bf16", "sq8d")
        self._scale: np.ndarray | None = (
            np.ones(d, np.float32) if qtype == "sq8d" else None)
        self._vmin: np.ndarray | None = (
            np.zeros(d, np.float32) if qtype == "sq8d" else None)
        self._codes = None                 # host [n, d_code]
        self._arrays = None

    @property
    def ntotal(self) -> int:
        return 0 if self._codes is None else self._codes.shape[0]

    def train(self, x: np.ndarray) -> None:
        """Per-dimension affine range from the training set (the
        reference's ScalarQuantizer::train RangeStat semantics)."""
        if self.qtype in ("bf16", "sq8d"):
            return
        self._vmin, self._scale = sq_train_range(
            x, self.qtype, self.rangestat, self.rangestat_arg)
        self.is_trained = True

    def _encode(self, x: np.ndarray) -> np.ndarray:
        if self.qtype == "bf16":
            import jax.numpy as jnp
            return np.asarray(jnp.asarray(x).astype(jnp.bfloat16))
        codes = np.clip(np.rint((x - self._vmin) / self._scale), 0,
                        sq_levels(self.qtype)).astype(np.uint8)
        return sq_pack(codes, self.qtype)

    def add(self, x: np.ndarray, ids=None) -> None:
        assert ids is None, "IndexScalarQuantizer stores sequential ids"
        assert self.is_trained, "train before add"
        x = np.asarray(x, np.float32)
        codes = self._encode(x)
        self._codes = (codes if self._codes is None
                       else np.concatenate([self._codes, codes]))
        self._arrays = None

    def _pack(self):
        """Rows-of-codes IVFArrays for the blocked full scan."""
        import jax.numpy as jnp
        from auncel_tpu.index.scan import IVFArrays
        if self._arrays is not None:
            return self._arrays
        n = self.ntotal
        rc = self.ROW_CAP
        n_rows = max(-(-n // rc), 1)
        n_rows = ((n_rows + 7) // 8) * 8   # full scan chunks rows by 8
        d_code = self._codes.shape[1] if n else sq_code_width(
            self.d, self.qtype)
        dt = self._codes.dtype if n else np.uint8
        codes = np.zeros((n_rows * rc, d_code), dt)
        if n:
            codes[:n] = self._codes
        vec_ids = np.full(n_rows * rc, -1, np.int32)
        vec_ids[:n] = np.arange(n, dtype=np.int32)
        db = jnp.asarray(codes).reshape(n_rows, rc, d_code)
        a = IVFArrays(
            centroids=jnp.zeros((n_rows, self.d), jnp.float32),
            cent_sq=jnp.zeros((n_rows,), jnp.float32),
            db=db,
            db_sq=jnp.zeros((n_rows, rc), jnp.float32),
            vec_ids=jnp.asarray(vec_ids).reshape(n_rows, rc),
            list_sizes=jnp.zeros((n_rows,), jnp.int32),
            interdis=jnp.zeros((1, 1), jnp.float32),
            sq_scale=(None if self.qtype == "bf16"
                      else jnp.asarray(self._scale)),
            sq_bias=(None if self.qtype == "bf16"
                     else jnp.asarray(self._vmin)),
        )
        # decoded norms (padding rows decode to bias values; they are
        # masked by vec_ids == -1 in the scan, but keep db_sq exact for
        # the real slots)
        dec = a.decode_block(db).astype(jnp.float32)
        a = a._replace(db_sq=jnp.sum(jnp.square(dec), -1) *
                       (a.vec_ids >= 0))
        self._arrays = a
        return a

    def search(self, q: np.ndarray, k: int):
        import jax
        import jax.numpy as jnp
        from auncel_tpu.index.scan import ivf_full_scan
        a = self._pack()
        q = jnp.asarray(np.asarray(q, np.float32))
        vals, ids = jax.device_get(
            ivf_full_scan(a, q, k, self.metric,
                          list_chunk=min(8, a.db.shape[0])))
        return vals, ids.astype(np.int64)

    def reconstruct(self, key: int) -> np.ndarray:
        a = self._pack()
        rc = self.ROW_CAP
        blk = a.db[key // rc, key % rc][None, None]
        return np.asarray(a.decode_block(blk), np.float32)[0, 0]

    def reset(self) -> None:
        self._codes = None
        self._arrays = None
