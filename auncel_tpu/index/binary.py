"""Binary indexes (Hamming space).

Capability parity with the reference's binary family (SURVEY.md §2 #19:
``IndexBinaryFlat``/``IndexBinaryIVF`` + ``hamming.cpp``): vectors are
bitstrings stored packed (uint8, d bits = d/8 bytes), searched by Hamming
distance.

TPU recast: instead of XOR+popcount scalar loops, Hamming distance is an
MXU matmul via the 0/1 identity

    hamming(a, b) = popcount(a) + popcount(b) - 2 * <bits(a), bits(b)>

so the compute path unpacks codes to {0,1} int8 planes once at add time and
every search is one integer matmul + rank-1 corrections. Storage keeps the
packed uint8 codes for API/serialization parity; the unpacked plane is the
device-resident working set (8x bytes for ~100x throughput vs scalar
popcount loops — the classic TPU memory-for-MXU trade).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.index.base import Index
from auncel_tpu.types import Metric


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """{0,1} [n, d] -> packed uint8 [n, d/8] (little-endian bit order,
    matching np.unpackbits(bitorder='little'))."""
    return np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")


def unpack_bits(codes: np.ndarray, d: int) -> np.ndarray:
    return np.unpackbits(codes, axis=1, count=d, bitorder="little")


@functools.partial(jax.jit, static_argnames=("k",))
def _hamming_topk(qbits, dbbits, db_pop, k):
    """qbits [nq, d] {0,1} f32/bf16; dbbits [nb, d]; returns top-k smallest
    Hamming distances."""
    dots = jax.lax.dot_general(
        qbits, dbbits, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    q_pop = jnp.sum(qbits, axis=1, dtype=jnp.float32)
    ham = q_pop[:, None] + db_pop[None, :] - 2.0 * dots
    negv, idx = jax.lax.top_k(-ham, k)
    return -negv, idx


class BinaryFlatIndex(Index):
    """Exact Hamming k-NN (reference IndexBinaryFlat)."""

    position_keyed_ids = True   # sequential ids -> IndexShards translates

    def __init__(self, d: int):
        assert d % 8 == 0, "binary dimension must be a multiple of 8 bits"
        self.d = d                       # dimension in BITS
        self.metric = Metric.L2          # Hamming: smaller is better
        self.is_trained = True
        self._codes = np.zeros((0, d // 8), np.uint8)
        self._bits = None

    @property
    def ntotal(self) -> int:
        return self._codes.shape[0]

    @property
    def codes(self) -> np.ndarray:
        return self._codes

    def train(self, x) -> None:
        pass

    def add(self, codes: np.ndarray, ids=None) -> None:
        assert ids is None, "BinaryFlat stores sequential ids"
        codes = np.asarray(codes, np.uint8)
        assert codes.shape[1] == self.d // 8
        self._codes = np.concatenate([self._codes, codes], 0)
        self._bits = None

    def _device_bits(self):
        if self._bits is None:
            bits = unpack_bits(self._codes, self.d)
            b = jnp.asarray(bits, jnp.bfloat16)
            self._bits = (b, jnp.sum(b.astype(jnp.float32), axis=1))
        return self._bits

    def search(self, q_codes: np.ndarray, k: int):
        """q_codes: packed uint8 [nq, d/8]. Returns (hamming distances
        [nq, k] int32, ids [nq, k])."""
        dbbits, db_pop = self._device_bits()
        qbits = jnp.asarray(unpack_bits(np.asarray(q_codes, np.uint8),
                                        self.d), jnp.bfloat16)
        vals, idx = jax.device_get(
            _hamming_topk(qbits, dbbits, db_pop, min(k, self.ntotal)))
        vals = np.rint(vals).astype(np.int32)
        if vals.shape[1] < k:  # pad like the float indexes
            pad = k - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)),
                          constant_values=np.iinfo(np.int32).max)
            idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
        return vals, idx.astype(np.int64)

    def reset(self) -> None:
        self._codes = np.zeros((0, self.d // 8), np.uint8)
        self._bits = None


class BinaryIVFIndex(Index):
    """IVF over Hamming space (reference IndexBinaryIVF): binary centroids
    from thresholded k-means on the unpacked bit planes; probe the nprobe
    nearest cells, scan their members exactly."""

    position_keyed_ids = True

    def __init__(self, d: int, nlist: int, coarse_hnsw_m: int | None = None):
        assert d % 8 == 0
        self.d = d
        self.nlist = nlist
        self.metric = Metric.L2
        self.is_trained = False
        self.nprobe = 1
        # BIVF%d_HNSW%d factory cell (AutoTune.cpp:980-985): probe cells
        # through a binary HNSW over the centroid codes instead of the
        # exact Hamming rank (approximate coarse quantizer capability)
        self.coarse_hnsw_m = coarse_hnsw_m
        self._coarse_g = None
        self.centroid_bits: np.ndarray | None = None  # {0,1} [nlist, d]
        self._codes = np.zeros((0, d // 8), np.uint8)
        self._dev = None

    @property
    def ntotal(self) -> int:
        return self._codes.shape[0]

    def train(self, codes: np.ndarray) -> None:
        from auncel_tpu.ops.kmeans import kmeans, KmeansParams
        bits = unpack_bits(np.asarray(codes, np.uint8), self.d)
        res = kmeans(bits.astype(np.float32), self.nlist,
                     KmeansParams(niter=10))
        # majority-vote binarization (reference trains float then rounds)
        self.centroid_bits = (res.centroids > 0.5).astype(np.uint8)
        self._coarse_g = None
        self.is_trained = True

    def add(self, codes: np.ndarray, ids=None) -> None:
        assert self.is_trained and ids is None
        codes = np.asarray(codes, np.uint8)
        self._codes = np.concatenate([self._codes, codes], 0)
        self._dev = None

    def _build(self):
        if self._dev is not None:
            return self._dev
        bits = unpack_bits(self._codes, self.d)
        cb = jnp.asarray(self.centroid_bits, jnp.bfloat16)
        xb = jnp.asarray(bits, jnp.bfloat16)
        cpop = jnp.sum(cb.astype(jnp.float32), 1)
        _, assign = jax.device_get(_hamming_topk(xb, cb, cpop, 1))
        assign = assign[:, 0]
        order = np.argsort(assign, kind="stable")
        sizes = np.bincount(assign, minlength=self.nlist)
        starts = np.zeros(self.nlist + 1, np.int64)
        np.cumsum(sizes, out=starts[1:])
        self._dev = (bits, assign, order, starts, cb, cpop)
        return self._dev

    def _coarse_probes(self, q_codes: np.ndarray, qb, cb, cpop,
                       nprobe: int):
        """Probe cells: exact Hamming rank, or the BHNSW quantizer when
        coarse_hnsw_m is set (the BIVF%d_HNSW%d factory capability)."""
        if self.coarse_hnsw_m is None:
            _, probes = jax.device_get(_hamming_topk(qb, cb, cpop, nprobe))
            return probes
        if self._coarse_g is None:
            g = BinaryHNSWIndex(self.d, M=self.coarse_hnsw_m,
                                ef_search=max(4 * nprobe, 32))
            g.add(pack_bits(self.centroid_bits))
            g.build()
            self._coarse_g = g
        _, probes = self._coarse_g.search(
            np.asarray(q_codes, np.uint8), nprobe,
            ef=max(4 * nprobe, 32))
        return np.maximum(probes, 0)   # -1 pads -> cell 0 (duplicate scan)

    def search(self, q_codes: np.ndarray, k: int,
               nprobe: int | None = None):
        bits, assign, order, starts, cb, cpop = self._build()
        nprobe = min(nprobe or self.nprobe, self.nlist)
        qbits_np = unpack_bits(np.asarray(q_codes, np.uint8), self.d)
        qb = jnp.asarray(qbits_np, jnp.bfloat16)
        probes = self._coarse_probes(q_codes, qb, cb, cpop, nprobe)
        nq = qb.shape[0]
        out_v = np.full((nq, k), np.iinfo(np.int32).max, np.int32)
        out_i = np.full((nq, k), -1, np.int64)
        # per-query candidate scan (host gather + one device matmul each;
        # fine for the binary family's modest corpus sizes)
        for qi in range(nq):
            cand = np.unique(np.concatenate(
                [order[starts[l]:starts[l + 1]] for l in probes[qi]]))
            if cand.size == 0:
                continue
            cb_bits = jnp.asarray(bits[cand], jnp.bfloat16)
            pop = jnp.sum(cb_bits.astype(jnp.float32), 1)
            vals, idx = jax.device_get(_hamming_topk(
                qb[qi:qi + 1], cb_bits, pop, min(k, cand.size)))
            kk = vals.shape[1]
            out_v[qi, :kk] = np.rint(vals[0]).astype(np.int32)
            out_i[qi, :kk] = cand[idx[0]]
        return out_v, out_i

    def reset(self) -> None:
        self._codes = np.zeros((0, self.d // 8), np.uint8)
        self._dev = None
        self._coarse_g = None


class BinaryHNSWIndex(Index):
    """Binary-code HNSW (reference IndexBinaryHNSW): the float HNSW graph
    machinery over UNPACKED bit vectors — Hamming distance between 0/1
    float vectors is exactly their squared L2 distance (popcount identity
    b1 XOR b2 == ||b1 - b2||^2), so the graph index runs unchanged and
    returns true Hamming distances."""

    position_keyed_ids = True

    def __init__(self, d: int, M: int = 16, ef_search: int = 32):
        from auncel_tpu.index.hnsw import HNSWIndex
        self.d = d                      # bits per code
        self.metric = Metric.L2         # L2 over 0/1 == Hamming
        self.is_trained = True
        self._g = HNSWIndex(d, M=M, ef_search=ef_search)

    @property
    def ntotal(self) -> int:
        return self._g.ntotal

    def train(self, codes) -> None:
        pass

    def add(self, codes: np.ndarray, ids=None) -> None:
        assert ids is None, "BinaryHNSWIndex stores sequential ids"
        self._g.add(unpack_bits(np.asarray(codes, np.uint8), self.d)
                    .astype(np.float32))

    def build(self) -> None:
        self._g.build()

    def search(self, q_codes: np.ndarray, k: int, ef: int | None = None):
        q = unpack_bits(np.asarray(q_codes, np.uint8),
                        self.d).astype(np.float32)
        vals, ids = self._g.search(q, k, ef=ef)
        # squared L2 over 0/1 vectors IS the integer Hamming distance.
        # Pad slots carry +inf from the float graph: casting inf to int32
        # is undefined (INT32_MIN on numpy — would rank BETTER than every
        # real hit, e.g. through IndexShards' k-way merge); keep the
        # integer-Hamming worst value instead. (Assign through a mask:
        # np.where would keep float32, where int32 max is not exactly
        # representable and the cast overflows right back to INT32_MIN.)
        out = np.full(vals.shape, np.iinfo(np.int32).max, np.int32)
        fin = np.isfinite(vals)
        out[fin] = np.rint(vals[fin]).astype(np.int32)
        return out, ids

    def reset(self) -> None:
        self._g.reset()


class IndexBinaryFromFloat(Index):
    """Binary index backed by an arbitrary FLOAT index (reference
    IndexBinaryFromFloat.h:28 / .cpp): codes are mapped bit -> ±1 floats
    (``binary_to_real``, utils.cpp:1564), train/add/search run on the
    float index, and returned L2 distances divide by 4 back into integer
    Hamming distances ((±1 difference)^2 contributes 4 per differing
    bit). Lets any float family (IVF, HNSW, ...) serve binary data."""

    def __init__(self, sub: Index, d: int):
        assert d % 8 == 0, "binary dimension must be a multiple of 8 bits"
        assert sub.d == d, "float sub-index dimension must equal bit count"
        self.d = d
        self.metric = Metric.L2
        self.sub = sub

    @property
    def is_trained(self):
        return self.sub.is_trained

    @is_trained.setter
    def is_trained(self, v):  # pragma: no cover - keeps Index contract
        pass

    @property
    def ntotal(self) -> int:
        return self.sub.ntotal

    def _to_real(self, codes: np.ndarray) -> np.ndarray:
        bits = unpack_bits(np.asarray(codes, np.uint8), self.d)
        return (2.0 * bits - 1.0).astype(np.float32)

    def train(self, codes: np.ndarray) -> None:
        self.sub.train(self._to_real(codes))

    def add(self, codes: np.ndarray, ids=None) -> None:
        self.sub.add(self._to_real(codes), ids) if ids is not None \
            else self.sub.add(self._to_real(codes))

    def search(self, q_codes: np.ndarray, k: int, **kw):
        vals, ids = self.sub.search(self._to_real(q_codes), k, **kw)
        vals = np.asarray(vals, np.float64) / 4.0
        # padded slots carry +inf from the float sub-index: casting inf
        # to int32 is undefined (INT32_MIN on numpy — ranks BETTER than
        # every real hit); keep the integer-Hamming worst value instead
        out = np.where(np.isfinite(vals),
                       np.rint(np.where(np.isfinite(vals), vals, 0.0)),
                       np.iinfo(np.int32).max).astype(np.int32)
        return out, ids

    def reset(self) -> None:
        self.sub.reset()


def index_binary_factory(d: int, description: str) -> Index:
    """Binary factory grammar (reference ``index_binary_factory``,
    AutoTune.cpp:973-1008): "BFlat", "BIVF%d", "BHNSW%d",
    "BIVF%d_HNSW%d" (also accepts the tests' "BIVF%d_BHNSW%d" spelling).
    ``d`` is the BIT count (code_size = d / 8 bytes)."""
    import re
    m = re.fullmatch(r"BIVF(\d+)_B?HNSW(\d+)", description)
    if m:
        return BinaryIVFIndex(d, nlist=int(m.group(1)),
                              coarse_hnsw_m=int(m.group(2)))
    m = re.fullmatch(r"BIVF(\d+)", description)
    if m:
        return BinaryIVFIndex(d, nlist=int(m.group(1)))
    m = re.fullmatch(r"BHNSW(\d+)?", description)
    if m:
        return BinaryHNSWIndex(d, M=int(m.group(1) or 32))
    if description == "BFlat":
        return BinaryFlatIndex(d)
    raise NotImplementedError(
        f"binary factory description {description!r} "
        "(grammar: BFlat | BIVF%d | BHNSW%d | BIVF%d_HNSW%d)")
