"""IVF-Flat index: construction, packing, and search entry points.

Capability parity with the reference's ``IndexIVF`` + ``IndexIVFFlat``
(``/root/reference/Auncel/IndexIVF.{h,cpp}``, ``IndexIVFFlat.{h,cpp}``):
k-means coarse quantizer training (``Level1Quantizer::train_q1``,
IndexIVF.cpp:71-137), the inter-centroid distance matrix ``interdis_cem``
computed at train time (IndexIVF.cpp:97-111), vector assignment + inverted
list storage, and fixed-nprobe search.

TPU-first layout decision: inverted lists are packed into a padded dense
``[nlist, cap, d]`` HBM tensor (cap = max list length rounded up for lane
alignment) instead of per-list byte vectors. Padding slots carry id -1 and
are masked in the scan. This trades HBM for fixed shapes — the price of
making every probe an MXU matmul. List-length skew is surfaced via
``packing_efficiency`` so callers can monitor waste.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.base import Index
from auncel_tpu.index.scan import IVFArrays, ivf_search_fixed, coarse_rank
from auncel_tpu.ops.kmeans import kmeans, KmeansParams
from auncel_tpu.ops.distance import pairwise_l2sqr, pairwise_ip, sqnorms

# scalar-quantized storage codecs (reference ScalarQuantizer QT_* families,
# IndexScalarQuantizer.h:34-41; "u" = uniform/shared range, "d" = direct)
SQ_STORAGE = ("sq8", "sq4", "sq8u", "sq4u", "sq6", "sq8d")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "metric", "block"))
def _assign_topk(xd, centroids, cent_sq, k, metric, block):
    """Top-k nearest centroids for every (device-resident) corpus row.
    Device-side so the corpus is uploaded once (host->device through the
    axon tunnel is the build-time bottleneck)."""
    from auncel_tpu.ops.distance import pairwise_scores
    from auncel_tpu.ops.topk import topk_scores
    n = xd.shape[0]
    nsteps = n // block
    nlist = centroids.shape[0]
    out = jnp.zeros((n, k), jnp.int32)

    def body(i, out):
        xb = jax.lax.dynamic_slice_in_dim(xd, i * block, block, 0)
        s = pairwise_scores(xb, centroids, metric, y_sqnorms=cent_sq)
        ids = jax.lax.broadcasted_iota(jnp.int32, (block, nlist), 1)
        _, top = topk_scores(s, ids, k, metric)
        return jax.lax.dynamic_update_slice_in_dim(out, top, i * block, 0)

    return jax.lax.fori_loop(0, nsteps, body, out)


@functools.partial(jax.jit, static_argnames=("nlist", "cap", "dtype"))
def _scatter_pack(xd, list_idx, slot_idx, nlist, cap, dtype):
    """Scatter device-resident rows into the padded [nlist, cap, d] layout
    and compute stored-dtype norms, all on device."""
    d = xd.shape[1]
    db = jnp.zeros((nlist, cap, d), dtype)
    db = db.at[list_idx, slot_idx].set(xd.astype(dtype))
    db_sq = jnp.sum(jnp.square(db.astype(jnp.float32)), axis=-1)
    return db, db_sq


def preserve_sq_range(index) -> None:
    """Pin the current affine SQ range on an index about to be rebuilt
    from DECODED vectors (remove_ids / update_vectors / IDMap removal),
    so re-encoding reproduces the surviving codes bit-for-bit instead of
    re-training a shifted range — the same trick the exact-code reload
    uses (io.py ``_sq_range_override``). No-op for non-SQ storage. PQ
    storage has no equivalent (codebooks retrain on the decoded data;
    the reference edits codes in place instead)."""
    a = getattr(index, "_arrays", None)
    if a is not None and a.sq_scale is not None:
        index._sq_range_override = (
            np.asarray(a.sq_bias, np.float32),
            np.asarray(a.sq_scale, np.float32))


@jax.jit
def _sq_norms_fused(db_codes, scale, bias):
    """Decoded squared norms of a packed SQ tensor, fused under jit so
    XLA never materializes the decoded [nlist, cap, d] float32 tensor
    (4-8x the code bytes at 1M scale)."""
    from auncel_tpu.index.scan import sq_decode_dev
    dec = sq_decode_dev(db_codes, scale.shape[0], scale, bias)
    return jnp.sum(jnp.square(dec), axis=-1)


def compute_interdis(centroids: np.ndarray, metric: Metric) -> np.ndarray:
    """All-pairs centroid distance matrix (reference ``fvec_inter_vecs`` /
    ``fvec_inter_vecs_IP``, IVF_pro.cpp:21-39, stored packed there, dense
    here). L2: squared distances. IP: angles arccos(<ci, cj>) over
    L2-normalized centroids (IndexIVF.cpp:97-111)."""
    c = jnp.asarray(centroids, jnp.float32)
    if metric is Metric.L2:
        m = pairwise_l2sqr(c, c)
        m = jnp.maximum(m, 0.0)
    else:
        cn = c / jnp.sqrt(jnp.maximum(sqnorms(c), 1e-20))[:, None]
        ip = jnp.clip(pairwise_ip(cn, cn), -1.0, 1.0)
        m = jnp.arccos(ip)
    m = m.at[jnp.diag_indices(c.shape[0])].set(0.0)
    return np.asarray(m, np.float32)


class IVFFlatIndex(Index):
    def __init__(
        self,
        d: int,
        nlist: int,
        metric: Metric = Metric.L2,
        storage_dtype=jnp.float32,
        kmeans_params: KmeansParams | None = None,
        cap_quantile: float = 1.0,
        storage: str = "f32",
        pq_residual: bool = True,
        coarse: str = "kmeans",
        polysemous: bool = False,
        polysemous_ht: int = 0,
        sq_rangestat: str = "minmax",
        sq_rangestat_arg: float = 0.0,
    ):
        """``storage``: "f32" (raw), "bf16", "sq8"/"sq4" (per-dim affine
        scalar quantization, the reference's IndexIVFScalarQuantizer
        capability, SURVEY.md §2 #17), "sq8u"/"sq4u" (one range shared by
        all dimensions — QT_8bit_uniform / QT_4bit_uniform,
        IndexScalarQuantizer.h:37-38), "sq6" (QT_6bit, 64 levels packed
        4 dims / 3 bytes), "sq8d" (QT_8bit_direct: identity affine,
        training-free), or "pqM" (product quantization,
        #16). All distances are computed on decoded values. Caveat measured
        on the 1M benchmark: bf16's ~0.4% rounding noise can dominate
        neighbor ordering when clusters are tight relative to coordinate
        magnitudes — worst-case recall degrades far more than mean recall.
        Compressed storage trades recall for bandwidth; f32 is the
        bound-safe default.

        ``cap_quantile``: list capacity is the given quantile of list
        sizes (k-means list lengths are skewed; padding every list to the
        max wastes HBM and scan bandwidth). Vectors overflowing a capped
        list spill (farthest-from-centroid first) to their next-nearest
        list with room — still exactly searchable, but reachable via a
        different probe, which measurably hurts the WORST-case recall tail
        that per-query bounds are about. Default 1.0 = no spilling (safe);
        lower only for memory-constrained deployments without worst-case
        bounds."""
        self.d = d
        self.nlist = nlist
        self.metric = Metric.parse(metric)
        self.storage = storage
        self.coarse = coarse  # "kmeans" | "imi" (IMI2x%d product cells)
        if storage == "bf16":
            storage_dtype = jnp.bfloat16
        self.storage_dtype = storage_dtype
        self.kmeans_params = kmeans_params or KmeansParams()
        self.cap_quantile = cap_quantile
        self.pq_residual = pq_residual
        # polysemous filter on PQ storage (reference IndexIVFPQ
        # ST_polysemous; ht=0 = filter off, IndexPQ.h:24)
        self.polysemous = polysemous
        self.polysemous_ht = polysemous_ht
        # SQ range-training statistic (shared sq_train_range helper;
        # reference ScalarQuantizer::RangeStat, IndexScalarQuantizer.h:51)
        self.sq_rangestat = sq_rangestat
        self.sq_rangestat_arg = float(sq_rangestat_arg)
        self.is_trained = False
        self.nprobe = 1  # default for plain search() (IndexIVF.h default)
        # max nb of codes to visit per query; 0 = unlimited (IndexIVF.h:69
        # — the reference breaks the scan loop after the list that crosses
        # the budget; its ParameterSpace sweeps this for IMI quantizers)
        self.max_codes = 0
        # dense-scan crossover for fixed-nprobe search (see search();
        # None disables, 0.0 forces). The live criterion is
        # BATCH-AMORTIZED (round 4): dense iff
        #   B x est_rows >= dense_batch_mult x dense_cut x corpus rows
        # (one shared pass costs ~flat per window; gathers scale with
        # the batch's total budget). Defaults give an effective ratio
        # of 16 corpus-reads-of-gathers per dense pass — between the
        # measured dense win at B=1000 x nprobe=256 (ratio 250: 837 qps
        # dense vs ~290 gather-class at 10M) and break-even — and a
        # B=1 latency query NEVER pays a full corpus pass (the old
        # per-query rule was batch-blind and did exactly that).
        self.dense_cut: float | None = 0.25
        self.dense_batch_mult: float = 64.0
        self.centroids: np.ndarray | None = None
        self.interdis: np.ndarray | None = None
        self._sq_range_override = None  # (vmin, scale) from exact reload
        self._pending: list[tuple[np.ndarray, np.ndarray]] = []
        self._arrays: IVFArrays | None = None
        self._multirow = None
        self._multirow_row_cap: int | None = None
        self._ntotal = 0
        # IVF%d_HNSW%d factory cell: approximate coarse quantizer for the
        # fixed-nprobe path (AutoTune.cpp:807-820); None = exact MXU rank
        self.coarse_hnsw_m: int | None = None
        self._hnswq = None

    # ------------------------------------------------------------- train

    # inter-centroid matrices are O(nlist^2); beyond this they are built
    # on demand (ensure_interdis) — only the error-profile engine needs one
    INTERDIS_EAGER_MAX = 4096

    def train(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float32)
        assert x.shape[1] == self.d
        if self.coarse == "imi":
            from auncel_tpu.index.imi import train_imi_centroids
            self.set_centroids(train_imi_centroids(
                x, self.nlist, self.metric, self.kmeans_params))
        else:
            res = kmeans(x, self.nlist, self.kmeans_params, self.metric)
            self.set_centroids(res.centroids)

    def set_centroids(self, centroids: np.ndarray) -> None:
        """Install externally trained centroids (reference allows reusing a
        cached trained coarse quantizer, eval/bound.cpp:265-268)."""
        centroids = np.asarray(centroids, np.float32)
        assert centroids.shape == (self.nlist, self.d)
        self.centroids = centroids
        self.interdis = (compute_interdis(centroids, self.metric)
                         if self.nlist <= self.INTERDIS_EAGER_MAX else None)
        self.is_trained = True
        self._hnswq = None

    def ensure_interdis(self) -> np.ndarray:
        """Materialize the inter-centroid matrix for the profile engine
        (deferred for very large nlist, e.g. IMI product cells)."""
        if self.interdis is None:
            self.interdis = compute_interdis(self.centroids, self.metric)
            self._arrays = None  # repack with the real matrix
        return self.interdis

    # --------------------------------------------------------------- add

    @property
    def ntotal(self) -> int:
        return self._ntotal

    def add(self, x: np.ndarray, ids: np.ndarray | None = None) -> None:
        assert self.is_trained, "train before add (IndexIVF.cpp:995)"
        x = np.asarray(x, np.float32)
        if ids is None:
            ids = np.arange(self._ntotal, self._ntotal + x.shape[0],
                            dtype=np.int64)
        ids = np.asarray(ids, np.int64)
        assert x.shape[0] == ids.shape[0] and x.shape[1] == self.d
        if ids.size and (ids.max() > np.iinfo(np.int32).max or
                         ids.min() < 0):
            # vec_ids is int32 on device; a silent downcast would wrap
            # the id returned by search and break reconstruct-by-id
            raise ValueError("ids must fit in int32 (packed vec_ids "
                             "layout); remap ids or use IndexIDMap")
        self._pending.append((x, ids))
        self._ntotal += x.shape[0]
        self._arrays = None  # repack lazily
        self._multirow = None

    def assign(self, x: np.ndarray) -> np.ndarray:
        """Nearest-centroid assignment. For IP indexes the reference's
        Level1Quantizer is still an L2 flat quantizer trained on the data
        (train_q1 default), but assignment uses the index metric; we assign
        by the index metric for both (IP = max dot product)."""
        from auncel_tpu.ops.knn import knn
        # Large query blocks: the corpus here is just nlist centroids, and
        # per-dispatch latency dominates otherwise.
        res = knn(x, self.centroids, 1, self.metric, q_block=65536)
        return res.ids[:, 0].astype(np.int64)

    def _pack(self) -> None:
        """Scatter pending vectors into the padded [nlist, cap, d] layout,
        spilling overflow beyond the quantile cap to next-nearest lists."""
        assert self.is_trained
        xs = [p[0] for p in self._pending]
        idlists = [p[1] for p in self._pending]
        x = np.concatenate(xs, 0) if xs else np.zeros((0, self.d), np.float32)
        vid = (np.concatenate(idlists, 0) if idlists
               else np.zeros((0,), np.int64))
        n = x.shape[0]
        xd = codes_d = None
        sq_scale = sq_bias = None
        pq_books = None
        if n:
            # One corpus upload; assignment and packing stay on device.
            # SQ8: quantize on host, upload codes (4x smaller), decode on
            # device — assignment and all distances use DECODED values so
            # every path sees the same numbers.
            block = min(65536, n)
            # Pad to a block multiple on host: a ragged tail would compile a
            # second program (expensive through the axon tunnel).
            n_pad = _round_up(n, block)
            if n_pad != n:
                x = np.concatenate(
                    [x, np.broadcast_to(x[:1], (n_pad - n, self.d))])
            if self.storage in SQ_STORAGE:
                from auncel_tpu.index.flat import (
                    sq_train_range, sq_levels, sq_pack, sq_code_width)
                sq_code_width(self.d, self.storage)  # d divisibility check
                if self._sq_range_override is not None:
                    # exact-code reload: reuse the saved affine range
                    vmin, scale = self._sq_range_override
                elif self.storage == "sq8d":
                    # QT_8bit_direct (IndexScalarQuantizer.h:40): codes ARE
                    # the byte values, identity affine, nothing to train
                    vmin = np.zeros(self.d, np.float32)
                    scale = np.ones(self.d, np.float32)
                else:
                    # range statistics on the REAL rows only — x is
                    # block-padded with copies of x[0] above, which would
                    # skew mean/std/quantile ranges by up to ~24%
                    vmin, scale = sq_train_range(x[:n], self.storage,
                                                 self.sq_rangestat,
                                                 self.sq_rangestat_arg)
                codes = np.clip(np.rint((x - vmin) / scale), 0,
                                sq_levels(self.storage)).astype(np.uint8)
                sq_scale = jnp.asarray(scale)
                sq_bias = jnp.asarray(vmin.astype(np.float32))
                codes_d = jnp.asarray(sq_pack(codes, self.storage))
                # decoded values drive assignment/geometry for consistency
                xd = (jnp.asarray(codes).astype(jnp.float32) * sq_scale
                      + sq_bias)
            else:
                # raw f32/bf16 and PQ (PQ assigns on raw vectors like the
                # reference, then encodes after spill resolution below)
                xd = jnp.asarray(x)
            n_choice = 4 if (self.cap_quantile < 1.0 and self.nlist > 4) \
                else 1
            n_choice = min(n_choice, self.nlist)
            cents = jnp.asarray(self.centroids)
            csq = sqnorms(cents)
            ch = _assign_topk(xd, cents, csq, n_choice, self.metric, block)
            choices = np.asarray(ch)[:n].astype(np.int64)
            xd = xd[:n]
            if codes_d is not None:
                codes_d = codes_d[:n]
        else:
            choices = np.zeros((0, 1), np.int64)
        assign = choices[:, 0].copy() if n else np.zeros((0,), np.int64)
        sizes = np.bincount(assign, minlength=self.nlist).astype(np.int64)
        if self.cap_quantile < 1.0 and n and self.nlist > 4:
            cap = max(int(np.quantile(sizes, self.cap_quantile)),
                      -(-n // self.nlist))
            # evict overflow to 2nd/3rd/4th-nearest lists with room;
            # spill the members FARTHEST from the centroid — they sit near
            # the cell boundary, so their next-nearest list is a
            # geometrically sensible home (closest members keep the cell's
            # Voronoi semantics intact)
            room = cap - np.minimum(sizes, cap)
            order0 = np.argsort(assign, kind="stable")
            starts0 = np.zeros(self.nlist + 1, np.int64)
            np.cumsum(sizes, out=starts0[1:])
            for l in np.where(sizes > cap)[0]:
                members = order0[starts0[l]:starts0[l + 1]]
                d2c = ((x[members] - self.centroids[l]) ** 2).sum(1)
                members = members[np.argsort(d2c)]
                for v in members[cap:]:
                    placed = False
                    for alt in choices[v, 1:]:
                        if room[alt] > 0:
                            assign[v] = alt
                            room[alt] -= 1
                            placed = True
                            break
                    if not placed:  # rare: dump into emptiest list
                        alt = int(np.argmax(room))
                        if room[alt] <= 0:
                            cap += 8  # give everyone headroom
                            room += 8
                        assign[v] = alt
                        room[alt] -= 1
            sizes = np.bincount(assign, minlength=self.nlist).astype(np.int64)
        cap = _round_up(max(int(sizes.max()) if n else 1, 8), 8)

        order = np.argsort(assign, kind="stable")
        starts = np.zeros(self.nlist + 1, np.int64)
        np.cumsum(sizes, out=starts[1:])
        # slot of each row within its list (cumcount via the sorted order)
        slot = np.empty(n, np.int64)
        slot[order] = np.arange(n, dtype=np.int64) - np.repeat(
            starts[:-1], sizes)
        vec_ids = np.full((self.nlist, cap), -1, np.int32)
        vec_ids[assign, slot] = vid.astype(np.int32)
        if n and self.storage in SQ_STORAGE:
            li = jnp.asarray(assign.astype(np.int32))
            si = jnp.asarray(slot.astype(np.int32))
            db_dev, _ = _scatter_pack(codes_d, li, si, self.nlist, cap,
                                      jnp.uint8)
            db_sq = _sq_norms_fused(db_dev, sq_scale, sq_bias)
            # pad slots decode to the bias vector: honor the
            # "db_sq is 0 at pad" invariant like every other branch
            db_sq = db_sq * (jnp.asarray(vec_ids) >= 0)
        elif n and self.storage.startswith("pq"):
            from auncel_tpu.ops.pq import train_pq, encode_pq, decode_pq
            M = int(self.storage[2:])
            li = jnp.asarray(assign.astype(np.int32))
            si = jnp.asarray(slot.astype(np.int32))
            nt = min(n, 200_000)
            if self.pq_residual:
                # residual encoding (reference IVFPQ by_residual default):
                # codes approximate x - centroid[assigned list]
                target = xd - jnp.asarray(self.centroids)[li]
                sample = x[:nt] - self.centroids[assign[:nt]]
            else:
                target = xd
                sample = x[:nt]
            pq = train_pq(sample, M)
            if self.polysemous:
                # reorder each subquantizer so code Hamming distance
                # tracks centroid distance (PolysemousTraining::
                # optimize_pq_for_hamming; same SA reordering IndexPQ uses)
                from auncel_tpu.ops.polysemous import reorder_codebook
                from auncel_tpu.ops.pq import PQCodebooks
                books = np.asarray(pq.codebooks)
                out = np.empty_like(books)
                for m in range(M):
                    perm = reorder_codebook(books[m], seed=123 + m)
                    out[m, perm] = books[m]
                pq = PQCodebooks(jnp.asarray(out))
            pq_books = pq.codebooks
            codes_d = encode_pq(pq, target)
            db_dev, _ = _scatter_pack(codes_d, li, si, self.nlist, cap,
                                      jnp.uint8)
            # decoded norms; zero at padding (pad codes decode to codeword 0
            # of each subspace, so mask by vec_ids)
            dec = decode_pq(pq, db_dev)
            db_sq = jnp.sum(jnp.square(dec), axis=-1)
            db_sq = db_sq * (jnp.asarray(vec_ids) >= 0)
        elif n:
            db_dev, db_sq = _scatter_pack(
                xd, jnp.asarray(assign.astype(np.int32)),
                jnp.asarray(slot.astype(np.int32)),
                self.nlist, cap, self.storage_dtype)
        else:
            db_dev = jnp.zeros((self.nlist, cap, self.d), self.storage_dtype)
            db_sq = jnp.zeros((self.nlist, cap), jnp.float32)
        cents = jnp.asarray(self.centroids)
        self._arrays = IVFArrays(
            centroids=cents,
            cent_sq=sqnorms(cents),
            db=db_dev,
            db_sq=db_sq,
            vec_ids=jnp.asarray(vec_ids),
            list_sizes=jnp.asarray(sizes.astype(np.int32)),
            interdis=(jnp.asarray(self.interdis) if self.interdis is not
                      None else jnp.zeros((1, 1), jnp.float32)),
            sq_scale=sq_scale,
            sq_bias=sq_bias,
            pq_codebooks=pq_books,
            pq_residual=(() if (pq_books is not None and self.pq_residual)
                         else None),
        )

    @property
    def arrays(self) -> IVFArrays:
        if self._arrays is None:
            self._pack()
            if self._multirow_row_cap is not None:
                from auncel_tpu.index.multirow import build_multirow
                self._multirow = build_multirow(self._arrays,
                                                self._multirow_row_cap)
        return self._arrays

    def enable_multirow(self, row_cap: int | None = None):
        """Build (and keep in sync across repacks) the multi-row scan
        layout; the bounded engine then scans tight rows instead of
        padded mega-lists (~cap / row_cap less gather traffic on skewed
        lists). Distance values are bitwise-identical to the padded
        layout, so profiles / GT need no re-plumbing."""
        from auncel_tpu.index.multirow import build_multirow
        self._multirow_row_cap = row_cap if row_cap is not None else 256
        self._multirow = build_multirow(self.arrays, self._multirow_row_cap)
        return self._multirow

    @property
    def multirow(self):
        if self._multirow is None and self._multirow_row_cap is not None:
            _ = self.arrays  # repack rebuilds the row layout too
        return self._multirow

    @property
    def packing_efficiency(self) -> float:
        a = self.arrays
        return self._ntotal / float(a.nlist * a.cap) if self._ntotal else 1.0

    # ------------------------------------------------------------- search

    def _hnsw_quantizer(self):
        """Lazily built HNSW graph over the centroids (the IVF%d_HNSW%d
        coarse quantizer, reference AutoTune.cpp:807-820)."""
        if self._hnswq is None:
            from auncel_tpu.index.hnsw import HNSWIndex
            hq = HNSWIndex(self.d, M=self.coarse_hnsw_m, metric=self.metric)
            hq.add(self.centroids)
            hq.build()
            self._hnswq = hq
        return self._hnswq

    def _mr_out_slots(self, nprobe: int) -> int:
        """Row-slot bound for the fixed-nprobe multirow path: the sum of
        the ``nprobe`` LARGEST per-list row counts upper-bounds every
        query's expanded row budget (offsets[:, nprobe-1]), so no row
        below a query's limit is ever dropped. Rounded up to a power of
        two so a handful of compiled shapes serve all nprobe values."""
        mr = self.multirow
        if getattr(self, "_mr_cum_obj", None) is not mr:
            self._mr_cum_obj = mr
            rpl = np.sort(np.asarray(jax.device_get(mr.rows_per_list)))[::-1]
            self._mr_cum = np.cumsum(rpl.astype(np.int64))
        need = int(self._mr_cum[min(nprobe, self._mr_cum.size) - 1])
        return 1 << max(need - 1, 0).bit_length()

    def search(self, q: np.ndarray, k: int,
               nprobe: int | None = None):
        """Fixed-nprobe search. One hot path serves every mode (reference
        IndexIVFFlat.cpp:117-137: search_preassigned is the single scan
        loop): when the multirow layout is enabled this rides the SAME
        0.92-packing row scan the bounded engine uses, so untuned/baseline
        timings are apples-to-apples with bounded-search timings."""
        import time as _time
        from auncel_tpu.index.aux import ivf_stats
        nprobe = int(nprobe if nprobe is not None else self.nprobe)
        nprobe = min(nprobe, self.nlist)
        q = jnp.asarray(np.asarray(q, np.float32))
        t0 = _time.perf_counter()
        ndis = q.shape[0] * nprobe * self.arrays.cap
        if self.coarse_hnsw_m:
            res = self._search_hnsw_coarse(q, k, nprobe)
        elif (self.polysemous_ht and
              self.arrays.pq_codebooks is not None):
            from auncel_tpu.index.scan import ivf_search_fixed_ht
            res = ivf_search_fixed_ht(self.arrays, q, k, nprobe,
                                      jnp.int32(self.polysemous_ht),
                                      self.metric)
        elif self.multirow is not None:
            from auncel_tpu.index.multirow import (
                multirow_search_fixed, multirow_dense_fixed)
            mr = self.multirow
            n_rows = mr.rows.db.shape[0]
            # dense-scan crossover, host-decided (nprobe is uniform, so
            # the per-query criterion is one comparison): when one
            # query's nprobe covers >= dense_cut of the corpus rows,
            # serve the batch as a shared masked corpus pass (reference
            # blas-threshold analog, utils.cpp:538-622)
            est_rows = nprobe * (n_rows / self.nlist)
            # n_rows floor: below ~0.5M vectors everything is fast and
            # the shared pass buys nothing (and its kernel reassociates
            # fp differently — keep small indexes bit-stable).
            # dense_cut == 0.0 forces dense (bypasses the floor).
            # The criterion is BATCH-AMORTIZED (round 4): one shared
            # corpus pass costs ~flat per window while gathers scale
            # with B x nprobe, so dense wins iff the batch's TOTAL
            # budget dwarfs the corpus — measured at 10M: B=1000 x
            # nprobe=256 serves dense at 837 qps vs ~290 gather-class,
            # while a B=1 query at the same nprobe must NOT pay a
            # full corpus pass (latency path). The old per-query
            # est_rows >= cut rule was batch-blind and routed single
            # queries dense.
            if (self.dense_cut is not None and not self.max_codes
                    and (n_rows >= 2048 or not self.dense_cut)
                    and (not self.dense_cut
                         or q.shape[0] * est_rows >= self.dense_batch_mult
                            * self.dense_cut * n_rows)):
                res = multirow_dense_fixed(mr, q, jnp.int32(nprobe), k,
                                           self.metric)
                ndis = q.shape[0] * n_rows * mr.rows.db.shape[1]
            else:
                out_slots = self._mr_out_slots(nprobe)
                res = multirow_search_fixed(
                    mr, q, k, nprobe, out_slots, self.metric,
                    code_sizes=(self.arrays.list_sizes if self.max_codes
                                else None),
                    max_codes=int(self.max_codes))
                ndis = q.shape[0] * out_slots * mr.rows.db.shape[1]
        else:
            res = ivf_search_fixed(self.arrays, q, k, nprobe, self.metric,
                                   max_codes=int(self.max_codes))
        vals, ids = jax.device_get(res)  # one tunnel round-trip
        out = vals, ids.astype(np.int64)
        # global counters (reference indexIVF_stats, IndexIVF.h:361-374)
        ivf_stats.nq += q.shape[0]
        ivf_stats.nlist_scanned += q.shape[0] * nprobe
        ivf_stats.ndis += ndis
        ivf_stats.search_time_ms += (_time.perf_counter() - t0) * 1e3
        return out

    def _search_hnsw_coarse(self, q: jax.Array, k: int, nprobe: int):
        """Fixed-nprobe search with graph-ranked probe lists (the
        reference's quantizer->search through IndexHNSW)."""
        from auncel_tpu.index.scan import scan_probe_range
        from auncel_tpu.ops.topk import init_topk
        # coarse ranking quality gates everything downstream: explore the
        # centroid graph well past nprobe (cheap — the graph holds nlist
        # nodes, not the corpus)
        _, cids = self._hnsw_quantizer().search(
            np.asarray(q), nprobe, ef=max(4 * nprobe, 64))
        B = q.shape[0]
        q_sq = sqnorms(q)
        vals, ids = init_topk((B,), k, self.metric)
        # under-filled graph results (-1 tail) are excluded by the
        # per-query limit, so clamped slots are never actually scanned
        limit = jnp.asarray((cids >= 0).sum(1).astype(np.int32))
        probe = jnp.asarray(np.maximum(cids, 0).astype(np.int32))
        return scan_probe_range(self.arrays, q, q_sq, probe, vals, ids,
                                limit, 0, nprobe, self.metric)

    def exact_search(self, q: np.ndarray, k: int, batch: int = 1024):
        """Full scan (nprobe = nlist): exact results whose distance values
        are consistent with the probe-scan path — the profile trainer's
        ground truth source (reference uses file GT; value-matching in
        ``kscaling`` demands consistency, IVF_pro.cpp:72-82). Uses the
        gather-free shared-block scan: total HBM traffic = |db| per batch."""
        from auncel_tpu.index.scan import ivf_full_scan
        q = np.asarray(q, np.float32)
        nq = q.shape[0]
        batch = min(batch, max(nq, 1))
        out_v = np.empty((nq, k), np.float32)
        out_i = np.empty((nq, k), np.int64)
        for q0 in range(0, nq, batch):
            q1 = min(q0 + batch, nq)
            qb = np.zeros((batch, self.d), np.float32)
            qb[: q1 - q0] = q[q0:q1]
            v, i = ivf_full_scan(self.arrays, jnp.asarray(qb), k,
                                 self.metric)
            out_v[q0:q1] = np.asarray(v)[: q1 - q0]
            out_i[q0:q1] = np.asarray(i)[: q1 - q0]
        return out_v, out_i

    def coarse_rank_np(self, q: np.ndarray):
        q = jnp.asarray(np.asarray(q, np.float32))
        cdis, cids = coarse_rank(self.arrays, q, self.metric)
        return np.asarray(cdis), np.asarray(cids)

    def update_vectors(self, ids: np.ndarray, x: np.ndarray) -> None:
        """Replace the stored vectors for the given ids and repack
        (reference IndexIVFFlat::update_vectors, IndexIVFFlat.cpp:190 —
        there an in-place list surgery; here a rebuild of the packed
        layout, which also re-routes each updated vector to its new
        nearest list like the reference does)."""
        ids = np.asarray(ids, np.int64)
        x = np.asarray(x, np.float32)
        assert ids.shape[0] == x.shape[0] and x.shape[1] == self.d
        a = self.arrays
        db = decoded_db(a)
        stored_ids = np.asarray(a.vec_ids)
        keep = stored_ids >= 0
        flat_x = db[keep].astype(np.float32)
        flat_ids = stored_ids[keep].astype(np.int64)
        lut = {int(i): j for j, i in enumerate(ids)}
        for j, vid in enumerate(flat_ids):
            if int(vid) in lut:
                flat_x[j] = x[lut[int(vid)]]
        preserve_sq_range(self)   # untouched rows re-encode identically
        self.reset()
        self.add(flat_x, ids=flat_ids)

    def reconstruct(self, key: int) -> np.ndarray:
        return _ivf_reconstruct(self, np.asarray([key], np.int64))[0]

    def reconstruct_n(self, i0: int, n: int) -> np.ndarray:
        return _ivf_reconstruct(
            self, np.arange(i0, i0 + n, dtype=np.int64))

    def reconstruct_from_offset(self, list_no: int, offset: int
                                ) -> np.ndarray:
        """Stored vector at (list, slot) — decoded through the storage
        codec (reference IndexIVF::reconstruct_from_offset,
        IndexIVF.h:264)."""
        a = self.arrays
        if not 0 <= list_no < self.nlist:
            raise KeyError(f"list {list_no} out of range (nlist="
                           f"{self.nlist})")
        size = int(np.asarray(a.list_sizes[list_no]))
        if not 0 <= offset < size:
            raise KeyError(f"offset {offset} out of range for list "
                           f"{list_no} (size {size})")
        blk = a.db[list_no, offset][None, None]
        return np.asarray(a.decode_block(blk), np.float32)[0, 0]

    def reconstruct_batch(self, keys: np.ndarray) -> np.ndarray:
        """One mask pass for the whole id array (negative keys -> zeros);
        backs ``search_and_reconstruct`` without a per-id Python loop."""
        keys = np.asarray(keys, np.int64).reshape(-1)
        out = np.zeros((keys.size, self.d), np.float32)
        valid = keys >= 0
        if valid.any():
            out[valid] = _ivf_reconstruct(self, keys[valid])
        return out

    def reset(self) -> None:
        self._pending = []
        self._arrays = None
        self._multirow = None
        self._ntotal = 0


class IVFFlatDedupIndex(IVFFlatIndex):
    """IVF-Flat that stores each distinct vector once (reference
    IndexIVFFlatDedup, IndexIVFFlat.h:79): exact duplicates map to the
    stored instance through an id multimap, and searches expand the
    duplicates back into the result list at the same distance."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._dup: dict[int, list[int]] = {}
        # vector bytes -> kept id: dedup must hold ACROSS add batches
        # (the reference checks new vectors against the stored lists,
        # IndexIVFFlat.cpp IndexIVFFlatDedup::add_with_ids)
        self._sig: dict[bytes, int] = {}

    def add(self, x: np.ndarray, ids=None) -> None:
        x = np.asarray(x, np.float32)
        if ids is None:
            ids = np.arange(self._ntotal + sum(len(v) for v in
                                               self._dup.values()),
                            self._ntotal + sum(len(v) for v in
                                               self._dup.values())
                            + x.shape[0], dtype=np.int64)
        ids = np.asarray(ids, np.int64)
        keep_rows, kept_ids = [], []
        for row in range(x.shape[0]):
            sig = x[row].tobytes()
            kept = self._sig.get(sig)
            if kept is None:
                self._sig[sig] = int(ids[row])
                keep_rows.append(row)
                kept_ids.append(int(ids[row]))
            else:
                self._dup.setdefault(kept, []).append(int(ids[row]))
        if keep_rows:
            super().add(x[keep_rows],
                        ids=np.asarray(kept_ids, np.int64))

    def reset(self) -> None:
        super().reset()
        # stale duplicate maps would inject phantom ids after re-adds
        self._dup = {}
        self._sig = {}

    def search(self, q: np.ndarray, k: int, nprobe: int | None = None):
        vals, ids = super().search(q, k, nprobe=nprobe)
        if not self._dup:
            return vals, ids
        out_v = np.empty_like(vals)
        out_i = np.empty_like(ids)
        for r in range(ids.shape[0]):
            vs, is_ = [], []
            for v, i in zip(vals[r], ids[r]):
                is_.append(i)
                vs.append(v)
                for dup in self._dup.get(int(i), ()):
                    is_.append(dup)
                    vs.append(v)          # identical vector, same distance
                if len(is_) >= k:
                    break
            out_v[r] = np.asarray(vs[:k], vals.dtype)
            out_i[r] = np.asarray(is_[:k], ids.dtype)
        return out_v, out_i


def decoded_db(a) -> np.ndarray:
    """Full decoded [nlist, cap, d] float32 database: the storage codec's
    decode_block PLUS the per-list centroid for residual PQ (stored codes
    approximate x - c_list there, scan.py:182-201) — the single route for
    every host-side reconstruction (update_vectors / reconstruct /
    remove_ids), mirroring the reference's sa_decode semantics."""
    if a.sq_scale is not None or a.pq_codebooks is not None:
        db = np.asarray(a.decode_block(a.db), np.float32)
        if a.pq_residual is not None:
            db = db + np.asarray(a.centroids, np.float32)[:, None, :]
        return db
    return np.asarray(a.db, np.float32)


def _ivf_reconstruct(index: IVFFlatIndex, keys: np.ndarray) -> np.ndarray:
    """Recover stored vectors by id from the packed layout (reference
    IndexIVF::reconstruct via the direct map; here one mask pass over the
    id tensor — decoded through the storage codec, so quantized indexes
    return their reconstructions like the reference does)."""
    a = index.arrays
    ids = np.asarray(a.vec_ids)
    db = decoded_db(a)
    flat_ids = ids.reshape(-1)
    flat_db = db.reshape(-1, index.d)
    order = np.argsort(flat_ids, kind="stable")
    pos = np.searchsorted(flat_ids, keys, sorter=order)
    got = flat_ids[order[np.clip(pos, 0, flat_ids.size - 1)]]
    if not np.array_equal(got, keys):
        missing = keys[got != keys]
        raise KeyError(f"ids not stored: {missing[:5]}...")
    return flat_db[order[pos]]
