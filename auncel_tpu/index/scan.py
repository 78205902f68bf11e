"""Core IVF list-scan primitives (XLA path).

This is the TPU recast of the reference's hot loop — per-list scanning with
heap updates (``/root/reference/Auncel/IndexIVFFlat.cpp:117-137``
``IVFFlatScanner::scan_codes`` driven by ``IndexIVF.cpp:439-475``
``scan_one_list``). Instead of a scalar distance + heap-push per stored
vector, one probe step for a whole query batch is:

    gather [B, cap, d] list block from HBM
    -> one batched matvec/matmul on the MXU (actual metric values)
    -> mask padding and per-query probe limits
    -> exact top-k merge into the running result

``limit`` carries the per-query probe budget: probe slot ``ik`` contributes
iff ``ik < limit[b]``. This replaces the reference's per-query ``break`` at
``stage >= my_nprobe`` (IndexIVF.cpp:613-633) with a mask, so a whole batch
runs one fixed-shape program while each query still scans exactly its own
number of lists.

A fused Pallas kernel with the same contract lives in
``auncel_tpu/pallas_kernels``; this XLA version is the reference
implementation and the fallback.
"""

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric, worst_value
from auncel_tpu.ops.topk import (topk_scores, init_topk,
                                 merge_topk_verified)

# Ladder-merge engine selector for A/B measurement (round-5 VERDICT #3:
# the round-4 default was picked from single +-10% runs). "verified" is
# the shipped default (certified ApproxTopK for the compacted gather
# ladder merges); "exact" forces the plain sort merge everywhere. Read
# once at import — the A/B harness (scripts/merge_ab.sh) sets it per
# subprocess so each arm traces its own programs.
LADDER_MERGE = os.environ.get("AUNCEL_LADDER_MERGE", "verified")


def sq_decode_dev(sub: jax.Array, d: int, sq_scale: jax.Array,
                  sq_bias: jax.Array) -> jax.Array:
    """Affine SQ decode, dispatched by packed width: d/2 bytes = SQ4 (two
    dims per byte, low nibble first), 3d/4 bytes = SQ6 (four dims per
    24-bit little-endian group), d bytes = SQ8/SQ8-direct. The inverse of
    ``index.flat.sq_pack``; every scan path decodes through here so
    distances stay value-consistent."""
    if sub.shape[-1] * 2 == d:
        lo = (sub & 0xF).astype(jnp.float32)
        hi = (sub >> 4).astype(jnp.float32)
        vals = jnp.stack([lo, hi], axis=-1).reshape(sub.shape[:-1] + (d,))
        return vals * sq_scale + sq_bias
    if sub.shape[-1] * 4 == d * 3:
        g = sub.reshape(sub.shape[:-1] + (d // 4, 3)).astype(jnp.int32)
        w = g[..., 0] | (g[..., 1] << 8) | (g[..., 2] << 16)
        vals = jnp.stack([(w >> (6 * j)) & 63 for j in range(4)], axis=-1)
        vals = vals.reshape(sub.shape[:-1] + (d,)).astype(jnp.float32)
        return vals * sq_scale + sq_bias
    return sub.astype(jnp.float32) * sq_scale + sq_bias


class IVFArrays(NamedTuple):
    """Device-resident IVF-Flat index state (a pytree).

    Replaces the reference's ``InvertedLists`` pointer structure
    (``InvertedLists.h:31-101``) with padded dense HBM tensors.

    Storage codecs: ``db`` holds float32 raw vectors, or uint8 SQ8 codes
    (the reference's ScalarQuantizer capability, SURVEY.md §2 #17) with the
    per-dimension affine decode ``x = code * sq_scale + sq_bias`` applied
    in-scan — 4x less HBM traffic on the hot path. All distances (and
    ``db_sq``) are computed on DECODED values, so the profile engine's
    value-matching invariants hold unchanged.
    """
    centroids: jax.Array   # [nlist, d] float32
    cent_sq: jax.Array     # [nlist] float32
    db: jax.Array          # [nlist, cap, d] float32 raw or uint8 SQ8 codes
    db_sq: jax.Array       # [nlist, cap] float32 decoded norms (0 at pad)
    vec_ids: jax.Array     # [nlist, cap] int32, -1 at padding
    list_sizes: jax.Array  # [nlist] int32
    interdis: jax.Array    # [nlist, nlist] float32; L2: sqdist, IP: angle
                           # (reference interdis_cem, IndexIVF.cpp:97-111)
    sq_scale: jax.Array | None = None  # [d] float32 (SQ8 only)
    sq_bias: jax.Array | None = None   # [d] float32 (SQ8 only)
    pq_codebooks: jax.Array | None = None  # [M, 256, d/M] float32 (PQ only)
    # () when PQ codes encode residuals x - centroid[list] (the reference
    # IVFPQ by_residual default), None otherwise. An empty tuple is an
    # empty pytree: the flag stays STATIC under jit (a bool field would
    # become a traced leaf and break trace-time branching).
    pq_residual: tuple | None = None

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def cap(self) -> int:
        return self.db.shape[1]

    def decode_block(self, sub: jax.Array) -> jax.Array:
        """Stored block -> float32 vectors (identity for raw storage,
        affine decode for SQ8/SQ4, codebook reconstruction for PQ). All
        search paths share this hook, so distances stay value-consistent
        across partial scans, full scans, and GT generation."""
        if self.sq_scale is not None:
            return sq_decode_dev(sub, self.d, self.sq_scale, self.sq_bias)
        if self.pq_codebooks is not None:
            from auncel_tpu.ops.pq import decode_pq, PQCodebooks
            return decode_pq(PQCodebooks(self.pq_codebooks), sub)
        return sub

    @property
    def d(self) -> int:
        return self.centroids.shape[1]


def coarse_rank(arrays: IVFArrays, q: jax.Array, metric: Metric,
                q_sq: jax.Array | None = None, rank_k: int | None = None):
    """Rank centroids per query (the reference always ranks the full
    centroid set in tune mode: ``quantizer->search(n, x, nlist, ...)``,
    IndexIVF.cpp:355-365). Returns (cdis [B, rank_k], cids [B, rank_k]),
    best-first. ``rank_k < nlist`` skips the tail of the full sort — the
    decision phase only consumes the first nlist/8 probe slots plus the
    boundary window, and an exact top-k prefix equals the full ranking's
    prefix."""
    from auncel_tpu.ops.distance import pairwise_scores
    scores = pairwise_scores(q, arrays.centroids, metric,
                             y_sqnorms=arrays.cent_sq, x_sqnorms=q_sq)
    all_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    return topk_scores(scores, all_ids, rank_k or arrays.nlist, metric)


def pick_probe_chunk(batch: int, cap: int, d: int, width: int,
                     budget_bytes: int = 256 * 1024 * 1024) -> int:
    """Probes scanned per loop step: as many as fit the gather-buffer
    budget (fewer loop iterations + one top-k merge per chunk instead of
    per probe), capped at the wave width and a BATCH-AWARE probe cap.

    The cap was a flat 8 through round 4 — right for batch 1024 (one
    probe is already ~134 MB there) but pathological at batch 1: a
    256-list scan became ~256 sequential fori iterations of ~40 us fixed
    cost each, which IS the measured ~10 ms batch-1 device time at 10M
    (logs_r4/latfig10M.err). Small batches now chunk up to 512/B probes
    per gather (same 256 MB buffer bound), collapsing the iteration count
    ~64x at batch 1. Results are unchanged — chunking only regroups the
    same masked candidates between the same exact merges."""
    per_probe = batch * cap * d * 4
    probe_cap = max(8, 512 // max(batch, 1))
    c = max(1, min(probe_cap, width, budget_bytes // max(per_probe, 1)))
    # round down to a power of two to bound the number of compiled variants
    p = 1
    while p * 2 <= c:
        p *= 2
    return p


def scan_probe_range(
    arrays: IVFArrays,
    q: jax.Array,            # [B, d]
    q_sq: jax.Array,         # [B]
    probe_lists: jax.Array,  # [B, nlist] coarse-ranked list ids
    vals: jax.Array,         # [B, k] running top-k values
    ids: jax.Array,          # [B, k] running top-k ids
    limit: jax.Array,        # [B] int32 per-query probe budget
    start,                   # int, scalar, or [B]: first probe slot
    width: int,              # static number of probe slots to scan
    metric: Metric,
    probe_chunk: int | None = None,
    merge_every: int = 8,
    qcodes: jax.Array | None = None,  # [B, n_slots, M] per-slot query codes
    ht: jax.Array | None = None,      # polysemous Hamming threshold
):
    """Scan probe slots [start, start+width) for every query in the batch.

    ``qcodes``/``ht`` enable the polysemous Hamming filter on PQ storage
    (reference IndexIVFPQ polysemous search): a stored code more than
    ``ht`` Hamming away from the query's per-list (residual) code is
    excluded before exact evaluation. On TPU the block is computed anyway
    and masked — the capability (identical filtered result sets), not the
    FLOP skip, is what carries over.

    ``start`` may be a per-query [B] array: each query then scans ITS OWN
    slot range [start[b], start[b]+width), still masked by ``limit``. The
    multirow wave engine (profile/bounded_mr.py) uses this to advance each
    query's ragged row frontier with zero overlap bandwidth — a query never
    gathers a slot it has already scanned or will never need below its
    frontier.

    Two-level chunking: gathers happen ``C`` probes at a time (bounded by
    the gather-buffer memory budget), but the expensive exact top-k merge
    runs only once per ``merge_every`` gathers — scores accumulate in a
    [B, M*cap] buffer between merges. top-k selection, not bandwidth, is
    the measured wall-clock bottleneck of the XLA scan at large batch.
    """
    k = vals.shape[-1]
    worst = worst_value(metric)
    B = q.shape[0]
    C = probe_chunk or pick_probe_chunk(B, arrays.cap, arrays.d, width)
    # probes per merge: cover the whole (small) wave in ONE merge when it
    # fits the merge window — each exact top-k over [B, M*cap] costs tens
    # of ms at batch 1024, so fewer merges beat smaller ones
    M = min(merge_every * C, -(-max(width, 1) // C) * C)
    n_merges = -(-width // M)
    gathers_per_merge = M // C
    nlist = arrays.nlist
    cap = arrays.cap

    n_slots_avail = probe_lists.shape[1]  # may be a ranking prefix

    start = jnp.broadcast_to(jnp.asarray(start, jnp.int32), (B,))

    def gather_scores(ik0):
        """Scores/ids for C probes starting at slot ik0 [B]: [B, C*cap]."""
        iks = ik0[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]  # [B,C]
        slot_ok = iks < (start + width)[:, None]
        safe_iks = jnp.clip(iks, 0, n_slots_avail - 1)
        lists = jnp.take_along_axis(probe_lists, safe_iks, axis=1)
        sub = arrays.db[lists]            # [B, C, cap, d|M] gather
        sub_sq = arrays.db_sq[lists]      # [B, C, cap]
        sub_ids = arrays.vec_ids[lists]   # [B, C, cap]
        raw = sub                         # stored codes (Hamming filter)
        sub = arrays.decode_block(sub)    # codec hook (raw/SQ8/PQ)
        if arrays.pq_residual is not None:
            # residual PQ: stored r approximates x - c_list, so
            # L2 = ||(q - c_l) - r||^2, IP = q.c_l + q.r
            cl = arrays.centroids[lists]              # [B, C, d]
            if metric is Metric.L2:
                qc = q[:, None, :] - cl
                dots = jnp.einsum(
                    "bpcd,bpd->bpc", sub, qc,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                scores = jnp.maximum(
                    jnp.sum(jnp.square(qc), -1)[:, :, None]
                    + sub_sq - 2.0 * dots, 0.0)
            else:
                qcl = jnp.einsum("bpd,bd->bp", cl, q,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                qr = jnp.einsum("bpcd,bd->bpc", sub, q,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                scores = qcl[:, :, None] + qr
        else:
            dots = jnp.einsum(
                "bpcd,bd->bpc", sub, q.astype(sub.dtype),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            if metric is Metric.L2:
                scores = jnp.maximum(
                    q_sq[:, None, None] + sub_sq - 2.0 * dots, 0.0)
            else:
                scores = dots
        active = ((iks[:, :, None] < limit[:, None, None]) &
                  slot_ok[:, :, None] & (sub_ids >= 0))
        if qcodes is not None:
            from auncel_tpu.ops.polysemous import POPCOUNT8
            qc = jnp.take_along_axis(
                qcodes, safe_iks[:, :, None], axis=1)      # [B, C, M]
            ham = jnp.sum(jnp.asarray(POPCOUNT8)[
                (raw ^ qc[:, :, None, :]).astype(jnp.int32)], axis=-1)
            active = active & (ham <= ht)
        scores = jnp.where(active, scores, worst).reshape(B, C * cap)
        sub_ids = jnp.where(active, sub_ids, -1).reshape(B, C * cap)
        return scores, sub_ids

    def merge_body(mi, carry):
        rvals, rids = carry
        base = start + mi * M

        if gathers_per_merge == 1:
            scores, sub_ids = gather_scores(base)
        else:
            buf_s = jnp.full((B, M * cap), worst, jnp.float32)
            buf_i = jnp.full((B, M * cap), -1, jnp.int32)

            def g_body(gi, bufs):
                bs, bi = bufs
                s, si = gather_scores(base + gi * C)
                off = gi * C * cap
                bs = jax.lax.dynamic_update_slice(bs, s, (0, off))
                bi = jax.lax.dynamic_update_slice(bi, si, (0, off))
                return bs, bi

            scores, sub_ids = jax.lax.fori_loop(
                0, gathers_per_merge, g_body, (buf_s, buf_i))

        # Verified ApproxTopK merge — REGIME-MEASURED (round 4): the
        # ladder merges run at compacted sub-batches (a2_cap=64,
        # tail_cap=256), where the selector+certificate beats the exact
        # sort END-TO-END: headline A/B 332.6 qps (verified) vs 294.5
        # (exact) at identical calibration (logs_r4/bound10Mc vs
        # bound10Md). The standalone B=1024 microbench (Merge_bench.log,
        # 0.83-0.95x) measures a different regime — the WIDE dense-pass
        # merges, which stay exact (masked_full_scan below; w-corpus
        # cell measured verified there at 103.4 vs 116.5 qps).
        # AUNCEL_LADDER_MERGE=exact flips every ladder merge to the plain
        # sort for the round-5 variance-aware A/B (both are exact
        # mathematically; the knob only changes wall-clock).
        if LADDER_MERGE == "exact":
            return topk_scores(jnp.concatenate([rvals, scores], axis=-1),
                               jnp.concatenate([rids, sub_ids], axis=-1),
                               k, metric)
        return merge_topk_verified(rvals, rids, scores, sub_ids, k, metric)

    return jax.lax.fori_loop(0, n_merges, merge_body, (vals, ids))


@functools.partial(jax.jit, static_argnames=("k", "metric", "list_chunk"))
def ivf_full_scan(
    arrays: IVFArrays,
    q: jax.Array,
    k: int,
    metric: Metric,
    list_chunk: int = 8,
):
    """Exact full scan (nprobe = nlist) without per-query gathers: every
    query probes every list, so each list block is read from HBM ONCE for
    the whole batch and contracted on the MXU — total traffic = |db|, not
    B x |db|. Distance arithmetic (same d-length MXU contraction in f32
    HIGHEST) matches the probe-scan path within the profile trainer's
    kscaling tolerance."""
    from auncel_tpu.ops.distance import sqnorms
    B = q.shape[0]
    nlist, cap, d = arrays.db.shape
    worst = worst_value(metric)
    q_sq = sqnorms(q)
    C = max(1, min(list_chunk, nlist))
    while nlist % C:
        C -= 1   # largest divisor <= list_chunk (ragged nlist, e.g. 100)
    n_chunks = nlist // C

    def body(ci, carry):
        rvals, rids = carry
        blk = jax.lax.dynamic_slice_in_dim(arrays.db, ci * C, C, 0)
        blk_sq = jax.lax.dynamic_slice_in_dim(arrays.db_sq, ci * C, C, 0)
        blk_ids = jax.lax.dynamic_slice_in_dim(arrays.vec_ids, ci * C, C, 0)
        blk = arrays.decode_block(blk)
        if arrays.pq_residual is not None:
            cl = jax.lax.dynamic_slice_in_dim(arrays.centroids, ci * C, C, 0)
            if metric is Metric.L2:
                qc = q[:, None, :] - cl[None]             # [B, C, d]
                dots = jnp.einsum(
                    "pcd,bpd->bpc", blk, qc,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                scores = jnp.maximum(
                    jnp.sum(jnp.square(qc), -1)[:, :, None]
                    + blk_sq[None] - 2.0 * dots, 0.0)
            else:
                qcl = jnp.einsum("pd,bd->bp", cl, q,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
                qr = jnp.einsum("pcd,bd->bpc", blk, q,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                scores = qcl[:, :, None] + qr
        else:
            dots = jnp.einsum(
                "pcd,bd->bpc", blk, q.astype(blk.dtype),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            if metric is Metric.L2:
                scores = jnp.maximum(
                    q_sq[:, None, None] + blk_sq[None] - 2.0 * dots, 0.0)
            else:
                scores = dots
        valid = (blk_ids >= 0)[None]
        scores = jnp.where(valid, scores, worst).reshape(B, C * cap)
        ids = jnp.broadcast_to(blk_ids[None], (B, C, cap)).reshape(
            B, C * cap)
        allv = jnp.concatenate([rvals, scores], axis=-1)
        alli = jnp.concatenate([rids, ids], axis=-1)
        return topk_scores(allv, alli, k, metric)

    init = init_topk((B,), k, metric)
    return jax.lax.fori_loop(0, n_chunks, body, init)


def masked_full_scan(
    rows: IVFArrays,
    row_list: jax.Array,     # [R] owning list id per row, -1 at pad rows
    inv_rank: jax.Array,     # [B, nlist] coarse rank of each list per query
    target: jax.Array,       # [B] per-query list budgets (1..nlist)
    q: jax.Array,            # [B, d]
    q_sq: jax.Array,         # [B]
    k: int,
    metric: Metric,
    block_rows: int = 256,
    merge_blocks: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Dense-scan crossover: exact top-k over each query's first
    ``target[b]`` coarse-ranked lists, computed as ONE shared pass over the
    row corpus instead of per-query row gathers.

    The reference switches its kNN driver from per-vector SIMD loops to a
    blocked SGEMM over the whole corpus at >= 20 queries
    (``distance_compute_blas_threshold``, /root/reference/Auncel/
    utils.cpp:538-622). This is that switch for the HIGH-BUDGET regime of
    bounded search: when the batch's decided budgets cover most of the
    corpus anyway, reading each row block ONCE for all B queries (a single
    [B,d]x[d,C*cap] MXU contraction) beats B private gathers both on HBM
    traffic (corpus bytes, not sum-of-budgets bytes) and on MXU
    utilization. Per-query decision semantics are preserved exactly by
    masking: a (query, vector) pair is active iff the vector's list ranks
    inside the query's own decided budget — the same candidate set the
    gather tail scans, so the returned top-k is identical (same f32
    HIGHEST contraction over d).

    A merge is ``lax.cond``-skipped when no active candidate in its window
    beats any query's current kth value (exactness unaffected: skipped
    candidates were all strictly worse than every query's current k-th).
    """
    B = q.shape[0]
    R, cap = rows.vec_ids.shape
    worst = worst_value(metric)
    C = min(block_rows, R)
    n_blocks = -(-R // C)
    G = max(1, min(merge_blocks, n_blocks))
    n_merges = -(-n_blocks // G)
    vals, ids = init_topk((B,), k, metric)

    def gather_block(bi):
        """Scores/ids for rows [bi*C, (bi+1)*C) as [B, C*cap]; the last
        block's slice is clamped and already-covered rows masked off."""
        s = jnp.maximum(jnp.minimum(bi * C, R - C), 0)
        blk = jax.lax.dynamic_slice_in_dim(rows.db, s, C, 0)
        blk_sq = jax.lax.dynamic_slice_in_dim(rows.db_sq, s, C, 0)
        blk_ids = jax.lax.dynamic_slice_in_dim(rows.vec_ids, s, C, 0)
        lists = jax.lax.dynamic_slice_in_dim(row_list, s, C, 0)
        blk = rows.decode_block(blk)
        dots = jnp.einsum(
            "rcd,bd->brc", blk, q.astype(blk.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        if metric is Metric.L2:
            scores = jnp.maximum(
                q_sq[:, None, None] + blk_sq[None] - 2.0 * dots, 0.0)
        else:
            scores = dots
        ranks = inv_rank[:, jnp.maximum(lists, 0)]       # [B, C]
        fresh = s + jnp.arange(C, dtype=jnp.int32) >= bi * C  # clamp dedup
        active = ((ranks < target[:, None])[:, :, None]
                  & (blk_ids >= 0)[None]
                  & (fresh & (lists >= 0))[None, :, None])
        scores = jnp.where(active, scores, worst).reshape(B, C * cap)
        sub_ids = jnp.where(active, blk_ids[None], -1).reshape(B, C * cap)
        return scores, sub_ids

    def merge_body(mi, carry):
        rvals, rids = carry
        if G == 1:
            scores, sub_ids = gather_block(mi)
        else:
            buf_s = jnp.full((B, G * C * cap), worst, jnp.float32)
            buf_i = jnp.full((B, G * C * cap), -1, jnp.int32)

            def g_body(gi, bufs):
                bs, bi_ = bufs
                s, si = gather_block(mi * G + gi)
                off = gi * C * cap
                return (jax.lax.dynamic_update_slice(bs, s, (0, off)),
                        jax.lax.dynamic_update_slice(bi_, si, (0, off)))

            scores, sub_ids = jax.lax.fori_loop(
                0, G, g_body, (buf_s, buf_i))
        # Skip the (expensive, exact) top-k re-select when this window
        # cannot improve anyone's current k-th.
        if metric.lower_is_better:
            improving = jnp.any(jnp.min(scores, axis=1) < rvals[:, k - 1])
        else:
            improving = jnp.any(jnp.max(scores, axis=1) > rvals[:, k - 1])

        def do_merge(c):
            # Exact sort merge. The verified-ApproxTopK alternative
            # (ops/topk.py::merge_topk_verified) was measured on-chip and
            # REJECTED: 0.89-0.90x at W=65k-131k, B=1024 (Merge_bench.log,
            # round 4) — the selector + certificate overhead exceeds the
            # exact sort's margin at production widths.
            rv, ri = c
            return topk_scores(jnp.concatenate([rv, scores], axis=-1),
                               jnp.concatenate([ri, sub_ids], axis=-1),
                               k, metric)

        return jax.lax.cond(improving, do_merge, lambda c: c,
                            (rvals, rids))

    return jax.lax.fori_loop(0, n_merges, merge_body, (vals, ids))


def dense_stage_snapshots(
    rows: IVFArrays,
    row_list: jax.Array,     # [R] owning list id per row, -1 at pad rows
    inv_rank: jax.Array,     # [B, nlist] coarse rank per list (>= nlist
                             #   for lists outside the ranked prefix)
    q: jax.Array,            # [B, d]
    q_sq: jax.Array,         # [B]
    stages: tuple,           # static increasing decision stages (list units)
    k: int,
    metric: Metric,
    block_rows: int = 128,
) -> jax.Array:
    """Per-stage top-k VALUE snapshots from ONE shared corpus pass.

    Returns [B, len(stages), k] sorted best-first: entry j is the exact
    top-k distance values over each query's first ``stages[j]``
    coarse-ranked lists — the snapshot the bounded-termination predicate
    consumes at that decision boundary (IndexIVF.cpp:551-568 reads the
    sorted heap after exactly `stage` probed lists).

    The decide-phase analog of ``masked_full_scan``: the wave engine
    produces these snapshots by gathering each query's private ranked
    rows stage by stage (sum-of-budgets HBM traffic, B x nlist/8 lists in
    the worst case); here every corpus block is read ONCE for the whole
    batch and each candidate (query, vector) lands in the rank BUCKET
    ``stages[j-1] <= rank < stages[j]`` of its list's per-query coarse
    rank. Buckets are disjoint, so one running top-k per bucket suffices;
    the cumulative union across buckets (post-pass, len(stages) tiny
    merges) yields every stage's snapshot exactly. Values are the same
    f32 HIGHEST contraction over d the gather path computes; like the
    dense tail (masked_full_scan), they can differ from the gather
    kernel's by fp reassociation (~1e-7 rel; tests budget 1e-5), so a
    decision replayed from them can flip only on a query whose predicate
    sits inside that envelope of its threshold.

    Per-bucket merges are ``lax.cond``-skipped when no candidate in the
    block improves that bucket's current k-th (skipped candidates are
    strictly worse than everything their stage snapshot keeps, so
    exactness is unaffected).
    """
    B = q.shape[0]
    R, cap = rows.vec_ids.shape
    worst = worst_value(metric)
    n_st = len(stages)
    lo = (0,) + tuple(stages[:-1])
    C = min(block_rows, R)
    n_blocks = -(-R // C)
    snap = jnp.full((B, n_st, k), worst, jnp.float32)

    def body(bi, snap):
        s = jnp.maximum(jnp.minimum(bi * C, R - C), 0)
        blk = jax.lax.dynamic_slice_in_dim(rows.db, s, C, 0)
        blk_sq = jax.lax.dynamic_slice_in_dim(rows.db_sq, s, C, 0)
        blk_ids = jax.lax.dynamic_slice_in_dim(rows.vec_ids, s, C, 0)
        lists = jax.lax.dynamic_slice_in_dim(row_list, s, C, 0)
        blk = rows.decode_block(blk)
        dots = jnp.einsum(
            "rcd,bd->brc", blk, q.astype(blk.dtype),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        if metric is Metric.L2:
            scores = jnp.maximum(
                q_sq[:, None, None] + blk_sq[None] - 2.0 * dots, 0.0)
        else:
            scores = dots
        ranks = inv_rank[:, jnp.maximum(lists, 0)]       # [B, C]
        fresh = s + jnp.arange(C, dtype=jnp.int32) >= bi * C  # clamp dedup
        valid = ((blk_ids >= 0)[None]
                 & (fresh & (lists >= 0))[None, :, None])
        flat = jnp.where(valid, scores, worst).reshape(B, C * cap)
        rk = jnp.broadcast_to(
            ranks[:, :, None], (B, C, cap)).reshape(B, C * cap)
        for j in range(n_st):
            sc = jnp.where((rk >= lo[j]) & (rk < stages[j]), flat, worst)
            if metric.lower_is_better:
                improving = jnp.any(jnp.min(sc, axis=1) < snap[:, j, k - 1])
            else:
                improving = jnp.any(jnp.max(sc, axis=1) > snap[:, j, k - 1])

            def do_merge(sn, sc=sc, j=j):
                cand = jnp.concatenate([sn[:, j], sc], axis=-1)
                if metric.lower_is_better:
                    best = -jax.lax.top_k(-cand, k)[0]
                else:
                    best = jax.lax.top_k(cand, k)[0]
                return sn.at[:, j].set(best)

            snap = jax.lax.cond(improving, do_merge, lambda sn: sn, snap)
        return snap

    snap = jax.lax.fori_loop(0, n_blocks, body, snap)
    # Disjoint buckets -> cumulative union gives each stage's snapshot.
    outs = []
    run = jnp.full((B, k), worst, jnp.float32)
    for j in range(n_st):
        cand = jnp.concatenate([run, snap[:, j]], axis=-1)
        if metric.lower_is_better:
            run = -jax.lax.top_k(-cand, k)[0]
        else:
            run = jax.lax.top_k(cand, k)[0]
        outs.append(run)
    return jnp.stack(outs, axis=1)


def maxcodes_limit(sizes: jax.Array, nprobe: int, max_codes) -> jax.Array:
    """Per-query probe limit under a code-visit budget: the reference scans
    list ik then breaks once ``nscan >= max_codes`` (IndexIVF.cpp:539-541),
    so the number of lists scanned is 1 + #(strict-prefix sums <
    max_codes), capped at nprobe. ``sizes`` [B, nprobe] are the probed
    lists' code counts in rank order; ``max_codes`` 0 disables (traced, so
    one compiled program serves every budget)."""
    cum = jnp.cumsum(sizes, axis=1)
    g = jnp.minimum(nprobe, jnp.sum(cum < max_codes, axis=1) + 1)
    return jnp.where(max_codes > 0, g, nprobe).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def ivf_search_fixed(
    arrays: IVFArrays,
    q: jax.Array,
    k: int,
    nprobe: int,
    metric: Metric,
    max_codes=0,
):
    """Fixed-nprobe IVF-Flat search (the reference's untuned
    ``search_preassigned`` path). Returns (vals [B,k], ids [B,k]) sorted
    best-first. ``max_codes`` > 0 stops each query after the ranked list
    that crosses the code budget (IndexIVF.h:69, the knob the reference's
    ParameterSpace sweeps for IMI quantizers, AutoTune.cpp:388-399)."""
    from auncel_tpu.ops.distance import sqnorms
    B = q.shape[0]
    q_sq = sqnorms(q)
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq)
    vals, ids = init_topk((B,), k, metric)
    limit = maxcodes_limit(arrays.list_sizes[cids[:, :nprobe]], nprobe,
                           jnp.asarray(max_codes, jnp.int32))
    vals, ids = scan_probe_range(
        arrays, q, q_sq, cids, vals, ids, limit, 0, nprobe, metric)
    return vals, ids


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "metric"))
def ivf_search_fixed_ht(
    arrays: IVFArrays,
    q: jax.Array,
    k: int,
    nprobe: int,
    ht: jax.Array,
    metric: Metric,
):
    """Fixed-nprobe IVF-PQ search with the polysemous Hamming filter —
    the reference applies the ht knob to IVFPQ too (IndexIVFPQ polysemous
    branch; ParameterSpace ranges, AutoTune.cpp:353-408). The query's
    code is encoded per probed list (residual PQ: the code of
    q - centroid[list], matching what the stored codes approximate)."""
    from auncel_tpu.ops.distance import sqnorms
    from auncel_tpu.ops.pq import PQCodebooks, encode_pq
    B, d = q.shape
    q_sq = sqnorms(q)
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq)
    lists = cids[:, :nprobe]
    pq = PQCodebooks(arrays.pq_codebooks)
    if arrays.pq_residual is not None:
        target = q[:, None, :] - arrays.centroids[lists]
    else:
        target = jnp.broadcast_to(q[:, None, :], (B, nprobe, d))
    qcodes = encode_pq(pq, target.reshape(B * nprobe, d)).reshape(
        B, nprobe, -1)
    vals, ids = init_topk((B,), k, metric)
    limit = jnp.full((B,), nprobe, jnp.int32)
    return scan_probe_range(arrays, q, q_sq, lists, vals, ids, limit, 0,
                            nprobe, metric, qcodes=qcodes, ht=ht)
