"""Multi-row inverted-list layout (round-2 scan-bandwidth foundation).

Measured problem: balanced k-means still leaves mega-cells ~3x the mean
list size, the padded [nlist, cap, d] layout must use cap = max size, and
EVERY gathered probe pays for that padding — the scan moves ~3x the
necessary bytes (see README "Known wins").

Fix: re-pack each list into ceil(size / row_cap) rows of a
[n_rows, row_cap, d] tensor (row_cap ~ the p50 list size). A probed list is
scanned by scanning its rows — exactly the same vectors, so semantics are
untouched; only addressing changes. Short lists (the vast majority) cost
one tight row instead of a mega-padded one.

The row tensor IS an ``IVFArrays``-shaped object (rows play the role of
lists), so every existing scan primitive works on it unchanged; what's new
is the probe-slot expansion ``expand_probes`` mapping each query's ranked
LIST slots to ranked ROW slots, and the list-unit -> row-unit limit
mapping for per-query budgets.

Wired into fixed-nprobe search here (`multirow_search_fixed`); bounded-
engine integration (wave boundaries in row units) is the round-2 work this
prepares.
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.scan import (
    IVFArrays, coarse_rank, scan_probe_range)
from auncel_tpu.ops.distance import sqnorms
from auncel_tpu.ops.topk import init_topk


class MultiRowArrays(NamedTuple):
    rows: IVFArrays        # row-granular index state ("lists" == rows)
    row_table: jax.Array   # [nlist, max_rows] int32 row ids, -1 padded
    rows_per_list: jax.Array  # [nlist] int32
    row_base: jax.Array    # [nlist] int32: first row id of each list
                           # (rows of a list are consecutive)
    row_list: jax.Array    # [n_rows] int32: owning list id per row, -1 at
                           # padding rows (the dense-scan crossover masks
                           # each row by its list's per-query coarse rank)

    @property
    def max_rows(self) -> int:
        return self.row_table.shape[1]


@functools.partial(jax.jit, static_argnames=("row_cap",))
def _gather_rows(arrays: IVFArrays, src_list: jax.Array, src_off: jax.Array,
                 row_cap: int):
    """Device-side row repack: one flat gather per tensor. Slot values are
    COPIED from the padded layout (db, db_sq, vec_ids all gathered, never
    recomputed), so every distance term is bitwise-identical to the padded
    path — the profile trainer's kscaling value-match (1e-5 rel,
    IVF_pro.cpp:72-82) sees the same numbers through either layout."""
    nlist, cap = arrays.vec_ids.shape
    idx = src_list[:, None] * cap + src_off[:, None] + jnp.arange(
        row_cap, dtype=jnp.int32)[None, :]              # [n_rows, row_cap]
    in_list = (src_off[:, None] + jnp.arange(row_cap, dtype=jnp.int32)
               < cap) & (src_list[:, None] >= 0)
    idx = jnp.clip(idx, 0, nlist * cap - 1)
    db = arrays.db.reshape(nlist * cap, -1)[idx]
    db_sq = jnp.where(in_list, arrays.db_sq.reshape(-1)[idx], 0.0)
    vec_ids = jnp.where(in_list, arrays.vec_ids.reshape(-1)[idx], -1)
    return db, db_sq, vec_ids


def build_multirow(arrays: IVFArrays, row_cap: int | None = None,
                   ) -> MultiRowArrays:
    """Re-pack a padded IVFArrays into the multi-row layout.

    Host side computes only the (tiny) addressing tables from list sizes;
    the corpus itself is re-packed ON DEVICE with one flat gather — no
    device->host round trip of the database. Supports every storage codec
    that decodes per-slot (raw f32/bf16, SQ8/SQ4); residual PQ is excluded
    because its scan needs the owning LIST's centroid per block, which rows
    do not carry.

    ``row_cap`` defaults to 256 (or the padded cap if smaller): small rows
    keep per-list padding waste under one row (<= row_cap - 1 slots), which
    is what buys back the ~3x padded-layout scan traffic on skewed lists.
    """
    assert arrays.pq_residual is None and arrays.pq_codebooks is None, \
        "multirow does not support PQ storage (needs per-list centroids)"
    sizes = np.asarray(arrays.list_sizes).astype(np.int64)
    nlist, cap = int(arrays.vec_ids.shape[0]), int(arrays.vec_ids.shape[1])
    if row_cap is None:
        row_cap = min(cap, 256)
    row_cap = min(row_cap, cap)
    rows_per = np.maximum(1, -(-sizes // row_cap)).astype(np.int64)
    n_rows = int(rows_per.sum())
    n_rows_pad = ((n_rows + 7) // 8) * 8  # ivf_full_scan chunks by 8
    max_rows = int(rows_per.max())

    src_list = np.full(n_rows_pad, -1, np.int32)
    src_off = np.zeros(n_rows_pad, np.int32)
    row_table = np.full((nlist, max_rows), -1, np.int32)
    r = 0
    for l in range(nlist):
        for j in range(int(rows_per[l])):
            src_list[r] = l
            src_off[r] = j * row_cap
            row_table[l, j] = r
            r += 1

    db, db_sq, vec_ids = _gather_rows(
        arrays, jnp.asarray(src_list), jnp.asarray(src_off), row_cap)
    row_sizes = np.zeros(n_rows_pad, np.int64)
    real = src_list >= 0
    row_sizes[real] = np.minimum(
        np.maximum(sizes[src_list[real]] - src_off[real], 0), row_cap)
    rows = IVFArrays(
        centroids=arrays.centroids,   # list-level (coarse ranking only)
        cent_sq=arrays.cent_sq,
        db=db,
        db_sq=db_sq,
        vec_ids=vec_ids,
        list_sizes=jnp.asarray(row_sizes.astype(np.int32)),
        interdis=arrays.interdis,
        sq_scale=arrays.sq_scale,
        sq_bias=arrays.sq_bias,
    )
    return MultiRowArrays(rows, jnp.asarray(row_table),
                          jnp.asarray(rows_per.astype(np.int32)),
                          jnp.asarray(row_table[:, 0].astype(np.int32)),
                          jnp.asarray(src_list))


def expand_probes(mr: MultiRowArrays, cids: jax.Array, n_slots: int,
                  out_slots: int):
    """Map ranked LIST slots [B, n_slots] to ranked ROW slots
    [B, out_slots] (+ per-query cumulative row counts per list prefix, for
    mapping list-unit budgets to row units). Rows beyond a query's real
    expansion are -1 (masked by the scan's id test after a clamp).

    Gather formulation (no scatters): a list's rows are CONSECUTIVE row
    ids (build_multirow assigns row r = row_base[l] + j), so output slot p
    belongs to ranked list s = searchsorted(offsets, p) at within-list row
    j = p - starts[s], i.e. row id = row_base[cids[s]] + j.
    """
    B = cids.shape[0]
    sel = cids[:, :n_slots]
    rpl = mr.rows_per_list[sel]                        # [B, S]
    offsets = jnp.cumsum(rpl, axis=1)                  # rows after slot s
    p = jnp.arange(out_slots, dtype=jnp.int32)[None, :]
    # "which list does row-slot p belong to" = #(offsets <= p), computed
    # as scatter + cumsum: bump a counter at each list's END offset, then
    # prefix-sum over slots — O(S + P) with ONE scan, no [B, S, P]
    # compare tensor and no per-query sort. (History: the compare
    # reduction was ~1 GiB at B=1024; the sort-based searchsorted cost
    # +6.6 ms at the batch-1 full-nlist expansion, and widening the
    # compare gate to cover it measured even slower, 39 ms total —
    # logs_r5/latB1b.err / latB1b2.err. Scatter+cumsum beats both at
    # every shape the engines use.)
    binx = jax.lax.broadcasted_iota(jnp.int32, offsets.shape, 0)
    marks = jnp.zeros((B, out_slots + 1), jnp.int32).at[
        binx, jnp.clip(offsets, 0, out_slots)].add(1, mode="drop")
    s = jnp.cumsum(marks[:, :out_slots], axis=1)       # [B, P] list slot
    in_range = s < n_slots
    s_c = jnp.minimum(s, n_slots - 1)
    starts = offsets - rpl
    j = p - jnp.take_along_axis(starts, s_c, axis=1)
    base = mr.row_base[jnp.take_along_axis(sel, s_c, axis=1)]
    out = jnp.where(in_range, base + j, -1).astype(jnp.int32)
    return out, offsets


@functools.partial(jax.jit, static_argnames=("k", "metric", "block_rows",
                                             "merge_blocks"))
def multirow_dense_fixed(
    mr: MultiRowArrays,
    q: jax.Array,
    nprobe: jax.Array,       # [B] or scalar per-query list budgets
    k: int,
    metric: Metric,
    block_rows: int = 256,
    merge_blocks: int = 1,
):
    """Fixed-nprobe search served by the dense-scan crossover: one shared
    masked corpus pass instead of per-query row gathers (the reference's
    distance_compute_blas_threshold kernel switch, utils.cpp:538-622).
    Identical candidate sets to multirow_search_fixed — callers switch on
    host-known batch x nprobe traffic (IVFFlatIndex.search)."""
    from auncel_tpu.index.scan import masked_full_scan
    B = q.shape[0]
    q_sq = sqnorms(q)
    _, cids = coarse_rank(mr.rows, q, metric, q_sq=q_sq)
    inv_rank = jnp.argsort(cids, axis=1).astype(jnp.int32)
    nlist = mr.rows_per_list.shape[0]
    target = jnp.broadcast_to(
        jnp.clip(jnp.asarray(nprobe, jnp.int32), 1, nlist), (B,))
    return masked_full_scan(mr.rows, mr.row_list, inv_rank, target, q,
                            q_sq, k, metric, block_rows, merge_blocks)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "out_slots",
                                             "metric"))
def multirow_search_fixed(
    mr: MultiRowArrays,
    q: jax.Array,
    k: int,
    nprobe: int,
    out_slots: int,
    metric: Metric,
    code_sizes: jax.Array | None = None,
    max_codes=0,
):
    """Fixed-nprobe search over the multi-row layout: identical results to
    ivf_search_fixed, ~cap/row_cap times less gather traffic on skewed
    lists. ``out_slots`` bounds the expanded row count (nprobe * mean rows
    per list + slack; unexpanded tail rows are dropped — callers size it
    generously). ``max_codes`` > 0 (with ``code_sizes`` = the [nlist]
    per-list code counts) applies the reference's code-visit budget
    (IndexIVF.h:69): a query stops after the ranked list that crosses it —
    whole lists only, so the row budget is that prefix's full row count."""
    B = q.shape[0]
    q_sq = sqnorms(q)
    cdis, cids = coarse_rank(mr.rows, q, metric, q_sq=q_sq)
    row_slots, offsets = expand_probes(mr, cids, nprobe, out_slots)
    if code_sizes is not None:
        from auncel_tpu.index.scan import maxcodes_limit
        g = maxcodes_limit(code_sizes[cids[:, :nprobe]], nprobe,
                           jnp.asarray(max_codes, jnp.int32))
        row_limit = jnp.take_along_axis(offsets, (g - 1)[:, None],
                                        axis=1)[:, 0]
    else:
        # per-query row budget: all rows of the first nprobe lists
        row_limit = offsets[:, nprobe - 1]
    # clamp -1 padding to row 0; rows beyond row_limit are limit-masked,
    # and row 0's vectors can't be double-counted because slots below the
    # limit are real row ids by construction
    safe_rows = jnp.maximum(row_slots, 0)
    vals, ids = init_topk((B,), k, metric)
    vals, ids = scan_probe_range(
        mr.rows, q, q_sq, safe_rows, vals, ids, row_limit, 0, out_slots,
        metric)
    return vals, ids
