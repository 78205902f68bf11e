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

    @property
    def max_rows(self) -> int:
        return self.row_table.shape[1]


def build_multirow(arrays: IVFArrays, row_cap: int | None = None,
                   ) -> MultiRowArrays:
    """Re-pack a padded IVFArrays into the multi-row layout. Host-side
    (offline); raw f32 storage only for now."""
    assert arrays.sq_scale is None and arrays.pq_codebooks is None, \
        "multirow currently supports raw storage"
    db = np.asarray(arrays.db)
    ids = np.asarray(arrays.vec_ids)
    sizes = np.asarray(arrays.list_sizes)
    nlist, cap, d = db.shape
    if row_cap is None:
        row_cap = max(8, int(np.median(sizes[sizes > 0])) if
                      (sizes > 0).any() else 8)
        row_cap = ((row_cap + 127) // 128) * 128 or 128
    rows_per = np.maximum(1, -(-sizes // row_cap))
    n_rows = int(rows_per.sum())
    max_rows = int(rows_per.max())

    row_db = np.zeros((n_rows, row_cap, d), np.float32)
    row_ids = np.full((n_rows, row_cap), -1, np.int32)
    row_table = np.full((nlist, max_rows), -1, np.int32)
    r = 0
    for l in range(nlist):
        sz = int(sizes[l])
        for j in range(int(rows_per[l])):
            lo = j * row_cap
            hi = min(lo + row_cap, max(sz, 0))
            if hi > lo:
                row_db[r, : hi - lo] = db[l, lo:hi]
                row_ids[r, : hi - lo] = ids[l, lo:hi]
            row_table[l, j] = r
            r += 1

    row_db_d = jnp.asarray(row_db)
    rows = IVFArrays(
        centroids=arrays.centroids,      # unused by row scans
        cent_sq=arrays.cent_sq,
        db=row_db_d,
        db_sq=jnp.sum(jnp.square(row_db_d), axis=-1) *
        (jnp.asarray(row_ids) >= 0),
        vec_ids=jnp.asarray(row_ids),
        list_sizes=jnp.asarray((row_ids >= 0).sum(1).astype(np.int32)),
        interdis=arrays.interdis,
    )
    return MultiRowArrays(rows, jnp.asarray(row_table),
                          jnp.asarray(rows_per.astype(np.int32)))


def expand_probes(mr: MultiRowArrays, cids: jax.Array, n_slots: int,
                  out_slots: int):
    """Map ranked LIST slots [B, n_slots] to ranked ROW slots
    [B, out_slots] (+ per-query row counts per list prefix, for mapping
    list-unit budgets to row units). Rows beyond a query's real expansion
    are -1 (masked by the scan's id test after a clamp)."""
    B = cids.shape[0]
    rpl = mr.rows_per_list[cids[:, :n_slots]]          # [B, S]
    offsets = jnp.cumsum(rpl, axis=1)                  # rows used after slot
    starts = offsets - rpl
    # scatter each list's rows into the row-slot axis
    out = jnp.full((B, out_slots), -1, jnp.int32)
    max_rows = mr.max_rows
    table = mr.row_table[cids[:, :n_slots]]            # [B, S, max_rows]
    for j in range(max_rows):                          # small static loop
        pos = starts + j                               # [B, S]
        valid = (j < rpl) & (pos < out_slots)
        pos_c = jnp.clip(pos, 0, out_slots - 1)
        vals = jnp.where(valid, table[:, :, j], -1)
        out = jax.vmap(lambda o, p, v: o.at[p].max(v))(out, pos_c, vals)
    return out, offsets


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "out_slots",
                                             "metric"))
def multirow_search_fixed(
    mr: MultiRowArrays,
    q: jax.Array,
    k: int,
    nprobe: int,
    out_slots: int,
    metric: Metric,
):
    """Fixed-nprobe search over the multi-row layout: identical results to
    ivf_search_fixed, ~cap/row_cap times less gather traffic on skewed
    lists. ``out_slots`` bounds the expanded row count (nprobe * mean rows
    per list + slack; unexpanded tail rows are dropped — callers size it
    generously)."""
    B = q.shape[0]
    q_sq = sqnorms(q)
    cdis, cids = coarse_rank(mr.rows, q, metric, q_sq=q_sq)
    row_slots, offsets = expand_probes(mr, cids, nprobe, out_slots)
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
