"""TPU-first HNSW graph index.

Capability parity with the reference's HNSW
(``/root/reference/Auncel/HNSW.h:46`` struct HNSW, ``HNSW.cpp``,
``IndexHNSW.{h,cpp}``): hierarchical navigable small-world graph with
geometric level assignment (``set_default_probas`` semantics: level ~
floor(-ln(U) * 1/ln(M)), 2M links at level 0, M above), greedy upper-level
descent (``greedy_update_nearest``), ef-bounded level-0 exploration
(``search_from_candidates`` with the check_relative_distance stop rule),
and the occlusion neighbor heuristic (``HNSW.cpp shrink_neighbor_list``:
keep a candidate only while it is closer to the query than to every
already-kept neighbor).

TPU-first redesign — nothing here is a translation of the reference's
pointer-and-heap code:

  * SEARCH is one batched fixed-shape device program. The per-query
    priority queues + visited bitmap become a sorted top-ef candidate
    buffer with EXPANSION FLAGS: each masked beam step expands the best
    unexpanded candidate of every query simultaneously (gather neighbors,
    one MXU distance block, argsort merge with id-dedup). A query whose
    best unexpanded candidate is worse than its current ef-th result is
    frozen — the same stop rule as the reference, evaluated batch-wide.
  * CONSTRUCTION inserts points in frozen-graph batches: each batch is
    device-searched against the graph built so far (same descent + beam
    kernels), neighbors are selected with a vectorized form of the
    occlusion heuristic (static loop over candidate ranks, batched over
    all inserted points at once), and the link tables are updated
    host-side with reverse-edge overflow re-pruning. Points inside one
    batch do not see each other (the reference's per-point locks have no
    useful equivalent on a TPU); recall parity is asserted by tests.
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric, worst_value
from auncel_tpu.index.base import Index

# insertion batches double with the graph (a batch never exceeds the
# frozen graph it searches, keeping early connectivity rich), capped to
# bound device memory per step
BUILD_BATCH_MIN = 8
BUILD_BATCH_MAX = 16384
BUILD_BATCHES = tuple(2 ** i for i in range(3, 15))  # 8..16384 buckets


def _better(a, b, metric: Metric):
    return a < b if metric.lower_is_better else a > b


def _block_dist(q, blocks, metric: Metric):
    """q [B, d] vs blocks [B, K, d] -> [B, K] metric values (f32 HIGHEST,
    same contraction family as the scan path)."""
    dots = jnp.einsum("bkd,bd->bk", blocks, q,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if metric is Metric.L2:
        return jnp.maximum(jnp.sum(jnp.square(q), -1)[:, None]
                           + jnp.sum(jnp.square(blocks), -1) - 2.0 * dots,
                           0.0)
    return dots


class HNSWCodec(NamedTuple):
    """Device-storage codec for compressed HNSW variants (reference
    IndexHNSWSQ / IndexHNSWPQ, IndexHNSW.h:147-166: the graph's
    DistanceComputer decodes stored codes asymmetrically against raw
    float queries). Exactly one of (scale+bias) or books is set; the
    pytree structure keeps the variant STATIC under jit."""
    scale: jax.Array | None = None   # [d] SQ8 affine
    bias: jax.Array | None = None    # [d]
    books: jax.Array | None = None   # [M, 256, d/M] PQ codebooks
    # 2-level codes (reference Index2Layer storage behind IndexHNSW2Level,
    # IndexHNSW.cpp:1054-1100): first 4 code bytes = little-endian coarse
    # centroid id, remaining M bytes = PQ(residual) code.
    centroids: jax.Array | None = None  # [nlist, d] float32


def storage_decode(x: jax.Array, codec: HNSWCodec | None) -> jax.Array:
    """Gathered storage block [..., d_code] -> f32 vectors [..., d]."""
    if codec is None:
        return x
    if codec.centroids is not None:
        from auncel_tpu.ops.pq import decode_pq, PQCodebooks
        b = x.astype(jnp.int32)
        lid = (b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16)
               | (b[..., 3] << 24))
        resid = decode_pq(PQCodebooks(codec.books), x[..., 4:])
        return codec.centroids[lid] + resid
    if codec.books is not None:
        from auncel_tpu.ops.pq import decode_pq, PQCodebooks
        return decode_pq(PQCodebooks(codec.books), x)
    return x.astype(jnp.float32) * codec.scale + codec.bias


@functools.partial(jax.jit, static_argnames=("iters", "metric"))
def greedy_descent(
    xb: jax.Array,        # [N, d]
    table: jax.Array,     # [n_l, M] neighbor ids (global), -1 pad
    g2u: jax.Array,       # [N] global -> row in table, -1 if absent
    q: jax.Array,         # [B, d]
    cur: jax.Array,       # [B] current node ids (must exist at this level)
    cur_d: jax.Array,     # [B] their metric values
    iters: int,
    metric: Metric,
    codec: HNSWCodec | None = None,
):
    """Reference ``greedy_update_nearest``: move to the best neighbor while
    it improves; batched with a fixed iteration cap (the walk length is
    O(log N); converged queries stop changing state)."""
    worst = worst_value(metric)

    def body(_, st):
        cur, cur_d = st
        up = g2u[cur]
        nbrs = table[jnp.maximum(up, 0)]                   # [B, M]
        valid = (nbrs >= 0) & (up >= 0)[:, None]
        d = _block_dist(q, storage_decode(xb[jnp.maximum(nbrs, 0)], codec),
                        metric)
        d = jnp.where(valid, d, worst)
        if metric.lower_is_better:
            j = jnp.argmin(d, axis=1)
        else:
            j = jnp.argmax(d, axis=1)
        bd = jnp.take_along_axis(d, j[:, None], 1)[:, 0]
        bn = jnp.take_along_axis(nbrs, j[:, None], 1)[:, 0]
        better = _better(bd, cur_d, metric)
        return (jnp.where(better, bn, cur).astype(jnp.int32),
                jnp.where(better, bd, cur_d))

    return jax.lax.fori_loop(0, iters, body, (cur, cur_d))


@functools.partial(jax.jit, static_argnames=("ef", "iters", "metric"))
def beam_search(
    xb: jax.Array,        # [N, d]
    table: jax.Array,     # [n_l, K] neighbor ids (global), -1 pad
    g2u: jax.Array,       # [N] global -> row in table, -1 if absent
    q: jax.Array,         # [B, d]
    entry: jax.Array,     # [B] entry node ids
    entry_d: jax.Array,   # [B]
    ef: int,
    iters: int,
    metric: Metric,
    codec: HNSWCodec | None = None,
):
    """ef-bounded exploration (reference ``search_from_candidates``).
    Returns (cand_ids [B, ef], cand_d [B, ef]) sorted best-first."""
    B = q.shape[0]
    K = table.shape[1]
    worst = worst_value(metric)
    sign = 1.0 if metric.lower_is_better else -1.0

    cand_ids = jnp.full((B, ef), -1, jnp.int32).at[:, 0].set(entry)
    cand_d = jnp.full((B, ef), worst, jnp.float32).at[:, 0].set(entry_d)
    expanded = jnp.zeros((B, ef), bool)

    def body(_, st):
        cand_ids, cand_d, expanded = st
        unexp = (~expanded) & (cand_ids >= 0)
        has = jnp.any(unexp, axis=1)
        pos = jnp.argmax(unexp, axis=1)          # best unexpanded (sorted)
        dpos = jnp.take_along_axis(cand_d, pos[:, None], 1)[:, 0]
        # stop rule: best unexpanded no better than current ef-th result
        # (check_relative_distance, HNSW.cpp search_from_candidates)
        wref = cand_d[:, -1]
        active = has & (_better(dpos, wref, metric) | (cand_ids[:, -1] < 0))
        node = jnp.take_along_axis(cand_ids, pos[:, None], 1)[:, 0]
        up = g2u[jnp.maximum(node, 0)]
        nbrs = table[jnp.maximum(up, 0)]                    # [B, K]
        valid = ((nbrs >= 0) & (up >= 0)[:, None] & active[:, None])
        nd = _block_dist(q, storage_decode(xb[jnp.maximum(nbrs, 0)], codec),
                         metric)
        nd = jnp.where(valid, nd, worst)
        nbrs = jnp.where(valid, nbrs, -1)
        expanded = expanded.at[jnp.arange(B), pos].set(
            expanded[jnp.arange(B), pos] | active)

        # merge + dedup: sort by (id, expanded-first) so the surviving
        # copy of a revisited node keeps its expanded flag
        ids_all = jnp.concatenate([cand_ids, nbrs], axis=1)
        d_all = jnp.concatenate([cand_d, nd], axis=1)
        exp_all = jnp.concatenate(
            [expanded, jnp.zeros_like(nbrs, bool)], axis=1)
        big = jnp.int32(2_147_000_000)
        key = jnp.where(ids_all >= 0,
                        ids_all * 2 + (1 - exp_all.astype(jnp.int32)), big)
        order = jnp.argsort(key, axis=1)
        ids_s = jnp.take_along_axis(ids_all, order, 1)
        d_s = jnp.take_along_axis(d_all, order, 1)
        exp_s = jnp.take_along_axis(exp_all, order, 1)
        dup = jnp.concatenate(
            [jnp.zeros((B, 1), bool), ids_s[:, 1:] == ids_s[:, :-1]], axis=1)
        bad = dup | (ids_s < 0)
        d_s = jnp.where(bad, worst, d_s)
        ids_s = jnp.where(bad, -1, ids_s)
        order2 = jnp.argsort(sign * d_s, axis=1)[:, :ef]
        return (jnp.take_along_axis(ids_s, order2, 1),
                jnp.take_along_axis(d_s, order2, 1),
                jnp.take_along_axis(exp_s, order2, 1))

    cand_ids, cand_d, _ = jax.lax.fori_loop(
        0, iters, body, (cand_ids, cand_d, expanded))
    return cand_ids, cand_d


@functools.partial(jax.jit, static_argnames=("out_k", "metric"))
def _merge_ranked(ids_a, d_a, ids_b, d_b, self_ids, out_k, metric):
    """Merge two candidate sets per row, drop duplicates and self-links,
    return the best ``out_k`` sorted best-first."""
    B = ids_a.shape[0]
    worst = worst_value(metric)
    sign = 1.0 if metric.lower_is_better else -1.0
    ids_all = jnp.concatenate([ids_a, ids_b], axis=1)
    d_all = jnp.concatenate([d_a, d_b], axis=1)
    bad = (ids_all < 0) | (ids_all == self_ids[:, None])
    big = jnp.int32(2_147_000_000)
    key = jnp.where(bad, big, ids_all)
    order = jnp.argsort(key, axis=1)
    ids_s = jnp.take_along_axis(ids_all, order, 1)
    d_s = jnp.take_along_axis(d_all, order, 1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), ids_s[:, 1:] == ids_s[:, :-1]], axis=1)
    bad2 = dup | (ids_s < 0) | (ids_s == self_ids[:, None])
    d_s = jnp.where(bad2, worst, d_s)
    ids_s = jnp.where(bad2, -1, ids_s)
    order2 = jnp.argsort(sign * d_s, axis=1)[:, :out_k]
    return (jnp.take_along_axis(ids_s, order2, 1),
            jnp.take_along_axis(d_s, order2, 1))


@functools.partial(jax.jit, static_argnames=("M", "metric"))
def heuristic_keep(
    xb: jax.Array,
    q: jax.Array,          # [Q, d] the points being linked
    cand_ids: jax.Array,   # [Q, K] candidates sorted best-first
    cand_d: jax.Array,     # [Q, K]
    M: int,
    metric: Metric,
    codec: HNSWCodec | None = None,
):
    """Vectorized occlusion heuristic (``shrink_neighbor_list``): walk
    candidates nearest-first, keep v iff dist(q, v) beats dist(v, s) for
    every already-kept s; stop at M. Returns keep mask [Q, K]."""
    Q, K = cand_ids.shape
    vecs = storage_decode(xb[jnp.maximum(cand_ids, 0)], codec)  # [Q, K, d]
    dots = jnp.einsum("qkd,qjd->qkj", vecs, vecs,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if metric is Metric.L2:
        sq = jnp.sum(jnp.square(vecs), -1)
        pair = sq[:, :, None] + sq[:, None, :] - 2.0 * dots
    else:
        pair = dots
    worst = worst_value(metric)
    keep = jnp.zeros((Q, K), bool)
    # occl[q, v] = best distance from candidate v to any kept neighbor
    occl = jnp.full((Q, K), worst, jnp.float32)
    kept = jnp.zeros((Q,), jnp.int32)

    def body(r, st):
        keep, occl, kept = st
        dqr = cand_d[:, r]
        ok = ((cand_ids[:, r] >= 0) & (kept < M)
              & _better(dqr, occl[:, r], metric))
        keep = keep.at[:, r].set(ok)
        upd = _better(pair[:, r, :], occl, metric) & ok[:, None]
        occl = jnp.where(upd, pair[:, r, :], occl)
        return keep, occl, kept + ok.astype(jnp.int32)

    keep, _, _ = jax.lax.fori_loop(0, K, body, (keep, occl, kept))
    return keep


class HNSWIndex(Index):
    """Standalone HNSW index over raw vectors (reference IndexHNSWFlat)."""

    def __init__(self, d: int, M: int = 32, metric: Metric = Metric.L2,
                 ef_construction: int = 40, ef_search: int = 16,
                 seed: int = 1234, refine_passes: int = 1):
        self.d = d
        self.M = int(M)
        self.metric = Metric.parse(metric)
        self.ef_construction = int(ef_construction)
        self.ef_search = int(ef_search)
        self.refine_passes = int(refine_passes)
        self.level_mult = 1.0 / np.log(self.M)  # set_default_probas
        self.rng = np.random.RandomState(seed)
        self.is_trained = True
        self._xb = np.zeros((0, d), np.float32)
        self._built = False
        self._codec: HNSWCodec | None = None  # compressed-storage decode
        # optional refined re-rank hook (reference IndexHNSW.h:80)
        self.reconstruct_from_neighbors = None
        # graph state (host mirrors + device copies)
        self.levels: np.ndarray | None = None
        self.entry_point = -1
        self.max_level = -1
        self.nb_tables: list = []    # per level: np [n_l, K] global ids
        self.g2u: list = []          # per level: np [N] -> row or -1
        self._dev = None             # (xb, [(table, g2u)] per level)

    # ------------------------------------------------------------- state

    @property
    def ntotal(self) -> int:
        return self._xb.shape[0]

    def train(self, x):
        pass

    def add(self, x: np.ndarray, ids=None) -> None:
        assert ids is None, "HNSWIndex stores sequential ids"
        x = np.asarray(x, np.float32)
        assert x.shape[1] == self.d
        self._xb = np.concatenate([self._xb, x], 0)
        self._built = False

    def reset(self):
        self._xb = np.zeros((0, self.d), np.float32)
        self._built = False
        self._dev = None

    def _caps(self, level: int) -> int:
        return 2 * self.M if level == 0 else self.M

    # ------------------------------------------------------------- build

    def _device_storage(self):
        """What lives on device as the vector table: raw f32 for the flat
        index; codes for the compressed variants (decoded at gather)."""
        return jnp.asarray(self._xb)

    def _push_dev(self):
        self._dev = (self._device_storage(),
                     [(jnp.asarray(t), jnp.asarray(g))
                      for t, g in zip(self.nb_tables, self.g2u)])

    def build(self) -> None:
        """(Re)build the graph over the stored vectors in frozen-graph
        batches."""
        n = self.ntotal
        if n == 0:
            self._built = True
            return
        levels = np.floor(-np.log(np.maximum(
            self.rng.rand(n), 1e-12)) * self.level_mult).astype(np.int64)
        self.levels = levels
        self.max_level = int(levels.max())
        self.entry_point = int(np.argmax(levels))
        n_levels = self.max_level + 1
        self.nb_tables = []
        self.g2u = []
        for l in range(n_levels):
            members = np.where(levels >= l)[0].astype(np.int32)
            g2u = np.full(n, -1, np.int32)
            g2u[members] = np.arange(members.size, dtype=np.int32)
            self.nb_tables.append(
                np.full((members.size, self._caps(l)), -1, np.int32))
            self.g2u.append(g2u)

        # the entry point seeds the graph alone; everything else inserts
        # in growing frozen-graph batches
        rest = np.arange(n, dtype=np.int64)
        rest = rest[rest != self.entry_point]
        self._push_dev()
        self._insert_batch(np.asarray([self.entry_point], np.int64))
        done = 0
        # AUNCEL_HNSW_PROGRESS=1: per-phase wall-clock to stderr (large
        # builds run for hours through the axon tunnel; a killed run
        # should still leave evidence of how far it got)
        import os as _os
        import sys as _sys
        import time as _time
        prog = bool(_os.environ.get("AUNCEL_HNSW_PROGRESS"))
        t0 = _time.time()
        last = t0
        while done < rest.size:
            # batch <= current graph size (doubling), within buckets
            bs = min(max(BUILD_BATCH_MIN, done + 1), BUILD_BATCH_MAX)
            self._insert_batch(rest[done:done + bs])
            done += bs
            if prog and (_time.time() - last > 60 or done >= rest.size):
                last = _time.time()
                print(f"[hnsw build {last - t0:7.1f} s] inserted "
                      f"{done}/{rest.size}", file=_sys.stderr, flush=True)
        self._built = True
        for l in range(self.max_level + 1):
            self._repair_connectivity(l)
        if prog:
            print(f"[hnsw build {_time.time() - t0:7.1f} s] insert + "
                  f"repair done; refine x{self.refine_passes} starts",
                  file=_sys.stderr, flush=True)
        self._push_dev()
        if self.refine_passes:
            self.refine(self.refine_passes)
        if prog:
            print(f"[hnsw build {_time.time() - t0:7.1f} s] build done",
                  file=_sys.stderr, flush=True)

    def refine(self, passes: int = 1, ef: int | None = None,
               batch: int = 8192) -> None:
        """Second-pass graph refinement: re-search the FINISHED graph for
        every node, re-select its neighbors from (beam candidates ∪
        current links) with the occlusion heuristic, then symmetrize with
        overflow re-pruning. Recovers the recall the frozen-batch build
        loses at scale — points inside one insertion batch never link to
        each other, while the reference inserts per point with immediate
        reverse links (HNSW.cpp add_links_starting_from /
        shrink_neighbor_list); one batched re-link round against the
        complete graph restores those missing edges."""
        assert self._built
        if self.ntotal <= 1:
            return
        ef = int(ef if ef is not None else
                 max(self.ef_construction, 2 * self.M, 64))
        for _ in range(passes):
            xb_d, tables_d = self._dev
            for l in range(self.max_level + 1):
                members = np.where(self.levels >= l)[0].astype(np.int64)
                if members.size <= 1:
                    continue
                table = self.nb_tables[l]
                g2u = self.g2u[l]
                sel_all = np.full((members.size, self.M), -1, np.int32)
                for c0 in range(0, members.size, batch):
                    chunk = members[c0:c0 + batch]
                    bs = next((b for b in (1,) + BUILD_BATCHES
                               if chunk.size <= b), chunk.size)
                    pad = np.full(bs, chunk[0], np.int64)
                    pad[: chunk.size] = chunk
                    q = jnp.asarray(self._xb[pad])
                    cur = jnp.full((bs,), self.entry_point, jnp.int32)
                    cur_d = _block_dist(
                        q, storage_decode(xb_d[cur],
                                          self._codec)[:, None, :],
                        self.metric)[:, 0]
                    for lv in range(self.max_level, l, -1):
                        tb, gg = tables_d[lv]
                        if tb.shape[0]:
                            cur, cur_d = greedy_descent(
                                xb_d, tb, gg, q, cur, cur_d, 16,
                                self.metric, self._codec)
                    tb, gg = tables_d[l]
                    cand_ids, cand_d = beam_search(
                        xb_d, tb, gg, q, cur, cur_d, ef, ef, self.metric,
                        self._codec)
                    nbrs = jnp.asarray(table[g2u[pad]])
                    nd = _block_dist(
                        q, storage_decode(xb_d[jnp.maximum(nbrs, 0)],
                                          self._codec), self.metric)
                    nd = jnp.where(nbrs >= 0, nd,
                                   worst_value(self.metric))
                    m_ids, m_d = _merge_ranked(
                        cand_ids, cand_d, nbrs, nd,
                        jnp.asarray(pad.astype(np.int32)), ef, self.metric)
                    keep = heuristic_keep(xb_d, q, m_ids, m_d, self.M,
                                          self.metric, self._codec)
                    m_np, k_np = np.asarray(m_ids), np.asarray(keep)
                    for i in range(chunk.size):
                        s = m_np[i][k_np[i] & (m_np[i] >= 0)][: self.M]
                        sel_all[c0 + i, : s.size] = s
                self._rebuild_level(l, members, sel_all)
            for l in range(self.max_level + 1):
                # the overflow re-prune can strand outliers again
                self._repair_connectivity(l)
            self._push_dev()

    def _repair_connectivity(self, level: int = 0,
                             max_rounds: int = 8) -> int:
        """Make every node reachable from the entry point at this level.

        The occlusion prune can strand outliers: a far node's reverse
        edge is always the farthest candidate in its neighbor's full row
        and loses the shrink every time, leaving in-degree 0 — beam
        search can then NEVER find it, which caps recall (measured: 105
        of 512 k-means centroids unreachable, costing 12% of top-1
        probes; the reference's per-point insertion has the same hole in
        principle but hits it rarely). Repair: BFS over out-edges from
        the entry, then for each unreachable node add an edge from its
        nearest REACHABLE node, replacing the farthest slot when the row
        is full. Returns the number of edges added."""
        table = self.nb_tables[level]
        g2u = self.g2u[level]
        members = np.where(self.levels >= level)[0].astype(np.int64)
        if members.size <= 1:
            return 0
        xb = self._xb
        added = 0
        # slots written by THIS repair call are protected from replacement:
        # outliers often share the same nearest anchor, and replacing its
        # farthest slot repeatedly would let each repair overwrite the last
        protected: set = set()
        for _ in range(max_rounds):
            # frontier BFS from the entry over out-edges (vectorized on
            # host; runs a handful of times per build)
            seen = np.zeros(self.ntotal, bool)
            frontier = np.asarray([self.entry_point], np.int64)
            seen[frontier] = True
            while frontier.size:
                nxt = table[g2u[frontier]].ravel()
                nxt = np.unique(nxt[nxt >= 0])
                nxt = nxt[~seen[nxt]]
                seen[nxt] = True
                frontier = nxt
            unreach = members[~seen[members]]
            if unreach.size == 0:
                break
            reach = members[seen[members]]
            # nearest reachable node per unreachable node: chunked device
            # matmul ([chunk, |reach|] scores, never a 3-d blowup)
            rr = jnp.asarray(xb[reach])
            rr_sq = jnp.sum(jnp.square(rr), axis=1)
            j = np.empty(unreach.size, np.int64)
            for c0 in range(0, unreach.size, 1024):
                xu = jnp.asarray(xb[unreach[c0:c0 + 1024]])
                dots = jnp.einsum("ud,rd->ur", xu, rr,
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
                if self.metric.lower_is_better:
                    sc = (jnp.sum(jnp.square(xu), 1)[:, None] + rr_sq
                          - 2.0 * dots)
                    j[c0:c0 + 1024] = np.asarray(jnp.argmin(sc, axis=1))
                else:
                    j[c0:c0 + 1024] = np.asarray(jnp.argmax(dots, axis=1))
            for ui, u in enumerate(unreach):
                r = int(reach[j[ui]])
                row = g2u[r]
                lst = table[row]
                free = np.where(lst < 0)[0]
                if free.size:
                    slot = int(free[0])
                else:
                    # replace the WORST unprotected neighbor by the index
                    # metric (keeps r's best links; guarantees u becomes
                    # reachable). IP graphs rank by dot product — squared
                    # L2 would evict the most-similar link when norms vary
                    if self.metric.lower_is_better:
                        dr = ((xb[lst] - xb[r]) ** 2).sum(1)
                        order = np.argsort(dr)[::-1]   # farthest first
                    else:
                        dr = xb[lst] @ xb[r]
                        order = np.argsort(dr)          # lowest IP first
                    cand = [int(s) for s in order
                            if (row, int(s)) not in protected]
                    if not cand:
                        continue  # row saturated by repairs; next round
                    slot = cand[0]
                table[row, slot] = u
                protected.add((row, slot))
                added += 1
        return added

    def _rebuild_level(self, level: int, members: np.ndarray,
                       sel: np.ndarray) -> None:
        """ADD the refined selections (and their reverse edges) to the
        level's existing links; only rows overflowing the level cap are
        re-pruned with the occlusion heuristic (reference shrink-on-
        overflow semantics, HNSW.cpp add_link). Additive on purpose: a
        wholesale replace was measured to DESTROY recall at scale — the
        beam candidates on an imperfect graph are not a superset of the
        links the incremental build got right, and dropping those links
        loses more navigability than the new edges add."""
        g2u = self.g2u[level]
        cap = self._caps(level)
        old = self.nb_tables[level]
        uu = np.repeat(members, self.M)
        vv = sel.ravel().astype(np.int64)
        ok = vv >= 0
        ou = np.repeat(members, old.shape[1])
        ov = old[g2u[members]].ravel().astype(np.int64)
        ook = ov >= 0
        e_from = np.concatenate([uu[ok], vv[ok], ou[ook]])
        e_to = np.concatenate([vv[ok], uu[ok], ov[ook]])
        rows = g2u[e_from].astype(np.int64)
        # dedup (row, neighbor) pairs
        key = rows * (self.ntotal + 1) + e_to
        key = np.unique(key)
        rows_u = (key // (self.ntotal + 1)).astype(np.int64)
        to_u = (key % (self.ntotal + 1)).astype(np.int32)
        counts = np.bincount(rows_u, minlength=members.size)
        table = np.full((members.size, cap), -1, np.int32)
        starts = np.concatenate([[0], np.cumsum(counts)])
        fit = counts <= cap
        for r in np.where(fit & (counts > 0))[0]:
            table[r, : counts[r]] = to_u[starts[r]:starts[r + 1]]
        over_rows = np.where(~fit)[0]
        if over_rows.size:
            maxk = int(counts[over_rows].max())
            maxk = min(((maxk + 7) // 8) * 8, max(cap * 8, 64))
            cand = np.full((over_rows.size, maxk), -1, np.int32)
            for i, r in enumerate(over_rows):
                lst = to_u[starts[r]:starts[r + 1]][:maxk]
                cand[i, : lst.size] = lst
            xb_d = self._dev[0]
            nodes = members[over_rows]
            qv = jnp.asarray(self._xb[nodes])
            d = _block_dist(qv, storage_decode(
                xb_d[jnp.maximum(jnp.asarray(cand), 0)], self._codec),
                self.metric)
            d = jnp.where(jnp.asarray(cand) >= 0, d,
                          worst_value(self.metric))
            sign = 1.0 if self.metric.lower_is_better else -1.0
            order = jnp.argsort(sign * d, axis=1)
            cand_s = jnp.take_along_axis(jnp.asarray(cand), order, 1)
            d_s = jnp.take_along_axis(d, order, 1)
            keep = heuristic_keep(xb_d, qv, cand_s, d_s, cap, self.metric,
                              self._codec)
            cand_np, keep_np = np.asarray(cand_s), np.asarray(keep)
            for i, r in enumerate(over_rows):
                s = cand_np[i][keep_np[i] & (cand_np[i] >= 0)][:cap]
                table[r, : s.size] = s
        self.nb_tables[level] = table

    def _insert_batch(self, pts: np.ndarray) -> None:
        if pts.size == 0:
            return
        # pad ragged tails up to the batch bucket (one compiled program per
        # bucket size); padding entries get target level -1 -> no links
        bs = next((b for b in (1,) + BUILD_BATCHES if pts.size <= b),
                  pts.size)
        tgt = np.full(bs, -1, np.int64)
        tgt[: pts.size] = self.levels[pts]
        pts_pad = np.full(bs, pts[0], np.int64)
        pts_pad[: pts.size] = pts
        xb_d, tables_d = self._dev
        q = jnp.asarray(self._xb[pts_pad])
        B = bs
        cur = jnp.full((B,), self.entry_point, jnp.int32)
        cur_d = _block_dist(q, storage_decode(xb_d[cur], self._codec)[:, None, :],
                            self.metric)[:, 0]
        efc = self.ef_construction
        new_edges = {}   # level -> (src pts, candidates, keep mask)
        for l in range(self.max_level, -1, -1):
            table_d, g2u_d = tables_d[l]
            if table_d.shape[0] == 0:
                continue
            # queries whose target < l only descend greedily
            cur, cur_d = greedy_descent(
                xb_d, table_d, g2u_d, q, cur, cur_d, 16, self.metric,
                self._codec)
            link = tgt >= l
            if not link.any():
                continue
            cand_ids, cand_d = beam_search(
                xb_d, table_d, g2u_d, q, cur, cur_d, efc,
                efc, self.metric, self._codec)
            keep = heuristic_keep(xb_d, q, cand_ids, cand_d, self.M,
                                  self.metric, self._codec)
            cand_np = np.asarray(cand_ids)
            keep_np = np.asarray(keep) & (cand_np >= 0) & link[:, None]
            # a point must not link to itself (it is not in the frozen
            # graph yet, but the very first seed insert could see itself)
            keep_np &= cand_np != pts_pad[:, None]
            new_edges[l] = (pts_pad[link], cand_np[link], keep_np[link])
            # continue descent from the best candidate (device-side)
            ok = cand_ids[:, 0] >= 0
            cur = jnp.where(ok, cand_ids[:, 0], cur).astype(jnp.int32)
            cur_d = jnp.where(ok, cand_d[:, 0], cur_d)

        for l, (src, cands, keeps) in new_edges.items():
            self._connect(l, src, cands, keeps)
        self._push_dev()

    def _connect(self, level: int, src: np.ndarray, cands: np.ndarray,
                 keeps: np.ndarray) -> None:
        """Host-side link surgery: forward edges src -> selected, reverse
        edges selected -> src with overflow re-pruning (reference
        add_link + shrink_neighbor_list)."""
        table = self.nb_tables[level]
        g2u = self.g2u[level]
        cap = self._caps(level)
        overflow: dict[int, list[int]] = {}
        for i, s in enumerate(src):
            sel = cands[i][keeps[i]][: self.M]
            row = g2u[s]
            table[row, : sel.size] = sel
            for v in sel:
                vrow = g2u[v]
                lst = table[vrow]
                free = np.where(lst < 0)[0]
                if s in lst:
                    continue
                if free.size:
                    table[vrow, free[0]] = s
                else:
                    overflow.setdefault(int(v), []).append(int(s))
        if overflow:
            self._reprune(level, overflow)

    def _reprune(self, level: int, overflow: dict) -> None:
        """Re-select an overflowing node's neighbor list with the
        occlusion heuristic (batched on device)."""
        table = self.nb_tables[level]
        g2u = self.g2u[level]
        cap = self._caps(level)
        nodes = np.fromiter(overflow.keys(), np.int64)
        maxk = cap + max(len(v) for v in overflow.values())
        maxk = ((maxk + 7) // 8) * 8  # bucket K: bound compiled variants
        cand = np.full((nodes.size, maxk), -1, np.int32)
        for i, v in enumerate(nodes):
            lst = [x for x in table[g2u[v]] if x >= 0] + overflow[int(v)]
            cand[i, : len(lst)] = lst
        xb_d = self._dev[0]
        qv = jnp.asarray(self._xb[nodes])
        d = _block_dist(qv, storage_decode(
            xb_d[jnp.maximum(jnp.asarray(cand), 0)], self._codec),
            self.metric)
        d = jnp.where(jnp.asarray(cand) >= 0, d, worst_value(self.metric))
        sign = 1.0 if self.metric.lower_is_better else -1.0
        order = jnp.argsort(sign * d, axis=1)
        cand_s = jnp.take_along_axis(jnp.asarray(cand), order, 1)
        d_s = jnp.take_along_axis(d, order, 1)
        keep = heuristic_keep(xb_d, qv, cand_s, d_s, cap, self.metric,
                              self._codec)
        cand_np, keep_np = np.asarray(cand_s), np.asarray(keep)
        for i, v in enumerate(nodes):
            sel = cand_np[i][keep_np[i] & (cand_np[i] >= 0)][:cap]
            row = np.full(cap, -1, np.int32)
            row[: sel.size] = sel
            table[g2u[v]] = row

    # ------------------------------------------------------------ search

    def search(self, q: np.ndarray, k: int, ef: int | None = None):
        if not self._built:
            self.build()
        q = np.asarray(q, np.float32)
        ef = max(int(ef if ef is not None else self.ef_search), k)
        if self.ntotal == 0:
            return (np.full((q.shape[0], k), worst_value(self.metric),
                            np.float32),
                    np.full((q.shape[0], k), -1, np.int64))
        xb_d, tables_d = self._dev
        qd = jnp.asarray(q)
        B = q.shape[0]
        cur = jnp.full((B,), self.entry_point, jnp.int32)
        cur_d = _block_dist(qd, storage_decode(xb_d[cur], self._codec)[:, None, :],
                            self.metric)[:, 0]
        for l in range(self.max_level, 0, -1):
            table_d, g2u_d = tables_d[l]
            if table_d.shape[0]:
                cur, cur_d = greedy_descent(
                    xb_d, table_d, g2u_d, qd, cur, cur_d, 16, self.metric,
                    self._codec)
        table_d, g2u_d = tables_d[0]
        cand_ids, cand_d = beam_search(
            xb_d, table_d, g2u_d, qd, cur, cur_d, ef, ef, self.metric,
            self._codec)
        vals = np.array(cand_d[:, :k])
        ids = np.asarray(cand_ids[:, :k]).astype(np.int64)
        rfn = getattr(self, "reconstruct_from_neighbors", None)
        if rfn is not None and getattr(rfn, "k_reorder", -1) != 0:
            # re-rank the top k_reorder through the refined neighbor
            # reconstructions (reference IndexHNSW::search,
            # IndexHNSW.cpp:260-285). L2 only, like the reference's
            # compute_distances (fvec_L2sqr) — mixing metrics would
            # silently reorder by the wrong objective.
            assert self.metric is Metric.L2, \
                "reconstruct_from_neighbors re-rank is L2-only"
            kr = getattr(rfn, "k_reorder", -1)
            kr = k if (kr == -1 or kr > k) else int(kr)
            d2 = rfn.compute_distances(q, ids[:, :kr])
            order = np.argsort(d2, axis=1, kind="stable")
            ids[:, :kr] = np.take_along_axis(ids[:, :kr], order, 1)
            vals[:, :kr] = np.take_along_axis(d2, order, 1)
        return vals, ids

    # ---------------------------------------------------------------- io

    def _io_extra(self) -> dict:
        """Subclass hook: storage payloads beyond the graph (codes,
        codebooks) — the reference's write_index serializes the storage
        sub-index alongside the link structure (index_io.cpp). Only
        called on a trained index."""
        return {}

    def _io_restore(self, z) -> None:
        """Subclass hook: rebuild codec/storage state from _io_extra
        payloads. Runs before the device push. Must tolerate missing
        payloads (untrained saves)."""

    def _io_rebuild_xb(self):
        """Subclass hook: reconstruct the decoded host mirror from the
        restored codes (compressed variants do NOT serialize xb — it is
        a pure function of the codes; storing it would make the file
        ~code_size/4d x larger than the codes it compresses). None = xb
        was serialized directly (the flat base)."""
        return None

    def _io_stores_codes(self) -> bool:
        """True when _io_extra carries codes that _io_rebuild_xb can
        decode at load time (so save skips xb). A cheap capability check
        — calling _io_rebuild_xb to probe would run a full-corpus decode
        just to throw it away."""
        return False

    def save(self, path: str) -> None:
        assert self._built or self.ntotal == 0
        extra = self._io_extra() if self.is_trained else {}
        payload = {} if self._io_stores_codes() else dict(xb=self._xb)
        levels = (self.levels if self.levels is not None
                  else np.zeros((0,), np.int32))  # never-built empty index
        np.savez(path, kind=type(self).__name__,
                 d=self.d, levels=levels,
                 entry=self.entry_point, max_level=self.max_level,
                 M=self.M, ef_search=self.ef_search,
                 metric=self.metric.value,
                 **{f"table{l}": t for l, t in enumerate(self.nb_tables)},
                 **{f"g2u{l}": g for l, g in enumerate(self.g2u)},
                 **payload, **extra)

    @classmethod
    def _from_io(cls, z) -> "HNSWIndex":
        """Construct an empty instance with the right ctor args (subclass
        hook — compressed variants recover pq_m/nlist from payloads)."""
        d = int(z["d"]) if "d" in z else int(z["xb"].shape[1])
        return cls(d, M=int(z["M"]), metric=Metric(str(z["metric"])),
                   ef_search=int(z["ef_search"]))

    @classmethod
    def load(cls, path: str) -> "HNSWIndex":
        with np.load(path) as z:
            kind = str(z["kind"]) if "kind" in z else "HNSWIndex"
            variants = {c.__name__: c for c in
                        (HNSWIndex, IndexHNSWSQ, IndexHNSWPQ,
                         IndexHNSW2Level)}
            klass = variants.get(kind, cls)
            idx = klass._from_io(z)
            idx.levels = z["levels"]
            idx.entry_point = int(z["entry"])
            idx.max_level = int(z["max_level"])
            idx.nb_tables = [z[f"table{l}"]
                             for l in range(idx.max_level + 1)]
            idx.g2u = [z[f"g2u{l}"] for l in range(idx.max_level + 1)]
            idx._io_restore(z)
            if "xb" in z:
                idx._xb = z["xb"]
            else:
                xb = idx._io_rebuild_xb()
                assert xb is not None, "file has neither xb nor codes"
                idx._xb = xb
            idx._push_dev()
            idx._built = True
        return idx


class IndexHNSWSQ(HNSWIndex):
    """HNSW over SQ8-coded storage (reference IndexHNSWSQ,
    IndexHNSW.h:158; the factory accepts "HNSW%d_SQ8" only,
    AutoTune.cpp:908-910). Device memory holds uint8 codes (4x less than
    f32); every graph kernel decodes gathered codes through the shared
    affine codec — distances are asymmetric (raw float query vs decoded
    codes), exactly the reference's SQ DistanceComputer. The host mirror
    ``_xb`` keeps the DECODED values, so host-side graph surgery
    (connectivity repair, refinement queries) sees the same numbers the
    device computes."""

    def __init__(self, d: int, M: int = 16, **kw):
        super().__init__(d, M=M, **kw)
        self.is_trained = False
        self._scale: np.ndarray | None = None
        self._vmin: np.ndarray | None = None
        self._codes = np.zeros((0, d), np.uint8)

    def train(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float32)
        self._vmin = x.min(0).astype(np.float32)
        self._scale = np.maximum((x.max(0) - self._vmin) / 255.0,
                                 1e-10).astype(np.float32)
        self._codec = HNSWCodec(scale=jnp.asarray(self._scale),
                                bias=jnp.asarray(self._vmin))
        self.is_trained = True

    def add(self, x: np.ndarray, ids=None) -> None:
        assert self.is_trained, "train before add"
        x = np.asarray(x, np.float32)
        codes = np.clip(np.rint((x - self._vmin) / self._scale), 0,
                        255).astype(np.uint8)
        self._codes = np.concatenate([self._codes, codes], 0)
        # host mirror stores decoded values (same f32 affine the device
        # applies, so host/device arithmetic agree bitwise)
        super().add(codes.astype(np.float32) * self._scale + self._vmin)

    def _device_storage(self):
        return jnp.asarray(self._codes)

    def reset(self):
        super().reset()
        self._codes = np.zeros((0, self.d), np.uint8)

    def _io_extra(self):
        return dict(sq_scale=self._scale, sq_vmin=self._vmin,
                    sq_codes=self._codes)

    def _io_restore(self, z):
        if "sq_scale" not in z:      # untrained save
            return
        self._scale = np.asarray(z["sq_scale"], np.float32)
        self._vmin = np.asarray(z["sq_vmin"], np.float32)
        self._codes = np.asarray(z["sq_codes"], np.uint8)
        self._codec = HNSWCodec(scale=jnp.asarray(self._scale),
                                bias=jnp.asarray(self._vmin))
        self.is_trained = True

    def _io_rebuild_xb(self):
        if not self.is_trained:
            return None
        return self._codes.astype(np.float32) * self._scale + self._vmin

    def _io_stores_codes(self) -> bool:
        return self.is_trained


class IndexHNSWPQ(HNSWIndex):
    """HNSW over PQ codes (reference IndexHNSWPQ, IndexHNSW.h:147;
    factory "HNSW%d_PQ%d", AutoTune.cpp:902-904). Device memory holds
    pq_m bytes per vector; gathered codes decode through the codebooks
    (one small gather) before the MXU distance block — the reference's
    PQ DistanceComputer as a decode+contract instead of LUT sums."""

    def __init__(self, d: int, pq_m: int = 8, M: int = 16, **kw):
        assert d % pq_m == 0, f"d={d} must divide into pq_m={pq_m}"
        super().__init__(d, M=M, **kw)
        self.is_trained = False
        self.pq_m = int(pq_m)
        self._pq = None
        self._codes = np.zeros((0, pq_m), np.uint8)

    def train(self, x: np.ndarray) -> None:
        from auncel_tpu.ops.pq import train_pq
        self._pq = train_pq(np.asarray(x, np.float32), self.pq_m)
        self._codec = HNSWCodec(books=self._pq.codebooks)
        self.is_trained = True

    def add(self, x: np.ndarray, ids=None) -> None:
        from auncel_tpu.ops.pq import encode_pq, decode_pq
        assert self.is_trained, "train before add"
        x = np.asarray(x, np.float32)
        codes = np.asarray(encode_pq(self._pq, jnp.asarray(x)))
        self._codes = np.concatenate([self._codes, codes], 0)
        super().add(np.asarray(decode_pq(self._pq, jnp.asarray(codes)),
                               np.float32))

    def _device_storage(self):
        return jnp.asarray(self._codes)

    def reset(self):
        super().reset()
        self._codes = np.zeros((0, self.pq_m), np.uint8)

    def _io_extra(self):
        return dict(pq_books=np.asarray(self._pq.codebooks),
                    pq_codes=self._codes)

    @classmethod
    def _from_io(cls, z):
        d = int(z["d"]) if "d" in z else int(z["xb"].shape[1])
        pq_m = int(z["pq_books"].shape[0]) if "pq_books" in z else 8
        return cls(d, pq_m=pq_m, M=int(z["M"]),
                   metric=Metric(str(z["metric"])),
                   ef_search=int(z["ef_search"]))

    def _io_restore(self, z):
        if "pq_books" not in z:      # untrained save
            return
        from auncel_tpu.ops.pq import PQCodebooks
        self._pq = PQCodebooks(jnp.asarray(z["pq_books"]))
        self._codes = np.asarray(z["pq_codes"], np.uint8)
        self._codec = HNSWCodec(books=self._pq.codebooks)
        self.is_trained = True

    def _io_rebuild_xb(self):
        if not self.is_trained:
            return None
        from auncel_tpu.ops.pq import decode_pq
        return np.asarray(decode_pq(self._pq, jnp.asarray(self._codes)),
                          np.float32)

    def _io_stores_codes(self) -> bool:
        return self.is_trained


class IndexHNSW2Level(HNSWIndex):
    """HNSW graph over two-level coded storage (reference IndexHNSW2Level,
    IndexHNSW.h / IndexHNSW.cpp:1054-1100: an IndexHNSW whose storage is
    an Index2Layer, distances computed by the Distance2Level
    reconstructor; factory cells "HNSW%d_%d+PQ%d" and "HNSW%d_2x%d+PQ%d",
    AutoTune.cpp:886-899). Device memory holds 4 + pq_m bytes per vector
    (little-endian coarse id + PQ(residual) code); every graph kernel
    decodes through the shared 2-level codec. The host mirror keeps the
    DECODED reconstructions so host-side graph surgery sees the device's
    numbers. ``storage`` exposes the underlying Index2Layer (the
    reference's ``transfer_to_IVFPQ`` big-build recipe works from it).

    The reference seeds level-0 search from the quantizer's nearest
    centroids (IndexHNSW2Level::search, IndexHNSW.cpp:1316); here the
    standard batched greedy+beam over the full hierarchy provides the
    same capability with one code path.
    """

    def __init__(self, d: int, nlist: int, pq_m: int = 8, M: int = 16,
                 quantizer=None, **kw):
        super().__init__(d, M=M, **kw)
        from auncel_tpu.index.twolayer import Index2Layer
        self.is_trained = False
        self.storage = Index2Layer(d, nlist, pq_m, metric=self.metric,
                                   quantizer=quantizer)
        self._codes = np.zeros((0, 4 + pq_m), np.uint8)

    def train(self, x: np.ndarray) -> None:
        self.storage.train(x)
        self._codec = HNSWCodec(
            books=self.storage._pq.codebooks,
            centroids=jnp.asarray(self.storage.centroids))
        self.is_trained = True

    def add(self, x: np.ndarray, ids=None) -> None:
        assert self.is_trained, "train before add"
        x = np.asarray(x, np.float32)
        n0 = self.storage.ntotal
        self.storage.add(x)
        lid = self.storage.list_ids[n0:].astype(np.uint32)
        packed = np.empty((x.shape[0], 4 + self.storage.M), np.uint8)
        packed[:, 0] = lid & 0xFF
        packed[:, 1] = (lid >> 8) & 0xFF
        packed[:, 2] = (lid >> 16) & 0xFF
        packed[:, 3] = (lid >> 24) & 0xFF
        packed[:, 4:] = self.storage.codes[n0:]
        self._codes = np.concatenate([self._codes, packed], 0)
        # host mirror = decoded reconstructions (centroid + pq decode)
        super().add(self.storage.reconstruct_n(n0))

    def _device_storage(self):
        return jnp.asarray(self._codes)

    def reset(self):
        super().reset()
        self.storage.reset()
        self._codes = np.zeros((0, 4 + self.storage.M), np.uint8)

    def _io_extra(self):
        # packed_codes are NOT stored: they are a pure byte-packing of
        # (tl_list_ids, tl_codes), rebuilt in _io_restore
        return dict(tl_centroids=self.storage.centroids,
                    tl_books=np.asarray(self.storage._pq.codebooks),
                    tl_list_ids=self.storage.list_ids,
                    tl_codes=self.storage.codes)

    @classmethod
    def _from_io(cls, z):
        d = int(z["d"]) if "d" in z else int(z["xb"].shape[1])
        nlist = int(z["tl_centroids"].shape[0]) if "tl_centroids" in z \
            else 1
        pq_m = int(z["tl_books"].shape[0]) if "tl_books" in z else 8
        return cls(d, nlist=nlist, pq_m=pq_m, M=int(z["M"]),
                   metric=Metric(str(z["metric"])),
                   ef_search=int(z["ef_search"]))

    def _io_restore(self, z):
        if "tl_centroids" not in z:  # untrained save
            return
        from auncel_tpu.ops.pq import PQCodebooks
        st = self.storage
        st.centroids = np.asarray(z["tl_centroids"], np.float32)
        st._pq = PQCodebooks(jnp.asarray(z["tl_books"]))
        st.list_ids = np.asarray(z["tl_list_ids"], np.int32)
        st.codes = np.asarray(z["tl_codes"], np.uint8)
        st.is_trained = True
        lid = st.list_ids.astype(np.uint32)
        packed = np.empty((len(lid), 4 + st.M), np.uint8)
        packed[:, 0] = lid & 0xFF
        packed[:, 1] = (lid >> 8) & 0xFF
        packed[:, 2] = (lid >> 16) & 0xFF
        packed[:, 3] = (lid >> 24) & 0xFF
        packed[:, 4:] = st.codes
        self._codes = packed
        self._codec = HNSWCodec(books=st._pq.codebooks,
                                centroids=jnp.asarray(st.centroids))
        self.is_trained = True

    def _io_rebuild_xb(self):
        if not self.is_trained:
            return None
        return self.storage.reconstruct_n(0)

    def _io_stores_codes(self) -> bool:
        return self.is_trained
