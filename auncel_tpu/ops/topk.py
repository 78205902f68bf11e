"""Exact batched top-k selection and sorted-list merging.

Replaces the reference's binary-heap layer (``/root/reference/Auncel/Heap.h``:
``heap_push``/``heap_addn``/``HeapArray``). On TPU the idiomatic equivalent is
``jax.lax.top_k`` over fixed-shape score blocks plus concatenate-and-reselect
merging of running results — O(k) state per query, no data-dependent control
flow, fully vectorized over the query batch.

Convention: results are kept *sorted best-first* at all times (the reference
only reorders heaps at the end, ``heap_reorder``; we keep sorted order because
the bounded-termination predicate consumes sorted top-k snapshots every wave,
``IndexIVF.cpp:560-565``).
"""

import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric, worst_value


def topk_scores(
    scores: jax.Array,
    ids: jax.Array,
    k: int,
    metric: Metric,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k by metric order. scores: [..., n], ids: [..., n] int32.

    Returns (vals [..., k], ids [..., k]) sorted best-first. If n < k the
    output is padded with the metric's worst value and id -1 (matching the
    reference's HUGE_VAL/-1 heap padding).
    """
    n = scores.shape[-1]
    if n < k:
        pad_shape = scores.shape[:-1] + (k - n,)
        scores = jnp.concatenate(
            [scores, jnp.full(pad_shape, worst_value(metric), scores.dtype)],
            axis=-1)
        ids = jnp.concatenate(
            [ids, jnp.full(pad_shape, -1, ids.dtype)], axis=-1)
    if metric.lower_is_better:
        neg, idx = jax.lax.top_k(-scores, k)
        vals = -neg
    else:
        vals, idx = jax.lax.top_k(scores, k)
    out_ids = jnp.take_along_axis(ids, idx, axis=-1)
    # Force padding ids to -1 even when top_k picked a pad slot.
    is_pad = jnp.isinf(vals) if metric is Metric.L2 else jnp.isneginf(vals)
    out_ids = jnp.where(is_pad, -1, out_ids)
    return vals, out_ids


def merge_topk(
    vals_a: jax.Array,
    ids_a: jax.Array,
    vals_b: jax.Array,
    ids_b: jax.Array,
    k: int,
    metric: Metric,
) -> tuple[jax.Array, jax.Array]:
    """Merge two best-first candidate sets into the top-k of their union."""
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    return topk_scores(vals, ids, k, metric)


def merge_topk_verified(
    rvals: jax.Array,
    rids: jax.Array,
    scores: jax.Array,
    ids: jax.Array,
    k: int,
    metric: Metric,
    oversample: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """EXACT top-k merge of a running result with a wide score window,
    using the TPU ApproxTopK reduction as a candidate selector under an
    exactness certificate.

    MEASURED AND REJECTED as the engine default (round 4,
    Merge_bench.log, one v5e): 0.95x/0.83x/0.87x/0.89x/0.90x vs the
    exact sort at W = 2k/8k/33k/65k/131k (B=1024, k=100) — the selector
    + certificate + stable re-rank overhead exceeds the exact sort's
    margin at every production width, and the w-corpus serving cell
    confirmed end-to-end (103.4 vs 116.5 qps). Kept, with its tests, as
    the proof that the certificate construction is sound (values exact,
    tie-break bit-identical) should a future backend shift the
    sort/ApproxTopK cost ratio; it also documents WHY the engines keep
    exact sorts — this was the second attack on the merge frontier after
    round 3's plain-approx rejection, with the same conclusion.

    The exact merge (`topk_scores` over [.., k+W]) is sort-bound and
    scales with W (measured, RESULTS_r3 top-k frontier: 14.8 ms at
    W=33k, B=1024, k=100 on one v5e), while `approx_min_k` is width-flat
    (~3.3 ms) but may drop a true neighbor — which breaks the
    partial==full value-consistency invariant the profile trainer and
    bound checker rest on, so round 3 rejected it as a DIRECT merge.
    This keeps exactness by PROVING, per window, that nothing
    rank-relevant was dropped:

      1. select the best k' = oversample*k of the union with
         `approx_min_k` (recall 0.95, `aggregate_to_topk` sorts the
         reduced set exactly);
      2. certificate: count (exactly, one reduction) the union elements
         at least as good as the selected k-th value, and compare with
         the same count over the selected set. Equality proves every
         element ranking at or above the selected k-th — a superset of
         the true top-k, since the selected k-th can only be worse than
         the true k-th — survived selection, AND that every unselected
         element is strictly worse than the selected k-th;
      3. re-sort the selected set by (value, original position): because
         of (2) every tie contender for a top-k rank was selected, so
         this reproduces `lax.top_k`'s stable first-occurrence tie-break
         bit-for-bit — the engine-equality invariants (oneshot == wave,
         dense == gather) compare ids EXACTLY and must not see
         selection-order ties;
      4. on any counting mismatch (a genuine recall miss) fall back to
         the exact sort for the whole window via `lax.cond` — rare by
         construction (the oversample margin covers the ~5% per-element
         recall), and the fallback restores exact behavior.

    The certificate makes the fast path safe: a mis-selection can cost
    a fallback sort, never a wrong result or a different tie-break.
    """
    cat_v = jnp.concatenate([rvals, scores], axis=-1)
    cat_i = jnp.concatenate([rids, ids], axis=-1)
    n = cat_v.shape[-1]
    k2 = min(oversample * k, n)
    if n <= 4 * k2:
        # narrow windows: the exact sort is already at its frontier
        return topk_scores(cat_v, cat_i, k, metric)
    # Counts exclude the metric's worst value (pad slots): a query whose
    # running result is not yet full has kth == worst, and its exactness
    # condition is "every REAL candidate survived selection" — counting
    # pads would force a permanent fallback instead.
    w = worst_value(metric)
    if metric.lower_is_better:
        sel_v, sel_pos = jax.lax.approx_min_k(cat_v, k2)
        kth = sel_v[..., k - 1:k]
        c_all = jnp.sum((cat_v <= kth) & (cat_v < w), axis=-1)
        c_sel = jnp.sum((sel_v <= kth) & (sel_v < w), axis=-1)
    else:
        sel_v, sel_pos = jax.lax.approx_max_k(cat_v, k2)
        kth = sel_v[..., k - 1:k]
        c_all = jnp.sum((cat_v >= kth) & (cat_v > w), axis=-1)
        c_sel = jnp.sum((sel_v >= kth) & (sel_v > w), axis=-1)
    sel_i = jnp.take_along_axis(cat_i, sel_pos, axis=-1)
    proven = jnp.all(c_all == c_sel)

    def fast(_):
        # Stable re-rank of the selected set by (value, position in the
        # exact path's concat order): the certificate guarantees every
        # tie contender was selected, so this matches lax.top_k's
        # first-occurrence tie-break exactly.
        key = sel_v if metric.lower_is_better else -sel_v
        kq, _, iq, vq = jax.lax.sort(
            (key, sel_pos.astype(jnp.int32), sel_i, sel_v), num_keys=2)
        v, i = vq[..., :k], iq[..., :k]
        # pad slots (worst value) selected at the tail: keep id -1
        is_pad = jnp.isinf(v) if metric is Metric.L2 else jnp.isneginf(v)
        return v, jnp.where(is_pad, -1, i)

    def exact(_):
        return topk_scores(cat_v, cat_i, k, metric)

    return jax.lax.cond(proven, fast, exact, None)


def topk_vals_verified(
    cand: jax.Array,
    k: int,
    metric: Metric,
    oversample: int = 2,
) -> jax.Array:
    """Values-only `merge_topk_verified`: exact sorted top-k VALUES of a
    wide candidate window via the ApproxTopK selector + the same
    counting certificate (no ids, so no tie-break re-rank is needed —
    tied values are equal values). Used by the dense decide pass, whose
    per-stage snapshots are value-only (profile/bounded_mr.py)."""
    n = cand.shape[-1]
    k2 = min(oversample * k, n)
    if n <= 4 * k2:
        if metric.lower_is_better:
            return -jax.lax.top_k(-cand, k)[0]
        return jax.lax.top_k(cand, k)[0]
    w = worst_value(metric)
    if metric.lower_is_better:
        sel_v, _ = jax.lax.approx_min_k(cand, k2)
        kth = sel_v[..., k - 1:k]
        c_all = jnp.sum((cand <= kth) & (cand < w), axis=-1)
        c_sel = jnp.sum((sel_v <= kth) & (sel_v < w), axis=-1)
    else:
        sel_v, _ = jax.lax.approx_max_k(cand, k2)
        kth = sel_v[..., k - 1:k]
        c_all = jnp.sum((cand >= kth) & (cand > w), axis=-1)
        c_sel = jnp.sum((sel_v >= kth) & (sel_v > w), axis=-1)
    proven = jnp.all(c_all == c_sel)

    def fast(_):
        return sel_v[..., :k]

    def exact(_):
        if metric.lower_is_better:
            return -jax.lax.top_k(-cand, k)[0]
        return jax.lax.top_k(cand, k)[0]

    return jax.lax.cond(proven, fast, exact, None)


def sort_scores(
    vals: jax.Array,
    ids: jax.Array,
    metric: Metric,
) -> tuple[jax.Array, jax.Array]:
    """Sort candidates best-first along the last axis."""
    keys = vals if metric.lower_is_better else -vals
    order = jnp.argsort(keys, axis=-1)
    return (jnp.take_along_axis(vals, order, axis=-1),
            jnp.take_along_axis(ids, order, axis=-1))


def init_topk(
    batch_shape: tuple[int, ...],
    k: int,
    metric: Metric,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Empty running result: worst values, id -1 (reference heap_heapify
    semantics, Heap.h:185)."""
    vals = jnp.full(batch_shape + (k,), worst_value(metric), dtype)
    ids = jnp.full(batch_shape + (k,), -1, jnp.int32)
    return vals, ids
