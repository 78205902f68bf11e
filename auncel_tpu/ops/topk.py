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

    REGIME-MEASURED (round 4, one v5e): this is the DEFAULT for the
    compacted ladder/tail gather merges (scan_probe_range routes all of
    them here) — headline A/B at 10M read 332.6 qps (verified) vs 294.5
    (exact) at identical calibration (logs_r4/bound10Mc vs bound10Md).
    It remains REJECTED for the wide dense-pass merges
    (masked_full_scan keeps exact sorts): the standalone microbench at
    B=1024 (Merge_bench.log, 0.83-0.95x at W=2k..131k) and the w-corpus
    serving cell (103.4 vs 116.5 qps) both measured the selector +
    certificate overhead losing there. Round-5 re-measures the split
    with interleaved repeats (the two round-4 arms were single runs
    within axon variance).

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
