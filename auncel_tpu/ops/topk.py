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
