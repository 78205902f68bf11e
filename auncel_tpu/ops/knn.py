"""Blocked exact brute-force k-NN.

Capability parity with the reference's ``knn_L2sqr``/``knn_inner_product``
drivers (``/root/reference/Auncel/utils.cpp:624-654``) and thus with its
``IndexFlat`` search and ground-truth generator (``dist/gt.cpp``). The
reference blocks SGEMM at bs_x=4096 / bs_y=1024 to stay in cache
(``utils.cpp:538-614``); we block to bound HBM working-set of the [qb, db]
score tile, and let the MXU do the rest.

The query-block loop is a host Python loop over a jitted step (block sizes
are static, so each distinct shape compiles once); the corpus-block loop is
a ``lax.fori_loop`` with a running top-k merge.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from auncel_tpu.types import Metric
from auncel_tpu.ops.distance import pairwise_scores, sqnorms
from auncel_tpu.ops.topk import topk_scores, merge_topk, init_topk


class KnnResult(NamedTuple):
    vals: np.ndarray  # [nq, k] metric values, best first
    ids: np.ndarray   # [nq, k] int32 corpus ids


def _pad_rows(x: np.ndarray, rows: int) -> np.ndarray:
    if x.shape[0] == rows:
        return x
    out = np.zeros((rows,) + x.shape[1:], x.dtype)
    out[: x.shape[0]] = x
    return out


@functools.partial(jax.jit, static_argnames=("k", "metric", "db_block"))
def _knn_block(q, db, db_sq, n_valid, k, metric, db_block):
    """Top-k of one query block against the full (device-resident) corpus."""
    nb = db.shape[0]
    nsteps = nb // db_block

    def body(i, carry):
        vals, ids = carry
        y = jax.lax.dynamic_slice_in_dim(db, i * db_block, db_block, 0)
        ysq = jax.lax.dynamic_slice_in_dim(db_sq, i * db_block, db_block, 0)
        s = pairwise_scores(q, y, metric, y_sqnorms=ysq)
        base = i * db_block
        block_ids = base + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], db_block), 1)
        # Mask padded corpus rows.
        valid = block_ids < n_valid
        from auncel_tpu.types import worst_value
        s = jnp.where(valid, s, worst_value(metric))
        bvals, bids = topk_scores(s, block_ids, min(k, db_block), metric)
        return merge_topk(vals, ids, bvals, bids, k, metric)

    init = init_topk((q.shape[0],), k, metric)
    return jax.lax.fori_loop(0, nsteps, body, init)


def knn(
    queries,
    corpus,
    k: int,
    metric: Metric = Metric.L2,
    q_block: int = 1024,
    db_block: int = 65536,
    y_sqnorms: np.ndarray | None = None,
) -> KnnResult:
    """Exact k nearest neighbors of each query in the corpus.

    Host-facing: accepts numpy or jax arrays, returns numpy. The corpus is
    placed on device once; queries stream through in blocks.
    ``y_sqnorms`` overrides the corpus norm term (the base-shift trick
    folds per-row additive shifts into it)."""
    metric = Metric.parse(metric)
    queries = np.asarray(queries, np.float32)
    corpus = np.asarray(corpus, np.float32)
    nq, d = queries.shape
    nb = corpus.shape[0]
    assert corpus.shape[1] == d

    db_block = min(db_block, max(512, nb))
    nb_pad = ((nb + db_block - 1) // db_block) * db_block
    db = jnp.asarray(_pad_rows(corpus, nb_pad))
    if y_sqnorms is None:
        db_sq = sqnorms(db)
    else:
        db_sq = jnp.asarray(_pad_rows(
            np.asarray(y_sqnorms, np.float32), nb_pad))

    out_vals = np.empty((nq, k), np.float32)
    out_ids = np.empty((nq, k), np.int32)
    # One padded block shape for all blocks (incl. the ragged last one):
    # a single compilation per (qb, nb) instead of one per remainder size.
    qb_shape = min(q_block, ((nq + 63) // 64) * 64)
    for q0 in range(0, nq, q_block):
        q1 = min(q0 + q_block, nq)
        qb = _pad_rows(queries[q0:q1], qb_shape)
        vals, ids = _knn_block(
            jnp.asarray(qb), db, db_sq, nb, k, metric, db_block)
        out_vals[q0:q1] = np.asarray(vals)[: q1 - q0]
        out_ids[q0:q1] = np.asarray(ids)[: q1 - q0]
    return KnnResult(out_vals, out_ids)


@functools.partial(jax.jit, static_argnames=("metric",))
def _subset_scores(q, db, labels, metric):
    """[nq, ns] metric values of q[i] vs db[labels[i]]; worst at
    labels < 0. f32 HIGHEST like the main drivers — values agree with
    exact_search within the repo's 1e-5 rel invariant (the batched-vs-
    per-query contraction order differs in the last ulp)."""
    from auncel_tpu.types import worst_value
    sub = db[jnp.maximum(labels, 0)]                     # [nq, ns, d]
    dots = jnp.einsum("bsd,bd->bs", sub, q,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    if metric is Metric.L2:
        scores = jnp.maximum(
            sqnorms(q)[:, None] + jnp.sum(jnp.square(sub), -1)
            - 2.0 * dots, 0.0)
    else:
        scores = dots
    return jnp.where(labels >= 0, scores, worst_value(metric))


def compute_distance_subset(queries: np.ndarray, corpus: np.ndarray,
                            labels: np.ndarray,
                            metric: Metric = Metric.L2) -> np.ndarray:
    """Distances of each query to ITS OWN candidate-id row, in label
    order (reference IndexFlat::compute_distance_subset,
    IndexFlat.cpp:60-96 — the re-ranking primitive behind
    IndexRefineFlat). labels < 0 return the metric's worst value."""
    q = jnp.asarray(np.asarray(queries, np.float32))
    db = jnp.asarray(np.asarray(corpus, np.float32))
    labels = jnp.asarray(np.asarray(labels, np.int64).astype(np.int32))
    return np.asarray(_subset_scores(q, db, labels, Metric.parse(metric)))


def knn_by_idx(queries: np.ndarray, corpus: np.ndarray,
               labels: np.ndarray, k: int,
               metric: Metric = Metric.L2) -> KnnResult:
    """Top-k among per-query candidate id lists (reference
    ``knn_L2sqr_by_idx`` / ``knn_inner_products_by_idx``,
    utils.cpp:729-823: re-rank a pre-selected vector list). Returned ids
    are CORPUS ids; labels < 0 are excluded (the reference's IP variant
    stops at the first negative id — a mask is the batched equivalent)."""
    metric = Metric.parse(metric)
    q = jnp.asarray(np.asarray(queries, np.float32))
    db = jnp.asarray(np.asarray(corpus, np.float32))
    lab = jnp.asarray(np.asarray(labels, np.int64).astype(np.int32))
    scores = _subset_scores(q, db, lab, metric)
    # excluded slots carry worst_value scores but would otherwise keep
    # their RAW negative label (e.g. -2) in the output; the heap contract
    # (and this function's own k>width padding below) emits -1
    lab = jnp.where(lab >= 0, lab, -1)
    vals, ids = topk_scores(scores, lab, min(k, lab.shape[1]), metric)
    if k > lab.shape[1]:  # pad like the heap (worst value, id -1)
        from auncel_tpu.types import worst_value
        pad = k - lab.shape[1]
        vals = jnp.concatenate(
            [vals, jnp.full((vals.shape[0], pad), worst_value(metric))], 1)
        ids = jnp.concatenate(
            [ids, jnp.full((ids.shape[0], pad), -1, ids.dtype)], 1)
    return KnnResult(np.asarray(vals), np.asarray(ids))


def knn_l2sqr_base_shift(queries: np.ndarray, corpus: np.ndarray, k: int,
                         base_shift: np.ndarray,
                         q_block: int = 4096) -> KnnResult:
    """L2 kNN with a per-corpus-row additive distance shift (reference
    ``knn_L2sqr_base_shift``, utils.cpp:664, backing IndexFlatL2BaseShift):
    score(q, y_i) = ||q - y_i||^2 + base_shift[i]. The shift folds into
    the ||y||^2 norm term, so the blocked MXU driver is reused as-is."""
    # The shift folds into the corpus norms: pairwise L2 =
    # q_sq + y_sq - 2qy, so adding shift[i] to y_sq[i] adds it to every
    # distance involving row i — exactly the reference semantics.
    corpus = np.asarray(corpus, np.float32)
    shifted = (np.asarray(sqnorms(jnp.asarray(corpus)))
               + np.asarray(base_shift, np.float32))
    # reuse the blocked MXU driver (a one-shot [nq, nb] score matrix OOMs
    # at corpus scale); the shift rides the y_sqnorms override
    return knn(queries, corpus, k, Metric.L2, q_block=q_block,
               y_sqnorms=shifted)
