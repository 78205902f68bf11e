"""Learned adaptive early termination — baseline 2.

Capability parity with the reference's LAET fork (SIGMOD'20; SURVEY.md §2
#33, ``LAET/IndexIVF.cpp:232-263,567-695`` + the LightGBM training harness
``LAET/benchs/learned_termination/``): a per-query regressor predicts how
many probes this query needs to capture its true top-k, from features
available after a cheap fixed prefix of the search; online, each query runs
a fixed-nprobe search at ``prediction * multiplier``.

TPU recast: the GBDT becomes a small JAX MLP trained with optax (no
LightGBM in-tree, and an MLP both trains and serves on the TPU); features
and labels mirror the reference —

  features: query vector, its top coarse distances (ratios), and the
            intermediate top-1/mid/k distances after scanning a short
            probe prefix (the reference's pred_thresh checkpoint);
  label:    log of the minimal nprobe whose probed cells contain the whole
            true top-k (the reference generates this with search_mode=1);
  online:   nprobe_q = clip(round(exp(pred) * multiplier), 1, nlist), then
            one masked fixed-budget scan (same engine as time_search);
  tuning:   ``tune_multiplier`` binary-searches the multiplier for a recall
            target on held-out queries (the reference's run.sh loop).
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.scan import scan_probe_range, coarse_rank
from auncel_tpu.ops.distance import sqnorms
from auncel_tpu.ops.topk import init_topk
from auncel_tpu.profile.bounded import nprobe_search

N_COARSE_FEAT = 10
PRED_PREFIX = 1  # probes scanned before predicting (LAET pred_thresh=1)


class _MLP(NamedTuple):
    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array
    w3: jax.Array
    b3: jax.Array


def _mlp_init(key, d_in, hidden=64):
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = (2.0 / d_in) ** 0.5
    s2 = (2.0 / hidden) ** 0.5
    return _MLP(
        jax.random.normal(k1, (d_in, hidden)) * s1, jnp.zeros(hidden),
        jax.random.normal(k2, (hidden, hidden)) * s2, jnp.zeros(hidden),
        jax.random.normal(k3, (hidden, 1)) * s2, jnp.zeros(1))


def _mlp_apply(p: _MLP, x):
    h = jax.nn.relu(x @ p.w1 + p.b1)
    h = jax.nn.relu(h @ p.w2 + p.b2)
    return (h @ p.w3 + p.b3)[:, 0]


@functools.partial(jax.jit,
                   static_argnames=("max_topk", "query_k", "metric"))
def _feature_kernel(arrays, q: jax.Array, max_topk: int, query_k: int,
                    metric: Metric) -> jax.Array:
    """[B, d + N_COARSE_FEAT + 3] feature matrix: query, top coarse
    distance ratios, intermediate top-1/mid/k distance ratios after the
    PRED_PREFIX-probe checkpoint (LAET/IndexIVF.cpp:567-695 features)."""
    B = q.shape[0]
    q_sq = sqnorms(q)
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq)
    vals, ids = init_topk((B,), max_topk, metric)
    limit = jnp.full((B,), arrays.nlist, jnp.int32)
    vals, _ = scan_probe_range(arrays, q, q_sq, cids, vals, ids,
                               limit, 0, PRED_PREFIX, metric)
    cd = cdis[:, :N_COARSE_FEAT]
    k = query_k
    inter = jnp.stack([vals[:, 0], vals[:, max(k // 2 - 1, 0)],
                       vals[:, k - 1]], axis=1)
    inter = jnp.nan_to_num(inter, posinf=0.0, neginf=0.0)
    # scale-free ratios stabilize training across datasets
    denom = jnp.maximum(jnp.abs(cd[:, :1]), 1e-6)
    return jnp.concatenate([q, cd / denom, inter / denom], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("max_topk", "query_k", "metric"))
def _predict_kernel(params: "_MLP", arrays, q: jax.Array,
                    feat_mean: jax.Array, feat_std: jax.Array,
                    multiplier: jax.Array, max_topk: int, query_k: int,
                    metric: Metric) -> jax.Array:
    """Per-query nprobe prediction [B] int32, fully on device."""
    feats = _feature_kernel(arrays, q, max_topk, query_k, metric)
    x = (feats - feat_mean) / feat_std
    pred = _mlp_apply(params, x)
    n = jnp.exp(pred) * multiplier
    return jnp.clip(jnp.round(n), 1, arrays.nlist).astype(jnp.int32)


class LearnedTermination:
    def __init__(self, index: IVFFlatIndex, query_k: int,
                 max_topk: int = 100, hidden: int = 64, seed: int = 0):
        self.index = index
        self.query_k = query_k
        self.max_topk = max_topk
        self.hidden = hidden
        self.seed = seed
        self.multiplier = 1.0
        self._mr_plan = None
        self.params: _MLP | None = None
        self._feat_mean = None
        self._feat_std = None

    # ---------------------------------------------------------- features

    def _features(self, q: np.ndarray) -> np.ndarray:
        """Checkpoint features after scanning PRED_PREFIX probes
        (LAET: query + intermediate result distances). ONE jitted device
        program — the eager formulation cost ~30 ms/op through the axon
        tunnel and made the measured qps a dispatch artifact."""
        qd = jnp.asarray(np.asarray(q, np.float32))
        return np.asarray(jax.device_get(_feature_kernel(
            self.index.arrays, qd, self.max_topk, self.query_k,
            self.index.metric)))

    def _labels(self, xq: np.ndarray, gt_I: np.ndarray) -> np.ndarray:
        """Minimal nprobe whose probed cells contain the true top-k
        (coarse rank of the farthest true neighbor's list + 1)."""
        idx = self.index
        arrays = idx.arrays
        ids_np = np.asarray(arrays.vec_ids)
        ntotal = idx.ntotal
        vec2list = np.zeros(int(ids_np.max()) + 1, np.int32)
        for l in range(arrays.nlist):
            m = ids_np[l][ids_np[l] >= 0]
            vec2list[m] = l
        _, cids = idx.coarse_rank_np(xq)
        rank_of = np.argsort(cids, 1)
        labels = np.empty(xq.shape[0], np.float32)
        for i in range(xq.shape[0]):
            lists = vec2list[gt_I[i, : self.query_k]]
            labels[i] = rank_of[i][lists].max() + 1
        return labels

    # ------------------------------------------------------------- train

    def train(self, xq: np.ndarray, gt_I: np.ndarray, epochs: int = 300,
              lr: float = 1e-3) -> float:
        feats = self._features(xq)
        labels = np.log(self._labels(xq, gt_I))
        self._feat_mean = feats.mean(0)
        self._feat_std = feats.std(0) + 1e-6
        x = jnp.asarray((feats - self._feat_mean) / self._feat_std)
        y = jnp.asarray(labels)
        params = _mlp_init(jax.random.PRNGKey(self.seed), x.shape[1],
                           self.hidden)
        opt = optax.adam(lr)
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            def loss_fn(p):
                return jnp.mean((_mlp_apply(p, x) - y) ** 2)
            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, state2 = opt.update(g, state)
            return optax.apply_updates(params, upd), state2, loss

        loss = None
        for _ in range(epochs):
            params, state, loss = step(params, state)
        self.params = params
        return float(loss)

    # ------------------------------------------------------------ online

    def _predict_dev(self, q: np.ndarray) -> jax.Array:
        """Device-resident per-query nprobe predictions: features + MLP +
        multiplier scaling fused into one dispatch (no host round-trip of
        the feature matrix)."""
        assert self.params is not None, "train first"
        qd = jnp.asarray(np.asarray(q, np.float32))
        return _predict_kernel(
            self.params, self.index.arrays, qd,
            jnp.asarray(self._feat_mean, jnp.float32),
            jnp.asarray(self._feat_std, jnp.float32),
            jnp.float32(self.multiplier), self.max_topk, self.query_k,
            self.index.metric)

    def predict_nprobe(self, q: np.ndarray) -> np.ndarray:
        return np.asarray(jax.device_get(self._predict_dev(q)),
                          np.int64)

    def search(self, q: np.ndarray, k: int):
        """Per-query predicted-nprobe search (LAET search_mode=2): one
        predict dispatch + one scan dispatch + one narrow fetch."""
        nprobe_d = self._predict_dev(q)
        # exact per-query probe-count replay (no float budget inversion:
        # the ceil round-trip is off by one for ~2% of counts)
        mr = getattr(self.index, "multirow", None)
        if mr is not None:
            from auncel_tpu.profile.bounded_mr import (
                nprobe_search_mr, plan_oneshot)
            if self._mr_plan is None:
                self._mr_plan = plan_oneshot(
                    np.asarray(mr.rows_per_list), self.index.nlist)
            vals, ids, nb = nprobe_search_mr(
                self.index.arrays, mr,
                jnp.asarray(np.asarray(q, np.float32)), nprobe_d,
                self.max_topk, self.index.metric, self._mr_plan)
        else:
            vals, ids, nb = nprobe_search(
                self.index.arrays, jnp.asarray(np.asarray(q, np.float32)),
                nprobe_d, self.max_topk, self.index.metric)
        # one fetch for everything (nb == the predicted per-query nprobe)
        vals, ids, nb = jax.device_get((vals, ids, nb))
        return (vals[:, :k], ids[:, :k].astype(np.int64),
                nb.astype(np.int64))

    def tune_multiplier(self, xq: np.ndarray, gt_D: np.ndarray,
                        target_recall: float, lo: float = 0.25,
                        hi: float = 64.0, iters: int = 8,
                        criterion: str = "mean") -> float:
        """Binary-search the multiplier for a recall target (the reference
        tunes per-workload in run.sh). ``criterion``: "mean" is LAET's own
        average-recall objective; "worst" tunes the per-query MIN — use it
        when comparing against systems that pay for a worst-case bound,
        otherwise the comparison is apples-to-oranges (LAET's multiplier
        lands far lower than a bound-holding one)."""
        from auncel_tpu.autotune import recall_counts
        assert criterion in ("mean", "worst"), criterion
        k = self.query_k
        best = hi
        for _ in range(iters):
            mid = (lo * hi) ** 0.5
            self.multiplier = mid
            D, I, _ = self.search(xq, k)
            counts = recall_counts(D, gt_D, k, self.index.metric)
            rec = (counts.min() if criterion == "worst"
                   else counts.mean()) / k
            if rec >= target_recall:
                best = mid
                hi = mid
            else:
                lo = mid
        self.multiplier = best
        return best
