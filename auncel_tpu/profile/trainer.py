"""Offline error-profile training.

Capability parity with the reference's profile-training pass
(``Error_sys::sys_train``, profile.cpp:88-171, driving the ``training``
branch of ``IndexIVF::search_preassigned``, IndexIVF.cpp:640-673):

  * one multi-probe search over the training queries, probing lists in
    coarse-rank order up to nlist/8 (the reference's training loop breaks
    past nlist/8);
  * at every power-of-two stage (1, 2, 4, ..., nlist/8) snapshot the
    current sorted top-k;
  * for each snapshot candidate at rank ij, find its rank in the
    ground-truth top-k *by distance value* (1e-5 tolerance, reference
    ``kscaling``, IVF_pro.cpp:72-82) -> U = (gt_rank+1)/(ij+1);
    stop at the first candidate that is not in the GT top-k, and keep at
    most max_topk/4 pairs per query per stage (IndexIVF.cpp:652-672);
  * phi = sum of boundary angles over the window starting at stage-1;
  * per stage, sort/batch/average the pairs into a phi->U map
    (``Trace::SB``).

TPU recast: the whole per-batch pass — coarse ranking, boundary geometry,
wave scans, snapshots, value matching, phi — is ONE jitted program with the
power-of-two wave schedule unrolled (8 waves for nlist=1024). The per-query
sequential probe loop and the per-candidate GT scan become batched tensor
ops ([B, k, k] match matrix + prefix masks).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.scan import IVFArrays, coarse_rank, scan_probe_range
from auncel_tpu.ops.distance import sqnorms
from auncel_tpu.ops.topk import init_topk
from auncel_tpu.profile.geometry import boundary_distances, sum_angle
from auncel_tpu.profile.trace import (
    TraceSet, build_trace, make_trace_set, DEFAULT_BATCH)

KSCALING_TOL = 1e-5  # reference kscaling match tolerance (IVF_pro.cpp:76)


def train_stages(nlist: int) -> list[int]:
    """Power-of-two probe stages with trained maps: 1, 2, ..., nlist/8
    (reference init_tune, IndexIVF.cpp:209-221)."""
    stages = []
    s = 1
    # max(nlist//8, 1): tiny toy indexes (nlist < 8) still get the
    # stage-1 map — geometry/stage_to_trace/plan_mr_waves already floor
    # the cap the same way, and an empty stage list crashes
    # wave_boundaries and jnp.stack downstream
    while s <= max(nlist // 8, 1):
        stages.append(s)
        s <<= 1
    return stages


@functools.partial(jax.jit, static_argnames=("max_topk", "metric"))
def _collect_pairs(arrays: IVFArrays, q, gt_D, max_topk: int,
                   metric: Metric):
    """One training batch -> per-stage (phi, U, valid) pair tensors.

    Returns three [n_stages, B, max_topk//4] arrays.
    """
    B = q.shape[0]
    nlist = arrays.nlist
    n_pairs = max_topk // 4  # trace slot granularity (IndexIVF.cpp:216)
    q_sq = sqnorms(q)
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq)
    dtb = boundary_distances(cdis, cids, arrays.interdis, metric)
    vals, ids = init_topk((B,), max_topk, metric)
    limit = jnp.full((B,), nlist, jnp.int32)

    ranks = jnp.arange(max_topk, dtype=jnp.float32)
    phis, us, valids = [], [], []
    prev = 0
    for stage in train_stages(nlist):
        vals, ids = scan_probe_range(
            arrays, q, q_sq, cids, vals, ids, limit, prev, stage - prev,
            metric)
        prev = stage
        # kscaling by distance-value match against GT (raw metric values for
        # both L2 and IP; the reference compares pre-arccos values too).
        diff = jnp.abs(vals[:, :, None] - gt_D[:, None, :])  # [B, k, k]
        tol = jnp.maximum(KSCALING_TOL,
                          KSCALING_TOL * jnp.abs(vals[:, :, None]))
        match = diff < tol
        has_match = jnp.any(match, axis=-1)
        first_gt = jnp.argmax(match, axis=-1)           # first matching rank
        u = (first_gt.astype(jnp.float32) + 1.0) / (ranks + 1.0)
        # Record only the prefix run up to the first non-match
        # (reference breaks out of the candidate loop, IndexIVF.cpp:657).
        run = jnp.cumprod(has_match.astype(jnp.int32), axis=-1) > 0
        tval = vals
        if metric is Metric.IP:
            tval = jnp.arccos(jnp.clip(vals, -1.0, 1.0))
        phi = sum_angle(tval[:, :n_pairs], dtb, stage - 1)
        phis.append(phi)
        us.append(u[:, :n_pairs])
        valids.append(run[:, :n_pairs])
    return (jnp.stack(phis), jnp.stack(us), jnp.stack(valids),
            vals, ids)


def train_profile(
    arrays: IVFArrays,
    xq: np.ndarray,        # [nq, d] training queries
    gt_D: np.ndarray,      # [nq, max_topk] GT distances (best-first)
    max_topk: int,
    metric: Metric,
    bs: int = DEFAULT_BATCH,
    n_batches: int = 10,   # reference trains in nq/10 batches
                           # (profile.cpp:109)
) -> tuple[TraceSet, list]:
    """Run the training pass and build the TraceSet.

    Also returns the raw per-stage (phi, U) pair arrays (the equivalent of
    the reference's ``Validation_<d>_<np>.log`` dumps for figure 15).
    """
    nq = xq.shape[0]
    stages = train_stages(arrays.nlist)
    batch = max(1, nq // n_batches)
    acc_phi = [[] for _ in stages]
    acc_u = [[] for _ in stages]
    acc_valid = [[] for _ in stages]
    for q0 in range(0, nq, batch):
        q1 = min(q0 + batch, nq)
        qb = np.zeros((batch, xq.shape[1]), np.float32)
        qb[: q1 - q0] = xq[q0:q1]
        gb = np.full((batch, max_topk), np.inf if metric is Metric.L2
                     else -np.inf, np.float32)
        gb[: q1 - q0] = gt_D[q0:q1, :max_topk]
        phi, u, valid, _, _ = _collect_pairs(
            arrays, jnp.asarray(qb), jnp.asarray(gb), max_topk, metric)
        phi, u, valid = (np.asarray(phi), np.asarray(u), np.asarray(valid))
        valid = valid & (np.arange(batch)[None, :, None] < (q1 - q0))
        for t in range(len(stages)):
            acc_phi[t].append(phi[t])
            acc_u[t].append(u[t])
            acc_valid[t].append(valid[t])

    raw = []
    bins = []
    for t in range(len(stages)):
        p = np.concatenate(acc_phi[t], axis=0)
        uu = np.concatenate(acc_u[t], axis=0)
        v = np.concatenate(acc_valid[t], axis=0)
        raw.append((p[v], uu[v]))
        bins.append(build_trace(p, uu, v, bs=bs))
    return make_trace_set(bins), raw
