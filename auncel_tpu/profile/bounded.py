"""Online error-bounded search: wave execution with masked termination.

This is the TPU recast of the reference's ``tune`` branch of
``IndexIVF::search_preassigned`` (IndexIVF.cpp:497-673) — the reason the
system exists. The reference runs, per query, a sequential probe loop that
after *every* list sorts the current top-k, predicts how many candidates are
already true top-k (``cur_num``), applies a stagnation heuristic, and breaks
when the prediction satisfies the per-query bound (times a calibration
multiplier).

TPU-first redesign (SURVEY.md §7): probes are scanned in *waves* whose
boundaries are the power-of-two trace stages (1, 2, ..., nlist/8) followed
by scan-only waves up to nlist. The termination predicate is evaluated
batch-wide at wave boundaries with masks instead of per-query breaks:

  * a query that decides my_nprobe = stage * multipler keeps scanning only
    list slots < my_nprobe (the ``limit`` mask of scan_probe_range) — the
    same lists the reference would scan;
  * a wave whose work no active query needs is skipped at runtime via
    ``lax.cond`` (one compiled program, data-dependent skipping);
  * everything — coarse ranking, boundary geometry, scans, predicate,
    decisions — is ONE jit per (batch, query_k) configuration, so a search
    costs one dispatch regardless of how many waves run.

Known, deliberate deviations from the reference (all bound-conservative):
  * decisions happen at wave boundaries, not after every list — a query can
    only terminate *later* than the reference would, never earlier;
  * the stagnation counter advances by whole waves (the top-k worst value is
    monotone, so "unchanged across a wave" == "unchanged at every list in
    it"); intermediate trigger points inside a wave are detected one
    boundary late.
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
from auncel_tpu.profile.trace import TraceSet, trace_lookup
from auncel_tpu.profile.trainer import train_stages

# Slack factors lifted from the reference decision logic.
FULL_OK_SLACK = 1.005      # cur_num's all-k fast path (IVF_pro.cpp:276)
TRUE_RECALL_SLACK = 1.0005  # profile-mode true-recall count (IndexIVF.cpp:584)
STAGNATION_FACTOR = 12.0   # stops = require_acc * 12 (IndexIVF.cpp:575)


def wave_boundaries(nlist: int) -> list[int]:
    """Decision boundaries (powers of two to nlist/8) + scan-only boundaries
    (steps of nlist/8 up to nlist)."""
    bounds = train_stages(nlist)
    step = max(nlist // 8, 1)
    b = bounds[-1] + step
    while b <= nlist:
        bounds.append(b)
        b += step
    return bounds


def stage_to_trace(stage: int, nlist: int) -> int:
    """Map a probe stage to its trace index: smallest ind with
    2^ind >= min(stage, nlist/8 - 1) (IndexIVF.cpp:555-558)."""
    tmp = min(stage, nlist // 8 - 1)
    ind = 0
    while tmp > (1 << ind):
        ind += 1
    return ind


def _simulate_cur_num(p: jax.Array, first_ok: jax.Array,
                      query_k: int) -> jax.Array:
    """Vectorized replay of the reference's binary search over candidate
    ranks (``error_pro::cur_num``, IVF_pro.cpp:258-291). ``p[b, m]`` is the
    predicate (m+1) * U(phi(D_m)) <= query_k. The predicate is not
    guaranteed monotone, so we replicate the exact binary-search result
    rather than a count."""
    B = p.shape[0]
    low = jnp.zeros((B,), jnp.int32)
    high = jnp.full((B,), query_k - 1, jnp.int32)
    done = first_ok
    result = jnp.where(first_ok, query_k, 0)

    def body(_, st):
        low, high, done, result = st
        active = (~done) & (low <= high)
        middle = (low + high) // 2
        ret0 = active & (middle <= 0)
        result = jnp.where(ret0, 0, result)
        done = done | ret0
        pm = jnp.take_along_axis(
            p, jnp.clip(middle, 0, query_k - 1)[:, None], axis=1)[:, 0]
        go = active & (~ret0)
        low = jnp.where(go & pm, middle + 1, low)
        high = jnp.where(go & (~pm), middle - 1, high)
        return low, high, done, result

    # enough iterations to exhaust [0, query_k-1] for ANY query_k (10 was
    # a silent truncation past k=512: the unexecuted iterations made the
    # fallback under-report cur_num — conservative, but a divergence from
    # the reference replay). UNROLLED python loop, not lax.fori_loop: the
    # body is ~6 tiny elementwise ops, and fori_loop's iteration barrier
    # blocked XLA from fusing them — measured ~2 ms per decision block at
    # batch 1 through sequential kernel launches (logs_r5/latB1b.err);
    # unrolled, the whole search fuses into a handful of kernels.
    n_iter = max(int(np.ceil(np.log2(max(query_k, 2)))) + 1, 10)
    st = (low, high, done, result)
    for i in range(n_iter):
        st = body(i, st)
    low, high, done, result = st
    return jnp.where(done, result, low + 1)


def _recall_estimate(traces, dtb, tval, ind, k, std_m):
    """phi -> U -> cur_num -> predicted recall at width ``k`` (the
    reference's per-boundary estimate, IVF_pro.cpp:258-291). Shared by the
    padded and multirow engines (and the k+1 exact-top-k margin)."""
    kf = float(k)
    mrange = jnp.arange(1, k + 1, dtype=jnp.float32)[None, :]
    phi = sum_angle(tval[:, :k], dtb, (1 << ind) - 1)
    U = trace_lookup(traces, ind, phi, std_m)
    p = (mrange * U) <= kf
    first_ok = kf * U[:, k - 1] <= kf * FULL_OK_SLACK
    pre_num = _simulate_cur_num(p, first_ok, k)
    return pre_num.astype(jnp.float32) / kf


def exact_topk_mask(require_acc, query_k: int):
    """Queries whose bound demands the exact top-k: ceil(acc*k) == k <=>
    acc*k > k-1 (the 1e-4 slack absorbs the f32 representation of
    acc = 1 - eps; a false positive only makes the query MORE
    conservative)."""
    return require_acc * float(query_k) > float(query_k) - 1.0 + 1e-4


@functools.partial(
    jax.jit, static_argnames=("query_k", "max_topk", "metric",
                              "decide_margin"))
def bounded_search_decide(
    arrays: IVFArrays,
    traces: TraceSet,
    q: jax.Array,
    require_acc: jax.Array,
    multipler: jax.Array,
    std_m: jax.Array,
    query_k: int,
    max_topk: int,
    metric: Metric,
    decide_margin: bool = False,
):
    """Phase A of the two-phase throughput path: run only the decision
    waves (stages 1..nlist/8). Returns (vals, ids, my_nprobe, decided_at,
    cids, q_sq) — phase B (finish_scan) completes each query's own probe
    budget on right-sized query buckets, so one straggler no longer drags
    the whole batch through masked full-width waves."""
    return _bounded_waves(arrays, traces, q, require_acc, multipler, std_m,
                          query_k, max_topk, metric, decide_only=True,
                          decide_margin=decide_margin)


@functools.partial(
    jax.jit, static_argnames=("query_k", "max_topk", "metric"))
def bounded_search_decide_ranked(
    arrays: IVFArrays,
    traces: TraceSet,
    q: jax.Array,
    require_acc: jax.Array,
    multipler: jax.Array,
    std_m: jax.Array,
    cdis: jax.Array,        # [B, rank_k] coarse distances (true ranking)
    cids: jax.Array,        # [B, rank_k] TRUE list ids (geometry)
    scan_slots: jax.Array,  # [B, rank_k] block ids into arrays.db (paged)
    query_k: int,
    max_topk: int,
    metric: Metric,
):
    """Decision phase over an EXTERNALLY ranked and remapped probe set —
    the on-disk path (reference OnDiskInvertedLists plugging transparently
    into the tune branch of search_preassigned, OnDiskInvertedLists.h:51 +
    IndexIVF.cpp:497-673): ``arrays.db`` holds only the paged decision
    lists; ``scan_slots`` maps ranked probe slots to uploaded blocks while
    centroid geometry keeps true list ids. Decisions (my_nprobe) and
    result ids match the resident padded engine exactly; distance values
    agree within the 1e-5 value-consistency band (block-shape reduce-order
    noise)."""
    return _bounded_impl(arrays, traces, q, require_acc, multipler, std_m,
                         jnp.zeros(q.shape[0], jnp.float32), query_k,
                         max_topk, metric, False, decide_only=True,
                         ranked=(cdis, cids, scan_slots))


@functools.partial(
    jax.jit, static_argnames=("start", "width", "metric"))
def finish_scan(
    arrays: IVFArrays,
    q: jax.Array,
    q_sq: jax.Array,
    vals: jax.Array,
    ids: jax.Array,
    my_np: jax.Array,
    start: int,
    width: int,
    metric: Metric,
):
    """Phase B: scan probe slots [start, start+width) with per-query limit
    my_np (mask semantics identical to the reference's break at
    stage >= my_nprobe). Re-ranks the full centroid set for this straggler
    subset (phase A only ranked the decision prefix); exact top-k prefixes
    agree, so the already-scanned slots line up."""
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq)
    return scan_probe_range(arrays, q, q_sq, cids, vals, ids, my_np,
                            start, width, metric)


def _bounded_waves(arrays, traces, q, require_acc, multipler, std_m,
                   query_k, max_topk, metric, decide_only=False,
                   gt_kth=None, with_true_recall=False,
                   decide_margin=False):
    """Shared wave-loop body for bounded_search / bounded_search_decide."""
    return _bounded_impl(arrays, traces, q, require_acc, multipler, std_m,
                         gt_kth if gt_kth is not None
                         else jnp.zeros(q.shape[0], jnp.float32),
                         query_k, max_topk, metric, with_true_recall,
                         decide_only, decide_margin=decide_margin)


@functools.partial(
    jax.jit,
    static_argnames=("query_k", "max_topk", "metric", "with_true_recall",
                     "decide_margin"))
def bounded_search(
    arrays: IVFArrays,
    traces: TraceSet,
    q: jax.Array,            # [B, d]
    require_acc: jax.Array,  # [B] per-query required recall in (0, 1]
    multipler: jax.Array,    # scalar calibration (hyperparameter.txt col 1)
    std_m: jax.Array,        # scalar conservativeness (col 2)
    gt_kth: jax.Array,       # [B] GT k-th distance (profile mode) or zeros
    query_k: int,            # user top-k (set_topk)
    max_topk: int,           # profile depth (heap size, == GT depth)
    metric: Metric,
    with_true_recall: bool = False,
    decide_margin: bool = False,
):
    """Returns (vals [B, max_topk], ids, my_nprobe [B], n_scanned [B],
    true_recall [B])."""
    return _bounded_impl(arrays, traces, q, require_acc, multipler, std_m,
                         gt_kth, query_k, max_topk, metric,
                         with_true_recall, decide_only=False,
                         decide_margin=decide_margin)


def _bounded_impl(arrays, traces, q, require_acc, multipler, std_m, gt_kth,
                  query_k, max_topk, metric, with_true_recall, decide_only,
                  ranked=None, decide_margin=False):
    from auncel_tpu.profile.geometry import n_boundaries
    B = q.shape[0]
    nlist = arrays.nlist
    q_sq = sqnorms(q)
    if ranked is None:
        # Decide-only needs the ranking prefix only: nlist/8 probe slots +
        # the boundary window; the full nlist-wide sort is deferred to the
        # phase-B straggler subset (ErrorSys computes it for those rows
        # alone).
        rank_k = min(nlist, n_boundaries(nlist) + 1) if decide_only else \
            nlist
        rank_k = max(rank_k, min(nlist, nlist // 8))
        cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq,
                                 rank_k=rank_k)
        scan_slots = cids
    else:
        # Externally ranked + remapped probes (the on-disk path):
        # ``cids`` stay true list ids (boundary geometry needs them),
        # ``scan_slots`` index the paged blocks in ``arrays.db``.
        cdis, cids, scan_slots = ranked
    dtb = boundary_distances(cdis, cids, arrays.interdis, metric)
    vals, ids = init_topk((B,), max_topk, metric)

    my_np = jnp.zeros((B,), jnp.int32)       # 0 = undecided
    decided_at = jnp.zeros((B,), jnp.int32)
    stoped = jnp.zeros((B,), jnp.int32)
    pre_val = jnp.zeros((B,), jnp.float32)
    stops = jnp.floor(require_acc * STAGNATION_FACTOR).astype(jnp.int32)
    kf = float(query_k)
    exact_mask = None
    if decide_margin and query_k + 1 <= max_topk:
        exact_mask = exact_topk_mask(require_acc, query_k)

    state = (vals, ids, my_np, decided_at, stoped, pre_val)
    prev = 0
    boundaries = wave_boundaries(nlist)
    if decide_only:
        boundaries = [b for b in boundaries if b <= nlist // 8]
    for wave_i, stage in enumerate(boundaries):
        width = stage - prev
        is_decision = stage <= nlist // 8
        is_forced = stage >= nlist // 8  # forced decision (IndexIVF.cpp:619)

        def run_wave(st, prev=prev, stage=stage, width=width,
                     is_decision=is_decision, is_forced=is_forced,
                     wave_i=wave_i):
            vals, ids, my_np, decided_at, stoped, pre_val = st
            limit = jnp.where(my_np > 0, my_np, nlist)
            vals, ids = scan_probe_range(
                arrays, q, q_sq, scan_slots, vals, ids, limit, prev, width,
                metric)
            if not is_decision:
                return vals, ids, my_np, decided_at, stoped, pre_val

            ind = stage_to_trace(stage, nlist)
            tval = vals
            if metric is Metric.IP:
                tval = jnp.arccos(jnp.clip(vals, -1.0, 1.0))
            recall = _recall_estimate(traces, dtb, tval, ind, query_k,
                                      std_m)
            if exact_mask is not None:
                # k+1 exact-top-k margin (VERDICT r4 #4) — min() keeps the
                # marked query strictly conservative vs the base predicate
                r2 = _recall_estimate(traces, dtb, tval, ind, query_k + 1,
                                      std_m)
                recall = jnp.where(exact_mask, jnp.minimum(recall, r2),
                                   recall)

            max_val = vals[:, max_topk - 1]  # worst of the running top-k
            if wave_i > 0:
                same = max_val == pre_val
                stoped = jnp.where(same, stoped + width, 0)
                recall = jnp.where(stoped >= stops, 1.0, recall)
            pre_val = max_val

            sat = (recall >= require_acc) & (my_np == 0)
            if is_forced:
                sat = sat | (my_np == 0)
            new_np = jnp.floor(stage * multipler).astype(jnp.int32)
            eff = sat & (new_np > 0)
            my_np = jnp.where(eff, new_np, my_np)
            decided_at = jnp.where(eff, stage, decided_at)
            return vals, ids, my_np, decided_at, stoped, pre_val

        # Skip the whole wave once no query needs lists beyond `prev`.
        need = jnp.any((state[2] == 0) | (state[2] > prev))
        state = jax.lax.cond(need, run_wave, lambda s: s, state)
        prev = stage

    vals, ids, my_np, decided_at, stoped, pre_val = state
    n_scanned = jnp.minimum(jnp.maximum(my_np, decided_at), nlist)
    if decide_only:
        return vals, ids, my_np, decided_at, cids, q_sq

    if with_true_recall:
        # Reference profile mode (IndexIVF.cpp:578-588,624-627): count heap
        # entries within the GT k-th distance. The raw count runs over the
        # max_topk-wide heap and can exceed query_k (ties/slack); the
        # reference's logged recall caps at 1 (profile.cpp:246-280), so
        # clamp — satisfaction math is unaffected (cnt > k already meant
        # true recall 1.0).
        if metric is Metric.L2:
            cnt = jnp.sum(vals <= gt_kth[:, None] * TRUE_RECALL_SLACK,
                          axis=1)
        else:
            cnt = jnp.sum(
                vals >= gt_kth[:, None] * (2.0 - TRUE_RECALL_SLACK), axis=1)
        true_recall = jnp.minimum(cnt, query_k).astype(jnp.float32) / kf
        true_recall = jnp.where(my_np >= nlist, 1.0, true_recall)
    else:
        true_recall = jnp.zeros((B,), jnp.float32)
    return vals, ids, my_np, n_scanned, true_recall


@functools.partial(jax.jit, static_argnames=("max_topk", "metric"))
def budgeted_search(
    arrays: IVFArrays,
    q: jax.Array,            # [B, d]
    budget_ms: jax.Array,    # [B] per-query latency budgets
    per_probe_ms: jax.Array,  # scalar: calibrated cost of one probe
    max_topk: int,
    metric: Metric,
):
    """Latency-budget mode (reference ``time_search`` /
    IndexIVF.cpp:545-549: break when elapsed >= 0.95*budget - avg_probe).

    Mid-kernel wall clocks don't exist under XLA, so the budget is converted
    *up front* to a per-query probe count with a calibrated per-probe cost
    model: n = max(1, ceil(0.95 * budget / t - 1)) — the same stopping stage
    the reference's inequality yields for constant per-probe time t.
    """
    n_budget = jnp.ceil(0.95 * budget_ms / per_probe_ms - 1.0)
    return nprobe_search(arrays, q, n_budget, max_topk, metric)


@functools.partial(jax.jit, static_argnames=("max_topk", "metric"))
def nprobe_search(
    arrays: IVFArrays,
    q: jax.Array,           # [B, d]
    n_probes: jax.Array,    # [B] per-query EXACT probe counts
    max_topk: int,
    metric: Metric,
):
    """Exact per-query probe-count scan (replay entry point — see
    bounded_mr.nprobe_search_mr for why callers must not round-trip
    counts through the float budget model)."""
    B = q.shape[0]
    nlist = arrays.nlist
    q_sq = sqnorms(q)
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq)
    vals, ids = init_topk((B,), max_topk, metric)
    n_budget = jnp.clip(n_probes, 1, nlist).astype(jnp.int32)

    state = (vals, ids)
    prev = 0
    for stage in wave_boundaries(nlist):
        def run_wave(st, prev=prev, stage=stage):
            v, i = st
            return scan_probe_range(arrays, q, q_sq, cids, v, i, n_budget,
                                    prev, stage - prev, metric)
        need = jnp.any(n_budget > prev)
        state = jax.lax.cond(need, run_wave, lambda s: s, state)
        prev = stage
    vals, ids = state
    return vals, ids, n_budget
