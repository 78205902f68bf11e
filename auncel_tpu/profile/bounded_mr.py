"""Bounded wave search over the multi-row list layout.

Same decision semantics as ``profile/bounded.py`` (the TPU recast of the
reference's ``tune`` branch, IndexIVF.cpp:497-673), but the scan walks the
multi-row layout (``index/multirow.py``): each probed LIST is scanned as its
1..max_rows tightly-packed ROWS, so the per-probe gather moves ~row_cap
bytes of real data instead of ``cap`` (~3x the mean list size on skewed
k-means cells) bytes of mostly padding.

Execution model:

  * Wave boundaries stay the reference's power-of-two LIST stages. Profile
    semantics (trace index, phi window, stagnation, forced cap) are
    untouched — they are all list-unit.
  * Each query advances a private ROW FRONTIER. A wave scans ``width`` row
    slots starting at each query's own frontier (``scan_probe_range`` with
    a per-query ``start``), so no query ever re-gathers a slot and decided
    queries never gather beyond their own budget — wave width is paid in
    rows of real vectors, not in padded list capacity. This is also the
    decision-phase compaction the padded engine lacked.
  * Because row counts per list are ragged, a stage is planned as one main
    wave plus enough CATCH-UP waves to cover the worst-case row total
    (``plan_mr_waves``); ``lax.cond`` skips catch-ups nobody needs at
    runtime. A query whose rows outrun the main wave completes at a
    catch-up wave of the SAME stage and takes its decision there — same
    stage, same trace, same phi window as the padded engine, just a later
    microstep. Only its stagnation counter advances more slowly
    (bound-conservative: stagnation can only force recall=1 LATER).
  * Distance values are bitwise-identical to the padded layout (multirow
    gathers db/db_sq from it), so profiles trained through the padded
    trainer drive this engine without re-training, and GT from
    ``exact_search`` stays value-consistent.
"""

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.scan import coarse_rank, scan_probe_range
from auncel_tpu.index.multirow import MultiRowArrays, expand_probes
from auncel_tpu.ops.distance import sqnorms
from auncel_tpu.ops.topk import init_topk
from auncel_tpu.profile.geometry import (
    boundary_distances, n_boundaries)
from auncel_tpu.profile.trace import TraceSet
from auncel_tpu.profile.bounded import (
    STAGNATION_FACTOR, TRUE_RECALL_SLACK, wave_boundaries, stage_to_trace,
    _recall_estimate, exact_topk_mask)


class MRPlan(NamedTuple):
    """Static wave schedule (host-planned, hashable -> jit static arg).

    waves: ((stage, width_rows, decide, is_main), ...) — is_main marks the
    first wave of each stage group (stagnation advances list-units there).
    S: ranked list slots expanded. out_slots: row slots expanded (worst
    case over any query, so expansion never truncates).
    """
    waves: tuple
    S: int
    out_slots: int


def plan_mr_waves(rows_per_list: np.ndarray, nlist: int, decide_only: bool,
                  slack: float = 1.35, min_width: int = 8,
                  min_stage: int = 0, max_stage: int | None = None,
                  exact_cover: bool = False,
                  min_decide_stage: int = 1) -> MRPlan:
    """Plan the wave schedule from the (host-known) per-list row counts.

    Width per stage ~ slack * mean rows/list * stage-delta; catch-up waves
    per stage until the group's TOTAL width covers the worst possible row
    INCREMENT of that stage (sum of the stage-delta largest per-list row
    counts). Per-group coverage is the load-bearing guarantee: frontier
    advancement is capped at each wave's goal (min(goal, frontier+width)),
    so width left over from an earlier stage is NOT carried forward —
    coverage must hold stage by stage. Inductively every query then
    COMPLETES each stage at that stage's group, and the forced decision at
    nlist/8 (IndexIVF.cpp:619) always has a complete top-k behind it.

    ``min_stage``/``max_stage`` carve out a stage window — the decide phase
    can run stages (min_stage, max_stage] for a re-batched subset whose
    state (frontier at offsets[min_stage-1], stagnation counters) was
    carried over from the prefix run (ErrorSys's mid-decide re-batching).

    ``min_decide_stage`` COALESCES the early stages: decision boundaries
    below it are dropped, so their scan rows fold into the first kept
    stage's wave — one gather + one merge + one decide block where the
    full ladder ran one per power-of-two stage. Strictly
    bound-CONSERVATIVE: a query that would have decided at a dropped
    stage s sees its first predicate at the kept stage s' > s with an
    identical-by-construction top-k snapshot (every earlier list is
    scanned inside the coalesced wave), so it terminates later with a
    larger budget, never earlier (see
    tests/test_bounded_mr.py::test_min_decide_stage_is_conservative).
    The stagnation counter also starts later (first COMPLETE boundary is
    s'), which only delays the forced recall=1 override — the same
    conservative direction. This trades scan work on early-deciding
    queries for fewer per-wave fixed costs (exact top-k merges measured
    at 3-9 ms each at batch 1024, RESULTS_r3.md); worth it when the
    workload is merge-dominated (easy workloads, small mean probes).
    """
    rpl = np.asarray(rows_per_list, np.int64)
    desc = np.sort(rpl)[::-1]
    sum_top = np.concatenate([[0], np.cumsum(desc)])
    mean_rpl = float(rpl.mean()) if rpl.size else 1.0
    cap_stage = max(nlist // 8, 1)
    bounds = wave_boundaries(nlist)
    if decide_only:
        bounds = [b for b in bounds if b <= cap_stage]
    if max_stage is not None:
        bounds = [b for b in bounds if b <= max_stage]
    if min_decide_stage > 1 and bounds:
        # never drop the forced stage (nlist/8) or the window's last
        # bound: the reference's forced decision must run at cap_stage
        keep_from = min(int(min_decide_stage), cap_stage, bounds[-1])
        bounds = [b for b in bounds if b >= keep_from]
    S = bounds[-1] if decide_only else nlist
    out_slots = int(sum_top[min(S, nlist)])
    waves = []
    # the window's frontier starts with min_stage lists complete, so the
    # first kept stage's delta counts from there — bounds below min_stage
    # may have been coalesced away entirely (min_decide_stage), in which
    # case the skip branch below never runs to seed prev
    prev = min_stage
    for s in bounds:
        if s <= min_stage:
            prev = s
            continue
        delta = s - prev
        worst = int(sum_top[min(delta, len(desc))])  # worst stage increment
        if exact_cover:
            # ONE wave per stage, sized for the worst case: trades a
            # bounded amount of extra gather bandwidth for fewer
            # merge+decision blocks (each costs ~constant wall-clock)
            W = max(min_width, worst)
        else:
            W = max(min_width, int(np.ceil(delta * mean_rpl * slack)))
        n = max(1, -(-worst // W))
        decide = s <= cap_stage
        for j in range(n):
            waves.append((s, W, decide, j == 0))
        prev = s
    return MRPlan(tuple(waves), S, out_slots)


def plan_latency(rows_per_list: np.ndarray, nlist: int,
                 decide_stages: tuple = (4, 16, 64),
                 serve_base: int = 64) -> MRPlan:
    """Batch-1-shaped single-phase plan (round-4 VERDICT #1).

    At tiny batches the one-shot engine's strengths invert: device-side
    compaction (A2/tail sort-scatter loops), per-stage snapshots, and the
    full power-of-two decide ladder are all per-wave FIXED costs, while
    one query's scan bytes are noise (the 10M head-to-head measured the
    ladder at ~2.2x ELP's flat 256-list scan device-side,
    logs_r4/latfig10M.err, with the mean DECISION at stage ~4). This plan
    drives the plain single-phase wave engine (``bounded_search_mr``) with

      * a THINNED decide ladder: only ``decide_stages`` (+ the forced
        nlist/8 boundary, IndexIVF.cpp:619) carry the termination
        predicate. Strictly bound-conservative: a query that would have
        decided at a dropped stage s decides at the next kept stage
        s' > s with a complete snapshot — it terminates later with a
        larger budget, never earlier (same argument as
        ``min_decide_stage``; stagnation also only advances at kept
        complete boundaries, delaying the forced recall=1 override).
      * exact-cover decide waves (one gather+merge per kept stage, widths
        sized to the worst row increment so every stage completes), each
        ``lax.cond``-skipped once the batch's frontiers pass it.
      * a GEOMETRIC serve tail on the SAME probe expansion: widths
        serve_base, 2*serve_base, ... cover any decided budget up to a
        full scan; a decided query executes only the waves its own budget
        needs, so the common case (decide at stage ~4, budget ~30 lists)
        runs ~3 small waves instead of ELP's full fixed-nprobe ladder.

    Decide stages must be trained boundaries (powers of two below
    nlist/8): the termination predicate reads the per-boundary trace
    (stage_to_trace), so arbitrary stages have no profile to consult.
    """
    rpl = np.asarray(rows_per_list, np.int64)
    desc = np.sort(rpl)[::-1]
    sum_top = np.concatenate([[0], np.cumsum(desc)])
    cap_stage = max(nlist // 8, 1)
    allowed = {b for b in wave_boundaries(nlist) if b <= cap_stage}
    # stages at/above the forced cap are subsumed by it (dropped); stages
    # below it must be trained boundaries or the trace lookup would read
    # a profile that was never trained for them
    bad = [s for s in decide_stages
           if int(s) < cap_stage and int(s) not in allowed]
    if bad:
        raise ValueError(
            f"decide_stages {bad} are not trained boundaries "
            f"(powers of two below nlist/8 = {cap_stage})")
    stages = sorted({int(s) for s in decide_stages
                     if int(s) in allowed and int(s) < cap_stage})
    stages.append(cap_stage)  # the forced decision must always run
    waves = []
    prev = 0
    for s in stages:
        delta = s - prev
        W = max(8, int(sum_top[min(delta, len(desc))]))
        waves.append((s, W, True, True))
        prev = s
    total = max(int(rpl.sum()), 1)
    cum, w = 0, max(int(serve_base), 8)
    while cum < total:
        waves.append((nlist, w, False, False))
        cum += w
        w = min(w * 2, max(total - cum, 1))
    return MRPlan(tuple(waves), nlist, total)


def plan_finish_waves(rows_per_list: np.ndarray, nlist: int, w: int,
                      n_waves: int = 8, base_stage: int | None = None
                      ) -> tuple:
    """Static wave widths for the phase-B tail scan of a straggler bucket
    whose targets are <= w lists: equal widths whose sum covers the worst
    row INCREMENT beyond the decide-phase frontier (the decide phase
    completed the first ``base_stage`` ranked lists for every query it
    hands over, so at most the w - base_stage largest lists' rows
    remain)."""
    rpl = np.asarray(rows_per_list, np.int64)
    desc = np.sort(rpl)[::-1]
    base = base_stage if base_stage is not None else max(nlist // 8, 1)
    span = max(int(desc[: min(max(w - base, 1), len(desc))].sum()), 1)
    W = -(-span // n_waves)
    return tuple([W] * n_waves)


def _goal_rows(offsets: jax.Array, g: jax.Array) -> jax.Array:
    """offsets [B, S] cumulative rows per ranked-list prefix; g [B] in
    [1, S] -> rows covering each query's first g ranked lists."""
    return jnp.take_along_axis(offsets, (g - 1)[:, None], axis=1)[:, 0]


def _decide_at_stage(traces, dtb, vals, stage, nlist, query_k, max_topk,
                     std_m, metric, exact_mask=None):
    """The per-boundary termination predicate (IndexIVF.cpp:551-568):
    phi -> U -> cur_num -> predicted recall. Pure function of the sorted
    top-k snapshot after exactly `stage` lists.

    ``exact_mask`` [B] enables the EXACT-TOP-K MARGIN (round-4 VERDICT #4)
    for the marked queries: when ceil((1-eps)*k) == k the bound demands the
    exact top-k and one dropped neighbor on the worst held-out query kills
    the cell, so those queries additionally evaluate the predicate at an
    internal width of query_k + 1 and take the MINIMUM of both estimates —
    the decision then carries a one-neighbor structural margin (the served
    top-k comes from a snapshot whose (k+1)-th candidate is also predicted
    true). min() makes the margin strictly conservative: a marked query
    never terminates earlier than the unmargined engine."""
    ind = stage_to_trace(stage, nlist)
    tval = vals
    if metric is Metric.IP:
        tval = jnp.arccos(jnp.clip(vals, -1.0, 1.0))
    recall = _recall_estimate(traces, dtb, tval, ind, query_k, std_m)
    if exact_mask is not None and query_k + 1 <= max_topk:
        r2 = _recall_estimate(traces, dtb, tval, ind, query_k + 1, std_m)
        recall = jnp.where(exact_mask, jnp.minimum(recall, r2), recall)
    return recall


@functools.partial(
    jax.jit,
    static_argnames=("query_k", "max_topk", "metric", "plan",
                     "with_true_recall", "decide_margin"))
def bounded_search_mr(
    arrays,                  # IVFArrays (list-level: centroids/interdis)
    mr: MultiRowArrays,
    traces: TraceSet,
    q: jax.Array,            # [B, d]
    require_acc: jax.Array,  # [B]
    multipler: jax.Array,
    std_m: jax.Array,
    gt_kth: jax.Array,       # [B] (profile mode) or zeros
    query_k: int,
    max_topk: int,
    metric: Metric,
    plan: MRPlan,
    with_true_recall: bool = False,
    decide_margin: bool = False,
):
    """Single-phase bounded search over rows. Returns (vals, ids,
    my_nprobe [list units], n_scanned [list units], true_recall)."""
    return _mr_impl(arrays, mr, traces, q, require_acc, multipler, std_m,
                    gt_kth, query_k, max_topk, metric, plan,
                    with_true_recall, decide_only=False,
                    decide_margin=decide_margin)


@functools.partial(
    jax.jit, static_argnames=("query_k", "max_topk", "metric", "plan",
                              "decide_margin"))
def bounded_search_decide_mr(
    arrays,
    mr: MultiRowArrays,
    traces: TraceSet,
    q: jax.Array,
    require_acc: jax.Array,
    multipler: jax.Array,
    std_m: jax.Array,
    query_k: int,
    max_topk: int,
    metric: Metric,
    plan: MRPlan,
    decide_margin: bool = False,
):
    """Decision waves over the plan's stage window. Returns the full
    resumable state (vals, ids, my_nprobe, decided_at, stoped, pre_val,
    last_stage, row_frontier) plus q_sq; continue with bounded_resume_mr
    (undecided re-batch) and/or finish_scan_mr (tail scans)."""
    z = jnp.zeros(q.shape[0], jnp.float32)
    return _mr_impl(arrays, mr, traces, q, require_acc, multipler, std_m,
                    z, query_k, max_topk, metric, plan,
                    with_true_recall=False, decide_only=True,
                    decide_margin=decide_margin)


@functools.partial(
    jax.jit, static_argnames=("query_k", "max_topk", "metric", "plan",
                              "decide_margin"))
def bounded_resume_mr(
    arrays,
    mr: MultiRowArrays,
    traces: TraceSet,
    q: jax.Array,
    require_acc: jax.Array,
    multipler: jax.Array,
    std_m: jax.Array,
    state: tuple,            # the 8-tuple a decide call returned
    query_k: int,
    max_topk: int,
    metric: Metric,
    plan: MRPlan,            # stage window (min_stage, max_stage]
    decide_margin: bool = False,
):
    """Resume the decision waves for a re-batched subset: same engine, the
    carried state supplies the top-k, stagnation counters, and row
    frontier the prefix run left behind (ErrorSys's mid-decide
    re-batching, so a handful of undecided stragglers stop dragging the
    full batch through late waves)."""
    z = jnp.zeros(q.shape[0], jnp.float32)
    return _mr_impl(arrays, mr, traces, q, require_acc, multipler, std_m,
                    z, query_k, max_topk, metric, plan,
                    with_true_recall=False, decide_only=True, init=state,
                    decide_margin=decide_margin)


def _mr_impl(arrays, mr, traces, q, require_acc, multipler, std_m, gt_kth,
             query_k, max_topk, metric, plan, with_true_recall, decide_only,
             init=None, decide_margin=False):
    B = q.shape[0]
    nlist = arrays.nlist
    cap_stage = max(nlist // 8, 1)
    # Exact-top-k margin (VERDICT r4 #4): ceil(acc*k) == k <=> acc*k > k-1
    # (the 1e-4 slack absorbs f32 representation of acc = 1 - eps; a
    # false positive only makes the marked query MORE conservative).
    exact_mask = None
    if decide_margin and query_k + 1 <= max_topk:
        exact_mask = exact_topk_mask(require_acc, query_k)
    q_sq = sqnorms(q)
    rank_k = min(nlist, max(plan.S, n_boundaries(nlist) + 1))
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq, rank_k=rank_k)
    dtb = boundary_distances(cdis, cids, arrays.interdis, metric)
    row_slots, offsets = expand_probes(mr, cids, plan.S, plan.out_slots)
    safe_rows = jnp.maximum(row_slots, 0)
    if init is None:
        vals, ids = init_topk((B,), max_topk, metric)
        my_np = jnp.zeros((B,), jnp.int32)
        decided_at = jnp.zeros((B,), jnp.int32)
        stoped = jnp.zeros((B,), jnp.int32)
        pre_val = jnp.zeros((B,), jnp.float32)
        last_stage = jnp.zeros((B,), jnp.int32)  # last COMPLETE stage
        frontier = jnp.zeros((B,), jnp.int32)
    else:
        (vals, ids, my_np, decided_at, stoped, pre_val, last_stage,
         frontier) = init
    stops = jnp.floor(require_acc * STAGNATION_FACTOR).astype(jnp.int32)
    kf = float(query_k)

    def cur_goal(my_np, stage):
        """Row target right now: decided -> own budget, else this stage."""
        g = jnp.where(my_np > 0, jnp.minimum(my_np, plan.S),
                      min(stage, plan.S))
        return _goal_rows(offsets, jnp.maximum(g, 1))

    state = (vals, ids, my_np, decided_at, stoped, pre_val, last_stage,
             frontier)
    for (stage, width, decide, is_main) in plan.waves:
        is_forced = stage >= cap_stage

        def run_wave(st, stage=stage, width=width, decide=decide,
                     is_forced=is_forced):
            (vals, ids, my_np, decided_at, stoped, pre_val, last_stage,
             frontier) = st
            goal = cur_goal(my_np, stage)
            vals, ids = scan_probe_range(
                mr.rows, q, q_sq, safe_rows, vals, ids, goal, frontier,
                width, metric)
            frontier = jnp.minimum(goal, frontier + width)
            if not decide:
                return (vals, ids, my_np, decided_at, stoped, pre_val,
                        last_stage, frontier)

            # Exactly `stage` complete lists behind the top-k for these:
            complete = frontier >= offsets[:, min(stage, plan.S) - 1]
            recall = _decide_at_stage(traces, dtb, vals, stage, nlist,
                                      query_k, max_topk, std_m, metric,
                                      exact_mask)

            # Stagnation (IndexIVF.cpp:570-601). Advances by the per-query
            # list gap since the last COMPLETE boundary: the worst top-k
            # value is monotone, so "unchanged across the gap" means
            # unchanged at every list inside it — exactly the padded
            # engine's count whether completion lands on a main wave or a
            # catch-up wave of the same stage.
            max_val = vals[:, max_topk - 1]
            seen = last_stage > 0
            cmp_ok = complete & seen
            stoped = jnp.where(cmp_ok & (max_val == pre_val),
                               stoped + (stage - last_stage),
                               jnp.where(cmp_ok, 0, stoped))
            # the padded engine applies the override from the second
            # boundary on (wave_i > 0); `seen` is the same gate here
            recall = jnp.where((stoped >= stops) & seen, 1.0, recall)
            pre_val = jnp.where(complete, max_val, pre_val)
            last_stage = jnp.where(complete, stage, last_stage)

            sat = complete & (recall >= require_acc) & (my_np == 0)
            if is_forced:
                sat = sat | (complete & (my_np == 0))
            new_np = jnp.floor(stage * multipler).astype(jnp.int32)
            if is_forced:
                # The forced decision must always take effect: with a tiny
                # multipler (set_hyper allows < 8/nlist) floor(stage *
                # multipler) can be 0 for every stage, and the A2
                # compaction while-loop would spin forever on my_np == 0.
                # The CONSERVATIVE floor is a FULL scan: the reference
                # leaves my_nprobe 0 there and keeps scanning to nlist
                # (IVF_pro control flow), and the padded engine does the
                # same — flooring to 1 would terminate EARLIER than both,
                # breaking the terminate-later-never-earlier invariant.
                new_np = jnp.where(new_np > 0, new_np, nlist)
            eff = sat & (new_np > 0)
            my_np = jnp.where(eff, new_np, my_np)
            decided_at = jnp.where(eff, stage, decided_at)
            return (vals, ids, my_np, decided_at, stoped, pre_val,
                    last_stage, frontier)

        # Skip waves nobody needs: an undecided query always has rows left
        # before its next decision boundary (>= 1 row per list), so
        # frontier < goal covers the decision requirement too.
        need = jnp.any(state[7] < cur_goal(state[2], stage))
        state = jax.lax.cond(need, run_wave, lambda s: s, state)

    (vals, ids, my_np, decided_at, stoped, pre_val, last_stage,
     frontier) = state
    if decide_only:
        return state, q_sq

    n_scanned = jnp.minimum(jnp.maximum(my_np, decided_at), nlist)
    if with_true_recall:
        if metric is Metric.L2:
            cnt = jnp.sum(vals <= gt_kth[:, None] * TRUE_RECALL_SLACK,
                          axis=1)
        else:
            cnt = jnp.sum(vals >= gt_kth[:, None] * (2.0 - TRUE_RECALL_SLACK),
                          axis=1)
        # logged recall caps at 1 like the reference's (profile.cpp:246-280)
        true_recall = jnp.minimum(cnt, query_k).astype(jnp.float32) / kf
        true_recall = jnp.where(my_np >= nlist, 1.0, true_recall)
    else:
        true_recall = jnp.zeros((B,), jnp.float32)
    return vals, ids, my_np, n_scanned, true_recall


class MROneShotPlan(NamedTuple):
    """Static schedule for the single-dispatch engine."""
    a1: MRPlan        # full-batch decide waves, stages <= split
    a2: MRPlan        # compacted decide waves, stages (split, nlist/8]
    tail_widths: tuple  # row widths per compacted tail round
    split: int
    a2_cap: int       # compacted sub-batch for late decide waves
    tail_cap: int     # compacted sub-batch for tail scans
    tail_out: int     # out_slots of the full-nlist tail expansion
    # Dense-scan crossover (reference distance_compute_blas_threshold
    # analog, utils.cpp:538-622), routed PER QUERY: a query whose decided
    # budget covers >= dense_cut_rows corpus rows is served by a shared
    # masked corpus pass over a compacted sub-batch instead of private
    # row gathers — the gather ladder's exact-merge count explodes with
    # budget width (measured at 10M: forced-cap queries drag the whole
    # window, Tune10M.log), while the dense pass costs ~one corpus read +
    # a fixed merge ladder regardless of budget. Per-query routing keeps
    # results batch-invariant (a query's path depends only on its own
    # budget). dense_cut_rows < 0 disables (no dense program compiled).
    dense_cut_rows: int = -1
    dense_cap: int = 256    # compacted sub-batch for dense rounds
    mean_rpl: float = 1.0   # rows-per-list mean: list -> row unit estimate
    dense_block: int = 256  # corpus rows per dense-scan block
    dense_merge: int = 1    # dense blocks per exact top-k merge
    # Dense DECIDE phase: serve the decision ladder itself from ONE shared
    # corpus pass (index/scan.py::dense_stage_snapshots) instead of the
    # A1/A2 gather waves. Same snapshots and ladder arithmetic (decisions
    # differ only inside the dense kernel's fp-reassociation envelope,
    # like the dense tail); the win is HBM traffic — gather decide reads
    # sum-of-budgets bytes (B x nlist/8 lists worst case), dense decide
    # reads the corpus once per batch. Right when the workload's decided
    # scan fraction is high (unprunable corpora); wrong when budgets are
    # tiny (the shared pass reads rows gathers would never touch).
    dense_decide: bool = False
    decide_block: int = 128  # corpus rows per snapshot block (VMEM-sized)


def plan_oneshot(rows_per_list: np.ndarray, nlist: int, split: int = 8,
                 a2_cap: int = 64, tail_cap: int = 256,
                 slack: float = 1.35, min_width: int = 8,
                 tail_waves: int | None = None,
                 min_decide_stage: int = 1,
                 dense_cut: float | None = None,
                 dense_cap: int = 256,
                 dense_block: int = 256,
                 dense_merge: int = 1,
                 dense_decide: bool = False,
                 decide_block: int = 128) -> MROneShotPlan:
    """``dense_cut`` enables the dense-scan crossover: a query goes dense
    when its own decided row budget exceeds ``dense_cut x`` the corpus
    row count (0.0 = every query dense; None disables). ``dense_decide``
    additionally serves the decision ladder from one shared corpus pass
    (see MROneShotPlan.dense_decide)."""
    rpl = np.asarray(rows_per_list, np.int64)
    cap_stage = max(nlist // 8, 1)
    split = min(split, cap_stage)
    a1 = plan_mr_waves(rpl, nlist, True, slack, min_width, 0, split,
                       exact_cover=True,
                       min_decide_stage=min_decide_stage)
    if split < cap_stage:
        a2 = plan_mr_waves(rpl, nlist, True, slack, min_width,
                           split, cap_stage, exact_cover=True,
                           min_decide_stage=min_decide_stage)
    else:
        a2 = MRPlan((), cap_stage, int(np.sort(rpl)[::-1][
            :min(cap_stage, rpl.size)].sum()))
    n_rows = int(rpl.sum())
    if tail_waves is not None:
        W = max(1, -(-n_rows // tail_waves))
        tail = tuple([W] * tail_waves)
    else:
        # geometric tail: small stragglers execute only small waves
        # (a wave's gather cost is width * B regardless of masks)
        tail, w, cum = [], 64, 0
        while cum < n_rows:
            tail.append(w)
            cum += w
            w = min(w * 2, max(n_rows - cum, 1))
        tail = tuple(tail)
    mean_rpl = float(rpl.mean()) if rpl.size else 1.0
    cut_rows = -1 if dense_cut is None else int(dense_cut * n_rows)
    return MROneShotPlan(a1, a2, tail, split, a2_cap, tail_cap, n_rows,
                         cut_rows, dense_cap, mean_rpl, dense_block,
                         dense_merge, bool(dense_decide), decide_block)


def _dense_decide(arrays, mr, traces, q, q_sq, require_acc, multipler,
                  std_m, query_k, max_topk, metric, plan,
                  decide_margin=False):
    """Decision phase as ONE shared corpus pass + a ladder replay.

    ``dense_stage_snapshots`` computes the exact sorted top-``max_topk``
    VALUE snapshot after each decision stage; this function then replays
    the per-boundary termination predicate over those snapshots with the
    identical arithmetic the wave engine runs at each COMPLETE boundary
    (IndexIVF.cpp:551-601: phi -> U -> cur_num, stagnation by list gap,
    forced decision at nlist/8) — every stage is complete by construction
    here, exactly the exact_cover wave plans' situation. Decisions match
    the wave engine's except on queries whose predicate sits inside the
    dense kernel's fp-reassociation envelope of its threshold (~1e-7 rel,
    the same envelope the dense tail carries vs the gather tail); the
    stagnation equality test is internally consistent (each candidate's
    score is computed once per pass, so an unchanged top-k set keeps an
    exactly-unchanged max_val). Returns (my_np, decided_at).
    """
    from auncel_tpu.index.scan import dense_stage_snapshots
    B = q.shape[0]
    nlist = arrays.nlist
    cap_stage = max(nlist // 8, 1)
    # The decision ladder is the PLAN's decide boundaries (a1 + a2), not
    # the raw power-of-two grid: plan_oneshot may have coalesced early
    # stages away (min_decide_stage) or trimmed the ladder (b1_stages),
    # and the dense replay must decide at exactly the stages the gather
    # engine would — otherwise decisions/budgets diverge beyond the
    # documented fp envelope (round-4 advisor finding).
    stages = tuple(sorted({s for (s, _, dec, _) in
                           plan.a1.waves + plan.a2.waves if dec}))
    if not stages:
        stages = tuple(b for b in wave_boundaries(nlist) if b <= cap_stage)
    rank_k = min(nlist, max(cap_stage, n_boundaries(nlist) + 1))
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq, rank_k=rank_k)
    dtb = boundary_distances(cdis, cids, arrays.interdis, metric)
    # Per-list coarse rank per query; lists outside the decide window get
    # rank nlist (outside every stage bucket).
    binx = jnp.arange(B, dtype=jnp.int32)[:, None]
    win = jnp.broadcast_to(
        jnp.arange(cap_stage, dtype=jnp.int32)[None], (B, cap_stage))
    inv_rank = jnp.full((B, nlist), nlist, jnp.int32).at[
        binx, cids[:, :cap_stage]].set(win)
    snaps = dense_stage_snapshots(
        mr.rows, mr.row_list, inv_rank, q, q_sq, stages, max_topk, metric,
        plan.decide_block)

    stops = jnp.floor(require_acc * STAGNATION_FACTOR).astype(jnp.int32)
    exact_mask = None
    if decide_margin and query_k + 1 <= max_topk:
        exact_mask = exact_topk_mask(require_acc, query_k)
    my_np = jnp.zeros((B,), jnp.int32)
    decided_at = jnp.zeros((B,), jnp.int32)
    stoped = jnp.zeros((B,), jnp.int32)
    pre_val = jnp.zeros((B,), jnp.float32)
    last_stage = 0
    for si, stage in enumerate(stages):
        vals = snaps[:, si]
        recall = _decide_at_stage(traces, dtb, vals, stage, nlist,
                                  query_k, max_topk, std_m, metric,
                                  exact_mask)
        max_val = vals[:, max_topk - 1]
        seen = last_stage > 0  # python bool: every boundary is complete
        if seen:
            stoped = jnp.where(max_val == pre_val,
                               stoped + (stage - last_stage), 0)
            recall = jnp.where(stoped >= stops, 1.0, recall)
        pre_val = max_val
        last_stage = stage
        is_forced = stage >= cap_stage
        sat = (recall >= require_acc) & (my_np == 0)
        if is_forced:
            sat = sat | (my_np == 0)
        new_np = jnp.floor(stage * multipler).astype(jnp.int32)
        if is_forced:
            # conservative floor: full scan (see run_wave's forced note)
            new_np = jnp.where(new_np > 0, new_np, nlist)
        eff = sat & (new_np > 0)
        my_np = jnp.where(eff, new_np, my_np)
        decided_at = jnp.where(eff, jnp.int32(stage), decided_at)
    # A ladder whose last stage is below nlist/8 (non-power-of-two nlist)
    # has no forced boundary; the conservative floor is a full scan.
    my_np = jnp.where(my_np == 0, nlist, my_np)
    return my_np, decided_at


def _dense_rounds(arrays, mr, q, q_sq, vals, ids, pending, target,
                  max_topk, metric, plan):
    """Serve ``pending`` queries by compacted shared corpus passes: while
    any remain, sort them to the front, run one masked_full_scan over a
    ``dense_cap``-wide sub-batch, and scatter the fresh top-k back. The
    dense result REPLACES (not merges with) the phase-A running top-k:
    rank < target covers every row the decision phases scanned, so it is
    complete and duplicate-free. A query's values depend only on its own
    rows/budget — sub-batch composition cannot change results (the
    improve-gate skips a merge only when every candidate in the window
    loses to every query's current k-th, which leaves skipped queries'
    top-k bitwise unchanged)."""
    from auncel_tpu.index.scan import masked_full_scan
    nlist = arrays.nlist

    def d_cond(st):
        return jnp.any(st[2])

    def d_body(st):
        vals, ids, pend = st
        idx = jnp.argsort(~pend)[: plan.dense_cap]   # pending first
        take = pend[idx]
        subq = q[idx]
        sub_sq = q_sq[idx]
        _, cids_full = coarse_rank(arrays, subq, metric, q_sq=sub_sq)
        inv_rank = jnp.argsort(cids_full, axis=1).astype(jnp.int32)
        tgt = jnp.where(take, jnp.clip(target[idx], 1, nlist), 0)
        v, i = masked_full_scan(mr.rows, mr.row_list, inv_rank, tgt,
                                subq, sub_sq, max_topk, metric,
                                plan.dense_block, plan.dense_merge)
        vals = vals.at[idx].set(jnp.where(take[:, None], v, vals[idx]))
        ids = ids.at[idx].set(jnp.where(take[:, None], i, ids[idx]))
        return vals, ids, pend.at[idx].set(False)

    return jax.lax.while_loop(d_cond, d_body, (vals, ids, pending))


def _tail_dispatch(arrays, mr, q, q_sq, vals, ids, frontier, covered,
                   target, max_topk, metric, plan):
    """Tail scanning with the per-query dense-scan crossover: queries
    whose decided budget covers >= plan.dense_cut_rows corpus rows ride
    compacted shared passes; the rest keep the gather rounds. Both paths
    produce the exact top-k of each query's first ``target`` ranked
    lists."""
    if plan.dense_cut_rows >= 0:
        est_rows = (jnp.clip(target, 0, arrays.nlist).astype(jnp.float32)
                    * jnp.float32(plan.mean_rpl))
        sel = est_rows >= jnp.float32(plan.dense_cut_rows)
        vals, ids, _ = _dense_rounds(arrays, mr, q, q_sq, vals, ids, sel,
                                     target, max_topk, metric, plan)
        # Dense-served queries leave the gather rounds FINISHED: covered
        # = target ends their participation, and the row frontier moves
        # past every slot so that riding a later round as sorting padding
        # can never rescan (and duplicate-merge) rows their replaced
        # top-k already contains. target itself must stay >= 1
        # (_goal_rows indexes offsets at target-1).
        covered = jnp.where(sel, target, covered)
        frontier = jnp.where(sel, plan.tail_out, frontier)
    vals, ids, _, _ = _tail_rounds(arrays, mr, q, q_sq, vals, ids,
                                   frontier, covered, target,
                                   plan.tail_widths, plan.tail_cap,
                                   plan.tail_out, metric)
    return vals, ids


def _tail_rounds(arrays, mr, q, q_sq, vals, ids, frontier, covered, target,
                 tail_widths, tail_cap, tail_out, metric):
    """Compacted tail scanning: while anyone's covered list count is below
    its target, sort unfinished queries to the front, advance their row
    frontiers to their own targets over cond-skipped geometric waves, and
    scatter back. Pure scanning — shared by the bounded engine's tail and
    the latency-budget mode.

    Rounds compact by REMAINING WORK, largest first: a wave's gather
    cost is width x sub-batch regardless of masks, and the geometric
    ladder runs until the sub-batch's LARGEST goal is covered — sorting
    big-budget queries into the first round lets later rounds
    ``lax.cond``-skip most of the ladder instead of every round paying
    the batch-max ladder span (measured: unsorted compaction made the
    hard-tail rounds all worst-case)."""
    nlist = arrays.nlist

    def t_cond(st):
        return jnp.any(st[3] < target)

    def t_body(st):
        vals, ids, frontier, covered = st
        finished = covered >= target
        remaining = target - covered
        idx = jnp.argsort(finished * (2 * nlist) - remaining)[:tail_cap]
        subq = q[idx]
        sub_sq = q_sq[idx]
        cdis, cids = coarse_rank(arrays, subq, metric, q_sq=sub_sq)
        row_slots, offsets = expand_probes(mr, cids, nlist, tail_out)
        safe_rows = jnp.maximum(row_slots, 0)
        goal = _goal_rows(offsets, target[idx])
        v, i, f = vals[idx], ids[idx], frontier[idx]
        for width in tail_widths:
            def run(s, width=width):
                v, i, f = s
                v, i = scan_probe_range(mr.rows, subq, sub_sq, safe_rows,
                                        v, i, goal, f, width, metric)
                return v, i, jnp.minimum(goal, f + width)
            v, i, f = jax.lax.cond(
                jnp.any(f < goal), run, lambda s: s, (v, i, f))
        return (vals.at[idx].set(v), ids.at[idx].set(i),
                frontier.at[idx].set(f), covered.at[idx].set(target[idx]))

    return jax.lax.while_loop(t_cond, t_body,
                              (vals, ids, frontier, covered))


@functools.partial(
    jax.jit, static_argnames=("max_topk", "metric", "plan"))
def budgeted_search_mr(
    arrays,
    mr: MultiRowArrays,
    q: jax.Array,
    budget_ms: jax.Array,     # [B] per-query latency budgets
    per_probe_ms: jax.Array,  # scalar calibrated per-probe cost
    max_topk: int,
    metric: Metric,
    plan: MROneShotPlan,
):
    """Latency-budget mode over the row layout (reference time_search /
    IndexIVF.cpp:545-549 semantics; budgets convert to probe counts up
    front like profile/bounded.py::budgeted_search, scanning goes through
    the compacted tail rounds)."""
    n_budget = jnp.ceil(0.95 * budget_ms / per_probe_ms - 1.0)
    return nprobe_search_mr(arrays, mr, q, n_budget, max_topk, metric,
                            plan)


@functools.partial(
    jax.jit, static_argnames=("max_topk", "metric", "plan"))
def nprobe_search_mr(
    arrays,
    mr: MultiRowArrays,
    q: jax.Array,
    n_probes: jax.Array,      # [B] per-query EXACT probe counts
    max_topk: int,
    metric: Metric,
    plan: MROneShotPlan,
):
    """Exact per-query probe-count scan — the replay entry point the
    eval harnesses need (overhead/LAET/calibrate_time replay recorded
    ``n_scanned`` values; inverting the budget->probe ceil in float32
    is off by one for ~2% of counts, so callers pass counts directly)."""
    B = q.shape[0]
    q_sq = sqnorms(q)
    n_probes = jnp.clip(n_probes, 1, arrays.nlist).astype(jnp.int32)
    vals, ids = init_topk((B,), max_topk, metric)
    frontier = jnp.zeros((B,), jnp.int32)
    covered = jnp.zeros((B,), jnp.int32)
    vals, ids = _tail_dispatch(
        arrays, mr, q, q_sq, vals, ids, frontier, covered, n_probes,
        max_topk, metric, plan)
    return vals, ids, n_probes


@functools.partial(
    jax.jit,
    static_argnames=("query_k", "max_topk", "metric", "plan",
                     "with_true_recall", "decide_margin"))
def bounded_oneshot_mr(
    arrays,
    mr: MultiRowArrays,
    traces: TraceSet,
    q: jax.Array,
    require_acc: jax.Array,
    multipler: jax.Array,
    std_m: jax.Array,
    gt_kth: jax.Array,
    query_k: int,
    max_topk: int,
    metric: Metric,
    plan: MROneShotPlan,
    with_true_recall: bool = False,
    decide_margin: bool = False,
):
    """The production bounded search: ONE dispatch, ONE fetch, with
    DEVICE-SIDE batch compaction replacing the host-orchestrated phases.

      A1   decision waves for stages <= split, full batch (where nearly
           all queries decide).
      A2   a lax.while_loop: sort undecided queries to the front, run the
           remaining decision stages on an a2_cap-wide sub-batch, scatter
           the state back; repeats only while anyone is undecided.
      tail a lax.while_loop: compact queries whose decided budget exceeds
           what they scanned into tail_cap-wide sub-batches and advance
           their row frontiers to their own targets.

    Decisions are bit-identical to bounded_search_mr / the padded engine
    (same stages, traces, stagnation bookkeeping — the state just travels
    through gathers/scatters between phases).
    """
    B = q.shape[0]
    nlist = arrays.nlist
    cap_stage = max(nlist // 8, 1)
    z = jnp.zeros((B,), jnp.float32)

    if plan.dense_decide:
        # Decide phase from ONE shared corpus pass (same ladder
        # arithmetic; decisions can differ from the gather waves only
        # inside the dense kernel's fp envelope — see _dense_decide); the
        # serve phase then runs from a fresh top-k over each query's
        # whole budget — the same candidate set (first `target` ranked
        # lists), so the final top-k matches the budgets' exact answer.
        q_sq = sqnorms(q)
        my_np, decided_at = _dense_decide(
            arrays, mr, traces, q, q_sq, require_acc, multipler, std_m,
            query_k, max_topk, metric, plan, decide_margin)
        target = jnp.clip(jnp.maximum(my_np, decided_at), 1, nlist)
        vals, ids = init_topk((B,), max_topk, metric)
        vals, ids = _tail_dispatch(
            arrays, mr, q, q_sq, vals, ids,
            jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
            target, max_topk, metric, plan)
        if with_true_recall:
            if metric is Metric.L2:
                cnt = jnp.sum(vals <= gt_kth[:, None] * TRUE_RECALL_SLACK,
                              axis=1)
            else:
                cnt = jnp.sum(
                    vals >= gt_kth[:, None] * (2.0 - TRUE_RECALL_SLACK),
                    axis=1)
            true_recall = (jnp.minimum(cnt, query_k).astype(jnp.float32)
                           / float(query_k))
            true_recall = jnp.where(my_np >= nlist, 1.0, true_recall)
        else:
            true_recall = jnp.zeros((B,), jnp.float32)
        return vals, ids, my_np, target, true_recall

    state, q_sq = _mr_impl(arrays, mr, traces, q, require_acc, multipler,
                           std_m, z, query_k, max_topk, metric, plan.a1,
                           False, decide_only=True,
                           decide_margin=decide_margin)

    if plan.a2.waves:
        # Adaptive: when MOST of the batch is still undecided after A1
        # (hard-tail workloads), compacting to a2_cap-query sub-batches
        # multiplies the per-wave fixed costs by ceil(B/a2_cap) for the
        # same gather volume — run the A2 waves once FULL-BATCH first;
        # the compacted loop then mops up only the true stragglers.
        def a2_full(st):
            out, _ = _mr_impl(
                arrays, mr, traces, q, require_acc, multipler, std_m, z,
                query_k, max_topk, metric, plan.a2, False,
                decide_only=True, init=st, decide_margin=decide_margin)
            return out

        state = jax.lax.cond(jnp.sum(state[2] == 0) > B // 2, a2_full,
                             lambda s: s, state)

        def a2_cond(st):
            return jnp.any(st[2] == 0)

        def a2_body(st):
            idx = jnp.argsort(st[2] != 0)[: plan.a2_cap]  # undecided first
            sub = tuple(x[idx] for x in st)
            zs = jnp.zeros((plan.a2_cap,), jnp.float32)
            sub_out, _ = _mr_impl(
                arrays, mr, traces, q[idx], require_acc[idx], multipler,
                std_m, zs, query_k, max_topk, metric, plan.a2, False,
                decide_only=True, init=sub, decide_margin=decide_margin)
            return tuple(x.at[idx].set(y) for x, y in zip(st, sub_out))

        state = jax.lax.while_loop(a2_cond, a2_body, state)

    vals, ids, my_np, decided_at, _, _, _, frontier = state
    target = jnp.clip(jnp.maximum(my_np, decided_at), 1, nlist)
    # lists certainly covered: decided in A1 -> min(my_np, split); via A2
    # -> min(my_np, nlist/8). (A conservative floor — a query that rode an
    # A2 round as sorting padding may be further along; its tail round
    # then scans nothing.)
    covered = jnp.minimum(
        target, jnp.where(decided_at <= plan.split, plan.split, cap_stage))
    vals, ids = _tail_dispatch(
        arrays, mr, q, q_sq, vals, ids, frontier, covered, target,
        max_topk, metric, plan)

    if with_true_recall:
        if metric is Metric.L2:
            cnt = jnp.sum(vals <= gt_kth[:, None] * TRUE_RECALL_SLACK,
                          axis=1)
        else:
            cnt = jnp.sum(vals >= gt_kth[:, None] * (2.0 - TRUE_RECALL_SLACK),
                          axis=1)
        true_recall = (jnp.minimum(cnt, query_k).astype(jnp.float32)
                       / float(query_k))
        true_recall = jnp.where(my_np >= nlist, 1.0, true_recall)
    else:
        true_recall = jnp.zeros((B,), jnp.float32)
    return vals, ids, my_np, target, true_recall


@functools.partial(
    jax.jit, static_argnames=("w", "out_slots", "widths", "metric"))
def finish_scan_mr(
    arrays,
    mr: MultiRowArrays,
    q: jax.Array,
    q_sq: jax.Array,
    vals: jax.Array,
    ids: jax.Array,
    my_np: jax.Array,        # [B] decided list budgets (<= w by bucketing)
    frontier: jax.Array,     # [B] rows already scanned in phase A
    w: int,                  # static list-count ceiling of this bucket
    out_slots: int,          # static worst-case rows for w lists
    widths: tuple,           # static per-wave row widths (plan_finish_waves)
    metric: Metric,
):
    """Phase B: complete each straggler's own row budget. Re-ranks the full
    centroid set for this subset (exact top-k prefixes agree with phase
    A's prefix ranking, so frontiers line up); each wave advances per-query
    frontiers, ``lax.cond``-skipped once everyone is done."""
    cdis, cids = coarse_rank(arrays, q, metric, q_sq=q_sq)
    row_slots, offsets = expand_probes(mr, cids, w, out_slots)
    safe_rows = jnp.maximum(row_slots, 0)
    g = jnp.clip(my_np, 1, w)
    goal = _goal_rows(offsets, g)

    state = (vals, ids, frontier)
    for width in widths:
        def run(st, width=width):
            v, i, f = st
            v, i = scan_probe_range(
                mr.rows, q, q_sq, safe_rows, v, i, goal, f, width, metric)
            return v, i, jnp.minimum(goal, f + width)
        need = jnp.any(state[2] < goal)
        state = jax.lax.cond(need, run, lambda s: s, state)
    return state
