"""User-facing error-bounded search system.

Capability parity with the reference's ``Error_sys``
(``/root/reference/Auncel/profile.{h,cpp}``): holds the ground truth, drives
offline profile training (``sys_train``), binds online queries with their
per-query required accuracies (``set_queries``), and runs bounded
(``search``) or latency-budgeted (``time_search``) searches, recording the
per-query chosen probe counts (``my_nprobe``) and achieved recalls
(``t_recalls``).

Differences by design:
  * searches are batched (any slice of the bound queries in one call);
    the reference is one query per call in its eval loop;
  * trained profiles can be saved/loaded (the reference retrains per run);
  * ``calibrate`` auto-tunes (multipler, std_m) on held-out queries instead
    of the reference's hand-maintained hyperparameter.txt (which is also
    supported via ``setparam``).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.profile import hyper
from auncel_tpu.profile.trainer import train_profile
from auncel_tpu.profile.trace import (
    TraceSet, save_trace_set, load_trace_set)
from auncel_tpu.profile.bounded import (
    bounded_search, bounded_search_decide, finish_scan, budgeted_search,
    nprobe_search)
from auncel_tpu.profile.bounded_mr import (
    bounded_oneshot_mr, budgeted_search_mr, nprobe_search_mr,
    plan_oneshot)


@functools.partial(
    jax.jit,
    static_argnames=("bsz", "query_k", "max_topk", "metric", "plan",
                     "with_true_recall"))
def _oneshot_window(arrays, mr, traces, q_all, acc_all, gtk_all,
                    multipler, std_m, start, size, bsz, query_k, max_topk,
                    metric, plan, with_true_recall):
    """Device-side window extraction + bounded search + result narrowing:
    the query/bound arrays live on device across calls (uploaded once at
    set_queries, padded by a bucket so slices never clamp), and only
    [bsz, query_k] results come back — transfers through the ~30 MB/s
    tunnel are otherwise the batch bottleneck. ``start``/``size`` are
    traced: one compiled program per batch bucket."""
    d = q_all.shape[1]
    mask = jnp.arange(bsz, dtype=jnp.int32) < size
    q = jax.lax.dynamic_slice(q_all, (start, 0), (bsz, d)) * mask[:, None]
    acc = jnp.where(mask, jax.lax.dynamic_slice_in_dim(
        acc_all, start, bsz, 0), 1e-3)  # padding decides at the 2nd wave
    gtk = jnp.where(mask, jax.lax.dynamic_slice_in_dim(
        gtk_all, start, bsz, 0), 0.0)
    vals, ids, my_np, n_scanned, t_rec = bounded_oneshot_mr(
        arrays, mr, traces, q, acc, multipler, std_m, gtk, query_k,
        max_topk, metric, plan, with_true_recall)
    return (vals[:, :query_k], ids[:, :query_k], my_np, n_scanned, t_rec)


class ErrorSys:
    def __init__(self, index: IVFFlatIndex, train_num: int, max_topk: int):
        if train_num % 10 != 0:
            # reference requires nq % 10 == 0 (profile.cpp:30-31)
            raise ValueError("train_num must be divisible by 10")
        if not isinstance(index, IVFFlatIndex):
            raise TypeError("ErrorSys requires an IVFFlatIndex "
                            "(reference supports key == 'IVF' only)")
        if index.is_trained:
            index.ensure_interdis()  # boundary geometry needs the matrix
        self.index = index
        self.train_num = train_num
        self.max_topk = max_topk
        self.is_trained = False
        self.traces: TraceSet | None = None
        self.raw_pairs = None          # per-stage (phi, U) for validation maps
        self.multipler = hyper.DEFAULT_MULTIPLER
        self.std_m = hyper.DEFAULT_STD_M
        self.profile = False           # record t_recalls (effect_error mode)
        self.query_topk = max_topk
        self.per_probe_ms: float | None = None
        # Coalesce decision stages below this (plan_mr_waves
        # min_decide_stage): 1 = the reference's full power-of-two ladder;
        # 4 folds stages 1-2 into one wide wave — fewer merge+decide
        # blocks per window, strictly bound-conservative (decisions land
        # at the same or a later stage with the same snapshot). A perf
        # knob for merge-dominated (easy) workloads.
        self.min_decide_stage = 1
        # Dense-scan crossover threshold (None disables; 0.0 = always): a
        # query whose decided budget covers >= this fraction of the
        # corpus rows is served by a shared masked corpus pass instead of
        # private row gathers (the reference's
        # distance_compute_blas_threshold switch, utils.cpp:538-622,
        # recast per query — forced-cap/unprunable queries whose gather
        # ladders are merge-bound). Routing is per query, so results stay
        # batch-invariant.
        self.dense_cut: float | None = 0.25
        # Dense DECIDE phase (bounded_mr.MROneShotPlan.dense_decide):
        # serve the decision ladder itself from one shared corpus pass.
        # Same ladder arithmetic as the gather waves (decisions differ
        # only inside the dense kernel's fp envelope); the trade is HBM
        # traffic (one corpus read per batch vs sum-of-budgets gathers),
        # so it wins exactly when the workload's decided scan fraction is
        # high (unprunable corpora) and loses when budgets are tiny. Off
        # by default; flip per workload (scripts/xover10M measures both)
        # or let calibrate()'s measured mean scan set it.
        self.dense_decide: bool = False
        # Batch-amortized auto-routing (the batch-global analog of the
        # reference's distance_compute_blas_threshold, utils.cpp:538-622):
        # one shared corpus pass costs ~flat wall-clock per WINDOW while
        # per-query gathers scale with the decided budgets, so dense
        # serving wins on big windows of scan-heavy workloads even though
        # no single query crosses dense_cut. A byte-ratio rule is WRONG
        # across scales (measured: at 10M the dense window costs ~5 s —
        # ~50x its HBM bytes, merge-ladder bound — crossing gather only
        # at mean scan ~77/1024, while at 1M dense wins already at ~75;
        # Tune10M.log + logs_r4/dense10M), so calibrate() MEASURES the
        # crossover: it times one gather window vs one dense window at
        # the calibrated config and derives the minimum window size where
        # dense wins (dense cost is ~window-size-flat, gather ~linear).
        # Routing contract: ids equal for the same budgets; VALUES agree
        # within the dense kernel's fp-reassociation envelope (~1e-7 rel,
        # tests assert 1e-5 — test_dense_xover), so a flipped window can
        # move a query's returned distances within that envelope. B=1
        # latency windows never flip.
        self.dense_auto: bool = True
        self._cal_mean_scan: float | None = None
        self._dense_min_bsz: int | None = None
        # Extra plan_oneshot kwargs (a2_cap, tail_cap, split, ...): the
        # plan constants were tuned at 1M; corpora with very different
        # rows-per-list profiles (10M: ~39 rows/list) may want wider
        # compaction sub-batches (scripts/tune10M.py sweeps these).
        self.plan_overrides: dict = {}
        self.gt_D: np.ndarray | None = None
        self.gt_I: np.ndarray | None = None
        # online state (set_queries)
        self.queries: np.ndarray | None = None
        self.require_acc: np.ndarray | None = None
        self.my_nprobe: np.ndarray | None = None
        self.n_scanned: np.ndarray | None = None
        self.t_recalls: np.ndarray | None = None
        self._dev_cache = None

    # ------------------------------------------------------------ offline

    def set_gt(self, gt_D: np.ndarray, gt_I: np.ndarray) -> None:
        gt_D = np.asarray(gt_D, np.float32)
        gt_I = np.asarray(gt_I, np.int64)
        assert gt_D.shape[1] >= self.max_topk
        self.gt_D = gt_D[:, : self.max_topk].copy()
        self.gt_I = gt_I[:, : self.max_topk].copy()
        self._dev_cache = None

    def sys_train(self, nq: int, xq: np.ndarray, bs: int = 250) -> None:
        """Train the phi->U maps on the first ``nq`` queries
        (reference sys_train, profile.cpp:88-171). ``bs=1`` gives the
        validation-mode raw maps (reference README.md:40-41)."""
        assert self.gt_D is not None, "set_gt before sys_train"
        assert nq <= self.train_num
        # the boundary geometry needs the real inter-centroid matrix even
        # if the index was trained AFTER this ErrorSys was constructed
        # (lazy for nlist > INTERDIS_EAGER_MAX: the packed placeholder is
        # [1,1] zeros, which would crash sum_angle deep inside jit)
        self.index.ensure_interdis()
        xq = np.asarray(xq, np.float32)
        self.traces, self.raw_pairs = train_profile(
            self.index.arrays, xq[:nq], self.gt_D[:nq], self.max_topk,
            self.index.metric, bs=bs)
        self.is_trained = True

    def save_profile(self, path: str) -> None:
        assert self.is_trained
        save_trace_set(self.traces, path)

    def load_profile(self, path: str) -> None:
        self.traces = load_trace_set(path)
        self.is_trained = True

    # ------------------------------------------------------------- online

    def set_queries(self, n: int, queries: np.ndarray,
                    require_acc: np.ndarray,
                    alloc_size: int | None = None) -> None:
        """Bind the query set and per-query bounds. ``require_acc`` is
        indexed by absolute query id (like the reference's acc array over
        train+test queries, eval/bound.cpp:375-380)."""
        self.num = n
        self.queries = np.asarray(queries, np.float32)
        self.require_acc = np.asarray(require_acc, np.float32)
        alloc = alloc_size or self.require_acc.shape[0]
        self.my_nprobe = np.zeros(alloc, np.int64)
        self.n_scanned = np.zeros(alloc, np.int64)
        self.t_recalls = np.zeros(alloc, np.float32)
        self._dev_cache = None  # (q, acc, gt_kth) device copies + key

    def set_topk(self, k: int) -> None:
        assert k <= self.max_topk
        self.query_topk = k  # _dev_all re-keys on query_topk itself

    def setparam(self, figure_id: int) -> None:
        self.multipler, self.std_m = hyper.get_params(figure_id)
        self.profile = False  # reference setparam side effect

    def set_hyper(self, multipler: float, std_m: float) -> None:
        self.multipler, self.std_m = float(multipler), float(std_m)

    # Batch-size buckets: every search pads its batch up to one of these so
    # a handful of compiled programs serve all sizes (compiles through the
    # axon tunnel are minutes-scale and shape-keyed; padded rows carry a
    # trivially-satisfied bound so they terminate after one wave).
    BATCH_BUCKETS = (1, 16, 128, 1024)

    def _bucket(self, size: int) -> int:
        for b in self.BATCH_BUCKETS:
            if size <= b:
                return b
        return size

    # Phase-B row buckets: query subsets are padded up to these row counts
    # so the tail-scan programs compile for a handful of shapes only.
    ROW_BUCKETS = (16, 128, 1024)

    # ------------------------------------------------- multirow plumbing

    def _mr(self):
        """The index's multi-row layout (or None), with the host-side wave
        plans cached per layout instance."""
        mr = self.index.multirow
        if mr is None:
            return None
        # Identity of the layout OBJECT is the cache key (id() can be
        # reused by a new layout after the old one is collected, which
        # would pair stale wave plans with a different row layout).
        if getattr(self, "_mr_obj", None) is not mr:
            self._mr_obj = mr
            self._mr_rpl = np.asarray(mr.rows_per_list)
            self._mr_plans = {}
        return mr

    def _mr_oneshot_plan(self, bsz: int | None = None):
        assert self._mr() is not None, "multirow layout not enabled"
        cut = None if self.dense_cut is None else float(self.dense_cut)
        # production gating only: small corpora (< ~0.5M vectors) gain
        # nothing from the shared pass — keep them on the gather tail.
        # dense_cut == 0.0 means "every query dense" and bypasses the
        # floor (tests / forced operation).
        if cut and self._mr_obj.rows.db.shape[0] < 2048:
            cut = None
        if (cut and bsz is not None and self.dense_auto
                and self._dense_min_bsz is not None
                and bsz >= self._dense_min_bsz):
            cut = 0.0  # batch-amortized: serve this window dense
        dd = bool(self.dense_decide) and cut is not None
        key = ("oneshot", int(self.min_decide_stage), cut, dd,
               tuple(sorted(self.plan_overrides.items())))
        if key not in self._mr_plans:
            self._mr_plans[key] = plan_oneshot(
                self._mr_rpl, self.index.nlist,
                min_decide_stage=int(self.min_decide_stage),
                dense_cut=cut, dense_decide=dd, **self.plan_overrides)
        return self._mr_plans[key]

    def _dev_all(self):
        """Device-resident (queries, bounds, gt-kth) padded by one batch
        bucket so window slices never clamp. Rebind with set_queries /
        set_gt / set_topk — in-place mutation of the host arrays will NOT
        be seen by searches."""
        key = self.query_topk
        if self._dev_cache is None or self._dev_cache[0] != key:
            nq = self.queries.shape[0]
            pad = self.BATCH_BUCKETS[-1]
            if self.require_acc.shape[0] < nq:
                # the padded host path raises on the same mismatch; the
                # silent alternative would serve real queries with the
                # trivially-satisfied 1e-3 pad bound
                raise ValueError(
                    f"require_acc has {self.require_acc.shape[0]} entries "
                    f"for {nq} queries (set_queries aligns them)")
            acc = np.full(nq + pad, 1e-3, np.float32)
            acc[:nq] = self.require_acc[:nq]
            gtk = np.zeros(nq + pad, np.float32)
            if self.gt_D is not None:
                g = min(nq, self.gt_D.shape[0])
                gtk[:g] = self.gt_D[:g, self.query_topk - 1]
            qp = np.zeros((nq + pad, self.index.d), np.float32)
            qp[:nq] = self.queries
            self._dev_cache = (key, jnp.asarray(qp), jnp.asarray(acc),
                               jnp.asarray(gtk))
        return self._dev_cache[1:]

    def _pad_rows(self, rows: np.ndarray, pad_value: int = 0) -> np.ndarray:
        """Pad a row-index set up to the next ROW_BUCKET size."""
        rb = next((b for b in self.ROW_BUCKETS if rows.size <= b),
                  rows.size)
        sel = np.full(rb, pad_value, np.int64)
        sel[:rows.size] = rows
        return sel

    @staticmethod
    def _width_buckets(need: np.ndarray, target: np.ndarray, base: int,
                       nlist: int, factor: int = 4):
        """Group straggler rows into geometric target-width buckets
        (base*factor, ..., nlist]; coarse on purpose — each distinct width
        is a separately compiled program and compiles through the axon
        tunnel are minutes-scale."""
        widths = []
        w = base * factor
        while w < nlist:
            widths.append(w)
            w *= factor
        widths.append(nlist)
        lo = base
        for w in widths:
            rows = need[(target[need] > lo) & (target[need] <= w)]
            if rows.size:
                yield w, lo, rows
            lo = w

    def search(self, start: int, search_size: int = -1,
               two_phase: bool | None = None):
        """Bounded search over queries[start : start+size]. Returns
        (D [size, max_topk], I [size, max_topk]) and records
        my_nprobe / n_scanned / t_recalls at absolute positions.

        Execution: with the multirow layout enabled (production default),
        the whole search is ONE device dispatch — the one-shot engine
        windows device-resident query arrays and compacts
        undecided/unfinished queries on device (bounded_oneshot_mr).
        Without it, the padded engines run: single-phase masked waves for
        tiny batches, else host-orchestrated two-phase with straggler
        re-batching. ``two_phase`` only affects the padded path.
        """
        assert self.is_trained, "sys_train before search (profile.cpp:212)"
        size = self.num if search_size == -1 else search_size
        if size > self.BATCH_BUCKETS[-1]:
            # chunk oversized batches through the largest bucket (the
            # device-resident window pad only guarantees slices up to it)
            step = self.BATCH_BUCKETS[-1]
            outs = [self.search(start + off, min(step, size - off),
                                two_phase=two_phase)
                    for off in range(0, size, step)]
            return (np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]))
        nlist = self.index.nlist
        cap_stage = nlist // 8
        if two_phase is None:
            two_phase = size > 8
        bsz = self._bucket(size)
        want_true = self.profile and self.gt_D is not None
        mr = self._mr()
        if mr is None:
            # padded engines take host-padded batches; the mr path windows
            # device-resident arrays instead (see _oneshot_window)
            q = np.zeros((bsz, self.index.d), np.float32)
            q[:size] = self.queries[start:start + size]
            acc = np.full(bsz, 1e-3, np.float32)  # padding: decide early
            acc[:size] = self.require_acc[start:start + size]
            gt_kth = np.zeros(bsz, np.float32)
            if want_true:
                gt_kth[:size] = self.gt_D[start:start + size,
                                          self.query_topk - 1]

        if mr is not None:
            # the one-shot engine compacts on device: single dispatch,
            # single (narrow) fetch, device-resident query windows
            q_all, acc_all, gtk_all = self._dev_all()
            out = _oneshot_window(
                self.index.arrays, mr, self.traces, q_all, acc_all,
                gtk_all, jnp.float32(self.multipler),
                jnp.float32(self.std_m), jnp.int32(start), jnp.int32(size),
                bsz, self.query_topk, self.max_topk, self.index.metric,
                self._mr_oneshot_plan(bsz), want_true)
            vals, ids, my_np, n_scanned, t_rec = jax.device_get(out)
            if want_true:
                self.t_recalls[start:start + size] = t_rec[:size]
        elif not two_phase:
            out = bounded_search(
                self.index.arrays, self.traces, jnp.asarray(q),
                jnp.asarray(acc), jnp.float32(self.multipler),
                jnp.float32(self.std_m), jnp.asarray(gt_kth),
                self.query_topk, self.max_topk, self.index.metric,
                with_true_recall=want_true)
            # ONE host round-trip (each fetch pays ~40 ms tunnel RTT)
            vals, ids, my_np, n_scanned, t_rec = jax.device_get(out)
            if want_true:
                self.t_recalls[start:start + size] = t_rec[:size]
        else:
            vals_d, ids_d, my_np_d, decided_d, cids_d, q_sq_d = \
                bounded_search_decide(
                    self.index.arrays, self.traces, jnp.asarray(q),
                    jnp.asarray(acc), jnp.float32(self.multipler),
                    jnp.float32(self.std_m), self.query_topk,
                    self.max_topk, self.index.metric)
            # ONE fetch for phase-B planning AND the base results (a
            # second fetch later would cost another ~40ms tunnel RTT)
            my_np, decided, vals, ids = jax.device_get(
                (my_np_d, decided_d, vals_d, ids_d))
            target = np.minimum(np.maximum(my_np, decided), nlist)
            vals = np.array(vals)     # writable copies
            ids = np.array(ids)
            need = np.where(target > cap_stage)[0]
            if need.size:
                # bucket stragglers by probe width and by row count; launch
                # every bucket's scan asynchronously and fetch ALL results
                # in one device_get (each fetch costs a ~40ms tunnel RTT)
                pending = []
                for w, lo, rows in self._width_buckets(
                        need, target, cap_stage, nlist):
                    sel = self._pad_rows(rows)
                    fv, fi = finish_scan(
                        self.index.arrays,
                        jnp.asarray(q[sel]), q_sq_d[jnp.asarray(sel)],
                        vals_d[jnp.asarray(sel)],
                        ids_d[jnp.asarray(sel)],
                        my_np_d[jnp.asarray(sel)],
                        cap_stage, w - cap_stage, self.index.metric)
                    pending.append((rows, fv, fi))
                fetched = jax.device_get([(fv, fi) for _, fv, fi in pending])
                for (rows, _, _), (fv, fi) in zip(pending, fetched):
                    vals[rows] = fv[:rows.size]
                    ids[rows] = fi[:rows.size]
            n_scanned = target

        if two_phase and want_true and mr is None:
            from auncel_tpu.profile.bounded import TRUE_RECALL_SLACK
            if self.index.metric is Metric.L2:
                cnt = (vals <= gt_kth[:, None] * TRUE_RECALL_SLACK).sum(1)
            else:
                cnt = (vals >= gt_kth[:, None] *
                       (2.0 - TRUE_RECALL_SLACK)).sum(1)
            # logged recall caps at 1 (reference profile.cpp:246-280)
            t_rec = np.where(my_np >= nlist, 1.0,
                             np.minimum(cnt, self.query_topk)
                             / float(self.query_topk))
            self.t_recalls[start:start + size] = t_rec[:size]

        self.my_nprobe[start:start + size] = my_np[:size]
        self.n_scanned[start:start + size] = n_scanned[:size]
        # results are narrowed to the query's set_topk width (the heap
        # stays max_topk deep internally for profile semantics)
        return (vals[:size, : self.query_topk],
                ids[:size, : self.query_topk].astype(np.int64))

    def search_stream(self, start: int, total: int,
                      window: int | None = None, depth: int = 2):
        """Sustained-stream bounded serving: keep up to ``depth`` windows
        in flight — window i+1 is DISPATCHED before window i's results
        are fetched, so the ~27 ms/MB result fetch of one window overlaps
        the device execution of the next (dispatches themselves cannot
        overlap through the axon tunnel; fetches and compute of different
        windows can). Results and per-query bookkeeping are identical to
        looping search() over the same windows. Requires the multirow
        one-shot engine (the padded paths fetch mid-search and gain
        nothing from pipelining — they fall back to plain chunking)."""
        if self._mr() is None:
            return self.search(start, total)
        window = min(window or self.BATCH_BUCKETS[-1],
                     self.BATCH_BUCKETS[-1])
        outs, in_flight = [], []
        for off in range(0, total, window):
            size = min(window, total - off)
            in_flight.append(self.dispatch_bounded(start + off, size))
            if len(in_flight) >= depth:
                outs.append(self.finish_bounded(in_flight.pop(0)))
        while in_flight:
            outs.append(self.finish_bounded(in_flight.pop(0)))
        return (np.concatenate([o[0] for o in outs]),
                np.concatenate([o[1] for o in outs]))

    def dispatch_bounded(self, start: int, size: int):
        """Asynchronously dispatch ONE bounded-search window on the
        one-shot engine (no fetch): returns an opaque handle for
        finish_bounded. The building block of pipelined serving — a
        caller can keep the next window's dispatch in flight while the
        previous window's results stream back through the tunnel."""
        mr = self._mr()
        assert mr is not None, "dispatch_bounded needs the multirow engine"
        assert size <= self.BATCH_BUCKETS[-1]
        want_true = self.profile and self.gt_D is not None
        q_all, acc_all, gtk_all = self._dev_all()
        out = _oneshot_window(
            self.index.arrays, mr, self.traces, q_all, acc_all,
            gtk_all, jnp.float32(self.multipler),
            jnp.float32(self.std_m), jnp.int32(start),
            jnp.int32(size), self._bucket(size), self.query_topk,
            self.max_topk, self.index.metric,
            self._mr_oneshot_plan(self._bucket(size)), want_true)
        return (start, size, want_true, out)

    def finish_bounded(self, handle):
        """Fetch one dispatch_bounded handle's results and record the
        per-query bookkeeping (my_nprobe / n_scanned / t_recalls)."""
        start, size, want_true, out = handle
        vals, ids, my_np, n_scanned, t_rec = jax.device_get(out)
        if want_true:
            self.t_recalls[start:start + size] = t_rec[:size]
        self.my_nprobe[start:start + size] = my_np[:size]
        self.n_scanned[start:start + size] = n_scanned[:size]
        return (vals[:size, : self.query_topk],
                ids[:size, : self.query_topk].astype(np.int64))

    # -------------------------------------------------------- time budget

    def calibrate_time(self, probe_lo: int = 32, probe_hi: int = 128,
                       reps: int = 5) -> float:
        """Measure the marginal per-probe cost (ms) of the ENGINE that
        time_search spends budgets on — the reference budgets the very
        loop it times (IndexIVF.cpp:545-549). Forcing the budget engine to
        exact probe counts (per_probe_ms=1 makes n_budget == nprobe) and
        differencing two counts cancels fixed dispatch overhead. Timing a
        different engine (e.g. the padded fixed-nprobe path while budgets
        are spent on the row layout) overestimates per-probe cost ~3x and
        makes budgets systematically underspend."""
        bsz = self._bucket(1)
        q = np.zeros((bsz, self.index.d), np.float32)
        if self.queries is not None:
            q[:1] = self.queries[:1]
        qd = jnp.asarray(q)
        mr = self._mr()

        def run(nprobe):
            # exact probe counts (the float budget inversion is off by
            # one for ~2% of counts; calibration must time what it says)
            probes = jnp.full((bsz,), nprobe, jnp.int32)
            if mr is not None:
                return nprobe_search_mr(
                    self.index.arrays, mr, qd, probes,
                    self.max_topk, self.index.metric,
                    self._mr_oneshot_plan())
            return nprobe_search(
                self.index.arrays, qd, probes,
                self.max_topk, self.index.metric)

        def timed(nprobe):
            jax.device_get(run(nprobe))  # warm + compile
            t0 = time.perf_counter()
            for _ in range(reps):
                out = jax.device_get(run(nprobe))
            del out
            return (time.perf_counter() - t0) / reps * 1e3

        t_lo, t_hi = timed(probe_lo), timed(probe_hi)
        self.per_probe_ms = max((t_hi - t_lo) / (probe_hi - probe_lo), 1e-4)
        return self.per_probe_ms

    def time_search(self, start: int, search_size: int = -1):
        """Latency-budget mode: require_acc holds per-query budgets in ms
        (reference time_search, profile.cpp:229-244)."""
        size = self.num if search_size == -1 else search_size
        if self.per_probe_ms is None:
            self.calibrate_time()
        if size > self.BATCH_BUCKETS[-1]:
            # chunk through the largest bucket like search(): a ragged
            # one-off shape pays the compile lottery per distinct size
            step = self.BATCH_BUCKETS[-1]
            outs = [self.time_search(start + off, min(step, size - off))
                    for off in range(0, size, step)]
            return (np.concatenate([o[0] for o in outs]),
                    np.concatenate([o[1] for o in outs]))
        # bucket-pad like search(): one compiled program per bucket size
        bsz = self._bucket(size)
        q = np.zeros((bsz, self.index.d), np.float32)
        q[:size] = self.queries[start:start + size]
        budget = np.full(bsz, 1e-6, np.float32)  # pad: minimal probes
        budget[:size] = self.require_acc[start:start + size]
        mr = self._mr()
        if mr is not None:
            out = budgeted_search_mr(
                self.index.arrays, mr, jnp.asarray(q), jnp.asarray(budget),
                jnp.float32(self.per_probe_ms), self.max_topk,
                self.index.metric, self._mr_oneshot_plan())
        else:
            out = budgeted_search(
                self.index.arrays, jnp.asarray(q), jnp.asarray(budget),
                jnp.float32(self.per_probe_ms), self.max_topk,
                self.index.metric)
        vals, ids, n_budget = jax.device_get(out)
        self.my_nprobe[start:start + size] = n_budget[:size]
        self.n_scanned[start:start + size] = n_budget[:size]
        return (vals[:size, : self.query_topk],
                ids[:size, : self.query_topk].astype(np.int64))

    # ---------------------------------------------------------- utilities

    @staticmethod
    def recall(I: np.ndarray, gt_I: np.ndarray, topk: int) -> float:
        """Set-intersection recall@topk (reference Error_sys::recall,
        profile.cpp:246-280, sans its sorted-dedup binary search)."""
        a = set(np.asarray(I[:topk]).tolist())
        b = set(np.asarray(gt_I[:topk]).tolist())
        a.discard(-1)
        return len(a & b) / topk

    def calibrate(self, start: int, size: int, target_bound: float,
                  max_multipler: float = 64.0, safety: float = 1.5,
                  std_m_grid: tuple = (0.2, 1.0, 4.0, 8.0, 12.0),
                  headroom: float | None = None) -> float:
        """Auto-tune ``(multipler, std_m)`` on held-out queries — the two
        knobs the reference hand-tunes per workload into hyperparameter.txt
        (its shipped std_m values span 0.2..12.0!). For each std_m in the
        grid, binary-search the smallest multipler whose *worst-case*
        recall@query_k meets the bound on one half, validate on the other
        half, and keep the combination with the lowest scan cost; a
        ``safety`` margin covers the worst-case generalization gap of a
        finite calibration sample."""
        assert self.gt_D is not None and self.gt_I is not None
        # Margin-study floor (RESULTS_r3, scripts/calib_margin_study.py):
        # at the 1M difficulty tail, calibration samples below ~1000 chose
        # configs whose held-out worst case missed the bound by one
        # neighbor while 1000-sample cells held it. Warn rather than
        # raise: small corpora calibrate fine on less, but the caller
        # should know the measured generalization floor.
        if size < 1000 and self.index.ntotal >= 1_000_000:
            import warnings
            warnings.warn(
                f"calibrate() on {size} samples at ntotal="
                f"{self.index.ntotal}: the measured generalization floor "
                f"at >=1M scale is 1000 calibration queries "
                f"(RESULTS_r3 calibration-margin study)", stacklevel=2)
        # Optional headroom demands extra holdout recall beyond the
        # promise (e.g. 1/query_k = one neighbor). Measured at the
        # synthHard1M difficulty tail: even +1/k headroom (mean scan
        # 3x, multipler 22.6) leaves the NEXT thousand queries' worst
        # case at target - 1/k — the worst-case statistic of a finite
        # holdout does not generalize there for ANY tuner (the reference
        # hand-tunes hyperparameter.txt per workload, i.e. on its
        # reported set). Default 0 = reference-parity; the margin study
        # (scripts/calib_margin_study.py) quantifies what headroom buys.
        if headroom is None:
            headroom = 0.0
        holdout_target = min(target_bound + headroom, 1.0)
        half = size // 2
        best_cost = np.inf
        best_pair = (max_multipler, 1.0)
        # Iterate std_m LARGEST-first and only switch to a smaller-std_m
        # cell for a clearly lower cost: std_m inflates U per query where
        # the trace is uncertain (shape conservativeness) while multipler
        # scales every budget globally, and cells that pass the holdout
        # on a big multipler + small std_m were measured to generalize
        # WORSE at the 1M difficulty tail than equal-holdout cells with
        # large std_m (synthHard1M: (22.6, low) missed the test bound
        # that (5.2, 12) holds at half the scan cost).
        for sm in sorted(std_m_grid, reverse=True):
            self.std_m = float(sm)
            lo, hi = 1.0, max_multipler
            best = None
            for _ in range(7):
                mid = (lo + hi) / 2.0
                self.multipler = mid
                D, I = self.search(start, half)
                if self._min_recall(D, start, half) >= target_bound:
                    best = mid
                    hi = mid
                else:
                    lo = mid
            if best is None:
                continue
            # Escalate until the held-out half passes too (a cheap
            # generalization check the reference's manual tuning does
            # implicitly).
            m = best
            ok = False
            while m <= max_multipler:
                self.multipler = m
                D, I = self.search(start + half, size - half)
                if (self._min_recall(D, start + half, size - half)
                        >= holdout_target):
                    ok = True
                    break
                m *= 1.5
            if not ok:
                continue
            # Cost of THIS (m, std_m) pair: only the holdout half was just
            # searched at the final m — the train half's n_scanned still
            # holds whatever multipler the binary search last wrote there,
            # so averaging over both halves would mix states.
            cost = float(self.n_scanned[start + half:start + size].mean())
            if cost < best_cost * 0.85:
                best_cost = cost
                best_pair = (min(m * safety, max_multipler), float(sm))
        self.multipler, self.std_m = best_pair
        # Validate the FINAL (safety-inflated) multipler on the held-out
        # half and escalate until it passes — applying the margin after
        # selection without re-checking left the shipped config unproven
        # (measured on synthHard1M: picked cells missed the bound held-out
        # while a validated one at the same cost grid held it).
        m = self.multipler
        while m <= max_multipler:
            self.multipler = m
            D, _ = self.search(start + half, size - half)
            if (self._min_recall(D, start + half, size - half)
                    >= holdout_target):
                break
            m *= 1.25
        self.multipler = min(m, max_multipler)
        # Holdout mean scan at the shipped config (a workload statistic
        # for observability) + the MEASURED dense crossover: time one
        # gather window vs one dense window at the final config and set
        # the minimum window size where the shared corpus pass wins
        # (dense wall-clock is ~window-size-flat, gather ~linear in it,
        # so the break-even scales as bsz_probe x t_dense / t_gather).
        # Routing never alters results, so a mis-timed probe costs only
        # throughput, never the bound. Costs 4 searches + one dense
        # program compile (persistently cached).
        self._cal_mean_scan = float(
            self.n_scanned[start + half:start + size].mean())
        self._dense_min_bsz = None
        mr = self._mr()
        if (self.dense_auto and mr is not None and self.dense_cut
                and mr.rows.db.shape[0] >= 2048):
            import time as _time
            probe = min(size - half, self.BATCH_BUCKETS[-1])
            bsz = self._bucket(probe)
            auto, self.dense_auto = self.dense_auto, False
            cut = self.dense_cut
            try:
                def _timed():
                    self.search(start + half, probe)  # warm/compile
                    t0 = _time.perf_counter()
                    self.search(start + half, probe)
                    return _time.perf_counter() - t0
                t_gather = _timed()
                self.dense_cut = 0.0
                t_dense = _timed()
                if t_dense < t_gather:
                    self._dense_min_bsz = max(
                        1, int(bsz * t_dense / t_gather))
            finally:
                self.dense_cut, self.dense_auto = cut, auto
        return self.multipler

    def _min_recall(self, D: np.ndarray, start: int, size: int) -> float:
        from auncel_tpu.autotune import worst_case_recall
        return worst_case_recall(D, self.gt_D[start:start + size],
                                 self.query_topk, self.index.metric)
