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
    bounded_oneshot_mr, bounded_search_mr, budgeted_search_mr,
    nprobe_search_mr, plan_oneshot, plan_latency)


def _slice_window(q_all, acc_all, gtk_all, start, size, bsz):
    """Device-side window extraction (the arrays live on device across
    calls, padded by a bucket so slices never clamp)."""
    d = q_all.shape[1]
    mask = jnp.arange(bsz, dtype=jnp.int32) < size
    q = jax.lax.dynamic_slice(q_all, (start, 0), (bsz, d)) * mask[:, None]
    acc = jnp.where(mask, jax.lax.dynamic_slice_in_dim(
        acc_all, start, bsz, 0), 1e-3)  # padding decides at the 2nd wave
    gtk = jnp.where(mask, jax.lax.dynamic_slice_in_dim(
        gtk_all, start, bsz, 0), 0.0)
    return q, acc, gtk


@functools.partial(
    jax.jit,
    static_argnames=("bsz", "query_k", "max_topk", "metric", "plan",
                     "with_true_recall", "decide_margin"))
def _oneshot_window(arrays, mr, traces, q_all, acc_all, gtk_all,
                    multipler, std_m, start, size, bsz, query_k, max_topk,
                    metric, plan, with_true_recall, decide_margin=False):
    """Device-side window extraction + bounded search + result narrowing:
    the query/bound arrays live on device across calls (uploaded once at
    set_queries, padded by a bucket so slices never clamp), and only
    [bsz, query_k] results come back — transfers through the ~30 MB/s
    tunnel are otherwise the batch bottleneck. ``start``/``size`` are
    traced: one compiled program per batch bucket."""
    q, acc, gtk = _slice_window(q_all, acc_all, gtk_all, start, size, bsz)
    vals, ids, my_np, n_scanned, t_rec = bounded_oneshot_mr(
        arrays, mr, traces, q, acc, multipler, std_m, gtk, query_k,
        max_topk, metric, plan, with_true_recall, decide_margin)
    return (vals[:, :query_k], ids[:, :query_k], my_np, n_scanned, t_rec)


@functools.partial(
    jax.jit,
    static_argnames=("bsz", "query_k", "max_topk", "metric", "plan",
                     "with_true_recall", "decide_margin"))
def _latency_window(arrays, mr, traces, q_all, acc_all, gtk_all,
                    multipler, std_m, start, size, bsz, query_k, max_topk,
                    metric, plan, with_true_recall, decide_margin=False):
    """The tiny-batch window: same device-side slicing as
    ``_oneshot_window`` but the search runs the SINGLE-PHASE wave engine
    under a batch-1-shaped plan (``plan_latency``) — thinned decide
    ladder + geometric serve tail, no compaction machinery. Decisions are
    bound-conservative vs the one-shot engine (they land at the same or a
    later kept stage), so a query served at batch 1 may scan MORE lists
    than the same query in a big window — never fewer (round-4 VERDICT #1:
    per-wave fixed costs, not scan bytes, dominate batch-1 latency)."""
    q, acc, gtk = _slice_window(q_all, acc_all, gtk_all, start, size, bsz)
    vals, ids, my_np, n_scanned, t_rec = bounded_search_mr(
        arrays, mr, traces, q, acc, multipler, std_m, gtk, query_k,
        max_topk, metric, plan, with_true_recall, decide_margin)
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
        # Measured batch-1 device-cost CURVE for the budget engine
        # (calibrate_time): _time_cost_table[i] = cost in ms of scanning
        # i+1 lists, device-side (dispatch floor subtracted), monotone.
        # When present, time_search inverts budgets through it instead of
        # the linear per-probe model — at 10M cost is NOT linear in probes
        # (cond-gated wave ladders; round-4 measured corr -0.10 for the
        # linear model, logs_r4/effTime10Mb.err).
        self._time_cost_table: np.ndarray | None = None
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
        # Batch-1-shaped serving (round-4 VERDICT #1): windows whose batch
        # bucket is <= lat_bucket_max ride the single-phase engine under a
        # plan_latency schedule — thinned decide ladder (lat_decide_stages
        # + the forced nlist/8) and a geometric serve tail, instead of the
        # one-shot engine's compaction machinery whose per-wave fixed
        # costs dominate at tiny batches. Decisions are bound-conservative
        # vs the batched ladder (land at the same or a later stage). Set
        # lat_bucket_max = 0 to disable.
        # Defaults are the measured-best 10M batch-1 arm (logs_r5/
        # latB1_3.err: (16,)/256 mean 41.5 ms vs (4,16,64)/64 43.4 —
        # two decide blocks beat four even though budgets triple; the
        # p95/max tail is heavier, so latency-sensitive deployments that
        # fear forced full scans may prefer (4, 16, 64)).
        self.lat_bucket_max: int = 1
        self.lat_decide_stages: tuple = (16,)
        self.lat_serve_base: int = 256
        # Exact-top-k decide margin (round-4 VERDICT #4): when a query's
        # bound demands the exact top-k (ceil(acc*k) == k), decide with an
        # internal k+1-wide predicate as well and take the minimum — one
        # structural spare neighbor for the cells the held-out matrix
        # misses by one. "auto" enables it only when some bound actually
        # demands exact top-k (zero cost otherwise); True/False force.
        self.decide_margin: bool | str = "auto"
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

    def _mr_latency_plan(self):
        assert self._mr() is not None, "multirow layout not enabled"
        key = ("latency", tuple(self.lat_decide_stages),
               int(self.lat_serve_base))
        if key not in self._mr_plans:
            self._mr_plans[key] = plan_latency(
                self._mr_rpl, self.index.nlist,
                decide_stages=tuple(self.lat_decide_stages),
                serve_base=int(self.lat_serve_base))
        return self._mr_plans[key]

    def _decide_margin_flag(self) -> bool:
        """Host-side static: enable the k+1 exact-top-k decide margin for
        this search? (see self.decide_margin)."""
        if self.query_topk + 1 > self.max_topk:
            return False
        if self.decide_margin == "auto":
            if self.require_acc is None:
                return False
            k = self.query_topk
            return bool(np.any(self.require_acc * k > k - 1 + 1e-4))
        return bool(self.decide_margin)

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
            # single (narrow) fetch, device-resident query windows; tiny
            # buckets ride the batch-1-shaped single-phase plan instead
            q_all, acc_all, gtk_all = self._dev_all()
            margin = self._decide_margin_flag()
            if bsz <= self.lat_bucket_max:
                window_fn, plan = _latency_window, self._mr_latency_plan()
            else:
                window_fn, plan = _oneshot_window, self._mr_oneshot_plan(bsz)
            out = window_fn(
                self.index.arrays, mr, self.traces, q_all, acc_all,
                gtk_all, jnp.float32(self.multipler),
                jnp.float32(self.std_m), jnp.int32(start), jnp.int32(size),
                bsz, self.query_topk, self.max_topk, self.index.metric,
                plan, want_true, margin)
            vals, ids, my_np, n_scanned, t_rec = jax.device_get(out)
            if want_true:
                self.t_recalls[start:start + size] = t_rec[:size]
        elif not two_phase:
            out = bounded_search(
                self.index.arrays, self.traces, jnp.asarray(q),
                jnp.asarray(acc), jnp.float32(self.multipler),
                jnp.float32(self.std_m), jnp.asarray(gt_kth),
                self.query_topk, self.max_topk, self.index.metric,
                with_true_recall=want_true,
                decide_margin=self._decide_margin_flag())
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
                    self.max_topk, self.index.metric,
                    decide_margin=self._decide_margin_flag())
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
            self._mr_oneshot_plan(self._bucket(size)), want_true,
            self._decide_margin_flag())
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

    def calibrate_time(self, reps: int = 5, sample_q: int = 4,
                       grid: list | None = None) -> float:
        """Measure the batch-1 cost CURVE of the ENGINE time_search spends
        budgets on — the reference budgets the very loop it times
        (IndexIVF.cpp:545-549).

        Round-5 rework (VERDICT r4 #2): the old single per-probe slope was
        calibrated from two batched counts and at 10M was UNCORRELATED
        with measured batch-1 latency (corr -0.10, within-budget 0.375,
        logs_r4/effTime10Mb.err) — the budget engine's cost is a staircase
        of cond-gated geometric waves, not linear in probes. This measures
        the curve directly: time exact probe counts over a geometric grid
        at batch 1 (the budget-enforcement shape), on several sample
        queries (per-query row counts vary the executed waves), take the
        per-count MAX over queries (conservative: overpricing underspends,
        never overshoots), subtract the n=1 dispatch floor, interpolate to
        a dense monotone table cost(n) for n = 1..nlist. time_search then
        inverts each budget through the table with the reference's 0.95
        safety margin. Returns the large-n marginal slope (back-compat
        per_probe_ms; also the fallback when a caller sets it directly)."""
        nlist = self.index.nlist
        if grid is None:
            grid = [1]
            while grid[-1] < nlist:
                grid.append(min(grid[-1] * 2, nlist))
        bsz = self._bucket(1)
        nq_avail = 0 if self.queries is None else self.queries.shape[0]
        sample_q = max(1, min(sample_q, max(nq_avail, 1)))
        mr = self._mr()

        def run(nprobe, qrow):
            q = np.zeros((bsz, self.index.d), np.float32)
            if nq_avail:
                q[:1] = qrow
            qd = jnp.asarray(q)
            probes = jnp.full((bsz,), nprobe, jnp.int32)
            if mr is not None:
                return nprobe_search_mr(
                    self.index.arrays, mr, qd, probes,
                    self.max_topk, self.index.metric,
                    self._mr_oneshot_plan())
            return nprobe_search(
                self.index.arrays, qd, probes,
                self.max_topk, self.index.metric)

        # probe counts are traced -> ONE compiled program; warm it once
        qrows = (self.queries[:sample_q] if nq_avail
                 else np.zeros((1, self.index.d), np.float32))
        jax.device_get(run(1, qrows[0]))
        # MIN of reps per (count, query): the classic latency estimator —
        # tunnel jitter is strictly additive, so min approaches the true
        # device+floor time; median left ~2 ms of noise in EVERY table
        # entry and dragged model-vs-measured corr to 0.70/-0.20
        # (logs_r5/effTime10M.err / effTime1M.err, round 5 first pass).
        t = np.zeros((len(grid), len(qrows)), np.float64)
        for gi, n in enumerate(grid):
            for qi, qrow in enumerate(qrows):
                samples = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    jax.device_get(run(n, qrow))
                    samples.append(time.perf_counter() - t0)
                t[gi, qi] = float(np.min(samples)) * 1e3
        # per-QUERY floor (each query's own n=1 time), so the dispatch
        # floor cancels exactly; max over queries then reflects genuine
        # per-query wave variation, not cross-query noise spread
        cost = np.maximum(t - t[0][None, :], 0.0)
        cost_grid = np.maximum.accumulate(cost.max(axis=1))
        dense = np.interp(np.arange(1, nlist + 1, dtype=np.float64),
                          np.asarray(grid, np.float64), cost_grid)
        self._time_cost_table = np.maximum.accumulate(dense)
        # back-compat marginal slope from the top of the curve
        span = max(grid[-1] - grid[-2], 1) if len(grid) > 1 else 1
        self.per_probe_ms = max(
            (cost_grid[-1] - cost_grid[-2]) / span if len(grid) > 1
            else cost_grid[-1] / max(grid[-1], 1), 1e-4)
        return self.per_probe_ms

    def time_cost_ms(self, n_probes) -> np.ndarray:
        """The calibrated cost model's prediction (ms, device-side) for
        scanning ``n_probes`` lists at batch 1 — what time_search believed
        when it converted budgets (eval harness validation hook)."""
        n = np.clip(np.asarray(n_probes, np.int64), 1, self.index.nlist)
        if self._time_cost_table is not None:
            return self._time_cost_table[n - 1]
        return n * float(self.per_probe_ms or 0.0)

    def _budget_to_probes(self, budget_ms: np.ndarray) -> np.ndarray:
        """Largest probe count whose calibrated cost fits 0.95x each
        budget (the reference's safety margin, IndexIVF.cpp:545-549)."""
        m = 0.95 * np.asarray(budget_ms, np.float64)
        n = np.searchsorted(self._time_cost_table, m, side="right")
        return np.clip(n, 1, self.index.nlist).astype(np.int32)

    def time_search(self, start: int, search_size: int = -1):
        """Latency-budget mode: require_acc holds per-query budgets in ms
        (reference time_search, profile.cpp:229-244). Budgets convert to
        probe counts up front — through the measured cost TABLE when
        calibrate_time ran (each budget maps to the largest count whose
        measured batch-1 cost fits 0.95x of it), else through the linear
        per-probe model (back-compat: callers that set per_probe_ms
        directly, e.g. tests avoiding on-CPU timing)."""
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
        if self._time_cost_table is not None:
            probes = jnp.asarray(self._budget_to_probes(budget))
            if mr is not None:
                out = nprobe_search_mr(
                    self.index.arrays, mr, jnp.asarray(q), probes,
                    self.max_topk, self.index.metric,
                    self._mr_oneshot_plan())
            else:
                out = nprobe_search(
                    self.index.arrays, jnp.asarray(q), probes,
                    self.max_topk, self.index.metric)
        elif mr is not None:
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
