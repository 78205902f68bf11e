"""Sharded (scale-out) search over a JAX device mesh.

Capability parity with the reference's distributed mode
(``/root/reference/Auncel/dist/``, SURVEY.md §3E): the corpus is row-sharded
(``split.cpp`` round-robin), each shard builds its own IVF index and its own
error profile on its partition (``worker.cpp:153-235``), every query fans
out to all shards, and per-shard top-k results are merged by distance
(``reduce.cpp:98-133``). The per-query error bound composes because each
shard guarantees it on its partition and the merge keeps the global top-k.

TPU-first redesign: the TCP master/worker/reduce pipeline becomes a single
SPMD program under ``shard_map`` over a ``Mesh`` axis ``"shard"``:

  * per-shard index state is one stacked pytree ``[S, ...]`` sharded on its
    leading axis (each device holds its shard's padded lists in HBM);
  * the "network scatter" is free (queries are replicated);
  * the "gather + file merge" is one ``jax.lax.all_gather`` of [B, k]
    results over ICI followed by a replicated top-k re-select — microseconds
    instead of the reference's TCP file streaming;
  * failure handling: JAX's single-controller runtime restarts/reshards on
    failure; there is no per-worker retry protocol to replicate (the
    reference has none either — a dead worker hangs recv, dist/master.cpp).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.scan import IVFArrays, ivf_search_fixed
from auncel_tpu.ops.topk import topk_scores
from auncel_tpu.profile.trace import TraceSet
from auncel_tpu.profile.bounded import bounded_search

AXIS = "shard"
DP = "dp"


def make_mesh(n_shards: int | None = None, dp: int = 1) -> Mesh:
    """Device mesh for sharded search. ``dp > 1`` adds a query
    data-parallel axis: the mesh becomes [dp, shard] — each dp group holds
    a full REPLICA of the sharded corpus and serves 1/dp of every query
    batch (the scale-out axis the reference's dist mode lacks: its workers
    only shard the corpus, dist/README.md). Collectives: the top-k merge
    all-gathers over ``shard`` only; dp groups never communicate."""
    devs = jax.devices()
    n = n_shards or (len(devs) // dp)
    if dp == 1:
        return Mesh(np.asarray(devs[:n]), (AXIS,))
    assert len(devs) >= dp * n, (len(devs), dp, n)
    return Mesh(np.asarray(devs[: dp * n]).reshape(dp, n), (DP, AXIS))


def split_round_robin(x: np.ndarray, n_shards: int):
    """Row round-robin corpus split (reference dist/split.cpp). Returns
    per-shard (rows, global_ids)."""
    n = x.shape[0]
    ids = np.arange(n, dtype=np.int64)
    return [(x[s::n_shards], ids[s::n_shards]) for s in range(n_shards)]


def _stack_pytrees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _shard_leading(tree, mesh: Mesh):
    sharding = jax.sharding.NamedSharding(mesh, P(AXIS))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


class ShardedIVF:
    """S independent per-shard IVF indexes executing as one SPMD program."""

    def __init__(self, d: int, nlist: int, n_shards: int,
                 metric: Metric = Metric.L2, mesh: Mesh | None = None,
                 storage: str = "f32"):
        self.d = d
        self.nlist = nlist
        self.n_shards = n_shards
        self.metric = Metric.parse(metric)
        # Per-shard storage codec. At reference scale (DEEP1B shards,
        # dist/worker.cpp:153-235) each shard serves ~10M vectors; f32
        # OOMs one v5e chip during add (measured, RESULTS_r3 §10M) while
        # sq8 fits both layouts in ~4 GB — quantized shards are the
        # production deployment, not an option. PQ is excluded here only
        # because the multirow engine needs per-list centroids.
        if storage.startswith("pq"):
            raise ValueError(
                "ShardedIVF supports f32/bf16/sq* shard storage (PQ "
                "storage cannot ride the multirow bounded engine)")
        self.storage = storage
        self._configure_mesh(mesh or make_mesh(n_shards), n_shards)
        self.shards: list[IVFFlatIndex] = []
        self.arrays: IVFArrays | None = None     # stacked [S, ...]
        self.traces: TraceSet | None = None      # stacked [S, ...]
        self._host_traces = None                 # numpy mirror of traces
        self.mr = None                           # stacked MultiRowArrays
        self._mr_plan = None
        self.multipler = 1.0
        self.std_m = 1.0
        self._jit_fns: dict = {}   # cached SPMD closures (see _jitted)

    def _configure_mesh(self, mesh: Mesh, n_shards: int) -> None:
        """Validate + adopt a mesh and derive the dp partition specs
        (shared by __init__ and drop_shard — one source of truth)."""
        assert dict(mesh.shape)[AXIS] == n_shards, (
            dict(mesh.shape), n_shards)
        self.mesh = mesh
        # query data-parallel groups (1 = plain corpus sharding)
        self.dp = int(dict(mesh.shape).get(DP, 1))
        self._qin = P(DP) if self.dp > 1 else P(None)
        self._qout = P(DP) if self.dp > 1 else P(None)
        self._nscan_out = P(AXIS, DP) if self.dp > 1 else P(AXIS)

    # ------------------------------------------------------------- build

    def build(self, xb: np.ndarray, train_frac: float = 0.5) -> None:
        """Per-shard k-means + pack (reference worker.cpp "train" command:
        each worker trains its own IVF on its shard)."""
        parts = split_round_robin(np.asarray(xb, np.float32), self.n_shards)
        self.shards = []
        for rows, gids in parts:
            if rows.shape[0] < self.nlist:
                raise ValueError(
                    f"shard holds {rows.shape[0]} rows < nlist="
                    f"{self.nlist}: k-means cannot train {self.nlist} "
                    f"centroids; lower nlist or n_shards")
            idx = IVFFlatIndex(self.d, self.nlist, self.metric,
                               storage=self.storage)
            nt = max(int(rows.shape[0] * train_frac), self.nlist)
            idx.train(rows[:nt])
            # the profile engine's boundary geometry needs the real
            # inter-centroid matrix; for nlist > INTERDIS_EAGER_MAX the
            # pack would otherwise carry the [1,1] placeholder
            idx.ensure_interdis()
            idx.add(rows, ids=gids)
            self.shards.append(idx)
        self._stack()

    def _stack(self) -> None:
        per = [s.arrays for s in self.shards]
        cap = max(a.cap for a in per)
        padded = []
        for a in per:
            pad = cap - a.cap
            padded.append(IVFArrays(
                centroids=a.centroids,
                cent_sq=a.cent_sq,
                db=jnp.pad(a.db, ((0, 0), (0, pad), (0, 0))),
                db_sq=jnp.pad(a.db_sq, ((0, 0), (0, pad))),
                vec_ids=jnp.pad(a.vec_ids, ((0, 0), (0, pad)),
                                constant_values=-1),
                list_sizes=a.list_sizes,
                interdis=a.interdis,
                # codec state stacks like everything else; decode_block
                # on the per-device slice then serves the shard's codec
                sq_scale=a.sq_scale,
                sq_bias=a.sq_bias,
            ))
        self.arrays = _shard_leading(_stack_pytrees(padded), self.mesh)
        self._jit_fns.clear()      # closures capture the old pytree shapes

    def enable_multirow(self, row_cap: int = 256) -> None:
        """Stack per-shard multi-row layouts (padded to common shapes) so
        the SPMD bounded search runs the production one-shot engine on
        every shard. The static wave plan is built from a DOMINATING
        per-list row profile (elementwise max of each shard's sorted row
        counts), so its per-stage coverage guarantee holds on every
        shard."""
        from auncel_tpu.index.multirow import build_multirow, MultiRowArrays
        from auncel_tpu.profile.bounded_mr import plan_oneshot
        rc = min([row_cap] + [s.arrays.cap for s in self.shards])
        self._mr_row_cap = rc
        per = [build_multirow(s.arrays, rc) for s in self.shards]
        n_rows = max(m.rows.db.shape[0] for m in per)
        max_rows = max(m.max_rows for m in per)
        padded = []
        for m in per:
            pr = n_rows - m.rows.db.shape[0]
            rows = m.rows
            rows_p = IVFArrays(
                centroids=rows.centroids, cent_sq=rows.cent_sq,
                db=jnp.pad(rows.db, ((0, pr), (0, 0), (0, 0))),
                db_sq=jnp.pad(rows.db_sq, ((0, pr), (0, 0))),
                vec_ids=jnp.pad(rows.vec_ids, ((0, pr), (0, 0)),
                                constant_values=-1),
                list_sizes=jnp.pad(rows.list_sizes, (0, pr)),
                interdis=rows.interdis,
                sq_scale=rows.sq_scale, sq_bias=rows.sq_bias)
            table_p = jnp.pad(m.row_table,
                              ((0, 0), (0, max_rows - m.max_rows)),
                              constant_values=-1)
            padded.append(MultiRowArrays(
                rows_p, table_p, m.rows_per_list, m.row_base,
                jnp.pad(m.row_list, (0, pr), constant_values=-1)))
        self.mr = _shard_leading(_stack_pytrees(padded), self.mesh)
        self._jit_fns.clear()      # plan is baked into the closures
        descs = np.stack([np.sort(np.asarray(m.rows_per_list))[::-1]
                          for m in per])
        self._mr_plan = plan_oneshot(np.max(descs, axis=0), self.nlist)

    # ----------------------------------------------------------- profiles

    def train_profiles(self, xq: np.ndarray, max_topk: int,
                       bs: int = 250) -> None:
        """Each shard trains its own phi->U profile against its own
        partition's ground truth (reference worker.cpp:153-235 +
        dist/gt.cpp per-shard GT)."""
        from auncel_tpu.profile.trainer import train_profile
        self.max_topk = max_topk
        traces = []
        for idx in self.shards:
            gt_D, _ = idx.exact_search(xq, max_topk)
            t, _ = train_profile(idx.arrays, xq, gt_D, max_topk,
                                 self.metric, bs=bs)
            traces.append(t)
        # Pad bin axes to a common width before stacking.
        max_bins = max(int(t.phi.shape[1]) for t in traces)
        padded = []
        for t in traces:
            pad = max_bins - t.phi.shape[1]
            padded.append(TraceSet(
                phi=jnp.pad(t.phi, ((0, 0), (0, pad)),
                            constant_values=np.inf),
                u=jnp.pad(t.u, ((0, 0), (0, pad))),
                std=jnp.pad(t.std, ((0, 0), (0, pad))),
                n_bins=t.n_bins,
            ))
        stacked = _stack_pytrees(padded)
        # host mirror: drop_shard must be able to re-stack WITHOUT reading
        # the (possibly failed) devices
        self._host_traces = jax.tree.map(np.asarray, stacked)
        self.traces = _shard_leading(stacked, self.mesh)

    # -------------------------------------------------------- persistence

    def save(self, dirpath: str) -> None:
        """Persist per-shard indexes + profiles (the reference's workers
        cache their trained shard indexes on disk; profiles it retrains —
        we persist both)."""
        import os
        import json
        from auncel_tpu.index.io import save_index
        from auncel_tpu.profile.trace import save_trace_set
        os.makedirs(dirpath, exist_ok=True)
        meta = dict(d=self.d, nlist=self.nlist, n_shards=self.n_shards,
                    storage=self.storage,
                    metric=self.metric.value, multipler=self.multipler,
                    std_m=self.std_m,
                    max_topk=getattr(self, "max_topk", None),
                    multirow_row_cap=(int(self._mr_row_cap)
                                      if self.mr is not None else None))
        with open(os.path.join(dirpath, "meta.json"), "w") as f:
            json.dump(meta, f)
        for i, idx in enumerate(self.shards):
            save_index(idx, os.path.join(dirpath, f"shard{i}.npz"))
        if self.traces is not None:
            save_trace_set(jax.device_get(self.traces),
                           os.path.join(dirpath, "traces.npz"))

    @classmethod
    def load(cls, dirpath: str, mesh: Mesh | None = None) -> "ShardedIVF":
        import os
        import json
        from auncel_tpu.index.io import load_index
        from auncel_tpu.profile.trace import load_trace_set
        with open(os.path.join(dirpath, "meta.json")) as f:
            meta = json.load(f)
        s = cls(meta["d"], meta["nlist"], meta["n_shards"],
                Metric.parse(meta["metric"]), mesh=mesh,
                storage=meta.get("storage", "f32"))
        s.multipler = meta["multipler"]
        s.std_m = meta["std_m"]
        if meta.get("max_topk"):
            s.max_topk = meta["max_topk"]
        s.shards = [load_index(os.path.join(dirpath, f"shard{i}.npz"))
                    for i in range(meta["n_shards"])]
        s._stack()
        tp = os.path.join(dirpath, "traces.npz")
        if os.path.exists(tp):
            loaded = load_trace_set(tp)
            s._host_traces = jax.tree.map(np.asarray, loaded)
            s.traces = _shard_leading(loaded, s.mesh)
        if meta.get("multirow_row_cap"):
            s.enable_multirow(meta["multirow_row_cap"])
        return s

    # --------------------------------------------------- failure handling

    def drop_shard(self, shard_id: int, mesh: Mesh | None = None) -> None:
        """Continue serving WITHOUT one shard (elastic degradation).

        The reference has no failure handling at all — a dead worker
        hangs the master's recv (dist/master.cpp:91-99). Here the
        controller can detect a failed device (a raised error from the
        SPMD program) and re-stack the surviving shards onto a smaller
        mesh: searches keep their per-shard error bound on the remaining
        partitions, while global recall degrades by at most the dropped
        partition's share of the corpus (1/S for round-robin splits).
        Profiles are NOT retrained — each survivor's phi->U map is
        partition-local state, re-staged from a HOST mirror so recovery
        never reads the failed device. The default replacement mesh is
        the old mesh minus the dropped shard's device column (the failed
        device must not rejoin); pass ``mesh`` to override.
        """
        assert self.n_shards > 1, "cannot drop the last shard"
        assert 0 <= shard_id < self.n_shards
        # Build + validate the replacement mesh BEFORE mutating any state.
        if mesh is None:
            devs = np.asarray(self.mesh.devices)
            mesh = Mesh(np.delete(devs, shard_id, axis=-1),
                        self.mesh.axis_names)
        assert dict(mesh.shape)[AXIS] == self.n_shards - 1, (
            dict(mesh.shape), self.n_shards - 1)
        host_tr = None
        if self._host_traces is not None:
            host_tr = jax.tree.map(
                lambda a: np.delete(a, shard_id, axis=0),
                self._host_traces)
        mr_cap = self._mr_row_cap if self.mr is not None else None
        del self.shards[shard_id]
        self.n_shards -= 1
        self._configure_mesh(mesh, self.n_shards)
        self.mr = None
        self.traces = None
        self._stack()
        self._host_traces = host_tr
        if host_tr is not None:
            self.traces = _shard_leading(host_tr, self.mesh)
        if mr_cap is not None:
            self.enable_multirow(mr_cap)

    # ------------------------------------------------------------- search

    def _jitted(self, key, make):
        """Per-instance cache of the jitted SPMD closures: defining a new
        closure per call would retrace + relower the whole wave program
        every search (seconds under the compile lottery); the key carries
        every static the closure bakes in. Cleared whenever the stacked
        arrays / plan are rebuilt."""
        fn = self._jit_fns.get(key)
        if fn is None:
            fn = self._jit_fns[key] = make()
        return fn

    def _check_batch(self, q: np.ndarray) -> None:
        if self.dp > 1:
            assert q.shape[0] % self.dp == 0, (
                f"batch {q.shape[0]} must divide the dp axis ({self.dp}); "
                "pad the query window")

    def search(self, q: np.ndarray, k: int, nprobe: int):
        """Fixed-nprobe sharded search: local scan + all-gather merge.
        With a dp axis, each dp group serves its slice of the batch."""
        metric, mesh = self.metric, self.mesh
        self._check_batch(np.asarray(q))

        def make():
            @jax.jit
            @functools.partial(
                jax.shard_map, mesh=mesh, check_vma=False,
                in_specs=(P(AXIS), self._qin),
                out_specs=(self._qout, self._qout))
            def run(stacked, q):
                local = jax.tree.map(lambda a: a[0], stacked)
                vals, ids = ivf_search_fixed(local, q, k, nprobe, metric)
                return _merge_over_shards(vals, ids, k, metric)
            return run

        run = self._jitted(("search", k, nprobe), make)
        vals, ids = run(self.arrays, jnp.asarray(np.asarray(q, np.float32)))
        return np.asarray(vals), np.asarray(ids, np.int64)

    def search_bounded(self, q: np.ndarray, require_acc: np.ndarray,
                       query_k: int, max_topk: int | None = None):
        """Error-bounded sharded search: each shard runs the bounded wave
        engine with its own profile, then the global top-k is merged.
        Returns (vals, ids, per-shard n_scanned [S, B])."""
        assert self.traces is not None, "train_profiles first"
        metric, mesh = self.metric, self.mesh
        max_topk = max_topk or self.max_topk
        mult = jnp.float32(self.multipler)
        sm = jnp.float32(self.std_m)
        self._check_batch(np.asarray(q))

        if self.mr is not None:
            from auncel_tpu.profile.bounded_mr import bounded_oneshot_mr
            plan = self._mr_plan

            def make_mr():
                @jax.jit
                @functools.partial(
                    jax.shard_map, mesh=mesh, check_vma=False,
                    in_specs=(P(AXIS), P(AXIS), P(AXIS), self._qin,
                              self._qin, P(), P()),
                    out_specs=(self._qout, self._qout, self._nscan_out))
                def run_mr(stacked, smr, straces, q, acc, mult, sm):
                    local = jax.tree.map(lambda a: a[0], stacked)
                    lmr = jax.tree.map(lambda a: a[0], smr)
                    ltr = jax.tree.map(lambda a: a[0], straces)
                    gtk = jnp.zeros(q.shape[0], jnp.float32)
                    vals, ids, my_np, n_scanned, _ = bounded_oneshot_mr(
                        local, lmr, ltr, q, acc, mult, sm, gtk,
                        query_k, max_topk, metric, plan)
                    mvals, mids = _merge_over_shards(vals, ids, max_topk,
                                                     metric)
                    return mvals, mids, n_scanned[None]
                return run_mr

            run_mr = self._jitted(("bounded_mr", query_k, max_topk),
                                  make_mr)
            vals, ids, n_scanned = run_mr(
                self.arrays, self.mr, self.traces,
                jnp.asarray(np.asarray(q, np.float32)),
                jnp.asarray(np.asarray(require_acc, np.float32)),
                mult, sm)
            return (np.asarray(vals), np.asarray(ids, np.int64),
                    np.asarray(n_scanned))

        def make():
            @jax.jit
            @functools.partial(
                jax.shard_map, mesh=mesh, check_vma=False,
                in_specs=(P(AXIS), P(AXIS), self._qin, self._qin,
                          P(), P()),
                out_specs=(self._qout, self._qout, self._nscan_out))
            def run(stacked, straces, q, acc, mult, sm):
                local = jax.tree.map(lambda a: a[0], stacked)
                ltr = jax.tree.map(lambda a: a[0], straces)
                gtk = jnp.zeros(q.shape[0], jnp.float32)
                vals, ids, my_np, n_scanned, _ = bounded_search(
                    local, ltr, q, acc, mult, sm, gtk,
                    query_k, max_topk, metric)
                mvals, mids = _merge_over_shards(vals, ids, max_topk,
                                                 metric)
                return mvals, mids, n_scanned[None]
            return run

        run = self._jitted(("bounded", query_k, max_topk), make)
        vals, ids, n_scanned = run(
            self.arrays, self.traces,
            jnp.asarray(np.asarray(q, np.float32)),
            jnp.asarray(np.asarray(require_acc, np.float32)),
            mult, sm)
        return (np.asarray(vals), np.asarray(ids, np.int64),
                np.asarray(n_scanned))


def _merge_over_shards(vals, ids, k, metric):
    """reduce.cpp's per-query merge as one all-gather + re-select."""
    g_vals = jax.lax.all_gather(vals, AXIS)          # [S, B, k]
    g_ids = jax.lax.all_gather(ids, AXIS)
    S, B, kk = g_vals.shape
    flat_v = jnp.transpose(g_vals, (1, 0, 2)).reshape(B, S * kk)
    flat_i = jnp.transpose(g_ids, (1, 0, 2)).reshape(B, S * kk)
    return topk_scores(flat_v, flat_i, k, metric)
