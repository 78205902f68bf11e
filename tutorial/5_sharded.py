"""Tutorial 5: multi-chip sharded bounded search (reference dist/ mode).

Run with simulated devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python tutorial/5_sharded.py
"""
import _bootstrap  # noqa: F401  (repo-root fallback for script runs)
import os
import numpy as np
import jax
if "host_platform_device_count" in os.environ.get("XLA_FLAGS", ""):
    # the documented simulated-mesh invocation: pick CPU BEFORE the first
    # jax.devices() call, which would otherwise initialize (and, when the
    # tunnel is down, hang on) the real accelerator backend
    jax.config.update("jax_platforms", "cpu")
if len(jax.devices()) < 4:
    jax.config.update("jax_platforms", "cpu")
from auncel_tpu.parallel import ShardedIVF, make_mesh
from auncel_tpu.data import make_clustered_dataset

n_shards = min(4, len(jax.devices()))
ds = make_clustered_dataset(nb=40_000, nq=32, d=32, n_clusters=64, seed=4)
s = ShardedIVF(ds.d, nlist=32, n_shards=n_shards, mesh=make_mesh(n_shards))
s.build(ds.xb)                        # per-shard IVF (dist/worker "train")
s.train_profiles(ds.xq[:16], max_topk=50)
s.multipler = 8.0
acc = np.full(32, 0.9, np.float32)
vals, ids, n_scanned = s.search_bounded(ds.xq, acc, query_k=10)
print("global top-3 ids:", ids[:2, :3])
print("per-shard mean lists scanned:", n_scanned.mean(axis=1))

# --- Elastic degradation: a shard's device dies; survivors keep serving
# (the reference's master would hang on the dead worker's recv,
# dist/master.cpp:91-99). Profiles are partition-local state and are
# re-staged from a host mirror; global recall degrades by the dropped
# partition's corpus share while each survivor's bound still holds.
if n_shards > 1:
    s.drop_shard(0)
    vals, ids, n_scanned = s.search_bounded(ds.xq, acc, query_k=10)
    print(f"after drop_shard: {s.n_shards} shards, "
          f"top-3 ids: {ids[:1, :3]}")

# --- 2D scale-out: [dp, shard] mesh = query data-parallel groups over
# corpus replicas (needs dp * n_shards devices):
#   s = ShardedIVF(d, nlist, n_shards=4, mesh=make_mesh(4, dp=2))
