"""Tutorial 5: multi-chip sharded bounded search (reference dist/ mode).

Run with simulated devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python tutorial/5_sharded.py
"""
import numpy as np
import jax
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
