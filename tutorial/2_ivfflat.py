"""Tutorial 2: IVF-Flat approximate search (reference tutorial 3-IVFFlat)."""
import _bootstrap  # noqa: F401  (repo-root fallback for script runs)
import numpy as np
import auncel_tpu as at
from auncel_tpu.data import make_clustered_dataset

ds = make_clustered_dataset(nb=200_000, nq=10, d=64, n_clusters=256, seed=1)
index = at.index_factory(64, "IVF256,Flat")
index.train(ds.xb[:100_000])   # k-means coarse quantizer on the MXU
index.add(ds.xb)

for nprobe in (1, 8, 64):
    D, I = index.search(ds.xq, k=4, nprobe=nprobe)
    print(f"nprobe={nprobe}: first query ->", I[0])
