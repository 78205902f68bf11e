"""Tutorial 4: compressed storage codecs (SQ8 / SQ4 / PQ with OPQ)."""
import _bootstrap  # noqa: F401  (repo-root fallback for script runs)
import auncel_tpu as at
from auncel_tpu.data import make_clustered_dataset

ds = make_clustered_dataset(nb=100_000, nq=10, d=64, n_clusters=128, seed=3)
for desc in ("IVF128,Flat", "IVF128,SQ8", "IVF128,SQ4", "IVF128,PQ8",
             "OPQ8,IVF128,PQ8"):
    index = at.index_factory(64, desc)
    index.train(ds.xb[:50_000])
    index.add(ds.xb)
    D, I = index.search(ds.xq, k=4, nprobe=16) if hasattr(
        index, "nprobe") else index.search(ds.xq, 4)
    print(f"{desc:18s} first query ->", I[0])
