"""Tutorial 6: the index zoo — graph, product-quantized, multi-index and
on-disk variants (reference tutorial/cpp + c_api coverage)."""
import _bootstrap  # noqa: F401  (repo-root fallback for script runs)
import os
import tempfile

import numpy as np
import auncel_tpu as at
from auncel_tpu.data import make_clustered_dataset

ds = make_clustered_dataset(nb=50_000, nq=8, d=64, n_clusters=128, seed=3)

# HNSW graph index: no training pass, tune ef at query time.
hnsw = at.index_factory(64, "HNSW16")
hnsw.add(ds.xb)
D, I = hnsw.search(ds.xq, k=4, ef=64)
print("HNSW16 ef=64:", I[0])

# Standalone PQ: 8 bytes per vector, optional polysemous Hamming filter.
pq = at.index_factory(64, "PQ8")
pq.train(ds.xb[:20_000])
pq.add(ds.xb)
D, I = pq.search(ds.xq, k=4)
print("PQ8:", I[0])

# IMI coarse cells: 4096 product cells from 2x64 trained centroids.
imi = at.index_factory(64, "IMI2x6,Flat")
imi.train(ds.xb[:20_000])
imi.add(ds.xb)
D, I = imi.search(ds.xq, k=4, nprobe=64)
print("IMI2x6:", I[0])

# On-disk serving: searches page only the probed lists from the mmap.
ivf = at.index_factory(64, "IVF128,Flat")
ivf.train(ds.xb[:20_000])
ivf.add(ds.xb)
with tempfile.TemporaryDirectory() as tmp:
    from auncel_tpu.index.io import save_index_ondisk
    from auncel_tpu.index.ondisk import OnDiskIVFIndex
    path = os.path.join(tmp, "idx")
    save_index_ondisk(ivf, path)
    od = OnDiskIVFIndex(path)
    D, I = od.search(ds.xq, k=4, nprobe=16)
    print("on-disk IVF128:", I[0])

# IVFPQR: IVFPQ plus a refinement PQ — candidates are re-ranked through a
# finer two-stage reconstruction (k_factor * k candidates per query).
pqr = at.index_factory(64, "IVF128,PQ8+8")
pqr.train(ds.xb[:20_000])
pqr.add(ds.xb)
D, I = pqr.search(ds.xq, k=4, nprobe=16)
print("IVF128,PQ8+8:", I[0])

# HNSW over two-level codes: 4+8 bytes per vector (coarse id + PQ residual),
# the big-build recipe — transfer the codes into a real IVFPQ afterwards.
h2l = at.index_factory(64, "HNSW16_128+PQ8")
h2l.train(ds.xb[:20_000])
h2l.add(ds.xb)
h2l.build()
D, I = h2l.search(ds.xq, k=4, ef=64)
print("HNSW16_128+PQ8:", I[0])
ivfpq = h2l.storage.transfer_to_ivfpq()      # codes move, not re-encoded
D, I = ivfpq.search(ds.xq, k=4, nprobe=16)
print("transferred IVFPQ:", I[0])
