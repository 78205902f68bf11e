"""Tutorial 7: production serving patterns.

Three round-3 capabilities: (a) pipelined sustained-stream bounded
serving — keep one search window in flight so a window's result fetch
overlaps the next window's device execution; (b) error-bounded search
served directly FROM DISK (larger-than-RAM corpora); (c) the
latency-budget mode with a calibrated per-probe cost model.
"""
import _bootstrap  # noqa: F401  (repo-root fallback for script runs)
import os
import tempfile

import numpy as np
import auncel_tpu as at
from auncel_tpu.data import make_clustered_dataset

ds = make_clustered_dataset(nb=200_000, nq=3000, d=64, n_clusters=256,
                            query_mode="perturb", seed=2)
index = at.index_factory(64, "IVF256,Flat")
index.train(ds.xb[:100_000])
index.add(ds.xb)
index.enable_multirow()          # production row layout

gt_D, gt_I = index.exact_search(ds.xq, 100)
es = at.ErrorSys(index, train_num=3000, max_topk=100)
es.set_gt(gt_D, gt_I)
es.sys_train(1000, ds.xq)
es.set_topk(10)
acc = np.full(3000, 0.90, np.float32)
es.set_queries(2000, ds.xq, acc)
es.calibrate(0, 1000, target_bound=0.90)

# (a) sustained-stream serving: windows pipelined depth-2; results and
#     per-query bookkeeping identical to looping es.search()
D, I = es.search_stream(1000, 2000, window=1024)
print("stream served", D.shape[0], "queries; mean probes",
      es.n_scanned[1000:3000].mean().round(1))

# ... or drive the pipeline by hand (e.g. from a request queue):
h1 = es.dispatch_bounded(1000, 1000)     # in flight
h2 = es.dispatch_bounded(2000, 1000)     # queued behind it
D1, I1 = es.finish_bounded(h1)           # fetch overlaps h2's execution
D2, I2 = es.finish_bounded(h2)

# (b) error-bounded search from disk: save the index, serve the mmap
with tempfile.TemporaryDirectory() as tmp:
    from auncel_tpu.index.io import save_index_ondisk
    from auncel_tpu.index.ondisk import OnDiskIVFIndex
    save_index_ondisk(index, os.path.join(tmp, "idx"))
    od = OnDiskIVFIndex(os.path.join(tmp, "idx"))
    od.attach_profile(es.traces, multipler=es.multipler, std_m=es.std_m,
                      max_topk=es.max_topk)
    Dd, Id, my_np = od.search_bounded(ds.xq[1000:1064],
                                      acc[1000:1064], query_k=10)
    print("on-disk bounded search:", Dd.shape, "mean probes",
          my_np.mean().round(1))

# (c) latency budgets instead of recall bounds (ms per query)
budgets = np.full(3000, 5.0, np.float32)
es.set_queries(2000, ds.xq, budgets)
es.calibrate_time()                       # per-probe cost of THIS engine
Db, Ib = es.time_search(1000, 1000)
print("budgeted search: mean probes", es.n_scanned[1000:2000].mean().round(1))
