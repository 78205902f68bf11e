"""Tutorial 3: per-query error-bounded search — the Auncel capability.

Each query carries its own recall requirement; the engine terminates
multi-probe search per query as early as its trained error profile allows.
"""
import _bootstrap  # noqa: F401  (repo-root fallback for script runs)
import numpy as np
import auncel_tpu as at
from auncel_tpu.data import make_clustered_dataset

ds = make_clustered_dataset(nb=200_000, nq=2000, d=64, n_clusters=256,
                            query_mode="perturb", seed=2)
index = at.index_factory(64, "IVF256,Flat")
index.train(ds.xb[:100_000])
index.add(ds.xb)

# offline: ground truth + phi->U error profile on the first 1000 queries
gt_D, gt_I = index.exact_search(ds.xq, 100)
es = at.ErrorSys(index, train_num=2000, max_topk=100)
es.set_gt(gt_D, gt_I)
es.sys_train(1000, ds.xq)

# online: every query demands recall@10 >= 0.9
es.set_topk(10)
acc = np.full(2000, 0.90, np.float32)
es.set_queries(1000, ds.xq, acc)
es.calibrate(0, 1000, target_bound=0.90)   # auto (multipler, std_m)
D, I = es.search(1000, 1000)

from auncel_tpu.autotune import recall_counts
cnt = recall_counts(D, gt_D[1000:], 10, index.metric)
print(f"worst-case recall: {cnt.min() / 10:.2f} (bound 0.90)")
print(f"mean lists scanned: {es.n_scanned[1000:].mean():.1f} / 256")
