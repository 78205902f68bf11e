"""HNSW at 1M on the TPU with build-cost accounting (round-4 VERDICT #7).

Builds a 1M x 128 HNSW (M=16) with the frozen-batch pipeline at two
construction budgets, reports recall@10 at ef in {32, 64, 128} vs exact
GT, and the build wall-clock per phase. The reference builds HNSW by
per-point incremental insertion at efConstruction=40 (HNSW.cpp defaults);
the frozen-batch design needs a richer candidate pool (efc=80 measured at
200K, RESULTS_r3) because in-batch points cannot serve as candidates —
this run prices that tax at 1M.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.hnsw import HNSWIndex
from auncel_tpu.index.flat import FlatIndex

T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:8.1f} s] {m}", file=sys.stderr, flush=True)


def recall(I, gt, k=10):
    return float(np.mean([len(set(a[:k].tolist()) & set(b[:k].tolist())) / k
                          for a, b in zip(I, gt)]))


def main(nb=1_000_000, efc=80, passes=2):
    nb, efc, passes = int(nb), int(efc), int(passes)
    os.environ["AUNCEL_HNSW_PROGRESS"] = "1"  # phase logs survive a kill
    ds = make_clustered_dataset(nb=nb, nq=256, d=128,
                                n_clusters=max(nb // 400, 64), seed=3)
    log(f"dataset ready: {nb} x 128")
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    t0 = time.time()
    _, gti = flat.search(ds.xq, 10)
    log(f"exact GT in {time.time() - t0:.1f} s")

    idx = HNSWIndex(ds.d, M=16, ef_construction=efc, refine_passes=passes)
    t0 = time.time()
    idx.add(ds.xb)
    idx.build()
    build_s = time.time() - t0
    log(f"build done in {build_s:.1f} s (efc={efc}, refine x{passes})")

    rows = []
    for ef in (32, 64, 128):
        t0 = time.time()
        _, i = idx.search(ds.xq, 10, ef=ef)
        dt = time.time() - t0
        r = recall(i, gti)
        rows.append(dict(ef=ef, recall10=round(r, 4),
                         qps=round(256 / dt, 1)))
        log(json.dumps(rows[-1]))
    out = dict(nb=nb, efc=efc, refine_passes=passes,
               build_seconds=round(build_s, 1), rows=rows)
    with open(f"HNSW1M_efc{efc}.log", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote HNSW1M log")


if __name__ == "__main__":
    main(*sys.argv[1:])
