"""Populate the 10M caches (corpus npz, trained quantizer, sq8 GT) that
every synthDeep10M eval job reads — a fresh round machine starts with
.bench_cache/ and trained_index/ empty, and each cold 10M setup costs
~12 min of generation + k-means + exact GT; warming once up front keeps
the later queue jobs measuring search, not setup."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from auncel_tpu.eval_harness import common

T0 = time.time()


def log(m):
    print(f"[{time.time() - T0:8.1f} s] {m}", file=sys.stderr, flush=True)


def main(db="synthDeep10M", storage="sq8", nq=4000):
    data = common.load_dataset(db, nq=int(nq))
    log(f"dataset {db} ready: xb {data.xb.shape}, xq {data.xq.shape}")
    idx = common.build_or_load_index(data, nlist=1024, storage=storage)
    log("index built (quantizer cached)")
    common.ensure_gt(data, idx, 100)
    log("GT cached")


if __name__ == "__main__":
    main(*sys.argv[1:])
