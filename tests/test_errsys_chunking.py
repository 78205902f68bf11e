"""Oversized search batches chunk through the largest bucket (the
device-resident window pad only guarantees slices up to it — a clamped
dynamic_slice would silently return wrong windows)."""

import numpy as np

import auncel_tpu as at
from auncel_tpu.data.synthetic import make_clustered_dataset


def test_search_larger_than_max_bucket(monkeypatch):
    ds = make_clustered_dataset(nb=20_000, nq=70, d=32, n_clusters=32,
                                seed=21)
    idx = at.IVFFlatIndex(ds.d, 32)
    idx.train(ds.xb[:10_000])
    idx.add(ds.xb)
    idx.enable_multirow(row_cap=64)
    gt_D, gt_I = idx.exact_search(ds.xq, 40)
    es = at.ErrorSys(idx, train_num=70, max_topk=40)
    es.set_gt(gt_D, gt_I)
    es.sys_train(30, ds.xq)
    es.set_topk(10)
    acc = np.full(70, 0.9, np.float32)
    es.set_queries(70, ds.xq, acc)
    es.set_hyper(4.0, 1.0)
    # (The dense-scan crossover is gated OFF at this corpus size
    # (error_sys.py small-corpus floor), so only the gather engine's
    # bitwise batch-width invariance is asserted here. The dense kernels
    # are value-stable only per window SHAPE — see
    # test_dense_xover.py::test_dense_decide_stream_matches_oneshot.)
    # shrink the buckets so 70 queries exceed the largest one
    monkeypatch.setattr(at.ErrorSys, "BATCH_BUCKETS", (1, 16, 32))
    D_chunk, I_chunk = es.search(0, 70)
    np1 = es.my_nprobe[:70].copy()
    monkeypatch.setattr(at.ErrorSys, "BATCH_BUCKETS", (1, 16, 128))
    es._dev_cache = None   # pad depends on the bucket table
    D_one, I_one = es.search(0, 70)
    np2 = es.my_nprobe[:70].copy()
    np.testing.assert_array_equal(np1, np2)
    np.testing.assert_array_equal(D_chunk, D_one)
    np.testing.assert_array_equal(I_chunk, I_one)

    # pipelined stream serving returns the same results and bookkeeping
    # as looping search() over the same windows
    D_st, I_st = es.search_stream(0, 70, window=32, depth=2)
    np_st = es.my_nprobe[:70].copy()
    np.testing.assert_array_equal(np_st, np2)
    np.testing.assert_array_equal(D_st, D_one)
    np.testing.assert_array_equal(I_st, I_one)
