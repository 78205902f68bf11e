"""Batch-amortized dense auto-routing (ErrorSys.dense_auto).

The reference switches its kNN driver to a shared SGEMM over the corpus
at >= 20 queries (distance_compute_blas_threshold,
/root/reference/Auncel/utils.cpp:538-622). The bounded engine's analog is
batch-global: when a window's total decided budget (bsz x calibrated mean
scan) exceeds dense_auto_factor x nlist, the whole window is served
through the shared corpus pass (dense_cut=0.0). Contracts under test:

  1. the flip keys on the window size — B=1 latency windows never flip;
  2. routing NEVER alters results (dense pass == gather tail bitwise for
     the same budgets, repo invariant);
  3. calibrate() records the holdout mean scan that drives the policy;
  4. the small-corpus floor (< 2048 multirow rows) suppresses the flip.
"""

import numpy as np
import pytest

from auncel_tpu.data import make_clustered_dataset
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.profile.error_sys import ErrorSys


@pytest.fixture(scope="module")
def es_big():
    """200K x 16 (multirow rows >= 2048, passing the production floor)
    with overlapping clusters so decided budgets are non-trivial."""
    ds = make_clustered_dataset(nb=200_000, nq=100, d=16, n_clusters=64,
                                cluster_std=0.45, seed=7)
    idx = IVFFlatIndex(16, 512)
    idx.train(ds.xt[:50_000])
    idx.add(ds.xb)
    idx.enable_multirow(row_cap=64)   # ~3200 rows: over the 2048 floor
    assert idx.multirow.rows.db.shape[0] >= 2048
    gt_D, gt_I = idx.exact_search(ds.xq, 32)
    es = ErrorSys(idx, train_num=100, max_topk=32)
    es.set_gt(gt_D, gt_I)
    es.sys_train(50, ds.xq)
    es.set_topk(10)
    es.set_queries(50, ds.xq, np.full(100, 0.9, np.float32))
    return es


def test_auto_flip_keys_on_window_size(es_big):
    es = es_big
    es.dense_auto, es.dense_cut = True, 0.25
    es._dense_min_bsz = 512   # fabricated measured crossover
    # (plan stores the cut in row units: 0 = every query dense,
    #  > 0 = per-query threshold, < 0 = no dense program)
    # 1024-query window >= the measured crossover -> dense
    assert es._mr_oneshot_plan(1024).dense_cut_rows == 0
    # B=1 latency window: below the crossover -> per-query routing
    assert es._mr_oneshot_plan(1).dense_cut_rows > 0
    # no window size given (budget engines): never flips
    assert es._mr_oneshot_plan().dense_cut_rows > 0
    # disabled: explicit config wins
    es.dense_auto = False
    assert es._mr_oneshot_plan(1024).dense_cut_rows > 0
    es.dense_auto = True
    # no measured crossover yet (or dense lost the probe): no flip
    es._dense_min_bsz = None
    assert es._mr_oneshot_plan(1024).dense_cut_rows > 0


def test_auto_routing_never_alters_results(es_big):
    es = es_big
    es._dense_min_bsz = None
    es.dense_auto = False
    D0, I0 = es.search(50, 50)
    ns0 = es.n_scanned[50:100].copy()
    es.dense_auto = True
    es._dense_min_bsz = 1  # force the flip at every window size
    D1, I1 = es.search(50, 50)
    np.testing.assert_array_equal(I0, I1)
    np.testing.assert_allclose(D0, D1, rtol=1e-5)
    np.testing.assert_array_equal(ns0, es.n_scanned[50:100])


def test_calibrate_records_stats_and_probes_crossover(es_big):
    es = es_big
    es._cal_mean_scan = None
    es._dense_min_bsz = None
    es.calibrate(0, 50, target_bound=0.9)
    assert es._cal_mean_scan is not None and es._cal_mean_scan > 0
    # the probe either measured a dense win (positive crossover) or left
    # routing on gathers — both are valid outcomes of a real timing
    assert es._dense_min_bsz is None or es._dense_min_bsz >= 1


def test_small_corpus_floor_suppresses_flip():
    ds = make_clustered_dataset(nb=4_000, nq=10, d=16, n_clusters=16,
                                seed=3)
    idx = IVFFlatIndex(16, 16)
    idx.train(ds.xt)
    idx.add(ds.xb)
    idx.enable_multirow()
    assert idx.multirow.rows.db.shape[0] < 2048
    gt_D, gt_I = idx.exact_search(ds.xq, 16)
    es = ErrorSys(idx, train_num=10, max_topk=16)
    es.set_gt(gt_D, gt_I)
    es.sys_train(5, ds.xq)
    es.set_topk(5)
    es.set_queries(5, ds.xq, np.full(10, 0.9, np.float32))
    es.dense_auto, es._dense_min_bsz = True, 1
    # the floor nulls the cut entirely on tiny corpora
    assert es._mr_oneshot_plan(1024).dense_cut_rows < 0
