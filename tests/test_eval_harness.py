"""End-to-end eval-harness smoke tests on tiny synthetic data (CPU).
These drive the same code paths the reference's eval binaries exercise
(bound / effect_error / effect_time / overhead / ELP baseline) and assert
their headline invariants."""

import os

import numpy as np
import pytest

from auncel_tpu.eval_harness import common
from auncel_tpu.eval_harness import bound, effect_error, effect_time
from auncel_tpu.autotune import ParameterSpace, worst_case_recall
from auncel_tpu.types import Metric


@pytest.fixture(autouse=True)
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)


def test_load_synthetic_dataset():
    d = common.load_dataset("synth10K", nq=100)
    assert d.xb.shape == (10_000, 128)
    assert d.xq.shape[0] == 100


def test_big_corpus_and_gt_disk_cache(tmp_path, monkeypatch):
    """>=BIG_CORPUS_ROWS corpora cache their vectors AND exact GT on
    disk (10M-scale evals cost minutes per process otherwise). Scaled
    down via the threshold so the whole path runs on synth10K."""
    monkeypatch.setenv("BENCH_CACHE", str(tmp_path))
    monkeypatch.setattr(common, "BIG_CORPUS_ROWS", 5_000)
    d1 = common.load_dataset("synth10K", nq=60)
    assert (tmp_path / "evalds_synth10K.npz").exists()
    # second load must come from the cache, sliced to the smaller nq
    d2 = common.load_dataset("synth10K", nq=40)
    np.testing.assert_array_equal(d1.xb, d2.xb)
    np.testing.assert_array_equal(d1.xq[:40], d2.xq)

    idx = common.build_or_load_index(d1, nlist=32, cache_dir=str(tmp_path))
    gt_D, gt_I = common.ensure_gt(d1, idx, max_topk=20)
    gtf = tmp_path / f"gt_synth10K_{idx.storage}.npz"
    assert gtf.exists()
    # a fresh EvalData (no in-memory GT) must hit the disk cache —
    # exact_search is forbidden to prove it
    d3 = common.load_dataset("synth10K", nq=40)
    monkeypatch.setattr(
        idx, "exact_search",
        lambda *a, **k: pytest.fail("GT disk cache missed"))
    g3_D, g3_I = common.ensure_gt(d3, idx, max_topk=20)
    np.testing.assert_array_equal(g3_D, gt_D[:40, :20])
    np.testing.assert_array_equal(g3_I, gt_I[:40, :20])


def test_unknown_dataset_raises():
    with pytest.raises(KeyError):
        common.load_dataset("nope")


def test_bound_eval_end_to_end(tmp_path):
    res = bound.run(db="synth10K", ts=200, ses=100, input_k=10,
                    error_bound=0.10, nlist=64, max_topk=50,
                    batch_latency=5, log_dir=str(tmp_path))
    assert res["bound_ok"], res
    assert res["qps"] > 0
    # the driver must serve the production row layout (parity with every
    # other eval driver; a padded-path regression would silently change
    # what the headline latency log measures)
    assert res["multirow_rows"] > 0
    logf = tmp_path / "Auncel_Latency_synth10K_10_10.log"
    assert logf.exists()
    assert len(logf.read_text().splitlines()) == 5


def test_effect_error_end_to_end(tmp_path):
    res = effect_error.run(db="synth10K", ts=200, ses=100, input_k=10,
                           nlist=64, max_topk=50, log_dir=str(tmp_path))
    # with the generous default multipler most mixed bounds must be met
    assert res["satisfaction"] > 0.9
    assert (tmp_path / "Effective_error_synth10K.log").exists()


def test_effect_time_end_to_end(tmp_path):
    res = effect_time.run(db="synth10K", ts=200, ses=100, input_k=10,
                          nlist=64, max_topk=50, log_dir=str(tmp_path),
                          n_measure=12)
    assert res["within_budget"] >= 0.95
    assert np.all(res["model_ms"] > 0)
    # the log now carries MEASURED wall-clock (reference
    # effect_time.cpp:274-312), not the cost model's own output
    assert np.all(np.isfinite(res["measured_ms"]))
    assert np.all(res["measured_ms"] > 0)
    assert res["dispatch_floor_ms"] >= 0
    # cost-model validation against the measurement exists and is sane
    assert np.isfinite(res["model_rel_err"])
    assert (tmp_path / "Effective_time_synth10K.log").exists()


def test_overhead_end_to_end():
    from auncel_tpu.eval_harness import overhead
    res = overhead.run(db="synth10K", ts=200, ses=100, input_k=10,
                       nlist=64, max_topk=50, reps=2)
    assert res["with_elp"] > 0 and res["without_elp"] > 0
    assert np.isfinite(res["overhead"])


def test_index_cache_roundtrip(tmp_path):
    data = common.load_dataset("synth10K", nq=50)
    idx1 = common.build_or_load_index(data, nlist=32,
                                      cache_dir=str(tmp_path))
    idx2 = common.build_or_load_index(data, nlist=32,
                                      cache_dir=str(tmp_path))
    np.testing.assert_array_equal(idx1.centroids, idx2.centroids)


def test_autotune_worst_case_baseline():
    data = common.load_dataset("synth10K", nq=100)
    idx = common.build_or_load_index(data, nlist=64, cache_dir="ti")
    gt_D, _ = common.ensure_gt(data, idx, 50)
    ps = ParameterSpace(idx)
    nprobe = ps.tune_for_bound(data.xq, gt_D, k=10, eps=0.10)
    assert 1 <= nprobe <= 64
    D, _ = idx.search(data.xq, 10, nprobe=nprobe)
    assert worst_case_recall(D, gt_D, 10, Metric.L2) >= 0.9
    # frontier sanity: the full-scan point exists and has perf 1.0
    pts = ps.ops.optimal()
    assert pts[-1].perf >= 0.999


def test_dist_bench_scaling(tmp_path):
    from auncel_tpu.eval_harness import dist_bench
    rows = dist_bench.run(db="synth10K", shard_counts=(1, 4), nq=24,
                          nlist=32, max_topk=20, log_dir=str(tmp_path))
    assert len(rows) == 2
    assert (tmp_path / "Dist_scaling.log").exists()
