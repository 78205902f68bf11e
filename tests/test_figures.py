"""Figure-module tests: every plot function renders a PNG from
reference-format logs (component #34)."""

import os

import numpy as np
import pytest

from auncel_tpu.figures import plots


@pytest.fixture()
def logs(tmp_path, rng):
    lat_a = tmp_path / "a.log"
    lat_b = tmp_path / "b.log"
    np.savetxt(lat_a, np.abs(rng.randn(100)) * 1e-3 + 1e-4)
    np.savetxt(lat_b, np.abs(rng.randn(100)) * 2e-3 + 2e-4)
    eff = tmp_path / "eff.log"
    req = rng.choice([0.9, 0.7, 0.5], 100)
    ach = np.clip(req + np.abs(rng.randn(100)) * 0.05, 0, 1.2)
    np.savetxt(eff, np.stack([req, ach], 1))
    tb = tmp_path / "tb.log"
    budget = rng.choice([5.0, 10.0, 20.0], 100)
    actual = budget * rng.uniform(0.3, 0.95, 100)
    np.savetxt(tb, np.stack([budget, actual], 1))
    return tmp_path, lat_a, lat_b, eff, tb


def test_latency_cdf(logs, tmp_path):
    d, a, b, _, _ = logs
    out = str(tmp_path / "f10.png")
    plots.latency_cdf({"ours": str(a), "baseline": str(b)}, out)
    assert os.path.getsize(out) > 1000


def test_latency_slowdown(logs, tmp_path):
    d, a, b, _, _ = logs
    out = str(tmp_path / "f11.png")
    ratio = plots.latency_slowdown(str(b), str(a), out)
    assert ratio > 1.0  # baseline is slower by construction


def test_bound_satisfaction(logs, tmp_path):
    d, _, _, eff, _ = logs
    out = str(tmp_path / "f13.png")
    sat = plots.bound_satisfaction(str(eff), out)
    assert sat == 1.0


def test_time_budget(logs, tmp_path):
    d, _, _, _, tb = logs
    out = str(tmp_path / "f14.png")
    within = plots.time_budget(str(tb), out)
    assert within == 1.0


def test_dist_scaling(tmp_path):
    out = str(tmp_path / "f16.png")
    plots.dist_scaling([4, 8, 16], [10.0, 6.0, 3.5], out)
    assert os.path.getsize(out) > 1000


def test_validation_map(tmp_path):
    from auncel_tpu.data.synthetic import make_clustered_dataset
    from auncel_tpu.index.ivf import IVFFlatIndex
    from auncel_tpu.profile.error_sys import ErrorSys
    ds = make_clustered_dataset(nb=5000, nq=50, d=16, n_clusters=16, seed=3)
    idx = IVFFlatIndex(ds.d, nlist=32)
    idx.train(ds.xb[:2500])
    idx.add(ds.xb)
    gt_D, gt_I = idx.exact_search(ds.xq, 20)
    es = ErrorSys(idx, 50, 20)
    es.set_gt(gt_D, gt_I)
    es.sys_train(50, ds.xq, bs=5)
    out = str(tmp_path / "f15.png")
    plots.validation_map(es, 0, out)
    assert os.path.getsize(out) > 1000
