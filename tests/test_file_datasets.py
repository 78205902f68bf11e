"""Real-data readiness drill: synthetic data written through the
fvecs/ivecs writers into the reference's $AUNCEL_DATA_ROOT/sift1M layout,
then the bound eval runs END TO END off those files (reference
eval/bound.cpp:29-114 readers + :160-210 dataset table). Proves the file
pipeline — readers, GT files, metric handling — before real datasets
ever appear."""

import os

import numpy as np
import pytest

from auncel_tpu.data.io import fvecs_write, ivecs_write, fvecs_read, \
    ivecs_read
from auncel_tpu.data.synthetic import make_clustered_dataset


def test_fvecs_ivecs_roundtrip(tmp_path):
    x = np.random.RandomState(0).randn(100, 24).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    fvecs_write(p, x)
    np.testing.assert_array_equal(fvecs_read(p), x)
    i = np.random.RandomState(1).randint(0, 1000, (50, 10)).astype(np.int32)
    pi = str(tmp_path / "i.ivecs")
    ivecs_write(pi, i)
    np.testing.assert_array_equal(ivecs_read(pi), i)


def test_bound_eval_from_files(tmp_path, monkeypatch):
    """Write a small corpus in the sift1M file layout and drive
    eval_harness.bound off it — the same code path a real SIFT download
    would exercise."""
    from auncel_tpu.eval_harness import common, bound
    from auncel_tpu.index.flat import FlatIndex

    ds = make_clustered_dataset(nb=20_000, nq=60, d=32, n_clusters=64,
                                seed=77)
    root = tmp_path / "data"
    d1 = root / "sift1M"
    os.makedirs(d1)
    fvecs_write(str(d1 / "sift_base.fvecs"), ds.xb)
    fvecs_write(str(d1 / "sift_query.fvecs"), ds.xq)
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    gt_D, gt_I = flat.search(ds.xq, 50)
    ivecs_write(str(d1 / "sift_groundtruth.ivecs"),
                gt_I.astype(np.int32))
    fvecs_write(str(d1 / "sift_gtd.fvecs"), gt_D)

    monkeypatch.setattr(common, "DATA_ROOT", str(root))
    data = common.load_dataset("sift1M", nq=60)
    assert data.xb.shape == (20_000, 32)
    assert data.gt_I is not None and data.gt_D is not None

    out = bound.run("sift1M", ts=30, ses=30, input_k=10,
                    error_bound=0.10, nlist=64, max_topk=50,
                    calibrate=True, batch_latency=10,
                    log_dir=str(tmp_path))
    log = tmp_path / "Auncel_Latency_sift1M_10_10.log"
    assert log.exists(), "reference-format log written"
    if isinstance(out, dict):
        assert out.get("bound_ok", True)
