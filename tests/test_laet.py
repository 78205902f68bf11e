"""Learned early-termination baseline tests (reference LAET capability)."""

import numpy as np
import pytest

from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.baselines.laet import LearnedTermination
from auncel_tpu.autotune import recall_counts


@pytest.fixture(scope="module")
def setup():
    ds = make_clustered_dataset(nb=20000, nq=300, d=32, n_clusters=64,
                                seed=13)
    idx = IVFFlatIndex(ds.d, nlist=64)
    idx.train(ds.xt[:10000])
    idx.add(ds.xb)
    gt_D, gt_I = idx.exact_search(ds.xq, 50)
    return ds, idx, gt_D, gt_I


def test_laet_learns_and_terminates(setup):
    ds, idx, gt_D, gt_I = setup
    lt = LearnedTermination(idx, query_k=10, max_topk=50)
    loss = lt.train(ds.xq[:200], gt_I[:200], epochs=200)
    assert np.isfinite(loss)
    mult = lt.tune_multiplier(ds.xq[200:250], gt_D[200:250],
                              target_recall=0.95)
    D, I, nprobe = lt.search(ds.xq[250:300], 10)
    rec = recall_counts(D, gt_D[250:300], 10, idx.metric).mean() / 10
    assert rec >= 0.85          # tuned on held-out; loose generalization
    assert nprobe.mean() < 64   # actually terminates early on average
    assert nprobe.std() > 0     # per-query adaptivity


def test_laet_prediction_tracks_difficulty(setup):
    """Queries whose GT needs more lists should get larger predictions on
    average (the predictor learned something)."""
    ds, idx, gt_D, gt_I = setup
    lt = LearnedTermination(idx, query_k=10, max_topk=50)
    lt.train(ds.xq[:200], gt_I[:200], epochs=200)
    labels = lt._labels(ds.xq[200:300], gt_I[200:300])
    lt.multiplier = 1.0
    pred = lt.predict_nprobe(ds.xq[200:300])
    hard = labels > np.median(labels)
    if hard.any() and (~hard).any():
        assert pred[hard].mean() > pred[~hard].mean()
