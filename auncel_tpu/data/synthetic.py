"""Synthetic datasets for tests and self-contained benchmarks.

The reference validates on SIFT/DEEP/TEXT/GIST files the user must download;
its unit tests use synthetic Gaussians (``tests/common.py get_dataset_2``).
We provide a clustered Gaussian-mixture generator: cluster structure makes
IVF pruning meaningful (uniform data would make every list equidistant and
the error profile degenerate), which is what the bound experiments need.
"""

from typing import NamedTuple

import numpy as np

from auncel_tpu.types import Metric


class Dataset(NamedTuple):
    xb: np.ndarray        # corpus [nb, d]
    xq: np.ndarray        # queries [nq, d]
    xt: np.ndarray        # train vectors for index construction [nt, d]
    metric: Metric

    @property
    def d(self) -> int:
        return self.xb.shape[1]


def make_clustered_dataset(
    nb: int,
    nq: int,
    d: int,
    n_clusters: int = 512,
    nt: int | None = None,
    seed: int = 0,
    metric: Metric = Metric.L2,
    cluster_std: float = 0.35,
    hard_frac: float = 0.5,
) -> Dataset:
    """Overlapping Gaussian mixture in [0,1]^d, SIFT-like scale (x512).

    ``cluster_std`` is chosen so clusters overlap (intra/inter distance
    ratio > 1): a query's true neighbors then spread across several IVF
    cells and recall grows gradually with nprobe, like real SIFT/DEEP.
    ``hard_frac`` of the queries are drawn near the midpoint of two cluster
    centers — the near-Voronoi-boundary queries whose per-query difficulty
    variance Auncel's bounded termination exists to exploit.
    """
    rng = np.random.RandomState(seed)
    centers = rng.rand(n_clusters, d).astype(np.float32)
    scale = 512.0

    def draw(n, widen=1.0):
        which = rng.randint(0, n_clusters, size=n)
        pts = centers[which] + rng.randn(n, d).astype(np.float32) * (
            cluster_std * widen)
        return (pts * scale).astype(np.float32)

    def draw_hard(n):
        # Interpolate toward each cluster's NEAREST neighbor cluster: the
        # query sits near a real Voronoi boundary between two populated
        # cells (hard for IVF) without landing in empty space between far
        # clusters (which no ANN index or error model can serve — real
        # SIFT/DEEP queries are near the data manifold).
        a_idx = rng.randint(0, n_clusters, size=n)
        a = centers[a_idx]
        # nearest-other-center per chosen cluster (blocked to bound memory)
        nn_idx = np.empty(n, np.int64)
        for s in range(0, n, 1024):
            e = min(s + 1024, n)
            dd = ((centers[a_idx[s:e], None, :] -
                   centers[None, :, :]) ** 2).sum(-1)
            dd[np.arange(e - s), a_idx[s:e]] = np.inf
            nn_idx[s:e] = dd.argmin(1)
        b = centers[nn_idx]
        t = rng.uniform(0.25, 0.5, size=(n, 1)).astype(np.float32)
        pts = a * (1 - t) + b * t + rng.randn(n, d).astype(
            np.float32) * cluster_std
        return (pts * scale).astype(np.float32)

    xb = draw(nb)
    n_hard = int(nq * hard_frac)
    xq = np.concatenate([draw(nq - n_hard, widen=1.25), draw_hard(n_hard)])
    rng.shuffle(xq)
    xt = draw(nt) if nt is not None else xb
    if metric is Metric.IP:
        # Reference TEXT10M is L2-normalized for IP search (bound.cpp:243-248).
        xb = xb / np.linalg.norm(xb, axis=1, keepdims=True)
        xq = xq / np.linalg.norm(xq, axis=1, keepdims=True)
        xt = xt / np.linalg.norm(xt, axis=1, keepdims=True)
    return Dataset(xb, xq, xt, metric)
