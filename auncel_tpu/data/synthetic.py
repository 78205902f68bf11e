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
    cluster_std: float = 0.25,
    hard_frac: float = 0.5,
) -> Dataset:
    """Gaussian mixture in [0,1]^d, SIFT-like scale (x512).

    ``cluster_std=0.25`` is tuned (at d=128, nlist=nb/400) so the index
    behaves like real SIFT/DEEP: easy queries resolve in their home cell
    (recall@nprobe=1 ~ 0.9) while the hardest queries' true top-10 spread
    over up to ~20% of nlist coarse ranks — a real difficulty gradient with
    a bounded worst case. ``hard_frac`` of the queries are drawn wider
    (farther from cluster cores, nearer Voronoi boundaries); their variance
    is what Auncel's per-query bounded termination exploits.
    """
    rng = np.random.RandomState(seed)
    centers = rng.rand(n_clusters, d).astype(np.float32)
    scale = 512.0

    def draw(n, widen=1.0):
        which = rng.randint(0, n_clusters, size=n)
        pts = centers[which] + rng.randn(n, d).astype(np.float32) * (
            cluster_std * widen)
        return (pts * scale).astype(np.float32)

    xb = draw(nb)
    # Queries follow the corpus distribution (like real SIFT/DEEP query
    # sets, which are held-out samples): "hard" queries are drawn wider —
    # farther from their cluster core, hence nearer Voronoi boundaries —
    # but still inside populated regions. Queries in empty space between
    # clusters are NOT generated: no IVF index (or error model) serves
    # those, and real benchmark queries don't look like that.
    n_hard = int(nq * hard_frac)
    xq = np.concatenate([draw(nq - n_hard, widen=1.0),
                         draw(n_hard, widen=1.5)])
    rng.shuffle(xq)
    xt = draw(nt) if nt is not None else xb
    if metric is Metric.IP:
        # Reference TEXT10M is L2-normalized for IP search (bound.cpp:243-248).
        xb = xb / np.linalg.norm(xb, axis=1, keepdims=True)
        xq = xq / np.linalg.norm(xq, axis=1, keepdims=True)
        xt = xt / np.linalg.norm(xt, axis=1, keepdims=True)
    return Dataset(xb, xq, xt, metric)
