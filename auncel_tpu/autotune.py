"""Worst-case auto-tuning baseline ("ELP").

Capability parity with the reference's baseline 1
(``/root/reference/faiss/AutoTune.cpp`` modifications, SURVEY.md §2 #32):
a global parameter sweep that, unlike stock Faiss auto-tuning, scores each
operating point by the *minimum* recall over queries (worst case, not mean;
``faiss/AutoTune.cpp:93-101``) and always includes the ``nprobe = nlist``
full-scan point (``:630-634``). The evaluation picks the cheapest operating
point whose worst-case recall meets ``1 - eps`` and runs all queries at that
fixed nprobe — the "one global knob" strawman Auncel's per-query bounds beat.

Implemented as a small library: ``OperatingPoints`` keeps the Pareto
frontier over (perf, cost); ``ParameterSpace.explore`` sweeps nprobe.
"""

import time
from dataclasses import dataclass, field

import numpy as np

from auncel_tpu.types import Metric
from auncel_tpu.index.ivf import IVFFlatIndex


@dataclass
class OperatingPoint:
    key: str          # e.g. "nprobe=16"
    perf: float       # worst-case recall in [0, 1]
    cost: float       # avg seconds/query


@dataclass
class OperatingPoints:
    """Pareto frontier: keep points not dominated in (perf up, cost down)
    (reference OperatingPoints, AutoTune.cpp:121-...)."""
    all_pts: list = field(default_factory=list)

    def add(self, pt: OperatingPoint):
        self.all_pts.append(pt)

    def optimal(self) -> list[OperatingPoint]:
        pts = sorted(self.all_pts, key=lambda p: (p.cost, -p.perf))
        frontier = []
        best = -1.0
        for p in pts:
            if p.perf > best:
                frontier.append(p)
                best = p.perf
        return frontier

    def cheapest_meeting(self, target_perf: float) -> OperatingPoint | None:
        for p in self.optimal():
            if p.perf >= target_perf:
                return p
        return None


def recall_counts(D: np.ndarray, gt_D: np.ndarray, k: int,
                  metric: Metric) -> np.ndarray:
    """Distance-threshold intersection count per query (reference
    ``inter_sec``, eval/bound.cpp:117-128). The slack is RELATIVE: the
    reference's absolute 1e-6 silently fails at large distance scales when
    the k-th GT distance is hit by a vector whose distance was computed by
    a differently-shaped (equally exact) kernel."""
    thresh = gt_D[:, k - 1]
    slack = np.maximum(1e-6, 1e-5 * np.abs(thresh))
    if metric is Metric.L2:
        cnt = (D[:, :k] <= (thresh + slack)[:, None]).sum(1)
    else:
        cnt = (D[:, :k] >= (thresh - slack)[:, None]).sum(1)
    return np.minimum(cnt, k)


def worst_case_recall(D: np.ndarray, gt_D: np.ndarray, k: int,
                      metric: Metric) -> float:
    """min over queries of the distance-threshold intersection (the
    worst-case IntersectionCriterion, faiss/AutoTune.cpp:93-101)."""
    return float(recall_counts(D, gt_D, k, metric).min() / k)


class ParameterSpace:
    """nprobe sweep with the worst-case criterion. The reference
    additionally sweeps ht/k_factor/efSearch for index types this framework
    doesn't implement yet (AutoTune.cpp:347-...)."""

    def __init__(self, index: IVFFlatIndex):
        self.index = index
        self.ops = OperatingPoints()

    def candidate_nprobes(self) -> list[int]:
        nlist = self.index.nlist
        cands = []
        np_ = 1
        while np_ < nlist:
            cands.append(np_)
            np_ <<= 1
        cands.append(nlist)  # forced full-scan point (faiss/AutoTune.cpp:630)
        return cands

    def explore(self, xq: np.ndarray, gt_D: np.ndarray, k: int,
                reps: int = 2) -> OperatingPoints:
        for nprobe in self.candidate_nprobes():
            D, _ = self.index.search(xq, k, nprobe=nprobe)  # warm
            t0 = time.perf_counter()
            for _ in range(reps):
                D, _ = self.index.search(xq, k, nprobe=nprobe)
            np.asarray(D)
            dt = (time.perf_counter() - t0) / reps / xq.shape[0]
            perf = worst_case_recall(D, gt_D, k, self.index.metric)
            self.ops.add(OperatingPoint(f"nprobe={nprobe}", perf, dt))
        return self.ops

    def tune_for_bound(self, xq, gt_D, k: int, eps: float) -> int:
        """Pick the smallest nprobe whose WORST-case recall >= 1 - eps
        (the reference baseline eval, faiss/eval/bound.cpp:338-440)."""
        self.explore(xq, gt_D, k)
        pt = self.ops.cheapest_meeting(1.0 - eps)
        if pt is None:
            return self.index.nlist
        return int(pt.key.split("=")[1])
