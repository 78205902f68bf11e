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


def one_recall_at_r(I: np.ndarray, gt_I: np.ndarray, R: int) -> float:
    """Fraction of queries whose TRUE nearest neighbor appears in the
    first R results (reference OneRecallAtRCriterion::evaluate,
    AutoTune.cpp:75-91 — the criterion the reference's 1-recall@R plots
    use)."""
    nn = gt_I[:, 0][:, None]
    return float(np.mean((I[:, :R] == nn).any(1)))


def intersection_at_r(I: np.ndarray, gt_I: np.ndarray, R: int) -> float:
    """Mean |top-R results ∩ top-R GT| / R by ids (reference
    IntersectionCriterion::evaluate, AutoTune.cpp:93-113 — the MEAN
    criterion; worst_case_recall above is its per-query min by distance
    threshold, the form the bound checker needs)."""
    hits = 0
    for r, g in zip(I[:, :R], gt_I[:, :R]):
        hits += len(set(r.tolist()) & set(g.tolist()))
    return hits / (len(I) * R)


def set_index_parameter(index, name: str, value) -> None:
    """Single-knob setter (reference ParameterSpace::set_index_parameter,
    AutoTune.cpp:455-520) for the implemented index families."""
    from auncel_tpu.index.hnsw import HNSWIndex
    from auncel_tpu.index.pq_index import IndexPQ
    from auncel_tpu.index.flat import IndexRefineFlat
    if name == "k_factor" and isinstance(index, IndexRefineFlat):
        index.k_factor = float(value)
        return
    if isinstance(index, IndexRefineFlat):
        return set_index_parameter(index.base, name, value)
    from auncel_tpu.index.ivfpqr import IndexIVFPQR
    if name == "k_factor" and isinstance(index, IndexIVFPQR):
        # AutoTune.cpp:534-538 (IVFPQR k_factor knob)
        index.k_factor = float(value)
        return
    if name == "nprobe" and isinstance(index, IVFFlatIndex):
        index.nprobe = int(value)
    elif name == "efSearch" and isinstance(index, HNSWIndex):
        index.ef_search = int(value)
    elif (name in ("ht", "polysemous_ht")
          and isinstance(index, (IndexPQ, IVFFlatIndex))):
        index.polysemous_ht = int(value)
    elif name == "max_codes" and isinstance(index, IVFFlatIndex):
        # infinity -> unlimited (AutoTune.cpp:539-541 maps inf to 0)
        index.max_codes = 0 if not np.isfinite(value) else int(value)
    else:
        raise ValueError(
            f"parameter {name!r} not applicable to {type(index).__name__}")


def set_index_parameters(index, description: str) -> None:
    """Comma-separated "name=value" string (reference
    ParameterSpace::set_index_parameters, AutoTune.cpp:429-460)."""
    for part in description.split(","):
        if not part.strip():
            continue
        name, value = part.split("=")
        set_index_parameter(index, name.strip(), float(value))


class ParameterSpace:
    """Parameter sweep with the worst-case criterion over the knobs the
    index exposes (reference ParameterSpace::initialize,
    AutoTune.cpp:353-408): nprobe for IVF, efSearch for HNSW, ht for
    polysemous PQ, k_factor for refine wrappers — cartesian over the
    wrapper knob and the base knob, like the reference's combinations."""

    def __init__(self, index):
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

    def parameter_ranges(self, index=None) -> list[tuple[str, list]]:
        from auncel_tpu.index.hnsw import HNSWIndex
        from auncel_tpu.index.pq_index import IndexPQ
        from auncel_tpu.index.flat import IndexRefineFlat
        index = index if index is not None else self.index
        if isinstance(index, IndexRefineFlat):
            inner = self.parameter_ranges(index.base)
            return [("k_factor", [1, 2, 4, 8])] + inner
        if isinstance(index, IVFFlatIndex):
            dims = [("nprobe", self.candidate_nprobes())]
            from auncel_tpu.index.ivfpqr import IndexIVFPQR
            if isinstance(index, IndexIVFPQR):
                # AutoTune.cpp:401-406: k_factor 1..64 powers of two
                dims.append(("k_factor", [1 << i for i in range(7)]))
            if getattr(index, "coarse", "kmeans") == "imi":
                # the reference adds a max_codes range only when the coarse
                # quantizer is a MultiIndexQuantizer (AutoTune.cpp:388-399:
                # 2^8..2^19 plus infinity); IMI cells are tiny/raggy, so a
                # code-visit cap is the knob that actually bounds work
                dims.append(("max_codes",
                             [1 << i for i in range(8, 20)] + [np.inf]))
            if getattr(index, "polysemous", False):
                # the reference sweeps ht on the IVFPQ path too
                # (ParameterSpace ranges, AutoTune.cpp:353-408)
                nbits = 8 * int(index.storage[2:])
                dims.append(("ht", sorted({nbits // 8, nbits // 4,
                                           nbits // 2, 3 * nbits // 4,
                                           nbits})))
            return dims
        if isinstance(index, HNSWIndex):
            return [("efSearch", [16, 32, 64, 128, 256, 512])]
        if isinstance(index, IndexPQ) and index.polysemous:
            nbits = 8 * index.M
            return [("ht", sorted({nbits // 8, nbits // 4, nbits // 2,
                                   3 * nbits // 4, nbits}))]
        return []

    def explore(self, xq: np.ndarray, gt_D: np.ndarray, k: int,
                reps: int = 2) -> OperatingPoints:
        dims = self.parameter_ranges()
        if not dims:
            return self.ops
        combos = [[]]
        for name, values in dims:
            combos = [c + [(name, v)] for c in combos for v in values]
        for combo in combos:
            for name, v in combo:
                set_index_parameter(self.index, name, v)
            key = ",".join(f"{n}={v}" for n, v in combo)
            D, _ = self.index.search(xq, k)  # warm
            # timing with confidence-interval refinement (reference
            # ParameterSpace::explore, AutoTune.cpp:597+: keep re-timing
            # a point until its interval is tight or the rep budget ends)
            times = []
            for rep in range(max(reps, 8)):
                t0 = time.perf_counter()
                D, _ = self.index.search(xq, k)
                np.asarray(D)
                times.append(time.perf_counter() - t0)
                if rep + 1 >= reps:
                    m = np.mean(times)
                    stderr = np.std(times) / np.sqrt(len(times))
                    if m <= 0 or stderr / m < 0.1:
                        break
            dt = float(np.mean(times)) / xq.shape[0]
            perf = worst_case_recall(D, gt_D, k, self.index.metric)
            self.ops.add(OperatingPoint(key, perf, dt))
        return self.ops

    def tune_for_bound(self, xq, gt_D, k: int, eps: float,
                       headroom: float = 0.0) -> int:
        """Pick the smallest nprobe whose WORST-case recall >= 1 - eps
        (the reference baseline eval, faiss/eval/bound.cpp:338-440).
        ``headroom`` > 0 demands extra train-set recall beyond the
        promise (e.g. 1/k = one neighbor) — the same generalization
        margin ErrorSys.calibrate applies, for apples-to-apples bound
        HOLDING on held-out data; the reference tuner has no margin and
        measurably misses its bound at heavy difficulty tails."""
        nlist = getattr(self.index, "nlist", None)
        if nlist is None:
            raise TypeError(
                f"tune_for_bound needs an index family with an nprobe "
                f"knob (IVF); got {type(self.index).__name__}")
        self.explore(xq, gt_D, k)
        pt = self.ops.cheapest_meeting(min(1.0 - eps + headroom, 1.0))
        if pt is None:
            # leave the index at full scan (the sweep left it on the LAST
            # combo's knobs otherwise)
            set_index_parameter(self.index, "nprobe", nlist)
            self.best_combo = {"nprobe": nlist}
            return nlist
        # re-apply the CHOSEN operating point's full knob combo: the sweep
        # measured recall/cost with its max_codes/ht etc., and exploring
        # left the index mutated to the final combo (e.g. a truthy
        # polysemous_ht permanently routing search through the filter)
        combo = {name: float(val) for name, val in
                 (p.split("=") for p in pt.key.split(","))}
        for name, val in combo.items():
            set_index_parameter(self.index, name, val)
        self.best_combo = combo
        return int(combo.get("nprobe", nlist))


class MatrixStats:
    """Dataset diagnostics with human-readable comments (reference
    ``MatrixStats``, AutoTune.h:218 / AutoTune.cpp:1010-1190): per-dim
    mean/std/range, NaN/Inf counts, duplicate detection, norm range, and
    the same advisory comments ("vectors are normalized...", dimension
    warnings). Vectorized numpy instead of the reference's per-element
    accumulation loop."""

    def __init__(self, x: np.ndarray):
        x = np.asarray(x, np.float32)
        self.n, self.d = x.shape
        lines = [f"analyzing {self.n} vectors of size {self.d}"]
        if self.d > 1024:
            lines.append(
                "indexing this many dimensions is hard, please consider "
                "dimensionality reduction (with PCAMatrix)")
        nan = np.isnan(x)
        inf = np.isinf(x)
        valid = ~(nan | inf)
        self.per_dim = dict(
            n_nan=nan.sum(0), n_inf=inf.sum(0),
            n0=((x == 0) & valid).sum(0),
            min=np.where(valid, x, np.inf).min(0),
            max=np.where(valid, x, -np.inf).max(0),
            mean=np.nanmean(np.where(inf, np.nan, x), axis=0),
            stddev=np.nanstd(np.where(inf, np.nan, x), axis=0),
        )
        sum2 = np.einsum("ij,ij->i", x.astype(np.float64),
                         x.astype(np.float64))
        finite = np.isfinite(sum2)
        self.n_valid = int(finite.sum())
        nz = finite & (sum2 > 0)
        self.n0 = int((finite & (sum2 == 0)).sum())
        self.min_norm2 = float(np.sqrt(sum2[nz].min())) if nz.any() else 0.0
        self.max_norm2 = float(np.sqrt(sum2[nz].max())) if nz.any() else 0.0
        if self.n_valid == self.n:
            lines.append("no NaN or Infs in data")
        else:
            lines.append(
                f"{self.n - self.n_valid} vectors contain NaN or Inf, "
                "expect bad results with indexing!")
        # duplicate detection: exact row uniqueness (the reference hashes
        # rows and reports the most-copied vector)
        _, first, counts = np.unique(x, axis=0, return_index=True,
                                     return_counts=True)
        self.n_distinct = int(counts.size)
        if self.n_distinct == self.n:
            lines.append("all vectors are distinct")
        else:
            lines.append(f"{self.n_distinct} vectors are distinct "
                         f"({100.0 * self.n_distinct / self.n:.2f}%)")
            top = int(np.argmax(counts))
            lines.append(f"vector {int(first[top])} has "
                         f"{int(counts[top])} copies")
        lines.append(f"range of L2 norms=[{self.min_norm2:g}, "
                     f"{self.max_norm2:g}] ({self.n0} null vectors)")
        if self.max_norm2 < self.min_norm2 * 1.0001:
            lines.append("vectors are normalized, inner product and L2 "
                         "search are equivalent")
        if self.max_norm2 > self.min_norm2 * 100:
            lines.append("vectors have very large differences in norms, "
                         "is this normal?")
        rng0 = (self.per_dim["max"] == self.per_dim["min"]).sum()
        if rng0:
            lines.append(f"{int(rng0)} dimensions have constant values")
        self.comments = "\n".join(lines) + "\n"

    def __str__(self):
        return self.comments
