"""Shared eval-harness plumbing.

Mirrors the reference eval binaries' common structure
(``/root/reference/Auncel/eval/bound.cpp:137-295``): dataset registry with
file paths, index build with trained-quantizer caching, GT loading, and the
worst-case bound checker. File datasets use the same fvecs/ivecs layouts;
when files are absent the harness falls back to a self-contained synthetic
dataset so every experiment runs anywhere.
"""

import os
import time
from dataclasses import dataclass

import numpy as np

from auncel_tpu.types import Metric
from auncel_tpu.data import fvecs_read, ivecs_read, make_clustered_dataset
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.io import save_index, load_index

DATA_ROOT = os.environ.get("AUNCEL_DATA_ROOT", "/workspace/data")

# Corpora at or above this row count get their generated vectors and
# exact GT cached on disk (BENCH_CACHE, default .bench_cache/): both cost
# minutes per eval process at 10M scale.
BIG_CORPUS_ROWS = 5_000_000

# name -> (base fvecs, query fvecs, gt ivecs, gt-distance fvecs, metric)
# matching the reference's hardcoded table (eval/bound.cpp:160-210).
FILE_DATASETS = {
    "sift1M": ("sift1M/sift_base.fvecs", "sift1M/sift_query.fvecs",
               "sift1M/sift_groundtruth.ivecs",
               "sift1M/sift_gtd.fvecs", Metric.L2),
    "sift10M": ("sift10M/sift10M.fvecs", "sift10M/query.fvecs",
                "sift10M/idx.ivecs", "sift10M/dis.fvecs", Metric.L2),
    "deep10M": ("deep10M/deep10M.fvecs", "deep10M/query.fvecs",
                "deep10M/idx.ivecs", "deep10M/dis.fvecs", Metric.L2),
    "gist": ("gist/gist_base.fvecs", "gist/gist_query.fvecs",
             "gist/gist_groundtruth.ivecs", "gist/gist_gtd.fvecs",
             Metric.L2),
    "text": ("text10M/text10M.fvecs", "text10M/query.fvecs",
             "text10M/idx.ivecs", "text10M/dis.fvecs", Metric.IP),
}

SYNTH_SIZES = {"synth1M": 1_000_000, "synth100K": 100_000,
               "synth10K": 10_000,
               # DEEP10M-like proxy (reference headline scale,
               # eval/bound.cpp:174-183): 10M x 96, perturbed-corpus
               # queries. d=96 matches DEEP and keeps both device layouts
               # (padded + multirow) resident in one v5e chip's 16 GB HBM.
               "synthDeep10M": 10_000_000,
               # The round-3 p1 parameterization kept under its own name:
               # 39k clusters at std 0.22 overlap so heavily at d=96 that
               # coarse pruning is impossible (mean decided scan 948/1024)
               # — near-uniform data, the worst case for IVF and the
               # regime the dense-scan crossover exists for.
               "synthDeep10Mw": 10_000_000}
SYNTH_D = {"synthDeep10M": 96,          # per-dataset dim override (else 128)
           "synthDeep10Mw": 96}
# Per-dataset generation overrides. The "ver" tag is baked into every
# cache key (corpus npz + trained quantizer), so changing a dataset's
# parameterization can never silently reuse stale caches.
# synthDeep10M p2: the first parameterization (registry-default 39k
# clusters at std 0.22, RESULTS_r3 10M section) overlapped so heavily at
# d=96 that coarse pruning was impossible (mean decided scan 948/1024 —
# near-uniform data). p2 uses fewer, tighter clusters (8 per IVF cell,
# spread/separation ~ 0.44) so the proxy has DEEP-like prunability with
# a graded difficulty tail (hard queries perturbed past their home
# cluster's radius toward Voronoi boundaries).
SYNTH_PARAMS = {
    "synthDeep10M": dict(query_mode="perturb", cluster_std=0.13,
                         pert_easy=0.4, pert_hard=1.2, n_clusters=8192),
    "synthDeep10Mw": dict(query_mode="perturb", cluster_std=0.22,
                          n_clusters=39062),
}
SYNTH_VER = {"synthDeep10M": "p2", "synthDeep10Mw": "p1"}
# "Hard" variants carry a heavy difficulty tail (a minority of queries
# drift far toward/past Voronoi boundaries): a worst-case-tuned global
# nprobe must pay the tail on EVERY query, which is exactly the regime
# Auncel's per-query bounds exist for (the real SIFT/GIST/TEXT sets have
# this variance naturally; the plain synth generator is too uniform).
SYNTH_HARD = {"synthHard100K": 100_000, "synthHard1M": 1_000_000}


@dataclass
class EvalData:
    name: str
    xb: np.ndarray
    xq: np.ndarray
    gt_I: np.ndarray | None
    gt_D: np.ndarray | None
    metric: Metric
    # distinguishes differently-generated corpora sharing a registry name
    # (e.g. synth100K at seed 7 vs 42) in the trained-quantizer cache
    cache_tag: str = ""


def elapsed():
    return time.time()


def load_dataset(name: str, nq: int = 10000, max_topk: int = 100,
                 seed: int = 42) -> EvalData:
    if name in FILE_DATASETS:
        base, query, gti, gtd, metric = FILE_DATASETS[name]
        base = os.path.join(DATA_ROOT, base)
        if not os.path.exists(base):
            raise FileNotFoundError(
                f"{base} missing; set AUNCEL_DATA_ROOT or use a synth* "
                f"dataset")
        xb = fvecs_read(base)
        xq = fvecs_read(os.path.join(DATA_ROOT, query))
        gt_I = gt_D = None
        gtd_path = os.path.join(DATA_ROOT, gtd)
        gti_path = os.path.join(DATA_ROOT, gti)
        if os.path.exists(gti_path):
            gt_I = ivecs_read(gti_path).astype(np.int64)
        if os.path.exists(gtd_path):
            gt_D = fvecs_read(gtd_path)
        if metric is Metric.IP:
            # normalization changes inner products (and can reorder
            # neighbors), so file GT computed on the raw vectors no longer
            # describes the searched data: drop it — ensure_gt recomputes
            # value-consistent GT on the normalized corpus
            xb = xb / np.linalg.norm(xb, axis=1, keepdims=True)
            xq = xq / np.linalg.norm(xq, axis=1, keepdims=True)
            gt_I = gt_D = None
        return EvalData(name, xb, xq, gt_I, gt_D, metric)
    if name in SYNTH_SIZES or name in SYNTH_HARD:
        hard = name in SYNTH_HARD
        nb = (SYNTH_HARD if hard else SYNTH_SIZES)[name]
        metric = Metric.L2
        kw = dict(hard_frac=0.25, pert_easy=0.3, pert_hard=2.5) if hard \
            else {}
        kw.update(SYNTH_PARAMS.get(name, {}))
        n_clusters = kw.pop("n_clusters", max(nb // 256, 64))
        tag = "" if seed == 42 else f"_s{seed}"
        if name in SYNTH_VER:
            tag += f"_{SYNTH_VER[name]}"
        # Generating >= 5M-point corpora costs minutes of single-core
        # numpy; cache them like bench.py does (same .bench_cache dir).
        # ONE file per (name, tag): the generator draws xb before xq from
        # the seeded RNG, so xb is nq-invariant, and queries are stored as
        # a superset (shuffled at generation, so a prefix slice keeps the
        # hard/easy mix) and sliced — distinct nq values no longer each
        # store another multi-GB copy of the same corpus. Registry
        # parameter changes must bump SYNTH_VER (enforced by the cache
        # name carrying the tag).
        cache = None
        if nb >= BIG_CORPUS_ROWS:
            cdir = os.environ.get("BENCH_CACHE", ".bench_cache")
            os.makedirs(cdir, exist_ok=True)
            cache = os.path.join(cdir, f"evalds_{name}{tag}.npz")
            if os.path.exists(cache):
                with np.load(cache) as z:
                    if z["xq"].shape[0] >= nq:
                        return EvalData(name, z["xb"], z["xq"][:nq], None,
                                        None, metric, cache_tag=tag)
                # stored query superset too small: regenerate (xb values
                # are identical per seed, so overwriting is safe)
        nq_gen = max(nq, 10_000) if cache is not None else nq
        ds = make_clustered_dataset(nb=nb, nq=nq_gen,
                                    d=SYNTH_D.get(name, 128),
                                    n_clusters=n_clusters,
                                    seed=seed, metric=metric, **kw)
        if cache is not None:
            np.savez(cache, xb=ds.xb, xq=ds.xq)
        return EvalData(name, ds.xb, ds.xq[:nq], None, None, metric,
                        cache_tag=tag)
    raise KeyError(f"unknown dataset {name!r} "
                   f"(file: {sorted(FILE_DATASETS)}, "
                   f"synthetic: {sorted(SYNTH_SIZES) + sorted(SYNTH_HARD)})")


def build_or_load_index(data: EvalData, nlist: int = 1024,
                        cache_dir: str = "trained_index",
                        storage: str = "f32") -> IVFFlatIndex:
    """Build IVF<nlist>,<storage>, caching the trained coarse quantizer
    like the reference (eval/bound.cpp:265-268 writes
    trained_index/*.index). ``storage`` other than "f32" serves the
    corpus through the matching scalar/PQ codec (e.g. "sq8" at 10M scale,
    where two resident f32 layouts exceed one chip's HBM); k-means is
    storage-independent, so a cached Flat quantizer is reused."""
    os.makedirs(cache_dir, exist_ok=True)
    stag = "Flat" if storage == "f32" else storage.upper()
    cache = os.path.join(
        cache_dir,
        f"{data.name}{data.cache_tag}_IVF{nlist},{stag}_trained.npz")
    flat_cache = os.path.join(
        cache_dir,
        f"{data.name}{data.cache_tag}_IVF{nlist},Flat_trained.npz")
    if os.path.exists(cache):
        idx = load_index(cache)
        assert isinstance(idx, IVFFlatIndex)
        if idx.storage != storage:
            # save_index downgrades pq* storage to f32 (io.py), so a
            # cached "PQ16" file reloads as an f32 index — silently
            # evaluating the wrong codec. The k-means is still good:
            # rebuild with the requested storage around the cached
            # centroids instead of trusting the roundtripped header.
            donor = idx
            idx = IVFFlatIndex(data.xb.shape[1], nlist, data.metric,
                               storage=storage)
            idx.set_centroids(donor.centroids)
    else:
        idx = IVFFlatIndex(data.xb.shape[1], nlist, data.metric,
                           storage=storage)
        if storage != "f32" and os.path.exists(flat_cache):
            donor = load_index(flat_cache)
            idx.set_centroids(donor.centroids)
        else:
            nt = min(data.xb.shape[0], 400_000)
            idx.train(data.xb[:nt])
        save_index(idx, cache)
    idx.add(data.xb)
    return idx


def ensure_gt(data: EvalData, idx: IVFFlatIndex, max_topk: int = 100):
    """GT always comes from the index's own full scan (dist/gt.cpp
    equivalent): the profile trainer's kscaling match and the bound
    checker compare DISTANCE VALUES at 1e-5 rel tolerance, so GT must be
    computed by the same kernel family as the search path (repo
    invariant) — file distances from a differently-shaped CPU kernel are
    kept only as an id-overlap sanity check."""
    file_I = data.gt_I
    if data.gt_D is None or data.gt_D.shape[1] < max_topk             or data.gt_I is None or not getattr(data, "_gt_exact", False):
        # >=5M corpora: cache GT on disk like the corpus itself — the
        # exact scan of a few thousand queries over 10M rows costs
        # minutes of TPU time per eval process otherwise. Keyed by
        # (name, tag, storage) because exact_search scans the index's
        # DECODED vectors (sq8 GT != f32 GT at the 1e-5 tolerance).
        gt_cache = None
        nq = data.xq.shape[0]
        if data.xb.shape[0] >= BIG_CORPUS_ROWS:
            cdir = os.environ.get("BENCH_CACHE", ".bench_cache")
            os.makedirs(cdir, exist_ok=True)
            gt_cache = os.path.join(
                cdir, f"gt_{data.name}{data.cache_tag}_{idx.storage}.npz")
            if os.path.exists(gt_cache):
                with np.load(gt_cache) as z:
                    if (z["D"].shape[0] >= nq
                            and z["D"].shape[1] >= max_topk):
                        data.gt_D = z["D"][:nq, :max_topk]
                        data.gt_I = z["I"][:nq, :max_topk]
                        data._gt_exact = True
                        return data.gt_D, data.gt_I
        data.gt_D, data.gt_I = idx.exact_search(data.xq, max_topk,
                                                batch=1000)
        data._gt_exact = True
        if gt_cache is not None:
            np.savez(gt_cache, D=data.gt_D, I=data.gt_I)
        if file_I is not None:
            k = min(10, file_I.shape[1])
            overlap = np.mean([len(set(a[:k].tolist())
                                   & set(b[:k].tolist())) / k
                               for a, b in zip(file_I, data.gt_I)])
            if overlap < 0.99:
                print(f"WARNING: file GT disagrees with exact scan "
                      f"(overlap@{k} = {overlap:.3f})")
    return data.gt_D, data.gt_I


def check_bound(D: np.ndarray, gt_D: np.ndarray, k: int, eps: float,
                metric: Metric) -> tuple[bool, float]:
    """Worst-case bound verification (eval/bound.cpp:400-414)."""
    from auncel_tpu.autotune import worst_case_recall
    minf = worst_case_recall(D, gt_D, k, metric)
    return minf >= 1.0 - eps, minf


def write_log(path: str, rows) -> None:
    with open(path, "w") as f:
        for r in rows:
            if isinstance(r, (tuple, list, np.ndarray)):
                f.write(" ".join(str(x) for x in r) + "\n")
            else:
                f.write(f"{r}\n")
