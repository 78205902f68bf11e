"""Multi-row list layout tests: exact equivalence with the padded layout
plus the packing-efficiency win on skewed lists."""

import numpy as np
import jax.numpy as jnp
import pytest

from auncel_tpu.types import Metric
from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.scan import ivf_search_fixed
from auncel_tpu.index.multirow import build_multirow, multirow_search_fixed


@pytest.fixture(scope="module")
def skewed():
    """Index with deliberately skewed list sizes (popular clusters)."""
    rng = np.random.RandomState(41)
    d, nlist = 32, 32
    centers = rng.rand(nlist, d).astype(np.float32) * 10
    # zipf-ish popularity -> mega-lists
    pops = 1.0 / np.arange(1, nlist + 1)
    pops /= pops.sum()
    which = rng.choice(nlist, size=30000, p=pops)
    xb = (centers[which] + 0.5 * rng.randn(30000, d)).astype(np.float32)
    idx = IVFFlatIndex(d, nlist)
    idx.set_centroids(centers)
    idx.add(xb)
    xq = (centers[rng.choice(nlist, 40)] +
          0.7 * rng.randn(40, d)).astype(np.float32)
    return idx, xq


def test_multirow_matches_padded_layout(skewed):
    idx, xq = skewed
    mr = build_multirow(idx.arrays, row_cap=256)
    q = jnp.asarray(xq)
    for nprobe in (2, 8, 32):
        v1, i1 = ivf_search_fixed(idx.arrays, q, 10, nprobe, Metric.L2)
        out_slots = int(np.asarray(mr.rows_per_list).max()) * nprobe
        v2, i2 = multirow_search_fixed(mr, q, 10, nprobe, out_slots,
                                       Metric.L2)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        # db/db_sq/vec_ids are GATHERED from the padded layout (never
        # recomputed) and the einsum reduces over d in both layouts, so
        # distance values are bitwise-identical — the kscaling value-match
        # invariant holds through either layout with no GT re-plumbing
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_search_entry_rides_multirow(skewed):
    """After enable_multirow, IVFFlatIndex.search() must serve the row
    layout (one hot loop for all modes, reference IndexIVFFlat.cpp:117-137)
    and return exactly the padded path's results."""
    idx, xq = skewed
    try:
        for nprobe in (1, 3, 8, 32):
            v1, i1 = idx.search(xq, 10, nprobe=nprobe)
            idx.enable_multirow(row_cap=256)
            assert idx.multirow is not None
            v2, i2 = idx.search(xq, 10, nprobe=nprobe)
            idx._multirow = None
            idx._multirow_row_cap = None
            np.testing.assert_array_equal(i1, i2)
            np.testing.assert_array_equal(v1, v2)
    finally:
        idx._multirow = None
        idx._multirow_row_cap = None


def test_multirow_reduces_padding(skewed):
    idx, _ = skewed
    a = idx.arrays
    mr = build_multirow(a, row_cap=256)
    padded_bytes = a.db.shape[0] * a.db.shape[1]
    row_bytes = mr.rows.db.shape[0] * mr.rows.db.shape[1]
    # zipf skew: the padded layout wastes far more than the row layout
    assert row_bytes < 0.5 * padded_bytes
    # every stored vector is present exactly once
    ids_rows = np.asarray(mr.rows.vec_ids)
    got = np.sort(ids_rows[ids_rows >= 0])
    want = np.sort(np.asarray(a.vec_ids)[np.asarray(a.vec_ids) >= 0])
    np.testing.assert_array_equal(got, want)


def test_plan_mr_waves_coverage_property():
    """Property fuzz of the plan's load-bearing guarantee: for ANY
    per-list row profile, each stage group's total width covers the
    worst-case row increment of that stage (sum of the stage-delta
    largest per-list row counts) — frontier advancement is capped per
    wave at its goal, so coverage must hold stage by stage (see
    plan_mr_waves docstring)."""
    import numpy as np
    from auncel_tpu.profile.bounded_mr import plan_mr_waves
    rng = np.random.RandomState(0)
    for trial in range(40):
        nlist = int(rng.choice([8, 16, 64, 256, 1024]))
        dist = rng.choice(["uniform", "skewed", "spiky", "tiny"])
        if dist == "uniform":
            rpl = rng.randint(1, 8, size=nlist)
        elif dist == "skewed":
            rpl = np.maximum(1, rng.zipf(1.7, size=nlist) % 64)
        elif dist == "spiky":
            rpl = np.ones(nlist, np.int64)
            rpl[rng.choice(nlist, max(nlist // 16, 1), replace=False)] = 100
        else:
            rpl = np.ones(nlist, np.int64)
        for decide_only in (False, True):
            for exact in (False, True):
                plan = plan_mr_waves(rpl, nlist, decide_only,
                                     exact_cover=exact)
                desc = np.sort(np.asarray(rpl))[::-1]
                cum = np.concatenate([[0], np.cumsum(desc)])
                prev = 0
                groups: dict = {}
                for (stage, width, decide, is_main) in plan.waves:
                    groups.setdefault(stage, 0)
                    groups[stage] += width
                for stage in sorted(groups):
                    delta = stage - prev
                    worst = int(cum[min(delta, len(desc))])
                    assert groups[stage] >= worst, (
                        trial, dist, nlist, stage, groups[stage], worst)
                    prev = stage
                # out_slots never truncates the full expansion
                assert plan.out_slots >= int(cum[min(plan.S, len(desc))])
