"""Sharded-search and DP k-means tests on the simulated 8-device CPU mesh —
coverage the reference lacks entirely (its dist/ mode is only validated
manually on real clusters, SURVEY.md §4)."""

import numpy as np
import pytest
import jax

from auncel_tpu.types import Metric
from auncel_tpu.data.synthetic import make_clustered_dataset
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.parallel.sharded import ShardedIVF, make_mesh
from auncel_tpu.parallel.kmeans_dp import dp_kmeans


@pytest.fixture(scope="module")
def ds():
    return make_clustered_dataset(nb=16000, nq=40, d=32, n_clusters=64,
                                  seed=21)


@pytest.fixture(scope="module")
def sharded(ds):
    s = ShardedIVF(ds.d, nlist=32, n_shards=4, mesh=make_mesh(4))
    s.build(ds.xb)
    return s


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) >= 8


def test_sharded_full_scan_matches_flat(ds, sharded):
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    gt_vals, gt_ids = flat.search(ds.xq, 10)
    vals, ids = sharded.search(ds.xq, 10, nprobe=32)  # full scan per shard
    hit = np.mean([len(set(a) & set(b)) / 10
                   for a, b in zip(ids.tolist(), gt_ids.tolist())])
    assert hit > 0.999
    np.testing.assert_allclose(vals, gt_vals, rtol=1e-4, atol=1.0)


def test_sharded_partial_probe_recall(ds, sharded):
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    _, gt_ids = flat.search(ds.xq, 10)
    r = []
    for nprobe in (1, 4, 32):
        _, ids = sharded.search(ds.xq, 10, nprobe=nprobe)
        r.append(np.mean([len(set(a) & set(b)) / 10
                          for a, b in zip(ids.tolist(), gt_ids.tolist())]))
    assert r == sorted(r) and r[-1] > 0.999


def test_sharded_bounded_search_bound_composes(ds, sharded):
    """Each shard guarantees its bound on its partition; the merged result
    must then satisfy the global bound (dist/ semantics)."""
    sharded.train_profiles(ds.xq[:20], max_topk=50)
    sharded.multipler = 8.0
    flat = FlatIndex(ds.d)
    flat.add(ds.xb)
    gt_vals, gt_ids = flat.search(ds.xq, 50)
    acc = np.full(40, 0.9, np.float32)
    vals, ids, n_scanned = sharded.search_bounded(ds.xq, acc, query_k=10)
    from auncel_tpu.autotune import recall_counts
    from auncel_tpu.types import Metric
    cnt = recall_counts(vals, gt_vals, 10, Metric.L2)
    assert cnt.min() / 10 >= 0.9
    assert n_scanned.shape == (4, 40)
    assert n_scanned.max() <= 32


def test_sharded_multirow_matches_padded(ds, sharded):
    """search_bounded over stacked multirow layouts returns exactly the
    padded SPMD engine's results (same per-shard decisions, same merge)."""
    sharded.train_profiles(ds.xq[:20], max_topk=50)
    sharded.multipler = 8.0
    acc = np.full(40, 0.9, np.float32)
    v1, i1, n1 = sharded.search_bounded(ds.xq, acc, query_k=10)
    sharded.enable_multirow(row_cap=64)
    assert sharded.mr is not None
    v2, i2, n2 = sharded.search_bounded(ds.xq, acc, query_k=10)
    sharded.mr = None  # leave fixture unchanged for other tests
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(i1, i2)


def test_global_ids_preserved(ds, sharded):
    """Merged ids must be global corpus row ids (round-robin split)."""
    vals, ids = sharded.search(ds.xb[:5], 1, nprobe=32)
    np.testing.assert_array_equal(ids[:, 0], np.arange(5))


def test_sharded_save_load_preserves_multirow(tmp_path, ds, sharded):
    """save() must persist the row_cap passed to enable_multirow (not a
    stacked-array axis length) so load() rebuilds the SAME row layout."""
    sharded.train_profiles(ds.xq[:20], max_topk=50)
    sharded.multipler = 8.0
    sharded.enable_multirow(row_cap=64)
    rpl_orig = np.asarray(jax.device_get(sharded.mr.rows_per_list))
    p = str(tmp_path / "sharded_mr")
    sharded.save(p)
    acc = np.full(40, 0.9, np.float32)
    v1, i1, n1 = sharded.search_bounded(ds.xq, acc, query_k=10)
    sharded.mr = None  # leave fixture unchanged for other tests
    loaded = ShardedIVF.load(p, mesh=make_mesh(4))
    assert loaded.mr is not None
    assert loaded._mr_row_cap == sharded._mr_row_cap == 64
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(loaded.mr.rows_per_list)), rpl_orig)
    v2, i2, n2 = loaded.search_bounded(ds.xq, acc, query_k=10)
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(i1, i2)


def test_dp_kmeans_matches_quality(ds):
    mesh = make_mesh(8)
    cents, err = dp_kmeans(ds.xb[:8000], 32, mesh, niter=10)
    assert cents.shape == (32, 32)
    # error should beat a random-centroid baseline by a wide margin
    rng = np.random.RandomState(0)
    rand_c = ds.xb[rng.permutation(8000)[:32]]
    d_rand = ((ds.xb[:8000, None, :] - rand_c[None]) ** 2).sum(-1).min(1).sum()
    assert err < 0.9 * d_rand


def test_sharded_save_load(tmp_path, ds, sharded):
    if sharded.traces is None:
        sharded.train_profiles(ds.xq[:20], max_topk=50)
    sharded.multipler = 8.0
    p = str(tmp_path / "sharded")
    sharded.save(p)
    loaded = ShardedIVF.load(p, mesh=make_mesh(4))
    acc = np.full(40, 0.9, np.float32)
    v1, i1, _ = sharded.search_bounded(ds.xq, acc, query_k=10)
    v2, i2, _ = loaded.search_bounded(ds.xq, acc, query_k=10)
    np.testing.assert_array_equal(i1, i2)


def test_sharded_jit_closures_cached():
    """Regression: repeated searches must reuse ONE jitted SPMD closure
    (a fresh closure per call retraces the whole wave program)."""
    import numpy as np
    from auncel_tpu.parallel.sharded import ShardedIVF, make_mesh
    rng = np.random.RandomState(1)
    xb = rng.randn(4000, 16).astype(np.float32)
    s = ShardedIVF(16, 16, n_shards=4, mesh=make_mesh(4))
    s.build(xb)
    s.search(xb[:4], 3, nprobe=4)
    fn1 = s._jit_fns[("search", 3, 4)]
    s.search(xb[4:8], 3, nprobe=4)
    assert s._jit_fns[("search", 3, 4)] is fn1
    # undersized shards raise with a pointed message
    import pytest
    bad = ShardedIVF(16, 2048, n_shards=4, mesh=make_mesh(4))
    with pytest.raises(ValueError, match="k-means cannot train"):
        bad.build(xb)


def test_dp_mesh_matches_1d(ds):
    """2D [dp, shard] mesh (query data-parallel groups over corpus
    replicas): results are bit-identical to the 1D shard mesh — dp
    groups never communicate, the top-k merge all-gathers over the
    shard axis only."""
    import numpy as np
    from auncel_tpu.parallel.sharded import ShardedIVF, make_mesh
    acc = np.full(len(ds.xq), 0.9, np.float32)

    def build(mesh):
        s = ShardedIVF(ds.d, nlist=16, n_shards=4, mesh=mesh)
        s.build(ds.xb)
        s.train_profiles(ds.xq, max_topk=16)
        s.enable_multirow(row_cap=16)
        s.multipler = 4.0
        return s

    s1 = build(make_mesh(4))
    s2 = build(make_mesh(4, dp=2))
    assert s2.dp == 2
    v1, i1, n1 = s1.search_bounded(ds.xq, acc, query_k=5)
    v2, i2, n2 = s2.search_bounded(ds.xq, acc, query_k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2)
    np.testing.assert_array_equal(n1, n2)
    f1, g1 = s1.search(ds.xq, 5, nprobe=4)
    f2, g2 = s2.search(ds.xq, 5, nprobe=4)
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_allclose(f1, f2)


def test_drop_shard_degrades_gracefully(ds):
    """Elastic degradation (SURVEY §5: 'at minimum detect-and-requery a
    failed shard'; the reference's master just hangs on a dead worker,
    dist/master.cpp:91-99): after drop_shard the survivors keep serving
    with their own profiles, and results equal brute force over the
    surviving partitions."""
    import numpy as np
    from auncel_tpu.parallel.sharded import (
        ShardedIVF, make_mesh, split_round_robin)
    s = ShardedIVF(ds.d, nlist=16, n_shards=4, mesh=make_mesh(4))
    s.build(ds.xb)
    s.train_profiles(ds.xq, max_topk=16)
    s.enable_multirow(row_cap=16)
    s.multipler = 4.0
    s.drop_shard(1)
    assert s.n_shards == 3 and dict(s.mesh.shape)["shard"] == 3
    acc = np.full(len(ds.xq), 0.9, np.float32)
    _, i_b, ns = s.search_bounded(ds.xq, acc, query_k=5)
    assert ns.shape == (3, len(ds.xq))
    assert not np.any((i_b % 4) == 1)      # dropped partition absent
    # exhaustive check vs brute force over surviving rows
    _, idf = s.search(ds.xq, 5, nprobe=16)
    parts = split_round_robin(ds.xb, 4)
    keep_ids = np.concatenate([g for k, (r, g) in enumerate(parts)
                               if k != 1])
    rows = np.concatenate([r for k, (r, g) in enumerate(parts) if k != 1])
    d2 = ((ds.xq[:, None, :] - rows[None]) ** 2).sum(-1)
    want = keep_ids[np.argsort(d2, axis=1)[:, :5]]
    np.testing.assert_array_equal(np.sort(want, 1), np.sort(idf, 1))


def test_sharded_sq8_storage_decision_parity(ds, tmp_path):
    """Quantized shards (round-4: storage= threads through the per-shard
    build, matching the reference's dist-mode DEEP1B deployments,
    dist/worker.cpp:153-235 — f32 was measured to OOM one chip at 10M
    per shard, RESULTS_r3 §10M). Decision parity: the SPMD sq8 shard must
    make EXACTLY the decisions its own single-device sq8 engine makes —
    stacking/shard_map/codec plumbing adds nothing."""
    import jax.numpy as jnp
    from auncel_tpu.profile.bounded_mr import bounded_oneshot_mr
    s = ShardedIVF(ds.d, nlist=32, n_shards=4, mesh=make_mesh(4),
                   storage="sq8")
    s.build(ds.xb)
    assert all(sh.storage == "sq8" for sh in s.shards)
    assert s.arrays.sq_scale is not None
    s.train_profiles(ds.xq[:20], max_topk=50)
    s.multipler = 8.0
    s.enable_multirow(row_cap=64)
    acc = np.full(40, 0.9, np.float32)
    v, i, n_scanned = s.search_bounded(ds.xq, acc, query_k=10)

    # single-device replay of shard 0's bounded engine (same profile,
    # same plan): n_scanned row must match the SPMD run exactly
    sh = s.shards[0]
    sh.enable_multirow(64)
    tr0 = jax.tree.map(lambda a: np.asarray(a)[0],
                       jax.device_get(s.traces))
    from auncel_tpu.profile.trace import TraceSet
    tr0 = TraceSet(*[jnp.asarray(x) for x in tr0])
    out = bounded_oneshot_mr(
        sh.arrays, sh.multirow, tr0, jnp.asarray(ds.xq),
        jnp.asarray(acc), jnp.float32(8.0), jnp.float32(1.0),
        jnp.zeros(40, jnp.float32), 10, 50, Metric.L2, s._mr_plan)
    np.testing.assert_array_equal(n_scanned[0], np.asarray(out[3]))

    # the sq8 merge still satisfies the bound vs the quantized corpus'
    # own exact scan (bound composition across shards is covered by
    # test_sharded_bounded_search_bound_composes)
    gt_D = None
    for sh2 in s.shards:
        D_s, _ = sh2.exact_search(ds.xq, 10)
        gt_D = D_s if gt_D is None else np.sort(
            np.concatenate([gt_D, D_s], axis=1), axis=1)[:, :10]
    from auncel_tpu.autotune import recall_counts
    cnt = recall_counts(v, gt_D, 10, Metric.L2)
    assert cnt.min() / 10 >= 0.9

    # save/load round-trips the codec (sq range persists exactly)
    p = str(tmp_path / "sharded_sq8")
    s.save(p)
    loaded = ShardedIVF.load(p, mesh=make_mesh(4))
    assert loaded.storage == "sq8"
    v2, i2, n2 = loaded.search_bounded(ds.xq, acc, query_k=10)
    np.testing.assert_array_equal(n_scanned, n2)
    np.testing.assert_array_equal(v, v2)


def test_sharded_rejects_pq_storage():
    with pytest.raises(ValueError):
        ShardedIVF(32, nlist=16, n_shards=4, storage="pq8")
