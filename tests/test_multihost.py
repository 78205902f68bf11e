"""Two-process jax.distributed smoke (the dist mode's DCN claim made
real: cross-process mesh, sharded top-k merge over Gloo collectives)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_multihost_smoke():
    script = os.path.join(REPO, "scripts", "multihost_smoke.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # ranks set their own device counts
    p = subprocess.run([sys.executable, script], env=env,
                       capture_output=True, timeout=300)
    out = p.stdout.decode() + p.stderr.decode()
    assert p.returncode == 0, out
    assert "multihost smoke: PASS" in out
