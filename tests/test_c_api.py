"""C API regression test: builds the embedded-CPython C ABI library and
runs the demo client end to end (the reference's c_api ships its own C
test drivers; COMPONENTS.md #29). Skips cleanly when no C toolchain or
libpython is available."""

import os
import shutil
import subprocess

import pytest

C_API_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                         "auncel_tpu", "c_api")


@pytest.mark.skipif(shutil.which("gcc") is None and
                    shutil.which("cc") is None,
                    reason="no C compiler")
def test_c_api_demo_builds_and_runs():
    env = dict(os.environ)
    # the embedded interpreter must come up on CPU: axon sitecustomize
    # overrides JAX_PLATFORMS, and the demo sets the platform through the
    # auncel_c bootstrap which respects AUNCEL_C_PLATFORM
    env["AUNCEL_C_PLATFORM"] = "cpu"
    env["AUNCEL_PY_ROOT"] = os.path.abspath(
        os.path.join(C_API_DIR, os.pardir, os.pardir))
    build = subprocess.run(["make", "-C", C_API_DIR, "demo"],
                           capture_output=True, text=True, timeout=300)
    if build.returncode != 0:
        pytest.skip(f"c_api build unavailable: {build.stderr[-400:]}")
    run = subprocess.run([os.path.join(C_API_DIR, "demo_c")],
                         capture_output=True, text=True, timeout=600,
                         env=env, cwd=C_API_DIR)
    assert run.returncode == 0, (
        f"demo_c failed\nstdout: {run.stdout[-1000:]}\n"
        f"stderr: {run.stderr[-1000:]}")
