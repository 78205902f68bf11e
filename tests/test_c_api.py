"""C API regression test: builds the embedded-CPython C ABI library and
runs the demo client end to end (the reference's c_api ships its own C
test drivers; COMPONENTS.md #29). Skips ONLY when the toolchain itself is
missing (no compiler, or python3-config can't describe an embeddable
libpython); a failing build with a working toolchain is a real
regression and FAILS the suite."""

import os
import shutil
import subprocess

import pytest

C_API_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                         "auncel_tpu", "c_api")


def _toolchain_available() -> bool:
    if shutil.which("gcc") is None and shutil.which("cc") is None:
        return False
    if shutil.which("make") is None:
        return False
    try:
        out = subprocess.run(
            ["python3-config", "--includes"], capture_output=True,
            text=True, timeout=30)
    except FileNotFoundError:
        return False
    return out.returncode == 0 and "-I" in out.stdout


@pytest.mark.skipif(not _toolchain_available(),
                    reason="no C compiler / make / python3-config")
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
    # toolchain present (checked above): a build error is an ABI/Makefile
    # regression, not an environment gap — fail, don't skip
    assert build.returncode == 0, (
        f"c_api build FAILED with a working toolchain\n"
        f"stdout: {build.stdout[-600:]}\nstderr: {build.stderr[-800:]}")
    run = subprocess.run([os.path.join(C_API_DIR, "demo_c")],
                         capture_output=True, text=True, timeout=600,
                         env=env, cwd=C_API_DIR)
    assert run.returncode == 0, (
        f"demo_c failed\nstdout: {run.stdout[-1000:]}\n"
        f"stderr: {run.stderr[-1000:]}")
