"""Test configuration: run everything on a simulated 8-device CPU mesh.

The driver validates multi-chip sharding the same way
(xla_force_host_platform_device_count); tests must not require real TPU
hardware. Set before importing jax anywhere.
"""

import os

# Force CPU even if the environment pre-set JAX_PLATFORMS (e.g. axon TPU
# tunnel): the test suite must be hermetic and fast. Opt out with
# AUNCEL_TEST_TPU=1 to exercise the suite on real hardware.
if not os.environ.get("AUNCEL_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A pytest plugin may have imported jax before this conftest ran, making the
# env vars above too late; config.update still works until the backend is
# first used.
if not os.environ.get("AUNCEL_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable references after each test module.

    The suite compiles ~1000 XLA:CPU modules across all files; holding
    every executable live for the whole run was observed to segfault
    LLVM inside a later compile (deterministically at the same test,
    crash site varying between unrelated programs — classic resource
    exhaustion, reproduced with and without the persistent compile
    cache, gone when any large module is dropped from the sequence).
    Recompiles after a clear are cheap: the persistent compile cache
    (auncel_tpu/__init__.py) turns them into disk hits.
    """
    yield
    import gc
    import jax as _jax
    _jax.clear_caches()
    gc.collect()
