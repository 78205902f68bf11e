"""Make `import auncel_tpu` work when a tutorial is run as a script
(`python tutorial/1_flat.py`): the interpreter puts tutorial/ — not the
repo root — on sys.path. A pip-installed auncel_tpu wins; this only
appends the checkout root as a fallback."""
import os
import pathlib
import sys

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
if _ROOT not in sys.path:
    sys.path.append(_ROOT)

if os.environ.get("AUNCEL_CPU"):
    # opt-out of the accelerator (e.g. the tunnel is down, or you want a
    # laptop run): must land before the first jax.devices() call, and a
    # config update survives environments whose sitecustomize overrides
    # the JAX_PLATFORMS env var
    import jax
    jax.config.update("jax_platforms", "cpu")
