"""auncel_tpu — TPU-native error-bounded approximate vector query engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of Auncel
(NSDI'23, reference: pkusys/Auncel): IVF-Flat approximate nearest-neighbor
search where each query carries its own error bound (e.g. "recall@10 >= 0.9")
or latency budget, and the engine terminates multi-probe search per query as
early as the bound allows, using an offline-trained geometric error profile
(a phi -> U map per probe stage).

Design stance (TPU-first, not a port):
  * Inverted lists are padded dense ``[nlist, cap, d]`` HBM arrays; per-list
    scans are MXU matmuls fused with exact top-k, not pointer-chasing heaps.
  * The sequential per-query probe loop of the reference
    (``Auncel/IndexIVF.cpp:497-736``) becomes *wave execution*: probes are
    scanned in fixed-shape waves shared by a query batch, and the bounded
    termination predicate is evaluated batch-wide with masks instead of
    branches.
  * Scale-out replaces the reference's TCP master/worker (``dist/``) with a
    ``jax.sharding.Mesh`` + ``shard_map`` SPMD program and collective top-k
    merge over ICI.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache. On the axon-tunneled TPU an identical
# program compiles in 1 s - 10 min (server-side lottery); caching the
# serialized executable makes every process after the first hit warm
# (measured: 592 s first compile -> 0.30 s from a fresh process). Opt out
# with AUNCEL_NO_COMPILE_CACHE=1; relocate with AUNCEL_COMPILE_CACHE_DIR.
if not _os.environ.get("AUNCEL_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "AUNCEL_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      _os.pardir, ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.5)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass

from auncel_tpu.types import Metric
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.hnsw import HNSWIndex
from auncel_tpu.index.factory import index_factory
from auncel_tpu.index.binary import index_binary_factory

try:  # profile engine lands after the index core
    from auncel_tpu.profile.error_sys import ErrorSys
except ImportError:  # pragma: no cover
    ErrorSys = None

__version__ = "0.1.0"

__all__ = [
    "Metric",
    "FlatIndex",
    "IVFFlatIndex",
    "HNSWIndex",
    "index_factory",
    "index_binary_factory",
    "ErrorSys",
    "__version__",
]
