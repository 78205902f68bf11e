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

from auncel_tpu.types import Metric
from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.ivf import IVFFlatIndex
from auncel_tpu.index.hnsw import HNSWIndex
from auncel_tpu.index.factory import index_factory

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
    "ErrorSys",
    "__version__",
]
