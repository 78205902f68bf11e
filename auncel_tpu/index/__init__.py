from auncel_tpu.index.flat import FlatIndex
from auncel_tpu.index.ivf import IVFFlatIndex, IVFArrays
from auncel_tpu.index.factory import index_factory

__all__ = ["FlatIndex", "IVFFlatIndex", "IVFArrays", "index_factory"]
