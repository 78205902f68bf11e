from auncel_tpu.data.io import (
    fvecs_read,
    fvecs_write,
    ivecs_read,
    ivecs_write,
    fbin_read,
    ibin_read,
)
from auncel_tpu.data.synthetic import make_clustered_dataset, Dataset

__all__ = [
    "fvecs_read",
    "fvecs_write",
    "ivecs_read",
    "ivecs_write",
    "fbin_read",
    "ibin_read",
    "make_clustered_dataset",
    "Dataset",
]
