from auncel_tpu.ops.distance import (
    sqnorms,
    pairwise_l2sqr,
    pairwise_ip,
    pairwise_scores,
)
from auncel_tpu.ops.topk import topk_scores, merge_topk, sort_scores
from auncel_tpu.ops.knn import knn, KnnResult

__all__ = [
    "sqnorms",
    "pairwise_l2sqr",
    "pairwise_ip",
    "pairwise_scores",
    "topk_scores",
    "merge_topk",
    "sort_scores",
    "knn",
    "KnnResult",
]
