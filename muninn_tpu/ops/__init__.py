"""Kernel layer: fused distance / top-k / segment primitives.

TPU-native replacement for the reference's shared primitives layer
(``src/vec_math.c`` SIMD kernels, ``src/priority_queue.c`` binary heap).
Heaps become masked top-k over fixed-size arrays; distance loops become
MXU matmuls tiled by Pallas.
"""

from muninn_tpu.ops.distance import Metric, pairwise_distances, parse_metric
from muninn_tpu.ops.topk import masked_topk, merge_topk

__all__ = [
    "Metric",
    "pairwise_distances",
    "parse_metric",
    "masked_topk",
    "merge_topk",
]
