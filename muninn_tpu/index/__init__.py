"""Index layer: exact (flat) and approximate (HNSW) vector indexes.

TPU-native replacement for the reference's ``src/hnsw_algo.c`` /
``src/hnsw_vtab.c``: device-resident padded arrays instead of
pointer-chased hash tables, batched beam search instead of per-query
heap traversal, batched insertion waves instead of per-row vtab updates.
"""

from muninn_tpu.index.flat import FlatIndex
from muninn_tpu.index.hnsw import HnswIndex

__all__ = ["FlatIndex", "HnswIndex"]
