"""muninn-tpu — a TPU-native index-and-query engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``neozenith/sqlite-muninn`` (reference: /root/reference):

- **HNSW ANN index** with incremental insert/delete, MN-RU repair and
  patience early-termination (reference: ``src/hnsw_algo.c``), redesigned
  as batched beam search over padded fixed-degree neighbor tables resident
  in HBM, with fused Pallas distance+top-k kernels instead of NEON/SSE
  scalar loops (reference: ``src/vec_math.c``).
- **Graph analytics** over a device-resident CSR: BFS/DFS, shortest paths,
  connected components, PageRank, degree/closeness/betweenness centrality,
  Leiden community detection and a dbt-style node-selector DSL
  (reference: ``src/graph_tvf.c``, ``src/graph_centrality.c``,
  ``src/graph_community.c``, ``src/graph_selector_*.c``), recast as
  SpMV/segment-sum kernels.
- **Node2Vec**: p/q-biased second-order random walks + SGNS training
  (reference: ``src/node2vec.c``) as batched categorical sampling and
  gather/scatter embedding updates.
- **Persistence**: checkpoint/resume of indexes and CSR caches with delta
  logs (the role of the reference's SQLite shadow tables,
  ``src/hnsw_vtab.c:138-341``, ``src/graph_adjacency.c:150-207``).
- **Text / LLM layer**: tokenization, embedding, extraction and an
  entity-resolution cascade (reference: ``src/llama_*.c``) behind
  pluggable backends.

The public API mirrors the reference's SQL surface as plain Python:
``HnswIndex``, ``FlatIndex``, ``Graph`` (analytics methods), ``GraphCache``
(persistent CSR with delta replay), ``node2vec_train``, ``select`` and
``resolve_entities``.
"""

__version__ = "0.5.0"

from muninn_tpu.ops.distance import (  # noqa: F401
    Metric,
    pairwise_distances,
    parse_metric,
)
from muninn_tpu.index.flat import FlatIndex, QuantizedFlatIndex  # noqa: F401
from muninn_tpu.index.hnsw import HnswIndex  # noqa: F401
from muninn_tpu.index.ivf import IvfIndex  # noqa: F401
from muninn_tpu.graph.api import Graph  # noqa: F401
from muninn_tpu.graph.adjacency import GraphCache  # noqa: F401
from muninn_tpu.graph.selector import select  # noqa: F401
from muninn_tpu.models.node2vec import node2vec_train  # noqa: F401

__all__ = [
    "Metric",
    "pairwise_distances",
    "parse_metric",
    "FlatIndex",
    "QuantizedFlatIndex",
    "HnswIndex",
    "IvfIndex",
    "Graph",
    "GraphCache",
    "select",
    "node2vec_train",
    "__version__",
]
