"""Graph analytics layer over a device-resident CSR.

TPU-native replacement for the reference's graph stack
(src/graph_load.c, src/graph_csr.c, src/graph_tvf.c,
src/graph_centrality.c, src/graph_community.c, src/graph_adjacency.c,
src/graph_selector_*.c).
"""

from muninn_tpu.graph.api import Graph
from muninn_tpu.graph.core import NodeTable, DeviceCsr

__all__ = ["Graph", "NodeTable", "DeviceCsr"]
