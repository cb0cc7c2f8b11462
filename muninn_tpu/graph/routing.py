"""Host-vs-device routing for graph analytics.

'auto' routes each operation to whichever engine is FASTER at the
workload's size, using measured per-unit host costs (single-thread C++,
``native/src/muninn_graph.cpp``; calibrated at 1M nodes / 10M edges):

    BFS 21 ns/edge - components 17 ns/edge - PageRank 15 ns/edge/iter -
    Brandes ~95 ns/(source x edge) - Leiden ~2 us/edge

Device dispatch through this environment's TPU tunnel costs 0.2-0.4 s
per call and the device fixpoints are gather/sort-bound (BFS 6.4 s,
components 9.0 s, PageRank 4.2 s at 1M/10M) — so the host wins through
tens of millions of edges, and by 100-1000x on the reference's whole
published envelope (100-10k nodes, ms scale). The device paths take
over where estimated host time exceeds ``MUNINN_HOST_GRAPH_SECONDS``
(default 60): huge graphs, large source batches, all-pairs closeness.

Callers pass an estimated HOST time in seconds.
"""

from __future__ import annotations

import os

from muninn_tpu import native

HOST_GRAPH_SECONDS = float(os.environ.get("MUNINN_HOST_GRAPH_SECONDS", 60.0))

# measured per-unit host costs (seconds); see module docstring
COST_BFS_EDGE = 21e-9
COST_COMPONENTS_EDGE = 17e-9
COST_SSSP_EDGE = 40e-9          # Dijkstra's log factor over BFS
COST_PAGERANK_EDGE_ITER = 16e-9
COST_BRANDES_SRC_EDGE = 95e-9
# unweighted Brandes runs the lane-batched level-synchronous kernel
# (brandes_unw_batch): measured ~20 ns/(source x edge) at the 10k-node
# envelope — exact all-source betweenness at 10k/100k-both is ~20 s,
# well under the ceiling (the weighted constant routed it to the
# device, which is 100-1000x slower at this scale)
COST_BRANDES_SRC_EDGE_UNWEIGHTED = 25e-9
COST_CLOSENESS_SRC_EDGE = 95e-9
# unweighted closeness runs the int32-BFS specialization with no
# sigma/predecessor bookkeeping — measured ~1.6 ns/(source x edge)
# at 5k nodes (0.80 s for 5k sources x 100k both-edges); 4 ns keeps
# 2.5x headroom. Using the weighted constant here routed 10k-node
# all-source closeness to the device for no reason (95 s estimate vs
# ~4 s actual).
COST_CLOSENESS_SRC_EDGE_UNWEIGHTED = 4e-9
COST_LEIDEN_EDGE = 2e-6
# node2vec host trainer: per (pair x dim) SGNS unit — measured 0.83
# ns at the 100-2k envelope (vectorized dot + two AXPYs per target,
# LUT sigmoid, O(1) unigram negatives; muninn_node2vec_train)
COST_SGNS_PAIR_DIM = 0.9e-9
# node2vec host/device crossover: the DEVICE trainer amortizes with
# scale (202 nodes/s at 2k and climbing; the host is flat ~160), so
# node2vec routes host only below ~10 estimated host seconds — unlike
# the graph ops, whose device forms stay dispatch-bound far longer
HOST_N2V_SECONDS = float(os.environ.get("MUNINN_HOST_N2V_SECONDS", 10.0))


def use_host(backend: str, host_seconds: float,
             ceiling: float | None = None) -> bool:
    """True when `backend` + estimated `host_seconds` route to the
    native host kernels. backend: 'auto' | 'host' | 'device'.
    ``ceiling`` overrides the default 60 s host budget for ops whose
    device form crosses over sooner (node2vec)."""
    if backend == "host":
        if not native.graph_available():
            raise RuntimeError("native graph kernels unavailable")
        return True
    if backend == "device":
        return False
    if backend != "auto":
        raise ValueError(f"backend must be auto|host|device, got {backend!r}")
    lim = HOST_GRAPH_SECONDS if ceiling is None else ceiling
    return host_seconds <= lim and native.graph_available()
