"""Host-vs-device routing for graph analytics.

The reference's whole published graph benchmark envelope is 100-10k
nodes at ms scale (``docs/benchmarks/graph.md:14-47``); one TPU tunnel
dispatch costs 0.2-0.4 s, so small workloads route to the native C++
kernels (``native/src/muninn_graph.cpp``). The decision compares an
estimated host op count against ``MUNINN_HOST_GRAPH_BUDGET`` (default
1e8 ≈ a few hundred ms single-thread); larger work keeps the device
fixpoint kernels, which win from ~10^6 edges up.
"""

from __future__ import annotations

import os

from muninn_tpu import native

HOST_GRAPH_BUDGET = int(float(os.environ.get("MUNINN_HOST_GRAPH_BUDGET", 1e8)))


def use_host(backend: str, work: float) -> bool:
    """True when `backend` + estimated host `work` route to the native
    host kernels. backend: 'auto' | 'host' | 'device'."""
    if backend == "host":
        if not native.graph_available():
            raise RuntimeError("native graph kernels unavailable")
        return True
    if backend == "device":
        return False
    if backend != "auto":
        raise ValueError(f"backend must be auto|host|device, got {backend!r}")
    return work <= HOST_GRAPH_BUDGET and native.graph_available()
