"""Exact-Brandes host-vs-device crossover sweep (round-4 VERDICT #9).

Measures exact (all-source) node betweenness at N = 5k/10k/20k/50k on
ER avg-deg-5 'both' graphs — the same envelope as the published
same-machine rows — on BOTH engines:

- host: lane-batched AVX-512 level-synchronous Brandes
  (``native/src/muninn_graph.cpp``; routed via backend="host")
- device: the batched-source Jacobi fixpoint engine
  (``graph/centrality._brandes_batch``; backend="device", runs on the
  real TPU when the tunnel is up)

Prints one JSON line per (n, backend) with wall seconds, plus a final
summary recommending the routing constant. The published 10k row
(4,437 ms host vs the reference's 5,862 ms) is the thinnest win in
``same_machine.md``; if the device engine is faster there, 'auto'
should route it.

Run on an idle box (single-core discipline, DEVELOPMENT.md):
    python tools/probes/brandes_crossover.py [--sizes 5000,10000,20000]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="5000,10000,20000,50000")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import sys
    from pathlib import Path

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    # sys.path AFTER jax init — PYTHONPATH-style early inserts break
    # the axon plugin discovery (CLAUDE.md)
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    import numpy as np

    from muninn_tpu.graph.api import Graph

    results = []
    for n in [int(s) for s in args.sizes.split(",") if s]:
        rng = np.random.default_rng(1234)
        e = n * 5
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        g = Graph.from_edges(src.tolist(), dst.tolist())
        g.host_csr("forward")
        row = {"n": n, "edges": e}
        vals = {}
        for backend in ("host", "device"):
            times = []
            out = None
            for rep in range(args.repeats + 1):  # first = warm/compile
                t0 = time.perf_counter()
                out = g.betweenness(direction="both", normalized=True,
                                    sample_sources=None,
                                    auto_approx_threshold=10**9,
                                    backend=backend)
                dt = time.perf_counter() - t0
                if rep > 0:
                    times.append(dt)
            times.sort()
            row[f"{backend}_s"] = round(times[len(times) // 2], 3)
            vals[backend] = out
        # engines must agree (same f32 sigma envelope on both)
        ks = sorted(vals["host"])
        hv = np.array([vals["host"][k] for k in ks])
        dv = np.array([vals["device"][k] for k in ks])
        row["max_abs_diff"] = float(np.max(np.abs(hv - dv)))
        row["winner"] = (
            "host" if row["host_s"] <= row["device_s"] else "device"
        )
        results.append(row)
        print(json.dumps(row), flush=True)

    # per-unit costs for the routing table
    summary = {
        "op": "brandes_crossover_summary",
        "host_ns_per_src_edge": [
            round(r["host_s"] / (r["n"] * r["edges"]) * 1e9, 2)
            for r in results
        ],
        "device_ns_per_src_edge": [
            round(r["device_s"] / (r["n"] * r["edges"]) * 1e9, 2)
            for r in results
        ],
        "winners": {r["n"]: r["winner"] for r in results},
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
