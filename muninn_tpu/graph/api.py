"""Public graph-analytics API.

The Python-call surface replacing the reference's SQL TVFs
(``graph_bfs``, ``graph_dfs``, ``graph_shortest_path``,
``graph_components``, ``graph_pagerank`` — ``src/graph_tvf.c``;
``graph_degree``/``graph_node_betweenness``/``graph_edge_betweenness``/
``graph_closeness`` — ``src/graph_centrality.c``; ``graph_leiden`` —
``src/graph_community.c``). Hidden-column SQL parameters become keyword
arguments; results come back as numpy arrays / lists aligned to
original node ids instead of SQL rows.

Backend routing
---------------
Every analytics method takes ``backend='auto'|'host'|'device'``. The
reference's entire published graph benchmark envelope is 100-10k nodes
(``docs/benchmarks/graph.md:14-47``, ms scale); at those sizes one TPU
tunnel dispatch (0.2-0.4 s) already loses by orders of magnitude, so
'auto' routes each op to whichever engine is faster at the workload's
size — the native C++ kernels (``native/src/muninn_graph.cpp``) win
through tens of millions of edges; the device fixpoints take over when
the estimated host time passes ``MUNINN_HOST_GRAPH_SECONDS`` (see
``graph.routing`` for the measured calibration). Both paths produce
identical results (same tie-breaks, same epsilon rules) — tests assert
cross-backend agreement.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from muninn_tpu import native
from muninn_tpu.graph import core
from muninn_tpu.graph import traversal as trv
from muninn_tpu.graph import centrality as ctr
from muninn_tpu.graph import community as cmty
from muninn_tpu.graph.pagerank import pagerank_sorted
from muninn_tpu.graph import routing
from muninn_tpu.graph.routing import use_host
from muninn_tpu.ops.segments import n_passes_for

#: traversal along a direction pulls over the opposite CSR's segments
_OPP = {"forward": "reverse", "reverse": "forward", "both": "both"}


class Graph(core.Graph):
    """Graph with analytics methods. Construct via ``Graph.from_edges``.

    ``direction`` arguments follow the reference semantics
    (``src/graph_load.c:215-245``): 'forward' traverses src->dst,
    'reverse' traverses dst->src, 'both' treats edges as undirected.
    """

    def _use_host(self, backend: str, work: float) -> bool:
        if backend == "auto" and self.device_native:
            # device-resident graph whose host COO mirror hasn't been
            # materialized (from_device_edges): routing to the host
            # would first download the full edge list through the
            # ~50 MB/s tunnel — minutes at the 100M-edge scale the
            # constructor exists for, silently inverting its
            # nothing-crosses-the-host-boundary promise. 'auto' stays
            # on device; pass backend='host' to opt into the download.
            return False
        return use_host(backend, work)

    # ── traversal ──

    def bfs(self, start, max_depth: int | None = None,
            direction: str = "forward", backend: str = "auto",
            as_array: bool = False):
        """Breadth-first traversal. Returns list of (node, depth, parent)
        ordered by (depth, node index), parent None for the root —
        the reference TVF's output columns (``src/graph_tvf.c:230-416``).
        ``as_array=True`` instead returns the raw ``(depth, parent)``
        index-aligned int arrays (depth >= 2**30 == unreached) — the
        only usable shape at device scale (a 10M-row python list is
        not a result, it's a liability).
        """
        s = self.node_index(start)
        md = max_depth if max_depth is not None else self.num_nodes
        if self._use_host(backend, routing.COST_BFS_EDGE * self.num_edges):
            off, _, dd, _ = self.host_csr(direction)
            depth, parent = native.graph_bfs(off, dd, s, md)
        else:
            # pull-form kernel: traversal along `direction` consumes the
            # OPPOSITE CSR (its segments are each node's in-edges)
            c = self.csr(_OPP[direction])
            depth, parent = trv.bfs_pull(
                c.offsets, c.dst, jnp.int32(s), self.num_nodes, md,
                n_passes=n_passes_for(c.max_deg),
                edge_chunk=trv.edge_chunk_for(c.capacity),
            )
            depth = np.asarray(depth)
            parent = np.asarray(parent)
        if as_array:
            return depth, parent
        reached = np.nonzero(depth < 2**30)[0]
        order = reached[np.lexsort((reached, depth[reached]))]
        # bulk .tolist() + one local id lookup per row: per-element
        # numpy indexing and int() casts made row assembly 20x the
        # C BFS itself at 50k nodes (95% of the measured call)
        id_of = self.nodes.id_of
        return [
            (id_of(v), d, id_of(p) if p >= 0 else None)
            for v, d, p in zip(
                order.tolist(),
                depth[order].tolist(),
                parent[order].tolist(),
            )
        ]

    def dfs(self, start, max_depth: int | None = None, direction: str = "forward"):
        """Depth-first traversal order (node, depth, parent). DFS is an
        inherently sequential enumeration — always host (C++ kernel
        when available, python fallback otherwise; identical order)."""
        s = self.node_index(start)
        md = max_depth if max_depth is not None else self.num_nodes
        off, _, dd, _ = self.host_csr(direction)
        res = native.graph_dfs(off, dd, s, md)
        if res is None:
            rows = trv.dfs_host(off, dd, s, md)
            order = [r[0] for r in rows]
            depth = [r[1] for r in rows]
            parent = [r[2] for r in rows]
        else:
            order, depth, parent = (a.tolist() for a in res)
        id_of = self.nodes.id_of
        return [
            (id_of(v), d, id_of(p) if p >= 0 else None)
            for v, d, p in zip(order, depth, parent)
        ]

    def shortest_path(
        self, start, end, *, weighted: bool | None = None,
        direction: str = "forward", backend: str = "auto",
    ):
        """Shortest path. Returns (path list of node ids, distance) or
        ([], inf) when unreachable. ``weighted`` defaults to whether
        weights were supplied (the reference picks BFS vs Dijkstra by
        the weight_col argument, ``src/graph_tvf.c:472-753``)."""
        s = self.node_index(start)
        t = self.node_index(end)
        if weighted is None:
            weighted = self.has_weights
        # Dijkstra is ~E log V; the device Bellman-Ford is depth x E
        if self._use_host(backend, routing.COST_SSSP_EDGE * self.num_edges):
            hs, hd, hw = self.host_coo(direction)
            w = hw if weighted else np.ones_like(hw)
            dist, parent = native.graph_sssp(hs, hd, w, self.num_nodes, s)
        else:
            c = self.csr(_OPP[direction])  # pull CSR
            w = (
                c.w() if weighted
                else jnp.ones((c.capacity,), jnp.float32)
            )
            dist, parent = trv.sssp_with_parents_pull(
                c.offsets, c.dst, w, jnp.int32(s), self.num_nodes,
                n_passes=n_passes_for(c.max_deg),
            )
            dist = np.asarray(dist)
            parent = np.asarray(parent)
        if not np.isfinite(dist[t]):
            return [], float("inf")
        path_idx = trv.reconstruct_path(parent, s, t)
        return [self.nodes.id_of(i) for i in path_idx], float(dist[t])

    def connected_components(self, backend: str = "auto",
                             as_array: bool = False):
        """Returns dict node_id -> (component_id, component_size);
        component ids are 0..k-1 renumbered by first appearance
        (``src/graph_tvf.c:1204-1360``). Undirected semantics (the
        reference's union-find ignores direction). ``as_array=True``
        returns the index-aligned renumbered label array instead (sizes
        are one ``np.bincount`` away) — the device-scale shape."""
        if self._use_host(
            backend, routing.COST_COMPONENTS_EDGE * self.num_edges
        ):
            comp = native.graph_components(
                self._src, self._dst, self.num_nodes
            )
        else:
            # undirected neighborhood min over the fwd+rev CSR pair —
            # identical fixpoint to the merged 'both' CSR at half its
            # resident memory (the 2x-capacity merge alone crosses the
            # worker's peak-HBM ceiling at 100M edges)
            cf = self.csr("forward")
            cr = self.csr("reverse")
            comp = np.asarray(
                trv.connected_components_2csr(
                    cf.offsets, cf.dst, cr.offsets, cr.dst,
                    self.num_nodes,
                    n_passes_f=n_passes_for(cf.max_deg),
                    n_passes_r=n_passes_for(cr.max_deg),
                    edge_chunk=trv.edge_chunk_for(cf.capacity),
                )
            )
        _, inv = np.unique(comp, return_inverse=True)
        if as_array:
            return inv.astype(np.int32)
        sizes = np.bincount(inv)
        id_of = self.nodes.id_of
        return {
            id_of(i): cs
            for i, cs in enumerate(zip(inv.tolist(), sizes[inv].tolist()))
        }

    # ── spectral / iterative ──

    def pagerank(
        self, damping: float = 0.85, iterations: int = 20,
        *, weighted: bool = False, direction: str = "forward",
        backend: str = "auto", as_array: bool = False,
    ):
        """PageRank with dangling redistribution; defaults match the
        reference (damping=0.85, iterations=20,
        ``src/graph_tvf.c:1631-1717``). Returns node_id -> rank, or the
        index-aligned float array with ``as_array=True`` (device-scale
        shape)."""
        e_dir = self.num_edges * (2 if direction == "both" else 1)
        if self._use_host(
            backend, routing.COST_PAGERANK_EDGE_ITER * e_dir * iterations
        ):
            hs, hd, hw = self.host_coo(direction)
            deg = np.zeros(self.num_nodes, np.float32)
            if weighted:
                np.add.at(deg, hs, hw)
            else:
                np.add.at(deg, hs, 1.0)
            rank = native.graph_pagerank(
                hs, hd, hw, deg, damping, iterations, weighted
            )
            if as_array:
                return np.asarray(rank, np.float32)
            id_of = self.nodes.id_of
            return {id_of(i): r
                    for i, r in enumerate(np.asarray(rank).tolist())}
        # the pull iterates over TARGET-sorted edges (the opposite
        # direction's CSR), where per-node sums are scatter-free prefix
        # window sums — ~3x the XLA scatter-add SpMV at 10M edges
        opposite = {"forward": "reverse", "reverse": "forward", "both": "both"}
        cr = self.csr(opposite[direction])
        cached = {
            "forward": self._fwd, "reverse": self._rev,
            "both": getattr(self, "_both", None),
        }[direction]
        if cached is None and self.device_native:
            # out-degrees WITHOUT building the direction CSR (whose
            # only role here is degrees): cr's value array holds
            # exactly the source endpoints, so a chunked bincount over
            # it gives the same sums — at 134M-edge capacity this
            # avoids a full device sort and ~1.1 GB of resident HBM
            from muninn_tpu.ops.segments import bincount_chunked

            deg_j = bincount_chunked(
                cr.dst, cr.weights if weighted else None,
                self.num_nodes, trv.EDGE_CHUNK,
            )
        else:
            c = self.csr(direction)
            if weighted:
                # weighted out-degree on device: the forward CSR groups
                # edges by src, so per-node weight sums are segment
                # sums (pad edges carry w=0). The former host_coo()
                # here pulled the full [E] arrays through the tunnel —
                # minutes at the 100M-edge scale the device path
                # exists for.
                from muninn_tpu.ops.segments import seg_sum

                deg_j = seg_sum(c.w(), c.offsets)
            else:
                deg_j = c.degrees().astype(jnp.float32)
        # unweighted: never touches the weights arg (a lean device CSR
        # has none; materializing a ones vector is 537 MB at 100M edges)
        w_arg = cr.w() if weighted else jnp.zeros((1,), jnp.float32)
        rank = np.asarray(
            pagerank_sorted(
                cr.offsets, cr.dst, w_arg, deg_j, self.num_nodes,
                damping, iterations, weighted,
                edge_chunk=trv.edge_chunk_for(cr.capacity),
            )
        )
        if as_array:
            return rank
        id_of = self.nodes.id_of
        return {id_of(i): r for i, r in enumerate(rank.tolist())}

    # ── centrality ──

    def degree(
        self, *, direction: str = "both", weighted: bool = False,
        normalized: bool = False,
    ) -> dict:
        vals = ctr.degree_centrality(
            self._src, self._dst, self._w, self.num_nodes,
            direction=direction, weighted=weighted, normalized=normalized,
        )
        id_of = self.nodes.id_of
        return {id_of(i): v for i, v in enumerate(vals.tolist())}

    def betweenness(
        self, *, normalized: bool = False, direction: str = "both",
        weighted: bool = False, sample_sources: int | None = None,
        auto_approx_threshold: int = ctr.DEFAULT_APPROX_THRESHOLD,
        seed: int = 0, backend: str = "auto",
    ) -> dict:
        """Brandes node betweenness (``src/graph_centrality.c:393-512``).
        sqrt(N)-source sampling above ``auto_approx_threshold``."""
        hs, hd, hw = self.host_coo(direction)
        w = hw if weighted else np.ones(len(hs), np.float32)
        s, d, w = ctr.dedupe_parallel_edges(hs, hd, w, self.num_nodes)
        cb, _ = ctr.betweenness(
            s, d, w, self.num_nodes,
            undirected=(direction == "both"), normalized=normalized,
            sample_sources=sample_sources,
            auto_approx_threshold=auto_approx_threshold, seed=seed,
            backend=backend, weighted_alg=weighted,
        )
        id_of = self.nodes.id_of
        return {id_of(i): v for i, v in enumerate(cb.tolist())}

    def edge_betweenness(
        self, *, normalized: bool = False, direction: str = "both",
        weighted: bool = False, sample_sources: int | None = None,
        auto_approx_threshold: int = ctr.DEFAULT_APPROX_THRESHOLD,
        seed: int = 0, backend: str = "auto",
    ) -> dict:
        """Edge betweenness keyed by (src_id, dst_id). For 'both', the
        two orientations of an input edge are combined."""
        hs, hd, hw = self.host_coo(direction)
        w = hw if weighted else np.ones(len(hs), np.float32)
        srcs, dsts, w = ctr.dedupe_parallel_edges(hs, hd, w, self.num_nodes)
        _, eb = ctr.betweenness(
            srcs, dsts, w, self.num_nodes,
            undirected=(direction == "both"), normalized=normalized,
            want_edge=True, sample_sources=sample_sources,
            auto_approx_threshold=auto_approx_threshold, seed=seed,
            backend=backend, weighted_alg=weighted,
        )
        out: dict = {}
        for s, d, v in zip(srcs.tolist(), dsts.tolist(), eb.tolist()):
            if direction == "both":
                key = (self.nodes.id_of(min(s, d)), self.nodes.id_of(max(s, d)))
            else:
                key = (self.nodes.id_of(s), self.nodes.id_of(d))
            out[key] = out.get(key, 0.0) + v
        return out

    def closeness(
        self, *, normalized: bool = True, direction: str = "both",
        weighted: bool = False, backend: str = "auto",
    ) -> dict:
        """Closeness with Wasserman-Faust correction when normalized
        (``src/graph_centrality.c:1404-1434``). For directed graphs the
        standard definition uses *incoming* distances, so 'forward'
        here measures distance from the node along edge direction."""
        eff_dir = (
            "both" if direction == "both"
            else ("reverse" if direction == "forward" else "forward")
        )
        hs, hd, hw = self.host_coo(eff_dir)
        w = hw if weighted else np.ones(len(hs), np.float32)
        vals = ctr.closeness(
            hs, hd, w, self.num_nodes, normalized=normalized,
            backend=backend, weighted_alg=weighted,
        )
        id_of = self.nodes.id_of
        return {id_of(i): v for i, v in enumerate(vals.tolist())}

    # ── communities ──

    def leiden(
        self, *, resolution: float = 1.0, seed: int = 0,
        max_rounds: int = 100, backend: str = "auto",
    ):
        """Leiden communities. Returns (node_id -> community_id,
        modularity) — the reference TVF emits (node, community_id,
        modularity) rows (``src/graph_community.c``)."""
        hs, hd, hw = self.host_coo("both")
        labels, q = cmty.leiden(
            hs, hd, hw, self.num_nodes, resolution=resolution, seed=seed,
            max_rounds=max_rounds, backend=backend,
        )
        return (
            {id_of(i): l for id_of in (self.nodes.id_of,)
             for i, l in enumerate(np.asarray(labels).tolist())},
            float(q),
        )

    def modularity(self, labels: dict, resolution: float = 1.0) -> float:
        hs, hd, hw = self.host_coo("both")
        lab = np.array(
            [labels[self.nodes.id_of(i)] for i in range(self.num_nodes)],
            np.int32,
        )
        return cmty.modularity(hs, hd, hw, lab, resolution)
