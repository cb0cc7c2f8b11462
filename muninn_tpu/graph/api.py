"""Public graph-analytics API.

The Python-call surface replacing the reference's SQL TVFs
(``graph_bfs``, ``graph_dfs``, ``graph_shortest_path``,
``graph_components``, ``graph_pagerank`` — ``src/graph_tvf.c``;
``graph_degree``/``graph_node_betweenness``/``graph_edge_betweenness``/
``graph_closeness`` — ``src/graph_centrality.c``; ``graph_leiden`` —
``src/graph_community.c``). Hidden-column SQL parameters become keyword
arguments; results come back as numpy arrays / lists aligned to
original node ids instead of SQL rows.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from muninn_tpu.graph import core
from muninn_tpu.graph import traversal as trv
from muninn_tpu.graph import centrality as ctr
from muninn_tpu.graph import community as cmty
from muninn_tpu.graph.pagerank import pagerank_device, pagerank_sorted


class Graph(core.Graph):
    """Graph with analytics methods. Construct via ``Graph.from_edges``.

    ``direction`` arguments follow the reference semantics
    (``src/graph_load.c:215-245``): 'forward' traverses src->dst,
    'reverse' traverses dst->src, 'both' treats edges as undirected.
    """

    # ── traversal ──

    def bfs(self, start, max_depth: int | None = None, direction: str = "forward"):
        """Breadth-first traversal. Returns list of (node, depth, parent)
        ordered by (depth, node index), parent None for the root —
        the reference TVF's output columns (``src/graph_tvf.c:230-416``).
        """
        s = self.node_index(start)
        md = max_depth if max_depth is not None else self.num_nodes
        c = self.csr(direction)
        depth, parent = trv.bfs_device(c.src, c.dst, jnp.int32(s), self.num_nodes, md)
        depth = np.asarray(depth)
        parent = np.asarray(parent)
        reached = np.nonzero(depth < 2**30)[0]
        order = reached[np.lexsort((reached, depth[reached]))]
        return [
            (
                self.nodes.id_of(int(v)),
                int(depth[v]),
                self.nodes.id_of(int(parent[v])) if parent[v] >= 0 else None,
            )
            for v in order
        ]

    def dfs(self, start, max_depth: int | None = None, direction: str = "forward"):
        """Depth-first traversal order (node, depth, parent)."""
        s = self.node_index(start)
        md = max_depth if max_depth is not None else self.num_nodes
        c = self.csr(direction)
        rows = trv.dfs_host(
            np.asarray(c.offsets), np.asarray(c.dst), s, md
        )
        return [
            (
                self.nodes.id_of(v),
                d,
                self.nodes.id_of(p) if p >= 0 else None,
            )
            for v, d, p in rows
        ]

    def shortest_path(
        self, start, end, *, weighted: bool | None = None,
        direction: str = "forward",
    ):
        """Shortest path. Returns (path list of node ids, distance) or
        ([], inf) when unreachable. ``weighted`` defaults to whether
        weights were supplied (the reference picks BFS vs Dijkstra by
        the weight_col argument, ``src/graph_tvf.c:472-753``)."""
        s = self.node_index(start)
        t = self.node_index(end)
        if weighted is None:
            weighted = self.has_weights
        c = self.csr(direction)
        w = c.weights if weighted else jnp.ones_like(c.weights)
        dist, parent = trv.sssp_with_parents(
            c.src, c.dst, w, jnp.int32(s), self.num_nodes
        )
        dist = np.asarray(dist)
        parent = np.asarray(parent)
        if not np.isfinite(dist[t]):
            return [], float("inf")
        path_idx = trv.reconstruct_path(parent, s, t)
        return [self.nodes.id_of(i) for i in path_idx], float(dist[t])

    def connected_components(self):
        """Returns dict node_id -> (component_id, component_size);
        component ids are 0..k-1 renumbered by first appearance
        (``src/graph_tvf.c:1204-1360``). Undirected semantics (the
        reference's union-find ignores direction)."""
        c = self.csr("both")
        comp = np.asarray(
            trv.connected_components_device(c.src, c.dst, self.num_nodes)
        )
        _, inv = np.unique(comp, return_inverse=True)
        sizes = np.bincount(inv)
        return {
            self.nodes.id_of(i): (int(inv[i]), int(sizes[inv[i]]))
            for i in range(self.num_nodes)
        }

    # ── spectral / iterative ──

    def pagerank(
        self, damping: float = 0.85, iterations: int = 20,
        *, weighted: bool = False, direction: str = "forward",
    ) -> dict:
        """PageRank with dangling redistribution; defaults match the
        reference (damping=0.85, iterations=20,
        ``src/graph_tvf.c:1631-1717``). Returns node_id -> rank."""
        c = self.csr(direction)
        if weighted:
            hs, _, hw = c.host_coo()
            deg = np.zeros(self.num_nodes, np.float32)
            np.add.at(deg, hs, hw)
            deg_j = jnp.asarray(deg)
        else:
            deg_j = c.degrees().astype(jnp.float32)
        # the pull iterates over TARGET-sorted edges (the opposite
        # direction's CSR), where per-node sums are scatter-free prefix
        # window sums — ~3x the XLA scatter-add SpMV at 10M edges
        opposite = {"forward": "reverse", "reverse": "forward", "both": "both"}
        cr = self.csr(opposite[direction])
        rank = np.asarray(
            pagerank_sorted(
                cr.offsets, cr.dst, cr.weights, deg_j, self.num_nodes,
                damping, iterations, weighted,
            )
        )
        return {self.nodes.id_of(i): float(rank[i]) for i in range(self.num_nodes)}

    # ── centrality ──

    def degree(
        self, *, direction: str = "both", weighted: bool = False,
        normalized: bool = False,
    ) -> dict:
        vals = ctr.degree_centrality(
            self._src, self._dst, self._w, self.num_nodes,
            direction=direction, weighted=weighted, normalized=normalized,
        )
        return {self.nodes.id_of(i): float(vals[i]) for i in range(self.num_nodes)}

    def betweenness(
        self, *, normalized: bool = False, direction: str = "both",
        weighted: bool = False, sample_sources: int | None = None,
        auto_approx_threshold: int = ctr.DEFAULT_APPROX_THRESHOLD,
        seed: int = 0,
    ) -> dict:
        """Brandes node betweenness (``src/graph_centrality.c:393-512``).
        sqrt(N)-source sampling above ``auto_approx_threshold``."""
        c = self.csr(direction)
        hs, hd, hw = c.host_coo()
        w = hw if weighted else np.ones(c.num_edges, np.float32)
        s, d, w = ctr.dedupe_parallel_edges(hs, hd, w, self.num_nodes)
        cb, _ = ctr.betweenness(
            s, d, w, self.num_nodes,
            undirected=(direction == "both"), normalized=normalized,
            sample_sources=sample_sources,
            auto_approx_threshold=auto_approx_threshold, seed=seed,
        )
        return {self.nodes.id_of(i): float(cb[i]) for i in range(self.num_nodes)}

    def edge_betweenness(
        self, *, normalized: bool = False, direction: str = "both",
        weighted: bool = False, sample_sources: int | None = None,
        auto_approx_threshold: int = ctr.DEFAULT_APPROX_THRESHOLD,
        seed: int = 0,
    ) -> dict:
        """Edge betweenness keyed by (src_id, dst_id). For 'both', the
        two orientations of an input edge are combined."""
        c = self.csr(direction)
        hs, hd, hw = c.host_coo()
        w = hw if weighted else np.ones(c.num_edges, np.float32)
        srcs, dsts, w = ctr.dedupe_parallel_edges(hs, hd, w, self.num_nodes)
        _, eb = ctr.betweenness(
            srcs, dsts, w, self.num_nodes,
            undirected=(direction == "both"), normalized=normalized,
            want_edge=True, sample_sources=sample_sources,
            auto_approx_threshold=auto_approx_threshold, seed=seed,
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
        weighted: bool = False,
    ) -> dict:
        """Closeness with Wasserman-Faust correction when normalized
        (``src/graph_centrality.c:1404-1434``). For directed graphs the
        standard definition uses *incoming* distances, so 'forward'
        here measures distance from the node along edge direction."""
        c = self.csr(
            "both" if direction == "both"
            else ("reverse" if direction == "forward" else "forward")
        )
        hs, hd, hw = c.host_coo()
        w = hw if weighted else np.ones(c.num_edges, np.float32)
        vals = ctr.closeness(hs, hd, w, self.num_nodes, normalized=normalized)
        return {self.nodes.id_of(i): float(vals[i]) for i in range(self.num_nodes)}

    # ── communities ──

    def leiden(
        self, *, resolution: float = 1.0, seed: int = 0,
        max_rounds: int = 100,
    ):
        """Leiden communities. Returns (node_id -> community_id,
        modularity) — the reference TVF emits (node, community_id,
        modularity) rows (``src/graph_community.c``)."""
        c = self.csr("both")
        hs, hd, hw = c.host_coo()
        labels, q = cmty.leiden(
            hs, hd, hw, self.num_nodes, resolution=resolution, seed=seed,
            max_rounds=max_rounds,
        )
        return (
            {self.nodes.id_of(i): int(labels[i]) for i in range(self.num_nodes)},
            float(q),
        )

    def modularity(self, labels: dict, resolution: float = 1.0) -> float:
        c = self.csr("both")
        hs, hd, hw = c.host_coo()
        lab = np.array(
            [labels[self.nodes.id_of(i)] for i in range(self.num_nodes)],
            np.int32,
        )
        return cmty.modularity(hs, hd, hw, lab, resolution)
