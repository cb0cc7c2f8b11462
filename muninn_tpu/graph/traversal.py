"""Traversal kernels: BFS, multi-source distances, components, paths.

TPU re-design of the reference's per-step SQL neighbor lookups and
hash-set visited tracking (``src/graph_tvf.c:230-416,472-753,1204-1360``):
frontier expansion becomes edge-parallel segment-min/max over the COO
arrays; the visited set becomes the dist array itself; weighted paths
use synchronous Bellman-Ford relaxation instead of a lazy-deletion
Dijkstra heap (same results, all-MXU/VPU-friendly fixed shapes).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

INT_INF = jnp.int32(2**30)
_F_INF = jnp.float32(jnp.inf)


@partial(jax.jit, static_argnames=("num_nodes", "max_depth"))
def bfs_device(
    src: jax.Array,
    dst: jax.Array,
    start: jax.Array,       # scalar int32
    num_nodes: int,
    max_depth: int,
) -> tuple[jax.Array, jax.Array]:
    """Single-source BFS. Returns (depth int32[V] — INT_INF if
    unreached, parent int32[V] — -1 for root/unreached).

    Parent choice is the minimum-index active predecessor, which is
    deterministic (the reference's parent is SQL-iteration-order
    dependent; determinism here is a feature, not a parity break).
    """
    depth = jnp.full((num_nodes,), INT_INF, jnp.int32).at[start].set(0)
    parent = jnp.full((num_nodes,), -1, jnp.int32)

    def cond(state):
        depth, parent, d, changed = state
        return changed & (d < max_depth)

    def body(state):
        depth, parent, d, _ = state
        active = depth[src] == d                              # [E]
        cand_src = jnp.where(active, src, INT_INF)
        best_pred = jax.ops.segment_min(
            cand_src, dst, num_segments=num_nodes
        )                                                     # [V]
        reach = (best_pred < INT_INF) & (depth >= INT_INF)
        depth = jnp.where(reach, d + 1, depth)
        parent = jnp.where(reach, best_pred.astype(jnp.int32), parent)
        return depth, parent, d + 1, jnp.any(reach)

    depth, parent, _, _ = jax.lax.while_loop(
        cond, body, (depth, parent, jnp.int32(0), jnp.bool_(True))
    )
    return depth, parent


@partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def seeded_bfs_depths(
    src: jax.Array,
    dst: jax.Array,
    init: jax.Array,        # int32 [V]; INT_INF = not a seed
    num_nodes: int,
    max_iters: int = 0,
) -> jax.Array:
    """Multi-source BFS from *seeded* integer depths: returns
    ``d[u] = min_v (init[v] + hops(v, u))`` over all seeds v. One
    device fixpoint replaces a per-seed BFS launch loop (each eager
    dispatch costs ~0.2-0.4s through this environment's TPU tunnel) —
    used by the selector's closure atoms where the reference walks each
    descendant's ancestor set separately
    (``src/graph_selector_eval.c:153-232``)."""
    if max_iters <= 0:
        max_iters = num_nodes

    def cond(state):
        d, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        d, it, _ = state
        ds = d[src]
        relax = jnp.where(ds < INT_INF, ds + 1, INT_INF)      # [E]
        new = jnp.minimum(
            d, jax.ops.segment_min(relax, dst, num_segments=num_nodes)
        )
        return new, it + 1, jnp.any(new < d)

    dist, _, _ = jax.lax.while_loop(
        cond, body, (init.astype(jnp.int32), jnp.int32(0), jnp.bool_(True))
    )
    return dist


@partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def multi_source_distances(
    src: jax.Array,
    dst: jax.Array,
    w: jax.Array,
    sources: jax.Array,     # [S] int32
    num_nodes: int,
    max_iters: int = 0,
) -> jax.Array:
    """Batched SSSP distances [S, V] via synchronous Bellman-Ford
    (non-negative weights). Replaces the reference's per-source
    BFS/Dijkstra engines (``src/graph_centrality.c:261-379``)."""
    s_count = sources.shape[0]
    if max_iters <= 0:
        max_iters = num_nodes
    dist = jnp.full((s_count, num_nodes), jnp.inf, jnp.float32)
    dist = dist.at[jnp.arange(s_count), sources].set(0.0)

    def cond(state):
        dist, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        dist, it, _ = state
        relax = dist[:, src] + w[None, :]                     # [S, E]
        new = jax.vmap(
            lambda r: jax.ops.segment_min(r, dst, num_segments=num_nodes)
        )(relax)
        new = jnp.minimum(dist, new)
        changed = jnp.any(new < dist)
        return new, it + 1, changed

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist, jnp.int32(0), jnp.bool_(True))
    )
    return dist


@partial(jax.jit, static_argnames=("num_nodes",))
def connected_components_device(
    src: jax.Array, dst: jax.Array, num_nodes: int
) -> jax.Array:
    """Connected components by min-label propagation + pointer jumping
    (converges in ~O(log V) sweeps vs the reference's union-find with
    path halving, ``src/graph_tvf.c:1204-1360``). Edges are treated as
    undirected by the caller (pass the 'both' direction COO)."""
    comp = jnp.arange(num_nodes, dtype=jnp.int32)

    def cond(state):
        comp, changed = state
        return changed

    def body(state):
        comp, _ = state
        # min neighbor label per node
        nbr_min = jax.ops.segment_min(
            comp[src], dst, num_segments=num_nodes,
            indices_are_sorted=False,
        )
        new = jnp.minimum(comp, nbr_min)
        # pointer jumping: follow labels two hops
        new = jnp.minimum(new, new[new])
        new = jnp.minimum(new, new[new])
        return new, jnp.any(new < comp)

    comp, _ = jax.lax.while_loop(cond, body, (comp, jnp.bool_(True)))
    return comp


@partial(jax.jit, static_argnames=("num_nodes", "max_iters"))
def sssp_with_parents(
    src: jax.Array,
    dst: jax.Array,
    w: jax.Array,
    start: jax.Array,
    num_nodes: int,
    max_iters: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Single-source shortest path with parent pointers (weighted,
    non-negative). Bellman-Ford; parents chosen as the min-index
    predecessor achieving the optimal distance."""
    if max_iters <= 0:
        max_iters = num_nodes
    dist = jnp.full((num_nodes,), jnp.inf, jnp.float32).at[start].set(0.0)

    def cond(state):
        dist, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        dist, it, _ = state
        relax = dist[src] + w
        new = jax.ops.segment_min(relax, dst, num_segments=num_nodes)
        new = jnp.minimum(dist, new)
        return new, it + 1, jnp.any(new < dist)

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist, jnp.int32(0), jnp.bool_(True))
    )
    # tight edges: dist[src] + w == dist[dst] (epsilon like the
    # reference's tie detection, src/graph_centrality.c:212-214)
    tight = jnp.abs(dist[src] + w - dist[dst]) <= 1e-9 * jnp.maximum(
        1.0, jnp.abs(dist[dst])
    )
    pred = jnp.where(tight & jnp.isfinite(dist[dst]), src, INT_INF)
    parent = jax.ops.segment_min(pred, dst, num_segments=num_nodes)
    parent = jnp.where(
        (parent < INT_INF) & (jnp.arange(num_nodes) != start), parent, -1
    ).astype(jnp.int32)
    return dist, parent


def dfs_host(
    offsets: np.ndarray,
    targets: np.ndarray,
    start: int,
    max_depth: int,
) -> list[tuple[int, int, int]]:
    """Depth-first traversal order (node, depth, parent) on host.

    DFS order is inherently sequential (a stack); it is an enumeration,
    not a compute kernel, so it stays on host over the CSR arrays —
    mirroring the reference's output contract
    (``src/graph_tvf.c:230-416``) with neighbor ties broken by index
    order.
    """
    visited = set()
    out: list[tuple[int, int, int]] = []
    stack = [(int(start), 0, -1)]
    while stack:
        node, depth, parent = stack.pop()
        if node in visited:
            continue
        visited.add(node)
        out.append((node, depth, parent))
        if depth >= max_depth:
            continue
        nbrs = targets[offsets[node] : offsets[node + 1]]
        # push reversed so lowest-index neighbor is visited first
        for nxt in nbrs[::-1]:
            if int(nxt) not in visited:
                stack.append((int(nxt), depth + 1, node))
    return out


def reconstruct_path(parent: np.ndarray, start: int, end: int) -> list[int]:
    """Walk parent pointers end -> start. Returns [] if unreachable."""
    if start == end:
        return [start]
    path = [end]
    cur = end
    for _ in range(len(parent) + 1):
        cur = int(parent[cur])
        if cur < 0:
            return []
        path.append(cur)
        if cur == start:
            return path[::-1]
    return []
