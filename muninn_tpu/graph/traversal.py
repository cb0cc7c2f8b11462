"""Traversal kernels: BFS, multi-source distances, components, paths.

TPU re-design of the reference's per-step SQL neighbor lookups and
hash-set visited tracking (``src/graph_tvf.c:230-416,472-753,1204-1360``):
frontier expansion becomes edge-parallel reductions over the COO
arrays; the visited set becomes the dist array itself; weighted paths
use synchronous Bellman-Ford relaxation instead of a lazy-deletion
Dijkstra heap (same results, all-MXU/VPU-friendly fixed shapes).

All fixpoints consume a **pull CSR** — in-edges sorted by target node:
``roff [V+1]`` offsets, ``esrc [E_pad]`` source endpoint per edge
(pads = V), optional ``w``. Per-node reductions are then *sorted
segment* ops (``ops/segments``): sums via chunked prefix windows,
min via a segmented associative scan — NO scatters anywhere. XLA's
scatter caps edge ops at ~36-60M edge/s on v5e (round-2 measurement);
the sorted forms are bandwidth-bound instead.

For direction ``d``, the pull CSR is the OPPOSITE direction's CSR
(its ``src`` is the pull target, its ``dst`` the source endpoint) —
the convention ``pagerank_sorted`` established.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from muninn_tpu.ops.segments import (
    seg_min,
    seg_positions,
    seg_positions_chunked,
    seg_reduce_chunked,
)

INT_INF = np.int32(2**30)
_F_INF = np.float32(np.inf)

#: edge capacities above this use the chunked segment forms (bounded
#: per-iteration temporaries — the axon worker dies past ~3 GB peak;
#: 2**25 = the largest capacity the one-shot forms have survived at)
EDGE_CHUNK_ABOVE = 2**25
EDGE_CHUNK = 2**24


def edge_chunk_for(capacity: int) -> int:
    """Static ``edge_chunk`` for a padded edge capacity: 0 (one-shot
    kernels) below the measured safe ceiling, 16M slices above it."""
    return EDGE_CHUNK if capacity > EDGE_CHUNK_ABOVE else 0


# fixpoint sweeps per XLA execution in the chunked (100M-edge) regime:
# the TPU worker kills any single execution past ~60 s (measured on
# pagerank: 20 chunked iterations ~= 82 s at 10M/100M faults the
# worker, 5-iteration blocks at ~21 s run clean), so big-graph
# fixpoints run bounded blocks with state carried on device and one
# host bool fetch per block deciding continuation.
FIXPOINT_ITERS_PER_DISPATCH = 8


@partial(jax.jit, static_argnames=("e_pad", "edge_chunk", "n_passes"))
def _spos_for(
    offsets: jax.Array, e_pad: int, edge_chunk: int, n_passes: int
) -> jax.Array:
    """Segment positions for the blocked fixpoints, computed ONCE in
    the wrapper and passed into every block (the searchsorted pass is
    several iterations' worth of gathers at 100M edges)."""
    chunked = bool(edge_chunk) and edge_chunk < e_pad
    return (
        seg_positions_chunked(offsets, e_pad, edge_chunk, n_passes)
        if chunked else seg_positions(offsets, e_pad)
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_nodes", "max_depth", "n_passes", "edge_chunk", "max_iters"
    ),
)
def _bfs_block(
    roff: jax.Array,
    esrc: jax.Array,
    spos: jax.Array,        # from _spos_for(roff, ...)
    depth: jax.Array,       # [V] int32 carried between blocks
    parent: jax.Array,      # [V] int32 carried between blocks
    d0: jax.Array,          # scalar int32: first depth this block expands
    num_nodes: int,
    max_depth: int,
    n_passes: int,
    edge_chunk: int,
    max_iters: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Up to ``max_iters`` BFS sweeps; returns (depth, parent, d,
    cont) where cont means the fixpoint is not yet done."""
    e_pad = esrc.shape[0]
    chunked = bool(edge_chunk) and edge_chunk < e_pad
    es = None if chunked else jnp.minimum(esrc, num_nodes - 1)

    def cond(state):
        depth, parent, d, changed = state
        return changed & (d < max_depth) & (d < d0 + max_iters)

    def body(state):
        depth, parent, d, _ = state
        if chunked:
            def vals_fn(cstart):
                es_c = jnp.minimum(
                    jax.lax.dynamic_slice(esrc, (cstart,), (edge_chunk,)),
                    num_nodes - 1,
                )
                return jnp.where(depth[es_c] == d, es_c, INT_INF)

            best_pred = seg_reduce_chunked(
                vals_fn, spos, roff, INT_INF, n_passes, edge_chunk,
                jnp.minimum, jnp.int32,
            )
        else:
            active = depth[es] == d                            # [E_pad]
            cand = jnp.where(active, es, INT_INF)
            best_pred = seg_min(cand, spos, roff, INT_INF, n_passes)
        reach = (best_pred < INT_INF) & (depth >= INT_INF)
        depth = jnp.where(reach, d + 1, depth)
        parent = jnp.where(reach, best_pred.astype(jnp.int32), parent)
        return depth, parent, d + 1, jnp.any(reach)

    depth, parent, d, changed = jax.lax.while_loop(
        cond, body, (depth, parent, d0, jnp.bool_(True))
    )
    return depth, parent, d, changed & (d < max_depth)


def bfs_pull(
    roff: jax.Array,        # [V+1] pull-CSR offsets
    esrc: jax.Array,        # [E_pad] in-edge source endpoints (pads = V)
    start: jax.Array,       # scalar int32
    num_nodes: int,
    max_depth: int,
    n_passes: int = 24,     # >= log2(max in-degree); see segments.n_passes_for
    edge_chunk: int = 0,    # >0: chunked edge passes (100M-edge regime)
    iters_per_dispatch: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Single-source BFS. Returns (depth int32[V] — INT_INF if
    unreached, parent int32[V] — -1 for root/unreached).

    Parent choice is the minimum-index active predecessor, which is
    deterministic (the reference's parent is SQL-iteration-order
    dependent; determinism here is a feature, not a parity break).

    In the chunked regime the sweep loop is bounded to
    ``iters_per_dispatch`` sweeps per XLA execution (default
    :data:`FIXPOINT_ITERS_PER_DISPATCH`) so a high-diameter 100M-edge
    graph cannot exceed the worker's ~60 s single-execution limit; one
    host bool fetch per block decides continuation.
    """
    chunked = bool(edge_chunk) and edge_chunk < esrc.shape[0]
    block = iters_per_dispatch or (
        FIXPOINT_ITERS_PER_DISPATCH if chunked else max(max_depth, 1)
    )
    spos = _spos_for(roff, esrc.shape[0], edge_chunk, n_passes)
    depth = jnp.full((num_nodes,), INT_INF, jnp.int32).at[start].set(0)
    parent = jnp.full((num_nodes,), -1, jnp.int32)
    d = jnp.int32(0)
    while True:
        depth, parent, d, cont = _bfs_block(
            roff, esrc, spos, depth, parent, d, num_nodes, max_depth,
            n_passes, edge_chunk, block,
        )
        if not bool(cont):
            return depth, parent


@partial(jax.jit, static_argnames=("num_nodes", "max_iters", "n_passes"))
def seeded_bfs_depths_pull(
    roff: jax.Array,
    esrc: jax.Array,
    init: jax.Array,        # int32 [V]; INT_INF = not a seed
    num_nodes: int,
    max_iters: int = 0,
    n_passes: int = 24,
) -> jax.Array:
    """Multi-source BFS from *seeded* integer depths: returns
    ``d[u] = min_v (init[v] + hops(v, u))`` over all seeds v. One
    device fixpoint replaces a per-seed BFS launch loop — used by the
    selector's closure atoms where the reference walks each
    descendant's ancestor set separately
    (``src/graph_selector_eval.c:153-232``)."""
    if max_iters <= 0:
        max_iters = num_nodes
    e_pad = esrc.shape[0]
    spos = seg_positions(roff, e_pad)
    es = jnp.minimum(esrc, num_nodes - 1)

    def cond(state):
        d, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        d, it, _ = state
        ds = d[es]
        relax = jnp.where(ds < INT_INF, ds + 1, INT_INF)       # [E_pad]
        new = jnp.minimum(
            d, seg_min(relax, spos, roff, INT_INF, n_passes)
        )
        return new, it + 1, jnp.any(new < d)

    dist, _, _ = jax.lax.while_loop(
        cond, body, (init.astype(jnp.int32), jnp.int32(0), jnp.bool_(True))
    )
    return dist


@partial(jax.jit, static_argnames=("num_nodes", "max_iters", "n_passes"))
def multi_source_distances_pull(
    roff: jax.Array,
    esrc: jax.Array,
    w: jax.Array,           # [E_pad] f32
    sources: jax.Array,     # [S] int32
    num_nodes: int,
    max_iters: int = 0,
    n_passes: int = 24,
) -> jax.Array:
    """Batched SSSP distances [S, V] via synchronous Bellman-Ford
    (non-negative weights). Replaces the reference's per-source
    BFS/Dijkstra engines (``src/graph_centrality.c:261-379``)."""
    s_count = sources.shape[0]
    if max_iters <= 0:
        max_iters = num_nodes
    e_pad = esrc.shape[0]
    spos = seg_positions(roff, e_pad)
    es = jnp.minimum(esrc, num_nodes - 1)
    dist = jnp.full((s_count, num_nodes), jnp.inf, jnp.float32)
    dist = dist.at[jnp.arange(s_count), sources].set(0.0)

    def cond(state):
        dist, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        dist, it, _ = state
        relax = dist[:, es] + w[None, :]                       # [S, E_pad]
        new = jnp.minimum(dist, seg_min(relax, spos, roff, jnp.inf, n_passes))
        changed = jnp.any(new < dist)
        return new, it + 1, changed

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist, jnp.int32(0), jnp.bool_(True))
    )
    return dist


@partial(jax.jit, static_argnames=("num_nodes", "n_passes"))
def connected_components_pull(
    offsets: jax.Array,     # [V+1] 'both'-CSR offsets
    dst: jax.Array,         # [E_pad] neighbor per edge (pads = V)
    num_nodes: int,
    n_passes: int = 24,
) -> jax.Array:
    """Connected components by min-label propagation + pointer jumping
    (converges in ~O(log V) sweeps vs the reference's union-find with
    path halving, ``src/graph_tvf.c:1204-1360``). Pass the 'both'
    direction CSR (undirected: its own segments ARE each node's
    neighborhood)."""
    e_pad = dst.shape[0]
    spos = seg_positions(offsets, e_pad)
    ds = jnp.minimum(dst, num_nodes - 1)
    comp = jnp.arange(num_nodes, dtype=jnp.int32)

    def cond(state):
        comp, changed = state
        return changed

    def body(state):
        comp, _ = state
        nbr = jnp.where(dst < num_nodes, comp[ds], INT_INF)
        nbr_min = seg_min(nbr, spos, offsets, INT_INF, n_passes)
        new = jnp.minimum(comp, nbr_min.astype(jnp.int32))
        # pointer jumping: follow labels two hops
        new = jnp.minimum(new, new[new])
        new = jnp.minimum(new, new[new])
        return new, jnp.any(new < comp)

    comp, _ = jax.lax.while_loop(cond, body, (comp, jnp.bool_(True)))
    return comp


@partial(
    jax.jit,
    static_argnames=(
        "num_nodes", "n_passes_f", "n_passes_r", "edge_chunk", "max_iters"
    ),
)
def _cc_2csr_block(
    foff: jax.Array,        # [V+1] forward CSR offsets
    fdst: jax.Array,        # [E_pad] out-neighbors (pads = V)
    roff: jax.Array,        # [V+1] reverse CSR offsets
    rdst: jax.Array,        # [E_pad] in-neighbors (pads = V)
    fspos: jax.Array,       # from _spos_for(foff, ...)
    rspos: jax.Array,       # from _spos_for(roff, ...)
    comp: jax.Array,        # [V] int32 labels carried between blocks
    num_nodes: int,
    n_passes_f: int,
    n_passes_r: int,
    edge_chunk: int,
    max_iters: int,
) -> tuple[jax.Array, jax.Array]:
    """Up to ``max_iters`` min-label sweeps from ``comp``; returns
    (comp, changed) where changed means the fixpoint may not be done."""

    def nbr_min_fns():
        out = []
        for off, dst, spos, n_passes in (
            (foff, fdst, fspos, n_passes_f), (roff, rdst, rspos, n_passes_r)
        ):
            e_pad = dst.shape[0]
            chunked = bool(edge_chunk) and edge_chunk < e_pad
            if chunked:
                def fn(comp, off=off, dst=dst, spos=spos, n_passes=n_passes):
                    def vals_fn(cstart):
                        d_c = jax.lax.dynamic_slice(
                            dst, (cstart,), (edge_chunk,)
                        )
                        return jnp.where(
                            d_c < num_nodes,
                            comp[jnp.minimum(d_c, num_nodes - 1)],
                            INT_INF,
                        )
                    return seg_reduce_chunked(
                        vals_fn, spos, off, INT_INF, n_passes,
                        edge_chunk, jnp.minimum, jnp.int32,
                    )
            else:
                ds = jnp.minimum(dst, num_nodes - 1)
                def fn(comp, off=off, dst=dst, ds=ds, spos=spos,
                       n_passes=n_passes):
                    nbr = jnp.where(dst < num_nodes, comp[ds], INT_INF)
                    return seg_min(nbr, spos, off, INT_INF, n_passes)
            out.append(fn)
        return out

    fwd_min, rev_min = nbr_min_fns()

    def cond(state):
        comp, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        comp, it, _ = state
        new = jnp.minimum(comp, fwd_min(comp).astype(jnp.int32))
        new = jnp.minimum(new, rev_min(comp).astype(jnp.int32))
        # pointer jumping: follow labels two hops
        new = jnp.minimum(new, new[new])
        new = jnp.minimum(new, new[new])
        return new, it + 1, jnp.any(new < comp)

    comp, _, changed = jax.lax.while_loop(
        cond, body, (comp, jnp.int32(0), jnp.bool_(True))
    )
    return comp, changed


def connected_components_2csr(
    foff: jax.Array,        # [V+1] forward CSR offsets
    fdst: jax.Array,        # [E_pad] out-neighbors (pads = V)
    roff: jax.Array,        # [V+1] reverse CSR offsets
    rdst: jax.Array,        # [E_pad] in-neighbors (pads = V)
    num_nodes: int,
    n_passes_f: int = 24,
    n_passes_r: int = 24,
    edge_chunk: int = 0,
    iters_per_dispatch: int = 0,
) -> jax.Array:
    """:func:`connected_components_pull` over the fwd+rev CSR pair
    instead of the merged 'both' CSR: each node's undirected
    neighborhood minimum is ``min(out-segment min, in-segment min)``
    — identical fixpoint, HALF the resident edge memory (the merged
    CSR is 2x-capacity and its build allocates 3 more [2E] arrays;
    at 100M edges that alone crosses the worker's peak-HBM ceiling).
    ``edge_chunk`` > 0 additionally bounds per-iteration temporaries
    to O(chunk) via the chunked segment forms.

    In the chunked regime sweeps run in blocks of
    ``iters_per_dispatch`` (default
    :data:`FIXPOINT_ITERS_PER_DISPATCH`) per XLA execution — the
    worker's ~60 s single-execution limit kills an unbounded
    label-propagation loop at 100M edges — with one host bool fetch
    per block deciding continuation."""
    chunked = bool(edge_chunk) and edge_chunk < fdst.shape[0]
    block = iters_per_dispatch or (
        FIXPOINT_ITERS_PER_DISPATCH if chunked else (1 << 30)
    )
    fspos = _spos_for(foff, fdst.shape[0], edge_chunk, n_passes_f)
    rspos = _spos_for(roff, rdst.shape[0], edge_chunk, n_passes_r)
    comp = jnp.arange(num_nodes, dtype=jnp.int32)
    while True:
        comp, changed = _cc_2csr_block(
            foff, fdst, roff, rdst, fspos, rspos, comp, num_nodes,
            n_passes_f, n_passes_r, edge_chunk, block,
        )
        if not bool(changed):
            return comp


@partial(jax.jit, static_argnames=("num_nodes", "max_iters", "n_passes"))
def sssp_with_parents_pull(
    roff: jax.Array,
    esrc: jax.Array,
    w: jax.Array,
    start: jax.Array,
    num_nodes: int,
    max_iters: int = 0,
    n_passes: int = 24,
) -> tuple[jax.Array, jax.Array]:
    """Single-source shortest path with parent pointers (weighted,
    non-negative). Bellman-Ford; parents chosen as the min-index
    predecessor achieving the optimal distance."""
    if max_iters <= 0:
        max_iters = num_nodes
    e_pad = esrc.shape[0]
    spos = seg_positions(roff, e_pad)
    es = jnp.minimum(esrc, num_nodes - 1)
    dist = jnp.full((num_nodes,), jnp.inf, jnp.float32).at[start].set(0.0)

    def cond(state):
        dist, it, changed = state
        return changed & (it < max_iters)

    def body(state):
        dist, it, _ = state
        relax = dist[es] + w
        new = jnp.minimum(dist, seg_min(relax, spos, roff, jnp.inf, n_passes))
        return new, it + 1, jnp.any(new < dist)

    dist, _, _ = jax.lax.while_loop(
        cond, body, (dist, jnp.int32(0), jnp.bool_(True))
    )
    # tight edges: dist[esrc] + w == dist[v] (epsilon like the
    # reference's tie detection, src/graph_centrality.c:212-214);
    # v = each edge's pull target = its segment's node id, recovered by
    # searchsorted on the offsets (no per-edge target array needed)
    pos = jnp.arange(e_pad, dtype=jnp.int32)
    node_of = (
        jnp.searchsorted(roff, pos, side="right").astype(jnp.int32) - 1
    )
    dv = dist[jnp.minimum(node_of, num_nodes - 1)]
    tight = jnp.abs(dist[es] + w - dv) <= 1e-9 * jnp.maximum(1.0, jnp.abs(dv))
    pred = jnp.where(tight & jnp.isfinite(dv), es, INT_INF)
    parent = seg_min(pred, spos, roff, INT_INF, n_passes)
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
