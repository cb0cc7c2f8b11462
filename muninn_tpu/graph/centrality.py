"""Centrality: degree, closeness, Brandes node/edge betweenness.

TPU re-design of ``src/graph_centrality.c``: the reference runs one
sequential SSSP per source with predecessor lists and a backward stack.
Here sources are *batched* — distances via synchronous Bellman-Ford
[S, V], path counts (sigma) and dependencies (delta) as Jacobi fixpoint
iterations over the tight-edge DAG, all edge-parallel segment ops:

    sigma[v] = sum_{tight (u,v)} sigma[u],  sigma[source] = 1
    delta[u] = sum_{tight (u,v)} sigma[u]/sigma[v] * (1 + delta[v])

Each Jacobi sweep advances one DAG level, so both converge in
(shortest-path-depth) iterations — the batched analogue of the
reference's ordered stack replay (``src/graph_centrality.c:393-512``).

Approximation: sqrt(N) source sampling above ``auto_approx_threshold``
(default 50000), scaled by N/S — the reference's switch
(``src/graph_centrality.c:417-434``).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from muninn_tpu import native
from muninn_tpu.graph import routing
from muninn_tpu.graph.routing import use_host
from muninn_tpu.graph.traversal import multi_source_distances_pull
from muninn_tpu.ops.segments import n_passes_for, seg_sum

DEFAULT_APPROX_THRESHOLD = 50000


def _node_of(offsets: jax.Array, e_pad: int, num_nodes: int) -> jax.Array:
    """Node id per CSR position (the segment each edge belongs to)."""
    pos = jnp.arange(e_pad, dtype=jnp.int32)
    return jnp.minimum(
        jnp.searchsorted(offsets, pos, side="right").astype(jnp.int32) - 1,
        num_nodes - 1,
    )


@partial(jax.jit, static_argnames=("num_nodes", "max_iters", "want_edge",
                                   "n_passes"))
def _brandes_batch(
    foff: jax.Array,   # [V+1] forward CSR offsets
    fdst: jax.Array,   # [E_pad] forward targets (pads = V)
    fw: jax.Array,     # [E_pad] weights (pads = 0)
    roff: jax.Array,   # [V+1] reverse (pull) CSR offsets
    resrc: jax.Array,  # [E_pad] in-edge source endpoints (pads = V)
    rw: jax.Array,     # [E_pad]
    sources: jax.Array,       # [S]
    num_nodes: int,
    max_iters: int = 0,
    want_edge: bool = False,
    n_passes: int = 24,
) -> tuple[jax.Array, jax.Array]:
    """One batch of Brandes sources over SORTED edge arrays — every
    per-node reduction is a sorted-segment sum (``ops/segments``), no
    scatters (XLA scatter capped the round-2 version at ~36-60M
    edge/s). Returns (node_cb [V], edge_cb [E_pad] aligned to the
    forward-sorted order; zeros if not wanted), summed over the batch.
    """
    s_count = sources.shape[0]
    e_pad = fdst.shape[0]
    if max_iters <= 0:
        # shortest-path hop depth bounds every fixpoint here; cap it so
        # a non-converging loop (fp noise at extreme scale) cannot run
        # for num_nodes iterations and trip device watchdogs
        max_iters = min(num_nodes, 1024)

    dist = multi_source_distances_pull(
        roff, resrc, rw, sources, num_nodes, max_iters, n_passes
    )

    fsrc = _node_of(foff, e_pad, num_nodes)       # fwd edge source node
    rtgt = _node_of(roff, e_pad, num_nodes)       # rev edge target node
    fd = jnp.minimum(fdst, num_nodes - 1)
    rs = jnp.minimum(resrc, num_nodes - 1)

    # tight-edge DAG: strictly increasing distance (positive weights)
    def tight(du, wv, dv):
        return (
            jnp.isfinite(du)
            & (jnp.abs(du + wv - dv) <= 1e-9 * jnp.maximum(1.0, jnp.abs(dv)))
            & (wv > 0)
        )

    tight_f = tight(dist[:, fsrc], fw[None, :], dist[:, fd])    # [S, E]
    tight_r = tight(dist[:, rs], rw[None, :], dist[:, rtgt])    # [S, E]

    # sigma fixpoint: per-node sums over IN-edges = reverse segments
    base = jnp.zeros((s_count, num_nodes), jnp.float32).at[
        jnp.arange(s_count), sources
    ].set(1.0)

    def sig_cond(state):
        sigma, it, changed = state
        return changed & (it < max_iters)

    def sig_body(state):
        sigma, it, _ = state
        contrib = jnp.where(tight_r, sigma[:, rs], 0.0)         # [S, E]
        new = base + seg_sum(contrib, roff)
        return new, it + 1, jnp.any(jnp.abs(new - sigma) > 1e-6)

    sigma, _, _ = jax.lax.while_loop(
        sig_cond, sig_body, (base, jnp.int32(0), jnp.bool_(True))
    )

    # delta fixpoint: per-node sums over OUT-edges = forward segments
    safe_sigma = jnp.maximum(sigma, 1e-30)
    ratio = jnp.where(tight_f, sigma[:, fsrc] / safe_sigma[:, fd], 0.0)

    def del_cond(state):
        delta, it, changed = state
        return changed & (it < max_iters)

    def del_body(state):
        delta, it, _ = state
        contrib = ratio * (1.0 + delta[:, fd])                  # [S, E]
        new = seg_sum(contrib, foff)
        return new, it + 1, jnp.any(jnp.abs(new - delta) > 1e-6)

    delta0 = jnp.zeros((s_count, num_nodes), jnp.float32)
    delta, _, _ = jax.lax.while_loop(
        del_cond, del_body, (delta0, jnp.int32(0), jnp.bool_(True))
    )

    # CB excludes the source itself (delta[s, s] contribution)
    mask = jnp.ones((s_count, num_nodes), bool).at[
        jnp.arange(s_count), sources
    ].set(False)
    node_cb = jnp.sum(jnp.where(mask, delta, 0.0), axis=0)

    if want_edge:
        edge_contrib = ratio * (1.0 + delta[:, fd])             # [S, E]
        edge_cb = jnp.sum(edge_contrib, axis=0)
    else:
        edge_cb = jnp.zeros((e_pad,), jnp.float32)
    return node_cb, edge_cb


def dedupe_parallel_edges(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, num_nodes: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collapse parallel (src,dst) duplicates keeping the min weight.
    Path *counting* (sigma) must see a simple graph — parallel edges
    would multiply shortest-path counts."""
    if len(src) == 0:  # edgeless graph: run[-1] below would IndexError
        return (np.zeros(0, np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.float32))
    key = src.astype(np.int64) * num_nodes + dst
    order = np.argsort(key, kind="stable")
    ks, ws = key[order], w[order]
    head = np.concatenate([[True], ks[1:] != ks[:-1]])
    run = np.cumsum(head) - 1
    wmin = np.full(run[-1] + 1, np.inf, np.float32)
    np.minimum.at(wmin, run, ws)
    uk = ks[head]
    return (
        (uk // num_nodes).astype(np.int32),
        (uk % num_nodes).astype(np.int32),
        wmin.astype(np.float32),
    )


def betweenness(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    num_nodes: int,
    *,
    undirected: bool = False,
    normalized: bool = False,
    want_edge: bool = False,
    sample_sources: int | None = None,
    auto_approx_threshold: int = DEFAULT_APPROX_THRESHOLD,
    batch: int = 64,
    seed: int = 0,
    backend: str = "auto",
    weighted_alg: bool = True,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Brandes betweenness over all (or sampled) sources.

    ``undirected``: pass the 'both'-direction COO and set True — path
    counts are halved like the reference (:478-487). Normalization is
    (N-1)(N-2) [/2 undirected] (:490-499).

    ``backend``/``weighted_alg``: small source x edge workloads route
    to the native sequential Brandes (``muninn_graph.cpp``) — see
    ``graph.routing``; ``weighted_alg=False`` lets the host use plain
    BFS instead of Dijkstra when all weights are 1.

    Precision: path counts (sigma) are f32 on BOTH the device engine
    and the unweighted host kernel — exact up to 2^24 paths, rounded
    beyond, inf past ~3.4e38 (those sources' contributions drop). The
    envelope is identical across backends so routing never changes
    results; the weighted host path keeps sigma in double.
    """
    n = num_nodes
    if n < 2:
        return np.zeros(n, np.float32), (np.zeros(len(src), np.float32) if want_edge else None)
    # NOTE: callers must pass a simple graph (use dedupe_parallel_edges)
    # bound the source batch so the [S, E] sigma/delta temporaries stay
    # within HBM (several E-sized f32 arrays per source)
    per_source_bytes = max(len(src), n) * 4 * 12
    batch = max(1, min(batch, (1 << 30) // per_source_bytes))
    all_sources = np.arange(n, dtype=np.int32)
    scale = 1.0
    if sample_sources is None and n > auto_approx_threshold:
        sample_sources = int(np.ceil(np.sqrt(n)))
    if sample_sources is not None and sample_sources < n:
        rng = np.random.default_rng(seed)
        all_sources = rng.choice(n, size=sample_sources, replace=False).astype(np.int32)
        scale = n / float(sample_sources)

    brandes_cost = (
        routing.COST_BRANDES_SRC_EDGE if weighted_alg
        else routing.COST_BRANDES_SRC_EDGE_UNWEIGHTED
    )
    if use_host(backend, brandes_cost * len(all_sources) * max(len(src), 1)):
        node_cb, edge_raw = native.graph_brandes(
            src, dst, w, n, all_sources,
            weighted=weighted_alg, want_edge=want_edge,
        )
        node_cb = node_cb.copy()
        edge_cb = edge_raw.copy() if want_edge else None
        return _betweenness_post(
            node_cb, edge_cb, n, len(src), scale, undirected, normalized,
            want_edge,
        )

    e = len(src)
    foff, fdst, fw, roff, resrc, rw, max_deg = _sorted_pair(src, dst, w, n)
    npass = n_passes_for(max_deg)
    node_cb = np.zeros(n, np.float64)
    edge_cb = np.zeros(e, np.float64) if want_edge else None
    for i in range(0, len(all_sources), batch):
        chunk = all_sources[i : i + batch]
        pad = 0
        if len(chunk) < batch and i > 0:
            # pad with repeats of the first source, subtract later
            pad = batch - len(chunk)
            chunk = np.concatenate([chunk, np.full(pad, chunk[0], np.int32)])
        ncb, ecb = _brandes_batch(
            foff, fdst, fw, roff, resrc, rw,
            jnp.asarray(chunk), n, want_edge=want_edge, n_passes=npass,
        )
        ncb = np.asarray(ncb, np.float64)
        ecb = np.asarray(ecb, np.float64)[:e] if want_edge else None
        if pad:
            ncb1, ecb1 = _brandes_batch(
                foff, fdst, fw, roff, resrc, rw,
                jnp.asarray(chunk[:1]), n, want_edge=want_edge,
                n_passes=npass,
            )
            ncb -= pad * np.asarray(ncb1, np.float64)
            if want_edge:
                ecb -= pad * np.asarray(ecb1, np.float64)[:e]
        node_cb += ncb
        if want_edge:
            edge_cb += ecb

    return _betweenness_post(
        node_cb, edge_cb, n, len(src), scale, undirected, normalized,
        want_edge,
    )


def _sorted_pair(src, dst, w, n):
    """Forward + reverse (pull) CSR device arrays from a COO, padded to
    a pow2 capacity (index pads = n, weight pads = 0), plus the max
    segment length (static shift-doubling pass count). The forward
    order equals the input order when the input is already src-sorted
    (stable counting sort), which keeps edge_cb aligned."""
    e = len(src)
    e_pad = max(64, 1 << int(np.ceil(np.log2(max(e, 1)))))
    max_deg = 1

    def build(a, b):
        nonlocal max_deg
        off, _, bb, ww = native.csr_build(a, b, w, n)
        max_deg = max(max_deg, int(np.max(np.diff(off))) if n else 1)
        bb = np.pad(bb, (0, e_pad - e), constant_values=n)
        ww = np.pad(ww, (0, e_pad - e))
        return jnp.asarray(off), jnp.asarray(bb), jnp.asarray(ww)

    foff, fdst, fw = build(src, dst)
    roff, resrc, rw = build(dst, src)
    return foff, fdst, fw, roff, resrc, rw, max_deg


def _betweenness_post(
    node_cb, edge_cb, n, e, scale, undirected, normalized, want_edge,
) -> tuple[np.ndarray, np.ndarray | None]:
    """Shared sampling-scale / undirected-halving / normalization tail
    applied to raw Brandes sums from either backend."""
    node_cb *= scale
    if want_edge:
        edge_cb *= scale
    if undirected:
        node_cb /= 2.0
        if want_edge:
            edge_cb /= 2.0
    if normalized:
        denom = (n - 1) * (n - 2)
        if undirected:
            denom /= 2.0
        if denom > 0:
            node_cb /= denom
        edenom = n * (n - 1)
        if undirected:
            edenom /= 2.0
        if want_edge and edenom > 0:
            edge_cb /= edenom
    return node_cb.astype(np.float32), (
        edge_cb.astype(np.float32) if want_edge else None
    )


def closeness(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    num_nodes: int,
    *,
    normalized: bool = True,
    batch: int = 256,
    backend: str = "auto",
    weighted_alg: bool = True,
) -> np.ndarray:
    """Closeness centrality: per-source SSSP sums
    (``src/graph_centrality.c:1404-1434``). ``normalized`` applies the
    Wasserman-Faust reachable/(N-1) correction. Pass the COO oriented so
    that edges point *toward* the measured node (reverse direction) for
    the standard definition on directed graphs."""
    n = num_nodes
    per_src_edge = (
        routing.COST_CLOSENESS_SRC_EDGE if weighted_alg
        else routing.COST_CLOSENESS_SRC_EDGE_UNWEIGHTED
    )
    if use_host(backend, per_src_edge * n * max(len(src), 1)):
        return native.graph_closeness(
            src, dst, w, n, weighted=weighted_alg, normalized=normalized
        )
    # bound the source batch exactly like betweenness: the Bellman-Ford
    # relax step materializes [S, E] f32 temporaries, so an unbounded
    # batch at 10M edges (~10 GB/array) crashes the TPU worker
    per_source_bytes = max(len(src), n) * 4 * 12
    batch = max(1, min(batch, (1 << 30) // per_source_bytes))
    # pull CSR: distances relax src -> dst, so pull over dst-sorted
    e = len(src)
    e_pad = max(64, 1 << int(np.ceil(np.log2(max(e, 1)))))
    roff_, _, resrc_, rw_ = native.csr_build(dst, src, w, n)
    npass = n_passes_for(int(np.max(np.diff(roff_))) if n else 1)
    roff = jnp.asarray(roff_)
    resrc = jnp.asarray(np.pad(resrc_, (0, e_pad - e), constant_values=n))
    rw = jnp.asarray(np.pad(rw_, (0, e_pad - e)))
    out = np.zeros(n, np.float32)
    for i in range(0, n, batch):
        real = min(i + batch, n) - i
        # pad the tail chunk to the full batch with repeats of its
        # first source (per-source outputs are independent; the
        # duplicates' rows are sliced off) — a raw remainder is a novel
        # [S] shape = one 30-200 s tunnel compile per (graph, batch)
        chunk = np.arange(i, i + batch, dtype=np.int32)
        chunk[real:] = chunk[0]
        dist = np.array(
            multi_source_distances_pull(
                roff, resrc, rw, jnp.asarray(chunk), n, n_passes=npass
            )
        )[:real]  # writable host copy; drop pad rows
        chunk = chunk[:real]
        dist[np.arange(real), chunk] = np.inf  # exclude self
        finite = np.isfinite(dist)
        r = finite.sum(axis=1)                       # reachable (excl self)
        sd = np.where(finite, dist, 0.0).sum(axis=1)
        c = np.where(sd > 0, r / np.maximum(sd, 1e-30), 0.0)
        if normalized and n > 1:
            c = c * (r / (n - 1))
        out[chunk] = c
    return out


def degree_centrality(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    num_nodes: int,
    *,
    direction: str = "both",
    weighted: bool = False,
    normalized: bool = False,
) -> np.ndarray:
    """Degree (in/out/total), optionally weighted and /(N-1)-normalized
    (``src/graph_centrality.c:667-680``). ``direction``: 'forward' =
    out-degree, 'reverse' = in-degree, 'both' = total."""
    vals = w if weighted else np.ones(len(src), np.float32)
    out = np.zeros(num_nodes, np.float64)
    if direction in ("forward", "both"):
        np.add.at(out, src, vals)
    if direction in ("reverse", "both"):
        np.add.at(out, dst, vals)
    if normalized and num_nodes > 1:
        out /= num_nodes - 1
    return out.astype(np.float32)
