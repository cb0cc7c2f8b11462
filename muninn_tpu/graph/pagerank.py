"""PageRank as edge-parallel SpMV power iteration.

Reference: ``src/graph_tvf.c:1631-1717,1820-1828`` — power iteration
with dangling-node redistribution, damping 0.85, 20 iterations default.
Here each iteration is one segment-sum over the edge list (pull form),
which XLA lowers to a fused scatter-add — the SpMV of SURVEY.md §7.5.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_nodes", "iterations", "weighted"))
def pagerank_device(
    src: jax.Array,         # [E] int32
    dst: jax.Array,         # [E] int32
    w: jax.Array,           # [E] f32
    out_degree: jax.Array,  # [V] f32 (weighted out-degree if weighted)
    num_nodes: int,
    damping: float = 0.85,
    iterations: int = 20,
    weighted: bool = False,
) -> jax.Array:
    """Returns rank f32[V], summing to 1."""
    n = num_nodes
    rank = jnp.full((n,), 1.0 / n, jnp.float32)
    dangling = out_degree <= 0.0
    safe_deg = jnp.maximum(out_degree, 1e-30)
    # per-edge share of the source's rank
    share = (w / safe_deg[src]) if weighted else (1.0 / safe_deg[src])

    def body(_, rank):
        contrib = rank[src] * share                           # [E]
        pulled = jax.ops.segment_sum(contrib, dst, num_segments=n)
        dangling_mass = jnp.sum(jnp.where(dangling, rank, 0.0))
        return (1.0 - damping) / n + damping * (pulled + dangling_mass / n)

    return jax.lax.fori_loop(0, iterations, body, rank)


# iterations per XLA execution in the chunked (100M-edge) regime: the
# TPU worker kills any single execution past ~60 s (measured at
# 10M/100M: 20 iterations ~= 82 s faults the worker; 5 = 20.7 s is
# fine, ~4.1 s/iteration), so power iterations run in blocks with the
# rank vector carried on device between dispatches.
PR_ITERS_PER_DISPATCH = 5


@partial(jax.jit, static_argnames=("num_nodes", "weighted", "edge_chunk"))
def _share_sorted(
    tgt_src: jax.Array,     # [E_pad] int32 (pads >= num_nodes)
    w: jax.Array,           # [E_pad] f32, or dummy when not weighted
    out_degree: jax.Array,  # [V] f32
    num_nodes: int,
    weighted: bool,
    edge_chunk: int,
) -> jax.Array:
    """Loop-invariant per-edge share ``w_e / out_degree[src_e]``
    ([E_pad] f32, pads 0), built once and reused across iteration
    blocks."""
    n = num_nodes
    e_pad = tgt_src.shape[0]
    safe_deg = jnp.maximum(out_degree, 1e-30)
    if not (bool(edge_chunk) and edge_chunk < e_pad):
        valid = tgt_src < n                                    # pads = V
        s_idx = jnp.minimum(tgt_src, n - 1)
        return jnp.where(
            valid, (w if weighted else 1.0) / safe_deg[s_idx], 0.0
        )

    def share_body(k, share):
        cstart = k * edge_chunk
        ts = jax.lax.dynamic_slice(tgt_src, (cstart,), (edge_chunk,))
        valid_c = ts < n
        s_c = jnp.minimum(ts, n - 1)
        w_c = (
            jax.lax.dynamic_slice(w, (cstart,), (edge_chunk,))
            if weighted else 1.0
        )
        sc = jnp.where(valid_c, w_c / safe_deg[s_c], 0.0)
        return jax.lax.dynamic_update_slice(share, sc, (cstart,))

    return jax.lax.fori_loop(
        0, e_pad // edge_chunk, share_body,
        jnp.zeros((e_pad,), jnp.float32),
    )


@partial(
    jax.jit,
    static_argnames=("num_nodes", "iterations", "ch", "edge_chunk"),
)
def _pr_iters(
    roff: jax.Array,        # [V+1] int32 offsets of the TARGET-sorted CSR
    tgt_src: jax.Array,     # [E_pad] int32 source node per target-sorted edge
    share: jax.Array,       # [E_pad] f32 from _share_sorted
    out_degree: jax.Array,  # [V] f32
    rank: jax.Array,        # [V] f32 carried between blocks
    num_nodes: int,
    damping: float,
    iterations: int,
    ch: int,
    edge_chunk: int,
) -> jax.Array:
    """``iterations`` power iterations from ``rank`` (one block)."""
    n = num_nodes
    e_pad = tgt_src.shape[0]
    dangling = out_degree <= 0.0

    if bool(edge_chunk) and edge_chunk < e_pad:
        from muninn_tpu.ops.segments import seg_sum_chunked

        def body(_, rank):
            def vals_fn(cstart):
                s_c = jnp.minimum(
                    jax.lax.dynamic_slice(tgt_src, (cstart,), (edge_chunk,)),
                    n - 1,
                )
                return rank[s_c] * jax.lax.dynamic_slice(
                    share, (cstart,), (edge_chunk,)
                )

            pulled = seg_sum_chunked(vals_fn, roff, e_pad, edge_chunk, ch)
            dangling_mass = jnp.sum(jnp.where(dangling, rank, 0.0))
            return (1.0 - damping) / n + damping * (
                pulled + dangling_mass / n
            )

        return jax.lax.fori_loop(0, iterations, body, rank)

    ch = min(ch, e_pad)  # both pow2 (capacity buckets), so ch | e_pad
    m = e_pad // ch
    s_idx = jnp.minimum(tgt_src, n - 1)

    pos_hi = roff[1:]
    pos_lo = roff[:-1]

    def prefix_at(pre, localf, pos):
        ci = pos // ch
        off = pos % ch
        loc = jnp.where(off > 0, localf[ci * ch + jnp.maximum(off - 1, 0)], 0.0)
        return pre[ci] + loc

    def body(_, rank):
        contrib = rank[s_idx] * share                          # [E_pad]
        c2 = contrib.reshape(m, ch)
        local = jnp.cumsum(c2, axis=1)                         # [m, ch]
        pre = jnp.concatenate(
            [jnp.zeros(1, jnp.float32), jnp.cumsum(local[:, -1])]
        )                                                      # [m+1]
        localf = local.reshape(-1)
        pulled = prefix_at(pre, localf, pos_hi) - prefix_at(pre, localf, pos_lo)
        dangling_mass = jnp.sum(jnp.where(dangling, rank, 0.0))
        return (1.0 - damping) / n + damping * (pulled + dangling_mass / n)

    return jax.lax.fori_loop(0, iterations, body, rank)


def pagerank_sorted(
    roff: jax.Array,        # [V+1] int32 offsets of the TARGET-sorted CSR
    tgt_src: jax.Array,     # [E_pad] int32 source node per target-sorted edge
    w: jax.Array,           # [E_pad] f32 (pads 0)
    out_degree: jax.Array,  # [V] f32
    num_nodes: int,
    damping: float = 0.85,
    iterations: int = 20,
    weighted: bool = False,
    ch: int = 1024,
    edge_chunk: int = 0,
    iters_per_dispatch: int = 0,
) -> jax.Array:
    """PageRank pull over a target-sorted CSR with NO scatter.

    XLA's scatter-add caps the edge-parallel SpMV at ~60M edge/s on
    v5e; with edges sorted by pull target, per-node sums are window
    sums of a prefix — ``pulled[v] = S[roff[v+1]] - S[roff[v]]`` — and
    the iteration becomes gather + two-level cumsum + gather, all
    bandwidth-bound. The chunked two-level prefix keeps f32 error at
    ~eps*log(chunks) absolute (the single-level cumsum over 10M values
    would lose ~1e-6 of a rank vector summing to 1.0).

    ``edge_chunk`` > 0 processes edges in static [chunk] slices
    (``ops.segments.seg_sum_chunked``): only the loop-invariant
    ``share`` vector is kept at [E_pad]; per-iteration temporaries
    stay O(chunk). Unweighted callers may pass a dummy ``w`` (it is
    never read) — at the 100M-edge scale a materialized ones vector
    is 537 MB of the worker's ~3 GB peak-HBM budget.

    In the chunked regime iterations additionally run in blocks of
    ``iters_per_dispatch`` (default :data:`PR_ITERS_PER_DISPATCH`) per
    XLA execution: the TPU worker kills single executions past ~60 s,
    and 20 chunked iterations at 100M edges is ~82 s in one program
    (measured fault; 5-iteration blocks at 20.7 s run clean). Blocks
    queue on the device stream with no host sync between them, so the
    cost is one dispatch per block, not a round-trip.
    """
    e_pad = tgt_src.shape[0]
    chunked = bool(edge_chunk) and edge_chunk < e_pad
    share = _share_sorted(
        tgt_src, w, out_degree, num_nodes, weighted, edge_chunk
    )
    rank = jnp.full((num_nodes,), 1.0 / num_nodes, jnp.float32)
    block = iters_per_dispatch or (
        PR_ITERS_PER_DISPATCH if chunked else iterations
    )
    block = max(1, min(block, iterations))
    done = 0
    while done < iterations:
        step = min(block, iterations - done)
        rank = _pr_iters(
            roff, tgt_src, share, out_degree, rank, num_nodes,
            damping, step, ch, edge_chunk,
        )
        done += step
    return rank
