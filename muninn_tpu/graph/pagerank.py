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
