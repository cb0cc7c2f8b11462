"""Scatter-free segment reductions over sorted edge arrays.

XLA's scatter-add/min caps edge-parallel graph fixpoints at ~36-60M
edge/s on v5e (the round-2 ROADMAP's measured wall). Both reduction
families have scatter-free forms once edges are sorted by the reduce
key (which the CSR already guarantees):

- **sum**: per-node sums are window sums of a prefix —
  ``seg[v] = S[off[v+1]] - S[off[v]]`` — computed as a chunked
  two-level cumsum (the trick that made ``pagerank_sorted`` 1.44x the
  scatter SpMV; factored here for every consumer).
- **min/max**: a *segmented* cumulative reduce via
  ``jax.lax.associative_scan`` with a boundary-reset flag — log-depth,
  fully vectorized, no scatter. The per-segment result is the running
  value at each segment's last element.

Consumers pass the CSR's own ``offsets``; the segment-start flags are
derived once per (offsets, E) pair and reused across fixpoint
iterations (they are loop constants under ``jit``).

Reference role: the per-edge neighbor loops of ``src/graph_tvf.c`` /
``graph_centrality.c`` / ``graph_community.c``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def segment_starts(offsets: jax.Array, e_pad: int) -> jax.Array:
    """Bool [e_pad]: True at each non-empty segment's first position.
    One tiny [V]-sized scatter, computed once per topology (hoist out
    of fixpoint loops)."""
    starts = jnp.zeros((e_pad,), bool)
    return starts.at[offsets[:-1]].set(True, mode="drop")


@partial(jax.jit, static_argnames=("ch",))
def seg_sum(vals: jax.Array, offsets: jax.Array, ch: int = 1024) -> jax.Array:
    """Per-segment sums of ``vals[..., e_pad]`` sorted by segment
    (pads must be 0). Returns ``[..., V]``. Two-level chunked prefix
    keeps f32 error at ~eps*log(chunks)."""
    e_pad = vals.shape[-1]
    ch = min(ch, e_pad)
    m = e_pad // ch
    lead = vals.shape[:-1]
    v2 = vals.reshape(*lead, m, ch)
    local = jnp.cumsum(v2, axis=-1)
    pre = jnp.concatenate(
        [jnp.zeros((*lead, 1), vals.dtype), jnp.cumsum(local[..., -1], axis=-1)],
        axis=-1,
    )                                                    # [..., m+1]
    localf = local.reshape(*lead, e_pad)

    def prefix_at(pos):
        ci = pos // ch
        off = pos % ch
        loc = jnp.where(
            off > 0,
            jnp.take(localf, ci * ch + jnp.maximum(off - 1, 0), axis=-1),
            0.0 if vals.dtype.kind == "f" else 0,
        )
        return jnp.take(pre, ci, axis=-1) + loc

    return prefix_at(offsets[1:]) - prefix_at(offsets[:-1])


def _seg_scan_reduce(vals, starts, offsets, combine, identity):
    """Shared body: segmented cumulative `combine` via associative_scan
    with boundary reset, then gather each segment's last element."""
    e_pad = vals.shape[-1]
    flags = jnp.broadcast_to(starts, vals.shape)

    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, combine(av, bv)), af | bf

    scanned, _ = jax.lax.associative_scan(op, (vals, flags), axis=-1)
    last = jnp.clip(offsets[1:] - 1, 0, e_pad - 1)
    out = jnp.take(scanned, last, axis=-1)
    nonempty = offsets[1:] > offsets[:-1]
    return jnp.where(nonempty, out, identity)


@jax.jit
def seg_min(vals: jax.Array, starts: jax.Array, offsets: jax.Array,
            identity) -> jax.Array:
    """Per-segment min of ``vals[..., e_pad]``; empty segments get
    ``identity``. ``starts`` from :func:`segment_starts`. Pads beyond
    the last segment never land in any [off, off+1) window, so their
    values are irrelevant."""
    return _seg_scan_reduce(vals, starts, offsets, jnp.minimum, identity)


@jax.jit
def seg_max(vals: jax.Array, starts: jax.Array, offsets: jax.Array,
            identity) -> jax.Array:
    return _seg_scan_reduce(vals, starts, offsets, jnp.maximum, identity)
