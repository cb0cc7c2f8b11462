"""Scatter-free segment reductions over sorted edge arrays.

XLA's scatter-add/min caps edge-parallel graph fixpoints at ~36-60M
edge/s on v5e (the round-2 ROADMAP's measured wall). Both reduction
families have scatter-free forms once edges are sorted by the reduce
key (which the CSR already guarantees):

- **sum**: per-node sums are window sums of a prefix —
  ``seg[v] = S[off[v+1]] - S[off[v]]`` — computed as a chunked
  two-level cumsum (the trick that made ``pagerank_sorted`` 1.44x the
  scatter SpMV; factored here for every consumer).
- **min/max**: a segmented scan by SHIFT DOUBLING —
  ``x[e] = combine(x[e], x[e - 2^j])`` whenever ``e - 2^j`` lies in the
  same segment, for ``j < ceil(log2(max_segment_len))`` passes. Each
  pass is a slice + where + combine (plain fused VPU work, no scatter,
  no generic scan lowering — a 16M-element ``lax.associative_scan``
  inside a ``while_loop`` compiled for tens of minutes on this
  toolchain). The pass count is STATIC, derived from the topology's
  max degree (~6 passes for mean-degree-10 graphs vs 24 levels for a
  length-generic scan).

Consumers pass the CSR's own ``offsets``; per-position segment indices
(``seg_positions``) are loop constants under ``jit`` — hoist them out
of fixpoint iterations.

Reference role: the per-edge neighbor loops of ``src/graph_tvf.c`` /
``graph_centrality.c`` / ``graph_community.c``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def n_passes_for(max_segment_len: int) -> int:
    """Static shift-doubling pass count covering segments up to
    ``max_segment_len``."""
    import math

    return max(1, math.ceil(math.log2(max(int(max_segment_len), 2))))


def seg_positions(offsets: jax.Array, e_pad: int) -> jax.Array:
    """int32 [e_pad]: each position's offset within its segment
    (pads get positions continuing past the last segment — harmless,
    since no [off, off+1) window covers them). One searchsorted + one
    gather, computed once per topology."""
    pos = jnp.arange(e_pad, dtype=jnp.int32)
    node = jnp.searchsorted(offsets, pos, side="right").astype(jnp.int32) - 1
    node = jnp.clip(node, 0, offsets.shape[0] - 2)
    return pos - offsets[node]


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


def _seg_shift_reduce(vals, seg_pos, offsets, combine, identity, n_passes):
    e_pad = vals.shape[-1]
    x = vals
    fill_shape = vals.shape[:-1]
    for j in range(n_passes):
        sh = 1 << j
        if sh >= e_pad:
            break
        prev = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.asarray(identity, vals.dtype),
                    (*fill_shape, sh),
                ),
                x[..., :-sh],
            ],
            axis=-1,
        )
        ok = seg_pos >= sh  # predecessor 2^j back lies in the same segment
        x = jnp.where(ok, combine(x, prev), x)
    # each segment's running value at its LAST element is the reduction
    last = jnp.clip(offsets[1:] - 1, 0, e_pad - 1)
    out = jnp.take(x, last, axis=-1)
    nonempty = offsets[1:] > offsets[:-1]
    return jnp.where(nonempty, out, identity)


@partial(jax.jit, static_argnames=("n_passes",))
def seg_min(vals: jax.Array, seg_pos: jax.Array, offsets: jax.Array,
            identity, n_passes: int = 24) -> jax.Array:
    """Per-segment min of ``vals[..., e_pad]``; empty segments get
    ``identity``. ``seg_pos`` from :func:`seg_positions`;
    ``n_passes`` >= log2(max segment length) (see :func:`n_passes_for`)."""
    return _seg_shift_reduce(
        vals, seg_pos, offsets, jnp.minimum, identity, n_passes
    )


@partial(jax.jit, static_argnames=("n_passes",))
def seg_max(vals: jax.Array, seg_pos: jax.Array, offsets: jax.Array,
            identity, n_passes: int = 24) -> jax.Array:
    return _seg_shift_reduce(
        vals, seg_pos, offsets, jnp.maximum, identity, n_passes
    )


# ───────────── chunked forms for the 100M-edge regime ─────────────
# The axon TPU worker dies when a program's peak HBM passes ~3 GB; at
# e_pad = 2**27 the [E_pad] int32 temporaries of seg_positions alone
# (arange + searchsorted + gather) are ~2 GB on top of the resident
# CSR, and every fixpoint iteration adds several more. The chunked
# forms bound per-iteration temporaries to O(chunk) by processing the
# sorted edge array in static slices: per chunk, a shift-doubling
# reduce (min/max) or two-level prefix (sum) over [chunk] values, then
# a per-node combine of each segment's IN-CHUNK portion into a [V]
# accumulator (clipped-offset windows; segments split by a chunk
# boundary combine across iterations — min/sum are associative).
# Extra cost vs the one-shot forms: a [V]-wide extraction per chunk,
# ~0.6x the edge-gather work at V=10M / chunk=16M.


def spos_dtype_for(n_passes: int):
    """Smallest int dtype that can hold the clipped in-segment
    positions used by a shift-doubling reduce with ``n_passes`` passes
    (positions are clipped to 2**n_passes - 1: the ``>= shift`` tests
    only ever compare against shifts below that)."""
    cap = (1 << n_passes) - 1
    if cap <= 255:
        return jnp.uint8, cap
    if cap <= 32767:
        return jnp.int16, cap
    return jnp.int32, cap


def seg_positions_chunked(
    offsets: jax.Array, e_pad: int, chunk: int, n_passes: int
) -> jax.Array:
    """Compact-dtype :func:`seg_positions`, computed in [chunk] slices:
    peak temporaries O(chunk * 4 bytes) + the output (1-2 bytes/edge
    instead of 4). Values clip to ``2**n_passes - 1`` — exact wherever
    a ``>= shift`` test can distinguish them."""
    dt, cap = spos_dtype_for(n_passes)
    _check_chunking(e_pad, chunk)
    nv = offsets.shape[0] - 2

    def body(k, out):
        cstart = k * chunk
        pos = cstart + jnp.arange(chunk, dtype=jnp.int32)
        node = jnp.searchsorted(offsets, pos, side="right").astype(jnp.int32) - 1
        node = jnp.clip(node, 0, nv)
        sp = jnp.minimum(pos - offsets[node], cap).astype(dt)
        return jax.lax.dynamic_update_slice(out, sp, (cstart,))

    out = jnp.zeros((e_pad,), dt)
    return jax.lax.fori_loop(0, e_pad // chunk, body, out)


def _check_chunking(e_pad: int, chunk: int) -> None:
    """The chunked reducers iterate ``e_pad // chunk`` full slices; a
    remainder would be SILENTLY dropped. Every real caller passes pow2
    padded capacities and pow2 chunks, so this is a static trace-time
    guard, not a runtime branch."""
    if chunk <= 0 or e_pad % chunk != 0:
        raise ValueError(
            f"chunked segment reduce needs chunk | e_pad, got "
            f"e_pad={e_pad} chunk={chunk}"
        )


def seg_reduce_chunked(
    vals_fn, spos: jax.Array, offsets: jax.Array, identity,
    n_passes: int, chunk: int, combine, dtype,
) -> jax.Array:
    """Per-segment ``combine``-reduce (min/max) over a long sorted edge
    array WITHOUT materializing [e_pad] temporaries. ``vals_fn(cstart)``
    returns the [chunk] values starting at edge position ``cstart``
    (computed fresh per chunk, so gathers/masks stay chunk-sized);
    ``spos`` from :func:`seg_positions_chunked`. Returns [V]."""
    e_pad = spos.shape[0]
    _check_chunking(e_pad, chunk)
    num_nodes = offsets.shape[0] - 1
    ident = jnp.asarray(identity, dtype)

    def body(k, acc):
        cstart = k * chunk
        x = vals_fn(cstart)
        sp = jax.lax.dynamic_slice(spos, (cstart,), (chunk,))
        for j in range(n_passes):
            sh = 1 << j
            if sh >= chunk:
                break
            prev = jnp.concatenate(
                [jnp.broadcast_to(ident, (sh,)), x[:-sh]]
            )
            # global in-segment position >= shift ⇒ the predecessor
            # 2^j back is in the same segment; when it sits in the
            # previous chunk (in-chunk index < shift) `prev` is the
            # identity fill — the reduce stays correct per in-chunk
            # portion, and portions combine across chunks below
            x = jnp.where(sp >= sh, combine(x, prev), x)
        lo = jnp.clip(offsets[:-1], cstart, cstart + chunk)
        hi = jnp.clip(offsets[1:], cstart, cstart + chunk)
        last = jnp.clip(hi - 1 - cstart, 0, chunk - 1)
        outk = jnp.where(hi > lo, x[last], ident)
        return combine(acc, outk)

    init = jnp.full((num_nodes,), ident, dtype)
    return jax.lax.fori_loop(0, e_pad // chunk, body, init)


def seg_sum_chunked(
    vals_fn, offsets: jax.Array, e_pad: int, chunk: int, ch: int = 1024
) -> jax.Array:
    """Per-segment sums in [chunk] slices (see :func:`seg_reduce_chunked`
    for the contract; pads must yield 0). Within each chunk the same
    two-level prefix as :func:`seg_sum` bounds f32 error; per-node
    window sums of each segment's in-chunk portion accumulate into the
    [V] result."""
    _check_chunking(e_pad, chunk)
    num_nodes = offsets.shape[0] - 1
    ch = min(ch, chunk)
    m = chunk // ch

    def body(k, acc):
        cstart = k * chunk
        v = vals_fn(cstart)
        local = jnp.cumsum(v.reshape(m, ch), axis=1)
        pre = jnp.concatenate(
            [jnp.zeros(1, v.dtype), jnp.cumsum(local[:, -1])]
        )                                                  # [m+1]
        localf = local.reshape(-1)

        def prefix_at(pos):                                # pos ∈ [0, chunk]
            ci = pos // ch
            off = pos % ch
            loc = jnp.where(
                off > 0,
                localf[jnp.minimum(ci, m - 1) * ch + jnp.maximum(off - 1, 0)],
                jnp.zeros((), v.dtype),
            )
            return pre[ci] + loc

        lo = jnp.clip(offsets[:-1], cstart, cstart + chunk) - cstart
        hi = jnp.clip(offsets[1:], cstart, cstart + chunk) - cstart
        return acc + (prefix_at(hi) - prefix_at(lo))

    init = jnp.zeros((num_nodes,), jnp.float32)
    return jax.lax.fori_loop(0, e_pad // chunk, body, init)


@partial(jax.jit, static_argnames=("num_bins", "chunk"))
def bincount_chunked(
    vals: jax.Array, w: jax.Array | None, num_bins: int, chunk: int
) -> jax.Array:
    """Weighted bincount over a long padded id array in [chunk] slices
    (peak temporaries O(chunk)). Out-of-range ids (pads = num_bins) are
    dropped by the scatter. ``w=None`` counts occurrences.

    Lets PageRank compute out-degrees straight from the OPPOSITE
    direction's CSR values (its ``dst`` holds exactly the source
    endpoints) — the direction CSR, whose only role here was degrees,
    never has to be built: at 134M-edge capacity that is a full device
    sort and ~1.1 GB of resident HBM avoided."""
    e_pad = vals.shape[0]
    chunk = min(chunk, e_pad)
    _check_chunking(e_pad, chunk)

    def body(k, acc):
        cstart = k * chunk
        v = jax.lax.dynamic_slice(vals, (cstart,), (chunk,))
        add = (
            1.0 if w is None
            else jax.lax.dynamic_slice(w, (cstart,), (chunk,))
        )
        return acc.at[v].add(add, mode="drop")

    init = jnp.zeros((num_bins,), jnp.float32)
    return jax.lax.fori_loop(0, e_pad // chunk, body, init)
