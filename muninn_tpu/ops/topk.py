"""Masked top-k and sorted-merge primitives.

TPU-native replacement for the reference's binary min/max-heaps
(``src/priority_queue.c``): on TPU, "heap" state is a fixed-size sorted
array updated by vectorized merge — no dynamic memory, no data-dependent
shapes, everything fuses under jit.

Convention throughout: distances are "smaller = better"; invalid slots
carry ``INF`` distance and id ``-1``.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

import jax.numpy as jnp

INF = np.float32(np.inf)
INVALID_ID = np.int32(-1)


@partial(jax.jit, static_argnames=("k",))
def masked_topk(
    dists: jax.Array,
    k: int,
    *,
    mask: jax.Array | None = None,
    ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Smallest-k of ``dists [..., N]`` with optional validity ``mask``.

    Returns ``(top_dists [..., k], top_ids [..., k])`` sorted ascending;
    masked-out or out-of-range slots come back as ``(inf, -1)``.

    ``ids``: optional id array aligned with the last axis (defaults to
    positional indices). This is the ``hnsw_search`` result-heap analogue
    (``src/hnsw_algo.c:347-448``) collapsed into one ``lax.top_k``.
    """
    n = dists.shape[-1]
    d = dists.astype(jnp.float32)
    if mask is not None:
        d = jnp.where(mask, d, INF)
    kk = min(k, n)
    neg_top, top_idx = jax.lax.top_k(-d, kk)
    top_d = -neg_top
    if ids is None:
        top_ids = top_idx.astype(jnp.int32)
    else:
        top_ids = jnp.take_along_axis(
            jnp.broadcast_to(ids, dists.shape), top_idx, axis=-1
        ).astype(jnp.int32)
    top_ids = jnp.where(jnp.isinf(top_d), INVALID_ID, top_ids)
    if kk < k:  # pad to requested k with invalid slots
        pad = [(0, 0)] * (top_d.ndim - 1) + [(0, k - kk)]
        top_d = jnp.pad(top_d, pad, constant_values=jnp.inf)
        top_ids = jnp.pad(top_ids, pad, constant_values=-1)
    return top_d, top_ids


@jax.jit
def merge_topk(
    dists_a: jax.Array,
    ids_a: jax.Array,
    dists_b: jax.Array,
    ids_b: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Merge two sorted-ascending (dist, id) sets along the last axis,
    keeping the ``ka`` smallest (the width of set ``a``).

    The fixed-size-array analogue of pushing candidates into the
    reference's bounded result heap (``src/hnsw_algo.c:404-433``).
    Deduplicates ids: if an id appears in both sets, only its best
    occurrence survives.
    """
    ka = dists_a.shape[-1]
    d = jnp.concatenate([dists_a, dists_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    d, i = _dedup_ids(d, i)
    order = jnp.argsort(d, axis=-1)
    d = jnp.take_along_axis(d, order, axis=-1)
    i = jnp.take_along_axis(i, order, axis=-1)
    return d[..., :ka], i[..., :ka]


@jax.jit
def _dedup_ids(dists: jax.Array, ids: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Invalidate duplicate ids (keep first-by-sorted-(id,dist) occurrence).

    Sort by (id, dist); a slot is a duplicate if it has the same id as its
    sorted predecessor. Invalid ids (-1) are always 'duplicates' of nothing
    but already carry inf distance, so they sort to the back after re-sort.
    """
    order = jnp.lexsort((dists, ids), axis=-1)
    sd = jnp.take_along_axis(dists, order, axis=-1)
    si = jnp.take_along_axis(ids, order, axis=-1)
    prev = jnp.concatenate(
        [jnp.full_like(si[..., :1], -2), si[..., :-1]], axis=-1
    )
    dup = (si == prev) & (si != INVALID_ID)
    sd = jnp.where(dup, INF, sd)
    si = jnp.where(dup, INVALID_ID, si)
    return sd, si


@jax.jit
def merge_topk_flagged(
    dists_a: jax.Array,
    ids_a: jax.Array,
    flags_a: jax.Array,
    dists_b: jax.Array,
    ids_b: jax.Array,
    flags_b: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Merge two (dist, id, flag) sets keeping the ``ka`` smallest, with
    a boolean payload carried through the sort. On duplicate ids the
    flag=True occurrence wins (used by beam search: the flag marks
    already-expanded entries, so a re-discovered node never reverts to
    unexpanded).
    """
    ka = dists_a.shape[-1]
    d = jnp.concatenate([dists_a, dists_b], axis=-1)
    i = jnp.concatenate([ids_a, ids_b], axis=-1)
    f = jnp.concatenate([flags_a, flags_b], axis=-1)
    # sort by (id, ~flag, dist): within an id, expanded comes first
    order = jnp.lexsort((d, (~f).astype(jnp.int32), i), axis=-1)
    sd = jnp.take_along_axis(d, order, axis=-1)
    si = jnp.take_along_axis(i, order, axis=-1)
    sf = jnp.take_along_axis(f, order, axis=-1)
    prev = jnp.concatenate(
        [jnp.full_like(si[..., :1], -2), si[..., :-1]], axis=-1
    )
    dup = (si == prev) & (si != INVALID_ID)
    sd = jnp.where(dup, INF, sd)
    si = jnp.where(dup, INVALID_ID, si)
    sf = jnp.where(dup, False, sf)
    order2 = jnp.argsort(sd, axis=-1)
    sd = jnp.take_along_axis(sd, order2, axis=-1)
    si = jnp.take_along_axis(si, order2, axis=-1)
    sf = jnp.take_along_axis(sf, order2, axis=-1)
    return sd[..., :ka], si[..., :ka], sf[..., :ka]


@partial(jax.jit, static_argnames=("k",))
def sorted_topk_unique(
    dists: jax.Array, ids: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Sort (dist, id) pairs ascending by distance after id-dedup, keep
    k. Always returns width-``k`` arrays: when fewer than k candidates
    exist the tail is (+inf, -1) padded — callers rely on a stable
    [B, k] shape (e.g. IVF with k > nprobe * cluster_size would
    otherwise return a clipped width that flips with churn state)."""
    d, i = _dedup_ids(dists, ids)
    order = jnp.argsort(d, axis=-1)
    d = jnp.take_along_axis(d, order, axis=-1)[..., :k]
    i = jnp.take_along_axis(i, order, axis=-1)[..., :k]
    short = k - d.shape[-1]
    if short > 0:
        pad = [(0, 0)] * (d.ndim - 1) + [(0, short)]
        d = jnp.pad(d, pad, constant_values=jnp.inf)
        i = jnp.pad(i, pad, constant_values=-1)
    return d, i
