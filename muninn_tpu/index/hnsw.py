"""TPU-native HNSW: batched beam search over padded fixed-degree
neighbor tables.

Re-design of the reference's ``src/hnsw_algo.c`` (Malkov & Yashunin HNSW
with MN-RU pruning and patience early termination) for TPU:

- Node storage: dense int32 slots in a ``VectorStore`` (no hash table,
  ids interned at the API boundary).
- Level-0 graph: ``int32[cap, 2M]`` neighbor table + ``float32[cap, 2M]``
  edge distances (the reference stores edge distance in its ``_edges``
  shadow table, ``src/hnsw_vtab.c:149-180``). ``-1`` pads empty slots.
- Upper levels: nodes are promoted with geometric probability
  ``P(level >= l) = M^-l`` (``random_level``, ``src/hnsw_algo.c:240-248``),
  so levels >= 1 hold only ~N/M nodes; they live in a compact side table
  ``int32[cap_hi, L, M]`` addressed through ``hi_index[cap]``.
- Search: batched greedy descent through upper layers, then batched
  beam search at level 0 — beams are fixed-size sorted arrays, the
  visited set is beam-dedup + expansion flags, and termination is the
  reference's patience rule (``src/hnsw_algo.c:368-392``: stop after
  ``max(ef/4, 10)`` non-improving expansions) expressed inside a
  ``lax.while_loop``.
- Construction: insertion *waves* — search the existing graph for a
  batch of W new vectors at ef_construction, closest-M selection
  (``select_neighbors_heuristic``, ``src/hnsw_algo.c:497-516`` is simple
  closest-M), intra-wave candidate merge (a W x W matmul), forward wiring
  by scatter, reverse wiring by sort-by-target + bounded append, then
  pruning over-full rows back to M_max by (distance asc,
  mutual-neighbor-count desc) — the MN-RU rule
  (``src/hnsw_algo.c:593-646``, arXiv:2407.07871), with the pairwise
  set intersections batched as per-row sorted-membership counts. Bulk
  builds skip all of this and construct the exact kNN graph directly.
- Delete: soft-delete + batched neighbor repair in the spirit of the
  reference's IP-DiskANN-style reconnection (``src/hnsw_algo.c:706-787``):
  survivors that lose edges to a deleted node get candidates from the
  deleted node's former neighborhood.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from muninn_tpu.index.store import VectorStore
from muninn_tpu.ops.pallas_beam import (
    _sublanes,
    gather_block_dots,
    gather_block_topm,
)
from muninn_tpu.ops.pallas_beam_loop import beam_loop, pack_wide
from muninn_tpu.ops.pallas_flat import flat_topk
from muninn_tpu.ops.distance import (
    Metric,
    gathered_distances,
    pairwise_distances,
    parse_metric,
    quantize_rows_int8,
)
from muninn_tpu.ops.topk import (
    masked_topk,
    merge_topk,
    sorted_topk_unique,
)

HNSW_MAX_LEVELS = 32  # matches reference cap, src/hnsw_algo.h:14
_INF = np.float32(np.inf)


# ───────────────────────── search kernels ─────────────────────────


@partial(jax.jit, static_argnames=("metric", "max_steps"))
def _greedy_descent(
    queries: jax.Array,       # [B, d]
    entry: jax.Array,         # [B] int32 starting slots
    level_of_query: jax.Array,  # [B] int32: descend while level > this
    vectors: jax.Array,       # [cap, d]
    hi_index: jax.Array,      # [cap] int32 -> row in hi_neighbors, -1 if none
    hi_neighbors: jax.Array,  # [cap_hi, L, M] int32
    cur_max_level: jax.Array,  # scalar int32
    metric: Metric,
    max_steps: int = 64,
) -> jax.Array:
    """Greedy 1-beam descent through upper layers, batched over queries.

    Mirrors ``greedy_search_layer`` iterated from max_level down to
    ``level_of_query + 1`` (``src/hnsw_algo.c:257-282,679-681``). Returns
    the entry slot for level-0 (or the query's own top level) search.

    NOTE: the production search path uses ``_route_entries`` (exact
    routing over the promoted pool) instead — it is faster on TPU and
    has no local-minimum failures on clustered data. This descent is
    retained as the huge-N fallback for when the promoted pool itself
    outgrows a single distance block (>~100M vectors).
    """
    b = queries.shape[0]
    m = hi_neighbors.shape[2]

    def level_body(lvl_from_top, cur):
        level = cur_max_level - lvl_from_top
        active = level > level_of_query  # only descend levels above target

        lvl_row = jnp.clip(level - 1, 0, hi_neighbors.shape[1] - 1)

        def step(state):
            cur, cur_d, improved, it = state
            rows = hi_index[cur]                                   # [B]
            has_row = rows >= 0
            nbrs = hi_neighbors[jnp.maximum(rows, 0), lvl_row]     # [B, M]
            nbrs = jnp.where(has_row[:, None], nbrs, -1)
            nvalid = nbrs >= 0
            nvecs = vectors[jnp.maximum(nbrs, 0)]                  # [B, M, d]
            nd = gathered_distances(queries, nvecs, metric)        # [B, M]
            nd = jnp.where(nvalid, nd, _INF)
            best = jnp.argmin(nd, axis=1)
            best_d = jnp.take_along_axis(nd, best[:, None], 1)[:, 0]
            best_i = jnp.take_along_axis(nbrs, best[:, None], 1)[:, 0]
            better = (best_d < cur_d) & active
            return (
                jnp.where(better, best_i, cur),
                jnp.where(better, best_d, cur_d),
                better,
                it + 1,
            )

        def cond(state):
            _, _, improved, it = state
            return jnp.any(improved) & (it < max_steps)

        qd = gathered_distances(queries, vectors[jnp.maximum(cur, 0)][:, None, :], metric)[:, 0]
        qd = jnp.where(cur >= 0, qd, _INF)
        cur, _, _, _ = jax.lax.while_loop(
            cond, step, (cur, qd, jnp.ones((b,), bool), jnp.int32(0))
        )
        return cur

    # iterate a static number of levels; levels above cur_max_level no-op
    cur = entry
    for lvl_from_top in range(0, 8):
        cur = level_body(jnp.int32(lvl_from_top), cur)
    return cur


@partial(jax.jit, static_argnames=("metric", "r"))
def _route_entries(
    queries: jax.Array,   # [B, d]
    vectors: jax.Array,   # [cap, d]
    pool: jax.Array,      # [Mp] promoted (level>=1) slots, -1 padded
    metric: Metric,
    r: int,
) -> jax.Array:
    """Exact top-r routing over the promoted pool: one masked MXU
    distance block replaces the reference's greedy per-level descent
    (``src/hnsw_algo.c:257-282``). The pool is N/M of the corpus, so
    this is cheap, always lands the beam in the right region, and has
    no local-minimum failure mode on clustered data."""
    pv = vectors[jnp.maximum(pool, 0)]
    dd = pairwise_distances(queries, pv, metric)
    mask = (pool >= 0)[None, :]
    _, sel = masked_topk(dd, r, mask=mask, ids=jnp.broadcast_to(pool[None, :], dd.shape))
    return sel


@partial(
    jax.jit,
    static_argnames=("metric", "ef", "expand", "max_iters", "patience",
                     "dedup", "fused", "interpret", "topm"),
)
def _beam_search_level0(
    queries: jax.Array,        # [B, d]
    entry: jax.Array,          # [B] int32
    vectors: jax.Array,        # [cap, d] f32 / bf16 / int8
    neighbors0: jax.Array,     # [cap, R0] int32
    metric: Metric,
    ef: int,
    expand: int = 4,
    max_iters: int = 0,
    patience: int = 0,
    scales: jax.Array | None = None,   # [cap] f32 dequant (int8 vectors)
    packed: jax.Array | None = None,   # [cap, R0, d] neighbor vectors
    dedup: bool = True,
    fused: bool = False,               # Pallas DMA gather+dots for `packed`
    interpret: bool = False,
    pscales: jax.Array | None = None,  # [cap, R0] dequant (int8 `packed`)
    topm: int = 0,                     # >0: in-kernel per-pick top-m
) -> tuple[jax.Array, jax.Array]:
    """Batched ef-bounded beam search at level 0.

    The reference's candidates-min-heap + results-max-heap + linear
    visited scan (``src/hnsw_algo.c:347-448``) becomes:

    - the beam is one distance-sorted array of width ``ef`` per query,
      with an ``expanded`` flag lane;
    - each iteration expands the best ``expand`` unexpanded entries,
      gathers their neighbor rows, drops duplicates by equality
      compares (vs the beam and within the iteration), scores the rest
      with one batched matvec, and merges via one ``lax.top_k`` — the
      dedup plays the reference's visited-set role
      (``visited_contains``, :378-433): a node can occupy at most one
      beam slot and is expanded at most once, and nodes that fall off
      the beam can never re-enter because the beam frontier is
      monotone. (Per-query visited maps and lexsort-based dedup merges
      were both measured and rejected: batched 2D element scatters are
      pathologically slow on TPU, and in-loop sorts cost ~4ms/iter.)

    Termination: no unexpanded entries, or ``patience`` non-improving
    *expansions* (reference patience: ``max(ef/4, 10)`` expansions,
    ``src/hnsw_algo.c:368-392``).

    Returns (beam_dists, beam_slots) of width ef, sorted ascending.
    Soft-deleted nodes are routed through but filtered from final
    results by the caller (``src/hnsw_algo.c:404-420``).
    """
    b, d = queries.shape
    r0 = neighbors0.shape[1]
    expand = min(expand, ef)  # can't pick more unexpanded slots than beam width
    if patience <= 0:
        patience = max(ef // 4, 10)  # counted in expansions, src/hnsw_algo.c:368
    if max_iters <= 0:
        max_iters = 2 * (ef // expand + 1) + patience // expand + 8

    use_topm = (
        packed is not None and fused and topm > 0 and pscales is None
    )
    ef_pos = jnp.arange(ef, dtype=jnp.int32)[None, None, :]  # [1,1,ef]

    # init: beam = entry point(s) — [B] or [B, R] (multi-entry seeding
    # from the exact upper-level router)
    if entry.ndim == 1:
        entry = entry[:, None]
    r_ent = entry.shape[1]
    def fetch(idx):
        v = vectors[idx]
        if scales is not None:
            # int8 guidance: dequant after the (quarter-width) gather
            v = v.astype(jnp.float32) * scales[idx][..., None]
        return v

    qf = queries.astype(jnp.float32)
    qn2 = jnp.sum(qf * qf, axis=1)[:, None]           # [B, 1]
    qn = jnp.sqrt(qn2)

    def packed_epilogue(dots, cn2):
        """Metric epilogue over the fused kernel's (dots, cn2) — the
        same math as ``gathered_distances`` on the gathered rows."""
        if metric is Metric.INNER_PRODUCT:
            return -dots
        if metric is Metric.L2:
            return jnp.maximum(qn2 + cn2 - 2.0 * dots, 0.0)
        denom = qn * jnp.sqrt(cn2)
        sim = jnp.where(
            denom < 1e-30, 0.0, dots / jnp.maximum(denom, 1e-30)
        )
        return 1.0 - sim

    e_d = gathered_distances(queries, fetch(jnp.maximum(entry, 0)), metric)
    e_d = jnp.where(entry >= 0, e_d, _INF)
    beam_d = jnp.full((b, ef), jnp.inf).at[:, :r_ent].set(e_d)
    beam_i = jnp.full((b, ef), -1, jnp.int32).at[:, :r_ent].set(entry)
    expanded = jnp.zeros((b, ef), bool)

    def cond(state):
        beam_d, beam_i, expanded, stall, it = state
        has_unexpanded = jnp.any((~expanded) & (beam_i >= 0), axis=1)
        live = has_unexpanded & (stall < patience)
        return jnp.any(live) & (it < max_iters)

    def step(state):
        beam_d, beam_i, expanded, stall, it = state
        # best `expand` unexpanded beam entries per query
        cand_d = jnp.where(expanded | (beam_i < 0), jnp.inf, beam_d)
        _, pick = jax.lax.top_k(-cand_d, expand)                 # [B, E] positions
        pick_i = jnp.take_along_axis(beam_i, pick, axis=1)       # [B, E] slots
        pick_valid = jnp.take_along_axis(cand_d, pick, axis=1) < jnp.inf
        live = jnp.any(pick_valid, axis=1) & (stall < patience)
        do = pick_valid & live[:, None]

        # mark picked expanded via one-hot compare (2D scatters are
        # pathologically slow on TPU)
        sel = jnp.any((pick[:, :, None] == ef_pos) & do[:, :, None], axis=1)
        expanded = expanded | sel

        # neighbor rows of picked entries
        nbrs = neighbors0[jnp.maximum(pick_i, 0)].reshape(b, expand * r0)
        nbrs = jnp.where(do.repeat(r0, axis=1), nbrs, -1)

        # dedup by equality compares (cheaper in-loop than a lexsort
        # merge): drop candidates already in the beam, and duplicate
        # candidates within this iteration (keep first occurrence)
        in_beam = jnp.any(
            nbrs[:, :, None] == jnp.where(beam_i < 0, -2, beam_i)[:, None, :],
            axis=2,
        )                                                         # [B, C]
        c = nbrs.shape[1]
        if use_topm:
            # in-kernel top-m: metric epilogue + per-block candidate
            # selection inside the DMA kernel (gather_block_topm);
            # the downstream dedup/merge runs over E*topm candidates
            # instead of E*R0 — the beam's largest non-DMA cost
            # (DEVELOPMENT.md "Beam DMA economics")
            pen = jnp.where(in_beam | (nbrs < 0), 3.0e38, 0.0)
            # dead picks ride as -1: the kernel skips their block copy
            # entirely (copy issue is the beam's floor, and converged
            # queries' picks are all dead while the batch while_loop
            # drains its stragglers)
            md, ml = gather_block_topm(
                qf, jnp.where(do, pick_i, -1), packed,
                pen, metric=metric, m=topm, interpret=interpret,
            )
            sel = jnp.take_along_axis(
                nbrs.reshape(b, expand, r0), ml, axis=2
            ).reshape(b, expand * topm)
            nd = md.reshape(b, expand * topm)
            okc = nd < 1.0e38
            nd = jnp.where(okc, nd, jnp.inf)
            nbrs = jnp.where(okc, sel, -1)
            c = nbrs.shape[1]
            if dedup:
                # same-iteration duplicates, now over the reduced set
                lower = jnp.tril(jnp.ones((c, c), bool), k=-1)
                dup = jnp.any(
                    (nbrs[:, :, None] == nbrs[:, None, :]) & lower[None],
                    axis=2,
                )
                nd = jnp.where(dup, jnp.inf, nd)
                nbrs = jnp.where(dup, -1, nbrs)
            cat_d = jnp.concatenate([beam_d, nd], axis=1)
            cat_i = jnp.concatenate([beam_i, nbrs], axis=1)
            cat_f = jnp.concatenate(
                [expanded, jnp.zeros((b, c), bool)], axis=1
            )
            neg_top, pos = jax.lax.top_k(-cat_d, ef)
            new_d = -neg_top
            new_i = jnp.take_along_axis(cat_i, pos, axis=1)
            new_f = jnp.take_along_axis(cat_f, pos, axis=1)
            new_i = jnp.where(jnp.isinf(new_d), -1, new_i)
            new_f = new_f & (new_i >= 0)
            improved = (new_d[:, ef - 1] < beam_d[:, ef - 1]) | (
                jnp.sum(new_i >= 0, axis=1) > jnp.sum(beam_i >= 0, axis=1)
            )
            stall = jnp.where(
                live, jnp.where(improved, 0, stall + jnp.sum(do, axis=1)),
                stall,
            )
            return new_d, new_i, new_f, stall.astype(jnp.int32), it + 1
        if dedup:
            # same-iteration duplicate candidates (two expansions
            # sharing a neighbor): O(C^2) compare — the beam's largest
            # fixed per-iteration cost at C=256; `dedup=False` lets
            # duplicates ride to the final unique-top-k instead
            lower = jnp.tril(jnp.ones((c, c), bool), k=-1)
            dup = jnp.any(
                (nbrs[:, :, None] == nbrs[:, None, :]) & lower[None], axis=2
            )
            nbrs = jnp.where(in_beam | dup, -1, nbrs)
        else:
            nbrs = jnp.where(in_beam, -1, nbrs)

        if packed is not None and fused:
            # fused DMA gather + dots: blocks never round-trip HBM as a
            # [B, E*R0, d] intermediate (ops/pallas_beam.py)
            # dead picks ride as -1: the kernel skips their block copy
            dots, cn2 = gather_block_dots(
                qf, jnp.where(do, pick_i, -1), packed, interpret=interpret
            )
            if pscales is not None:
                # int8 blocks: per-neighbor dequant in the epilogue
                ps = pscales[jnp.maximum(pick_i, 0)].reshape(b, expand * r0)
                dots = dots * ps
                cn2 = cn2 * ps * ps
            nd = packed_epilogue(dots, cn2)
        elif packed is not None:
            # neighborhood materialization: ONE contiguous [R0, d]
            # block per expanded node instead of R0 random row
            # fetches — random fetches are DMA-transaction-bound
            # (~30-40M rows/s regardless of row bytes, DEVELOPMENT.md),
            # so 32x fewer transactions for the same bytes
            nvecs = packed[jnp.maximum(pick_i, 0)].reshape(
                b, expand * r0, -1
            )
            nd = gathered_distances(queries, nvecs, metric)
        else:
            nvecs = fetch(jnp.maximum(nbrs, 0))                   # [B, E*R0, d]
            nd = gathered_distances(queries, nvecs, metric)
        nd = jnp.where(nbrs >= 0, nd, jnp.inf)

        # merge: one top_k over [beam | unique fresh candidates]
        cat_d = jnp.concatenate([beam_d, nd], axis=1)
        cat_i = jnp.concatenate([beam_i, nbrs], axis=1)
        cat_f = jnp.concatenate(
            [expanded, jnp.zeros((b, c), bool)], axis=1
        )
        neg_top, pos = jax.lax.top_k(-cat_d, ef)
        new_d = -neg_top
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        new_f = jnp.take_along_axis(cat_f, pos, axis=1)
        new_i = jnp.where(jnp.isinf(new_d), -1, new_i)
        new_f = new_f & (new_i >= 0)

        # an expansion improves when the beam tail tightens OR the beam
        # is still filling (reference: a candidate improves the results
        # heap when it beats the worst result OR results aren't full,
        # src/hnsw_algo.c:368-392). Without the fill term, inf < inf
        # counts every early expansion as a stall and patience kills
        # wide-beam queries after ~patience/expand iterations.
        improved = (new_d[:, ef - 1] < beam_d[:, ef - 1]) | (
            jnp.sum(new_i >= 0, axis=1) > jnp.sum(beam_i >= 0, axis=1)
        )
        # patience counts expansions, not iterations
        stall = jnp.where(
            live, jnp.where(improved, 0, stall + jnp.sum(do, axis=1)), stall
        )
        return new_d, new_i, new_f, stall.astype(jnp.int32), it + 1

    beam_d, beam_i, expanded, _, _ = jax.lax.while_loop(
        cond, step, (beam_d, beam_i, expanded, jnp.zeros((b,), jnp.int32), jnp.int32(0))
    )
    return beam_d, beam_i


@partial(
    jax.jit,
    static_argnames=("metric", "k", "ef", "expand", "r", "interpret",
                     "patience", "dedup", "max_iters", "fused", "topm"),
)
def _search_topk_fused(
    q: jax.Array,            # [B, d] f32
    pool: jax.Array,         # [Mp] promoted slots, -1 pad
    pv: jax.Array,           # [Mp, d] pooled vectors (f32)
    vectors: jax.Array,      # [cap, d] f32 store
    v16: jax.Array,          # [cap, d] bf16/int8 shadow for the beam
    neighbors0: jax.Array,   # [cap, R0]
    valid: jax.Array,        # [cap] bool
    metric: Metric,
    k: int,
    ef: int,
    expand: int,
    r: int,
    interpret: bool = False,
    scales: jax.Array | None = None,
    patience: int = 0,
    packed: jax.Array | None = None,
    dedup: bool = True,
    max_iters: int = 0,
    fused: bool = False,
    pscales: jax.Array | None = None,
    topm: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """The full production query path in one XLA program: Pallas-kernel
    routing over the promoted pool, bf16 beam search, soft-delete
    filtering, exact f32 rescore of the surviving beam, top-k."""
    _, sel = flat_topk(
        q, pv, r, metric=metric, precision="default",
        corpus_valid=pool >= 0, interpret=interpret,
    )
    entries = jnp.where(sel >= 0, pool[jnp.maximum(sel, 0)], -1)
    beam_d, beam_i = _beam_search_level0(
        q, entries, v16, neighbors0, metric, ef, expand,
        patience=patience, scales=scales, packed=packed, dedup=dedup,
        max_iters=max_iters, fused=fused, interpret=interpret,
        pscales=pscales, topm=topm,
    )
    ok = (beam_i >= 0) & valid[jnp.maximum(beam_i, 0)]
    beam_i = jnp.where(ok, beam_i, -1)
    # exact rescore: the bf16 beam decides *which* nodes; the f32 store
    # decides their distances and final order
    cv = vectors[jnp.maximum(beam_i, 0)]
    d = gathered_distances(q, cv, metric)
    d = jnp.where(ok, d, jnp.inf)
    return sorted_topk_unique(d, beam_i, k)


@partial(
    jax.jit,
    static_argnames=("metric", "k", "ef", "expand", "r", "interpret",
                     "patience", "max_iters", "pick_xfer"),
)
def _search_topk_whole(
    q: jax.Array,            # [B, d] f32
    pool: jax.Array,         # [Mp] promoted slots, -1 pad
    pv: jax.Array,           # [Mp, d] pooled vectors (f32)
    vectors: jax.Array,      # [cap, d] f32 store
    v16: jax.Array,          # [cap, d] bf16 shadow (entry scoring)
    packedw: jax.Array,      # [cap, R0, d+128] packed-with-ids blocks
    valid: jax.Array,        # [cap] bool
    metric: Metric,
    k: int,
    ef: int,
    expand: int,
    r: int,
    interpret: bool = False,
    patience: int = 0,
    max_iters: int = 0,
    pick_xfer: str = "dma",
) -> tuple[jax.Array, jax.Array]:
    """Whole-beam query path: Pallas-kernel routing, then the ENTIRE
    beam loop in one Pallas program (``ops/pallas_beam_loop``), then
    soft-delete filtering + exact f32 rescore + top-k. Same contract as
    ``_search_topk_fused`` with the per-iteration XLA glue removed."""
    _, sel = flat_topk(
        q, pv, r, metric=metric, precision="default",
        corpus_valid=pool >= 0, interpret=interpret,
    )
    entries = jnp.where(sel >= 0, pool[jnp.maximum(sel, 0)], -1)
    e_d = gathered_distances(
        q, v16[jnp.maximum(entries, 0)].astype(jnp.float32), metric
    )
    e_d = jnp.where(entries >= 0, e_d, _INF)
    b = q.shape[0]
    init_d = jnp.full((b, ef), jnp.inf).at[:, : entries.shape[1]].set(e_d)
    init_i = (
        jnp.full((b, ef), -1, jnp.int32).at[:, : entries.shape[1]].set(entries)
    )
    beam_d, beam_i = beam_loop(
        q, init_d, init_i, packedw, metric=metric, ef=ef, expand=expand,
        patience=patience, max_iters=max_iters, interpret=interpret,
        pick_xfer=pick_xfer,
    )
    ok = (beam_i >= 0) & valid[jnp.maximum(beam_i, 0)]
    beam_i = jnp.where(ok, beam_i, -1)
    cv = vectors[jnp.maximum(beam_i, 0)]
    d = gathered_distances(q, cv, metric)
    d = jnp.where(ok, d, jnp.inf)
    return sorted_topk_unique(d, beam_i, k)


# ───────────────────────── index class ─────────────────────────


@dataclass
class HnswParams:
    """Mirrors the reference's create-time knobs
    (``src/hnsw_vtab.c:80-134``): dimensions=, metric=, m=16,
    ef_construction=200."""

    dim: int
    metric: Metric = Metric.L2
    m: int = 16
    ef_construction: int = 200


class HnswIndex:
    """HNSW approximate nearest-neighbor index, TPU-native.

    Public surface mirrors the reference vtab semantics
    (``src/hnsw_vtab.c``): ``insert(ids, vectors)``,
    ``delete(ids)``, ``search(queries, k, ef_search)`` with
    ``ef_search`` defaulting to ``k * 2`` (``src/hnsw_vtab.c:586-619``).
    """

    def __init__(
        self,
        dim: int,
        metric: Metric | str = Metric.L2,
        m: int = 16,
        ef_construction: int = 200,
        *,
        capacity: int = 2048,
        seed: int = 42,
        expand: int = 4,
        wave_size: int = 1024,
        mn_ru: bool = True,
    ):
        if m < 2:
            raise ValueError("m must be >= 2")
        self.params = HnswParams(int(dim), parse_metric(metric), int(m), int(ef_construction))
        self.store = VectorStore(dim, capacity)
        self.m = int(m)
        self.m0 = 2 * int(m)  # M_max0 = 2*M, src/hnsw_algo.c:188
        self.ef_construction = int(ef_construction)
        self.expand = int(expand)
        self.wave_size = int(wave_size)
        # MN-RU tiebreak in incremental prunes (arXiv:2407.07871); the
        # bulk path builds the exact kNN graph so ties don't arise there
        self.mn_ru = bool(mn_ru)
        self._rng = np.random.default_rng(seed)  # level sampling, seeded
        # the reference's seeded xorshift32 (src/hnsw_algo.c:222-224)
        self.level_mult = 1.0 / np.log(m)

        cap = self.store.capacity
        self.neighbors0 = jnp.full((cap, self.m0), -1, jnp.int32)
        self.dists0 = jnp.full((cap, self.m0), jnp.inf, jnp.float32)
        self.levels = np.full((cap,), -1, np.int32)  # host copy
        # compact upper-level tables
        self.hi_levels_width = 8  # levels 1..8 stored; P(level>8) ~ M^-8
        hi_cap = max(cap // max(self.m // 2, 2), 64)
        self.hi_index = jnp.full((cap,), -1, jnp.int32)
        self._hi_index_np = np.full((cap,), -1, np.int32)  # host mirror
        self.hi_neighbors = jnp.full(
            (hi_cap, self.hi_levels_width, self.m), -1, jnp.int32
        )
        self._hi_count = 0
        self._hi_pending: list[tuple[np.ndarray, np.ndarray]] = []
        self.entry_point = -1   # slot, not external id
        self.max_level = -1
        self.route_entries = 8  # beam seeds from the exact router
        # (8 measured best at 100k x 384 with the fused beam kernel:
        # 95.6k QPS @ recall 0.9807 vs 91.0k at 16 — the routing
        # kernel's top-k extraction rounds scale with r, and the fused
        # beam no longer needs rich seeding to converge; 4 loses recall)
        # bulk kNN-graph sweep precision: one bf16 MXU pass ranks
        # neighbors with ~0.994 agreement vs exact f32 — graph quality
        # is statistically identical and the sweep runs ~2x faster
        self.build_precision = "default"
        # incremental-wave candidate source (round-4 VERDICT task #3):
        # "exact" = one streaming flat top-m0 over the valid corpus per
        # wave (the bulk build's own move; candidates exact, ~12x
        # faster than the ef_construction beam at 100k x 384);
        # "beam" = the ef_construction beam loop (the only mode where
        # extreme corpus scale could make the flat sweep slower)
        self.insert_mode = "exact"
        self._pool_cache: jax.Array | None = None
        self._pool_dirty = True
        # bf16 shadow of the vector store for the beam loop: the beam is
        # gather-bound (HBM bytes per neighbor row), so halving the row
        # width is ~1.8x on query throughput; the final beam is rescored
        # against the f32 store so returned distances stay exact
        self.search_bf16 = jax.default_backend() == "tpu"
        # beam guidance precision: "bf16" (default) or "int8" (quarter
        # the gather bytes; exact rescore still fixes final ranking)
        self.search_quant = "bf16"
        self.beam_patience = 0  # 0 -> reference default max(ef/4, 10)
        # neighborhood materialization: [cap, R0, d] bf16 neighbor
        # vectors fetched as ONE contiguous block per expansion (32x
        # fewer DMA transactions; random fetches are transaction-bound).
        # Auto-built on first search after a bulk build when it fits
        # pack_budget_bytes; any mutation drops it (call
        # pack_neighbors() to rebuild after churn settles).
        self.pack_budget_bytes = 4 << 30
        self._packed: jax.Array | None = None
        self._packed_scales: jax.Array | None = None
        self._packed_quant = "bf16"
        self._packed_auto = True
        # fused DMA gather+dots beam kernel over the packed table
        # (ops/pallas_beam.py): kills the [B, E*R0, d] HBM intermediate
        # between XLA's gather and the distance reduce. Auto-disabled
        # when the block layout is unaligned for sliced DMAs.
        self.beam_fused = True
        # beam tuning: search over only the first `search_degree`
        # neighbors (rows are distance-sorted, so this is "m for
        # search"); beam_dedup=False skips the O(C^2) same-iteration
        # duplicate check (duplicates die at the final unique top-k)
        self.search_degree: int | None = None
        self._sd_cache: tuple | None = None
        self.beam_dedup = True
        # >0: in-kernel per-pick top-m (gather_block_topm) — the
        # downstream dedup/merge runs over E*topm candidates instead
        # of E*R0. Capped at R0; topm == R0 is exact vs the dots path.
        self.beam_topm = 0
        # whole-beam Pallas loop (ops/pallas_beam_loop): the ENTIRE
        # level-0 beam loop in one kernel — beam state in VMEM, ids
        # packed alongside the vector blocks so one DMA carries both.
        # False (default until measured) | True (TPU only) | "force"
        # (also on CPU interpret — tests). Requires bf16 guidance,
        # d % 128 == 0 and m0 % 16 == 0; falls back to the fused path
        # otherwise.
        self.beam_whole: bool | str = False
        # pick-transfer mechanism for the whole-beam kernel ("dma" =
        # one VMEM->SMEM copy per iteration, "scalar" = per-element
        # reduce stores — the documented-safe fallback)
        self.beam_pick_xfer = "dma"
        self._packedw: jax.Array | None = None
        self._sdw_cache: tuple | None = None
        # beam-iteration budget (0 = auto = ceil(ef/expand)+1; -1 =
        # run to convergence): a while_loop runs until the SLOWEST
        # query in the batch converges, but a query expands at most
        # ~ef nodes total, so ceil(ef/expand)+1 iterations already
        # cover the classic HNSW expansion budget — measured at
        # 100k x 384 / ef=24: +9% QPS at identical recall (0.9782)
        self.beam_max_iters = 0
        # below this live-store size, search runs the EXACT fused flat
        # kernel instead of routing+beam: at small N the promoted pool
        # is a handful of nodes (n/m), cluster coverage is luck, and one
        # MXU pass is both exact and faster than any beam (the repo's
        # design invariant; the reference's own tipping-point chart
        # shows graph search only pays off at scale — its recall curve
        # is already degrading at these sizes: 0.9722 @ 5k)
        self.exact_small_n = 8192
        self._v16: jax.Array | None = None
        self._v8: tuple | None = None
        self._pool_vecs_cache: jax.Array | None = None

    # ── properties ──

    @property
    def dim(self) -> int:
        return self.store.dim

    @property
    def metric(self) -> Metric:
        return self.params.metric

    def __len__(self) -> int:
        return len(self.store)

    def seed_rng(self, seed: int) -> None:
        """Reset level-sampling PRNG (reference ``hnsw_seed_rng``,
        ``src/hnsw_algo.c:222-224``)."""
        self._rng = np.random.default_rng(seed)

    # ── capacity management ──

    def _sync_capacity(self) -> None:
        cap = self.store.capacity
        old = self.neighbors0.shape[0]
        if cap == old:
            return
        self.neighbors0 = jnp.pad(
            self.neighbors0, ((0, cap - old), (0, 0)), constant_values=-1
        )
        self.dists0 = jnp.pad(
            self.dists0, ((0, cap - old), (0, 0)), constant_values=jnp.inf
        )
        self.levels = np.pad(self.levels, (0, cap - old), constant_values=-1)
        self.hi_index = jnp.pad(self.hi_index, (0, cap - old), constant_values=-1)
        self._hi_index_np = np.pad(
            self._hi_index_np, (0, cap - old), constant_values=-1
        )
        hi_cap = self.hi_neighbors.shape[0]
        need_hi = max(cap // max(self.m // 2, 2), 64)
        if need_hi > hi_cap:
            self.hi_neighbors = jnp.pad(
                self.hi_neighbors, ((0, need_hi - hi_cap), (0, 0), (0, 0)),
                constant_values=-1,
            )

    # ── level sampling ──

    def _sample_levels(self, n: int) -> np.ndarray:
        """Geometric levels: floor(-ln(U) * 1/ln(M)), capped
        (``random_level``, src/hnsw_algo.c:240-248)."""
        u = self._rng.random(n)
        u = np.maximum(u, 1e-10)
        lv = np.floor(-np.log(u) * self.level_mult).astype(np.int32)
        return np.minimum(lv, HNSW_MAX_LEVELS - 1)

    # ── search ──

    def search_device(self, queries, k: int = 10, ef_search: int | None = None):
        """Engine dispatch: results left ON DEVICE in slot space —
        ``(dists f32 [B, k], slots int32 [B, k])`` jax arrays (map via
        ``self.store.ids_of``). The throughput path: callers can queue
        many dispatches and pay one host sync per batch (``search``
        wraps it)."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise ValueError(f"query dim {q.shape[1]} != index dim {self.dim}")
        if ef_search is None:
            ef_search = max(k * 2, k)
        ef = max(ef_search, k)
        b = q.shape[0]
        if self.entry_point < 0:
            return (jnp.full((b, k), jnp.inf, jnp.float32),
                    jnp.full((b, k), -1, jnp.int32))

        hw = self.store.high_watermark
        if hw <= self.exact_small_n:
            return flat_topk(
                q, self.store.vectors[:hw], k, metric=self.metric,
                corpus_valid=self.store.valid[:hw], precision="highest",
                interpret=jax.default_backend() != "tpu",
            )

        pool = self._routing_pool()
        if self.search_bf16 and pool is not None:
            # the whole query path — kernel routing, bf16 beam, validity
            # filter, exact f32 rescore, top-k — is ONE jitted dispatch
            # (the eager glue between sub-jits measured ~25% of query
            # latency through this environment's dispatch path)
            return self._search_topk_chunked(q, k, ef)
        beam_d, beam_i = self._search_slots_chunked(q, ef)
        # filter soft-deleted + take k
        valid = self.store.valid
        ok = (beam_i >= 0) & valid[jnp.maximum(beam_i, 0)]
        beam_d = jnp.where(ok, beam_d, jnp.inf)
        beam_i = jnp.where(ok, beam_i, -1)
        return sorted_topk_unique(beam_d, beam_i, k)

    def search(self, queries, k: int = 10, ef_search: int | None = None):
        """Batched KNN. Returns (ids int64 [B,k], dists f32 [B,k]).

        ``ef_search`` defaults to ``k * 2`` (src/hnsw_vtab.c:600-603).
        """
        single = np.ndim(queries) == 1
        d, slots = self.search_device(queries, k, ef_search)
        ids = self.store.ids_of(np.asarray(slots))
        d = np.asarray(d)
        return (ids[0], d[0]) if single else (ids, d)

    def _search_topk_chunked(self, q: jax.Array, k: int, ef: int):
        pool = self._routing_pool()
        pv = self._pool_vecs(pool)
        v16 = self._vecs16()
        r = min(self.route_entries, ef)
        interp = jax.default_backend() != "tpu"

        if self.search_quant == "int8":
            v16, scales = self._vecs8()
        else:
            scales = None
        if self.beam_max_iters == 0:
            mi = -(-ef // max(self.expand, 1)) + 1   # auto: ~ef expansions
        elif self.beam_max_iters < 0:
            mi = 0                                   # converge
        else:
            mi = self.beam_max_iters
        sd = self.search_degree

        # whole-beam kernel path: the full beam loop in one Pallas
        # program (ops/pallas_beam_loop). Constraints: bf16 guidance,
        # lane/sublane-aligned blocks, and (for now) no search_degree
        # slicing with unaligned widths — falls back to the fused path.
        # Checked BEFORE _maybe_packed() so taking this path never
        # materializes the (GB-scale) fused packed table as well.
        if (
            self.beam_whole
            and self.search_quant != "int8"
            and (self.beam_whole == "force" or not interp)
            and self.dim % 128 == 0
            and self.m0 % 16 == 0
            and not (sd and sd < self.m0 and sd % 16 != 0)
        ):
            packedw = self._maybe_packed_wide(
                force=self.beam_whole == "force"
            )
            if packedw is not None and sd and sd < self.m0:
                # cached slice (same invariants as _sd_cache below)
                cw = self._sdw_cache
                if not (cw is not None and cw[0] == sd and cw[1] is packedw):
                    self._sdw_cache = cw = (sd, packedw, packedw[:, :sd])
                packedw = cw[2]
            if packedw is not None:
                def one_whole(qc):
                    return _search_topk_whole(
                        qc, pool, pv, self.store.vectors, v16, packedw,
                        self.store.valid, self.metric, k, ef,
                        self.expand, r, interp, self.beam_patience,
                        max(mi, 0), self.beam_pick_xfer,
                    )
                return self._run_chunked(q, one_whole)

        packed = self._maybe_packed()
        pscales = self._packed_scales
        nbrs0 = self.neighbors0
        if sd and sd < self.m0:
            # cache the sliced tables: the slices are invariant until
            # the knob or the source arrays change, and re-slicing the
            # packed table eagerly per call would copy GBs on device
            # (plus a tunnel dispatch) every search
            c = self._sd_cache
            hit = (
                c is not None and c[0] == sd and c[1] is self.neighbors0
                and c[2] is packed and c[3] is pscales
            )
            if not hit:
                # keep the SOURCE arrays in the cache entry: identity
                # (`is`) comparison is only sound while they stay alive
                self._sd_cache = c = (
                    sd, self.neighbors0, packed, pscales,
                    self.neighbors0[:, :sd],
                    packed[:, :sd] if packed is not None else None,
                    pscales[:, :sd] if pscales is not None else None,
                )
            nbrs0, packed, pscales = c[4], c[5], c[6]
        sublanes = _sublanes(packed.dtype) if packed is not None else 8
        fused = (
            self.beam_fused
            and packed is not None
            and not interp
            and packed.shape[2] % 128 == 0
            and packed.shape[1] % sublanes == 0
        )
        if packed is not None and packed.dtype == jnp.int8 and not fused:
            # int8 blocks only make sense dequantized inside the fused
            # kernel's epilogue; fall back to scale-aware row gathers
            packed = pscales = None

        def one(qc):
            return _search_topk_fused(
                qc, pool, pv, self.store.vectors, v16, nbrs0,
                self.store.valid, self.metric, k, ef, self.expand, r,
                interp, scales, self.beam_patience, packed,
                self.beam_dedup, mi, fused, pscales,
                max(0, min(self.beam_topm, nbrs0.shape[1]))
                if fused and pscales is None else 0,
            )

        return self._run_chunked(q, one)

    def _run_chunked(self, q: jax.Array, one):
        b = q.shape[0]
        cap = self.store.capacity
        chunk = int(max(1024, min(8192, (1 << 29) // max(cap, 1))))
        if b <= chunk:
            return one(q)
        # balance chunks (256-aligned) instead of padding the tail to a
        # full chunk: 8192 queries at chunk_max 3920 run as 3 x 2816
        # instead of 3 x 3920 (-28% wasted compute)
        n_chunks = -(-b // chunk)
        chunk = -(-(-(-b // n_chunks)) // 256) * 256
        pad = n_chunks * chunk - b
        qp = jnp.pad(q, ((0, pad), (0, 0)))
        parts = [one(qp[s : s + chunk]) for s in range(0, b + pad, chunk)]
        return (
            jnp.concatenate([p[0] for p in parts])[:b],
            jnp.concatenate([p[1] for p in parts])[:b],
        )

    def _search_slots_chunked(self, q: jax.Array, ef: int) -> tuple[jax.Array, jax.Array]:
        """Chunked beam search: bounds the visited-map ([B, cap]) and
        gather footprints and keeps one compiled shape across calls."""
        b = q.shape[0]
        cap = self.store.capacity
        chunk = int(max(256, min(4096, (1 << 28) // max(cap, 1))))
        if b <= chunk:
            return self._search_slots(q, ef)
        pad = (-b) % chunk
        qp = jnp.pad(q, ((0, pad), (0, 0)))
        parts = [
            self._search_slots(qp[s : s + chunk], ef)
            for s in range(0, b + pad, chunk)
        ]
        return (
            jnp.concatenate([p[0] for p in parts])[:b],
            jnp.concatenate([p[1] for p in parts])[:b],
        )

    def _search_slots(self, q: jax.Array, ef: int) -> tuple[jax.Array, jax.Array]:
        """Exact routing over the promoted pool + level-0 beam search;
        returns slot-space beams (distances exact f32 post-rescore)."""
        b = q.shape[0]
        pool = self._routing_pool()
        if pool is None:
            entries = jnp.full((b, 1), self.entry_point, jnp.int32)
        else:
            r = min(self.route_entries, ef)
            if self.search_bf16:
                # route with the streaming Pallas kernel over the cached
                # pooled matrix — ~8x faster than the XLA topk path
                pv = self._pool_vecs(pool)
                _, sel = flat_topk(
                    q, pv, r, metric=self.metric, precision="default",
                    corpus_valid=pool >= 0,
                    interpret=jax.default_backend() != "tpu",
                )
                entries = jnp.where(sel >= 0, pool[jnp.maximum(sel, 0)], -1)
            else:
                entries = _route_entries(q, self.store.vectors, pool, self.metric, r)
        if self.search_bf16:
            v16 = self._vecs16()
            beam_d, beam_i = _beam_search_level0(
                q, entries, v16, self.neighbors0, self.metric, ef, self.expand,
            )
            # exact rescore: the bf16 beam decides *which* nodes; the f32
            # store decides their distances and final order
            cv = self.store.vectors[jnp.maximum(beam_i, 0)]
            d = gathered_distances(q, cv, self.metric)
            d = jnp.where(beam_i >= 0, d, jnp.inf)
            order = jnp.argsort(d, axis=1)
            return (
                jnp.take_along_axis(d, order, axis=1),
                jnp.take_along_axis(beam_i, order, axis=1),
            )
        return _beam_search_level0(
            q, entries, self.store.vectors, self.neighbors0,
            self.metric, ef, self.expand,
        )

    def _vecs16(self) -> jax.Array:
        if self._v16 is None:
            self._v16 = self.store.vectors.astype(jnp.bfloat16)
        return self._v16

    def _vecs8(self) -> tuple:
        if self._v8 is None:
            self._v8 = quantize_rows_int8(self.store.vectors)
        return self._v8

    def _pool_vecs(self, pool: jax.Array) -> jax.Array:
        if self._pool_vecs_cache is None:
            self._pool_vecs_cache = self.store.vectors[jnp.maximum(pool, 0)]
        return self._pool_vecs_cache

    def _invalidate_search_caches(self) -> None:
        self._v16 = None
        self._v8 = None
        self._pool_vecs_cache = None
        self._packed = None
        self._packed_scales = None
        self._packedw = None
        self._packed_auto = False  # don't repack every churn wave

    def pack_neighbors(self) -> None:
        """(Re)build the materialized neighbor-vector table and
        re-enable auto-packing — call after bulk builds or once a churn
        phase settles."""
        self._packed_auto = True
        self._packed = None
        self._packed_scales = None
        self._maybe_packed(force=True)

    def _maybe_packed(self, force: bool = False):
        if self._packed is not None and self._packed_quant == self.search_quant:
            return self._packed
        if self._packed is None and not (self._packed_auto or force):
            return None
        cap = self.store.capacity
        itemsize = 1 if self.search_quant == "int8" else 2
        bytes_needed = cap * self.m0 * self.dim * itemsize
        if bytes_needed > self.pack_budget_bytes:
            return None
        if jax.default_backend() != "tpu" and not force:
            return None  # CPU tests: keep the row-gather path exercised
        nb = jnp.maximum(self.neighbors0, 0)
        if self.search_quant == "int8":
            # quarter-width blocks (half the beam's DMA bytes vs bf16);
            # per-neighbor dequant scales ride a tiny side table and are
            # applied in the fused kernel's XLA epilogue
            vi, sc = self._vecs8()
            self._packed = vi[nb]
            self._packed_scales = sc[nb]
        else:
            v16 = self._vecs16()
            self._packed = v16[nb]
            self._packed_scales = None
        self._packed_quant = self.search_quant
        return self._packed

    def _maybe_packed_wide(self, force: bool = False):
        """Packed-with-ids table for the whole-beam kernel
        (``pack_wide``): +128 bf16 lanes per neighbor row over
        ``_maybe_packed`` — bytes are near-free on the transaction-bound
        beam, and the id lanes remove the separate neighbors0 gather."""
        if self._packedw is not None:
            return self._packedw
        if self._packed is None and not (self._packed_auto or force):
            return None
        cap = self.store.capacity
        bytes_needed = cap * self.m0 * (self.dim + 128) * 2
        if bytes_needed > self.pack_budget_bytes:
            return None
        if jax.default_backend() != "tpu" and not force:
            return None
        self._packedw = pack_wide(self._vecs16(), self.neighbors0)
        return self._packedw

    def _routing_pool(self) -> jax.Array | None:
        """Device array of promoted (level >= 1) slots, -1-padded to a
        power of two; None while the graph has no promoted nodes."""
        if self._pool_dirty:
            members = np.nonzero(self.levels >= 1)[0].astype(np.int32)
            if len(members) == 0:
                self._pool_cache = None
            else:
                pad = (1 << int(np.ceil(np.log2(max(len(members), 64))))) - len(members)
                self._pool_cache = jnp.asarray(
                    np.pad(members, (0, pad), constant_values=-1)
                )
            self._pool_vecs_cache = None  # pooled matrix follows the pool
            self._pool_dirty = False
        return self._pool_cache

    # ── insert ──

    def insert(self, ids, vectors) -> None:
        """Batched insert.

        Bulk path: inserting a large batch into an empty index builds
        the level-0 graph as an *exact* kNN graph — one streaming
        Pallas distance+top-k sweep of the corpus against itself plus a
        reverse-edge symmetrization pass. On the MXU this brute-force
        O(N^2 d) build is far cheaper than graph-guided insertion and
        produces the graph sequential HNSW only approximates
        (src/hnsw_algo.c:520-663). Incremental inserts use waves of
        ``wave_size`` through batched beam search.
        """
        ids = np.asarray(ids, np.int64).reshape(-1)
        self._invalidate_search_caches()
        # keep device arrays resident (no host round trip)
        if isinstance(vectors, jax.Array):
            vecs = vectors.reshape(len(ids), self.dim)
        else:
            vecs = np.asarray(vectors, np.float32).reshape(len(ids), self.dim)
        if len(self) == 0 and len(ids) >= 4 * self.wave_size:
            self._bulk_build(ids, vecs)
            return
        for s in range(0, len(ids), self.wave_size):
            self._insert_wave(ids[s : s + self.wave_size], vecs[s : s + self.wave_size])

    def _bulk_build(self, ids: np.ndarray, vecs: np.ndarray,
                    knn: tuple | None = None) -> None:
        """``knn``: optional precomputed raw top-(m0+1) sweep
        ``(dists [n, m0+1], ids [n, m0+1])`` in SLOT space (self-matches
        included — dropped here), e.g. from the one-dispatch per-shard
        mesh sweep in ``parallel.build_hnsw_sharded``. Replaces the
        local corpus-vs-itself sweep; wiring/prune/upper-level passes
        are identical."""
        import os
        import time as _time

        from muninn_tpu.ops.pallas_flat import flat_topk

        dbg = bool(os.environ.get("MUNINN_DEBUG_TIMING"))
        marks = [("start", _time.time())]

        def mark(name, sync=None):
            if dbg:
                if sync is not None:
                    np.asarray(sync.reshape(-1)[0])  # force completion
                marks.append((name, _time.time()))

        n = len(ids)
        slots = self.store.add(ids, vecs)
        mark("store.add", self.store.vectors)
        self._sync_capacity()
        levels = self._sample_levels(n)
        self.levels[slots] = levels
        self.entry_point = int(slots[int(np.argmax(levels))])
        self.max_level = int(levels.max())

        # promotions
        promoted = np.nonzero(levels >= 1)[0]
        if len(promoted):
            hi_rows = np.arange(self._hi_count, self._hi_count + len(promoted), dtype=np.int32)
            self._hi_count += len(promoted)
            if self._hi_count > self.hi_neighbors.shape[0]:
                grow = self._hi_count * 2 - self.hi_neighbors.shape[0]
                self.hi_neighbors = jnp.pad(
                    self.hi_neighbors, ((0, grow), (0, 0), (0, 0)), constant_values=-1
                )
            self.hi_index = self.hi_index.at[slots[promoted]].set(jnp.asarray(hi_rows))
            self._hi_index_np[slots[promoted]] = hi_rows
            self._pool_dirty = True

        # exact kNN rows (level 0): query the corpus against itself in
        # batches; +1 for the self-match which is dropped. Everything
        # stays device-resident: per-chunk host syncs and bulk H2D
        # transfers cost seconds each through slow interconnects.
        mark("promote")
        hw = self.store.high_watermark
        corpus = self.store.vectors[:hw]
        interp = jax.default_backend() != "tpu"
        qb = 8192
        base = int(slots[0])  # bulk slots are contiguous
        if knn is not None:
            kd, ki = knn
            rows_i, rows_d = _drop_self_matches(
                jnp.asarray(kd), jnp.asarray(ki), jnp.int32(base), self.m0
            )
            mark("knn_precomputed", rows_i)
            self._finish_bulk(ids, slots, promoted, levels, rows_i, rows_d,
                              n, qb, dbg, marks, mark)
            return
        chunks_i, chunks_d = [], []
        for s in range(0, n, qb):
            qn = min(qb, n - s)
            # pad the tail to a pow2 bucket: a raw remainder is a novel
            # flat_topk shape = one 30-200 s tunnel compile per distinct
            # corpus-size remainder (CLAUDE.md bucket rule); pad rows'
            # outputs are sliced off below
            bucket = min(qb, 1 << int(np.ceil(np.log2(max(qn, 256)))))
            q = corpus[base + s : base + s + qn]
            if qn < bucket:
                q = jnp.pad(q, ((0, bucket - qn), (0, 0)))
            dd, ii = flat_topk(
                q, corpus, self.m0 + 1, metric=self.metric, interpret=interp,
                precision=self.build_precision,
            )
            ci, cd = _drop_self_matches(dd, ii, jnp.int32(base + s), self.m0)
            chunks_i.append(ci[:qn])
            chunks_d.append(cd[:qn])
        rows_i = jnp.concatenate(chunks_i)        # [n, m0] device
        rows_d = jnp.concatenate(chunks_d)
        mark("knn_sweep", rows_i)
        self._finish_bulk(ids, slots, promoted, levels, rows_i, rows_d,
                          n, qb, dbg, marks, mark)

    def _finish_bulk(self, ids, slots, promoted, levels, rows_i, rows_d,
                     n, qb, dbg, marks, mark) -> None:
        """Shared bulk-build tail: forward wiring, reverse-edge
        symmetrization, prune sweep, upper-level wiring."""
        slots_j = jnp.asarray(slots)
        self.neighbors0 = self.neighbors0.at[slots_j].set(rows_i)
        self.dists0 = self.dists0.at[slots_j].set(rows_d)
        mark("forward_wire", self.neighbors0)

        # symmetrize: one global device-side reverse-append pass, then a
        # single prune sweep over all rows
        cap = self.neighbors0.shape[0]
        a_max = self.m0
        append_i, append_d = _reverse_append(
            rows_i, rows_d, slots_j, cap, self.m0
        )
        mark("rev_scatter", append_d)
        for s in range(0, n, qb):
            e = min(s + qb, n)
            aff = slots_j[s:e]
            if e - s < qb:  # pad final chunk to the compiled shape
                aff = jnp.concatenate(
                    [aff, jnp.full((qb - (e - s),), int(slots[0]), jnp.int32)]
                )
            self.neighbors0, self.dists0 = _prune_rows(
                self.neighbors0, self.dists0, append_i, append_d, aff, self.m0
            )
        mark("prune", self.neighbors0)

        # upper levels: exact closest-M per level
        if len(promoted):
            self._wire_upper_levels(slots, levels, promoted)
        mark("upper", self.hi_neighbors)
        # a bulk build IS the "churn settled" point: re-enable neighbor
        # packing so the first search materializes [cap, R0, d] blocks
        # (one contiguous DMA per expansion, +30% measured query QPS at
        # 100k x 384 — the win only shows once tunnel dispatch overhead
        # is excluded, see DEVELOPMENT.md "dispatch overhead" note)
        self._packed_auto = True
        if dbg:
            import sys as _sys
            for (a, ta), (b, tb) in zip(marks, marks[1:]):
                print(f"    bulk {b}: {tb - ta:.1f}s", file=_sys.stderr, flush=True)

    def _insert_wave(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        """One insertion wave = ONE fused jitted dispatch.

        Every separate dispatch through this environment's TPU tunnel
        costs ~0.2-0.4 s, so search + tombstone masking + intra-wave
        merge + selection + forward/reverse wiring + MN-RU prune all
        live in ``_insert_wave_fused``; only id bookkeeping, level
        sampling, and promotion queueing stay on host. Upper-level
        wiring is deferred (``_flush_hi_wiring``): production search
        routes via the exact promoted pool, so the hi tables are only
        needed lazily (checkpoint / greedy-descent fallback), and
        deferral batches many waves into one exact wiring pass.
        """
        w = len(ids)
        first = self.entry_point < 0
        ef = max(self.ef_construction, self.m0 + 1)
        r = min(self.route_entries, ef)
        bucket = 1 << int(np.ceil(np.log2(max(w, 64))))

        # routing pool of the PRE-wave graph (this wave's promotions
        # only become routable next wave, matching search-before-insert)
        pool = None if first else self._routing_pool()
        if pool is None:
            p = np.full(64, -1, np.int32)
            if not first:
                p[0] = self.entry_point
            pool = jnp.asarray(p)

        slots = self.store.register(ids, reserve_extra=bucket - w)
        self._sync_capacity()
        levels = self._sample_levels(w)
        self.levels[slots] = levels

        # queue promotions; device hi tables are wired lazily in batch
        promoted = np.nonzero(levels >= 1)[0]
        if len(promoted):
            hi_rows = np.arange(
                self._hi_count, self._hi_count + len(promoted), dtype=np.int32
            )
            self._hi_count += len(promoted)
            self._hi_index_np[slots[promoted]] = hi_rows
            self._hi_pending.append(
                (slots[promoted].astype(np.int32), levels[promoted].astype(np.int32))
            )
            self._pool_dirty = True

        # pad the wave to its pow2 bucket (one compiled shape per bucket)
        if isinstance(vecs, jax.Array):
            qv = vecs if w == bucket else jnp.pad(vecs, ((0, bucket - w), (0, 0)))
        else:
            qp = np.zeros((bucket, self.dim), np.float32)
            qp[:w] = vecs
            qv = jnp.asarray(qp)

        (
            self.store.vectors,
            self.store.valid,
            self.neighbors0,
            self.dists0,
        ) = _insert_wave_fused(
            self.store.vectors, self.store.valid,
            self.neighbors0, self.dists0,
            pool, qv, np.int32(slots[0]), np.int32(w),
            metric=self.metric, ef=ef, expand=self.expand,
            r=r, m0=self.m0, mn=self.mn_ru,
            exact=self.insert_mode == "exact",
            precision=self.build_precision,
            interp=jax.default_backend() != "tpu",
        )

        # entry point update: highest level wins (src/hnsw_algo.c:660-663)
        top = int(np.argmax(levels))
        if first or int(levels[top]) > self.max_level:
            self.max_level = int(levels[top])
            self.entry_point = int(slots[top])

    def _flush_hi_wiring(self) -> None:
        """Wire all queued promotions into the upper-level tables in one
        batched exact pass. Deferral is semantically clean because upper
        levels are wired *exactly* over the full level pool — the result
        is the same (or better-connected) graph wherever the flush
        lands. Called lazily: before checkpointing, and by any consumer
        of ``hi_neighbors``/``hi_index`` (the greedy-descent fallback).
        """
        if not self._hi_pending:
            return
        slots = np.concatenate([s for s, _ in self._hi_pending])
        levels = np.concatenate([l for _, l in self._hi_pending])
        self._hi_pending = []
        alive = self.levels[slots] >= 1  # drop nodes deleted since queuing
        slots, levels = slots[alive], levels[alive]
        if len(slots) == 0:
            return
        if self._hi_count > self.hi_neighbors.shape[0]:
            grow = self._hi_count * 2 - self.hi_neighbors.shape[0]
            self.hi_neighbors = jnp.pad(
                self.hi_neighbors, ((0, grow), (0, 0), (0, 0)),
                constant_values=-1,
            )
        rows = self._hi_index_np[slots]
        self.hi_index = self.hi_index.at[jnp.asarray(slots)].set(jnp.asarray(rows))
        self._wire_upper_levels(slots, levels, np.arange(len(slots)))

    def _wire_upper_levels(self, slots, levels, promoted) -> None:
        """Wire this wave's promoted nodes at every level 1..their
        level: exact closest-M among *all* nodes whose level reaches
        that layer (one masked MXU distance block per level), then
        device-side reverse append + prune (``_hi_reverse_wire``).

        This replaces the reference's per-level approximate beam
        searches during insert (src/hnsw_algo.c:572-591) with exact
        construction — affordable because level-l population is
        ~N / M^l, and it guarantees the upper layers form long-range
        navigable graphs even on heavily clustered data.
        """
        top = int(levels[promoted].max())
        for lv in range(1, min(top, self.hi_levels_width) + 1):
            wave_members = slots[levels >= lv].astype(np.int32)
            if len(wave_members) == 0:
                continue
            pool = np.nonzero(self.levels >= lv)[0].astype(np.int32)
            if len(pool) <= 1:
                continue
            pool_pad = (1 << int(np.ceil(np.log2(max(len(pool), 64))))) - len(pool)
            pl = jnp.asarray(np.pad(pool, (0, pool_pad), constant_values=-1))
            lv_row = jnp.int32(lv - 1)
            # chunk members: the [P, pool] distance block must stay in
            # HBM budget (level-1 at 1M nodes is ~62k members)
            mchunk = max(256, min(4096, (1 << 26) // max(len(pool), 1)))
            all_sel = []
            for s0 in range(0, len(wave_members), mchunk):
                wm = wave_members[s0 : s0 + mchunk]
                p_pad = -len(wm) % 256
                wm = np.pad(wm, (0, p_pad), constant_values=-1)
                sel = _upper_select(
                    self.store.vectors, jnp.asarray(wm), pl,
                    self.m, self.metric,
                )                                      # [P_pad, m] slots
                # pads (and any unpromoted member, defensively) scatter
                # to the OUT-OF-RANGE row H and are dropped: writing a
                # stale row back at a real index races the owner's own
                # update in the same duplicate-index scatter when the
                # hi table is exactly full (row H-1 then belongs to a
                # real node), and duplicate order is nondeterministic
                h_cap = self.hi_neighbors.shape[0]
                rows_np = np.where(
                    wm >= 0, self._hi_index_np[np.maximum(wm, 0)], h_cap
                )
                hi_rows = jnp.asarray(np.where(rows_np < 0, h_cap, rows_np))
                self.hi_neighbors = self.hi_neighbors.at[
                    hi_rows, lv_row
                ].set(sel, mode="drop")
                all_sel.append((wm, np.asarray(sel)))
            # reverse edges: each chosen o gains the wave member s;
            # chunked so the prune's [E, 2m, d] gather stays bounded
            o_list = np.concatenate([s.reshape(-1) for _, s in all_sel])
            s_list = np.concatenate([np.repeat(w, self.m) for w, _ in all_sel])
            ok = (o_list >= 0) & (s_list >= 0)
            o_list = np.where(ok, o_list, -1).astype(np.int32)
            s_list = np.where(ok, s_list, -1).astype(np.int32)
            echunk = max(4096, min(65536, (1 << 28) // max(self.dim * 2 * self.m, 1)))
            for s0 in range(0, len(o_list), echunk):
                o_arr = o_list[s0 : s0 + echunk]
                s_arr = s_list[s0 : s0 + echunk]
                pad = (-len(o_arr)) % 4096
                if pad:
                    o_arr = np.pad(o_arr, (0, pad), constant_values=-1)
                    s_arr = np.pad(s_arr, (0, pad), constant_values=-1)
                self.hi_neighbors = _hi_reverse_wire(
                    self.hi_neighbors, self.hi_index, self.store.vectors,
                    jnp.asarray(o_arr), jnp.asarray(s_arr),
                    lv_row, self.m, self.metric,
                )

    # ── delete ──

    def delete(self, ids) -> None:
        """Soft-delete + batched neighbor repair in THREE fused
        dispatches + one host sync per wave.

        Reference behavior (``hnsw_delete``, src/hnsw_algo.c:706-802):
        soft-delete flag, reconnect orphaned neighbors among the deleted
        node's former neighborhood, re-scan entry point if deleted. Here
        the repair covers ALL survivors whose rows reference a deleted
        node (a device scan of the whole neighbor table — scanning only
        the deleted nodes' former neighborhoods misses asymmetric edges
        X->D whose reverse was pruned away), with repair candidates
        drawn from the union of former neighborhoods.
        """
        self._invalidate_search_caches()
        ids = np.asarray(ids, np.int64).reshape(-1)
        if len(ids) == 0:
            return
        # large deletions process in waves: the repair pool grows with
        # the wave (union of former neighborhoods)
        if len(ids) > self.wave_size:
            for s in range(0, len(ids), self.wave_size):
                self.delete(ids[s : s + self.wave_size])
            return
        slots = self.store.unregister(ids)
        self.levels[slots] = -1
        self._hi_index_np[slots] = -1
        if self._hi_pending:  # unwired promotions of deleted nodes die here
            self._hi_pending = [
                (sl[~np.isin(sl, slots)], lv[~np.isin(sl, slots)])
                for sl, lv in self._hi_pending
            ]
        self._pool_dirty = True

        # dispatch 1: mark invalid + gather former rows + find survivors
        # referencing a deleted slot; one D2H sync brings the (small)
        # former table and the affected bitmap back for bucketing
        dpad = (1 << int(np.ceil(np.log2(max(len(slots), 64))))) - len(slots)
        slots_b = np.pad(slots, (0, dpad), mode="edge")  # dup scatters idempotent
        slots_j = jnp.asarray(slots_b)
        self.store.valid, dmask, former, refs_dead = _delete_mark(
            self.store.valid, self.neighbors0, slots_j
        )
        former_np = np.asarray(former)
        aff = np.nonzero(np.asarray(refs_dead))[0].astype(np.int32)
        aff = aff[~np.isin(aff, slots)]

        # dispatch 2 (per affected-row bucket): drop dead edges + refill
        # from the former-neighborhood pool via the streaming flat kernel
        pool = np.unique(former_np)
        pool = pool[pool >= 0]
        pool = pool[~np.isin(pool, slots)]
        if len(aff) and len(pool):
            p_pad = (1 << int(np.ceil(np.log2(max(len(pool), 64))))) - len(pool)
            pool_b = np.pad(pool.astype(np.int32), (0, p_pad), constant_values=-1)
            pool_j = jnp.asarray(pool_b)
            kk = min(self.m0 + 1, len(pool_b))
            interp = jax.default_backend() != "tpu"
            qb = min(4096, 1 << int(np.ceil(np.log2(max(len(aff), 64)))))
            a_pad = (-len(aff)) % qb
            aff_b = np.pad(aff, (0, a_pad), mode="edge")
            for s0 in range(0, len(aff_b), qb):
                self.neighbors0, self.dists0 = _delete_repair_rows(
                    self.neighbors0, self.dists0, self.store.vectors,
                    jnp.asarray(aff_b[s0 : s0 + qb]), pool_j, dmask,
                    metric=self.metric, kk=kk, interp=interp,
                )

        # dispatch 3: clear deleted rows + scrub hi tables
        (
            self.neighbors0, self.dists0,
            self.hi_neighbors, self.hi_index,
        ) = _delete_finalize(
            self.neighbors0, self.dists0,
            self.hi_neighbors, self.hi_index, slots_j, dmask,
        )

        # entry point re-scan (src/hnsw_algo.c:790-802)
        if self.entry_point in set(int(s) for s in slots):
            self._rescan_entry_point()

    def _rescan_entry_point(self) -> None:
        valid = np.asarray(self.store.valid)
        live = np.nonzero(valid)[0]
        if len(live) == 0:
            self.entry_point = -1
            self.max_level = -1
            return
        lv = self.levels[live]
        best = int(np.argmax(lv))
        self.entry_point = int(live[best])
        self.max_level = int(lv[best])


@partial(jax.jit, static_argnames=("m0",))
def _drop_self_matches(
    dd: jax.Array,    # [b, m0+1] sorted distances
    ii: jax.Array,    # [b, m0+1] ids
    base: jax.Array,  # scalar: slot of row 0 (contiguous chunk)
    m0: int,
) -> tuple[jax.Array, jax.Array]:
    """Drop each row's self-match from its kNN list: stable-sort the
    self column to the back, keep the first m0."""
    b = ii.shape[0]
    self_id = base + jnp.arange(b, dtype=jnp.int32)[:, None]
    self_col = ii == self_id
    order = jnp.argsort(self_col, axis=1, stable=True)[:, :m0]
    return (
        jnp.take_along_axis(ii, order, axis=1),
        jnp.take_along_axis(dd, order, axis=1),
    )


@partial(jax.jit, static_argnames=("cap", "a_max"))
def _grouped_bounded_append(
    tgt_raw: jax.Array,  # [E] target slots (-1 = invalid edge)
    src: jax.Array,      # [E] source slots
    dd: jax.Array,       # [E] edge distances
    cap: int,
    a_max: int,
) -> tuple[jax.Array, jax.Array]:
    """Group edges by target and keep the first ``a_max`` per target via
    sort + run-rank + one flat 1D scatter (batched 2D scatters are
    pathologically slow on TPU).

    Invalid targets are masked to ``cap`` IN THE SORTED VALUES, not just
    the sort key: sorting by a masked key while keeping raw ``-1``
    values puts a non-monotone tail behind the sorted prefix, and
    ``searchsorted`` then mis-ranks the largest real targets (measured:
    90% of random cases with any padding — silently lost reverse edges
    in every padded wave)."""
    tgt = jnp.where(tgt_raw >= 0, tgt_raw, jnp.int32(cap))
    order = jnp.argsort(tgt, stable=True)
    tgt_s = tgt[order]
    src_s = src[order]
    dd_s = dd[order]
    first = jnp.searchsorted(tgt_s, tgt_s, side="left")
    pos = jnp.arange(tgt_s.shape[0], dtype=jnp.int32) - first.astype(jnp.int32)
    keep = (tgt_s < cap) & (pos < a_max)
    flat_idx = jnp.where(
        keep, tgt_s * a_max + jnp.minimum(pos, a_max - 1), cap * a_max
    )
    append_i = jnp.full((cap * a_max,), -1, jnp.int32).at[flat_idx].set(
        src_s, mode="drop"
    ).reshape(cap, a_max)
    append_d = jnp.full((cap * a_max,), jnp.inf, jnp.float32).at[flat_idx].set(
        dd_s, mode="drop"
    ).reshape(cap, a_max)
    return append_i, append_d


def _reverse_append(
    rows_i: jax.Array,   # [n, m0] forward kNN rows (device)
    rows_d: jax.Array,   # [n, m0]
    slots: jax.Array,    # [n] source slots
    cap: int,
    a_max: int,
) -> tuple[jax.Array, jax.Array]:
    """Build bounded reverse-append buffers for the bulk symmetrization:
    sort edges by target, take positions within each target group, flat
    1D scatter — all device-side (see ``_grouped_bounded_append``)."""
    m0 = rows_i.shape[1]
    return _grouped_bounded_append(
        rows_i.reshape(-1), jnp.repeat(slots, m0), rows_d.reshape(-1),
        cap, a_max,
    )


@partial(jax.jit, static_argnames=("m", "metric"))
def _upper_select(
    vectors: jax.Array,   # [cap, d]
    members: jax.Array,   # [P] wave slots at this level (-1 pad)
    pool: jax.Array,      # [Mp] all slots at this level (-1 pad)
    m: int,
    metric: Metric,
) -> jax.Array:
    """Exact closest-m of each member within the level pool (one MXU
    distance block, masked for padding and self-matches)."""
    mv = vectors[jnp.maximum(members, 0)]
    pv = vectors[jnp.maximum(pool, 0)]
    dd = pairwise_distances(mv, pv, metric)
    mask = (pool >= 0)[None, :] & (members[:, None] != pool[None, :])
    _, sel = masked_topk(dd, m, mask=mask, ids=jnp.broadcast_to(pool[None, :], dd.shape))
    return sel


@partial(jax.jit, static_argnames=("m", "metric"), donate_argnums=(0,))
def _hi_reverse_wire(
    hi_neighbors: jax.Array,  # [H, L, M]
    hi_index: jax.Array,      # [cap]
    vectors: jax.Array,       # [cap, d]
    o_arr: jax.Array,         # [E] row-owner slots (-1 pad)
    s_arr: jax.Array,         # [E] new neighbor slots (-1 pad)
    lvl: jax.Array,           # scalar int32 (level-1 row in the hi table)
    m: int,
    metric: Metric,
) -> jax.Array:
    """Upper-level reverse wiring on device: bounded appends grouped by
    row owner, then closest-M prune with distances recomputed from the
    owner's vector (upper levels don't store edge distances)."""
    h = hi_neighbors.shape[0]
    e = o_arr.shape[0]
    ho = jnp.where(o_arr >= 0, hi_index[jnp.maximum(o_arr, 0)], -1)
    valid = (ho >= 0) & (s_arr >= 0)

    # invalid entries are masked to h IN THE SORTED VALUES so ho_s stays
    # monotone — a raw -1 tail behind the sorted prefix breaks
    # searchsorted and mis-ranks the largest rows (same hazard as
    # _grouped_bounded_append's docstring)
    hom = jnp.where(valid, ho, jnp.int32(h))
    order = jnp.argsort(hom, stable=True)
    ho_s = hom[order]
    s_s = s_arr[order]
    o_s = o_arr[order]
    valid_s = valid[order]
    idx = jnp.arange(e)
    first = jnp.searchsorted(ho_s, ho_s, side="left")
    pos = idx - first
    a_max = m
    keep = valid_s & (pos < a_max)
    flat = jnp.where(keep, ho_s * a_max + jnp.minimum(pos, a_max - 1), h * a_max)
    appends = jnp.full((h * a_max,), -1, jnp.int32).at[flat].set(
        s_s, mode="drop"
    ).reshape(h, a_max)

    # invalid entries scatter to the OUT-OF-RANGE row h and are dropped:
    # routing them to a real row (e.g. 0) would put two different values
    # on one index whenever that row's owner also updates in this chunk,
    # and duplicate-index scatter order is nondeterministic
    ho_aff = jnp.where(valid_s, ho_s, h)
    ho_rd = jnp.minimum(ho_aff, h - 1)                     # clamped reads
    lvl_c = jnp.clip(lvl, 0, hi_neighbors.shape[1] - 1)
    rows = hi_neighbors[ho_rd, lvl_c]                      # [E, m]
    cand = jnp.concatenate([rows, appends[ho_rd]], axis=1)  # [E, 2m]
    ovec = vectors[jnp.maximum(o_s, 0)]                    # [E, d]
    cvec = vectors[jnp.maximum(cand, 0)]                   # [E, 2m, d]
    dd = gathered_distances(ovec, cvec, metric)
    dd = jnp.where(cand >= 0, dd, jnp.inf)
    _, new_rows = sorted_topk_unique(dd, cand, m)
    # duplicated VALID owners write identical pruned rows (the appends
    # table is per-owner, so their candidate sets agree) — idempotent
    return hi_neighbors.at[ho_aff, lvl_c].set(new_rows, mode="drop")


def _prune_rows_impl(neighbors0, dists0, append_i, append_d, aff, m_max,
                     mn_tiebreak: bool = False):
    """Merge appended reverse edges into affected rows and keep the
    closest M_max.

    With ``mn_tiebreak`` the prune is the MN-RU rule
    (src/hnsw_algo.c:593-646, arXiv:2407.07871): primary key distance
    ascending, secondary key mutual-neighbor count *descending* — among
    equidistant candidates, the ones sharing more neighbors with the
    row's candidate list are structurally redundant links worth keeping.
    The reference's O(nc^2 * M) pairwise set intersections become one
    per-row sorted-membership pass: mn[a, c] = |N(c) ∩ candlist(a)|
    via binary search of each candidate's neighbor row against the
    sorted candidate list (count_mutual_neighbors, :460-475).
    """
    rows_i = neighbors0[aff]                     # [A, m_max]
    rows_d = dists0[aff]
    app_i = append_i[aff]
    app_d = append_d[aff]
    cat_i = jnp.concatenate([rows_i, app_i], axis=1)
    cat_d = jnp.concatenate([rows_d, app_d], axis=1)
    if not mn_tiebreak:
        # self-loops shouldn't exist; dedup + sort + truncate
        new_d, new_i = sorted_topk_unique(cat_d, cat_i, m_max)
    else:
        a, c = cat_i.shape
        cand_rows = neighbors0[jnp.maximum(cat_i, 0)]        # [A, C, m0]
        # membership of each candidate's neighbors in the row's own
        # candidate list, as a broadcast compare reduced on the fly —
        # XLA fuses the virtual [A, C, m0, C] compare into the
        # reduction (a vmapped searchsorted here lowered to serial
        # gather loops and cost ~50x the rest of the prune)
        row_ok = (cat_i >= 0)[:, None, None, :]              # [A, 1, 1, C]
        member = (
            cand_rows[:, :, :, None] == cat_i[:, None, None, :]
        ) & row_ok & (cand_rows >= 0)[:, :, :, None]
        mn = member.any(-1).sum(-1).astype(jnp.int32)        # [A, C]
        mn = jnp.where(cat_i >= 0, mn, -1)
        # id-dedup with the mn payload carried through the sort
        order = jnp.lexsort((cat_d, cat_i), axis=-1)
        sd = jnp.take_along_axis(cat_d, order, axis=-1)
        si = jnp.take_along_axis(cat_i, order, axis=-1)
        smn = jnp.take_along_axis(mn, order, axis=-1)
        prev = jnp.concatenate(
            [jnp.full_like(si[:, :1], -2), si[:, :-1]], axis=-1
        )
        dup = (si == prev) & (si >= 0)
        sd = jnp.where(dup, jnp.inf, sd)
        si = jnp.where(dup, -1, si)
        smn = jnp.where(dup, -1, smn)
        # final order: (distance asc, mutual-neighbor count desc)
        order2 = jnp.lexsort((-smn, sd), axis=-1)
        new_d = jnp.take_along_axis(sd, order2, axis=-1)[:, :m_max]
        new_i = jnp.take_along_axis(si, order2, axis=-1)[:, :m_max]
    new_d = jnp.where(new_i >= 0, new_d, jnp.inf)
    neighbors0 = neighbors0.at[aff].set(new_i)
    dists0 = dists0.at[aff].set(new_d)
    return neighbors0, dists0


_prune_rows = partial(
    jax.jit, static_argnames=("m_max", "mn_tiebreak"), donate_argnums=(0, 1)
)(_prune_rows_impl)


@partial(
    jax.jit,
    static_argnames=("metric", "ef", "expand", "r", "m0", "mn", "exact",
                     "precision", "interp"),
    donate_argnums=(0, 1, 2, 3),
)
def _insert_wave_fused(
    vectors: jax.Array,      # [cap, d]   pre-wave vectors (donated)
    valid: jax.Array,        # [cap]      pre-wave validity (donated)
    neighbors0: jax.Array,   # [cap, m0]  (donated)
    dists0: jax.Array,       # [cap, m0]  (donated)
    pool: jax.Array,         # [Mp]       pre-wave promoted slots, -1 pad
    qv: jax.Array,           # [W, d]     new vectors, zero-padded to W
    base: jax.Array,         # scalar     first assigned slot
    n_new: jax.Array,        # scalar     live rows in the wave
    *,
    metric: Metric,
    ef: int,
    expand: int,
    r: int,
    m0: int,
    mn: bool,
    exact: bool = False,
    precision: str = "default",
    interp: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One full insertion wave as a single XLA program: write vectors,
    find candidates over the pre-wave graph, mask soft-deleted
    candidates, merge intra-wave candidates, select the closest M_max0,
    forward-wire, reverse-wire with bounded appends, and MN-RU-prune
    over-full rows (the batched analogue of src/hnsw_algo.c:520-663,
    fused because each separate dispatch costs ~0.2-0.4 s through this
    environment's TPU tunnel).

    ``exact=True`` (the default engine mode, round-4 VERDICT task #3):
    candidates come from ONE streaming exact top-``m0`` over the valid
    pre-wave corpus — the engine's primary flat kernel, the same move
    the bulk build makes. At 100k x 384 the exact sweep is ~11 ms for
    a 2048-row wave where the ef_construction=200 beam loop ran ~66
    gather-bound iterations (measured 12x slower end-to-end), and the
    candidates are exact, so construction quality can only improve vs
    the beam (the reference's beam exists because sequential CPU
    insertion cannot afford brute force, src/hnsw_algo.c:347-448).
    ``exact=False`` keeps the beam path (the only mode where corpus
    scale ever makes the flat sweep the slower option)."""
    from muninn_tpu.ops.pallas_flat import flat_topk

    cap, d = vectors.shape
    w = qv.shape[0]
    pos = jnp.arange(w, dtype=jnp.int32)
    live = pos < n_new
    slots = base + pos

    # pre-write validity: the candidate corpus is exactly the pre-wave
    # live rows (wave rows join the graph this dispatch; soft-deleted
    # rows are routed through but never selected, src/hnsw_algo.c:408)
    pre_valid = valid

    # 0. write the wave (slots are a fresh contiguous block — the new
    # rows are unwired and absent from the routing pool, so the search
    # below still sees exactly the pre-wave graph)
    vectors = jax.lax.dynamic_update_slice(vectors, qv, (base, 0))
    valid = jax.lax.dynamic_update_slice(valid, live, (base,))

    if exact:
        # 1. exact candidates: one streaming flat top-m0 (masked rows
        # return (inf, -1) and the write above is masked out via the
        # pre-write validity, so no self/wave matches can appear)
        beam_d, beam_i = flat_topk(
            qv, vectors, m0, metric=metric, corpus_valid=pre_valid,
            precision=precision, interpret=interp,
        )
    else:
        # 1. beam search at ef_construction
        entries = _route_entries(qv, vectors, pool, metric, r)
        beam_d, beam_i = _beam_search_level0(
            qv, entries, vectors, neighbors0, metric, ef, expand
        )
        # beams route *through* soft-deleted nodes but must never
        # select them as neighbors; wave rows cannot appear in beams,
        # so the post-write validity mask is equivalent here
        ok = (beam_i >= 0) & valid[jnp.maximum(beam_i, 0)]
        beam_d = jnp.where(ok, beam_d, jnp.inf)
        beam_i = jnp.where(ok, beam_i, -1)

    # 2. intra-wave candidates: W x W distances so wave members can link
    # to each other (the sequential reference gets this for free)
    intra = pairwise_distances(qv, qv, metric)
    imask = live[None, :] & live[:, None] & ~jnp.eye(w, dtype=bool)
    kk = min(m0, max(w - 1, 1))
    id_, ii = masked_topk(
        intra, kk, mask=imask,
        ids=jnp.broadcast_to(slots[None, :], (w, w)),
    )
    beam_d, beam_i = merge_topk(beam_d, beam_i, id_, ii)

    # 3. closest-M_max0 selection (src/hnsw_algo.c:497-516)
    sel_d, sel_i = sorted_topk_unique(beam_d, beam_i, m0)
    sel_i = jnp.where(live[:, None], sel_i, -1)
    sel_d = jnp.where(sel_i >= 0, sel_d, jnp.inf)

    # 4. forward wiring (padding rows scatter-dropped)
    row_idx = jnp.where(live, slots, cap)
    neighbors0 = neighbors0.at[row_idx].set(sel_i, mode="drop")
    dists0 = dists0.at[row_idx].set(sel_d, mode="drop")

    # 5. reverse wiring: group new->nbr edges by target via sort,
    # bounded appends via flat 1D scatter (batched 2D scatters are
    # pathologically slow on TPU), then prune affected rows
    tgt = sel_i.reshape(-1)
    valid_e = tgt >= 0
    append_i, append_d = _grouped_bounded_append(
        tgt, jnp.repeat(slots, m0), sel_d.reshape(-1), cap, m0
    )
    # affected rows: all targets, duplicates included — the prune is a
    # deterministic function of pre-update row content, so duplicate
    # writes are idempotent; invalid edges fall back to the smallest
    # valid target (row 0 when the wave wired nothing)
    fallback = jnp.minimum(
        jnp.min(jnp.where(valid_e, tgt, jnp.int32(cap))), cap - 1
    )
    aff = jnp.maximum(jnp.where(valid_e, tgt, fallback), 0)
    neighbors0, dists0 = _prune_rows_impl(
        neighbors0, dists0, append_i, append_d, aff, m0, mn_tiebreak=mn
    )
    return vectors, valid, neighbors0, dists0


@partial(jax.jit, donate_argnums=(0,))
def _delete_mark(
    valid: jax.Array,        # [cap] (donated)
    neighbors0: jax.Array,   # [cap, m0]
    dslots: jax.Array,       # [Dp] deleted slots (edge-padded)
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Delete dispatch 1: invalidate slots, gather former neighborhoods
    (the repair candidate pool), and flag every row referencing a
    deleted slot."""
    valid = valid.at[dslots].set(False)
    dmask = jnp.zeros((neighbors0.shape[0],), bool).at[dslots].set(True)
    former = neighbors0[dslots]
    refs_dead = jnp.any(
        (neighbors0 >= 0) & dmask[jnp.maximum(neighbors0, 0)], axis=1
    )
    return valid, dmask, former, refs_dead


@partial(
    jax.jit, static_argnames=("metric", "kk", "interp"), donate_argnums=(0, 1)
)
def _delete_repair_rows(
    neighbors0: jax.Array,   # (donated)
    dists0: jax.Array,       # (donated)
    vectors: jax.Array,
    aff: jax.Array,          # [A] affected rows (edge-padded)
    pool: jax.Array,         # [Pp] repair candidates, -1 pad
    dmask: jax.Array,        # [cap] deleted mask
    *,
    metric: Metric,
    kk: int,
    interp: bool,
) -> tuple[jax.Array, jax.Array]:
    """Delete dispatch 2: drop edges to deleted nodes from the affected
    rows and refill closest-first from the former-neighborhood pool via
    the streaming flat kernel (the batched analogue of the reference's
    IP-DiskANN-style reconnection, src/hnsw_algo.c:706-787)."""
    from muninn_tpu.ops.pallas_flat import flat_topk

    rows_i = neighbors0[aff]
    rows_d = dists0[aff]
    dead = (rows_i >= 0) & dmask[jnp.maximum(rows_i, 0)]
    rows_i = jnp.where(dead, -1, rows_i)
    rows_d = jnp.where(dead, jnp.inf, rows_d)

    pv = vectors[jnp.maximum(pool, 0)]
    av = vectors[aff]
    cd, ci = flat_topk(
        av, pv, kk, metric=metric, corpus_valid=pool >= 0, interpret=interp
    )
    cand = jnp.where(ci >= 0, pool[jnp.maximum(ci, 0)], -1)
    self_m = cand == aff[:, None]
    cd = jnp.where(self_m, jnp.inf, cd)
    cand = jnp.where(self_m, -1, cand)
    rd, ri = merge_topk(rows_d, rows_i, cd, cand)
    neighbors0 = neighbors0.at[aff].set(ri)
    dists0 = dists0.at[aff].set(rd)
    return neighbors0, dists0


@partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _delete_finalize(
    neighbors0: jax.Array,
    dists0: jax.Array,
    hi_neighbors: jax.Array,
    hi_index: jax.Array,
    dslots: jax.Array,
    dmask: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Delete dispatch 3: clear the deleted rows and scrub deleted slots
    from surviving upper-level rows so routing never lands on a
    tombstone."""
    neighbors0 = neighbors0.at[dslots].set(-1)
    dists0 = dists0.at[dslots].set(jnp.inf)
    dead_hi = (hi_neighbors >= 0) & dmask[jnp.maximum(hi_neighbors, 0)]
    hi_neighbors = jnp.where(dead_hi, -1, hi_neighbors)
    hi_index = hi_index.at[dslots].set(-1)
    return neighbors0, dists0, hi_neighbors, hi_index
