"""TPU-native IVF-flat index: balanced fixed-size clusters probed as
contiguous DMA blocks.

Why this engine exists (there is no IVF in the reference — this is a
TPU-first addition beyond parity): at large N the exact flat path is
MXU-compute-bound (1M x 768 x 8192 queries = 12.6 TFLOP/batch), and the
HNSW beam is DMA-*transaction*-bound (its packed neighborhoods are
24 KB — measured ~260 ns per block copy regardless of block bytes, so
quarter-width int8 blocks buy nothing). IVF attacks both walls at once:

- each query scores only ``nprobe``/``nlist`` of the corpus — the
  MXU/VPU work drops ~two orders of magnitude vs exact;
- candidates are fetched as whole *clusters* laid out contiguously as
  ``[nlist, S, d]`` blocks (S=128 x 768-d bf16 = 196 KB per copy), far
  past the per-transaction floor that caps the HNSW beam's 24 KB
  neighborhood fetches — the same ``gather_block_dots`` Pallas kernel
  runs at streaming bandwidth here;
- a final exact-f32 rescore of the surviving top-r keeps returned
  distances exact (the same two-tier contract as
  ``FlatIndex(precision="int8_rescored")``).

Clusters are *balanced* to exactly ``S`` slots: classic IVF lists are
ragged (cluster-size skew follows the data), which on TPU would mean
dynamic shapes or worst-case padding. Training runs device-side Lloyd
iterations (chunked MXU distance matmuls + one-hot matmul updates — no
scatters), then a vectorized host pass assigns each row to its nearest
cluster *with free capacity* (nearest-first greedy over the top-C
candidates, eviction-free). Routing quality loss vs unbalanced kmeans
is absorbed by probing ``nprobe`` clusters and the exact rescore.

Reference roles mirrored: the public surface matches the other index
kinds (``insert``/``delete``/``search`` with external int64 ids,
``src/hnsw_vtab.c:366-367`` semantics); incremental inserts go to
clusters with free slots, spilling to an exactly-scanned pending
region (merged per query) until ``rebuild()`` — the same
"bulk build + incremental churn" split as the HNSW engine.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from muninn_tpu.index.store import VectorStore
from muninn_tpu.ops.distance import (
    Metric,
    gathered_distances,
    pairwise_distances,
    parse_metric,
    quantize_rows_int8,
)
from muninn_tpu.ops.pallas_beam import gather_block_dots
from muninn_tpu.ops.pallas_flat import flat_topk
from muninn_tpu.ops.topk import masked_topk, sorted_topk_unique

_INF = np.float32(np.inf)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# ───────────────────────── device kmeans ─────────────────────────


@partial(jax.jit, static_argnames=("iters", "ncl", "chunk", "metric"))
def _kmeans(
    v: jax.Array,        # [Npad, d] f32 (zero rows where invalid)
    valid: jax.Array,    # [Npad] bool
    key: jax.Array,
    iters: int,
    ncl: int,
    chunk: int,
    metric: Metric,
) -> jax.Array:
    """Lloyd's kmeans, fully on device: per iteration one lax.scan over
    row chunks doing an MXU distance matmul + argmin assignment and a
    one-hot matmul centroid update (scatter-free). Empty clusters keep
    their previous centroid. Returns centroids [ncl, d] f32.

    (Round 4 investigated starved-centroid relocation — kmeans++-style
    D^2 jumps for natural clusters that seeding misses. Measured a
    non-fix: on data where routing recall collapses, even ORACLE
    centroids at the true cluster centers recall only ~0.35 — the
    collapse is a DATA property (true neighbors live in the
    directional tail, not the local cluster), not a clustering defect.
    See DEVELOPMENT.md "IVF data-regime bounds".)"""
    npad, d = v.shape
    nch = npad // chunk
    iota = jnp.arange(ncl, dtype=jnp.int32)

    # init: ncl distinct live rows via Gumbel top-k over the valid mask
    g = jax.random.gumbel(key, (npad,))
    scores = jnp.where(valid, g, -jnp.inf)
    _, seed_idx = jax.lax.top_k(scores, ncl)
    cent0 = v[seed_idx].astype(jnp.float32)  # carry stays f32 (bf16 stores)

    vc_all = v.reshape(nch, chunk, d)
    va_all = valid.reshape(nch, chunk)

    def one_iter(cent, _):
        def chunk_step(carry, xs):
            sums, counts = carry
            vc, va = xs
            dd = pairwise_distances(vc, cent, metric)          # [chunk, ncl]
            am = jnp.argmin(dd, axis=1).astype(jnp.int32)
            oh = ((am[:, None] == iota[None, :]) & va[:, None])
            # one-hot matmul update: [ncl, chunk] @ [chunk, d] on MXU
            sums = sums + jax.lax.dot(
                oh.astype(jnp.bfloat16).T, vc.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            counts = counts + jnp.sum(oh, axis=0).astype(jnp.float32)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            chunk_step,
            (jnp.zeros((ncl, d), jnp.float32), jnp.zeros((ncl,), jnp.float32)),
            (vc_all, va_all),
        )
        newc = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, newc, cent), None

    cent, _ = jax.lax.scan(one_iter, cent0, None, length=iters)
    return cent


@partial(jax.jit, static_argnames=("c", "chunk", "metric"))
def _topc_centroids(
    v: jax.Array,       # [Npad, d]
    cent: jax.Array,    # [ncl, d]
    c: int,
    chunk: int,
    metric: Metric,
) -> tuple[jax.Array, jax.Array]:
    """Top-c nearest centroids per row (chunked): [Npad, c] dists+ids."""
    npad, d = v.shape
    nch = npad // chunk

    def step(_, vc):
        dd = pairwise_distances(vc, cent, metric)
        neg, idx = jax.lax.top_k(-dd, c)
        return None, (-neg, idx.astype(jnp.int32))

    _, (dists, ids) = jax.lax.scan(step, None, v.reshape(nch, chunk, d))
    return dists.reshape(npad, c), ids.reshape(npad, c)


def _balanced_assign(
    top_cl: np.ndarray,   # [N, C] nearest-first candidate clusters
    top_d: np.ndarray,    # [N, C]
    fill: np.ndarray,     # [ncl] pre-existing occupancy (mutated)
    s: int,
) -> np.ndarray:
    """Capacity-constrained greedy assignment (vectorized): round c
    tries each row's c-th nearest cluster; within a cluster the closest
    rows win the free slots (lexsort ranking). Rows still unplaced
    after C rounds go to any cluster with space; returns -1 for rows
    that fit nowhere (caller sends them to the pending region)."""
    n, c_max = top_cl.shape
    ncl = fill.shape[0]
    assigned = np.full(n, -1, np.int64)
    for c in range(c_max):
        todo = np.flatnonzero(assigned < 0)
        if todo.size == 0:
            break
        cl = top_cl[todo, c].astype(np.int64)
        d = top_d[todo, c]
        order = np.lexsort((d, cl))                    # by cluster, then d
        cl_s = cl[order]
        # rank within each cluster run
        boundaries = np.flatnonzero(np.r_[True, cl_s[1:] != cl_s[:-1]])
        run_start = np.repeat(boundaries, np.diff(np.r_[boundaries, cl_s.size]))
        rank = np.arange(cl_s.size) - run_start
        ok = rank < (s - fill[cl_s])
        take = order[ok]
        assigned[todo[take]] = cl[take]
        fill += np.bincount(cl[take], minlength=ncl).astype(fill.dtype)
    todo = np.flatnonzero(assigned < 0)
    if todo.size:
        space = (s - fill).clip(min=0)
        free_slots = np.repeat(np.arange(ncl), space)
        m = min(todo.size, free_slots.size)
        assigned[todo[:m]] = free_slots[:m]
        fill += np.bincount(
            assigned[todo[:m]], minlength=ncl
        ).astype(fill.dtype)
    return assigned


@jax.jit
def _pack_blocks(vectors: jax.Array, flat_slots: jax.Array) -> jax.Array:
    """Gather + bf16-cast + pad-zero the cluster member rows in chunks
    (lax.scan) so the f32 gather intermediate stays ~400 MB instead of
    materializing all ``nlist*S`` rows at once (3.7 GB at 1M x 768 —
    eager assembly OOMed the 16 GB chip)."""
    m = flat_slots.shape[0]
    chunk = min(m, 131_072)
    nch = m // chunk  # caller pads m to a chunk multiple

    def step(_, sl):
        rows = vectors[jnp.maximum(sl, 0)].astype(jnp.bfloat16)
        return None, jnp.where((sl >= 0)[:, None], rows, 0)

    _, out = jax.lax.scan(step, None, flat_slots.reshape(nch, chunk))
    return out.reshape(m, vectors.shape[1])


@jax.jit
def _pack_blocks_int8(
    vectors: jax.Array, flat_slots: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Gather + per-row int8 quantize in ONE chunked scan: the int8
    blocks are emitted DIRECTLY from the pack (round-4 VERDICT #2) —
    the old pack-bf16-then-quantize route materialized the full bf16
    block store as an intermediate (7.4 GB at 4M x 768), which is
    exactly what pushed the 4M tier over HBM. Per-chunk transients
    stay ~400 MB. Returns (int8 rows [m, d], f32 scales [m])."""
    m = flat_slots.shape[0]
    chunk = min(m, 131_072)
    nch = m // chunk  # caller pads m to a chunk multiple

    def step(_, sl):
        rows = vectors[jnp.maximum(sl, 0)]
        qv, sc = quantize_rows_int8(rows)
        ok = sl >= 0
        return None, (
            jnp.where(ok[:, None], qv, 0),
            jnp.where(ok, sc, 0.0),
        )

    _, (q, sc) = jax.lax.scan(step, None, flat_slots.reshape(nch, chunk))
    return q.reshape(m, vectors.shape[1]), sc.reshape(m)


@jax.jit
def _block_means_int8(
    blocks: jax.Array,        # [ncl, S, d] int8
    scales: jax.Array,        # [ncl, S] f32
    member_slots: jax.Array,  # [ncl, S]
    fallback: jax.Array,      # [ncl, d] f32
) -> jax.Array:
    """``_block_means`` for direct-int8 blocks: dequantize per cluster
    chunk inside a scan (whole-array dequant would be the multi-GB f32
    transient the direct pack exists to avoid)."""
    ncl, s, d = blocks.shape
    chunk = max(1, min(ncl, 1024))
    pad = (-ncl) % chunk
    if pad:
        blocks = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0)))
        scales = jnp.pad(scales, ((0, pad), (0, 0)))
        member_slots = jnp.pad(
            member_slots, ((0, pad), (0, 0)), constant_values=-1
        )
    nch = blocks.shape[0] // chunk

    def step(_, xs):
        blk, sc, ms = xs
        mask = ms >= 0
        w = jnp.where(mask, sc, 0.0)                      # fold dequant
        sums = jnp.einsum(
            "nsd,ns->nd", blk.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        cnt = jnp.sum(mask, axis=1).astype(jnp.float32)[:, None]
        return None, (sums, cnt)

    _, (sums, cnt) = jax.lax.scan(
        step, None,
        (blocks.reshape(nch, chunk, s, d),
         scales.reshape(nch, chunk, s),
         member_slots.reshape(nch, chunk, s)),
    )
    sums = sums.reshape(nch * chunk, d)[:ncl]
    cnt = cnt.reshape(nch * chunk, 1)[:ncl]
    return jnp.where(cnt > 0, sums / jnp.maximum(cnt, 1.0), fallback)


@jax.jit
def _quantize_blocks(blocks: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-row int8 quantization of packed [ncl, S, d] blocks:
    returns (int8 blocks, f32 scales [ncl, S]). Quarter the probe DMA
    traffic of bf16 — the binding cost at the bandwidth-bound nprobe
    operating points — with ranking error absorbed by the exact f32
    rescore tier. Chunked over clusters so the f32 intermediate stays
    ~400 MB (a whole-array cast is a 3.7 GB transient at 1M x 768)."""
    ncl, s, d = blocks.shape
    chunk = max(1, min(ncl, 1024))
    pad = (-ncl) % chunk
    bp = jnp.pad(blocks, ((0, pad), (0, 0), (0, 0))) if pad else blocks
    nch = bp.shape[0] // chunk

    def step(_, blk):
        qv, sc = quantize_rows_int8(blk)
        return None, (qv, sc)

    _, (q, sc) = jax.lax.scan(
        step, None, bp.reshape(nch, chunk, s, d)
    )
    return (
        q.reshape(nch * chunk, s, d)[:ncl],
        sc.reshape(nch * chunk, s)[:ncl],
    )


@jax.jit
def _block_means(blocks: jax.Array, member_slots: jax.Array,
                 fallback: jax.Array) -> jax.Array:
    """Mean of each block's live member rows (f32), keeping the
    training centroid for empty blocks. One bf16 contraction — no f32
    materialization of the 1.8 GB block store."""
    mask = (member_slots >= 0)
    sums = jnp.einsum(
        "nsd,ns->nd", blocks, mask.astype(blocks.dtype),
        preferred_element_type=jnp.float32,
    )
    cnt = jnp.sum(mask, axis=1).astype(jnp.float32)[:, None]
    return jnp.where(cnt > 0, sums / jnp.maximum(cnt, 1.0), fallback)


def _ranks_within(assigned: np.ndarray, base: np.ndarray) -> np.ndarray:
    """Position of each row within its assigned cluster, offset by the
    cluster's pre-existing occupancy ``base`` (stable in input order)."""
    n = assigned.shape[0]
    order = np.lexsort((np.arange(n), assigned))
    cl_s = assigned[order]
    boundaries = np.flatnonzero(np.r_[True, cl_s[1:] != cl_s[:-1]])
    run_start = np.repeat(boundaries, np.diff(np.r_[boundaries, n]))
    rank = np.arange(n) - run_start
    out = np.empty(n, np.int64)
    out[order] = rank + base[cl_s]
    return out


# ───────────────────────── fused query path ─────────────────────────


@partial(
    jax.jit,
    static_argnames=("metric", "k", "p", "r", "fused", "interpret"),
)
def _ivf_search(
    q: jax.Array,             # [B, d] f32
    centroids: jax.Array,     # [ncl, d] f32
    blocks: jax.Array,        # [ncl, S, d] bf16 / int8
    member_slots: jax.Array,  # [ncl, S] int32 store slots, -1 pad
    vectors: jax.Array,       # [cap, d] f32 store (exact rescore)
    valid: jax.Array,         # [cap] bool
    metric: Metric,
    k: int,
    p: int,
    r: int,
    fused: bool,
    interpret: bool = False,
    scales: jax.Array | None = None,  # [ncl, S] f32 (int8 blocks)
) -> tuple[jax.Array, jax.Array]:
    """One XLA program: centroid routing -> block scoring (Pallas DMA
    kernel on TPU) -> top-r -> exact f32 rescore -> top-k. int8 blocks
    dequantize in the epilogue (dots *= scale, norms *= scale^2)."""
    b, d = q.shape
    _, s, _ = blocks.shape     # blocks may carry padded phantom rows
    ncl = centroids.shape[0]   # routing space = the REAL clusters
    qf = q.astype(jnp.float32)

    # 1) probe selection: exact top-p clusters by centroid distance
    if fused:
        _, probe = flat_topk(
            qf, centroids, p, metric=metric, precision="default",
            interpret=interpret,
        )
    else:
        dd = pairwise_distances(qf, centroids, metric)
        _, probe = masked_topk(
            dd, p,
            ids=jnp.broadcast_to(
                jnp.arange(ncl, dtype=jnp.int32)[None, :], dd.shape
            ),
        )
    probe = jnp.maximum(probe, 0)

    # 2) score all members of the probed clusters
    mslots = member_slots[probe].reshape(b, p * s)
    if fused:
        dots, cn2 = gather_block_dots(qf, probe, blocks, interpret=interpret)
        if scales is not None:
            ps = scales[probe].reshape(b, p * s)
            dots = dots * ps
            cn2 = cn2 * ps * ps
        if metric is Metric.INNER_PRODUCT:
            dist = -dots
        elif metric is Metric.L2:
            qn2 = jnp.sum(qf * qf, axis=1)[:, None]
            dist = jnp.maximum(qn2 + cn2 - 2.0 * dots, 0.0)
        else:
            qn = jnp.sqrt(jnp.sum(qf * qf, axis=1))[:, None]
            denom = qn * jnp.sqrt(cn2)
            sim = jnp.where(denom < 1e-30, 0.0, dots / jnp.maximum(denom, 1e-30))
            dist = 1.0 - sim
    else:
        mv = blocks[probe].reshape(b, p * s, d)
        if scales is not None:
            mv = mv.astype(jnp.float32) * (
                scales[probe].reshape(b, p * s)[:, :, None]
            )
        dist = gathered_distances(qf, mv, metric)
    ok = (mslots >= 0) & valid[jnp.maximum(mslots, 0)]
    dist = jnp.where(ok, dist, _INF)

    # 3) top-r guidance candidates (clusters are disjoint: no dup slots)
    neg, pos = jax.lax.top_k(-dist, r)
    cand = jnp.take_along_axis(mslots, pos, axis=1)
    cand = jnp.where(jnp.isinf(-neg), -1, cand)

    # 4) exact f32 rescore decides the final ranking
    cv = vectors[jnp.maximum(cand, 0)]
    dr = gathered_distances(qf, cv, metric)
    dr = jnp.where(cand >= 0, dr, _INF)
    return sorted_topk_unique(dr, cand, k)


# ───────────────────────── index class ─────────────────────────


class IvfIndex:
    """Balanced IVF-flat ANN index (TPU-native; no reference analogue —
    see module docstring).

    Parameters:
      cluster_size: rows per cluster block (S). 128 x 768-d bf16 =
        196 KB per probe DMA — large enough to stream.
      nprobe: clusters scored per query (the recall/speed knob; the
        ``ef_search`` analogue, overridable per search call).
      rescore_r: guidance candidates exactly rescored in f32.
      slack: extra cluster capacity factor at build (free slots absorb
        balance distortion + later incremental inserts).
      assign_rounds: balanced assignment passes at build; round 2+ is
        a balanced-Lloyd step against the refit block means (measured
        at 1M x 768: recall@10 0.87 -> 0.95+ at nprobe=4 vs one
        C=4 round).
      quant: block storage precision, "bf16" (default) or "int8"
        (per-row symmetric scales; halves block HBM vs bf16, ranking
        error absorbed by the exact f32 rescore). Measured a MEMORY
        lever only: probe QPS is identical to bf16 at every nprobe —
        the probe step is DMA-transaction/compute-bound, not
        byte-bound (DEVELOPMENT.md "IVF engine facts").
    """

    def __init__(
        self,
        dim: int,
        metric: Metric | str = Metric.COSINE,
        *,
        cluster_size: int = 128,
        nprobe: int = 8,
        rescore_r: int = 32,
        slack: float = 1.2,
        kmeans_iters: int = 10,
        assign_rounds: int = 2,
        train_sample: int = 262_144,
        seed: int = 0,
        capacity: int = 1024,
        quant: str = "bf16",
        store_dtype=jnp.float32,
    ):
        """``store_dtype=jnp.bfloat16`` halves the vector store (the
        exact-rescore source): at multi-million-row scale the f32 store
        is the HBM wall (4M x 384 f32 = 6.15 GB), and rescoring against
        bf16-stored rows costs ~nothing on recall (the candidates'
        RELATIVE order is what the rescore fixes; bf16 keeps ~3 decimal
        digits, far tighter than the int8/bf16 block ranking it
        corrects). Distance outputs stay f32."""
        self.metric = parse_metric(metric)
        self.store = VectorStore(dim, capacity, dtype=store_dtype)
        self.cluster_size = int(cluster_size)
        self.nprobe = int(nprobe)
        self.rescore_r = int(rescore_r)
        self.slack = float(slack)
        self.kmeans_iters = int(kmeans_iters)
        self.assign_rounds = int(assign_rounds)
        self.train_sample = int(train_sample)
        self.seed = int(seed)
        if quant not in ("bf16", "int8"):
            raise ValueError(f"unknown quant {quant!r}")
        self.quant = quant
        self.use_pallas = jax.default_backend() == "tpu"
        # built state (None until first bulk insert / rebuild)
        self.centroids: jax.Array | None = None   # [ncl, d] f32
        self.blocks: jax.Array | None = None      # [ncl, S, d] bf16/int8
        self.block_scales: jax.Array | None = None  # [ncl, S] f32 (int8)
        self.member_slots: jax.Array | None = None  # [ncl, S] int32
        self._fill: np.ndarray | None = None      # [ncl] host occupancy
        self._pending: list[np.ndarray] = []      # slots awaiting a cluster
        self._pending_count = 0

    # ── basic surface ──

    @property
    def dim(self) -> int:
        return self.store.dim

    @property
    def nlist(self) -> int:
        return 0 if self.centroids is None else self.centroids.shape[0]

    def __len__(self) -> int:
        return len(self.store)

    def seed_rng(self, seed: int) -> None:
        """Reference parity: reseed build-time randomness
        (``hnsw_seed_rng``, ``src/hnsw_algo.c:222-224``)."""
        self.seed = int(seed)

    # ── build ──

    def _fused_ok(self) -> bool:
        s = self.cluster_size
        sub = 32 if self.quant == "int8" else 16  # dtype sublanes
        return (
            self.use_pallas
            and self.dim % 128 == 0
            and s % sub == 0
        )

    def load_rows(self, ids, vectors) -> np.ndarray:
        """Append rows WITHOUT the auto bulk-build trigger of
        ``insert`` — for callers that train centroids externally (e.g.
        ``parallel.build_ivf_sharded``'s data-parallel kmeans) and then
        call ``rebuild(centroids=...)``. Rows are searchable (exact
        pending scan) until that rebuild."""
        ids = np.asarray(ids, np.int64)
        slots = self.store.add(ids, vectors)
        self._pending.append(slots.astype(np.int32))
        self._pending_count += slots.size
        return slots

    def rebuild(self, *, nlist: int | None = None,
                centroids: jax.Array | None = None) -> None:
        """(Re)train centroids on all live rows and repack every live
        row (including pending and soft-deleted holes) into balanced
        cluster blocks. Bulk path: device kmeans + host balanced
        assignment + one device row-scatter.

        ``centroids``: externally-trained [ncl, d] f32 centroids (e.g.
        the data-parallel sharded kmeans) — skips the local training
        step; balanced assignment + block packing + refit run as
        usual, so the final centroids are still the actual block
        means."""
        hw = self.store.high_watermark
        live = np.flatnonzero(np.asarray(self.store.valid[:hw]))
        n = live.shape[0]
        if n == 0:
            self.centroids = None
            self.blocks = None
            self.block_scales = None
            self.member_slots = None
            self._fill = None
            self._pending = []
            self._pending_count = 0
            return
        s = self.cluster_size
        if centroids is not None:
            ncl = int(centroids.shape[0])
            if nlist is not None and nlist != ncl:
                raise ValueError(
                    f"nlist={nlist} conflicts with centroids.shape[0]={ncl}"
                )
            if ncl * s < n:
                raise ValueError(
                    f"{ncl} externally-trained clusters x {s} slots cannot "
                    f"hold {n} live rows"
                )
        else:
            ncl = nlist or max(int(np.ceil(n * self.slack / s)), 1)
        # chunk = the store's pad multiple: capacity is always a chunk
        # multiple, so the full-capacity arrays scan WITHOUT padding
        # copies (a jnp.pad of the 3 GB store was a transient 2x)
        chunk = min(self.store.pad_multiple, self.store.capacity)
        v = self.store.vectors
        valid = self.store.valid

        # 1) centroids (sampled Lloyd on device; or supplied pre-trained)
        if centroids is not None:
            cent = jnp.asarray(centroids, jnp.float32)
        else:
            key = jax.random.PRNGKey(self.seed)
            if n > self.train_sample:
                # uniform live sample via gumbel top-k, done device-side
                g = jax.random.gumbel(jax.random.fold_in(key, 1), (v.shape[0],))
                _, samp = jax.lax.top_k(
                    jnp.where(valid, g, -jnp.inf), self.train_sample
                )
                tv = v[samp]
                tvalid = jnp.ones((self.train_sample,), bool)
                tpad = _round_up(self.train_sample, chunk)
                if tpad != self.train_sample:
                    tv = jnp.pad(tv, ((0, tpad - self.train_sample), (0, 0)))
                    tvalid = jnp.pad(tvalid, (0, tpad - self.train_sample))
            else:
                tv, tvalid = v, valid
            cent = _kmeans(
                tv, tvalid, key, self.kmeans_iters, ncl, chunk, self.metric
            )
            del tv, tvalid

        # 2-5) balanced assignment rounds. Each round: top-C candidate
        # clusters per row -> capacity-constrained host assignment ->
        # device block packing -> centroid refit to the ACTUAL block
        # means. C sets how far a row may be displaced when its nearest
        # clusters are full: with C=4 the overflow fallback scattered
        # ~12% of rows into RANDOM clusters the router can never reach
        # (measured recall plateau 0.87-0.88 at 1M x 768 regardless of
        # nprobe — routing-oracle == recall, rescore lossless). C=16
        # keeps displaced rows in nearby, probe-reachable clusters, and
        # the refit makes the router rank what a probe will really
        # score; the second round re-balances against the refit means
        # (one balanced-Lloyd step over the full corpus).
        c = min(16, ncl)
        m = ncl * s
        # pack grid: chunk must be a multiple of s (cluster boundaries
        # stay block-aligned); blocks KEEP the padded row count — a
        # [:m] slice would copy the whole multi-GB block array (the
        # 4M x 768 OOM), and phantom clusters (member_slots -1, never
        # probed: routing runs on the REAL centroids only) cost <100 MB
        pc = max(s, (131_072 // s) * s)
        mpad = _round_up(m, pc) if m >= pc else m
        ncl_pad = mpad // s
        self.blocks = None  # drop the old build before packing the new
        blocks = member_slots = None
        for _ in range(max(self.assign_rounds, 1)):
            td, tc = _topc_centroids(v, cent, c, chunk, self.metric)
            td, tc = np.asarray(td)[live], np.asarray(tc)[live]

            fill = np.zeros(ncl, np.int64)
            assigned = _balanced_assign(tc, td, fill, s)
            placed = assigned >= 0  # ncl*s >= n by construction
            pos = np.full(n, -1, np.int64)
            pos[placed] = (
                assigned[placed] * s
                + _ranks_within(assigned[placed], np.zeros(ncl, np.int64))
            )

            # pack blocks device-side: chunked gather+cast (one jit;
            # the f32 gather intermediate never exceeds ~400 MB).
            # int8 mode quantizes INSIDE the pack scan — no full-size
            # bf16 intermediate ever exists (round-4 VERDICT #2: that
            # transient was the 4M x 768 OOM)
            flat_slots = np.full(mpad, -1, np.int32)
            flat_slots[pos[placed]] = live[placed].astype(np.int32)
            del blocks  # free last round's blocks before repacking
            member_slots = jnp.asarray(flat_slots.reshape(ncl_pad, s))
            cent_pad = (
                jnp.concatenate(
                    [cent, jnp.zeros((ncl_pad - ncl, cent.shape[1]),
                                     jnp.float32)]
                ) if ncl_pad > ncl else cent
            )
            if self.quant == "int8":
                blocks, bscales = _pack_blocks_int8(
                    self.store.vectors, jnp.asarray(flat_slots)
                )
                blocks = blocks.reshape(ncl_pad, s, self.store.dim)
                bscales = bscales.reshape(ncl_pad, s)
                cent = _block_means_int8(
                    blocks, bscales, member_slots, cent_pad
                )[:ncl]
            else:
                blocks = _pack_blocks(
                    self.store.vectors, jnp.asarray(flat_slots)
                ).reshape(ncl_pad, s, self.store.dim)
                bscales = None
                cent = _block_means(blocks, member_slots, cent_pad)[:ncl]
        del v, valid
        self.blocks = blocks
        self.block_scales = bscales
        self.member_slots = member_slots
        self.centroids = cent
        self._fill = fill
        self._pending = (
            [live[~placed].astype(np.int32)] if (~placed).any() else []
        )
        self._pending_count = int((~placed).sum())

    # ── churn ──

    def insert(self, ids, vectors) -> None:
        """Append rows. Before the first build: buffered; the first
        insert that brings the index past ~16 clusters of rows triggers
        the bulk build. After: rows go to their nearest cluster with a
        free slot (vectorized greedy), spilling to the exactly-scanned
        pending region; a rebuild auto-triggers when pending exceeds
        10% of the corpus."""
        ids = np.asarray(ids, np.int64)
        if ids.size == 0:
            return
        slots = self.store.add(ids, vectors)
        if self.centroids is None:
            if len(self.store) >= 16 * self.cluster_size:
                self.rebuild()
            else:
                self._pending.append(slots.astype(np.int32))
                self._pending_count += slots.size
            return
        # assign to existing clusters with space
        s = self.cluster_size
        ncl = self.nlist
        v = self.store.vectors[jnp.asarray(slots)]
        c = min(16, ncl)
        dd = pairwise_distances(v, self.centroids, self.metric)
        neg, tc = jax.lax.top_k(-dd, c)
        tc = np.asarray(tc)
        td = -np.asarray(neg)
        assigned = _balanced_assign(tc, td, self._fill, s)
        placed = assigned >= 0
        if placed.any():
            base = np.zeros(ncl, np.int64)
            # fill BEFORE this batch for rank offsets
            batch_counts = np.bincount(assigned[placed], minlength=ncl)
            base = self._fill - batch_counts
            pos = (
                assigned[placed] * s
                + _ranks_within(assigned[placed], base)
            ).astype(np.int32)
            pslots = slots[placed]
            # blocks may carry padded phantom rows past ncl*s; flatten
            # by -1 (scatter positions are always < ncl*s)
            flat = self.blocks.reshape(-1, self.dim)
            frows = self.store.vectors[jnp.asarray(pslots)].astype(jnp.float32)
            if self.quant == "int8":
                rows, sc = quantize_rows_int8(frows)
                self.block_scales = (
                    self.block_scales.reshape(-1)
                    .at[jnp.asarray(pos)].set(sc)
                    .reshape(self.block_scales.shape)
                )
            else:
                rows = frows.astype(jnp.bfloat16)
            self.blocks = flat.at[jnp.asarray(pos)].set(rows).reshape(
                self.blocks.shape
            )
            mflat = self.member_slots.reshape(-1)
            self.member_slots = mflat.at[jnp.asarray(pos)].set(
                jnp.asarray(pslots.astype(np.int32))
            ).reshape(self.member_slots.shape)
        if (~placed).any():
            self._pending.append(slots[~placed].astype(np.int32))
            self._pending_count += int((~placed).sum())
        if self._pending_count > max(len(self.store) // 10, 4 * s):
            self.rebuild()

    def delete(self, ids) -> None:
        """Soft-delete: flips the shared validity mask; cluster slots
        are filtered at search and reclaimed on ``rebuild()``."""
        self.store.remove(np.asarray(ids, np.int64))

    # ── search ──

    def _pending_slots(self) -> np.ndarray:
        if not self._pending:
            return np.zeros((0,), np.int32)
        if len(self._pending) > 1:
            self._pending = [np.concatenate(self._pending)]
        return self._pending[0]

    def search_device(self, queries, k: int = 10, nprobe: int | None = None):
        """Engine dispatch: results left on device (slot space) — see
        ``FlatIndex.search_device`` for the contract."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[1] != self.dim:
            raise ValueError(f"query dim {q.shape[1]} != index dim {self.dim}")
        interpret = not self.use_pallas

        if self.centroids is None:
            # unbuilt: exact scan of the whole store
            hw = max(self.store.high_watermark, 1)
            return self._exact_region(
                q, jnp.arange(hw, dtype=jnp.int32), k, interpret
            )
        p = min(nprobe or self.nprobe, self.nlist)
        r = max(self.rescore_r, k)
        r = min(r, p * self.cluster_size)
        # chunk big query batches: the probe step gathers a
        # [B, p*s, d] block view, which scales HBM with B (a 99k-query
        # batch at p=16, s=256, d=96 is a 78 GB transient — round-5 ER
        # at-scale hit exactly this). The fused Pallas path streams
        # blocks and never materializes the view; the XLA fallback
        # (lane-unaligned d, interpret mode) does, so its chunk size is
        # derived from the ~1.5 GB transient budget (the 2 GB device-
        # temporary ceiling crashes the TPU worker — CLAUDE.md). Tails
        # pad to a pow2 bucket (compile-shape rule).
        qb = 8192
        if not self._fused_ok():
            per_q = p * self.cluster_size * self.dim * (
                self.blocks.dtype.itemsize if self.blocks is not None else 4
            )
            qb = max(256, min(qb, int(1.5e9) // max(per_q, 1)))
            qb = 1 << int(np.floor(np.log2(qb)))
        if q.shape[0] > qb:
            outs = []
            for s0 in range(0, q.shape[0], qb):
                outs.append(
                    self.search_device(q[s0:s0 + qb], k, nprobe)
                )
            return (jnp.concatenate([o[0] for o in outs]),
                    jnp.concatenate([o[1] for o in outs]))
        bq = q.shape[0]
        bucket = 1 << int(np.ceil(np.log2(max(bq, 64))))
        if bq < bucket:
            q = jnp.pad(q, ((0, bucket - bq), (0, 0)))
        d, slots = _ivf_search(
            q, self.centroids, self.blocks, self.member_slots,
            self.store.vectors, self.store.valid, self.metric,
            k, p, r, self._fused_ok(), interpret,
            scales=self.block_scales,
        )
        pend = self._pending_slots()
        if pend.size:
            pd, pslots = self._exact_region(
                q, jnp.asarray(pend), k, interpret
            )
            d, slots = _merge_two(d, slots, pd, pslots, k)
        return (d[:bq], slots[:bq]) if bq < bucket else (d, slots)

    def search(self, queries, k: int = 10, nprobe: int | None = None):
        """Batched ANN: returns ``(ids int64 [B, k], dists f32 [B, k])``
        ascending (-1/inf padding). Distances are exact f32 (two-tier
        rescore). ``nprobe`` overrides the constructor default."""
        single = np.ndim(queries) == 1
        d, slots = self.search_device(queries, k, nprobe)
        ids = self.store.ids_of(np.asarray(slots))
        d = np.asarray(d)
        if single:
            return ids[0], d[0]
        return ids, d

    def _exact_region(self, q, slots, k, interpret):
        """Exact top-k over an explicit slot set (pending region /
        unbuilt fallback), padded to a 1024 bucket to bound compiles.
        Queries are chunked so the [B_chunk, pad] distance transient
        stays ~1 GB — pending can legally reach len(store)//10 before
        the auto-rebuild, and a full 8192-query batch against ~100k
        pending slots would otherwise build a ~3 GB transient (the
        2 GB device-temporary ceiling crashes the TPU worker)."""
        pad = _round_up(max(slots.shape[0], 1), 1024)
        sl = jnp.full((pad,), -1, jnp.int32).at[: slots.shape[0]].set(slots)
        args = (sl, self.store.vectors, self.store.valid, self.metric, k)
        b = q.shape[0]
        chunk = int(max(256, min(b, (1 << 28) // pad)))
        if b <= chunk:
            return _exact_slots_topk(q, *args)
        qpad = (-b) % chunk
        qp = jnp.pad(q, ((0, qpad), (0, 0)))
        parts = [
            _exact_slots_topk(qp[s : s + chunk], *args)
            for s in range(0, b + qpad, chunk)
        ]
        return (
            jnp.concatenate([p[0] for p in parts])[:b],
            jnp.concatenate([p[1] for p in parts])[:b],
        )


@partial(jax.jit, static_argnames=("metric", "k"))
def _exact_slots_topk(q, sl, vectors, valid, metric, k):
    ok = (sl >= 0) & valid[jnp.maximum(sl, 0)]
    vv = vectors[jnp.maximum(sl, 0)]
    dd = pairwise_distances(q, vv, metric)
    dd = jnp.where(ok[None, :], dd, _INF)
    neg, pos = jax.lax.top_k(-dd, min(k, sl.shape[0]))
    cand = jnp.where(jnp.isinf(-neg), -1, sl[pos])
    b = q.shape[0]
    if cand.shape[1] < k:
        cand = jnp.pad(cand, ((0, 0), (0, k - cand.shape[1])),
                       constant_values=-1)
        neg = jnp.pad(neg, ((0, 0), (0, k - neg.shape[1])),
                      constant_values=-jnp.inf)
    return -neg, cand


@partial(jax.jit, static_argnames=("k",))
def _merge_two(d1, i1, d2, i2, k):
    d = jnp.concatenate([d1, d2], axis=1)
    i = jnp.concatenate([i1, i2], axis=1)
    return sorted_topk_unique(d, i, k)
