"""Node2Vec: batched p/q-biased random walks + SGNS on device.

TPU re-design of the reference's ``src/node2vec.c``:

- The reference walks one node at a time with an O(deg) linear
  ``is_neighbor`` scan per candidate (``:154-226``). Here **all walkers
  advance together**: one ``lax.scan`` step samples a neighbor for every
  walker (weighted via prefix-sum binary search), then applies the
  second-order p/q bias by *rejection sampling* (KnightKing-style):
  accept candidate c from cur with probability bias(c)/max_bias where
  bias = 1/p if c == prev, 1 if c in N(prev), 1/q otherwise. The
  membership test is a vectorized binary search over the sorted CSR row
  of prev. p = q = 1 degenerates to DeepWalk exactly as in the
  reference (``:399-590``).
- SGNS (``:244-394``): instead of a sigmoid lookup table and per-pair
  scalar updates, (center, context) pairs are formed from walk tensors
  by static window shifts, negatives come from a unigram^0.75 table
  (``:274-303``; 100k entries), and each minibatch is one fused
  gather -> dot -> sigmoid -> scatter-add step. Learning rate decays
  linearly to a floor like the reference (``:509-512``).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

NEG_TABLE_SIZE = 100_000  # matches reference, src/node2vec.c:274-303


# ───────────────────────── walks ─────────────────────────


@partial(jax.jit, static_argnames=("max_deg",))
def _row_sorted_cumw(src, dst, w, offsets, max_deg: int):
    """Device-side walk-table prep from a (src-sorted, padded) CSR:
    sort each row by dst (two stable sorts == lexsort(dst within src);
    pads src=V stay last) and compute PER-ROW inclusive prefix sums of
    the weights. Row-local sums stay f32-accurate at any edge count —
    a global cumsum loses edge-weight resolution once the running
    total passes 2^24 (unit-weight edges become indistinguishable),
    which silently skews sampling on 10M+-edge graphs.

    The segmented scan is SHIFT DOUBLING over in-row positions
    (ceil(log2(max_deg)) slice+where+add passes, like
    ``ops.segments.seg_reduce_chunked``) — NOT ``lax.associative_scan``,
    whose multi-million-element padded lowering compiles for tens of
    minutes on this toolchain (it hung every 250k-node node2vec probe
    at the e_cap=2^22 cumw compile)."""
    from muninn_tpu.ops.segments import n_passes_for, seg_positions

    o1 = jnp.argsort(dst, stable=True).astype(jnp.int32)
    o2 = jnp.argsort(src[o1], stable=True).astype(jnp.int32)
    order = o1[o2]
    # the stable re-sort keeps src groups in their CSR ranges, so
    # offsets still delimit rows; pads (src=V, w=0) stay last and sum
    # only each other
    x = w[order]
    e_pad = x.shape[0]
    spos = seg_positions(offsets, e_pad)
    for j in range(n_passes_for(max_deg)):
        sh = 1 << j
        if sh >= e_pad:
            break
        prev = jnp.concatenate([jnp.zeros((sh,), x.dtype), x[:-sh]])
        x = jnp.where(spos >= sh, x + prev, x)
    return dst[order], x


@partial(jax.jit, static_argnames=("num_nodes",))
def _searchsorted_segment(
    cumw: jax.Array,      # [E] per-row inclusive prefix sums
    lo: jax.Array,        # [W] segment start (offsets[v])
    hi: jax.Array,        # [W] segment end   (offsets[v+1])
    target: jax.Array,    # [W] value in (0, cumw[hi-1]]
    num_nodes: int,
) -> jax.Array:
    """Vectorized binary search: smallest e in [lo, hi) with
    cumw[e] >= target. 32 fixed iterations (E < 2^31)."""
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        v = cumw[jnp.maximum(mid, 0)]
        go_right = v < target
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return lo


@partial(jax.jit, static_argnames=("num_nodes",))
def _is_neighbor(
    sorted_dst: jax.Array,  # [E] CSR targets, sorted within each row
    offsets: jax.Array,     # [V+1]
    u: jax.Array,           # [W] row owner
    c: jax.Array,           # [W] candidate
    num_nodes: int,
) -> jax.Array:
    """Vectorized membership test c in N(u) via binary search over u's
    sorted CSR row (replaces the reference's linear scan, :154-161)."""
    lo = offsets[u]
    hi = offsets[u + 1]

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        v = sorted_dst[jnp.clip(mid, 0, sorted_dst.shape[0] - 1)]
        go_right = v < c
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo0, hi0 = lo, hi
    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    found = (lo < hi0) & (lo >= lo0)
    val = sorted_dst[jnp.clip(lo, 0, sorted_dst.shape[0] - 1)]
    return found & (val == c)


@partial(
    jax.jit,
    static_argnames=("num_nodes", "walk_length", "p", "q", "rejection_rounds"),
)
def biased_walks(
    key: jax.Array,
    offsets: jax.Array,      # [V+1] int32 (row-sorted CSR, dst ascending)
    dst: jax.Array,          # [E] int32
    cumw: jax.Array,         # [E] f32 per-row inclusive weight prefix sums
    starts: jax.Array,       # [W] int32 start nodes
    num_nodes: int,
    walk_length: int,
    p: float,
    q: float,
    rejection_rounds: int = 4,
) -> jax.Array:
    """Second-order walks [W, walk_length+1]. Dead ends (deg 0) repeat
    in place, mirroring the reference's early walk termination."""
    w_count = starts.shape[0]
    inv_p = 1.0 / p
    inv_q = 1.0 / q
    max_bias = max(inv_p, 1.0, inv_q)

    def sample_neighbor(k, cur):
        """Weighted neighbor draw for each walker at cur (cumw is
        row-local, so the draw is base-free and f32-exact)."""
        lo = offsets[cur]
        hi = offsets[cur + 1]
        deg = hi - lo
        total = cumw[jnp.maximum(hi - 1, 0)]
        u = jax.random.uniform(k, (w_count,))
        target = u * jnp.maximum(total, 1e-30)
        e = _searchsorted_segment(cumw, lo, hi, target, num_nodes)
        e = jnp.clip(e, lo, jnp.maximum(hi - 1, lo))
        cand = dst[jnp.clip(e, 0, dst.shape[0] - 1)]
        return jnp.where(deg > 0, cand, cur)

    def step(carry, k):
        cur, prev = carry
        k1, k2 = jax.random.split(k)
        ks = jax.random.split(k1, rejection_rounds)
        ku = jax.random.split(k2, rejection_rounds)

        chosen = sample_neighbor(ks[0], cur)   # fallback = first draw
        accepted = jnp.zeros((w_count,), bool)
        for r in range(rejection_rounds):
            cand = sample_neighbor(ks[r], cur)
            is_prev = cand == prev
            in_prev_nbr = _is_neighbor(dst, offsets, prev, cand, num_nodes)
            bias = jnp.where(
                is_prev, inv_p, jnp.where(in_prev_nbr, 1.0, inv_q)
            )
            u = jax.random.uniform(ku[r], (w_count,))
            ok = u < (bias / max_bias)
            take = ok & ~accepted
            chosen = jnp.where(take, cand, chosen)
            accepted = accepted | ok
        nxt = chosen
        return (nxt, cur), nxt

    k0, kw = jax.random.split(key)
    # first hop: plain weighted draw (no prev yet)
    first = sample_neighbor(k0, starts)
    if walk_length > 1:
        keys = jax.random.split(kw, walk_length - 1)
        (_, _), rest = jax.lax.scan(step, (first, starts), keys)
    else:
        rest = jnp.zeros((0, w_count), jnp.int32)
    walk = jnp.concatenate(
        [starts[None, :], first[None, :], rest], axis=0
    )  # [L+1, W]
    return walk.T


# ───────────────────────── SGNS ─────────────────────────


def _pow2_at_least(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


def build_negative_table(
    degrees: np.ndarray, size: int = NEG_TABLE_SIZE, power: float = 0.75
) -> np.ndarray:
    """Unigram^0.75 sampling table (src/node2vec.c:274-303).

    Built by inverse-CDF stratification (size evenly spaced quantiles of
    the cumulative p^0.75 mass) rather than the reference's repeat-and
    -truncate: with V > size, per-node `max(count, 1)` repeats truncate
    to the FIRST `size` nodes — at 1M nodes only ids < ~100k would ever
    be drawn as negatives, silently skewing every embedding."""
    p = np.maximum(degrees.astype(np.float64), 0) ** power
    if p.sum() <= 0:
        p = np.ones_like(p)
    cdf = np.cumsum(p)
    q = (np.arange(size, dtype=np.float64) + 0.5) / size * cdf[-1]
    return np.searchsorted(cdf, q, side="right").astype(np.int32)


@partial(
    jax.jit,
    static_argnames=("window", "neg_samples", "chunk"),
    donate_argnums=(0, 1),
)
def sgns_walk_batch(
    syn0: jax.Array,        # [V, D]
    syn1: jax.Array,        # [V, D]
    walks: jax.Array,       # [W, L+1] int32, W % chunk == 0
    neg_table: jax.Array,   # [T] int32
    key: jax.Array,
    lr: jax.Array,
    window: int,
    neg_samples: int,
    chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """SGNS over a whole walk batch as one jitted ``lax.scan`` over
    walker-row chunks (bounds the [P, K, D] peak like the chunked
    eager loop, without one dispatch per chunk)."""
    w, l1 = walks.shape
    wchunks = walks.reshape(w // chunk, chunk, l1)

    def body(carry, wk):
        s0, s1, k = carry
        k, kc = jax.random.split(k)
        s0, s1 = _sgns_update(s0, s1, wk, neg_table, kc, lr, window, neg_samples)
        return (s0, s1, k), None

    (syn0, syn1, _), _ = jax.lax.scan(body, (syn0, syn1, key), wchunks)
    return syn0, syn1


@partial(
    jax.jit, static_argnames=("window", "neg_samples"), donate_argnums=(0, 1)
)
def sgns_step(
    syn0: jax.Array,        # [V, D] input embeddings
    syn1: jax.Array,        # [V, D] output embeddings
    walks: jax.Array,       # [W, L+1] int32
    neg_table: jax.Array,   # [T] int32
    key: jax.Array,
    lr: jax.Array,          # scalar f32
    window: int,
    neg_samples: int,
) -> tuple[jax.Array, jax.Array]:
    """One SGNS update over a walk batch (single-chunk form of
    ``sgns_walk_batch``; kept as the unit-testable primitive)."""
    return _sgns_update(
        syn0, syn1, walks, neg_table, key, lr, window, neg_samples
    )


def _sgns_update(
    syn0, syn1, walks, neg_table, key, lr, window, neg_samples
):
    """Fused gather/sigmoid/scatter SGNS update over every
    (center, context) pair of the walk rows."""
    w_count, l1 = walks.shape
    centers = []
    contexts = []
    for off in range(1, window + 1):
        if off >= l1:
            break
        a = walks[:, :-off].reshape(-1)
        b = walks[:, off:].reshape(-1)
        centers.append(a)
        contexts.append(b)
        centers.append(b)
        contexts.append(a)
    center = jnp.concatenate(centers)      # [P]
    context = jnp.concatenate(contexts)    # [P]
    pcount = center.shape[0]

    negs = neg_table[
        jax.random.randint(key, (pcount, neg_samples), 0, neg_table.shape[0])
    ]                                       # [P, K]

    v = syn0[center]                        # [P, D]
    upos = syn1[context]                    # [P, D]
    uneg = syn1[negs]                       # [P, K, D]

    pos_logit = jnp.sum(v * upos, axis=-1)              # [P]
    neg_logit = jnp.einsum("pd,pkd->pk", v, uneg)       # [P, K]

    gpos = jax.nn.sigmoid(pos_logit) - 1.0              # [P]
    gneg = jax.nn.sigmoid(neg_logit)                    # [P, K]

    # gradients
    dv = gpos[:, None] * upos + jnp.einsum("pk,pkd->pd", gneg, uneg)
    dupos = gpos[:, None] * v
    duneg = gneg[:, :, None] * v[:, None, :]

    # A batch contains many pairs per node; normalize each row's update
    # by its occurrence count so the effective per-row step matches the
    # reference's sequential per-pair SGD at the same lr (otherwise the
    # summed scatter-add diverges).
    vcount = syn0.shape[0]
    ones_p = jnp.ones((pcount,), jnp.float32)
    cnt0 = jax.ops.segment_sum(ones_p, center, num_segments=vcount)
    negs_flat = negs.reshape(-1)
    cnt1 = (
        jax.ops.segment_sum(ones_p, context, num_segments=vcount)
        + jax.ops.segment_sum(
            jnp.ones((negs_flat.shape[0],), jnp.float32), negs_flat,
            num_segments=vcount,
        )
    )
    dv = dv / jnp.maximum(cnt0[center], 1.0)[:, None]
    dupos = dupos / jnp.maximum(cnt1[context], 1.0)[:, None]
    duneg = duneg / jnp.maximum(cnt1[negs], 1.0)[:, :, None]

    syn0 = syn0.at[center].add(-lr * dv)
    syn1 = syn1.at[context].add(-lr * dupos)
    syn1 = syn1.at[negs_flat].add(
        -lr * duneg.reshape(-1, v.shape[-1])
    )
    return syn0, syn1


# ───────────────────────── driver ─────────────────────────


def node2vec_train(
    graph,
    dim: int = 64,
    *,
    p: float = 1.0,
    q: float = 1.0,
    num_walks: int = 10,
    walk_length: int = 80,
    window: int = 5,
    neg_samples: int = 5,
    learning_rate: float = 0.025,
    epochs: int = 5,
    seed: int = 1,
    walk_batch: int = 4096,
    sgns_chunk: int = 256,
    output_index=None,
    backend: str = "auto",
):
    """Train Node2Vec embeddings over an (undirected) graph.

    Mirrors ``node2vec_train(edge_table, src, dst, output, dim, p, q,
    num_walks, walk_length, window, neg_samples, lr, epochs)``
    (``src/node2vec.c:399-590``, ``docs/api.md:568-600``) as keyword
    arguments. ``graph`` is a ``muninn_tpu.Graph``; edges are treated
    as undirected like the reference's loader (``:112-138``).

    Returns (node_ids list, embeddings f32 [V, dim] L2-normalized).
    If ``output_index`` (an ``HnswIndex`` or ``FlatIndex``) is given,
    embeddings are inserted with ids 1..V in node-interning order — the
    reference writes rowid = i + 1 (``:539-585``).
    """
    if dim > 1024:
        raise ValueError("dim must be <= 1024 (reference cap)")
    v_count = graph.num_nodes
    # small-N host fast path (graph.routing): at the reference's
    # 100-2k envelope the whole sequential training run costs less
    # than a handful of device dispatches through the tunnel
    from muninn_tpu import native
    from muninn_tpu.graph import routing
    from muninn_tpu.graph.routing import use_host

    est = (
        float(epochs) * num_walks * max(v_count, 1) * walk_length
        * 2 * window * (neg_samples + 1) * dim
    ) * routing.COST_SGNS_PAIR_DIM
    if v_count and use_host(backend, est, ceiling=routing.HOST_N2V_SECONDS):
        hs, hd, hw = graph.host_coo("both")
        emb = native.node2vec_train_host(
            hs, hd, hw, v_count, dim, p, q, num_walks, walk_length,
            window, neg_samples, learning_rate, epochs, seed,
        )
        if emb is not None:
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            emb = emb / np.maximum(norms, 1e-12)
            node_ids = list(graph.nodes.ids)
            if output_index is not None:
                output_index.insert(np.arange(1, v_count + 1), emb)
            return node_ids, emb
    c = graph.csr("both")
    # row-sort + per-row weight prefix sums, entirely on device (the
    # previous host lexsort/cumsum round-trip re-uploaded [E] arrays —
    # minutes at 100M edges through the tunnel — and its GLOBAL f32
    # cumsum lost weight resolution past 2^24 total weight)
    import os as _os
    import time as _time

    _dbg = bool(_os.environ.get("MUNINN_DEBUG_TIMING"))
    _t0 = _time.time()

    def _stage(name, arr):
        # tiny host fetch = real sync (block_until_ready lies through
        # the tunnel; see DEVELOPMENT.md)
        if _dbg:
            float(jnp.asarray(arr).reshape(-1)[0].astype(jnp.float32))
            print(
                f"[node2vec] {name} {_time.time() - _t0:.1f}s", flush=True
            )

    offsets = c.offsets
    dstj, cumw = _row_sorted_cumw(c.s(), c.dst, c.w(), offsets, c.max_deg)
    _stage("cumw", cumw)

    degrees = np.asarray(c.degrees())
    neg_table = jnp.asarray(build_negative_table(degrees))
    _stage("neg_table", neg_table)

    key = jax.random.PRNGKey(seed)
    k_init, key = jax.random.split(key)
    scale = 1.0 / dim
    syn0 = (jax.random.uniform(k_init, (v_count, dim)) - 0.5) * scale
    syn1 = jnp.zeros((v_count, dim), jnp.float32)
    _stage("init", syn0)
    lr_floor = learning_rate * 1e-4
    total_steps = max(epochs * num_walks, 1)
    step_i = 0
    _batch_i = 0
    for _ in range(epochs):
        for _ in range(num_walks):
            frac = step_i / total_steps
            lr = max(learning_rate * (1.0 - frac), lr_floor)
            step_i += 1
            # walker batches run at ONE bucketed shape: pow2 of v_count
            # capped at walk_batch (a raw tail remainder is a novel
            # [W] shape for biased_walks AND the SGNS step — one
            # 30-200 s tunnel compile per distinct graph-size
            # remainder). Short batches are topped up with RANDOM
            # start nodes: unbiased in expectation, unlike wrapping
            # (which would systematically oversample the first nodes).
            wb = min(walk_batch, _pow2_at_least(v_count))
            for s in range(0, v_count, wb):
                starts = jnp.arange(
                    s, min(s + wb, v_count), dtype=jnp.int32
                )
                key, kw, kn, kp = jax.random.split(key, 4)
                short = wb - int(starts.shape[0])
                if short > 0:
                    starts = jnp.concatenate([
                        starts,
                        jax.random.randint(kp, (short,), 0, v_count, jnp.int32),
                    ])
                walks = biased_walks(
                    kw, offsets, dstj, cumw, starts, v_count,
                    walk_length, p, q,
                )
                if _dbg and _batch_i == 0:
                    _stage("walks[0]", walks)
                # one fused dispatch per walk batch; scan chunks inside
                chunk = min(sgns_chunk, walks.shape[0])
                pad = (-walks.shape[0]) % chunk
                if pad:
                    walks = jnp.concatenate(
                        [walks, walks[:pad]], axis=0
                    )  # harmless repeat of a few walkers
                syn0, syn1 = sgns_walk_batch(
                    syn0, syn1, walks, neg_table, kn,
                    jnp.float32(lr), window, neg_samples, chunk,
                )
                _batch_i += 1
                if _dbg and (
                    _batch_i & (_batch_i - 1) == 0 or _batch_i % 8 == 0
                ):
                    # syncs at 1,2,4 then every 8: a slow batch shows
                    # up in minutes, not at the job timeout
                    _stage(
                        f"batch {_batch_i} (pass {step_i}/{total_steps})",
                        syn0,
                    )

    emb = np.asarray(syn0)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / np.maximum(norms, 1e-12)
    node_ids = list(graph.nodes.ids)
    if output_index is not None:
        output_index.insert(np.arange(1, v_count + 1), emb)
    return node_ids, emb
