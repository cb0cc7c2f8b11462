"""Leiden community detection as edge-parallel synchronous local moving.

TPU re-design of ``src/graph_community.c`` (Traag et al. 2019): the
reference moves nodes one at a time with an O(deg^2)
``weight_to_community`` rescan; here a *sweep* evaluates every node's
best move at once:

1. sort edge keys (src, comm[dst]) -> run-length segments give
   W(v, C) for every candidate community C in one pass,
2. per-candidate modularity gain
   (W(v,C) - W(v, comm[v]))/m + gamma * k_v * (Sigma_old - k_v -
   Sigma_C) / (2 m^2)        — the reference's formula (:150-231),
3. segment-max picks each node's best move; a random half of the
   nodes (seeded) applies it — synchronous moving with subset damping
   to avoid the classic two-coloring oscillation.

Refinement restricts moves to stay inside the phase-1 communities,
starting from singletons (:238-312). Aggregation contracts refined
communities into super-nodes on host (numpy sort/unique — a data
re-shape, not compute) and the loop repeats, max 100 rounds (:336-429).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_nodes",))
def _best_moves(
    src: jax.Array,
    dst: jax.Array,
    w: jax.Array,
    comm: jax.Array,         # [V] int32 current communities
    k: jax.Array,            # [V] f32 weighted degrees
    sigma_tot: jax.Array,    # [V] f32 community degree sums (indexed by comm id)
    m: jax.Array,            # scalar f32 total edge weight (undirected m)
    gamma: jax.Array,        # scalar f32 resolution
    restrict: jax.Array,     # [V] int32 — moves allowed only within equal labels
    num_nodes: int,
) -> tuple[jax.Array, jax.Array]:
    """Per-node best (gain, target community). Returns (gain[V], target[V])."""
    e = src.shape[0]
    cd = comm[dst]
    # candidate edges must respect the refinement restriction
    allowed = restrict[src] == restrict[dst]

    # two-pass stable sort by (src, cd) — avoids int32-overflowing
    # composite keys at large V. Disallowed edges get a sentinel
    # community so they never share a run with allowed edges.
    cd_key = jnp.where(allowed, cd, jnp.int32(num_nodes))
    order1 = jnp.argsort(cd_key, stable=True)
    order = order1[jnp.argsort(src[order1], stable=True)]
    w_s = jnp.where(allowed[order], w[order], 0.0)
    allowed_s = allowed[order]
    src_s = src[order]
    cd_s = cd_key[order]

    # run ids via boundary cumsum
    boundary = (src_s[1:] != src_s[:-1]) | (cd_s[1:] != cd_s[:-1])
    newrun = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), boundary.astype(jnp.int32)]
    )
    run_id = jnp.cumsum(newrun) - 1                      # [E]
    w_vc = jax.ops.segment_sum(w_s, run_id, num_segments=e)[run_id]
    # ^ W(v, C) of each edge's (src, target-community) run, per edge

    # per-node weight to own community (self-loops excluded by src!=dst)
    own = (comm[src] == cd) & (src != dst) & allowed
    w_own = jax.ops.segment_sum(
        jnp.where(own, w, 0.0), src, num_segments=num_nodes
    )

    # per-run gain of moving src_run -> cd_run
    run_src = src_s      # representative per edge; equal within a run
    run_cd = cd_s
    kv = k[run_src]
    sig_old = sigma_tot[comm[run_src]]
    sig_new = sigma_tot[run_cd]
    stay = run_cd == comm[run_src]
    gain = (w_vc - w_own[run_src]) / m + gamma * kv * (
        sig_old - kv - sig_new
    ) / (2.0 * m * m)
    # only the first edge of each run carries the run's gain
    is_head = newrun == 1
    valid = is_head & ~stay & allowed_s
    gain = jnp.where(valid, gain, -jnp.inf)

    best_gain = jax.ops.segment_max(gain, run_src, num_segments=num_nodes)
    best_gain = jnp.where(jnp.isfinite(best_gain), best_gain, -jnp.inf)
    # tie-break: smallest target community id achieving best gain
    achieves = valid & (gain >= best_gain[run_src] - 1e-12)
    tgt = jnp.where(achieves, run_cd, jnp.int32(2**30))
    best_tgt = jax.ops.segment_min(tgt, run_src, num_segments=num_nodes)
    best_tgt = jnp.where(best_tgt < 2**30, best_tgt, comm).astype(jnp.int32)
    return best_gain, best_tgt


@partial(jax.jit, static_argnames=("num_nodes", "max_sweeps"))
def _local_moving_device(
    src, dst, w, comm0, k, m, gamma, restrict, num_nodes, key,
    max_sweeps=30,
):
    """All local-moving sweeps as ONE device while_loop.

    The earlier host loop pulled the [V] gain vector every sweep to
    decide continuation and sampled the damping subset with numpy —
    at 1M nodes that is ~4MB + a dispatch round-trip per sweep, and a
    full 10M-edge Leiden runs hundreds of sweeps. Here continuation,
    subset sampling (device PRNG), and the single-best-move progress
    fallback all stay on device; the host syncs once per local-moving
    phase."""

    def cond(state):
        comm, key, it, done = state
        return (~done) & (it < max_sweeps)

    def body(state):
        comm, key, it, _ = state
        sigma_tot = jax.ops.segment_sum(k, comm, num_segments=num_nodes)
        gain, tgt = _best_moves(
            src, dst, w, comm, k, sigma_tot, m, gamma, restrict, num_nodes
        )
        movable = gain > 1e-12
        any_mov = jnp.any(movable)
        key, sub = jax.random.split(key)
        subset = jax.random.bernoulli(sub, 0.5, (num_nodes,))
        apply = movable & subset
        # ensure progress: if damping suppressed every move, apply the
        # single best one
        best = jnp.argmax(jnp.where(movable, gain, -jnp.inf))
        fallback = (
            jnp.zeros((num_nodes,), bool).at[best].set(True) & movable
        )
        apply = jnp.where(jnp.any(apply), apply, fallback)
        comm = jnp.where(apply & any_mov, tgt, comm)
        return comm, key, it + 1, ~any_mov

    comm, key, _, done = jax.lax.while_loop(
        cond, body, (comm0, key, jnp.int32(0), jnp.bool_(False))
    )
    return comm, key, done


def _local_moving(
    src, dst, w, comm, k, m, gamma, restrict, num_nodes,
    rng: np.random.Generator, max_sweeps: int = 30,
) -> jax.Array:
    """Run synchronous local-moving sweeps until no positive-gain moves.

    Sweeps run on device in short chunks (a single long-running XLA
    program at 1M-scale trips this environment's TPU worker watchdog —
    the round-1 Brandes lesson), with only a scalar done-flag synced
    between chunks."""
    key = jax.random.PRNGKey(int(rng.integers(0, 2**31 - 1)))
    comm = jnp.asarray(comm, jnp.int32)
    restrict_j = jnp.asarray(restrict, jnp.int32)
    mj = jnp.float32(m)
    gj = jnp.float32(gamma)
    chunk = 4
    done = False
    swept = 0
    while swept < max_sweeps and not done:
        comm, key, done_j = _local_moving_device(
            src, dst, w, comm, k, mj, gj, restrict_j, num_nodes, key,
            max_sweeps=min(chunk, max_sweeps - swept),
        )
        done = bool(done_j)  # 1-byte sync per chunk
        swept += chunk
    return comm


def _renumber(labels: np.ndarray) -> np.ndarray:
    _, inv = np.unique(labels, return_inverse=True)
    return inv.astype(np.int32)


def _aggregate(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, labels: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Contract communities into super-nodes; merge parallel edges."""
    cs = labels[src].astype(np.int64)
    cd = labels[dst].astype(np.int64)
    nc = int(labels.max()) + 1 if len(labels) else 0
    key = cs * nc + cd
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    w_s = w[order]
    boundaries = np.concatenate([[True], key_s[1:] != key_s[:-1]])
    run = np.cumsum(boundaries) - 1
    w_agg = np.zeros(run[-1] + 1 if len(run) else 0, np.float64)
    np.add.at(w_agg, run, w_s)
    uk = key_s[boundaries]
    return (uk // nc).astype(np.int32), (uk % nc).astype(np.int32), w_agg.astype(np.float32)


def modularity(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray,
    labels: np.ndarray, gamma: float = 1.0,
) -> float:
    """Q over an undirected both-direction COO (each edge twice):
    Q = sum_c [ Sigma_in_c / 2m  -  gamma (Sigma_tot_c / 2m)^2 ]
    (reference per-community Q, ``src/graph_community.c:109-142``)."""
    two_m = float(w.sum())
    if two_m <= 0:
        return 0.0
    intra = float(w[labels[src] == labels[dst]].sum())
    k = np.zeros(int(labels.max()) + 1, np.float64)
    deg = np.zeros(len(labels), np.float64)
    np.add.at(deg, src, w)
    np.add.at(k, labels, deg)
    return intra / two_m - gamma * float(np.sum((k / two_m) ** 2))


def leiden(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    num_nodes: int,
    *,
    resolution: float = 1.0,
    max_rounds: int = 100,
    seed: int = 0,
    backend: str = "auto",
) -> tuple[np.ndarray, float]:
    """Full Leiden loop. Inputs are the undirected 'both' COO (each
    edge in both orientations). Returns (labels int32[V], modularity).

    Small-to-mid graphs route to the native sequential Leiden
    (``muninn_graph.cpp`` — queue-based local moving, the
    ``src/graph_community.c`` structure); the device sort-based
    synchronous sweeps take over only at extreme scale. Calibration:
    the host runs a full Leiden at ~4M edge/s (801 ms at 500k
    both-edges) while the device path's per-sweep sorts put it at
    minutes for 3M edges — so the work estimate is ~4 units/edge,
    routing host up to ~30M both-edges at the default 60 s ceiling.
    """
    from muninn_tpu import native
    from muninn_tpu.graph.routing import use_host

    from muninn_tpu.graph import routing as _routing

    if use_host(backend, _routing.COST_LEIDEN_EDGE * max(len(src), 1)):
        labels, q = native.graph_leiden(
            src, dst, w, num_nodes, resolution, max_rounds, seed
        )
        return labels, q

    rng = np.random.default_rng(seed)
    labels = np.arange(num_nodes, dtype=np.int32)  # node -> community
    cur_src, cur_dst, cur_w = (
        src.astype(np.int32), dst.astype(np.int32), w.astype(np.float32)
    )
    cur_n = num_nodes
    node_map = np.arange(num_nodes, dtype=np.int32)  # original node -> super node
    # initial partition for phase-1 local moving; after aggregation this
    # becomes the phase-1 partition projected onto the refined
    # super-nodes (Traag 2019: the aggregate graph is initialized with
    # the NON-refined partition, not singletons)
    init_comm = np.arange(cur_n, dtype=np.int32)

    prev_q = -np.inf
    for _ in range(max_rounds):
        # pow2-bucket the per-round shapes: every aggregation shrinks
        # the graph, and a novel (V, E) pair would recompile the whole
        # local-moving while_loop (30-200s per shape through this
        # environment's tunnel compiler). Padded nodes are isolated
        # (k=0, never move); padded edges are w=0 self-loops on the
        # first pad node — inert in every modularity term.
        n_pad = 1 << int(np.ceil(np.log2(max(cur_n, 64))))
        e_pad = 1 << int(np.ceil(np.log2(max(len(cur_src), 64))))
        pad_node = min(cur_n, n_pad - 1)
        ps = np.full(e_pad, pad_node, np.int32)
        pd = np.full(e_pad, pad_node, np.int32)
        pw = np.zeros(e_pad, np.float32)
        ps[: len(cur_src)] = cur_src
        pd[: len(cur_src)] = cur_dst
        pw[: len(cur_src)] = cur_w
        sj, dj, wj = jnp.asarray(ps), jnp.asarray(pd), jnp.asarray(pw)
        k = jax.ops.segment_sum(wj, sj, num_segments=n_pad)
        m = float(cur_w.sum()) / 2.0
        if m <= 0:
            break
        no_restrict = np.zeros(n_pad, np.int32)

        def padded(arr32):
            out = np.arange(n_pad, dtype=np.int32)
            out[: len(arr32)] = arr32
            return out

        # phase 1: local moving from current (meta-)partition
        comm = _local_moving(
            sj, dj, wj, padded(init_comm), k, m,
            resolution, no_restrict, n_pad, rng,
        )
        comm_np = _renumber(np.asarray(comm)[:cur_n])

        # phase 2: refinement — singletons, moves restricted to phase-1
        # communities (src/graph_community.c:238-312)
        refined = _local_moving(
            sj, dj, wj, jnp.arange(n_pad, dtype=jnp.int32), k, m,
            resolution, padded(comm_np), n_pad, rng,
        )
        refined_np = _renumber(np.asarray(refined)[:cur_n])
        # fallback if refinement fragments more than phase 1 helps
        # (reference fallback, :376-408)
        if refined_np.max() + 1 > comm_np.max() + 1:
            use = comm_np
        else:
            use = refined_np

        full_labels = use[node_map]  # project meta partition to original nodes
        q = modularity(src, dst, w, full_labels, resolution)
        if q <= prev_q + 1e-9:
            break
        prev_q = q
        labels = full_labels.copy()

        nc = int(use.max()) + 1
        if nc == cur_n:
            break
        # aggregate on the refined partition; next round starts from the
        # phase-1 partition projected onto super-nodes (every member of
        # a refined community shares one phase-1 community — refinement
        # is restricted — so any representative works)
        rep = np.zeros(nc, np.int64)
        rep[use] = np.arange(cur_n)
        init_comm = comm_np[rep].astype(np.int32)
        cur_src, cur_dst, cur_w = _aggregate(cur_src, cur_dst, cur_w, use)
        node_map = use[node_map]
        cur_n = nc

    return _renumber(labels), prev_q if np.isfinite(prev_q) else modularity(
        src, dst, w, labels, resolution
    )
