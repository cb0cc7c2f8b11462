"""Whole-beam Pallas kernel: the full level-0 beam loop in one program.

``index/hnsw._beam_search_level0`` runs the beam as a ``lax.while_loop``
of XLA ops around one fused gather kernel per iteration: every
iteration re-reads and re-writes the [B, ef] beam state through HBM and
pays XLA op overhead for pick/dedup/merge over the whole batch. That
non-DMA tail is ~25% of batch time once the gather is fused
(DEVELOPMENT.md "Beam DMA economics"). This kernel keeps the beam state
(distances, slots, expanded flags, patience counters) in VMEM for a
whole query tile and runs pick -> gather-DMA -> score -> dedup -> merge
entirely in-kernel, so one ``pallas_call`` replaces the whole loop.

Role: the complete ef-bounded best-first search of the reference
(``src/hnsw_algo.c:347-448``) as a single TPU program.

Two TPU-specific mechanics make it possible:

- **ids ride the vector blocks.** A DMA source index must be a scalar,
  and the candidate ids produced by an expansion are only known after
  its block arrives. Packing ``neighbors0`` into the block itself —
  ``packed_wide[slot] = [R0, d + 128]`` bf16 with each neighbor row's
  id byte-split into three small-integer lanes (exact in bf16) — lets
  ONE DMA carry both the vectors and the ids, keeping the measured
  ~260 ns copy-issue floor at one copy per expansion.
- **picks cross VMEM -> SMEM.** Each iteration's picks are computed in
  vector form from the VMEM beam, but DMA indices must be scalars and
  Mosaic only loads scalars from SMEM. ``pick_xfer`` selects the
  transfer: ``"dma"`` (one small VMEM->SMEM async copy per iteration)
  or ``"scalar"`` (per-element reduce + scalar store — documented-safe
  fallback).

The loop body mirrors ``_beam_search_level0``'s semantics exactly
(pick-best-``expand`` unexpanded, in-beam + same-iteration dedup,
single top-``ef`` merge, fill-aware patience in expansions) so the two
paths are differentially testable. All in-kernel compute keeps a
strict 2-D [rows, lanes] shape discipline (Mosaic-safe; the only 1-D
intermediates are lane-reduction results, the pattern the shipped
``gather_block_topm`` kernel already compiles).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muninn_tpu.ops.distance import Metric

_NBUF = 8
_VMEM_BUDGET = 12 * 1024 * 1024
_BIG = 3.0e38
_MODE = {Metric.L2: 0, Metric.COSINE: 1, Metric.INNER_PRODUCT: 2}
ID_LANES = 128  # lane padding appended to d for the id bytes (tile-aligned)


def split_id_bytes(slots: np.ndarray) -> np.ndarray:
    """Byte-split ``slots`` (int, -1 = invalid) into three bf16-exact
    small integers of ``slots + 1`` (so -1 encodes as all-zero bytes).
    Returns float32 ``[..., 3]`` ready to cast into bf16 lanes."""
    v = (np.asarray(slots, np.int64) + 1).astype(np.int64)
    if np.any(v < 0) or np.any(v >= 1 << 24):
        raise ValueError("slot ids must be in [-1, 2^24 - 1)")
    out = np.empty(v.shape + (3,), np.float32)
    out[..., 0] = (v >> 16) & 0xFF
    out[..., 1] = (v >> 8) & 0xFF
    out[..., 2] = v & 0xFF
    return out


@jax.jit
def pack_wide(vecs16: jax.Array, neighbors0: jax.Array) -> jax.Array:
    """Build the packed-with-ids neighbor table ``[cap, R0, d + 128]``
    bf16: lanes ``[0, d)`` are the neighbor vectors (``vecs16`` rows),
    lanes ``d..d+2`` the byte-split neighbor id, the rest zero. Runs
    on device — the neighbor table never crosses the host boundary."""
    nb = jnp.asarray(neighbors0, jnp.int32)
    cap, r0 = nb.shape
    blocks = vecs16[jnp.maximum(nb, 0)].astype(jnp.bfloat16)  # [cap, R0, d]
    v = nb + 1  # -1 encodes as all-zero bytes
    idb = jnp.stack(
        [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF], axis=2
    ).astype(jnp.bfloat16)                                    # [cap, R0, 3]
    pad = jnp.zeros((cap, r0, ID_LANES - 3), jnp.bfloat16)
    return jnp.concatenate([blocks, idb, pad], axis=2)


def _beam_loop_kernel(
    q_ref,        # [TB, d] f32 (VMEM, grid-blocked)
    initd_ref,    # [TB, ef] f32 initial beam distances (+inf padded)
    initi_ref,    # [TB, ef] i32 initial beam slots (-1 padded)
    packedw_ref,  # [cap, R0, d+128] bf16 (HBM)
    outd_ref,     # [TB, ef] f32 out
    outi_ref,     # [TB, ef] i32 out
    buf_ref,      # [NBUF, R0, d+128] scratch
    sems,         # DMA semaphores [NBUF]
    bd_ref,       # [TB, ef] f32 beam distances (VMEM scratch)
    bi_ref,       # [TB, ef] i32 beam slots
    bx_ref,       # [TB, ef] i32 expanded flags (0/1)
    st_ref,       # [TB, 1] i32 stall counters
    pk_ref,       # [TB, E] i32 picks (VMEM staging)
    cd_ref,       # [TB, E, R0] f32 candidate distances
    ci_ref,       # [TB, E, R0] i32 candidate slots
    pk_smem,      # [TB, E] i32 picks (SMEM — DMA index source)
    psem,         # single DMA semaphore for the pick transfer
    *,
    tb: int,
    e: int,
    d: int,
    ef: int,
    patience: int,
    max_iters: int,
    nbuf: int,
    mode: int,
    pick_xfer: str,
):
    r0 = buf_ref.shape[1]
    c = e * r0
    iota_ef = jax.lax.broadcasted_iota(jnp.int32, (tb, ef), 1)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (tb, c), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (tb, ef + c), 1)

    bd_ref[:] = initd_ref[:]
    bi_ref[:] = initi_ref[:]
    bx_ref[:] = jnp.zeros((tb, ef), jnp.int32)
    st_ref[:] = jnp.zeros((tb, 1), jnp.int32)

    def dma(p):
        return pltpu.make_async_copy(
            packedw_ref.at[pk_smem[p // e, p % e]],
            buf_ref.at[p % nbuf],
            sems.at[p % nbuf],
        )

    def start_if_live(p):
        # dead picks (-1: converged/stalled queries, empty slots) never
        # issue their copy — copy issue is the beam's measured floor
        @pl.when(pk_smem[p // e, p % e] >= 0)
        def _():
            dma(p).start()

    def iteration(_, carry):
        beam_d = bd_ref[:]
        beam_i = bi_ref[:]
        stall = st_ref[:]                                  # [TB, 1]

        # ── pick phase: best `e` unexpanded beam entries per query ──
        cand = jnp.where((bx_ref[:] != 0) | (beam_i < 0), jnp.inf, beam_d)
        pick_cols, valid_cols = [], []
        sel_any = jnp.zeros((tb, ef), jnp.bool_)
        for _j in range(e):
            mn = jnp.min(cand, axis=1, keepdims=True)                # [TB,1]
            loc = jnp.min(
                jnp.where(cand == mn, iota_ef, ef), axis=1, keepdims=True
            )
            onehot = iota_ef == loc
            vj = mn < jnp.inf                                        # [TB,1]
            slot = jnp.sum(
                jnp.where(onehot, beam_i, 0), axis=1, keepdims=True
            )
            pick_cols.append(jnp.where(vj, slot, -1))
            valid_cols.append(vj)
            sel_any = sel_any | (onehot & vj)
            cand = jnp.where(onehot, jnp.inf, cand)
        pick_valid = jnp.concatenate(valid_cols, axis=1)             # [TB,E]
        live = jnp.any(pick_valid, axis=1, keepdims=True) & (
            stall < patience
        )                                                            # [TB,1]
        do = pick_valid & live                                       # [TB,E]
        bx_ref[:] = (
            (bx_ref[:] != 0) | (sel_any & live)
        ).astype(jnp.int32)
        pk_ref[:] = jnp.where(do, jnp.concatenate(pick_cols, axis=1), -1)

        # ── stage picks into SMEM (DMA indices must be scalars) ──
        if pick_xfer == "dma":
            cp = pltpu.make_async_copy(pk_ref, pk_smem, psem)
            cp.start()
            cp.wait()
        else:
            def stage(p, carry2):
                row = pk_ref[pl.ds(p // e, 1), pl.ds(p % e, 1)]
                pk_smem[p // e, p % e] = jnp.sum(row)
                return carry2
            jax.lax.fori_loop(0, tb * e, stage, 0)

        # ── gather + score phase (per pick: one wide-block DMA) ──
        total = tb * e
        for p in range(min(nbuf, total)):
            start_if_live(p)

        def score(p, carry2):
            t = p // e
            ei = p % e
            live_p = pk_smem[t, ei] >= 0

            @pl.when(live_p)
            def _():
                dma(p).wait()
                blk = buf_ref[p % nbuf].astype(jnp.float32)    # [R0, d+128]
                vec = blk[:, :d]
                qrow = q_ref[pl.ds(t, 1), :]                   # [1, d]
                dots = jnp.sum(vec * qrow[0][None, :], axis=1)[None, :]
                if mode == 2:
                    dist = -dots
                else:
                    cn2 = jnp.sum(vec * vec, axis=1)[None, :]
                    q2 = jnp.sum(qrow * qrow, axis=1, keepdims=True)  # [1,1]
                    if mode == 0:
                        dist = jnp.maximum(q2 + cn2 - 2.0 * dots, 0.0)
                    else:
                        den = jnp.sqrt(q2) * jnp.sqrt(cn2)
                        sim = jnp.where(
                            den < 1e-30, 0.0, dots / jnp.maximum(den, 1e-30)
                        )
                        dist = 1.0 - sim
                # ids ride lanes d..d+2 as bf16-exact bytes of slot+1
                ids = (
                    blk[:, d].astype(jnp.int32) * 65536
                    + blk[:, d + 1].astype(jnp.int32) * 256
                    + blk[:, d + 2].astype(jnp.int32)
                    - 1
                )[None, :]                                     # [1, R0]
                dist = jnp.where(ids >= 0, dist, _BIG)
                cd_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = dist[None]
                ci_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = ids[None]

            @pl.when(jnp.logical_not(live_p))
            def _():
                cd_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = jnp.full(
                    (1, 1, r0), _BIG, jnp.float32
                )
                ci_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = jnp.full(
                    (1, 1, r0), -1, jnp.int32
                )

            @pl.when(p + nbuf < total)
            def _():
                start_if_live(p + nbuf)

            return carry2

        jax.lax.fori_loop(0, total, score, 0)

        # ── dedup + merge phase (batched over the tile; 2-D ops only) ──
        cdist = cd_ref[:].reshape(tb, c)
        cids = ci_ref[:].reshape(tb, c)
        beam_cmp = jnp.where(beam_i < 0, -2, beam_i)
        in_beam = jnp.zeros((tb, c), jnp.bool_)
        for j in range(ef):
            in_beam = in_beam | (cids == beam_cmp[:, j : j + 1])
        dup = jnp.zeros((tb, c), jnp.bool_)
        for j in range(c - 1):
            # mark every later occurrence of cids[:, j] (keep-first)
            dup = dup | ((cids == cids[:, j : j + 1]) & (iota_c > j))
        bad = in_beam | dup | (cids < 0) | (cdist >= _BIG / 2)
        cdist = jnp.where(bad, jnp.inf, cdist)
        cids = jnp.where(bad, -1, cids)

        cat_d = jnp.concatenate([beam_d, cdist], axis=1)             # [TB,W]
        cat_i = jnp.concatenate([beam_i, cids], axis=1)
        cat_f = jnp.concatenate(
            [bx_ref[:], jnp.zeros((tb, c), jnp.int32)], axis=1
        )
        nd_cols, ni_cols, nf_cols = [], [], []
        for _j in range(ef):
            mn = jnp.min(cat_d, axis=1, keepdims=True)               # [TB,1]
            loc = jnp.min(
                jnp.where(cat_d == mn, iota_w, ef + c), axis=1, keepdims=True
            )
            onehot = iota_w == loc
            got = mn < jnp.inf                                       # [TB,1]
            ni = jnp.where(
                got,
                jnp.sum(jnp.where(onehot, cat_i, 0), axis=1, keepdims=True),
                -1,
            )
            nf = got & (
                jnp.sum(jnp.where(onehot, cat_f, 0), axis=1, keepdims=True)
                != 0
            )
            nd_cols.append(mn)
            ni_cols.append(ni)
            nf_cols.append(nf)
            cat_d = jnp.where(onehot, jnp.inf, cat_d)
        new_d = jnp.concatenate(nd_cols, axis=1)                     # [TB,ef]
        new_i = jnp.concatenate(ni_cols, axis=1)
        new_f = jnp.concatenate(nf_cols, axis=1) & (new_i >= 0)

        # fill-aware improvement + patience in expansions
        # (src/hnsw_algo.c:368-392; mirrors _beam_search_level0)
        improved = (new_d[:, ef - 1 : ef] < beam_d[:, ef - 1 : ef]) | (
            jnp.sum((new_i >= 0).astype(jnp.int32), axis=1, keepdims=True)
            > jnp.sum((beam_i >= 0).astype(jnp.int32), axis=1, keepdims=True)
        )                                                            # [TB,1]
        nexp = jnp.sum(do.astype(jnp.int32), axis=1, keepdims=True)  # [TB,1]
        nstall = jnp.where(
            live, jnp.where(improved, 0, stall + nexp), stall
        )
        bd_ref[:] = new_d
        bi_ref[:] = new_i
        bx_ref[:] = new_f.astype(jnp.int32)
        st_ref[:] = nstall.astype(jnp.int32)
        return carry

    jax.lax.fori_loop(0, max_iters, iteration, 0)
    outd_ref[:] = bd_ref[:]
    outi_ref[:] = bi_ref[:]


@partial(
    jax.jit,
    static_argnames=(
        "metric", "ef", "expand", "patience", "max_iters", "tb",
        "interpret", "nbuf", "pick_xfer",
    ),
)
def beam_loop(
    queries: jax.Array,    # [B, d] f32
    init_d: jax.Array,     # [B, ef] f32 (entry distances, +inf padded)
    init_i: jax.Array,     # [B, ef] i32 (entry slots, -1 padded)
    packedw: jax.Array,    # [cap, R0, d+128] bf16 (pack_wide)
    metric: Metric = Metric.COSINE,
    ef: int = 24,
    expand: int = 4,
    patience: int = 0,
    max_iters: int = 0,
    tb: int = 128,
    interpret: bool = False,
    nbuf: int = _NBUF,
    pick_xfer: str = "dma",
) -> tuple[jax.Array, jax.Array]:
    """Run the whole level-0 beam loop in one Pallas program per query
    tile. Returns ``(beam_d [B, ef] f32, beam_i [B, ef] i32)`` —
    bf16-scored; the caller rescores in exact f32 like the XLA path."""
    b, d = queries.shape
    _, r0, dw = packedw.shape
    e = min(expand, ef)
    if dw != d + ID_LANES:
        raise ValueError(f"packedw lane dim {dw} != d + {ID_LANES}")
    if d % 128 != 0 or r0 % 16 != 0:
        raise ValueError(
            f"unaligned block [{r0}, {dw}]: need d % 128 == 0 and "
            f"R0 % 16 == 0 for bf16 sliced DMAs"
        )
    if init_d.shape != (b, ef) or init_i.shape != (b, ef):
        raise ValueError("init beam shape mismatch")
    if pick_xfer not in ("dma", "scalar"):
        raise ValueError(f"unknown pick_xfer {pick_xfer!r}")
    if patience <= 0:
        patience = max(ef // 4, 10)  # src/hnsw_algo.c:368
    if max_iters <= 0:
        max_iters = 2 * (ef // e + 1) + patience // e + 8

    tb = -(-min(tb, max(8, b)) // 8) * 8  # f32 sublane-aligned tile
    # VMEM: nbuf wide blocks + the persistent beam/candidate scratch +
    # double-buffered q/init/out blocks + merge temporaries (~3 widths)
    def est(t):
        return (
            nbuf * r0 * dw * 2
            + t * (e * r0 * 8 + ef * 12 + e * 4)
            + 2 * t * (d + 4 * ef) * 4
            + 3 * t * (ef + e * r0) * 4
        )
    while tb > 8 and est(tb) > _VMEM_BUDGET:
        tb //= 2
    pad = (-b) % tb
    q = queries.astype(jnp.float32)
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        init_d = jnp.pad(init_d, ((0, pad), (0, 0)), constant_values=jnp.inf)
        init_i = jnp.pad(init_i, ((0, pad), (0, 0)), constant_values=-1)
    bp = q.shape[0]

    out_d, out_i = pl.pallas_call(
        partial(
            _beam_loop_kernel, tb=tb, e=e, d=d, ef=ef, patience=patience,
            max_iters=max_iters, nbuf=nbuf, mode=_MODE[metric],
            pick_xfer=pick_xfer,
        ),
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i: (i, 0)),
            pl.BlockSpec((tb, ef), lambda i: (i, 0)),
            pl.BlockSpec((tb, ef), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tb, ef), lambda i: (i, 0)),
            pl.BlockSpec((tb, ef), lambda i: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, r0, dw), packedw.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.VMEM((tb, ef), jnp.float32),
            pltpu.VMEM((tb, ef), jnp.int32),
            pltpu.VMEM((tb, ef), jnp.int32),
            pltpu.VMEM((tb, 1), jnp.int32),
            pltpu.VMEM((tb, e), jnp.int32),
            pltpu.VMEM((tb, e, r0), jnp.float32),
            pltpu.VMEM((tb, e, r0), jnp.int32),
            pltpu.SMEM((tb, e), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, ef), jnp.float32),
            jax.ShapeDtypeStruct((bp, ef), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(q, init_d, init_i, packedw)
    return out_d[:b], out_i[:b]
