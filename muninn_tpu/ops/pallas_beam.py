"""Fused DMA-gather + distance kernel for the HNSW beam.

The beam's hot step scores the packed neighborhoods of the picked
expansion nodes: ``packed[pick_i]`` is ``[B, E, R0, d]`` (one contiguous
``[R0, d]`` block per expansion). As separate XLA ops this costs three
HBM passes per iteration — the gather reads the blocks, WRITES the
``[B, E*R0, d]`` intermediate back to HBM, and the distance reduce reads
it again — so two-thirds of the traffic is the intermediate, not the
data. This kernel keeps each gathered block in VMEM: per (query,
expansion) pick it issues one aligned async copy of the ``[R0, d]``
block, overlaps the next DMAs with the dot-product reduce of the
current block, and emits only the tiny ``[B, E, R0]`` dot/sqnorm
surfaces. HBM bytes drop to the gather reads alone (~3x less).

Role: the neighbor-scan distance loop of the reference's beam search
(``src/hnsw_algo.c:378-433``), at TPU block granularity.

Layout constraints (Mosaic sliced DMAs move whole (sublane x 128)
tiles): ``R0`` must be a multiple of the dtype's sublane count (16 for
bf16, 8 for f32) and ``d`` a multiple of 128. The caller falls back to
the XLA gather path when these don't hold (``index/hnsw.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muninn_tpu.ops.distance import Metric

_NBUF = 8  # in-flight block DMAs per program (default; see gather_block_dots)
_VMEM_BUDGET = 12 * 1024 * 1024  # scoped-VMEM stack target (16 MB hard cap)
_SMEM_IDS_BUDGET = 512 * 1024    # scalar-prefetch id bytes (1 MB hard cap)
_BIG = 3.0e38
_MODE = {Metric.L2: 0, Metric.COSINE: 1, Metric.INNER_PRODUCT: 2}


def _sublanes(dtype) -> int:
    return {2: 16, 1: 32}.get(jnp.dtype(dtype).itemsize, 8)


def _beam_dots_kernel(
    ids_ref,     # [B*E] int32 (scalar prefetch): rows of `packed`, -1 = dead
    q_ref,       # [TB, d] f32 (VMEM, blocked by query tile)
    packed_ref,  # [cap, R0, d] bf16/f32 (HBM)
    dots_ref,    # [TB, E, R0] f32 out
    cn2_ref,     # [TB, E, R0] f32 out (candidate squared norms)
    buf_ref,     # [NBUF, R0, d] scratch (packed dtype)
    sems,        # DMA semaphores [NBUF]
    *,
    tb: int,
    e: int,
    nbuf: int,
):
    base = pl.program_id(0) * tb * e

    def dma(p):
        return pltpu.make_async_copy(
            packed_ref.at[ids_ref[base + p]],
            buf_ref.at[p % nbuf],
            sems.at[p % nbuf],
        )

    def start_if_live(p):
        # Dead picks (id -1: converged/stalled queries, invalid beam
        # slots) never issue their copy — copy ISSUE is the beam's
        # measured floor (~260 ns each, DEVELOPMENT.md "Beam DMA
        # economics"), and a batch's while_loop runs to its slowest
        # query, so late iterations are mostly dead picks.
        @pl.when(ids_ref[base + p] >= 0)
        def _():
            dma(p).start()

    total = tb * e
    for p in range(min(nbuf, total)):
        start_if_live(p)

    def body(p, carry):
        t = p // e
        ei = p % e
        live = ids_ref[base + p] >= 0

        @pl.when(live)
        def _():
            dma(p).wait()
            blk = buf_ref[p % nbuf].astype(jnp.float32)       # [R0, d]
            qrow = q_ref[pl.ds(t, 1), :]                      # [1, d]
            dots = jnp.sum(blk * qrow, axis=1)                # [R0]
            cn2 = jnp.sum(blk * blk, axis=1)                  # [R0]
            dots_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = dots[None, None, :]
            cn2_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = cn2[None, None, :]

        @pl.when(jnp.logical_not(live))
        def _():
            # deterministic defaults (callers mask dead lanes, but the
            # out block is uninitialized VMEM — never leak garbage)
            dots_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = jnp.zeros(
                (1, 1, dots_ref.shape[2]), jnp.float32
            )
            cn2_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = jnp.zeros(
                (1, 1, cn2_ref.shape[2]), jnp.float32
            )

        @pl.when(p + nbuf < total)
        def _():
            start_if_live(p + nbuf)

        return carry

    jax.lax.fori_loop(0, total, body, 0)


@partial(jax.jit, static_argnames=("tb", "interpret", "nbuf"))
def gather_block_dots(
    queries: jax.Array,   # [B, d] f32
    idx: jax.Array,       # [B, E] int32, in-range; -1 = dead pick (skipped)
    packed: jax.Array,    # [cap, R0, d] bf16/f32
    tb: int = 256,
    interpret: bool = False,
    nbuf: int = _NBUF,
) -> tuple[jax.Array, jax.Array]:
    """Per-pick block dots and candidate squared norms:
    ``dots[b, j] = <queries[b], packed[idx[b, j // R0]][j % R0]>`` and
    ``cn2`` the matching row squared norms, both ``[B, E*R0]`` f32.
    The metric epilogue (cosine/l2/ip) stays in XLA where it fuses with
    the beam's masking — this kernel only kills the HBM intermediate.
    """
    b, d = queries.shape
    _, r0, dp = packed.shape
    e = idx.shape[1]
    if dp != d:
        raise ValueError(f"packed dim {dp} != query dim {d}")
    if d % 128 != 0 or r0 % _sublanes(packed.dtype) != 0:
        raise ValueError(
            f"unaligned block [{r0}, {d}] for {packed.dtype}: need "
            f"d % 128 == 0 and R0 % {_sublanes(packed.dtype)} == 0"
        )
    tb = min(tb, max(8, b))
    # Mosaic double-buffers the grid-blocked operands: 2 copies each of
    # the [tb, d] f32 query block and the two [tb, e, r0] f32 outputs
    # live on the scoped-VMEM stack alongside the nbuf DMA scratch
    # blocks. At large e*r0 (e.g. IVF nprobe=32 x S=128) the default
    # tile overruns the 16 MB limit — halve the query tile until the
    # estimate fits (budget leaves headroom for Mosaic temporaries).
    fixed = nbuf * r0 * d * jnp.dtype(packed.dtype).itemsize
    while tb > 8 and fixed + 2 * tb * (2 * e * r0 + d) * 4 > _VMEM_BUDGET:
        tb //= 2
    pad = (-b) % tb
    q = queries.astype(jnp.float32)
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)), constant_values=-1)
    bp = q.shape[0]

    def call(qc, idsc):
        bc = qc.shape[0]
        return pl.pallas_call(
            partial(_beam_dots_kernel, tb=tb, e=e, nbuf=nbuf),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bc // tb,),
                in_specs=[
                    pl.BlockSpec((tb, d), lambda i, ids: (i, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((tb, e, r0), lambda i, ids: (i, 0, 0)),
                    pl.BlockSpec((tb, e, r0), lambda i, ids: (i, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((nbuf, r0, d), packed.dtype),
                    pltpu.SemaphoreType.DMA((nbuf,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bc, e, r0), jnp.float32),
                jax.ShapeDtypeStruct((bc, e, r0), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idsc.reshape(-1).astype(jnp.int32), qc, packed)

    # The scalar-prefetch id operand lives in SMEM (1 MB hard cap):
    # (shared by gather_block_dots and gather_block_topm)
    # at bp*e ids it overflows for large batches x wide expansions
    # (e.g. 8192 queries x nprobe=32 = 1 MB exactly). Chunk the query
    # batch so each kernel call's id block fits with headroom, mapping
    # the (compiled-once) kernel over the chunks.
    if bp * e * 4 <= _SMEM_IDS_BUDGET:
        dots, cn2 = call(q, idx)
    else:
        bc = max(tb, _SMEM_IDS_BUDGET // (4 * e * tb) * tb)
        extra = (-bp) % bc
        if extra:
            q = jnp.pad(q, ((0, extra), (0, 0)))
            idx = jnp.pad(idx, ((0, extra), (0, 0)), constant_values=-1)
        nch = q.shape[0] // bc
        dots, cn2 = jax.lax.map(
            lambda xs: call(xs[0], xs[1]),
            (q.reshape(nch, bc, d), idx.reshape(nch, bc, e)),
        )
        dots = dots.reshape(nch * bc, e, r0)
        cn2 = cn2.reshape(nch * bc, e, r0)
    return (
        dots[:b].reshape(b, e * r0),
        cn2[:b].reshape(b, e * r0),
    )


def _beam_topm_kernel(
    ids_ref,     # [B*E] int32 (scalar prefetch): rows of `packed` to score
    q_ref,       # [TB, d] f32 (VMEM)
    qn_ref,      # [TB, 1] f32 query squared norms
    pen_ref,     # [TB, E, R0] f32 additive penalty (+BIG = masked out)
    packed_ref,  # [cap, R0, d] bf16/f32 (HBM)
    od_ref,      # [TB, E, M] f32 out distances, ascending (+BIG padded)
    ol_ref,      # [TB, E, M] i32 out local neighbor indices in [0, R0)
    buf_ref,     # [NBUF, R0, d] scratch
    sems,        # DMA semaphores [NBUF]
    *,
    tb: int,
    e: int,
    m: int,
    nbuf: int,
    mode: int,
):
    base = pl.program_id(0) * tb * e

    def dma(p):
        return pltpu.make_async_copy(
            packed_ref.at[ids_ref[base + p]],
            buf_ref.at[p % nbuf],
            sems.at[p % nbuf],
        )

    def start_if_live(p):
        # dead picks (id -1) never issue their copy — see
        # _beam_dots_kernel
        @pl.when(ids_ref[base + p] >= 0)
        def _():
            dma(p).start()

    total = tb * e
    for p in range(min(nbuf, total)):
        start_if_live(p)

    def body(p, carry):
        t = p // e
        ei = p % e
        live = ids_ref[base + p] >= 0

        @pl.when(live)
        def _():
            dma(p).wait()
            blk = buf_ref[p % nbuf].astype(jnp.float32)       # [R0, d]
            qrow = q_ref[pl.ds(t, 1), :]                      # [1, d]
            dots = jnp.sum(blk * qrow[0][None, :], axis=1)[None, :]  # [1, R0]
            if mode == 2:
                dist = -dots
            else:
                cn2 = jnp.sum(blk * blk, axis=1)[None, :]     # [1, R0]
                qn2 = qn_ref[pl.ds(t, 1), :]                  # [1, 1]
                if mode == 0:
                    dist = jnp.maximum(qn2 + cn2 - 2.0 * dots, 0.0)
                else:
                    denom = jnp.sqrt(qn2) * jnp.sqrt(cn2)
                    sim = jnp.where(
                        denom < 1e-30, 0.0, dots / jnp.maximum(denom, 1e-30)
                    )
                    dist = 1.0 - sim
            dist = dist + pen_ref[pl.ds(t, 1), pl.ds(ei, 1), :].reshape(1, -1)
            # iterative top-m: m unrolled (min, argmin, mask) rounds on
            # the [1, R0] row — VPU work, negligible next to the DMA
            r0 = dist.shape[1]
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, r0), 1)
            ds, ls = [], []
            for _ in range(m):
                mn = jnp.min(dist, axis=1, keepdims=True)              # [1,1]
                loc = jnp.min(
                    jnp.where(dist == mn, iota, r0), axis=1, keepdims=True
                )
                ds.append(mn)
                ls.append(loc)
                dist = jnp.where(iota == loc, _BIG, dist)
            od_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = (
                jnp.concatenate(ds, axis=1).reshape(1, 1, m)
            )
            ol_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = (
                jnp.concatenate(ls, axis=1).astype(jnp.int32).reshape(1, 1, m)
            )

        @pl.when(jnp.logical_not(live))
        def _():
            # masked-out padding (dist >= _BIG/2) at a valid local index
            od_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = jnp.full(
                (1, 1, m), _BIG, jnp.float32
            )
            ol_ref[pl.ds(t, 1), pl.ds(ei, 1), :] = jnp.zeros(
                (1, 1, m), jnp.int32
            )

        @pl.when(p + nbuf < total)
        def _():
            start_if_live(p + nbuf)

        return carry

    jax.lax.fori_loop(0, total, body, 0)


@partial(jax.jit, static_argnames=("metric", "m", "tb", "interpret", "nbuf"))
def gather_block_topm(
    queries: jax.Array,   # [B, d] f32
    idx: jax.Array,       # [B, E] int32, in-range; -1 = dead pick (skipped)
    packed: jax.Array,    # [cap, R0, d] bf16/f32
    penalty: jax.Array,   # [B, E*R0] f32 additive (+BIG = drop candidate)
    metric: Metric = Metric.COSINE,
    m: int = 16,
    tb: int = 256,
    interpret: bool = False,
    nbuf: int = _NBUF,
) -> tuple[jax.Array, jax.Array]:
    """Fused gather + metric epilogue + per-pick top-m.

    Same DMA pipeline as :func:`gather_block_dots`, but the distance
    epilogue AND the per-block candidate selection happen in-kernel:
    only the ``m`` best (distance, local index) pairs per (query, pick)
    leave the kernel — the beam's downstream dedup/merge runs over
    ``E*m`` candidates instead of ``E*R0`` (the merge + O(C^2) dedup
    tail is the fused beam's largest non-DMA cost; DEVELOPMENT.md
    "Beam DMA economics"). ``penalty`` carries the caller's masking
    (already-in-beam / padding) so masked candidates can't crowd the
    top-m. Returns ``(dists [B, E, m] ascending, local_idx [B, E, m])``;
    entries with ``dist >= _BIG/2`` are masked-out padding.
    """
    b, d = queries.shape
    _, r0, dp = packed.shape
    e = idx.shape[1]
    if dp != d:
        raise ValueError(f"packed dim {dp} != query dim {d}")
    if d % 128 != 0 or r0 % _sublanes(packed.dtype) != 0:
        raise ValueError(
            f"unaligned block [{r0}, {d}] for {packed.dtype}: need "
            f"d % 128 == 0 and R0 % {_sublanes(packed.dtype)} == 0"
        )
    if not 0 < m <= r0:
        raise ValueError(f"m={m} must be in (0, R0={r0}]")
    mode = _MODE[metric]
    tb = min(tb, max(8, b))
    # VMEM: nbuf scratch blocks + double-buffered [tb, d] f32 queries,
    # [tb, 1] norms, [tb, e, r0] f32 penalties, and [tb, e, m] f32+i32
    # outputs
    fixed = nbuf * r0 * d * jnp.dtype(packed.dtype).itemsize
    while tb > 8 and fixed + 2 * tb * (e * r0 + 2 * e * m + d + 1) * 4 > _VMEM_BUDGET:
        tb //= 2
    pad = (-b) % tb
    q = queries.astype(jnp.float32)
    qn2 = jnp.sum(q * q, axis=1, keepdims=True)
    pen = penalty.astype(jnp.float32).reshape(b, e, r0)
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        qn2 = jnp.pad(qn2, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)), constant_values=-1)
        pen = jnp.pad(pen, ((0, pad), (0, 0), (0, 0)))
    bp = q.shape[0]

    def call(qc, qnc, idsc, penc):
        bc = qc.shape[0]
        return pl.pallas_call(
            partial(_beam_topm_kernel, tb=tb, e=e, m=m, nbuf=nbuf, mode=mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bc // tb,),
                in_specs=[
                    pl.BlockSpec((tb, d), lambda i, ids: (i, 0)),
                    pl.BlockSpec((tb, 1), lambda i, ids: (i, 0)),
                    pl.BlockSpec((tb, e, r0), lambda i, ids: (i, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((tb, e, m), lambda i, ids: (i, 0, 0)),
                    pl.BlockSpec((tb, e, m), lambda i, ids: (i, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((nbuf, r0, d), packed.dtype),
                    pltpu.SemaphoreType.DMA((nbuf,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((bc, e, m), jnp.float32),
                jax.ShapeDtypeStruct((bc, e, m), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(idsc.reshape(-1).astype(jnp.int32), qc, qnc, penc, packed)

    if bp * e * 4 <= _SMEM_IDS_BUDGET:
        od, ol = call(q, qn2, idx, pen)
    else:
        bc = max(tb, _SMEM_IDS_BUDGET // (4 * e * tb) * tb)
        extra = (-bp) % bc
        if extra:
            q = jnp.pad(q, ((0, extra), (0, 0)))
            qn2 = jnp.pad(qn2, ((0, extra), (0, 0)))
            idx = jnp.pad(idx, ((0, extra), (0, 0)), constant_values=-1)
            pen = jnp.pad(pen, ((0, extra), (0, 0), (0, 0)))
        nch = q.shape[0] // bc
        od, ol = jax.lax.map(
            lambda xs: call(*xs),
            (q.reshape(nch, bc, d), qn2.reshape(nch, bc, 1),
             idx.reshape(nch, bc, e), pen.reshape(nch, bc, e, r0)),
        )
        od = od.reshape(nch * bc, e, m)
        ol = ol.reshape(nch * bc, e, m)
    return od[:b], ol[:b]
