"""Pallas row-gather: random corpus rows via pipelined per-row DMA.

Built to test whether a hand-pipelined DMA gather could beat XLA's
gather for random row fetches (the HNSW beam's and the int8-rescore
tier's bound). MEASURED RESULT (v5e, [1M, 768] f32, 131k random rows):
XLA gather ~11.6 GB/s, this kernel ~12.9 GB/s — both sit at the
hardware's random-fetch rate, so XLA's gather is already at
speed-of-light for this pattern (see DEVELOPMENT.md). The kernel is
kept as working DMA-pipeline infrastructure (and the negative result's
documentation); production paths use plain indexing.

Mosaic constraints shaped the layout: sliced DMAs must move whole
(sublane x 128)-aligned tiles, so each row is padded to a full tile
row ((8, 128) for f32/int32, (16, 128) for bf16) and copied as one
aligned block.

Reference role: the neighbor-row fetches of ``src/hnsw_algo.c:378-433``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NBUF = 8  # in-flight DMAs per program


def _sublanes(dtype) -> int:
    return {2: 16, 1: 32}.get(jnp.dtype(dtype).itemsize, 8)


def _gather_kernel(ids_ref, table_ref, out_ref, sems, *, rb: int):
    # table/out are [*, S, 128] — one row = one aligned (S, 128) tile
    base = pl.program_id(0) * rb

    def dma(i):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[base + i]],
            out_ref.at[i],
            sems.at[i % _NBUF],
        )

    for i in range(min(_NBUF, rb)):
        dma(i).start()

    def body(i, carry):
        dma(i).wait()

        @pl.when(i + _NBUF < rb)
        def _():
            dma(i + _NBUF).start()

        return carry

    jax.lax.fori_loop(0, rb, body, 0)


@partial(jax.jit, static_argnames=("rb", "interpret"))
def gather_rows(
    table: jax.Array,   # [N, d]
    idx: jax.Array,     # [M] int32, in-range (clamp at the call site)
    rb: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Gathered ``table[idx]`` (rows) via pipelined DMA. M must be a
    multiple of ``rb`` (pad and slice at the call site). Rows pad up to
    a whole (sublane x 128) tile for the aligned copies."""
    m = idx.shape[0]
    n, d = table.shape
    sub = _sublanes(table.dtype)
    unit = sub * 128
    dp = -(-d // unit) * unit
    t3 = jnp.pad(table, ((0, 0), (0, dp - d))).reshape(n, -1, 128)
    blk = t3.shape[1]
    out = pl.pallas_call(
        partial(_gather_kernel, rb=rb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // rb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (rb, blk, 128), lambda i, ids: (i, 0, 0)
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_NBUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((m, blk, 128), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, t3)
    return out.reshape(m, dp)[:, :d]
