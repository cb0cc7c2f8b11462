"""Pallas row-gather: random corpus rows via pipelined per-row DMA.

XLA's gather lowers random row fetches to ~11 GB/s effective on this
v5e (measured; ~70x under HBM bandwidth) — it is the bound on the HNSW
beam loop and the int8-rescore tier. This kernel keeps the table in
HBM, prefetches the indices as scalars, and issues one async DMA per
row with a ring of in-flight copies, writing gathered rows to a VMEM
output block per grid step.

Reference role: the neighbor-row fetches of ``src/hnsw_algo.c:378-433``
at DMA-engine speed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NBUF = 8  # in-flight DMAs per program


def _gather_kernel(ids_ref, table_ref, out_ref, sems, *, rb: int):
    # table/out are viewed as [*, 8, d//8]: one row = one (8, d//8)
    # block, satisfying Mosaic's 8-sublane slice alignment
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
    idx: jax.Array,     # [M] int32 (M % rb == 0 after caller padding)
    rb: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Gathered ``table[idx]`` (rows) via pipelined DMA. ``idx`` must be
    in-range (clamp at the call site); M must be a multiple of ``rb``
    (pad with 0 and slice); d must be a multiple of 8 (the row is DMA'd
    as an aligned (8, d/8) block)."""
    m = idx.shape[0]
    n, d = table.shape
    if d % 8:
        raise ValueError("gather_rows requires d % 8 == 0")
    grid = (m // rb,)
    t3 = table.reshape(n, 8, d // 8)
    out = pl.pallas_call(
        partial(_gather_kernel, rb=rb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (rb, 8, d // 8), lambda i, ids: (i, 0, 0)
            ),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_NBUF,))],
        ),
        out_shape=jax.ShapeDtypeStruct((m, 8, d // 8), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx, t3)
    return out.reshape(m, d)
