"""Fused Pallas distance + top-k kernel for exact (flat) KNN.

The reference computes one scalar distance per graph edge with SIMD
loops (``src/vec_math.c``); on TPU the equivalent speed-of-light design
streams the corpus through VMEM, computes ``(TB x TC)`` distance tiles
on the MXU, and folds each tile into a running per-query top-k held in
VMEM scratch — the full ``[B, N]`` distance matrix is never
materialized in HBM.

Grid layout is **corpus-major**: the corpus chunk index is the outer
grid dimension and the query tile the inner one, so the corpus (the
big array) is DMA'd from HBM exactly once per call regardless of the
query count; query tiles (small) re-stream per chunk. The running
top-k for *all* queries lives in one persistent VMEM scratch indexed
by the inner grid position. This keeps the kernel MXU-bound: at
1M x 768 x 4096 queries the corpus read is ~2 ms while the matmul work
is ~30 ms.

Top-k maintenance is k rounds of (row-min, replace-current-worst): at
most k values from any tile can enter the global top-k, so this is
exact. Results come back unsorted; callers sort the tiny ``[B, k]``
output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from muninn_tpu.ops.distance import Metric, parse_metric, squared_norms

_BIG = 3.0e38  # plain float: jnp scalars would be captured consts in the kernel
_MODE = {Metric.L2: 0, Metric.COSINE: 1, Metric.INNER_PRODUCT: 2}


def _flat_topk_kernel(
    q_ref,      # [TB, d] f32/bf16 (query tile i)
    c_ref,      # [TC, d] f32/bf16 (corpus chunk j)
    cn_ref,     # [1, TC] f32  corpus sqnorms (inf -> masked slot)
    qn_ref,     # [TB, 1] f32  query sqnorms
    od_ref,     # [TB, k] f32  out dists (unsorted)
    oi_ref,     # [TB, k] i32  out ids   (global corpus ids)
    sd_ref,     # [BP, k] f32  scratch dists (all query tiles)
    si_ref,     # [BP, k] i32  scratch ids
    *,
    k: int,
    tb: int,
    tc: int,
    mode: int,
    mxu_precision: jax.lax.Precision,
):
    j = pl.program_id(0)   # corpus chunk (outer: corpus is read once)
    i = pl.program_id(1)   # query tile   (inner)
    nj = pl.num_programs(0)
    row = pl.multiple_of(i * tb, tb)

    @pl.when(j == 0)
    def _init():
        sd_ref[pl.ds(row, tb), :] = jnp.full((tb, k), _BIG, jnp.float32)
        si_ref[pl.ds(row, tb), :] = jnp.full((tb, k), -1, jnp.int32)

    dots = jax.lax.dot_general(
        q_ref[:], c_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=mxu_precision,
    )  # [TB, TC]
    cn = cn_ref[0, :][None, :]
    if mode == 0:      # l2: qn + cn - 2*dot
        tile = qn_ref[:] + cn - 2.0 * dots
    elif mode == 1:    # cosine on pre-normalized vectors: 1 - dot
        tile = (1.0 - dots) + jnp.where(cn > _BIG * 0.5, _BIG, 0.0)
    else:              # inner product: -dot
        tile = -dots + jnp.where(cn > _BIG * 0.5, _BIG, 0.0)
    tile = jnp.minimum(tile, _BIG)  # masked slots stay finite-but-huge

    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (tile.shape[0], k), 1)

    sd = sd_ref[pl.ds(row, tb), :]
    si = si_ref[pl.ds(row, tb), :]

    # fold the best tile candidate into the running top-k, repeating
    # only while some row can still improve: over a full stream each
    # row admits ~k*ln(n_chunks)/n_chunks entries per tile, so this
    # loop almost always runs 1-3 rounds, not k — the extraction is
    # exact (at most k values per tile can enter the final top-k) but
    # the k-round worst case is paid only by the tiles that need it.
    def cond(state):
        tile, sd, si, tmin, worst, r = state
        return jnp.any(tmin < worst) & (r < k)

    def body(state):
        tile, sd, si, tmin, worst, r = state
        tpos = jnp.min(jnp.where(tile <= tmin, col, 2**30), axis=1,
                       keepdims=True)                                   # [TB,1]
        tid = j * tc + tpos                                             # [TB,1]
        wpos = jnp.min(jnp.where(sd >= worst, kcol, 2**30), axis=1,
                       keepdims=True)                                   # [TB,1]
        take = tmin < worst
        sel = (kcol == wpos) & take
        sd = jnp.where(sel, tmin, sd)
        si = jnp.where(sel, tid, si)
        tile = jnp.where(col == tpos, _BIG, tile)
        tmin = jnp.min(tile, axis=1, keepdims=True)
        worst = jnp.max(sd, axis=1, keepdims=True)
        return tile, sd, si, tmin, worst, r + 1

    tmin0 = jnp.min(tile, axis=1, keepdims=True)
    worst0 = jnp.max(sd, axis=1, keepdims=True)
    _, sd, si, _, _, _ = jax.lax.while_loop(
        cond, body, (tile, sd, si, tmin0, worst0, jnp.int32(0))
    )
    sd_ref[pl.ds(row, tb), :] = sd
    si_ref[pl.ds(row, tb), :] = si

    @pl.when(j == nj - 1)
    def _emit():
        od_ref[:] = jnp.where(sd >= _BIG * 0.5, jnp.inf, sd)
        oi_ref[:] = jnp.where(sd >= _BIG * 0.5, -1, si)


def _pad_to(x: jax.Array, mult: int, axis: int, value) -> jax.Array:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@partial(
    jax.jit,
    static_argnames=("k", "metric", "tb", "tc", "interpret", "precision"),
)
def flat_topk(
    queries: jax.Array,
    corpus: jax.Array,
    k: int,
    *,
    metric: Metric | str = Metric.L2,
    corpus_valid: jax.Array | None = None,
    tb: int = 256,
    tc: int = 1024,
    interpret: bool = False,
    precision: str = "highest",
) -> tuple[jax.Array, jax.Array]:
    """Exact smallest-k over the corpus. Returns ``(dists [B,k], ids [B,k])``
    sorted ascending; invalid/masked slots are ``(inf, -1)``.

    ``corpus_valid``: optional bool ``[N]`` — False rows (padding /
    soft-deleted, the ``deleted`` flag of ``src/hnsw_algo.h:24``) never
    appear in results.

    ``precision``: "highest" (exact f32, 3-pass MXU), "default"
    (f32 inputs, bf16 MXU passes), or "bfloat16" (bf16 inputs,
    1-pass MXU, f32 accumulation; ranking-accurate for embeddings —
    and halves the corpus HBM traffic, which the kernel reads once).
    """
    metric = parse_metric(metric)
    b, d = queries.shape
    n = corpus.shape[0]

    q = queries.astype(jnp.float32)
    c = corpus.astype(jnp.float32)
    if metric is Metric.COSINE:
        # pre-normalize so cosine distance = 1 - dot
        qn_ = jnp.linalg.norm(q, axis=1, keepdims=True)
        cn_ = jnp.linalg.norm(c, axis=1, keepdims=True)
        q = q / jnp.maximum(qn_, 1e-30)
        c = c / jnp.maximum(cn_, 1e-30)

    # pad feature dim to lane multiple (zeros preserve dot & sqnorm)
    q = _pad_to(q, 128, 1, 0.0)
    c = _pad_to(c, 128, 1, 0.0)
    q = _pad_to(q, tb, 0, 0.0)
    c = _pad_to(c, tc, 0, 0.0)

    cn = squared_norms(c)
    valid = jnp.arange(c.shape[0]) < n
    if corpus_valid is not None:
        valid = valid & _pad_to(corpus_valid.astype(bool), tc, 0, False)
    cn = jnp.where(valid, cn, jnp.inf)[None, :]      # [1, N_pad]
    qn = squared_norms(q)[:, None]                   # [B_pad, 1]

    if precision == "bfloat16":
        q = q.astype(jnp.bfloat16)
        c = c.astype(jnp.bfloat16)

    bp, dp = q.shape
    np_, _ = c.shape
    # corpus chunks outer, query tiles inner: the corpus streams from
    # HBM exactly once per call
    grid = (np_ // tc, bp // tb)

    mxu_precision = (
        jax.lax.Precision.HIGHEST if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    kernel = partial(
        _flat_topk_kernel, k=k, tb=tb, tc=tc, mode=_MODE[metric],
        mxu_precision=mxu_precision,
    )
    od, oi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, dp), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, dp), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, k), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bp, k), jnp.float32),
            pltpu.VMEM((bp, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * np_ * dp,
            bytes_accessed=(
                np_ * dp * q.dtype.itemsize          # corpus: once
                + bp * dp * q.dtype.itemsize * grid[0]  # queries: per chunk
                + bp * k * 8
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, c, cn, qn)

    od, oi = od[:b], oi[:b]
    order = jnp.argsort(od, axis=-1)
    od = jnp.take_along_axis(od, order, axis=-1)
    oi = jnp.take_along_axis(oi, order, axis=-1)
    return od, oi
