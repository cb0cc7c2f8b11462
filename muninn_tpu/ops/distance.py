"""Batched distance kernels.

TPU-native replacement for the reference's ``src/vec_math.c`` (NEON/SSE
scalar distance loops, one call per graph edge). On TPU the unit of work
is a *block* of distances: ``(B queries x N candidates)`` computed as one
MXU matmul plus cheap elementwise epilogue, so all three metrics share a
single compute path.

Distance semantics match the reference exactly
(``src/vec_math.h:16-31``): smaller = more similar.

- ``l2``:            squared Euclidean (no sqrt — monotonic for ranking)
- ``cosine``:        1 - cos(a, b)   (0 identical, 2 opposite)
- ``inner_product``: -dot(a, b)

Metric name parsing mirrors ``vec_parse_metric`` (``src/vec_math.c:192-204``).
"""

from __future__ import annotations

import enum
from functools import partial

import jax
import jax.numpy as jnp

_EPS_NORM = 1e-30  # matches reference denom guard, src/vec_math.c:163


class Metric(enum.Enum):
    L2 = "l2"
    COSINE = "cosine"
    INNER_PRODUCT = "inner_product"


def parse_metric(name: str | Metric) -> Metric:
    """Parse a metric name. Raises ValueError on invalid input
    (reference returns -1: ``src/vec_math.c:192-204``)."""
    if isinstance(name, Metric):
        return name
    try:
        return Metric(name)
    except ValueError:
        raise ValueError(
            f"invalid metric {name!r}: expected one of "
            f"{[m.value for m in Metric]}"
        ) from None


def squared_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, f32 accumulation."""
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)


@partial(jax.jit, static_argnames=("metric", "precision"))
def pairwise_distances(
    queries: jax.Array,
    corpus: jax.Array,
    metric: Metric = Metric.L2,
    *,
    corpus_sqnorm: jax.Array | None = None,
    precision: str = "float32",
) -> jax.Array:
    """All-pairs distances ``[B, N]`` between queries ``[B, d]`` and
    corpus ``[N, d]``.

    One ``B x d x N`` matmul on the MXU + an elementwise epilogue that XLA
    fuses; this replaces per-edge calls to ``dist_func`` in the
    reference's hot loops (``src/hnsw_algo.c:265-280,378-433``).

    precision: "float32" (exact) or "bfloat16" (inputs cast to bf16,
    f32 accumulation — ~2x MXU throughput, adequate for ANN ranking).
    """
    metric = parse_metric(metric)
    if precision == "bfloat16":
        q = queries.astype(jnp.bfloat16)
        c = corpus.astype(jnp.bfloat16)
        prec = None  # bf16 inputs, f32 accumulation: native MXU path
    else:
        q = queries.astype(jnp.float32)
        c = corpus.astype(jnp.float32)
        # TPU matmuls default to bf16 passes; exact f32 distances need
        # the 3-pass (HIGHEST) mode.
        prec = jax.lax.Precision.HIGHEST

    dots = jax.lax.dot_general(
        q,
        c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # [B, N]

    if metric is Metric.INNER_PRODUCT:
        return -dots
    if metric is Metric.L2:
        qn = squared_norms(queries)[:, None]
        cn = (corpus_sqnorm if corpus_sqnorm is not None else squared_norms(corpus))[None, :]
        # clamp: exact-match pairs can go slightly negative in f32
        return jnp.maximum(qn + cn - 2.0 * dots, 0.0)
    # cosine
    qn = jnp.sqrt(squared_norms(queries))[:, None]
    cn = jnp.sqrt(corpus_sqnorm if corpus_sqnorm is not None else squared_norms(corpus))[None, :]
    denom = qn * cn
    sim = jnp.where(denom < _EPS_NORM, 0.0, dots / jnp.maximum(denom, _EPS_NORM))
    return 1.0 - sim


@partial(jax.jit, static_argnames=("metric",))
def gathered_distances(
    queries: jax.Array,
    candidate_vectors: jax.Array,
    metric: Metric = Metric.L2,
) -> jax.Array:
    """Per-query candidate distances ``[B, C]`` for queries ``[B, d]``
    against per-query gathered candidate vectors ``[B, C, d]``.

    Used by beam search where each query expands its own candidate set
    (the TPU analogue of the reference's neighbor-scan loops,
    ``src/hnsw_algo.c:378-433``). Batched matvec on the VPU/MXU.
    """
    metric = parse_metric(metric)
    q = queries.astype(jnp.float32)
    c = candidate_vectors.astype(jnp.float32)
    dots = jnp.einsum(
        "bd,bcd->bc", q, c,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric is Metric.INNER_PRODUCT:
        return -dots
    if metric is Metric.L2:
        qn = jnp.sum(q * q, axis=-1)[:, None]
        cn = jnp.sum(c * c, axis=-1)
        return jnp.maximum(qn + cn - 2.0 * dots, 0.0)
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1))[:, None]
    cn = jnp.sqrt(jnp.sum(c * c, axis=-1))
    denom = qn * cn
    sim = jnp.where(denom < _EPS_NORM, 0.0, dots / jnp.maximum(denom, _EPS_NORM))
    return 1.0 - sim


def normalize_rows(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize rows (used for cosine pre-normalization; the
    reference normalizes at embed time, ``src/llama_embed.c:118-191``)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def quantize_rows_int8(v, normalize: bool = False):
    """Symmetric per-row int8 quantization — THE int8 contract shared by
    every engine (flat/quantized/HNSW shadow/IVF blocks/projected tier):
    ``vi = clip(round(v / s), -127, 127)`` with one scale
    ``s = max|row| / 127`` per row (last axis = the vector axis; leading
    axes pass through, so [N, d] and [ncl, S, d] both work).
    ``normalize=True`` L2-normalizes rows first (cosine storage: the
    scale then carries the full row magnitude, so 1 - dot is the cosine
    distance). Returns ``(int8 rows, f32 scales[leading axes])``."""
    v = v.astype(jnp.float32)
    if normalize:
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    sc = jnp.max(jnp.abs(v), axis=-1) / 127.0
    vi = jnp.clip(
        jnp.round(v / jnp.maximum(sc[..., None], 1e-30)), -127, 127
    ).astype(jnp.int8)
    return vi, sc.astype(jnp.float32)
