"""Multi-host (DCN x ICI) sharding for corpora beyond one host's HBM.

The single-host layer (``parallel/sharded.py``) uses a 1-D mesh whose
collectives ride ICI. Past ~16 GB of vectors (v5e host: 8 chips x
16 GB), the corpus must span hosts, and the mesh becomes 2-D:

    mesh axes: ("host", "chip")   # host = DCN, chip = ICI

Design rules (the scaling-book recipe — pick a mesh, annotate
shardings, let XLA insert collectives, keep the fat traffic on ICI):

- The corpus row axis shards over BOTH mesh axes (each chip holds
  N / (H*C) rows). Every chip computes its local top-k.
- The top-k merge is HIERARCHICAL: ``all_gather`` over "chip" (ICI,
  cheap, C partials) and merge, then ``all_gather`` over "host" (DCN,
  expensive — but the payload is the already-merged [B, k], i.e. the
  minimum possible bytes cross-host: O(B*k), never O(B*N/H)).
- Replicated small state (queries, merged results) is identical on
  all devices, so callers use the arrays directly.

On this environment multi-host hardware does not exist; the layer is
validated on a virtual device grid (``make_mesh2(hosts, chips)`` over
``--xla_force_host_platform_device_count`` CPU devices), which
exercises the same program XLA would partition over real DCN+ICI.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from muninn_tpu.ops.distance import Metric, parse_metric, pairwise_distances
from muninn_tpu.ops.topk import masked_topk


def make_mesh2(hosts: int, chips: int, devices=None) -> Mesh:
    """A ("host", "chip") mesh. On real hardware pass
    ``jax.devices()`` ordered so each row of the grid is one physical
    host (the default order already is); virtually, any devices work."""
    devs = list(jax.devices() if devices is None else devices)
    need = hosts * chips
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.array(devs[:need]).reshape(hosts, chips)
    return Mesh(grid, ("host", "chip"))


def shard_rows2(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Row-shard over both mesh axes (rows % (H*C) == 0)."""
    spec = P(("host", "chip"), *([None] * (x.ndim - 1)))
    return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))


def _merge_axis(ld, li, k: int, axis: str):
    """all_gather tiny [B, k] partials over one mesh axis and keep the
    k best (identical result on every participant)."""
    gd = jax.lax.all_gather(ld, axis)                 # [S, B, k]
    gi = jax.lax.all_gather(li, axis)
    b = ld.shape[0]
    gd = jnp.moveaxis(gd, 0, 1).reshape(b, -1)
    gi = jnp.moveaxis(gi, 0, 1).reshape(b, -1)
    order = jnp.argsort(gd, axis=1)[:, :k]
    return (
        jnp.take_along_axis(gd, order, axis=1),
        jnp.take_along_axis(gi, order, axis=1),
    )


def multihost_exact_search(
    queries: jax.Array,      # [B, d] replicated
    corpus: jax.Array,       # [N_pad, d] sharded over ("host","chip")
    valid: jax.Array,        # [N_pad] bool, same sharding
    k: int,
    metric: Metric | str,
    mesh: Mesh,
):
    """Exact KNN over a corpus sharded across hosts and chips.

    Cross-host traffic is one all_gather of the ICI-merged [B, k]
    partials per query batch — O(B*k*H) bytes on DCN total.
    """
    metric = parse_metric(metric)
    n_pad = corpus.shape[0]
    h = mesh.shape["host"]
    c = mesh.shape["chip"]
    shard_n = n_pad // (h * c)

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(), P(("host", "chip"), None), P(("host", "chip"))),
        out_specs=(P(), P()),
    )
    def _search(q, c_local, v_local):
        hi = jax.lax.axis_index("host")
        ci = jax.lax.axis_index("chip")
        base = (hi * c + ci) * shard_n
        d = pairwise_distances(q, c_local, metric)    # [B, shard_n]
        ids = base + jnp.arange(shard_n, dtype=jnp.int32)[None, :]
        ld, li = masked_topk(d, k, mask=v_local[None, :], ids=ids)
        ld, li = _merge_axis(ld, li, k, "chip")   # ICI: C partials
        ld, li = _merge_axis(ld, li, k, "host")   # DCN: merged [B,k] only
        return ld, li

    return _search(queries, corpus, valid)


def multihost_pagerank(
    src: jax.Array,          # [E_pad] sharded over ("host","chip")
    dst: jax.Array,
    share: jax.Array,        # [E_pad] f32 (0 on pad edges)
    dangling: jax.Array,     # [V] bool replicated
    num_nodes: int,
    mesh: Mesh,
    damping: float = 0.85,
    iterations: int = 20,
) -> jax.Array:
    """Edge-sharded PageRank over the 2-D mesh: per-chip partial SpMV,
    then a psum over BOTH axes completes the pull. XLA lowers the psum
    hierarchically (reduce-scatter/all-reduce on ICI first, then DCN),
    so the cross-host payload is the [V] rank vector per iteration."""

    @partial(
        shard_map,
        mesh=mesh,
        check_vma=False,
        in_specs=(
            P(("host", "chip")), P(("host", "chip")), P(("host", "chip")),
            P(),
        ),
        out_specs=P(),
    )
    def _run(src_l, dst_l, share_l, dang):
        n = num_nodes
        rank = jnp.full((n,), 1.0 / n, jnp.float32)

        def body(_, rank):
            contrib = rank[src_l] * share_l
            partial_ = jax.ops.segment_sum(contrib, dst_l, num_segments=n)
            pulled = jax.lax.psum(partial_, ("host", "chip"))
            dmass = jnp.sum(jnp.where(dang, rank, 0.0))
            return (1.0 - damping) / n + damping * (pulled + dmass / n)

        return jax.lax.fori_loop(0, iterations, body, rank)

    return _run(src, dst, share, dangling)
