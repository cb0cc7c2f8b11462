"""IVF fixed-cost split: routing vs block-scoring vs rescore, 1M x 768.

ivf_int8_probe measured t(q) ≈ 3.4 µs fixed + 1.35 µs/probe with the
wire format irrelevant. This names the fixed part's owner. Napkin says
routing is NOT it (the 9375-centroid scan is a shared streaming matmul:
~28.8 MB once per query tile, ~0.2 µs/query of MXU), and the exact-f32
rescore gather is the candidate (r=32 rows x 3 KB = 98 KB random gather
per query; 0.5-1.2 µs at the measured 84-200 GB/s random-gather rates).
Stages measured cumulatively at p=4, r=32, B=8192:

  route      : centroid top-p only
  score      : + member gather-DMA dots + metric epilogue + validity
  topr       : + top-r candidate extraction
  full       : + exact f32 rescore + sorted_topk_unique (=_ivf_search)

Each returns a small reduced artifact so XLA can't DCE the stage body.
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from muninn_tpu.ops.distance import Metric, pairwise_distances
from muninn_tpu.ops.pallas_beam import gather_block_dots
from muninn_tpu.ops.pallas_flat import flat_topk
from muninn_tpu.index.ivf import IvfIndex, _ivf_search

N, D, K, NQ, P, R = 1_000_000, 768, 10, 8192, 4, 32


def gen(key, n, dim, n_clusters):
    kc, ka, kn, kq, kp = jax.random.split(key, 5)
    centers = jax.random.normal(kc, (n_clusters, dim), jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_clusters)
    x = centers[assign] + 0.3 * jax.random.normal(kn, (n, dim))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    q = x[jax.random.randint(kq, (NQ,), 0, n)]
    q = q + 0.05 * jax.random.normal(kp, (NQ, dim))
    return x, q / jnp.linalg.norm(q, axis=1, keepdims=True)


big, bigq = jax.jit(gen, static_argnums=(1, 2, 3))(jax.random.PRNGKey(3), N, D, 4096)
big.block_until_ready()
print("data ready", flush=True)

t0 = time.time()
ivf = IvfIndex(D, "cosine", cluster_size=128, rescore_r=R,
               capacity=N + 4096, seed=42)
ivf.insert(np.arange(N), big)
_ = np.asarray(ivf.member_slots[0, 0])
print(f"build {time.time() - t0:.1f}s nlist={ivf.nlist}", flush=True)

jbq = jnp.asarray(bigq, jnp.float32)
cent, blocks, mslots_t = ivf.centroids, ivf.blocks, ivf.member_slots
vectors, valid = ivf.store.vectors, ivf.store.valid
metric = ivf.metric


@jax.jit
def route(q):
    _, probe = flat_topk(q, cent, P, metric=metric, precision="default")
    return jnp.maximum(probe, 0)


@jax.jit
def score(q):
    probe = route(q)
    mslots = mslots_t[probe].reshape(q.shape[0], P * blocks.shape[1])
    dots, cn2 = gather_block_dots(q, probe, blocks)
    qn = jnp.sqrt(jnp.sum(q * q, axis=1))[:, None]
    denom = qn * jnp.sqrt(cn2)
    sim = jnp.where(denom < 1e-30, 0.0, dots / jnp.maximum(denom, 1e-30))
    dist = 1.0 - sim
    ok = (mslots >= 0) & valid[jnp.maximum(mslots, 0)]
    dist = jnp.where(ok, dist, jnp.inf)
    return jnp.min(dist, axis=1)  # cheap reduce, keeps the stage live


@jax.jit
def topr(q):
    probe = route(q)
    mslots = mslots_t[probe].reshape(q.shape[0], P * blocks.shape[1])
    dots, cn2 = gather_block_dots(q, probe, blocks)
    qn = jnp.sqrt(jnp.sum(q * q, axis=1))[:, None]
    denom = qn * jnp.sqrt(cn2)
    sim = jnp.where(denom < 1e-30, 0.0, dots / jnp.maximum(denom, 1e-30))
    dist = 1.0 - sim
    ok = (mslots >= 0) & valid[jnp.maximum(mslots, 0)]
    dist = jnp.where(ok, dist, jnp.inf)
    neg, pos = jax.lax.top_k(-dist, R)
    cand = jnp.take_along_axis(mslots, pos, axis=1)
    return jnp.where(jnp.isinf(-neg), -1, cand)


def full(q):
    return _ivf_search(q, cent, blocks, mslots_t, vectors, valid,
                       metric, K, P, R, ivf._fused_ok(), False)[1]


def drain(r):
    float(jnp.asarray(r).reshape(-1)[0].astype(jnp.float32))


def rate(fn, label):
    drain(fn(jbq))
    vals = []
    for _ in range(3):
        t0 = time.time()
        r = None
        for _ in range(3):
            r = fn(jbq)
        drain(r)
        vals.append(NQ * 3 / (time.time() - t0))
    vals.sort()
    us = 1e6 / vals[1]
    print(f"{label}: {vals[1]:.0f} qps ({us:.2f} us/q) "
          f"[{vals[0]:.0f},{vals[2]:.0f}]", flush=True)
    return us


u_route = rate(route, "route (top-p centroids)")
u_score = rate(score, "score (+gather-DMA dots)")
u_topr = rate(topr, "topr  (+top-r extract)")
u_full = rate(full, "full  (+f32 rescore+merge)")
print(f"stage deltas us/q: route={u_route:.2f} "
      f"score={u_score - u_route:.2f} topr={u_topr - u_score:.2f} "
      f"rescore+merge={u_full - u_topr:.2f}", flush=True)
print("done", flush=True)
