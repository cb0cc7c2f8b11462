"""Beam cost split at 100k x 384 ef=24 (drain-once methodology).

Stages: route-only / route+beam / full (route+beam+rescore+topk),
dedup on/off, kernel-DMA-only loop, expand sweep.
"""
import time, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from functools import partial
from muninn_tpu.ops.pallas_flat import flat_topk
from muninn_tpu.ops.pallas_beam import gather_block_dots
from muninn_tpu.index import hnsw as H

N, DIM, K, NQ = 100_000, 384, 10, 8192
CHURN = 32_768

def gen(key, n, dim, n_clusters):
    kc, ka, kn, kq, kp = jax.random.split(key, 5)
    centers = jax.random.normal(kc, (n_clusters, dim), jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_clusters)
    x = centers[assign] + 0.3 * jax.random.normal(kn, (n, dim))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    q = x[jax.random.randint(kq, (NQ,), 0, n)]
    q = q + 0.05 * jax.random.normal(kp, (NQ, dim))
    return x, q / jnp.linalg.norm(q, axis=1, keepdims=True)

corpus_all, queries = jax.jit(gen, static_argnums=(1, 2, 3))(
    jax.random.PRNGKey(7), N + CHURN, DIM, 1000)
corpus = corpus_all[:N]
corpus.block_until_ready()
print("data ready", flush=True)

t0 = time.time()
idx = H.HnswIndex(DIM, "cosine", m=16, ef_construction=200,
                  wave_size=4096, capacity=N + CHURN + 4096, expand=8, seed=42)
idx.insert(np.arange(N), corpus)
_ = np.asarray(idx.neighbors0[0, 0])
print(f"build {time.time()-t0:.1f}s", flush=True)

jq = jnp.asarray(queries, jnp.float32)
pool = idx._routing_pool()
pv = idx._pool_vecs(pool)
v16 = idx._vecs16()
packed = idx._maybe_packed()
nbrs0 = idx.neighbors0
valid = idx.store.valid
vectors = idx.store.vectors
metric = idx.metric
EF, R = 24, 8
print(f"pool={pool.shape} packed={None if packed is None else packed.shape} "
      f"cap={idx.store.capacity}", flush=True)

def drain(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))

def rate(label, fn, inner=3):
    drain(fn())  # warm/compile
    vals = []
    for _ in range(3):
        t0 = time.time(); r = None
        for _ in range(inner):
            r = fn()
        drain(r)
        vals.append(NQ * inner / (time.time() - t0))
    vals.sort()
    print(f"{label}: {vals[1]:.0f} qps [{vals[0]:.0f},{vals[2]:.0f}]", flush=True)
    return vals[1]

@partial(jax.jit, static_argnames=("stage", "ef", "expand", "r", "mi", "dedup"))
def staged(q, pool, pv, v16, nbrs0, valid, vectors, packed,
           stage, ef, expand, r, mi, dedup):
    _, sel = flat_topk(q, pv, r, metric=metric, precision="default",
                       corpus_valid=pool >= 0)
    entries = jnp.where(sel >= 0, pool[jnp.maximum(sel, 0)], -1)
    if stage == "route":
        return entries
    beam_d, beam_i = H._beam_search_level0(
        q, entries, v16, nbrs0, metric, ef, expand,
        patience=0, packed=packed, dedup=dedup, max_iters=mi, fused=True)
    if stage == "beam":
        return beam_i
    ok = (beam_i >= 0) & valid[jnp.maximum(beam_i, 0)]
    beam_i = jnp.where(ok, beam_i, -1)
    cv = vectors[jnp.maximum(beam_i, 0)]
    d = H.gathered_distances(q, cv, metric)
    d = jnp.where(ok, d, jnp.inf)
    return H.sorted_topk_unique(d, beam_i, K)[1]

CH = 4096
def chunked(stage, ef=EF, expand=8, r=R, mi=4, dedup=True):
    def fn():
        outs = [staged(jq[s:s+CH], pool, pv, v16, nbrs0, valid, vectors,
                       packed, stage, ef, expand, r, mi, dedup)
                for s in (0, CH)]
        return outs[-1]
    return fn

rate("official _search_topk_chunked", lambda: idx._search_topk_chunked(jq, K, EF)[1])
rate("stage route-only (r=8)", chunked("route"))
rate("stage route+beam e8 mi4", chunked("beam"))
rate("stage full e8 mi4", chunked("full"))
rate("stage full e8 mi4 dedup=0", chunked("full", dedup=False))
rate("stage route+beam e8 mi4 dedup=0", chunked("beam", dedup=False))
rate("stage route+beam e4 mi7", chunked("beam", expand=4, mi=7))
rate("stage route+beam e16 mi3", chunked("beam", expand=16, mi=3))

# kernel-DMA-only: mi iterations of gather_block_dots on rolling picks
pick0 = jnp.asarray(np.random.default_rng(0).integers(0, N, (CH, 8)), jnp.int32)

@partial(jax.jit, static_argnames=("mi",))
def kernel_only(q, picks, packed, mi):
    def body(i, carry):
        p, acc = carry
        dots, cn2 = gather_block_dots(q, p, packed)
        acc = acc + jnp.sum(dots, axis=(1, 2))
        p = (p + jnp.int32(7919)) % jnp.int32(N)
        return p, acc
    return jax.lax.fori_loop(0, mi, body, (picks, jnp.zeros((q.shape[0],))))[1]

def k_only():
    outs = [kernel_only(jq[s:s+CH], pick0, packed, 4) for s in (0, CH)]
    return outs[-1]
rate("kernel-DMA only e8 x4 iters", k_only)
print("done", flush=True)
