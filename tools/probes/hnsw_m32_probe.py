"""Wide-degree probe: if the fused beam is DMA-transaction-bound,
m=32 (R0=64 per block) should reach ef=24-grade recall with ~half the
expansions -> ~2x QPS. 100k x 384 bench workload, device-side timing."""
import time, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from muninn_tpu.ops.pallas_flat import flat_topk
from muninn_tpu.index import hnsw as H

N, DIM, K, NQ = 100_000, 384, 10, 8192

def gen(key, n, dim, n_clusters):
    kc, ka, kn, kq, kp = jax.random.split(key, 5)
    centers = jax.random.normal(kc, (n_clusters, dim), jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_clusters)
    x = centers[assign] + 0.3 * jax.random.normal(kn, (n, dim))
    x = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    q = x[jax.random.randint(kq, (NQ,), 0, n)]
    q = q + 0.05 * jax.random.normal(kp, (NQ, dim))
    return x, q / jnp.linalg.norm(q, axis=1, keepdims=True)

corpus, queries = jax.jit(gen, static_argnums=(1, 2, 3))(
    jax.random.PRNGKey(7), N, DIM, 1000)
corpus.block_until_ready()
true_ids = np.asarray(
    flat_topk(queries, corpus, K, metric="cosine", precision="highest")[1])
jq = jnp.asarray(queries, jnp.float32)
print("data ready", flush=True)

def drain(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))

def bench(idx, label, ef, expand, mi):
    idx.expand = expand
    idx.beam_max_iters = mi
    ids, _ = idx.search(queries, k=K, ef_search=ef)  # warm + recall
    hits = sum(len(set(a[a >= 0]) & set(b)) for a, b in zip(ids, true_ids))
    rec = hits / (NQ * K)
    vals = []
    for _ in range(3):
        t0 = time.time()
        r = None
        for _ in range(3):
            r = idx._search_topk_chunked(jq, K, ef)[1]
        drain(r)
        vals.append(NQ * 3 / (time.time() - t0))
    vals.sort()
    print(f"{label} ef={ef} e={expand} mi={mi}: {vals[1]:.0f} qps "
          f"[{vals[0]:.0f},{vals[2]:.0f}] recall={rec:.4f}", flush=True)

for m in (16, 32):
    t0 = time.time()
    idx = H.HnswIndex(DIM, "cosine", m=m, ef_construction=200,
                      wave_size=4096, capacity=N + 4096, expand=8, seed=42)
    idx.pack_budget_bytes = 6 << 30
    idx.insert(np.arange(N), corpus)
    _ = np.asarray(idx.neighbors0[0, 0])
    print(f"m={m} build {time.time()-t0:.1f}s packed="
          f"{None if idx._maybe_packed() is None else idx._maybe_packed().shape}",
          flush=True)
    if m == 16:
        bench(idx, "m16", 24, 8, 0)       # current bench operating point
        bench(idx, "m16", 24, 8, 4)
    else:
        bench(idx, "m32", 24, 4, 0)       # half the transactions
        bench(idx, "m32", 24, 4, 3)
        bench(idx, "m32", 24, 4, 2)
        bench(idx, "m32", 24, 8, 2)
        bench(idx, "m32", 16, 4, 2)
        bench(idx, "m32", 12, 4, 2)
    del idx
print("done", flush=True)
