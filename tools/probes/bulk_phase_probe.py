"""Bulk-build phase breakdown (MUNINN_DEBUG_TIMING): where do the
non-kNN seconds go at 100k x 384 (warm rebuild)?"""
import os, sys, time
os.environ["MUNINN_DEBUG_TIMING"] = "1"
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from muninn_tpu.index import hnsw as H

N, DIM = 100_000, 384
def gen(key, n, dim, n_clusters):
    kc, ka, kn = jax.random.split(key, 3)
    centers = jax.random.normal(kc, (n_clusters, dim), jnp.float32)
    assign = jax.random.randint(ka, (n,), 0, n_clusters)
    x = centers[assign] + 0.3 * jax.random.normal(kn, (n, dim))
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)
corpus = jax.jit(gen, static_argnums=(1, 2, 3))(jax.random.PRNGKey(7), N, DIM, 1000)
corpus.block_until_ready()

for run in ("cold", "warm"):
    idx = H.HnswIndex(DIM, "cosine", m=16, ef_construction=200,
                      wave_size=4096, capacity=N + 4096, expand=8, seed=42)
    t0 = time.time()
    idx.insert(np.arange(N), corpus)
    _ = np.asarray(idx.neighbors0[0, 0])
    print(f"{run} build {time.time()-t0:.2f}s -> {N/(time.time()-t0):.0f} vec/s",
          flush=True)
    del idx
print("done", flush=True)
