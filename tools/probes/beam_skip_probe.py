"""Dead-pick DMA skip A/B at 100k x 384 ef=24 (drain-once methodology).

The beam kernels now skip the block copy for picks with id -1
(converged/stalled queries, invalid slots). Copy ISSUE is the beam's
measured floor (~260 ns each), so the win should track the dead-pick
fraction. This probe measures:

1. gather_block_dots at synthetic dead fractions 0/25/50/75% — the
   pure kernel-level skip rate;
2. official HnswIndex QPS + recall at ef=24 — end-to-end with the
   skip riding the real convergence pattern (compare vs the recorded
   pre-skip 90.9k QPS @ 0.9807 in DEVELOPMENT.md).
"""
import time
import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from muninn_tpu.ops.pallas_beam import gather_block_dots
from muninn_tpu.index import hnsw as H
from muninn_tpu.index.flat import FlatIndex

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
print("data ready", flush=True)

t0 = time.time()
idx = H.HnswIndex(DIM, "cosine", m=16, ef_construction=200,
                  wave_size=4096, capacity=N + 4096, expand=8, seed=42)
idx.insert(np.arange(N), corpus)
_ = np.asarray(idx.neighbors0[0, 0])
print(f"build {time.time() - t0:.1f}s", flush=True)

jq = jnp.asarray(queries, jnp.float32)
packed = idx._maybe_packed()


def drain(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))


def rate(label, fn, inner=3):
    drain(fn())  # warm/compile
    vals = []
    for _ in range(3):
        t0 = time.time()
        r = None
        for _ in range(inner):
            r = fn()
        drain(r)
        vals.append(NQ * inner / (time.time() - t0))
    vals.sort()
    print(f"{label}: {vals[1]:.0f} qps [{vals[0]:.0f},{vals[2]:.0f}]",
          flush=True)
    return vals[1]


# 1) kernel-level: same pick tensor, increasing dead fraction
CH = 4096
rng = np.random.default_rng(0)
pick0 = rng.integers(0, N, (CH, 8)).astype(np.int32)
for frac in (0.0, 0.25, 0.5, 0.75):
    dead = rng.random((CH, 8)) < frac
    picks = jnp.asarray(np.where(dead, -1, pick0))

    def fn(picks=picks):
        outs = [gather_block_dots(jq[s:s + CH], picks, packed)
                for s in (0, CH)]
        return outs[-1]

    rate(f"kernel dots dead={frac:.2f}", fn)

# 2) end-to-end official path + recall (pre-skip recorded: 90.9k @ 0.9807)
flat = FlatIndex(DIM, "cosine")
flat.insert(np.arange(N), corpus)
tids, _ = flat.search(np.asarray(queries[:1024]), k=K)
rate("official search ef=24", lambda: idx._search_topk_chunked(jq, K, 24)[1])
ids, _ = idx.search(np.asarray(queries[:1024]), k=K, ef_search=24)
rec = float(np.mean([
    len(set(a[a >= 0]) & set(b[b >= 0])) / K for a, b in zip(ids, tids)
]))
print(f"recall@10 ef=24: {rec:.4f}", flush=True)
print("done", flush=True)
