"""Projected two-tier northstar probe: 1M x 768 cosine, int8 scan of a
128-d uncentered-PCA projection + exact f32 rescore. Sweep proj_dim and
r; compare against the shipped int8 two-tier."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from muninn_tpu.ops.pallas_flat import (
    flat_topk, flat_topk_int8, flat_topk_int8_rescored,
    flat_topk_proj_rescored, proj_basis,
)
from muninn_tpu.index.flat import pick_rescore_r

N, D, K, NQ = 1_000_000, 768, 10, 8192

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
ns_true = np.asarray(flat_topk(bigq[:512], big, K, metric="cosine",
                               precision="highest")[1])
print("data ready", flush=True)

def drain(r):
    float(jnp.asarray(r).reshape(-1)[0].astype(jnp.float32))

def rate(fn, label):
    drain(fn())
    vals = []
    for _ in range(3):
        t0 = time.time()
        r = None
        for _ in range(3):
            r = fn()
        drain(r)
        vals.append(NQ * 3 / (time.time() - t0))
    vals.sort()
    print(f"{label}: {vals[1]:.0f} qps [{vals[0]:.0f},{vals[2]:.0f}]", flush=True)
    return vals[1]

for dp in (128, 64, 256):
    w = proj_basis(big, dp)
    bigp = big @ w
    scp = jnp.max(jnp.abs(bigp), axis=1) / 127.0
    bp8 = jnp.clip(jnp.round(bigp / jnp.maximum(scp[:, None], 1e-30)),
                   -127, 127).astype(jnp.int8)
    del bigp
    cand = np.asarray(flat_topk_int8(
        bigq[:512] @ w, bp8, scp, 64, metric="inner_product", tc=2048)[1])
    r_auto, curve = pick_rescore_r(ns_true, cand, (16, 24, 32, 48, 64), 0.99)
    print(f"dp={dp} containment curve: {curve} -> r={r_auto}", flush=True)
    for r in sorted({r_auto, 32, 64}):
        iip = np.asarray(flat_topk_proj_rescored(
            bigq[:512], big, w, bp8, scp, K, r=r, metric="cosine", tc=2048)[1])
        rec = float(np.mean([len(set(a) & set(b)) / K
                             for a, b in zip(iip, ns_true)]))
        rate(lambda r=r, w=w, bp8=bp8, scp=scp: flat_topk_proj_rescored(
            bigq, big, w, bp8, scp, K, r=r, metric="cosine", tc=2048)[1],
            f"proj dp={dp} r={r} recall={rec:.4f}")
    del bp8, scp, w

# shipped int8 two-tier baseline on the same data/process
sc8 = jnp.max(jnp.abs(big), axis=1) / 127.0
bi8 = jnp.clip(jnp.round(big / jnp.maximum(sc8[:, None], 1e-30)),
               -127, 127).astype(jnp.int8)
ii8 = np.asarray(flat_topk_int8_rescored(
    bigq[:512], big, bi8, sc8, K, r=16, metric="cosine", tc=2048)[1])
rec8 = float(np.mean([len(set(a) & set(b)) / K for a, b in zip(ii8, ns_true)]))
rate(lambda: flat_topk_int8_rescored(
    bigq, big, bi8, sc8, K, r=16, metric="cosine", tc=2048)[1],
    f"int8 two-tier r=16 recall={rec8:.4f}")
print("done", flush=True)
