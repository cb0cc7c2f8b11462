"""IVF int8-block northstar probe: 1M x 768 cosine.

The IVF engine is DMA-*bandwidth*-bound at useful nprobe (196 KB bf16
blocks stream at ~470 GB/s; DEVELOPMENT.md "IVF engine facts"), unlike
the transaction-bound HNSW beam where int8 packing measured dead. int8
blocks quarter the probe bytes, so if the dequant epilogue stays cheap
this should approach 2x at the bandwidth-bound operating points.

Method: ONE balanced-Lloyd build (bf16), then quantize the packed
blocks in place — identical assignment, so the bf16/int8 comparison
isolates the wire format. Sweep nprobe 2/4/8 for both formats; recall
vs the exact-f32 ranking on a 512-query slice.
"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from muninn_tpu.ops.pallas_flat import flat_topk
from muninn_tpu.index.ivf import IvfIndex, _ivf_search, _quantize_blocks

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

t0 = time.time()
ivf = IvfIndex(D, "cosine", cluster_size=128, rescore_r=32,
               capacity=N + 4096, seed=42)
ivf.insert(np.arange(N), big)
_ = np.asarray(ivf.member_slots[0, 0])
print(f"build {time.time() - t0:.1f}s nlist={ivf.nlist}", flush=True)

q8, sc8 = _quantize_blocks(ivf.blocks)
q8.block_until_ready()
jbq = jnp.asarray(bigq, jnp.float32)

for quant, blocks, scales in (("bf16", ivf.blocks, None), ("int8", q8, sc8)):
    for p in ((2, 4, 8) if quant == "bf16" else (1, 2, 4, 8, 16)):
        r = min(max(32, K), p * ivf.cluster_size)
        ii = np.asarray(_ivf_search(
            jbq[:512], ivf.centroids, blocks, ivf.member_slots,
            ivf.store.vectors, ivf.store.valid, ivf.metric,
            K, p, r, ivf._fused_ok(), False, scales=scales,
        )[1])
        rec = float(np.mean([len(set(a[a >= 0]) & set(b)) / K
                             for a, b in zip(ii, ns_true)]))
        rate(lambda p=p, r=r, blocks=blocks, scales=scales: _ivf_search(
            jbq, ivf.centroids, blocks, ivf.member_slots,
            ivf.store.vectors, ivf.store.valid, ivf.metric,
            K, p, r, ivf._fused_ok(), False, scales=scales,
        )[1], f"ivf {quant} nprobe={p} r={r} recall={rec:.4f}")
print("done", flush=True)
