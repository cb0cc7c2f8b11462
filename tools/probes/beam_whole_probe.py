"""Whole-beam Pallas loop probe: the full level-0 beam loop in one
kernel (ops/pallas_beam_loop) vs the per-iteration fused path.

Ceiling analysis (DEVELOPMENT.md "Beam DMA economics"): copy issue is
~75% of fused batch time, so killing the per-iteration XLA glue buys at
most ~1.3x alone; it composes with m=32 (halves copies). This probe
measures the fused baseline, then the whole-beam kernel across
pick-transfer mechanisms (dma = VMEM->SMEM copy per iteration, scalar =
per-element reduce stores) and query tiles, at m=16 and m=32.

First Mosaic compile of the whole kernel is the riskiest step (DMA from
computed SMEM indices inside a fori_loop): every variant is wrapped so
a compile failure reports and moves on instead of killing the probe.
"""
import time, sys, traceback
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
    try:
        ids, _ = idx.search(queries, k=K, ef_search=ef)  # warm + recall
    except Exception:
        print(f"{label} ef={ef} e={expand} mi={mi}: FAILED", flush=True)
        traceback.print_exc()
        return
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
    idx.pack_budget_bytes = 8 << 30
    idx.insert(np.arange(N), corpus)
    _ = np.asarray(idx.neighbors0[0, 0])
    print(f"m={m} build {time.time()-t0:.1f}s", flush=True)
    e_best = 8 if m == 16 else 4
    bench(idx, f"m{m} fused", 24, e_best, 0)   # baseline
    # free the fused packed table before building packed-wide: the two
    # together (5.1 + 6.8 GB at m=32) would crowd 16 GB HBM
    idx._packed = None
    idx._packed_scales = None
    pw = idx._maybe_packed_wide()
    print(f"m={m} packedw={None if pw is None else pw.shape}", flush=True)
    for xfer in ("dma", "scalar"):
        idx.beam_whole = True
        idx.beam_pick_xfer = xfer
        bench(idx, f"m{m} whole/{xfer}", 24, e_best, 0)
        if xfer == "dma":
            # tile sweep only on the (expected-faster) dma mechanism
            orig = H.beam_loop
            from functools import partial as _p
            for tb in (64, 256):
                # tb is a static arg of beam_loop; route via partial and
                # drop the jit cache so the patch takes effect
                H.beam_loop = _p(orig, tb=tb)
                H._search_topk_whole.clear_cache()
                bench(idx, f"m{m} whole/dma tb={tb}", 24, e_best, 0)
            H.beam_loop = orig
            H._search_topk_whole.clear_cache()
        idx.beam_whole = False
    del idx
print("done", flush=True)
