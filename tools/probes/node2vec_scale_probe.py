"""Node2Vec device-scale probe, staged.

Three 90-min attempts hung with ZERO output between the csr print and
the first batch-8 sync — so this version (a) relies on the new
stage-level debug prints inside node2vec_train, and (b) times the two
hot primitives ONE dispatch at a time (compile + warm split) before
any full train, so a pathological per-op cost is pinned in minutes.

Usage: python tools/probes/node2vec_scale_probe.py [--v 50000]
"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from muninn_tpu.graph import Graph
from muninn_tpu.models.node2vec import (
    node2vec_train, _row_sorted_cumw, biased_walks, sgns_walk_batch,
    build_negative_table,
)

import os
os.environ["MUNINN_DEBUG_TIMING"] = "1"

V = int(sys.argv[sys.argv.index("--v") + 1]) if "--v" in sys.argv else 50_000
DEG = 10
E = V * DEG
WB = 4096
L = 20


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


t0 = time.time()
ks, kd = jax.random.split(jax.random.PRNGKey(0))
src = jax.random.randint(ks, (E,), 0, V, jnp.int32)
dst = jax.random.randint(kd, (E,), 0, V, jnp.int32)
int(dst[0])
g = Graph.from_device_edges(src, dst, num_nodes=V)
del src, dst
c = g.csr("both")
fetch(c.offsets)
print(f"V={V} csr both {time.time()-t0:.1f}s", flush=True)

# ── primitive timings, one dispatch each ──
t = time.time()
dstj, cumw = _row_sorted_cumw(c.s(), c.dst, c.w(), c.offsets, c.max_deg)
fetch(cumw)
print(f"cumw cold {time.time()-t:.1f}s", flush=True)

starts = jnp.arange(WB, dtype=jnp.int32) % V
key = jax.random.PRNGKey(1)
t = time.time()
walks = biased_walks(key, c.offsets, dstj, cumw, starts, V, L, 1.0, 1.0)
fetch(walks)
print(f"walks[{WB}] cold {time.time()-t:.1f}s", flush=True)
t = time.time()
walks = biased_walks(key, c.offsets, dstj, cumw, starts, V, L, 1.0, 1.0)
fetch(walks)
wt = time.time() - t
print(f"walks[{WB}] warm {wt:.2f}s  ({WB*L/wt:,.0f} steps/s)", flush=True)

neg = jnp.asarray(build_negative_table(np.asarray(c.degrees())))
syn0 = jax.random.uniform(jax.random.PRNGKey(2), (V, 64)) * 0.01
syn1 = jnp.zeros((V, 64), jnp.float32)
t = time.time()
syn0, syn1 = sgns_walk_batch(
    syn0, syn1, walks, neg, key, jnp.float32(0.025), 5, 5, 256
)
fetch(syn0)
print(f"sgns[{WB}x{L}] cold {time.time()-t:.1f}s", flush=True)
walks = biased_walks(key, c.offsets, dstj, cumw, starts, V, L, 1.0, 1.0)
t = time.time()
syn0, syn1 = sgns_walk_batch(
    syn0, syn1, walks, neg, key, jnp.float32(0.025), 5, 5, 256
)
fetch(syn0)
st = time.time() - t
pairs = WB * 2 * sum(L + 1 - o for o in range(1, 6))
print(
    f"sgns[{WB}x{L}] warm {st:.2f}s  ({pairs/st:,.0f} pairs/s)", flush=True
)
del syn0, syn1, walks

# ── full train (stage prints bound every wait) ──
t0 = time.time()
ids, emb = node2vec_train(
    g, dim=64, num_walks=1, walk_length=L, window=5, neg_samples=5,
    epochs=1, walk_batch=WB, seed=3,
)
dt = time.time() - t0
print(
    f"V={V} train {dt:.1f}s  walk_steps/s={V*L/dt:,.0f}  emb={emb.shape}",
    flush=True,
)
print(
    "norm ok:",
    float(np.abs(np.linalg.norm(emb[:1000], axis=1) - 1).max()) < 1e-3,
    flush=True,
)
