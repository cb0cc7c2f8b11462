"""Node2Vec device-scale probe: 1M-node / 10M-edge device graph,
walks + SGNS throughput (walk steps/s, pair updates/s)."""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from muninn_tpu.graph import Graph
from muninn_tpu.models.node2vec import node2vec_train

import os
os.environ["MUNINN_DEBUG_TIMING"] = "1"  # per-8-batch sync prints

# 250k first (progress sanity at ~16 batch dispatches), then 1M — the
# first 1M attempt showed no output for 60+ min because the train loop
# queues every batch with no host sync; the debug prints bound the
# wait per batch now.
for V in (250_000, 1_000_000):
    DEG = 10
    E = V * DEG
    ks, kd = jax.random.split(jax.random.PRNGKey(0))
    src = jax.random.randint(ks, (E,), 0, V, jnp.int32)
    dst = jax.random.randint(kd, (E,), 0, V, jnp.int32)
    dst.block_until_ready()
    g = Graph.from_device_edges(src, dst, num_nodes=V)
    t0 = time.time(); g.csr("both")
    print(f"V={V} csr both {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    ids, emb = node2vec_train(
        g, dim=64, num_walks=1, walk_length=20, window=5, neg_samples=5,
        epochs=1, walk_batch=16384, seed=3,
    )
    dt = time.time() - t0
    steps = V * 1 * 20
    print(f"V={V} train {dt:.1f}s  walk_steps/s={steps/dt:,.0f}  "
          f"emb={emb.shape}", flush=True)
    print("norm ok:",
          float(np.abs(np.linalg.norm(emb[:1000], axis=1) - 1).max()) < 1e-3,
          flush=True)
