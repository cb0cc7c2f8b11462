"""Bisect the 10M-node / 100M-edge device BFS worker crash.

graph_scale's 10M row built its CSR (44 s) but `g.bfs` faulted the TPU
worker. Each stage here runs behind a host fetch so the log shows the
LAST op that succeeded before a crash. Run pagerank/components first
(as their own `--op` invocations from the job file) so a BFS fault
can't cost their rows.

Usage: python tools/probes/bfs_100m_probe.py [--op pagerank|components|bfs_bisect]
"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

op = sys.argv[sys.argv.index("--op") + 1] if "--op" in sys.argv else "bfs_bisect"
N = int(sys.argv[sys.argv.index("--n") + 1]) if "--n" in sys.argv else 10_000_000
DEG = 10
E = N * DEG
print(f"op={op} N={N} E={E}", flush=True)

from muninn_tpu.graph import Graph

key = jax.random.PRNGKey(0)
ks, kd = jax.random.split(key)
src = jax.random.randint(ks, (E,), 0, N, jnp.int32)
dst = jax.random.randint(kd, (E,), 0, N, jnp.int32)
int(dst[0])
g = Graph.from_device_edges(src, dst, num_nodes=N)


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


t0 = time.time()
if op == "pagerank":
    r = g.pagerank(iterations=20, backend="device", as_array=True)
    print(f"pagerank20 ok {time.time()-t0:.1f}s sum={float(r.sum()):.6f}",
          flush=True)
elif op == "components":
    lab = g.connected_components(backend="device", as_array=True)
    print(f"components ok {time.time()-t0:.1f}s n={int(lab.max())+1}",
          flush=True)
else:
    # stage-by-stage BFS body on the pull CSR
    from muninn_tpu.ops.segments import seg_min, seg_positions, n_passes_for
    from muninn_tpu.graph.traversal import INT_INF

    c = g.csr("reverse")  # pull CSR for forward BFS; its dst = in-edge sources
    roff, esrc = c.offsets, c.dst
    e_pad = esrc.shape[0]
    print(f"csr ok e_pad={e_pad} max_deg={c.max_deg}", flush=True)
    spos = seg_positions(roff, e_pad)
    fetch(spos)
    print(f"seg_positions ok {time.time()-t0:.1f}s", flush=True)

    depth = jnp.full((N,), INT_INF, jnp.int32).at[0].set(0)
    es = jnp.minimum(esrc, N - 1)
    active = depth[es] == 0
    fetch(active)
    print(f"gather+cmp ok {time.time()-t0:.1f}s", flush=True)
    cand = jnp.where(active, es, INT_INF)
    np_ = n_passes_for(c.max_deg)
    best = seg_min(cand, spos, roff, INT_INF, np_)
    fetch(best)
    print(f"seg_min ok n_passes={np_} {time.time()-t0:.1f}s", flush=True)

    d, p = g.bfs(0, as_array=True, backend="device")
    print(f"full bfs ok {time.time()-t0:.1f}s reached={int((d < 2**30).sum())}",
          flush=True)
