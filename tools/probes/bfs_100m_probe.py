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
# the constructor pads copies into _dev_coo: drop the generator refs
# (1.07 GB of dead HBM at 100M edges against the ~3 GB worker ceiling)
del src, dst


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
elif op == "bfs":
    d, p = g.bfs(0, as_array=True, backend="device")
    print(f"full bfs ok {time.time()-t0:.1f}s reached={int((d < 2**30).sum())}",
          flush=True)
else:
    # op=all: every analytic staged in ONE process (shared CSR builds),
    # each behind a host fetch so the log shows the last op that
    # succeeded before any crash. Runs the chunked kernels automatically
    # above capacity 2**25 (traversal.edge_chunk_for).
    c = g.csr("reverse")
    print(f"rev csr ok e_pad={c.capacity} max_deg={c.max_deg} "
          f"{time.time()-t0:.1f}s", flush=True)
    t = time.time()
    r = g.pagerank(iterations=20, backend="device", as_array=True)
    print(f"pagerank20 ok {time.time()-t:.1f}s sum={float(r.sum()):.6f} "
          f"({E*20/(time.time()-t)/1e6:.0f}M edge-iter/s)", flush=True)
    del r
    t = time.time()
    d, p = g.bfs(0, as_array=True, backend="device")
    print(f"bfs ok {time.time()-t:.1f}s reached={int((d < 2**30).sum())}",
          flush=True)
    del d, p
    t = time.time()
    lab = g.connected_components(backend="device", as_array=True)
    print(f"components ok {time.time()-t:.1f}s n={int(lab.max())+1}",
          flush=True)
