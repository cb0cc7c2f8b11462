"""Localize the 10M-node / 100M-edge device PageRank worker fault.

The staged graph_scale run and the isolated --op pagerank probe both
crash the worker at this scale, even after the donated-sort +
bincount-degree cuts (a2ee388). BFS at the same scale succeeds, so the
fault is in something pagerank adds: the degree bincount, the [E_pad]
share build, or the chunked pull iteration. Each stage here is forced
to completion with a host fetch so the log names the first faulting
stage.

Usage: python tools/probes/pr_100m_stage_probe.py [--n N] [--iters I]
       [--chunk log2_chunk]
"""
import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

argv = sys.argv
N = int(argv[argv.index("--n") + 1]) if "--n" in argv else 10_000_000
ITERS = int(argv[argv.index("--iters") + 1]) if "--iters" in argv else 20
CHUNK_LOG2 = int(argv[argv.index("--chunk") + 1]) if "--chunk" in argv else 24
E = N * 10
print(f"N={N} E={E} iters={ITERS} chunk=2^{CHUNK_LOG2}", flush=True)

from muninn_tpu.graph import Graph
from muninn_tpu.graph import traversal as trv
from muninn_tpu.ops.segments import bincount_chunked
from muninn_tpu.graph.pagerank import pagerank_sorted

key = jax.random.PRNGKey(0)
ks, kd = jax.random.split(key)
src = jax.random.randint(ks, (E,), 0, N, jnp.int32)
dst = jax.random.randint(kd, (E,), 0, N, jnp.int32)
int(dst[0])
g = Graph.from_device_edges(src, dst, num_nodes=N)
del src, dst


def fetch(x):
    return float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))


t0 = time.time()
cr = g.csr("reverse")
fetch(cr.offsets)
print(f"stage csr ok {time.time()-t0:.1f}s cap={cr.capacity}", flush=True)

t0 = time.time()
deg = bincount_chunked(cr.dst, None, N, trv.EDGE_CHUNK)
fetch(deg)
print(f"stage bincount ok {time.time()-t0:.1f}s", flush=True)

chunk = 2 ** CHUNK_LOG2
t0 = time.time()
r1 = pagerank_sorted(
    cr.offsets, cr.dst, jnp.zeros((1,), jnp.float32), deg, N,
    iterations=1, weighted=False, edge_chunk=chunk,
)
fetch(r1)
print(f"stage iter1 ok {time.time()-t0:.1f}s sum={float(r1.sum()):.6f}",
      flush=True)
del r1

t0 = time.time()
r = pagerank_sorted(
    cr.offsets, cr.dst, jnp.zeros((1,), jnp.float32), deg, N,
    iterations=ITERS, weighted=False, edge_chunk=chunk,
)
fetch(r)
dt = time.time() - t0
print(f"stage iter{ITERS} ok {dt:.1f}s sum={float(r.sum()):.6f} "
      f"({E*ITERS/dt/1e6:.0f}M edge-iter/s)", flush=True)
