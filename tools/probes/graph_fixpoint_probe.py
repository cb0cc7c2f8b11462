"""Re-measure device graph fixpoint bounds with queued timing
(ROADMAP: the old '~100M elem/s gather' figure predates the
dispatch-overhead discovery). 1M nodes / 10M edges."""
import time, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from functools import partial
from muninn_tpu.graph import Graph  # the public api.Graph (has bfs/…)
from muninn_tpu.ops import segments as S
from muninn_tpu.graph import traversal as T

V, E = 1_000_000, 10_000_000
rng = np.random.default_rng(3)
# Edges MUST be device-generated: a host COO at this size is a 160 MB
# upload through the ~2 MB/s tunnel (~80 min) — the exact trap
# graph_scale's docstring warns about.
ks, kd = jax.random.split(jax.random.PRNGKey(3))
dsrc = jax.random.randint(ks, (E,), 0, V, jnp.int32)
ddst = jax.random.randint(kd, (E,), 0, V, jnp.int32)
int(ddst[0])
g = Graph.from_device_edges(dsrc, ddst, num_nodes=V)
print("graph built", flush=True)

def drain(x):
    float(jnp.asarray(x).reshape(-1)[0].astype(jnp.float32))

def timeit(label, fn, inner=1, reps=3):
    drain(fn())
    vals = []
    for _ in range(reps):
        t0 = time.time()
        r = None
        for _ in range(inner):
            r = fn()
        drain(r)
        vals.append((time.time() - t0) / inner)
    vals.sort()
    print(f"{label}: {vals[1]*1000:.1f} ms [{vals[0]*1000:.1f},{vals[2]*1000:.1f}]",
          flush=True)
    return vals[1]

# full fixpoints through the device path (force device backend)
# as_array=True: the index-aligned arrays are the device-scale result
# shape; the 1M-row list path is measured elsewhere (and the earlier
# 1159 s bfs e2e here was the host-edge COO upload, since removed)
t0 = time.time()
depth, _ = g.bfs(0, backend="device", as_array=True)
print(f"bfs device e2e {time.time()-t0:.2f}s "
      f"reached={int((np.asarray(depth) < 2**30).sum())}", flush=True)
t0 = time.time()
comp = g.connected_components(backend="device", as_array=True)
print(f"components device e2e {time.time()-t0:.2f}s", flush=True)

# isolate: the pull CSR for forward traversal is the REVERSE csr
c = g.csr("reverse")
roff, esrc = c.offsets, c.dst
print("pull csr ready", flush=True)

e_pad = esrc.shape[0]
spos = S.seg_positions(roff, e_pad)
spos.block_until_ready()
maxdeg = int(np.max(np.diff(np.asarray(roff))))
npass = S.n_passes_for(maxdeg)
print(f"e_pad={e_pad} maxdeg={maxdeg} npass={npass}", flush=True)

d0 = jnp.zeros((V,), jnp.int32).at[0].set(1)
es = jnp.minimum(esrc, V - 1)

@jax.jit
def gather_only(d):
    return jnp.sum(d[es])

@partial(jax.jit, static_argnames=("np_",))
def segmin_only(vals, np_):
    return S.seg_min(vals, spos, roff, T.INT_INF, np_)

@partial(jax.jit, static_argnames=("np_",))
def one_iter(d, np_):
    ds = d[es]
    relax = jnp.where(ds < T.INT_INF, ds + 1, T.INT_INF)
    return jnp.minimum(d, S.seg_min(relax, spos, roff, T.INT_INF, np_))

vals = jnp.asarray(rng.integers(0, 100, e_pad).astype(np.int32))
tg = timeit("gather d[es] (10M random)", lambda: gather_only(d0), inner=4)
ts = timeit(f"seg_min only (npass={npass})", lambda: segmin_only(vals, npass), inner=2)
ti = timeit("one fixpoint iteration", lambda: one_iter(d0, npass), inner=2)
print(f"gather rate {E/tg/1e6:.0f}M elem/s; segmin {E/ts/1e6:.0f}M/s; "
      f"iter {E/ti/1e6:.0f}M edge/s", flush=True)

# npass sensitivity: is seg_min pass-count-bound?
for np_ in (4, 8, 16, 24):
    timeit(f"seg_min npass={np_}", lambda np_=np_: segmin_only(vals, np_), inner=2)
print("done", flush=True)
