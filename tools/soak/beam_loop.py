"""Random-geometry interpret-mode soak of the whole-beam Pallas loop
(ops/pallas_beam_loop.beam_loop) vs the XLA beam
(index/hnsw._beam_search_level0, fused interpret path).

Vectors live on an integer grid (k/4, k in [-4, 4], no zero rows) so
every dot/sqnorm is exact in f32 regardless of accumulation order —
the two paths must then agree EXACTLY (same pick, dedup, merge and
patience semantics; ties broken by the same candidate order).
Exercises random d/R0/ef/expand/patience/metric/batch/tb/nbuf and both
pick-transfer mechanisms across shapes the fixed tests never hit.
"""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.index.hnsw import _beam_search_level0
from muninn_tpu.ops.distance import Metric, gathered_distances
from muninn_tpu.ops.pallas_beam_loop import beam_loop, pack_wide

n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 25
rng = np.random.default_rng(11)
fails = 0
t0 = time.time()


def grid_vectors(r, shape):
    v = r.integers(-4, 5, shape).astype(np.float32) / 4.0
    dead = (np.abs(v).sum(axis=-1) == 0)
    v[dead, 0] = 1.0  # no zero rows (cosine guard paths differ on 0)
    return v


for trial in range(n_trials):
    d = int(128 * rng.integers(1, 3))            # 128 / 256
    r0 = int(16 * rng.integers(1, 4))            # 16 / 32 / 48
    cap = int(rng.integers(max(64, r0), 600))
    b = int(rng.integers(1, 50))                 # odd batches incl. 1
    ef = int(rng.integers(4, 33))
    expand = int(rng.integers(1, 9))
    patience = int(rng.integers(1, 20))
    mi = int(rng.integers(1, 10))
    metric = [Metric.L2, Metric.COSINE, Metric.INNER_PRODUCT][rng.integers(0, 3)]
    tb = int(rng.choice([8, 24, 64, 256]))
    nbuf = int(rng.choice([1, 2, 8]))
    xfer = ["dma", "scalar"][rng.integers(0, 2)]
    r_ent = int(rng.integers(1, min(8, ef) + 1))

    vecs = grid_vectors(rng, (cap, d))
    v16 = jnp.asarray(vecs, jnp.bfloat16)  # grid values exact in bf16
    nbrs = rng.integers(-1, cap, (cap, r0)).astype(np.int32)
    q = grid_vectors(rng, (b, d))
    entries = rng.integers(0, cap, (b, r_ent)).astype(np.int32)
    entries[rng.random((b, r_ent)) < 0.1] = -1
    tag = (f"trial={trial} d={d} r0={r0} cap={cap} b={b} ef={ef} "
           f"e={expand} pat={patience} mi={mi} m={metric.name} tb={tb} "
           f"nbuf={nbuf} xfer={xfer} r_ent={r_ent}")
    try:
        jq = jnp.asarray(q)
        jent = jnp.asarray(entries)
        jnbrs = jnp.asarray(nbrs)
        packed = v16[jnp.maximum(jnbrs, 0)]
        xd, xi = _beam_search_level0(
            jq, jent, v16, jnbrs, metric, ef, expand,
            max_iters=mi, patience=patience, packed=packed,
            fused=True, interpret=True,
        )
        packedw = pack_wide(v16, jnbrs)
        e_d = gathered_distances(
            jq, v16[jnp.maximum(jent, 0)].astype(jnp.float32), metric
        )
        e_d = jnp.where(jent >= 0, e_d, jnp.inf)
        init_d = jnp.full((b, ef), jnp.inf).at[:, :r_ent].set(e_d)
        init_i = jnp.full((b, ef), -1, jnp.int32).at[:, :r_ent].set(jent)
        wd, wi = beam_loop(
            jq, init_d, init_i, packedw, metric=metric, ef=ef,
            expand=expand, patience=patience, max_iters=mi, tb=tb,
            interpret=True, nbuf=nbuf, pick_xfer=xfer,
        )
        np.testing.assert_array_equal(np.asarray(xi), np.asarray(wi))
        np.testing.assert_allclose(
            np.nan_to_num(np.asarray(xd), posinf=1e38),
            np.nan_to_num(np.asarray(wd), posinf=1e38),
            rtol=1e-6, atol=1e-6,
        )
        print(f"ok {tag}", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()

print(f"{n_trials} trials, {fails} failures, {time.time()-t0:.0f}s")
sys.exit(1 if fails else 0)
