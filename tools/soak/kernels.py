"""Random-geometry interpret-mode soak of the fused Pallas beam
kernels vs brute-force numpy references. Exercises the SMEM id
chunking, tb auto-halving, and nbuf pipeline across shapes the fixed
tests never hit."""
import sys, time, traceback

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[2]))
from muninn_tpu.ops.distance import Metric
from muninn_tpu.ops.pallas_beam import gather_block_dots, gather_block_topm

n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 30
rng = np.random.default_rng(7)
fails = 0
t0 = time.time()
for trial in range(n_trials):
    dtype = [jnp.float32, jnp.bfloat16][rng.integers(0, 2)]
    sub = 16 if dtype == jnp.bfloat16 else 8
    r0 = int(sub * rng.integers(1, 5))          # 8..64
    d = int(128 * rng.integers(1, 4))           # 128..384
    b = int(rng.integers(1, 67))                # odd batch sizes incl. 1
    e = int(rng.integers(1, 9))
    cap = int(rng.integers(max(4, e), 300))
    tb = int(rng.choice([8, 17, 64, 256]))
    nbuf = int(rng.choice([1, 2, 8]))
    q = rng.standard_normal((b, d)).astype(np.float32)
    packed = rng.standard_normal((cap, r0, d)).astype(np.float32)
    idx = rng.integers(0, cap, (b, e)).astype(np.int32)
    pj = jnp.asarray(packed, dtype=dtype)
    pf = np.asarray(pj.astype(jnp.float32))     # reference sees bf16 rounding
    tag = f"trial={trial} dtype={np.dtype(dtype).name} r0={r0} d={d} b={b} e={e} cap={cap} tb={tb} nbuf={nbuf}"
    try:
        dots, cn2 = gather_block_dots(
            jnp.asarray(q), jnp.asarray(idx), pj, tb=tb,
            interpret=True, nbuf=nbuf)
        blocks = pf[idx]                         # [b, e, r0, d]
        want_dots = np.einsum("bd,berd->ber", q, blocks).reshape(b, e * r0)
        want_cn2 = (blocks * blocks).sum(-1).reshape(b, e * r0)
        np.testing.assert_allclose(np.asarray(dots), want_dots, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(cn2), want_cn2, rtol=2e-2, atol=2e-2)

        m = int(rng.integers(1, r0 + 1))
        pen = np.where(rng.random((b, e * r0)) < 0.3, 3.0e38, 0.0).astype(np.float32)
        md, ml = gather_block_topm(
            jnp.asarray(q), jnp.asarray(idx), pj, jnp.asarray(pen),
            metric=Metric.L2, m=m, tb=tb, interpret=True, nbuf=nbuf)
        md, ml = np.asarray(md), np.asarray(ml)
        qn2 = (q * q).sum(1)[:, None]
        full = np.maximum(qn2 + want_cn2 - 2.0 * want_dots, 0.0) + pen
        full = full.reshape(b, e, r0)
        want_sorted = np.sort(full, axis=2)[:, :, :m]
        ok = md < 1.5e38
        np.testing.assert_allclose(
            np.where(ok, md, 0.0),
            np.where(ok, np.where(want_sorted < 1.5e38, want_sorted, 0.0), 0.0),
            rtol=3e-2, atol=3e-2)
        # returned local indices must reproduce the returned distances
        re_d = np.take_along_axis(full, ml, axis=2)
        np.testing.assert_allclose(np.where(ok, re_d, 0.0), np.where(ok, md, 0.0),
                                   rtol=1e-3, atol=1e-3)
        print(f"ok {tag} ({time.time()-t0:.0f}s)", flush=True)
    except Exception:
        fails += 1
        print(f"FAIL {tag}", flush=True)
        traceback.print_exc()
print(f"done: {n_trials} trials, {fails} failures", flush=True)
